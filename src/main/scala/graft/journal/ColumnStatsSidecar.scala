package graft.journal

import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.MessageTypeParser

/** Parquet sidecar for PER-FILE COLUMN sketches (`<store>/cstats/`) —
  * the state that lets ANALYZE stats survive DESTRUCTIVE rewrites, not
  * just appends. The manifest-meta stats ([[JournalStore.analyze]])
  * are one merged sketch per column; you can fold a new batch INTO a
  * merged HLL/extremum/null-count, but you cannot SUBTRACT a deleted
  * file from it. Keeping the same sketch at FILE grain makes deletion
  * re-derivable: a rewrite recomputes sketches for exactly the files
  * it rewrites (from rows it already reads), then REFOLDS the merged
  * stats from the surviving files' sketches — same union arithmetic,
  * now over survivors.
  *
  * One row per (file, column): the file's row count at sketch time
  * (staleness arbiter — a deletion-vector decrement makes fstats.rows
  * diverge from this and the refold declines), null count, canonical
  * string extrema (recorded only for types the fold can merge
  * order-correctly — see [[JournalStore.mergeExtremum]]; a non-null
  * column with absent extrema means DECLINED, distinguishable from
  * all-null by nulls == rows), timestamp epoch-micros extrema, and the
  * packed 512-byte HLL registers (bit-identical to analyze()'s melt —
  * union-of-sketches ≡ sketch-of-union needs one arithmetic).
  *
  * Same part discipline as [[FileStatsSidecar]]: immutable random-UUID
  * parquet parts, names in the manifest, orphans swept by vacuum,
  * append writes a delta part, rewrites consolidate (they read every
  * part for the refold anyway). Parts are read by rewrite commits,
  * the analyze bootstrap, and the V2 scan's per-file bound pruning
  * (through the part LRU) — never by snapshot loads. */
private[graft] object ColumnStatsSidecar {
  /** Part-count cap before an append-side commit consolidates. */
  val MaxParts = 16

  /** One (file, column) sketch row. `minv`/`maxv` None with
    * nulls < rows = extrema DECLINED for this file (unmergeable type
    * or out-of-form value); None with nulls == rows = all-null. `regs`
    * is empty (not 512 zeros) when no non-null value was melted. */
  case class CStat(file: String, col: String, rows: Long, nulls: Long,
                   minv: Option[String], maxv: Option[String],
                   minus: Option[Long], maxus: Option[Long],
                   regs: Array[Byte])

  /** Per-PART, per-COLUMN envelope (round 19) — the manifest-resident
    * summary that lets a scan build decide WITHOUT OPENING THE PART
    * whether opening it could change anything. Two independent axes:
    *
    *  - `minFile`/`maxFile`: the part's file-name range. Parts are
    *    written range-partitioned on (col, file), so a SELECTIVE scan
    *    (candidate files already pruned by key/partition/limit) probes
    *    only the parts whose range intersects a candidate — O(1) parts
    *    for a point probe however many parts the store has.
    *  - "no-row-prunable" proof quantities per value domain: over the
    *    part's rows FOR THIS COLUMN that carry both bounds,
    *    max-of-mins (`*LoMax`) and min-of-maxes (`*HiMin`). Feeding
    *    the pair (LoMax, HiMin) to the SAME may-match test the pruner
    *    runs per file answers "could ANY row here fail the test?" —
    *    e.g. for `c > k` every file keeps iff min(max_f) > k. A part
    *    that provably cannot prune anything is skipped: skipping only
    *    ever KEEPS files, so envelope mistakes (rounding in the
    *    distributed decimal aggregate, a stale codec) cost IO, never
    *    correctness — the row-level tests and the query's own filters
    *    still run above.
    *
    * `numBad` = some bounded row's minv/maxv failed the decimal parse
    * (overflow past decimal(38,18) or a non-numeric string): numeric
    * proofs DECLINE for the part (it opens). Absent numeric/string/
    * micros quantities mean NO row carries bounds in that domain —
    * bound tests cannot prune there by construction. `anyFullNull`
    * keeps the part open under null-rejecting predicates (an all-null
    * file PRUNES under them); `minNulls == 0` keeps it open under
    * IS NULL. The envelope is advisory: a part with no recorded
    * envelope (older manifest) always opens. */
  case class ColEnv(col: String, n: Long, minFile: String, maxFile: String,
                    minNulls: Long, anyFullNull: Boolean, numBad: Boolean,
                    numLoMax: Option[String], numHiMin: Option[String],
                    strLoMax: Option[String], strHiMin: Option[String],
                    micLoMax: Option[Long], micHiMin: Option[Long])

  /** Envelope codec: the manifest stores one OPAQUE string per part
    * (the JSON layer URL-encodes it like any meta value), so all
    * envelope knowledge stays in this object. Fields are u0001-
    * joined, columns u0002-joined; strings URL-encoded so the
    * separators can never collide with data; optional fields are ""
    * for None and "=<urlenc>" for Some (Some("") encodes as "=").
    * decode returns None on ANY malformation — the consumer then
    * simply opens the part (advisory data degrades to round-18
    * behavior, never to a wrong skip). */
  def encodeEnv(cols: Seq[ColEnv]): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    def opt(o: Option[String]) = o.map("=" + enc(_)).getOrElse("")
    def optL(o: Option[Long]) = o.map("=" + _.toString).getOrElse("")
    cols.map(e => Seq(enc(e.col), e.n.toString, enc(e.minFile),
      enc(e.maxFile), e.minNulls.toString,
      if (e.anyFullNull) "1" else "0", if (e.numBad) "1" else "0",
      opt(e.numLoMax), opt(e.numHiMin), opt(e.strLoMax), opt(e.strHiMin),
      optL(e.micLoMax), optL(e.micHiMin)).mkString("\u0001"))
      .mkString("\u0002")
  }

  def decodeEnv(s: String): Option[Seq[ColEnv]] = try {
    def dec(v: String) = java.net.URLDecoder.decode(v, "UTF-8")
    def opt(v: String): Option[String] =
      if (v.isEmpty) None
      else if (v.startsWith("=")) Some(dec(v.substring(1)))
      else throw new IllegalArgumentException(v)
    if (s.isEmpty) Some(Nil)
    else Some(s.split("\u0002", -1).toSeq.map { part =>
      val f = part.split("\u0001", -1)
      require(f.length == 13)
      ColEnv(dec(f(0)), f(1).toLong, dec(f(2)), dec(f(3)), f(4).toLong,
        f(5) == "1", f(6) == "1", opt(f(7)), opt(f(8)), opt(f(9)),
        opt(f(10)), opt(f(11)).map(_.toLong), opt(f(12)).map(_.toLong))
    })
  } catch { case _: Exception => None }

  /** Driver-side envelope of one part's rows — the twin of the
    * distributed aggregate inside [[writeParts]], for the bounded
    * driver [[writePart]] paths (append delta, abort fallback). Same
    * semantics: quantities over rows carrying BOTH bounds; numeric
    * domain via exact BigDecimal (a parse failure sets numBad);
    * string domain in unsigned UTF-8 byte order (what minv/maxv
    * record — [[JournalStore.utf8Cmp]], identical to Spark's string
    * min/max); micros over rows with both minus and maxus. */
  def envelopeOf(stats: Seq[CStat]): Seq[ColEnv] =
    stats.groupBy(_.col).toSeq.sortBy(_._1).map { case (c, ss) =>
      val bounded = ss.filter(s => s.minv.isDefined && s.maxv.isDefined)
      val nums = bounded.map(s => (
        scala.util.Try(BigDecimal(s.minv.get)).toOption,
        scala.util.Try(BigDecimal(s.maxv.get)).toOption))
      val numBad = nums.exists(p => p._1.isEmpty || p._2.isEmpty)
      val numLo = nums.flatMap(_._1)
      val numHi = nums.flatMap(_._2)
      def strMax(vs: Seq[String]): Option[String] =
        vs.reduceOption((a, b) => if (JournalStore.utf8Cmp(a, b) >= 0) a else b)
      def strMin(vs: Seq[String]): Option[String] =
        vs.reduceOption((a, b) => if (JournalStore.utf8Cmp(a, b) <= 0) a else b)
      val mics = ss.filter(s => s.minus.isDefined && s.maxus.isDefined)
      ColEnv(c, ss.size.toLong,
        // file names in UTF-8 byte order — matching the distributed
        // twin's Spark string min/max (segment paths are ASCII: safe-ns
        // charset or Hive %-escapes, so every string order agrees; the
        // consult side compares with utf8Cmp regardless)
        strMin(ss.map(_.file)).get, strMax(ss.map(_.file)).get,
        ss.map(_.nulls).min, ss.exists(s => s.nulls >= s.rows),
        numBad,
        if (numBad || numLo.isEmpty) None else Some(numLo.max.toString),
        if (numBad || numHi.isEmpty) None else Some(numHi.min.toString),
        strMax(bounded.map(_.minv.get)), strMin(bounded.map(_.maxv.get)),
        if (mics.isEmpty) None else Some(mics.map(_.minus.get).max),
        if (mics.isEmpty) None else Some(mics.map(_.maxus.get).min))
    }

  private val schema = MessageTypeParser.parseMessageType(
    """message cstat {
      |  required binary file (UTF8);
      |  required binary col (UTF8);
      |  required int64 rows;
      |  required int64 nulls;
      |  optional binary minv (UTF8);
      |  optional binary maxv (UTF8);
      |  optional int64 minus;
      |  optional int64 maxus;
      |  required binary regs;
      |}""".stripMargin)

  def dir(storePath: String): java.nio.file.Path =
    java.nio.file.Paths.get(storePath, "cstats")

  /** Spark-facing shape of one sidecar row — the schema of the
    * DISTRIBUTED read/write twins below (the bootstrap/rewrite paths,
    * whose sidecar volume is files-proportional and must never
    * materialize on the driver). Field names mirror the parquet-java
    * message above; parquet reads by name, so the required-vs-optional
    * repetition difference between the two writers is invisible to
    * either reader. */
  val sparkSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("file", StringType), StructField("col", StringType),
      StructField("rows", LongType), StructField("nulls", LongType),
      StructField("minv", StringType), StructField("maxv", StringType),
      StructField("minus", LongType), StructField("maxus", LongType),
      StructField("regs", BinaryType)))
  }

  /** Product encoder for executor-side CStat assembly. */
  val cstatEncoder: org.apache.spark.sql.Encoder[CStat] =
    org.apache.spark.sql.Encoders.product[CStat]

  /** The given parts as ONE distributed DataFrame — the Spark-side
    * twin of [[readAll]] for the rewrite/consolidation paths. No
    * (file, col) precedence pass: within one manifest's part list a
    * LIVE file's sketch lives in exactly one part (a file is sketched
    * by the commit that created it; rewrites consolidate), and the
    * callers either filter to live files (consolidation) or certify
    * per-column contribution counts (the refold's exact-or-decline
    * coherence check catches any duplicate by count ≠ survivors).
    * THROWS on an unreadable part — callers abort the consolidation
    * and decline, never silently dropping a file's sketches the way
    * the scan path's lenient [[readPart]] may. The corrupt/missing-
    * file skip confs are pinned OFF per-read: under a session running
    * `spark.sql.files.ignoreCorruptFiles=true` (a common lake-shop
    * default) Spark would silently SKIP a damaged part instead of
    * throwing, and the consolidation would rotate the old parts out
    * with those files' sketches gone — exactly the silent drop the
    * abort contract exists to prevent. */
  def readFrame(spark: org.apache.spark.sql.SparkSession,
                storePath: String,
                parts: Seq[String]): org.apache.spark.sql.DataFrame =
    if (parts.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        sparkSchema)
    else spark.read.schema(sparkSchema)
      .option("ignoreCorruptFiles", "false")
      .option("ignoreMissingFiles", "false")
      .parquet(parts.map(p => dir(storePath).resolve(p).toString): _*)

  /** Write a CStat-shaped frame as a SET of immutable sidecar parts
    * from the WRITE TASKS — the distributed twin of [[writePart]]: the
    * frame is RANGE-partitioned on (col, file) to `nParts` (callers
    * size this to the [[JournalStore]] flush bound so each part stays
    * LRU-cacheable; the range layout gives every part a contiguous
    * column/file-name footprint, which is what makes the per-part
    * [[ColEnv]] envelopes selective — a hash layout would smear every
    * column and every file range across every part), written to a
    * staging dir by Spark's committer, and each task file is adopted
    * under a fresh UUID name (same-filesystem move, the promoteStaged
    * pattern). Before adoption, ONE distributed aggregate over the
    * staged bytes (page-cache-warm, grouped by the staged file name)
    * derives each part's envelope — the string domain via Spark's
    * native string min/max (unsigned UTF-8 byte order, identical to
    * [[JournalStore.utf8Cmp]]), the numeric domain via
    * try_cast(decimal(38,18)) with a per-part decline flag on any
    * failed parse (overflow/non-numeric → numeric proofs decline and
    * the part always opens). Returns (manifest-relative name, encoded
    * envelope) pairs; a crash mid-adopt strands only unreferenced
    * orphans (the manifest that would list them never committed),
    * which vacuum sweeps. */
  def writeParts(storePath: String,
                 df: org.apache.spark.sql.DataFrame,
                 nParts: Int): Seq[(String, String)] = {
    import org.apache.spark.sql.functions._
    val stage = java.nio.file.Paths.get(storePath,
      s".stage-cstats-${java.util.UUID.randomUUID()}")
    df.repartitionByRange(math.max(1, nParts), col("col"), col("file"))
      .write.mode("overwrite").parquet(stage.toString)
    val spark = df.sparkSession
    val bp = col("minv").isNotNull && col("maxv").isNotNull
    val decMin = expr("try_cast(minv as decimal(38,18))")
    val decMax = expr("try_cast(maxv as decimal(38,18))")
    val mic = col("minus").isNotNull && col("maxus").isNotNull
    // enumerate the staged part files EXPLICITLY: the staging dir is
    // dot-prefixed (hidden from every other store-root reader by
    // design), and Spark's hidden-path filter would silently ignore
    // the whole dir as a root path — the read-back must name the
    // normally-named leaf files themselves
    val stagedFiles: Seq[String] = {
      val walk = java.nio.file.Files.walk(stage)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .filter(p => p.toString.endsWith(".parquet") &&
            !p.getFileName.toString.startsWith("."))
          .map(_.toString).toList
      } finally walk.close()
    }
    val envByStaged: Map[String, Seq[ColEnv]] =
      if (stagedFiles.isEmpty) Map.empty
      else spark.read.schema(sparkSchema)
        .option("ignoreCorruptFiles", "false")
        .option("ignoreMissingFiles", "false")
        .parquet(stagedFiles: _*)
        .groupBy(input_file_name().as("__sf"), col("col"))
        .agg(count(lit(1L)).as("n"),
          min("file").as("f0"), max("file").as("f1"),
          min("nulls").as("nn"),
          max(when(col("nulls") >= col("rows"), 1L).otherwise(0L)).as("fn"),
          max(when(bp && (decMin.isNull || decMax.isNull), 1L)
            .otherwise(0L)).as("nbad"),
          max(when(bp, decMin)).cast("string").as("nl"),
          min(when(bp, decMax)).cast("string").as("nh"),
          max(when(bp, col("minv"))).as("sl"),
          min(when(bp, col("maxv"))).as("sh"),
          max(when(mic, col("minus"))).as("ml"),
          min(when(mic, col("maxus"))).as("mh"))
        .collect()
        .groupBy(r => r.getString(0).split("/").last)
        .map { case (staged, rs) =>
          staged -> rs.toSeq.map { r =>
            def optS(i: Int) =
              if (r.isNullAt(i)) None else Some(r.getString(i))
            def optL(i: Int) =
              if (r.isNullAt(i)) None else Some(r.getLong(i))
            val numBad = r.getLong(7) > 0
            ColEnv(r.getString(1), r.getLong(2), r.getString(3),
              r.getString(4), r.getLong(5), r.getLong(6) > 0, numBad,
              if (numBad) None else optS(8), if (numBad) None else optS(9),
              optS(10), optS(11), optL(12), optL(13))
          }.sortBy(_.col)
        }
    val names = Seq.newBuilder[(String, String)]
    // stage cleanup rides a finally: a Files.move throwing mid-adopt
    // must not strand the staging dir (plus any already-adopted orphan
    // UUID parts) until vacuum's age-gated sweep — the crash contract
    // tolerates that, but the non-crash exception path can tidy
    // eagerly (adopted orphans stay for vacuum as designed: the
    // manifest that would list them never commits)
    try {
      val walk = java.nio.file.Files.walk(stage)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .filter(p => p.toString.endsWith(".parquet") &&
            !p.getFileName.toString.startsWith("."))
          .foreach { p =>
            val name = java.util.UUID.randomUUID().toString + ".parquet"
            java.nio.file.Files.createDirectories(dir(storePath))
            java.nio.file.Files.move(p, dir(storePath).resolve(name),
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            // a staged file the envelope aggregate somehow missed
            // adopts with an EMPTY-encoded envelope of zero columns —
            // decodeEnv yields Nil, whose "no entries" reading keeps
            // the consumer conservative (the part opens)
            names += name -> encodeEnv(
              envByStaged.getOrElse(p.getFileName.toString, Nil))
          }
      } finally walk.close()
    } finally org.apache.commons.io.FileUtils.deleteQuietly(stage.toFile)
    names.result()
  }

  /** Test-visible seam counters: the round-18 contract is that the
    * analyze bootstrap and the rewrite refold/consolidation never run
    * files-proportional driver work — specs pin that the DRIVER part
    * writer and the driver-materializing [[readAll]] are not touched
    * by those paths (the scan pruner and append-delta writer remain
    * their only users, both bounded). */
  private[graft] val driverPartWrites =
    new java.util.concurrent.atomic.AtomicLong
  private[graft] val driverReadAlls =
    new java.util.concurrent.atomic.AtomicLong

  /** Part-PROBE seam counter (round 19): every [[readPart]] call —
    * LRU hit or parse — bumps it, so specs can pin that envelope
    * skipping really avoids touching parts a selective scan does not
    * need (the read-side twin of the write-side seam counters). */
  private[graft] val partProbes =
    new java.util.concurrent.atomic.AtomicLong

  /** Write one immutable part; returns its manifest-relative name. */
  def writePart(storePath: String, stats: Seq[CStat]): String = {
    driverPartWrites.incrementAndGet()
    val name = java.util.UUID.randomUUID().toString + ".parquet"
    java.nio.file.Files.createDirectories(dir(storePath))
    val factory = new SimpleGroupFactory(schema)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(
        dir(storePath).resolve(name).toString))
      .withType(schema)
      .build()
    try stats.foreach { s =>
      val g = factory.newGroup()
      g.append("file", s.file)
      g.append("col", s.col)
      g.append("rows", s.rows)
      g.append("nulls", s.nulls)
      s.minv.foreach(v => g.append("minv", v))
      s.maxv.foreach(v => g.append("maxv", v))
      s.minus.foreach(v => g.append("minus", v))
      s.maxus.foreach(v => g.append("maxus", v))
      g.append("regs", Binary.fromConstantByteArray(s.regs))
      writer.write(g)
    } finally writer.close()
    name
  }

  /** Part-level LRU (the FileStatsSidecar pattern): parts are
    * IMMUTABLE — random-UUID names, never rewritten — so cached
    * contents can never go stale. The cache is what keeps the SCAN
    * pruning path (every filtered read of an analyzed store probes
    * per-file bounds) a map hit instead of a parquet parse; oversized
    * consolidated parts bypass it rather than pinning the driver. */
  private val CachedParts = 32
  // rows here carry 512-byte register payloads (~6-10x a FileStat), so
  // the per-part cap stays at the FileStatsSidecar bound rather than
  // scaling up — worst-case pinned heap ~= 32 x 50k x ~600B ~= 1GB,
  // typical far less; larger consolidated parts bypass the cache
  private val CacheEntryCap = 50000
  private val cache =
    new java.util.LinkedHashMap[String, Vector[CStat]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Vector[CStat]]): Boolean =
        size() > CachedParts
    }

  /** Read one part (through the LRU). An unreadable part yields Nil —
    * the refold then sees files without sketches and DECLINES the
    * merged stats, and the scan pruner keeps the file (the
    * conservative fallback: a damaged sidecar costs a re-analyze or a
    * wasted read, never a wrong bound / dropped row). A FAILED read is
    * never cached — only a successful (possibly empty) parse is: parts
    * are immutable, so successes cannot go stale, but a transient IO
    * error must not pin "empty" into the LRU and permanently disable
    * skipping for that part (the next probe retries the parse). */
  def readPart(storePath: String, name: String): Seq[CStat] = {
    partProbes.incrementAndGet()
    val key = storePath + "\u0000" + name
    val hit = cache.synchronized(cache.get(key))
    if (hit != null) hit
    else readPartUncached(storePath, name) match {
      case Some(loaded) =>
        if (loaded.sizeIs <= CacheEntryCap)
          cache.synchronized(cache.put(key, loaded))
        loaded
      case None => Vector.empty
    }
  }

  private def readPartUncached(storePath: String,
                               name: String): Option[Vector[CStat]] = try {
    val reader = ParquetReader
      .builder(new GroupReadSupport(),
        new org.apache.hadoop.fs.Path(dir(storePath).resolve(name).toString))
      .build()
    try Some(Iterator.continually(reader.read()).takeWhile(_ != null).map { g =>
      def optStr(f: String): Option[String] =
        if (g.getFieldRepetitionCount(f) > 0) Some(g.getString(f, 0)) else None
      def optLong(f: String): Option[Long] =
        if (g.getFieldRepetitionCount(f) > 0) Some(g.getLong(f, 0)) else None
      CStat(g.getString("file", 0), g.getString("col", 0),
        g.getLong("rows", 0), g.getLong("nulls", 0),
        optStr("minv"), optStr("maxv"), optLong("minus"), optLong("maxus"),
        g.getBinary("regs", 0).getBytes)
    }.toVector)
    finally reader.close()
  } catch { case _: Exception => None }

  /** All rows of the given parts, keyed (file, col). Later parts win on
    * key collision — a rewrite's consolidated part supersedes any stale
    * delta row for the same file (cannot happen for LIVE files, since
    * file names are immutable and a file is sketched by exactly the
    * commit that created it, but dead-file rows linger in old deltas
    * until consolidation). */
  def readAll(storePath: String,
              parts: Seq[String]): Map[(String, String), CStat] = {
    driverReadAlls.incrementAndGet()
    val out = scala.collection.mutable.HashMap.empty[(String, String), CStat]
    parts.foreach(p => readPart(storePath, p).foreach(s =>
      out((s.file, s.col)) = s))
    out.toMap
  }
}
