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
    * frame is repartitioned to `nParts` (callers size this to the
    * [[JournalStore]] flush bound so each part stays LRU-cacheable),
    * written to a staging dir by Spark's committer, and each task file
    * is adopted under a fresh UUID name (same-filesystem move, the
    * promoteStaged pattern). Returns the manifest-relative names; a
    * crash mid-adopt strands only unreferenced orphans (the manifest
    * that would list them never committed), which vacuum sweeps. */
  def writeParts(storePath: String,
                 df: org.apache.spark.sql.DataFrame,
                 nParts: Int): Seq[String] = {
    val stage = java.nio.file.Paths.get(storePath,
      s".stage-cstats-${java.util.UUID.randomUUID()}")
    df.repartition(math.max(1, nParts))
      .write.mode("overwrite").parquet(stage.toString)
    val names = Seq.newBuilder[String]
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
          names += name
        }
    } finally walk.close()
    org.apache.commons.io.FileUtils.deleteQuietly(stage.toFile)
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
