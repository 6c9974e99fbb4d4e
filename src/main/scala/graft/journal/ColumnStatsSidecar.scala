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

  /** Write one immutable part; returns its manifest-relative name. */
  def writePart(storePath: String, stats: Seq[CStat]): String = {
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
    * wasted read, never a wrong bound / dropped row). */
  def readPart(storePath: String, name: String): Seq[CStat] = {
    val key = storePath + "\u0000" + name
    val hit = cache.synchronized(cache.get(key))
    if (hit != null) hit
    else {
      val loaded = readPartUncached(storePath, name)
      if (loaded.sizeIs <= CacheEntryCap)
        cache.synchronized(cache.put(key, loaded))
      loaded
    }
  }

  private def readPartUncached(storePath: String,
                               name: String): Vector[CStat] = try {
    val reader = ParquetReader
      .builder(new GroupReadSupport(),
        new org.apache.hadoop.fs.Path(dir(storePath).resolve(name).toString))
      .build()
    try Iterator.continually(reader.read()).takeWhile(_ != null).map { g =>
      def optStr(f: String): Option[String] =
        if (g.getFieldRepetitionCount(f) > 0) Some(g.getString(f, 0)) else None
      def optLong(f: String): Option[Long] =
        if (g.getFieldRepetitionCount(f) > 0) Some(g.getLong(f, 0)) else None
      CStat(g.getString("file", 0), g.getString("col", 0),
        g.getLong("rows", 0), g.getLong("nulls", 0),
        optStr("minv"), optStr("maxv"), optLong("minus"), optLong("maxus"),
        g.getBinary("regs", 0).getBytes)
    }.toVector
    finally reader.close()
  } catch { case _: Exception => Vector.empty }

  /** All rows of the given parts, keyed (file, col). Later parts win on
    * key collision — a rewrite's consolidated part supersedes any stale
    * delta row for the same file (cannot happen for LIVE files, since
    * file names are immutable and a file is sketched by exactly the
    * commit that created it, but dead-file rows linger in old deltas
    * until consolidation). */
  def readAll(storePath: String,
              parts: Seq[String]): Map[(String, String), CStat] = {
    val out = scala.collection.mutable.HashMap.empty[(String, String), CStat]
    parts.foreach(p => readPart(storePath, p).foreach(s =>
      out((s.file, s.col)) = s))
    out.toMap
  }
}
