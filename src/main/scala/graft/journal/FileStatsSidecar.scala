package graft.journal

import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.MessageTypeParser

import JournalStore.FileStat

/** Parquet sidecar for the manifest's per-FILE stats (Delta's checkpoint
  * pattern, applied to the one manifest family that grows with file
  * count): each commit's `fstats` live in immutable parquet PART files
  * under `<store>/fstats/`, and the JSON root carries only their names.
  *
  * Why: a FileStat carries an 8 KiB key bloom, so at O(10⁵-10⁶) files
  * (100 TB of segments) inlining fstats makes the root a multi-GB JSON
  * that every snapshot load parses on the driver. With the sidecar the
  * root stays O(file-name list); loading a snapshot parses O(1) stats
  * JSON, and the stats bytes are read lazily — only by operations that
  * actually prune or rewrite (see [[LazyFileStats]]), never by scan/
  * state reads that don't touch per-file stats.
  *
  * Write amplification: append() contributes only its NEW files' stats
  * as one small part ([[AppendedFileStats]]); rewriting ops (compact,
  * deleteWhere) consolidate, and a part-count cap re-consolidates every
  * [[FileStatsSidecar.MaxParts]] commits so read fan-in stays bounded —
  * amortized O(files/MaxParts) bytes per commit, the same bound Delta
  * gets from periodic parquet checkpoints over incremental commits.
  *
  * Parts are plain parquet (written driver-side through parquet-hadoop's
  * example writer — no Spark job per commit), so at real scale the same
  * files are also readable DISTRIBUTEDLY via spark.read.parquet if stats
  * processing itself ever outgrows the driver. Part names are random
  * UUIDs: a CAS-losing writer can never overwrite the winner's part, its
  * orphan part is swept by vacuum() like an orphan segment. */
private[journal] object FileStatsSidecar {
  /** Part-count cap before a commit consolidates to one part. */
  val MaxParts = 16

  private val schema = MessageTypeParser.parseMessageType(
    """message fstat {
      |  required binary file (UTF8);
      |  required int64 rows;
      |  required int64 minSeq;
      |  required int64 maxSeq;
      |  required int64 minKey;
      |  required int64 maxKey;
      |  required int64 tsMin;
      |  required int64 tsMax;
      |  required int64 nullTs;
      |  required binary bloom;
      |}""".stripMargin)

  def dir(storePath: String): java.nio.file.Path =
    java.nio.file.Paths.get(storePath, "fstats")

  /** Write one immutable part; returns its manifest-relative name. */
  def writePart(storePath: String, stats: Seq[FileStat]): String = {
    val name = java.util.UUID.randomUUID().toString + ".parquet"
    java.nio.file.Files.createDirectories(dir(storePath))
    val factory = new SimpleGroupFactory(schema)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(dir(storePath).resolve(name).toString))
      .withType(schema)
      .build()
    try stats.foreach { s =>
      val g = factory.newGroup()
      g.append("file", s.file)
      g.append("rows", s.rows)
      g.append("minSeq", s.minSeq); g.append("maxSeq", s.maxSeq)
      g.append("minKey", s.minKey); g.append("maxKey", s.maxKey)
      g.append("tsMin", s.tsMin); g.append("tsMax", s.tsMax)
      g.append("nullTs", s.nullTs)
      g.append("bloom", Binary.fromConstantByteArray(
        if (s.bloom.isEmpty) Array.emptyByteArray
        else java.util.Base64.getDecoder.decode(s.bloom)))
      writer.write(g)
    } finally writer.close()
    name
  }

  /** Read one part. An unreadable part yields Nil — stats-free files are
    * simply never pruned (the conservative fallback every stats family
    * already has), and the rewrite paths rebuild stats by scanning, so a
    * damaged sidecar degrades pruning precision, never correctness. */
  def readPart(storePath: String, name: String): Seq[FileStat] = try {
    val reader = ParquetReader
      .builder(new GroupReadSupport(),
        new org.apache.hadoop.fs.Path(dir(storePath).resolve(name).toString))
      .build()
    try Iterator.continually(reader.read()).takeWhile(_ != null).map { g =>
      val bloomBytes = g.getBinary("bloom", 0).getBytes
      FileStat(g.getString("file", 0), g.getLong("rows", 0),
        g.getLong("minSeq", 0), g.getLong("maxSeq", 0),
        g.getLong("minKey", 0), g.getLong("maxKey", 0),
        g.getLong("tsMin", 0), g.getLong("tsMax", 0),
        g.getLong("nullTs", 0),
        if (bloomBytes.isEmpty) ""
        else java.util.Base64.getEncoder.encodeToString(bloomBytes))
    }.toVector
    finally reader.close()
  } catch { case _: Exception => Nil }

  /** The fstats value append() commits: base untouched (no part load, no
    * part rewrite) + this batch's stats as a pending delta. Non-sidecar
    * bases (legacy inline manifests, test-constructed Seqs) concatenate
    * eagerly and consolidate at the next commit. */
  def appended(base: Seq[FileStat], extra: Seq[FileStat]): Seq[FileStat] =
    base match {
      case lf: LazyFileStats => new AppendedFileStats(lf, extra.toVector)
      case af: AppendedFileStats =>
        new AppendedFileStats(af.base, af.extra ++ extra)
      case s => s ++ extra
    }

  /** Part names `fstats` is backed by, or None when it needs (re)writing. */
  def partsOf(fstats: Seq[FileStat]): Option[Seq[String]] = fstats match {
    case lf: LazyFileStats => Some(lf.parts)
    case af: AppendedFileStats if af.extra.isEmpty => Some(af.base.parts)
    case _ => None
  }
}

/** Manifest fstats backed by sidecar parts, loaded on first access and
  * cached for the manifest snapshot's lifetime. Operations that never
  * touch per-file stats (scan, state reads, checkpoint commits) never
  * read a part. */
private[journal] final class LazyFileStats(
    val storePath: String, val parts: Seq[String])
    extends scala.collection.immutable.Seq[FileStat] {
  private lazy val loaded: Vector[FileStat] =
    parts.flatMap(FileStatsSidecar.readPart(storePath, _)).toVector
  override def apply(i: Int): FileStat = loaded(i)
  override def length: Int = loaded.length
  override def iterator: Iterator[FileStat] = loaded.iterator
}

/** A sidecar-backed base plus this commit's not-yet-written delta. */
private[journal] final class AppendedFileStats(
    val base: LazyFileStats, val extra: Vector[FileStat])
    extends scala.collection.immutable.Seq[FileStat] {
  private lazy val all: Vector[FileStat] = base.toVector ++ extra
  override def apply(i: Int): FileStat = all(i)
  override def length: Int = all.length
  override def iterator: Iterator[FileStat] = all.iterator
}
