package graft.journal

import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.MessageTypeParser

import JournalStore.{EpochStat, KeyStat}

/** Parquet checkpoint for the manifest ROOT's growing lists — the file
  * list, epoch stats and (epoch, ns) key stats (Delta's checkpoint
  * pattern finished: [[FileStatsSidecar]] already moved per-file stats
  * out of the JSON; this moves the remaining O(files)/O(epochs) lists,
  * so `manifest.json` is O(1) bytes at ANY file count — scalars,
  * the ≤[[JournalStore.RetainedCheckpoints]] checkpoint list, and two
  * short part-name lists).
  *
  * Why it matters at 100 TB: O(10⁶) segment files previously meant a
  * ~100 MB file-name JSON array parsed on the driver per snapshot load
  * — and writeManifest's CAS re-reads the manifest on EVERY commit, so
  * every append paid that parse twice. Now snapshot load parses a
  * few-hundred-byte JSON; list bytes live in immutable parquet parts
  * read lazily through an LRU (a map hit for the unchanged majority,
  * since parts are content-immutable under random UUID names).
  *
  * Write amplification: append() commits ONE small delta part holding
  * only this batch's new file names and batch-grain stats — the base is
  * neither loaded nor rewritten. Delta rows are RAW (unmerged): the
  * stat merges (sum rows / min / max, and the empty-key-range sentinel)
  * are associative, so the read-side fold over base+delta parts yields
  * exactly what the old eager in-manifest merge produced, and a
  * consolidated part (written by rewrite ops, or when the part count
  * passes [[RootSidecar.MaxParts]]) is just a pre-folded prefix.
  * Amortized commit cost: O(lists/MaxParts), the Delta periodic-
  * checkpoint bound.
  *
  * Failure semantics differ from the stats sidecar ON PURPOSE: fstats
  * are advisory (a damaged part only degrades pruning), but the file
  * list is AUTHORITATIVE — reading a damaged root part as empty would
  * silently shrink every scan's input. readPart therefore throws, the
  * same contract readManifest has for a corrupt root JSON. */
private[journal] object RootSidecar {
  /** Part-count cap before a commit consolidates to one part. */
  val MaxParts = 16

  // One row per list entry, discriminated by `kind`:
  //   0 = file    name=file-name
  //   1 = estat   a=epoch b=rows c=minSeq d=maxSeq
  //   2 = kstat   name=ns a=epoch b=minKey c=maxKey d=rows
  private val schema = MessageTypeParser.parseMessageType(
    """message mroot {
      |  required int32 kind;
      |  optional binary name (UTF8);
      |  optional int64 a;
      |  optional int64 b;
      |  optional int64 c;
      |  optional int64 d;
      |}""".stripMargin)

  def dir(storePath: String): java.nio.file.Path =
    java.nio.file.Paths.get(storePath, "mroot")

  /** One part's worth of list rows (either a raw delta or a fold). */
  final case class RootRows(files: Vector[String], stats: Vector[EpochStat],
                            kstats: Vector[KeyStat]) {
    def isEmpty: Boolean = files.isEmpty && stats.isEmpty && kstats.isEmpty
  }
  private val NoRows = RootRows(Vector.empty, Vector.empty, Vector.empty)

  // -- the merge arithmetic (the exact folds append() used to run
  //    eagerly inside the manifest; associative + idempotent on an
  //    already-folded list, which is what makes raw delta parts safe) --

  /** Order-preserving distinct — append order is the on-disk contract. */
  def mergeFiles(all: Seq[String]): Vector[String] = all.distinct.toVector

  def mergeEstats(all: Seq[EpochStat]): Vector[EpochStat] =
    all.groupBy(_.epoch).map { case (e, ss) =>
      EpochStat(e, ss.map(_.rows).sum, ss.map(_.minSeq).min,
        ss.map(_.maxSeq).max)
    }.toVector.sortBy(_.epoch)

  /** Empty key ranges carry the (minKey=1, maxKey=0) sentinel, the
    * identity of the range merge: rows always sum, ranges combine over
    * the non-sentinel entries only. */
  def mergeKstats(all: Seq[KeyStat]): Vector[KeyStat] =
    all.groupBy(k => (k.epoch, k.ns)).map { case ((e, n), ks) =>
      val rows = ks.map(_.rows).sum
      val nonEmpty = ks.filter(k => k.minKey <= k.maxKey)
      if (nonEmpty.isEmpty) KeyStat(e, n, 1L, 0L, rows)
      else KeyStat(e, n, nonEmpty.map(_.minKey).min,
        nonEmpty.map(_.maxKey).max, rows)
    }.toVector.sortBy(k => (k.epoch, k.ns))

  /** Write one immutable part; returns its manifest-relative name.
    * Random UUID names: a CAS-losing writer's orphan part can never
    * clobber the winner's; vacuum() sweeps orphans like segments. */
  def writePart(storePath: String, rows: RootRows): String = {
    val name = java.util.UUID.randomUUID().toString + ".parquet"
    java.nio.file.Files.createDirectories(dir(storePath))
    val factory = new SimpleGroupFactory(schema)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(dir(storePath).resolve(name).toString))
      .withType(schema)
      .build()
    try {
      rows.files.foreach { f =>
        val g = factory.newGroup(); g.append("kind", 0)
        g.append("name", Binary.fromString(f)); writer.write(g)
      }
      rows.stats.foreach { s =>
        val g = factory.newGroup(); g.append("kind", 1)
        g.append("a", s.epoch); g.append("b", s.rows)
        g.append("c", s.minSeq); g.append("d", s.maxSeq); writer.write(g)
      }
      rows.kstats.foreach { k =>
        val g = factory.newGroup(); g.append("kind", 2)
        g.append("name", Binary.fromString(k.ns))
        g.append("a", k.epoch); g.append("b", k.minKey)
        g.append("c", k.maxKey); g.append("d", k.rows); writer.write(g)
      }
    } finally writer.close()
    name
  }

  /** Part-level LRU (same shape as the stats sidecar's): parts are
    * immutable so entries can never go stale; the per-operation
    * manifest re-read becomes a map hit. Parts above [[CacheEntryCap]]
    * rows bypass the cache (re-read per access — correct, bounded
    * driver heap). */
  private val CachedParts = 32
  private val CacheEntryCap = 200000
  private val cache =
    new java.util.LinkedHashMap[String, RootRows](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, RootRows]): Boolean =
        size() > CachedParts
    }

  /** Read one part (through the LRU). Throws on a damaged part — the
    * file list is authoritative (see class doc). */
  def readPart(storePath: String, name: String): RootRows = {
    val key = storePath + "\u0000" + name
    val hit = cache.synchronized(cache.get(key))
    if (hit != null) hit
    else {
      val loaded = readPartUncached(storePath, name)
      if (loaded.files.size + loaded.stats.size + loaded.kstats.size <= CacheEntryCap)
        cache.synchronized(cache.put(key, loaded))
      loaded
    }
  }

  private def readPartUncached(storePath: String, name: String): RootRows = try {
    val reader = ParquetReader
      .builder(new GroupReadSupport(),
        new org.apache.hadoop.fs.Path(dir(storePath).resolve(name).toString))
      .build()
    val files = Vector.newBuilder[String]
    val stats = Vector.newBuilder[EpochStat]
    val kstats = Vector.newBuilder[KeyStat]
    try Iterator.continually(reader.read()).takeWhile(_ != null).foreach { g =>
      g.getInteger("kind", 0) match {
        case 0 => files += g.getString("name", 0)
        case 1 => stats += EpochStat(g.getLong("a", 0), g.getLong("b", 0),
          g.getLong("c", 0), g.getLong("d", 0))
        case 2 => kstats += KeyStat(g.getLong("a", 0), g.getString("name", 0),
          g.getLong("b", 0), g.getLong("c", 0), g.getLong("d", 0))
        case other => throw new IllegalStateException(
          s"unknown mroot row kind $other")
      }
    }
    finally reader.close()
    RootRows(files.result(), stats.result(), kstats.result())
  } catch {
    case e: Exception => throw new IllegalStateException(
      s"journal store at $storePath: manifest root part $name is " +
        "unreadable; the file list is authoritative so this cannot be " +
        "read as empty — restore the part or a retained manifest version",
      e)
  }

  /** One manifest snapshot's lists: sidecar parts plus an optional raw
    * not-yet-written delta, folded together on first access and cached
    * for the snapshot's lifetime. */
  final class Snap(val storePath: String, val parts: Seq[String],
                   val delta: RootRows) {
    lazy val merged: RootRows = {
      val loaded = parts.map(readPart(storePath, _))
      RootRows(
        mergeFiles(loaded.flatMap(_.files) ++ delta.files),
        mergeEstats(loaded.flatMap(_.stats) ++ delta.stats),
        mergeKstats(loaded.flatMap(_.kstats) ++ delta.kstats))
    }
    def structurallyEmpty: Boolean = parts.isEmpty && delta.isEmpty
  }

  /** Marker every lazy list view carries so writeManifest can dispatch
    * on shape without forcing a load. */
  sealed trait RootView { def snap: Snap }

  final class FilesView(val snap: Snap)
      extends scala.collection.immutable.Seq[String] with RootView {
    override def apply(i: Int): String = snap.merged.files(i)
    override def length: Int = snap.merged.files.length
    override def iterator: Iterator[String] = snap.merged.files.iterator
  }
  final class EstatsView(val snap: Snap)
      extends scala.collection.immutable.Seq[EpochStat] with RootView {
    override def apply(i: Int): EpochStat = snap.merged.stats(i)
    override def length: Int = snap.merged.stats.length
    override def iterator: Iterator[EpochStat] = snap.merged.stats.iterator
  }
  final class KstatsView(val snap: Snap)
      extends scala.collection.immutable.Seq[KeyStat] with RootView {
    override def apply(i: Int): KeyStat = snap.merged.kstats(i)
    override def length: Int = snap.merged.kstats.length
    override def iterator: Iterator[KeyStat] = snap.merged.kstats.iterator
  }

  def views(snap: Snap): (Seq[String], Seq[EpochStat], Seq[KeyStat]) =
    (new FilesView(snap), new EstatsView(snap), new KstatsView(snap))

  def fromParts(storePath: String,
                parts: Seq[String]): (Seq[String], Seq[EpochStat], Seq[KeyStat]) =
    views(new Snap(storePath, parts, NoRows))

  /** The append-path value: base untouched (no part load, no rewrite) +
    * this batch's raw rows as a pending delta. Non-sidecar bases
    * (legacy inline manifests, test-built Seqs) fold eagerly and
    * consolidate at commit. */
  def appended(files: Seq[String], stats: Seq[EpochStat], kstats: Seq[KeyStat],
               newFiles: Seq[String], batchStats: Seq[EpochStat],
               batchKstats: Seq[KeyStat])
      : (Seq[String], Seq[EpochStat], Seq[KeyStat]) =
    (files, stats, kstats) match {
      case (f: RootView, s: RootView, k: RootView)
          if (f.snap eq s.snap) && (s.snap eq k.snap) =>
        val sn = f.snap
        views(new Snap(sn.storePath, sn.parts, RootRows(
          sn.delta.files ++ newFiles, sn.delta.stats ++ batchStats,
          sn.delta.kstats ++ batchKstats)))
      case _ =>
        (mergeFiles(files ++ newFiles), mergeEstats(stats ++ batchStats),
          mergeKstats(kstats ++ batchKstats))
    }

  /** Part names the commit should reference — writing a delta part, a
    * consolidation, or nothing, by shape (mirrors the fstats dispatch:
    * lazy shapes are matched structurally so a commit that didn't touch
    * the lists never loads them). */
  def partsFor(storePath: String, files: Seq[String], stats: Seq[EpochStat],
               kstats: Seq[KeyStat]): Seq[String] =
    (files, stats, kstats) match {
      case (f: RootView, s: RootView, k: RootView)
          if (f.snap eq s.snap) && (s.snap eq k.snap) =>
        val sn = f.snap
        if (sn.structurallyEmpty) Nil
        else if (sn.delta.isEmpty && sn.parts.sizeIs <= MaxParts) sn.parts
        else if (!sn.delta.isEmpty && sn.parts.sizeIs < MaxParts)
          sn.parts :+ writePart(storePath, sn.delta)
        else Seq(writePart(storePath, sn.merged)) // cap hit: consolidate
      case _ =>
        if (files.isEmpty && stats.isEmpty && kstats.isEmpty) Nil
        else Seq(writePart(storePath, RootRows(mergeFiles(files),
          mergeEstats(stats), mergeKstats(kstats))))
    }

  /** Part names `files` is backed by, without loading — vacuum's
    * live-part sweep. None for inline (legacy) lists. */
  def partsOf(files: Seq[String]): Option[Seq[String]] = files match {
    case v: RootView => Some(v.snap.parts)
    case _ => None
  }
}
