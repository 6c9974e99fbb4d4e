package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo => CEq, Expression, GreaterThan => CGt, GreaterThanOrEqual => CGte, LessThan => CLt, LessThanOrEqual => CLte, Literal}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.{FileStatusCache, InMemoryFileIndex, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.journal.JournalStore

/** DataSource V2 surface of the `journal` format — the SCAN-mode read
  * path (`spark.read.format("journal").load(path)`, the raw log as a
  * table). The V1 `PrunedFilteredScan` relation ended in
  * `DataFrame.rdd`: every scan paid an InternalRow→Row conversion and
  * forfeited the vectorized parquet reader plus the whole-stage codegen
  * above it — the single hottest path at 100 TB, where every analytical
  * read starts from a log scan. Here the table delegates straight to
  * Spark's own `ParquetScanBuilder`/`ParquetScan` over an
  * `InMemoryFileIndex` built from the MANIFEST's file list (snapshot
  * isolation: files outside the manifest stay invisible), so a journal
  * scan plans exactly like a first-class parquet table — columnar
  * batches, filter/column pushdown, epoch/ns partition pruning — with
  * two journal-specific additions:
  *
  *  - pushed `seq` bounds are translated to `epoch` partition-directory
  *    bounds (`epoch = seq div epochSize` is store arithmetic Catalyst
  *    can't derive), so a tail read opens only tail directories;
  *  - a pushed `ukey =` probe prunes FILES through the manifest's
  *    per-file key ranges (the same data-skipping stats the store API
  *    uses), below directory granularity.
  *
  * State-mode reads (asOfSeq/asOfTs — aggregations, not scans) and all
  * writes stay on the V1 paths: the provider hands back a
  * capability-less table and Spark falls through to the V1
  * relation/sink, which already plan their heavy lifting (checkpoint +
  * bounded tail replay) as ordinary vectorized DataFrames. */
private[sources] object JournalV2 {

  /** File index over the manifest's (possibly pruned) relative file
    * list. `basePath` makes epoch=K/ns=X directory values partition
    * columns; the user-specified schema pins their types (ns STRING —
    * a numeric-looking namespace must not be inferred int). */
  def fileIndex(spark: SparkSession, segDir: String, relFiles: Seq[String],
                fullSchema: StructType): InMemoryFileIndex =
    new InMemoryFileIndex(spark, relFiles.map(f => new Path(s"$segDir/$f")),
      Map("basePath" -> segDir), Some(fullSchema),
      FileStatusCache.getOrCreate(spark), None, None)

  /** Read-only V2 table when scan mode applies: store exists, has files,
    * and no state-mode/ns option is present (asOfVersion pins the
    * manifest snapshot and is honored here). None → caller returns a
    * capability-less stub and Spark falls back to the V1 relation. */
  def tableFor(options: CaseInsensitiveStringMap): Option[JournalTable] = {
    val path = Option(options.get("path"))
    if (path.isEmpty || !JournalStore.exists(path.get) ||
        options.containsKey("asOfSeq") || options.containsKey("asOfTs") ||
        options.containsKey("ns")) None
    else {
      val spark = SparkSession.active
      val s0 = JournalStore.open(spark, path.get)
      val store = Option(options.get("asOfVersion")).map(_.toLong)
        .fold(s0)(s0.openAt)
      if (store.manifest.files.isEmpty) None
      else Some(new JournalTable(spark, path.get, store))
    }
  }
}

private[sources] class JournalTable(spark: SparkSession, storePath: String,
                                    store: JournalStore)
    extends Table with SupportsRead {
  private val segDir = s"$storePath/segments"
  private val m = store.manifest // one snapshot for the table's lifetime

  private val manifestSchema: StructType =
    if (m.schemaDdl.nonEmpty) StructType.fromDDL(m.schemaDdl)
    else StructType.fromDDL(
      "ns STRING, ukey BIGINT, ts TIMESTAMP, payload STRING, " +
        "val DOUBLE, seq BIGINT, epoch BIGINT")

  /** Schema of the parquet files themselves: epoch and ns live in the
    * directory structure, not the file columns. */
  private val dataSchema =
    StructType(manifestSchema.filterNot(f => f.name == "epoch" || f.name == "ns"))

  /** User-facing column order — identical to the V1 relation's
    * scanUnordered surface (canonical journal columns first, evolved
    * extras next, the epoch storage column last). */
  private val tableSchema: StructType = {
    val canonical = Seq("seq", "ns", "ukey", "ts", "payload", "val")
    val byName = manifestSchema.map(f => f.name -> f).toMap
    val head = canonical.flatMap(byName.get)
    val rest = manifestSchema
      .filterNot(f => canonical.contains(f.name) || f.name == "epoch")
    StructType(head ++ rest ++ byName.get("epoch"))
  }

  override def name(): String = s"journal:$storePath"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JournalScanBuilder(spark,
      JournalV2.fileIndex(spark, segDir, m.files, tableSchema),
      tableSchema, dataSchema, options, store.epochSize, m.files,
      m.fstats.map(s => s.file -> s).toMap, segDir)
}

/** `ParquetScanBuilder` with the two journal extensions (seq→epoch
  * partition bounds; ukey→per-file-stats pruning). Everything else —
  * column pruning, parquet predicate pushdown, partition pruning on
  * direct epoch/ns filters, vectorized reading — is inherited. */
private[sources] class JournalScanBuilder(
    spark: SparkSession, fileIndex: PartitioningAwareFileIndex,
    fullSchema: StructType, dataSchema: StructType,
    options: CaseInsensitiveStringMap, epochSize: Long,
    relFiles: Seq[String], fstats: Map[String, JournalStore.FileStat],
    segDir: String)
  extends ParquetScanBuilder(spark, fileIndex, fullSchema, dataSchema, options) {

  /** Pushed seq bounds arrive as data filters (seq is a file column);
    * derive the matching epoch directory bounds and append them to the
    * builder's partition filters — pruning whole directories on top of
    * the per-row-group min/max skipping the data filter already gets.
    * The derived filter binds by NAME inside the file index's partition
    * pruner, so a fresh attribute is sufficient. Bounds are
    * conservative (integer floor) and the original row filter always
    * remains — IO-only, never load-bearing for correctness. */
  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    val remaining = super.pushFilters(filters)
    val epochAttr = AttributeReference("epoch", LongType)()
    def lng(l: Literal): Option[Long] = l.value match {
      case i: Int => Some(i.toLong)
      case j: Long => Some(j)
      case s: Short => Some(s.toLong)
      case _ => None
    }
    def seqAttr(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == "seq"
      case _ => false
    }
    val derived = filters.flatMap {
      case CGt(a, l: Literal) if seqAttr(a) =>
        lng(l).map(v => CGte(epochAttr, Literal((v + 1) / epochSize)))
      case CGte(a, l: Literal) if seqAttr(a) =>
        lng(l).map(v => CGte(epochAttr, Literal(v / epochSize)))
      case CLt(a, l: Literal) if seqAttr(a) =>
        lng(l).map(v => CLte(epochAttr, Literal((v - 1).max(0L) / epochSize)))
      case CLte(a, l: Literal) if seqAttr(a) =>
        lng(l).map(v => CLte(epochAttr, Literal(v / epochSize)))
      case CEq(a, l: Literal) if seqAttr(a) =>
        lng(l).map(v => CEq(epochAttr, Literal(v / epochSize)))
      case CGt(l: Literal, a) if seqAttr(a) => // v > seq  ⇒  seq < v
        lng(l).map(v => CLte(epochAttr, Literal((v - 1).max(0L) / epochSize)))
      case CGte(l: Literal, a) if seqAttr(a) =>
        lng(l).map(v => CLte(epochAttr, Literal(v / epochSize)))
      case CLt(l: Literal, a) if seqAttr(a) =>
        lng(l).map(v => CGte(epochAttr, Literal((v + 1) / epochSize)))
      case CLte(l: Literal, a) if seqAttr(a) =>
        lng(l).map(v => CGte(epochAttr, Literal(v / epochSize)))
      case _ => None
    }
    if (derived.nonEmpty) partitionFilters = partitionFilters ++ derived
    remaining
  }

  /** A pushed `ukey =` probe swaps in a file index over only the files
    * whose per-file key range (manifest fstats) can contain the key —
    * file-level data skipping the partition directories can't express.
    * Files without stats are always kept (exact-or-conservative, the
    * same contract as the store API's pruning). */
  override def build(): ParquetScan = {
    val scan = super.build()
    val keyEq = pushedDataFilters.collectFirst {
      case sources.EqualTo("ukey", v: Long) => v
      case sources.EqualTo("ukey", v: java.lang.Long) => v.longValue
      case sources.EqualTo("ukey", v: Int) => v.toLong
    }
    keyEq match {
      case Some(k) =>
        val pruned = relFiles.filter(f =>
          fstats.get(f).forall(s => s.minKey <= k && k <= s.maxKey))
        if (pruned.size < relFiles.size)
          scan.copy(fileIndex =
            JournalV2.fileIndex(spark, segDir, pruned, fullSchema))
        else scan
      case None => scan
    }
  }
}

/** Capability-less table: returned whenever V2 scan mode does not apply
  * (missing/empty store, state-mode options, writes). Spark sees no
  * BATCH_READ/WRITE capability and falls back to the V1
  * relation/sink/source paths on the same provider class. */
private[sources] class JournalStubTable(s: StructType, path: String) extends Table {
  override def name(): String = s"journal:$path"
  override def schema(): StructType = s
  override def capabilities(): util.Set[TableCapability] =
    util.Collections.emptySet()
}
