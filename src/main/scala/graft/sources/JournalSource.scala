package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.StreamBatchBridge
import org.apache.spark.sql.sources._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.journal.JournalStore

/** `spark.read.format("journal")` — the journal store as a first-class
  * Spark data source, so a reference user's "open the log and query it"
  * entry point exists without touching the `JournalStore` API:
  *
  *   spark.read.format("journal").load("/path/to/store")          // scan
  *   spark.read.format("journal").option("asOfSeq", 5000).load(p) // state
  *   spark.read.format("journal").option("asOfTs", t).load(p)     // ″ by ts
  *   spark.read.format("journal").option("asOfVersion", 7).load(p) // ″ by manifest version
  *
  * Built on the stable DataSource V1 relation API (`RelationProvider` +
  * `PrunedFilteredScan`): the store already yields optimized DataFrames
  * (manifest-scoped file lists, checkpoint + bounded tail replay), so the
  * relation only needs to translate pushed filters — notably turning a
  * pushed `seq` bound into an `epoch` partition-directory bound, which is
  * what actually prunes IO at 100 TB (epoch dirs are partition columns;
  * `seq = epoch·epochSize + k` is arithmetic Spark can't derive itself).
  * Column pruning is forwarded so the parquet scan reads only requested
  * columns. Filters are ALSO left in the plan (Spark re-applies what DSv1
  * sources don't declare handled), so pruning here is pure IO savings,
  * never a correctness dependency.
  *
  * The source is also a sink — batch and streaming:
  *
  *   df.write.format("journal").mode("append").save(p)   // batch append
  *   df.writeStream.format("journal")
  *     .option("checkpointLocation", c).start(p)          // exactly-once
  *
  * Batch write: `Append` opens-or-creates (option `epochSize` sizes a
  * new store) and delegates to `JournalStore.append` — seq assignment,
  * epoch/ns layout, manifest swap, auto-checkpoint all apply unchanged.
  * A journal is an append-only log, so `Overwrite` is rejected rather
  * than silently truncating history.
  *
  * Streaming sink: each micro-batch appends with its batch id riding the
  * manifest swap ([[JournalStore.append(df:org\.apache\.spark\.sql\.DataFrame,streamBatchId:Option[Long])*]]);
  * after a crash, Spark replays the last uncommitted batch and the store
  * skips ids at or below its high-water mark — exactly-once ingest with
  * no dedup pass. Append and Update modes are both meaningful: the
  * journal keys state by (ns, ukey), so an update-mode stream lands each
  * revision as a new journal version, exactly the log's semantics. */
class JournalSource extends RelationProvider with CreatableRelationProvider
    with StreamSinkProvider with StreamSourceProvider with DataSourceRegister
    with TableProvider {
  override def shortName(): String = "journal"

  // --- DSv2 TableProvider: scan-mode batch reads plan as a columnar
  // BatchScan (see JournalV2). Every other mode returns a
  // capability-less table, which makes Spark fall back to the V1
  // relation (state mode), sink (batch + streaming writes) and source
  // (streaming tail) implemented below — one short name, each path on
  // the API that plans it best. ---
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JournalV2.tableFor(options).map(_.schema()).getOrElse(streamSchema)

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    JournalV2.tableFor(opts).getOrElse(
      new JournalStubTable(schema, Option(opts.get("path")).getOrElse("<none>")))
  }

  /** Schema of the streaming tail (the log's row surface; epoch is a
    * storage detail). Static so `readStream` can resolve before the
    * store has any data. */
  private val streamSchema = StructType.fromDDL(
    "seq BIGINT, ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE")

  private def openOrCreate(spark: org.apache.spark.sql.SparkSession,
                           path: String,
                           parameters: Map[String, String]): JournalStore =
    if (JournalStore.exists(path)) JournalStore.open(spark, path)
    else JournalStore.create(spark, path,
      parameters.get("epochSize").map(_.toLong).getOrElse(1000L))

  /** `df.write.format("journal")` — batch append. */
  override def createRelation(ctx: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("journal sink requires a path"))
    val exists = JournalStore.exists(path)
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalArgumentException(s"journal store already exists at $path")
      case SaveMode.Ignore if exists => () // no-op by contract
      case SaveMode.Overwrite =>
        throw new UnsupportedOperationException(
          "journal is an append-only log; Overwrite would truncate history " +
            "(use mode(\"append\"), or compact()/vacuum() for space)")
      case _ => openOrCreate(ctx.sparkSession, path, parameters).append(data)
    }
    createRelation(ctx, parameters) // readable relation over what landed
  }

  /** `df.writeStream.format("journal")` — exactly-once micro-batch sink. */
  override def createSink(ctx: SQLContext, parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("journal sink requires a path"))
    new Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        // re-root the micro-batch plan as a batch DF (the incremental
        // plan only executes inside the stream) — see StreamBatchBridge
        val batch = StreamBatchBridge.asBatchDF(data)
        openOrCreate(data.sparkSession, path, parameters)
          .append(batch, Some(batchId))
      }
      override def toString: String = s"JournalSink[$path]"
    }
  }

  /** `spark.readStream.format("journal")` — tail the log. The journal's
    * seq high-water mark IS the streaming offset: each micro-batch reads
    * exactly the records in (lastSeq, maxSeq], with the seq range turned
    * into epoch partition-directory bounds (bounded IO per batch no
    * matter how long the journal grows — marasa's tail-replay invariant
    * as a stream). Segments are immutable and the manifest swap is
    * atomic, so a batch is reproducible for replay after recovery:
    * together with the checkpointed offset log this gives exactly-once
    * delivery into any downstream sink. Writing the same store with the
    * `journal` streaming sink and tailing it with this source makes the
    * store a durable exactly-once queue. */
  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(streamSchema))

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("journal source requires a path"))
    // Admission control: without a cap, the first micro-batch after a
    // long consumer outage is the ENTIRE backlog (one batch = whole
    // (lastSeq, maxSeq] span) — a scale-killer on a busy log. With
    // maxSeqsPerTrigger=N each trigger advances the offset by at most N
    // seqs; the backlog drains over several bounded batches (the
    // FileStreamSource maxFilesPerTrigger idiom). Exactly-once
    // semantics are untouched: offsets remain plain seq watermarks and
    // a recovered batch replays the same span.
    val maxSeqsPerTrigger = parameters.get("maxSeqsPerTrigger").map(_.toLong)
    maxSeqsPerTrigger.foreach(n => require(n > 0,
      s"maxSeqsPerTrigger must be positive, got $n"))
    new Source {
      override def schema: StructType = streamSchema

      // High-water mark of seqs already handed out this run. Recovery
      // calls getBatch (with the checkpointed range) before the first
      // getOffset — the V1 source contract the Kafka source's rate
      // limit rests on too — so after a restart the cap throttles from
      // the checkpointed offset, never from scratch (which would emit a
      // backward offset and redeliver).
      private var delivered = -1L

      private def store: Option[JournalStore] =
        if (JournalStore.exists(path))
          Some(JournalStore.open(ctx.sparkSession, path)) else None

      private def seqOf(o: Offset): Long = o match {
        case l: LongOffset => l.offset
        case other => other.json.trim.toLong // SerializedOffset after restart
      }

      override def getOffset: Option[Offset] =
        store.map(_.manifest.maxSeq).filter(_ >= 0L).map { avail =>
          val t = maxSeqsPerTrigger.fold(avail)(cap => avail.min(delivered + cap))
          delivered = delivered.max(t)
          LongOffset(t)
        }

      override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
        val s = store.getOrElse(throw new IllegalStateException(
          s"journal store at $path vanished mid-stream"))
        val lo = start.map(seqOf).getOrElse(-1L)
        val hi = seqOf(end)
        delivered = delivered.max(hi)
        val rows = s.scanUnordered()
          .where(col("epoch") >= (lo + 1) / s.epochSize &&
                 col("epoch") <= hi / s.epochSize)
          .where(col("seq") > lo && col("seq") <= hi)
          .select("seq", "ns", "ukey", "ts", "payload", "val")
        StreamBatchBridge.asStreamingDF(rows)
      }

      override def stop(): Unit = ()
      override def toString: String = s"JournalStreamSource[$path]"
    }
  }

  override def createRelation(ctx: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("journal source requires a path"))
    // asOfVersion pins the read to a retained MANIFEST version (metadata
    // time travel — the pre-compaction file set), orthogonal to
    // asOfSeq/asOfTs which time-travel the DATA under one manifest
    val store0 = JournalStore.open(ctx.sparkSession, path)
    val store = parameters.get("asOfVersion").map(_.toLong)
      .fold(store0)(store0.openAt)
    val asOfSeq = parameters.get("asOfSeq").map(_.toLong)
    val asOfTs = parameters.get("asOfTs")
    val ns = parameters.get("ns")
    val epochSize = store.epochSize

    // state mode (point-in-time read) vs scan mode (raw log); the ns
    // option filters BOTH modes. asOfTs accepts ISO-8601 'T' or the
    // JDBC space-separated form.
    val base0 = (asOfSeq, asOfTs) match {
      case (Some(s), _) => store.stateAt(s)
      case (None, Some(t)) =>
        store.stateAtTs(java.sql.Timestamp.valueOf(t.replace('T', ' ')))
      case _ => store.scanUnordered()
    }
    val base = ns.fold(base0)(n => base0.where(col("ns") === n))
    val isScan = asOfSeq.isEmpty && asOfTs.isEmpty

    new BaseRelation with PrunedFilteredScan {
      override val sqlContext: SQLContext = ctx
      override val schema: StructType = base.schema

      override def buildScan(requiredColumns: Array[String],
                             filters: Array[Filter]): RDD[Row] = {
        // a pushed `ukey =` (scan mode) rebuilds the base over the
        // manifest's key-stat-pruned file list — file-level data
        // skipping the partition directories can't express; the row
        // filters below still apply, so pruning is IO-only
        val keyEq = if (isScan) filters.collectFirst {
          case EqualTo("ukey", v: Long) => v } else None
        val nsEq = filters.collectFirst {
          case EqualTo("ns", v: String) => v }.orElse(ns)
        var d = keyEq match {
          case Some(_) =>
            val pruned = store.scanUnorderedPruned(nsEq, keyEq)
            nsEq.fold(pruned)(n => pruned.where(col("ns") === n))
          case None => base
        }
        if (isScan) filters.foreach {
          // seq bounds → epoch partition-dir bounds (the IO pruner) +
          // the row-level bound itself
          case GreaterThan("seq", v: Long) =>
            d = d.where(col("epoch") >= v / epochSize && col("seq") > v)
          case GreaterThanOrEqual("seq", v: Long) =>
            d = d.where(col("epoch") >= v / epochSize && col("seq") >= v)
          case LessThan("seq", v: Long) =>
            d = d.where(col("epoch") <= v / epochSize && col("seq") < v)
          case LessThanOrEqual("seq", v: Long) =>
            d = d.where(col("epoch") <= v / epochSize && col("seq") <= v)
          case EqualTo("seq", v: Long) =>
            d = d.where(col("epoch") === v / epochSize && col("seq") === v)
          case EqualTo("ns", v: String) => d = d.where(col("ns") === v)
          case EqualTo("ukey", v: Long) => d = d.where(col("ukey") === v)
          case _ => () // unsupported filters: Spark re-applies them anyway
        }
        val cols = if (requiredColumns.isEmpty) Array(schema.fieldNames.head)
                   else requiredColumns
        d.select(cols.map(col).toIndexedSeq: _*).rdd
      }
    }
  }
}
