package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Det

/** SURVEY.md §2.I — Structured Streaming transforms. Each is the SAME
  * declarative expression as its batch twin in ops.StreamBatchOps (that's
  * the point: one logical plan, two execution modes), plus the genuinely
  * stateful ops that only exist in streaming.
  *
  * Scale design: state is bounded by watermarks (windows/dedup state
  * evicted once the watermark passes), keyed state partitions on the
  * grouping key across executors, and sinks go through foreachBatch so
  * every micro-batch re-enters the optimized batch path.
  */
object StreamingOps {

  /** Tumbling 1h window agg with a 10-minute watermark (late rows beyond
    * the watermark are dropped — asserted in StreamingSpec). */
  def tumbling(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("val_sum"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
              col("event_type"), col("n"), col("val_sum"))

  /** Session windows (30-minute gap) per user. */
  def sessions(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("s_start"),
              col("sw.end").as("s_end"), col("n_events"))

  /** Stateful streaming twin of dedup_exact: duplicates arriving within
    * the watermark horizon are dropped exactly once. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "props")

  /** Streaming twin of dedup_minhash at the document level
    * (stream_dedup_minhash): the 8-permutation MinHash signature is
    * computed ENTIRELY map-side — an array fold over the row's own
    * 3-shingles, no explode and no shuffle — then
    * dropDuplicatesWithinWatermark on the signature suppresses any
    * later arrival whose shingle set collides on all 8 permutations
    * within the watermark horizon. State is one row per distinct
    * signature, evicted by the watermark — bounded no matter how long
    * the stream runs. Input schema: (doc_id, text, ts). */
  def dedupMinhashStream(docs: DataFrame): DataFrame =
    withMinhashSig(docs)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("sig")

  /** Map-side MinHash signature column for (doc_id, text, ts) rows —
    * shared by the watermark-state dedup above and the journal-indexed
    * durable dedup below. Docs too short to form a 3-shingle are NOT
    * dropped: they fall back to an exact-text signature (prefixed so it
    * can't collide with a minhash signature), i.e. exact dedup for
    * short docs. */
  private def withMinhashSig(docs: DataFrame): DataFrame = {
    graft.expr.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("w", split(col("text"), " "))
      .withColumn("sh",
        when(size(col("w")) >= 3, graft.ops.LlmOps.shingles(3))
          .otherwise(typedLit(Seq.empty[String])))
      .withColumn("sig",
        when(size(col("sh")) > 0, graft.ops.LlmExtOps.minhashSigExpr("sh"))
          .otherwise(concat(lit("raw:"), col("text"))))
      .drop("w", "sh")
  }

  /** DURABLE streaming dedup: [[dedupMinhashStream]]'s state lives in
    * the query's state store and is evicted at the watermark — a
    * duplicate arriving beyond the horizon (or into a different query
    * incarnation whose checkpoint was discarded) passes. This variant
    * indexes every emitted signature in a JOURNAL store, so suppression
    * is permanent: any later arrival of a seen signature — hours later,
    * after a checkpointed restart, from a rebuilt query — is dropped.
    *
    * foreachBatch shape (the Spark idiom for stream+static-index):
    * per micro-batch, (1) first-arrival dedup WITHIN the batch (keyed
    * window on sig — parallel, no global state), (2) anti-join against
    * the index's signatures (a columnar journal scan; at 100 TB the
    * index store's (epoch, ns) layout plus auto-compaction keep this a
    * bounded parquet join, shuffled on sig), (3) emit survivors, (4)
    * append the new signatures to the index carrying the micro-batch id
    * — the journal's exactly-once ingest contract.
    *
    * `emit` MUST be batch-id idempotent (e.g. a journal-sink append with
    * the same id): on replay-after-crash the index may already contain
    * the batch's signatures, so survivors recompute as empty and only
    * the sink's own id high-water mark guarantees the original emission
    * survived. This is the same contract Spark's own foreachBatch
    * documentation demands of sinks. */
  def durableDedupBatch(indexPath: String,
                        emit: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      import org.apache.spark.sql.expressions.Window
      val s = batch.sparkSession
      val sigged = withMinhashSig(batch)
      val first = sigged
        .withColumn("rn", row_number().over(
          Window.partitionBy("sig").orderBy("ts", "doc_id")))
        .where(col("rn") === 1).drop("rn")
      val store =
        if (graft.journal.JournalStore.exists(indexPath))
          graft.journal.JournalStore.open(s, indexPath)
        else graft.journal.JournalStore.create(s, indexPath, epochSize = 100000L)
      val seen = store.scanUnordered().select(col("payload").as("sig"))
      val fresh = first.join(seen, Seq("sig"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        emit(fresh.drop("sig"), batchId)
        // ukey = 64-bit hash for the store's key pruning; the full
        // signature rides payload (the anti-join compares exactly, so a
        // hash collision costs nothing)
        store.withAutoCompact(16).append(
          fresh.select(lit("sig").as("ns"), xxhash64(col("sig")).as("ukey"),
            col("ts"), col("sig").as("payload"), lit(0.0).as("val")),
          Some(batchId))
      } finally fresh.unpersist()
    }

  /** Stream-stream interval join — click→impression attribution, the
    * canonical two-stream training-data primitive: each click joins the
    * same user's impressions that happened in the 5 minutes before it.
    * Both sides carry watermarks and the join condition bounds event
    * time in BOTH directions, so Spark's stream-stream join can evict
    * buffered state once the watermark passes — state stays bounded by
    * (watermark + interval), partitioned on user_id across executors,
    * no matter how long the streams run. */
  def attributeClicks(impressions: DataFrame, clicks: DataFrame): DataFrame =
    attributeClicksJoin(impressions, clicks, "inner")

  /** Same interval join with a caller-chosen join type. LEFT OUTER is
    * the "every click reported, attributed or not" variant: an
    * unmatched click emits with null impression columns once the
    * watermark proves no in-window impression can still arrive —
    * correctness rides the same bounded state eviction as the inner
    * form, no extra buffering. */
  def attributeClicksJoin(impressions: DataFrame, clicks: DataFrame,
                          joinType: String): DataFrame = {
    val imp = impressions.select(col("user_id").as("i_user"),
      col("ts").as("i_ts"), col("props").as("i_props"))
      .withWatermark("i_ts", "10 minutes")
    val clk = clicks.select(col("user_id").as("c_user"),
      col("ts").as("c_ts"), col("event_id").as("c_id"))
      .withWatermark("c_ts", "10 minutes")
    clk.join(imp,
      expr("c_user = i_user AND i_ts <= c_ts AND " +
        "i_ts >= c_ts - INTERVAL 5 MINUTES"), joinType)
      .select(col("c_id"), col("c_user").as("user_id"),
              col("c_ts"), col("i_ts"), col("i_props"))
  }

  /** Arbitrary stateful op: running per-user event count via
    * flatMapGroupsWithState (SURVEY §2.I stream_stateful_counter). */
  def runningCounts(events: Dataset[Ev]): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator((user, n))
      }
  }

  /** Same semantic on Spark 4's transformWithState API (typed ValueState,
    * RocksDB state store) — the forward-looking arbitrary-state surface. */
  def runningCountsTws(events: Dataset[Ev]): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningCountProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** Running per-user top-k metric values (transformWithState ListState;
    * see [[TopKProcessor]]). */
  def runningTopKTws(events: Dataset[Ev], k: Int): Dataset[(Long, String)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TopKProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }
}

/** Running per-key top-k on transformWithState's LIST state surface
  * (ValueState is covered by RunningCountProcessor): the per-user
  * "largest k metric values so far" table a monitoring pipeline keeps.
  * State is the top-k list itself — O(k) per key regardless of stream
  * length, merged incrementally per micro-batch (sort of ≤ k + batch
  * values, never the history). */
class TopKProcessor(k: Int)
  extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, (Long, String)] {
  import org.apache.spark.sql.streaming.{ListState, TimerValues, TTLConfig}
  import org.apache.spark.sql.{Encoders, streaming}

  @transient private var top: ListState[Double] = _

  override def init(outputMode: OutputMode, timeMode: streaming.TimeMode): Unit =
    top = getHandle.getListState[Double]("top", Encoders.scalaDouble, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Ev],
                               timerValues: TimerValues): Iterator[(Long, String)] = {
    val merged = (top.get().toSeq ++ rows.map(_.value))
      .sorted(Ordering[Double].reverse).take(k)
    top.put(merged.toArray)
    // deterministic rendering for the memory-sink assertion
    Iterator((key, merged.mkString(",")))
  }
}

/** StatefulProcessor twin of the flatMapGroupsWithState counter. */
class RunningCountProcessor
  extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, (Long, Long)] {
  import org.apache.spark.sql.streaming.{TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.{Encoders, streaming}

  @transient private var count: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: streaming.TimeMode): Unit =
    count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Ev],
                               timerValues: TimerValues): Iterator[(Long, Long)] = {
    val n = (if (count.exists()) count.get() else 0L) + rows.size
    count.update(n)
    Iterator((key, n))
  }
}

/** Typed event row for streaming tests (mirrors the events fixture). */
case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)
