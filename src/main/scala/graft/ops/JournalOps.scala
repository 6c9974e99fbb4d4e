package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.A — journal / log core (marasa append-only-journal
  * semantics; /root/reference is empty, see SURVEY §0, so rows cite the
  * SURVEY §2 contract). The journal is modeled over the `events` fixture:
  * seq = event_id (dense, unique, ts-monotone — FIXTURES.md), ns =
  * event_type, key = user_id, payload = props.
  *
  * Scale design: `state-at-seq` is ONE hash aggregate (max_by) — partial
  * aggregation runs map-side, the single shuffle is on (ns, ukey), and the
  * seq predicate is pushed into the parquet scan. At 100 TB the native
  * journal store (graft.journal.JournalStore) bounds the scan further via
  * epoch partition pruning + checkpoint compaction, so replay cost stays
  * O(epoch), exactly marasa's checkpoint+tail-replay design distributed.
  */
object JournalOps {

  /** Canonical journal projection of the events table. */
  def journal(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events").select(
      col("event_id").as("seq"), col("event_type").as("ns"),
      col("user_id").as("ukey"), col("ts"),
      col("props").as("payload"), col("value").as("val"))

  private val journalSql =
    "SELECT event_id AS seq, event_type AS ns, user_id AS ukey, ts, " +
      "props AS payload, value AS val FROM events"

  /** Key→latest-payload state as of an upper bound — marasa read(ns, seq).
    * One shuffle; map-side partial max_by. */
  def stateAt(df: DataFrame, cond: Column): DataFrame =
    df.where(cond)
      .groupBy("ns", "ukey")
      .agg(max_by(col("payload"), col("seq")).as("payload"),
           max(col("seq")).as("last_seq"))
      .orderBy(col("ns"), col("ukey"))

  private def stateSql(where: String): String =
    "SELECT event_type AS ns, user_id AS ukey, " +
      "arg_max(props, event_id) AS payload, max(event_id) AS last_seq " +
      s"FROM events $where GROUP BY 1, 2 ORDER BY ns, ukey"

  val queries: Map[String, Q] = Map(
    "journal_scan" -> ((s, d) => journal(s, d).orderBy("seq")),
    "journal_state_at_seq" -> ((s, d) => stateAt(journal(s, d), col("seq") <= 5000)),
    "journal_latest" -> ((s, d) => stateAt(journal(s, d), lit(true))),
    "journal_key_history" -> ((s, d) =>
      journal(s, d).where(col("ukey") === 42)
        .select("seq", "ns", "ts", "payload", "val").orderBy("seq")),
    "journal_seq_range" -> ((s, d) =>
      journal(s, d).where(col("seq") >= 1000 && col("seq") < 2000).orderBy("seq")),
    "journal_namespaces" -> ((s, d) =>
      journal(s, d).groupBy("ns")
        .agg(count(lit(1)).as("n"), min("seq").as("min_seq"), max("seq").as("max_seq"))
        .orderBy("ns")),
    "journal_checkpoint" -> ((s, d) => stateAt(journal(s, d), col("seq") < 8000)),
    "journal_replay_tail" -> ((s, d) => {
      // Records after the last epoch boundary (epoch = 1000 seqs): the
      // replay cost after a checkpoint. Scalar aggregate broadcast, no
      // driver-side collect.
      val j = journal(s, d)
      val boundary = j.agg((max("seq") - max("seq") % 1000).as("b"))
      j.crossJoin(broadcast(boundary)).where(col("seq") >= col("b"))
        .groupBy("ns").agg(count(lit(1)).as("n")).orderBy("ns")
    }),
    "journal_asof_ts" -> ((s, d) =>
      stateAt(journal(s, d), col("ts") <= lit("2024-01-15 00:00:00").cast("timestamp"))),
    "journal_source_state" -> ((s, d) => {
      // End-to-end through the `journal` DATA SOURCE (graft.sources
      // .JournalSource): ingest a bounded slice into a native store, then
      // read point-in-time state back via
      // spark.read.format("journal").option("asOfSeq", ...) — checkpoint
      // + epoch-pruned tail replay underneath. Oracle = the same arg_max
      // the direct journal_state_at_seq path uses (the slice bound 6000
      // is above the 5000 as-of, so it drops nothing, while still
      // crossing an epoch boundary so the auto-checkpoint path runs).
      // fixed per-dataset location, wiped before each build — repeated
      // Verify/Bench invocations must not accumulate orphaned stores
      val tmp = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        "graft_jsrc_store_" + Integer.toHexString(d.hashCode)).toString
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      val store = graft.journal.JournalStore.create(s, tmp, epochSize = 5000L)
      store.append(journal(s, d).where(col("seq") < 6000))
      s.read.format("journal").option("asOfSeq", "5000").load(tmp)
        .select(col("ns"), col("ukey"), col("payload"), col("last_seq"))
        .orderBy("ns", "ukey")
    }),
    "journal_write_segments" -> ((s, d) => {
      // Ingest the events journal into a native store (epoch-partitioned
      // parquet segments + atomically-swapped manifest — graft.journal),
      // then report per-segment stats. Stats are derivable from the
      // input, so this side-effecting sink is still oracle-checkable.
      // epochSize 5000: epoch granularity is a replay/throughput tradeoff
      // — 1000-seq epochs at sf0.1 meant 100 epoch dirs x 5 ns = 500 tiny
      // files, pure filesystem overhead (the r1 bench's slowest query).
      // Size epochs to the data: tail replay stays bounded, files stay
      // worth opening.
      val tmp = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        "graft_journal_store_" + Integer.toHexString(d.hashCode)).toString
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      val store = graft.journal.JournalStore.create(s, tmp, epochSize = 5000L)
      store.append(journal(s, d))
      store.segmentStats()
    }),
  )

  val oracle: Map[String, String] = Map(
    "journal_scan" -> s"SELECT * FROM ($journalSql) ORDER BY seq",
    "journal_state_at_seq" -> stateSql("WHERE event_id <= 5000"),
    "journal_source_state" -> stateSql("WHERE event_id <= 5000"),
    "journal_latest" -> stateSql(""),
    "journal_key_history" ->
      ("SELECT event_id AS seq, event_type AS ns, ts, props AS payload, " +
        "value AS val FROM events WHERE user_id = 42 ORDER BY seq"),
    "journal_seq_range" ->
      s"SELECT * FROM ($journalSql) WHERE seq >= 1000 AND seq < 2000 ORDER BY seq",
    "journal_namespaces" ->
      ("SELECT event_type AS ns, count(*) AS n, " +
        "CAST(min(event_id) AS BIGINT) AS min_seq, CAST(max(event_id) AS BIGINT) AS max_seq " +
        "FROM events GROUP BY 1 ORDER BY ns"),
    "journal_checkpoint" -> stateSql("WHERE event_id < 8000"),
    "journal_replay_tail" ->
      ("SELECT event_type AS ns, count(*) AS n FROM events " +
        "WHERE event_id >= (SELECT max(event_id) - max(event_id) % 1000 FROM events) " +
        "GROUP BY 1 ORDER BY ns"),
    "journal_asof_ts" ->
      stateSql("WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'"),
    "journal_write_segments" ->
      ("SELECT event_id // 5000 AS epoch, count(*) AS n_rows, " +
        "CAST(min(event_id) AS BIGINT) AS min_seq, CAST(max(event_id) AS BIGINT) AS max_seq " +
        "FROM events GROUP BY 1 ORDER BY epoch"),
  )
}
