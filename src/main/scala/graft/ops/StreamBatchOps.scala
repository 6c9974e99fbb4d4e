package graft.ops

import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** SURVEY.md §2.I — batch twins of the streaming aggregations. The same
  * `window()` / `session_window()` expressions run identically under
  * Structured Streaming (graft.streaming.StreamingOps + StreamingSpec);
  * these batch declarations are the DuckDB-oracle-checkable surface.
  *
  * Scale design: windowed aggregation is a hash aggregate keyed on
  * (window, key) — partial aggregation map-side; in streaming the same
  * plan runs incrementally against the state store with watermark-bounded
  * state.
  */
object StreamBatchOps {

  val queries: Map[String, Q] = Map(
    "stream_tumbling_batch" -> ((s, d) =>
      Tables(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("val_sum"))
        .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
                col("event_type"), col("n"), col("val_sum"))
        .orderBy("w_start", "event_type")),
    "stream_sliding_batch" -> ((s, d) =>
      Tables(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("val_sum"))
        .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
                col("event_type"), col("n"), col("val_sum"))
        .orderBy("w_start", "event_type")),
    "stream_session_batch" -> ((s, d) =>
      Tables(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("sw.start").as("s_start"),
                col("sw.end").as("s_end"), col("n_events"))
        .orderBy("user_id", "s_start")),
  )

  val oracle: Map[String, String] = Map(
    "stream_tumbling_batch" ->
      ("SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w_start, " +
        "time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS w_end, event_type, " +
        "count(*) AS n, " + Det.sql.dsum("value") + " AS val_sum " +
        "FROM events GROUP BY 1, 2, 3 ORDER BY w_start, event_type"),
    "stream_sliding_batch" ->
      ("SELECT ws AS w_start, ws + INTERVAL 1 HOUR AS w_end, event_type, " +
        "count(*) AS n, " + Det.sql.dsum("value") + " AS val_sum FROM " +
        "(SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE AS ws, " +
        "event_type, value FROM events, generate_series(0, 3) g(k)) " +
        "GROUP BY 1, 2, 3 ORDER BY w_start, event_type"),
    "stream_session_batch" ->
      // Gaps-and-islands twin of Spark session_window semantics: a new
      // session starts when the gap from the previous event is >= 30 min
      // (windows are [start, end) with end = last_ts + gap) — SURVEY §7.3.4.
      ("WITH o AS (SELECT user_id, ts, event_id, CASE WHEN " +
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL OR " +
        "ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= INTERVAL 30 MINUTE " +
        "THEN 1 ELSE 0 END AS new_s FROM events), " +
        "i AS (SELECT user_id, ts, SUM(new_s) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM o) " +
        "SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end, " +
        "count(*) AS n_events FROM i GROUP BY user_id, sid ORDER BY user_id, s_start"),
  )
}
