package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** SURVEY.md §2.E window functions + §2.F sort/limit/top-k/set ops.
  *
  * Scale design: window partitions are user/nation/brand-sized — the
  * shuffle is on the partition key and each partition sorts locally.
  * `topk_global` compiles to TakeOrderedAndProject (per-partition heap +
  * driver merge of k rows — no global sort). Set ops shuffle once on the
  * full row hash.
  */
object WindowSetOps {

  val queries: Map[String, Q] = Map(
    // ---- §2.E windows ----------------------------------------------------
    "win_rank" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
                rank().over(w).as("rk"), dense_rank().over(w).as("drk"),
                row_number().over(w).as("rn"))
        .orderBy("c_nationkey", "rn")
    }),
    "win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables(s, d, "events")
        .select(col("user_id"), col("event_id"), col("value"),
                lag("value", 1).over(w).as("prev_val"),
                lead("value", 1).over(w).as("next_val"),
                (unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(w))).as("gap_sec"))
        .orderBy("user_id", "event_id")
    }),
    "win_moving_rows" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
      Tables(s, d, "events")
        .select(col("user_id"), col("event_id"),
                sum(Det.dec(col("value"))).over(w).cast("double").as("mov_sum"))
        .orderBy("user_id", "event_id")
    }),
    "win_moving_time" -> ((s, d) => {
      // Time-based RANGE frame: per-user trailing-1-hour event count and
      // decimal sum at every event — the windowed-feature shape feature
      // pipelines compute. RANGE over epoch SECONDS (not rows), so
      // same-second peers share a frame identically in both engines.
      val w = Window.partitionBy("user_id").orderBy(col("sec"))
        .rangeBetween(-3600L, 0L)
      Tables(s, d, "events")
        .withColumn("sec", unix_timestamp(col("ts")))
        .select(col("user_id"), col("event_id"),
                count(lit(1)).over(w).as("n_1h"),
                sum(Det.dec(col("value"))).over(w).cast("double").as("sum_1h"))
        .orderBy("user_id", "event_id")
    }),
    "win_moving_median" -> ((s, d) => {
      // Moving MEDIAN (7-row trailing frame) — the robust-smoothing twin
      // of win_moving_rows' mean: outlier-resistant trend lines over a
      // noisy metric. Exact interpolated percentile per frame; the frame
      // is O(1) rows so per-row cost is bounded, and the whole query is
      // the same single (user_id)-partition sort-and-slide pass as every
      // other moving window — one shuffle. Both engines interpolate
      // linearly (percentile ≡ quantile_cont); Det.r renders the double
      // identically.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
      Tables(s, d, "events")
        .select(col("user_id"), col("event_id"),
                Det.r(expr("percentile(value, 0.5)").over(w), 4).as("mov_med"))
        .orderBy("user_id", "event_id")
    }),
    "win_cume_range" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
                sum(Det.dec(col("o_totalprice"))).over(w).cast("double").as("cume_spend"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),
    "win_ntile_pct" -> ((s, d) => {
      // ntile/percent_rank/cume_dist over a TOTAL order. The direct
      // Window.orderBy(...) form plans a single-partition WindowExec —
      // the whole table through one task, THE scale anti-pattern. The
      // ordering key (p_retailprice, p_partkey) is unique, so global
      // rank == global row_number, computable fully in parallel with the
      // same two-pass scheme as journal ingest's seq assignment:
      // range-partition on the key, sort within partitions, add
      // per-partition offsets (zipWithIndex's count pass). ntile/pct/
      // cume are then pure per-row arithmetic over (rn, n) — exactly the
      // window semantics incl. ntile's big-buckets-first split — with n
      // broadcast as a 1-row scalar (no driver collect).
      val parts = Tables(s, d, "part").select(col("p_partkey"), col("p_retailprice"))
      // Fully DF-native rank, no RDD hop (the zipWithIndex bridge this
      // replaces dropped codegen and paid Row ser/deser): after the
      // range-partition + in-partition sort, monotonically_increasing_id
      // is evaluated in row order, so its low 33 bits ARE the 0-based
      // row index within the physical partition. Per-partition counts
      // are a tiny agg; their prefix sums (and the global n) are array
      // arithmetic on the one collected count row (window-free — the
      // plan guard forbids WindowExec outright) broadcast-joined back on
      // spark_partition_id: one data shuffle total, everything on the
      // data path codegen'd.
      // explicit partition count: REPARTITION_BY_NUM is never
      // AQE-coalesced, so the data branch and the counts branch are
      // guaranteed the same partition ids (a count-less range
      // repartition may be coalesced per reader — under a cached plan
      // the two branches were measured to disagree, dropping rows)
      val nP = math.max(1, s.sessionState.conf.numShufflePartitions)
      val bucketed = parts.repartitionByRange(nP,
        col("p_retailprice"), col("p_partkey"))
      val sorted = bucketed
        .sortWithinPartitions("p_retailprice", "p_partkey")
        .select(col("p_partkey"), col("p_retailprice"),
          spark_partition_id().as("pid"),
          monotonically_increasing_id().bitwiseAND((1L << 33) - 1).as("li"))
      // counts come off the UNSORTED bucketed frame (count per partition
      // is order-invariant; hanging it under the sorted projection would
      // re-sort the whole table just to count it) — the range exchange
      // is shared via ReusedExchange, the sort runs once, on the data
      // path only. The ≤#partitions count rows collapse to ONE row,
      // where prefix sums and the global total are array arithmetic
      // (interpreted HOF lambdas on ~32 elements — nothing at scale, and
      // it spares the separate count(*) scan of the table).
      val counts = bucketed.select(spark_partition_id().as("pid"))
        .groupBy("pid").agg(count(lit(1)).as("cnt"))
      val offsets = counts
        .agg(sort_array(collect_list(struct(col("pid"), col("cnt")))).as("pc"))
        .select(
          expr("transform(pc, (x, i) -> named_struct('pid', x.pid, " +
            "'off', aggregate(slice(pc, 1, i), 0L, (acc, y) -> acc + y.cnt)))").as("po"),
          expr("aggregate(pc, 0L, (acc, y) -> acc + y.cnt)").as("n"))
        .select(explode(col("po")).as("o"), col("n"))
        .select(col("o.pid").as("pid"), col("o.off").as("off"), col("n"))
      val ranked = sorted.join(broadcast(offsets), "pid")
        .withColumn("rn", col("off") + col("li") + 1L)
      ranked
        .select(col("p_partkey"), col("p_retailprice"),
          // ntile(4): first n%4 buckets hold n div 4 + 1 rows, the rest
          // n div 4 (guard keeps the small-bucket branch off when n < 4)
          expr("CAST(IF(rn <= (n % 4) * (n div 4 + 1), " +
               "(rn - 1) div (n div 4 + 1), " +
               "n % 4 + (rn - 1 - (n % 4) * (n div 4 + 1)) div greatest(n div 4, 1)" +
               ") + 1 AS INT)").as("quartile"),
          // n = 1 would divide 0/0 → NULL; percent_rank is defined 0.0
          // for a single-row frame in both engines
          Det.r(coalesce((col("rn") - 1).cast("double") / (col("n") - 1),
            lit(0.0)), 4).as("pct_rank"),
          Det.r(col("rn").cast("double") / col("n"), 4).as("cume"))
        .orderBy("p_partkey")
    }),
    "win_topk_group" -> ((s, d) => {
      val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables(s, d, "part")
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
                row_number().over(w).as("rn"))
        .where(col("rn") <= 3)
        .orderBy("p_brand", "rn")
    }),

    "win_first_last" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
                first("c_custkey").over(w).as("richest"),
                last("c_custkey").over(w).as("poorest"),
                nth_value(col("c_custkey"), 2).over(w).as("second"))
        .orderBy("c_nationkey", "c_custkey")
    }),

    "win_running_distinct" -> ((s, d) => {
      // Running count of DISTINCT event types seen per user — the
      // "how many features has this user touched so far" curve. There
      // is no count(DISTINCT) window frame in either engine; the
      // standard exact rewrite marks each (user, type)'s FIRST
      // occurrence with row_number()==1 over (user, type) and then
      // running-sums the marks over (user). Two window passes on
      // different partition keys → two exchanges, but both are keyed
      // on the user axis and per-row state is O(1) — no per-user
      // buffer, bot-skew safe (events_sessionize precedent). Ties on
      // ts break by the unique event_id, so the curve is
      // deterministic.
      val wFirst = Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
      val wRun = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        .withColumn("fs",
          when(row_number().over(wFirst) === 1, 1).otherwise(0))
        .select(col("user_id"), col("event_id"), col("event_type"),
                sum("fs").over(wRun).cast("long").as("n_types_seen"))
        .orderBy("user_id", "event_id")
    }),

    "win_gaps_islands" -> ((s, d) => {
      // Gaps-and-islands: maximal runs of CONSECUTIVE active days per
      // user (streaks). The classic exact rewrite: day − row_number()
      // over (user ORDER BY day) is constant within a consecutive run
      // and strictly decreasing across gaps, so it IS the island key —
      // no self-join, no spine. Scale shape: distinct (user, day)
      // collapses the event stream first (one shuffle), the window and
      // both groupBys all partition on the user axis, O(1) per-row
      // state — bot-skew safe like events_sessionize.
      val wDay = Window.partitionBy("user_id").orderBy("day")
      Tables(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .withColumn("island",
          datediff(col("day"), lit("1970-01-01").cast("date")).cast("long")
            - row_number().over(wDay))
        .groupBy("user_id", "island")
        .agg(count(lit(1)).as("len"), min("day").as("start_day"))
        .groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n_streaks"),
             max("len").cast("long").as("max_streak"),
             sum("len").cast("long").as("active_days"),
             min("start_day").as("first_day"))
        .orderBy("user_id")
    }),

    // ---- §2.F sort / top-k / set ops ------------------------------------
    "sort_multi_null" -> ((s, d) =>
      // No natural nulls in the fixtures — manufacture them with nullif so
      // the explicit NULLS FIRST/LAST contract (§2.0.1) is exercised.
      Tables(s, d, "customer")
        .select(col("c_custkey"), nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"),
                col("c_acctbal"))
        .orderBy(col("seg").asc_nulls_first, col("c_acctbal").desc, col("c_custkey"))),
    "topk_global" -> ((s, d) =>
      Tables(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(100)),
    "set_union_all" -> ((s, d) => {
      val c = Tables(s, d, "customer")
        .select(lit("cust").as("src"), col("c_custkey").as("key"),
                col("c_name").as("name"), col("c_acctbal").as("acctbal"))
      val p = Tables(s, d, "supplier")
        .select(lit("supp").as("src"), col("s_suppkey").as("key"),
                col("s_name").as("name"), col("s_acctbal").as("acctbal"))
      c.unionByName(p).orderBy("src", "key")
    }),
    "set_union_distinct" -> ((s, d) =>
      Tables(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .union(Tables(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct().orderBy("nationkey")),
    "set_intersect" -> ((s, d) =>
      Tables(s, d, "part").select(col("p_partkey").as("partkey"))
        .intersect(Tables(s, d, "lineitem").select(col("l_partkey").as("partkey")))
        .orderBy("partkey")),
    "set_except" -> ((s, d) =>
      Tables(s, d, "part").select(col("p_partkey").as("partkey"))
        .except(Tables(s, d, "lineitem").select(col("l_partkey").as("partkey")))
        .orderBy("partkey")),
    "set_intersect_all" -> ((s, d) =>
      // BAG semantics (multiset): duplicates survive with multiplicity
      // min(left, right) — the other half of the set-op contract. Rows
      // that tie are identical, so ordering by value is total for the
      // hash compare. Disjoint order ranges + the parity filter make
      // both multiplicity directions non-trivial at every SF.
      Tables(s, d, "lineitem").where(col("l_orderkey") < 200)
        .select(col("l_partkey").as("partkey"))
        .intersectAll(Tables(s, d, "lineitem")
          .where(col("l_partkey") % 2 === 0 &&
                 col("l_orderkey") >= 200 && col("l_orderkey") < 500)
          .select(col("l_partkey").as("partkey")))
        .orderBy("partkey")),
    "set_except_all" -> ((s, d) =>
      // multiplicity max(left − right, 0)
      Tables(s, d, "lineitem").where(col("l_orderkey") < 200)
        .select(col("l_partkey").as("partkey"))
        .exceptAll(Tables(s, d, "lineitem")
          .where(col("l_partkey") % 2 === 0 &&
                 col("l_orderkey") >= 200 && col("l_orderkey") < 500)
          .select(col("l_partkey").as("partkey")))
        .orderBy("partkey")),
  )

  val oracle: Map[String, String] = Map(
    "win_rank" ->
      ("SELECT c_custkey, c_nationkey, c_acctbal, " +
        "CAST(rank() OVER w AS INT) AS rk, CAST(dense_rank() OVER w AS INT) AS drk, " +
        "CAST(row_number() OVER w AS INT) AS rn FROM customer " +
        "WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) " +
        "ORDER BY c_nationkey, rn"),
    "win_lag_lead" ->
      ("SELECT user_id, event_id, value, lag(value, 1) OVER w AS prev_val, " +
        "lead(value, 1) OVER w AS next_val, " +
        "date_diff('second', lag(ts, 1) OVER w, ts) AS gap_sec FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) " +
        "ORDER BY user_id, event_id"),
    "win_moving_rows" ->
      ("SELECT user_id, event_id, CAST(SUM(CAST(value AS DECIMAL(27,4))) OVER w " +
        "AS DOUBLE) AS mov_sum FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) ORDER BY user_id, event_id"),
    "win_moving_time" ->
      // floor, not a bare BIGINT cast: Spark's unix_timestamp truncates
      // fractional seconds while DuckDB's double->int cast rounds —
      // diverges on any sub-second timestamp (caught at sf0.1)
      ("SELECT user_id, event_id, CAST(count(*) OVER w AS BIGINT) AS n_1h, " +
        "CAST(SUM(CAST(value AS DECIMAL(27,4))) OVER w AS DOUBLE) AS sum_1h " +
        "FROM events WINDOW w AS (PARTITION BY user_id " +
        "ORDER BY CAST(floor(epoch(ts)) AS BIGINT) " +
        "RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) " +
        "ORDER BY user_id, event_id"),
    "win_moving_median" ->
      ("SELECT user_id, event_id, " +
        graft.Det.sql.r("quantile_cont(value, 0.5) OVER w", 4) + " AS mov_med " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) ORDER BY user_id, event_id"),
    "win_cume_range" ->
      ("SELECT o_custkey, o_orderkey, o_orderdate, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) OVER w AS DOUBLE) AS cume_spend " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate " +
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "ORDER BY o_custkey, o_orderdate, o_orderkey"),
    "win_ntile_pct" ->
      ("SELECT p_partkey, p_retailprice, CAST(ntile(4) OVER w AS INT) AS quartile, " +
        graft.Det.sql.r("percent_rank() OVER w", 4) + " AS pct_rank, " +
        graft.Det.sql.r("cume_dist() OVER w", 4) + " AS cume " +
        "FROM part WINDOW w AS (ORDER BY p_retailprice, p_partkey) ORDER BY p_partkey"),
    "win_topk_group" ->
      ("SELECT p_brand, p_partkey, p_retailprice, CAST(row_number() OVER w AS INT) AS rn " +
        "FROM part WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) " +
        "QUALIFY rn <= 3 ORDER BY p_brand, rn"),
    "win_first_last" ->
      ("SELECT c_custkey, c_nationkey, first_value(c_custkey) OVER w AS richest, " +
        "last_value(c_custkey) OVER w AS poorest, " +
        "nth_value(c_custkey, 2) OVER w AS second FROM customer " +
        "WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY c_nationkey, c_custkey"),
    "win_running_distinct" ->
      ("WITH f AS (SELECT user_id, event_id, event_type, ts, " +
        "CASE WHEN row_number() OVER (PARTITION BY user_id, event_type " +
        "ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS fs FROM events) " +
        "SELECT user_id, event_id, event_type, " +
        "CAST(sum(fs) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_types_seen " +
        "FROM f ORDER BY user_id, event_id"),
    "win_gaps_islands" ->
      ("WITH days AS (SELECT DISTINCT user_id, " +
        "CAST(date_trunc('day', ts) AS DATE) AS day FROM events), " +
        "isl AS (SELECT user_id, day, " +
        "date_diff('day', DATE '1970-01-01', day) - " +
        "row_number() OVER (PARTITION BY user_id ORDER BY day) AS island " +
        "FROM days), " +
        "g AS (SELECT user_id, island, count(*) AS len, min(day) AS start_day " +
        "FROM isl GROUP BY 1, 2) " +
        "SELECT user_id, count(*) AS n_streaks, " +
        "CAST(max(len) AS BIGINT) AS max_streak, " +
        "CAST(sum(len) AS BIGINT) AS active_days, " +
        "min(start_day) AS first_day " +
        "FROM g GROUP BY 1 ORDER BY user_id"),
    "sort_multi_null" ->
      ("SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg, c_acctbal FROM customer " +
        "ORDER BY seg ASC NULLS FIRST, c_acctbal DESC, c_custkey"),
    "topk_global" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"),
    "set_union_all" ->
      ("SELECT 'cust' AS src, c_custkey AS key, c_name AS name, c_acctbal AS acctbal " +
        "FROM customer UNION ALL SELECT 'supp', s_suppkey, s_name, s_acctbal FROM supplier " +
        "ORDER BY src, key"),
    "set_union_distinct" ->
      ("SELECT CAST(nationkey AS INT) AS nationkey FROM " +
        "(SELECT c_nationkey AS nationkey FROM customer UNION " +
        "SELECT s_nationkey FROM supplier) ORDER BY nationkey"),
    "set_intersect" ->
      ("SELECT p_partkey AS partkey FROM part INTERSECT " +
        "SELECT l_partkey FROM lineitem ORDER BY partkey"),
    "set_except" ->
      ("SELECT p_partkey AS partkey FROM part EXCEPT " +
        "SELECT l_partkey FROM lineitem ORDER BY partkey"),
    "set_intersect_all" ->
      ("SELECT l_partkey AS partkey FROM lineitem WHERE l_orderkey < 200 " +
        "INTERSECT ALL SELECT l_partkey FROM lineitem " +
        "WHERE l_partkey % 2 = 0 AND l_orderkey >= 200 AND l_orderkey < 500 " +
        "ORDER BY partkey"),
    "set_except_all" ->
      ("SELECT l_partkey AS partkey FROM lineitem WHERE l_orderkey < 200 " +
        "EXCEPT ALL SELECT l_partkey FROM lineitem " +
        "WHERE l_partkey % 2 = 0 AND l_orderkey >= 200 AND l_orderkey < 500 " +
        "ORDER BY partkey"),
  )
}
