package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** SURVEY.md §2.B–D — scans, joins, aggregations.
  *
  * Scale design notes (100 TB):
  * - `scan_project_filter` relies on parquet predicate pushdown + column
  *   pruning (asserted in PlanShapeSpec) — the scan reads 5 columns, not 11.
  * - Dimension joins (region, nation, customer at TPC-H ratios) are
  *   explicitly `broadcast()` — no shuffle of the fact side.
  * - Fact-fact joins (lineitem ⋈ orders) shuffle on the join key once;
  *   aggregations after the join reuse Catalyst's partial aggregation.
  * - All additive aggregates use exact DECIMAL arithmetic (Det) — order-
  *   independent, so partial/final aggregation at any parallelism is safe.
  */
object RelationalOps {

  // ---- §2.B scans --------------------------------------------------------

  private val scanQ: Q = (s, d) =>
    Tables(s, d, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
             col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
             col("l_discount").between(0.05, 0.07))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture —
      // order by every projected column so the limit boundary is
      // deterministic (remaining ties are full-row duplicates)
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
      .limit(100)

  // ---- §2.C joins --------------------------------------------------------

  private val joinQueries: Map[String, Q] = Map(
    "join_broadcast" -> ((s, d) =>
      Tables(s, d, "nation")
        .join(broadcast(Tables(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name").orderBy("n_nationkey")),
    "join_shuffle_hash" -> ((s, d) =>
      Tables(s, d, "orders")
        .join(Tables(s, d, "customer").hint("shuffle_hash"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n")).orderBy("c_mktsegment")),
    "join_sortmerge" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .join(Tables(s, d, "orders").hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
             count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),
    "join_left_outer" -> ((s, d) =>
      Tables(s, d, "customer")
        .join(Tables(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")),
    "join_full_outer" -> ((s, d) => {
      val li = Tables(s, d, "lineitem").where(col("l_orderkey") < 500).select("l_partkey")
      Tables(s, d, "part").select("p_partkey")
        .join(li, col("p_partkey") === col("l_partkey"), "full")
        .agg(count(lit(1)).as("n_rows"),
             count(when(col("l_partkey").isNull, 1)).as("n_part_only"),
             count(when(col("p_partkey").isNull, 1)).as("n_line_only"))
    }),
    "join_semi" -> ((s, d) =>
      Tables(s, d, "customer")
        .join(Tables(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")),
    "join_anti" -> ((s, d) =>
      Tables(s, d, "customer")
        .join(Tables(s, d, "orders").where(col("o_orderstatus") === "F"),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")),
    "join_cross" -> ((s, d) =>
      Tables(s, d, "region").crossJoin(Tables(s, d, "nation"))
        .select("r_name", "n_name").orderBy("r_name", "n_name")),
    "join_theta" -> ((s, d) =>
      Tables(s, d, "part")
        .join(Tables(s, d, "lineitem"),
              col("p_partkey") === col("l_partkey") && col("l_quantity") > col("p_size"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), Det.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("p_brand")),
    "join_range" -> ((s, d) => {
      // Same-user event pairs within 10 minutes. Equi key (user_id) keeps
      // this a hash/merge join with a residual range predicate — never a
      // BroadcastNestedLoopJoin. Bounded to user_id < 100 by contract.
      val e = Tables(s, d, "events")
      val a = e.where(col("user_id") < 100)
        .select(col("event_id").as("a_id"), col("user_id").as("u"), col("ts").as("a_ts"))
      val b = e.where(col("user_id") < 100)
        .select(col("event_id").as("b_id"), col("user_id").as("u2"), col("ts").as("b_ts"))
      a.join(b, col("u") === col("u2") && col("b_id") > col("a_id") &&
               col("b_ts") <= col("a_ts") + expr("INTERVAL 10 MINUTES"))
        .select("a_id", "b_id").orderBy("a_id", "b_id")
    }),
    "join_asof" -> ((s, d) => {
      // As-of join: for each purchase, the most recent prior same-user
      // click. event_id is the seq (ts-monotone — FIXTURES.md), so "prior"
      // = smaller event_id. Implemented as ONE window pass over the union
      // of both event kinds — no self-join, no shuffle beyond the
      // user_id partitioning.
      val e = Tables(s, d, "events").where(col("event_type").isin("click", "purchase"))
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      e.withColumn("click_id",
          last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
        .where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("click_id"))
        .orderBy("p_id")
    }),
    "join_salted" -> ((s, d) => {
      // Salted-replication skew join: a hot probe key pins one reducer in
      // a shuffle join; salting spreads the fact side over S sub-keys and
      // replicates the dim side S times, so a hot key's rows land on S
      // reducers. Result-identical to the plain join — the oracle IS the
      // unsalted query, salting must be invisible. AQE's runtime skew
      // split (SkewJoinSpec) is the automatic variant; this is the
      // explicit pattern for when stats hide the skew or the join is
      // already materialized pre-AQE. shuffle_hash hint keeps the join
      // shuffled (a broadcast would make salting moot).
      val S = 8
      val fact = Tables(s, d, "orders")
        .withColumn("fsalt", pmod(col("o_orderkey"), lit(S)))
      val dim = Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
        .withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
        .hint("shuffle_hash")
      fact.join(dim,
          col("o_custkey") === col("c_custkey") && col("fsalt") === col("salt"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
             sum(Det.dec(col("o_totalprice"))).cast("double").as("total"))
        .orderBy("c_mktsegment")
    }),
    "join_skew_handoff" -> ((s, d) => {
      // Detector→remedy handoff, end-to-end: the skew REPORT (the same
      // per-key count frame journal_skew_report ranks) chooses each
      // key's salt factor, and the join consumes that factor with no
      // driver round-trip — the hot-key table rides ONE broadcast to
      // both join sides. A key holding more than tot/P of the fact rows
      // gets sf = min(S, n·P/tot) sub-keys: fact rows spread over sf
      // reducers (deterministic sub-key from the unique event_id), the
      // dim side replicates that key's row sf times. Keys the report
      // calls cold keep sf = 1 — zero replication overhead, so shuffle
      // volume grows only by the hot keys' dim copies. Result-identical
      // to the plain join (the oracle IS the unsalted query): the
      // remedy must be invisible in values, visible only in the
      // exchange. join_salted is the static-factor form; this is the
      // report-driven form a 100 TB pipeline runs when the hot keys are
      // only known from the data itself.
      val S = 16L
      val P = 400L
      val ev = Tables(s, d, "events")
        .select(col("user_id"), col("event_id"), col("value"))
      val tot = ev.agg(count(lit(1)).as("tot"))
      val hot = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .select(col("user_id").as("hk"),
          least(lit(S), greatest(lit(1L),
            floor(col("n") * lit(P) / col("tot")).cast("long"))).as("sf"))
        .where(col("sf") > 1L)
      val fact = ev.join(broadcast(hot), col("user_id") === col("hk"), "left")
        .select(col("user_id"), col("value"),
          pmod(xxhash64(col("event_id")), coalesce(col("sf"), lit(1L))).as("salt"))
      val dim = Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
        .join(broadcast(hot), col("c_custkey") === col("hk"), "left")
        .select(col("c_custkey"), col("c_mktsegment"),
          explode(sequence(lit(0L), coalesce(col("sf"), lit(1L)) - 1L)).as("dsalt"))
        .hint("shuffle_hash")
      fact.join(dim,
          col("user_id") === col("c_custkey") && col("salt") === col("dsalt"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("val_sum"))
        .orderBy("c_mktsegment")
    }),
  )

  private val joinOracle: Map[String, String] = Map(
    "join_salted" ->
      ("SELECT c_mktsegment, count(*) AS n, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS total " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY 1 ORDER BY c_mktsegment"),
    // the unsalted join IS the oracle: the report-driven salting must be
    // value-invisible
    "join_skew_handoff" ->
      ("SELECT c_mktsegment, count(*) AS n, " +
        Det.sql.dsum("value") + " AS val_sum " +
        "FROM events JOIN customer ON user_id = c_custkey " +
        "GROUP BY 1 ORDER BY c_mktsegment"),
    "join_broadcast" ->
      ("SELECT n_nationkey, n_name, r_name FROM nation JOIN region " +
        "ON n_regionkey = r_regionkey ORDER BY n_nationkey"),
    "join_shuffle_hash" ->
      ("SELECT c_mktsegment, count(*) AS n FROM orders JOIN customer " +
        "ON o_custkey = c_custkey GROUP BY 1 ORDER BY c_mktsegment"),
    "join_sortmerge" ->
      ("SELECT o_orderpriority, " +
        Det.sql.dsum("l_extendedprice * (1 - l_discount)") + " AS revenue, " +
        "count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1 ORDER BY o_orderpriority"),
    "join_left_outer" ->
      ("SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer " +
        "LEFT JOIN orders ON c_custkey = o_custkey GROUP BY 1 ORDER BY c_custkey"),
    "join_full_outer" ->
      ("SELECT count(*) AS n_rows, " +
        "count(CASE WHEN l_partkey IS NULL THEN 1 END) AS n_part_only, " +
        "count(CASE WHEN p_partkey IS NULL THEN 1 END) AS n_line_only " +
        "FROM (SELECT p_partkey FROM part) p FULL JOIN " +
        "(SELECT l_partkey FROM lineitem WHERE l_orderkey < 500) l " +
        "ON p_partkey = l_partkey"),
    "join_semi" ->
      ("SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey"),
    "join_anti" ->
      ("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F') " +
        "ORDER BY c_custkey"),
    "join_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name",
    "join_theta" ->
      ("SELECT p_brand, count(*) AS n, " + Det.sql.dsum("l_quantity") + " AS sum_qty " +
        "FROM part JOIN lineitem ON p_partkey = l_partkey AND l_quantity > p_size " +
        "GROUP BY 1 ORDER BY p_brand"),
    "join_range" ->
      ("SELECT a.event_id AS a_id, b.event_id AS b_id FROM events a JOIN events b " +
        "ON a.user_id = b.user_id AND b.event_id > a.event_id " +
        "AND b.ts <= a.ts + INTERVAL 10 MINUTE " +
        "WHERE a.user_id < 100 AND b.user_id < 100 ORDER BY a_id, b_id"),
    "join_asof" ->
      ("SELECT p.event_id AS p_id, p.user_id, " +
        "(SELECT max(c.event_id) FROM events c WHERE c.event_type = 'click' " +
        "AND c.user_id = p.user_id AND c.event_id < p.event_id) AS click_id " +
        "FROM events p WHERE p.event_type = 'purchase' ORDER BY p_id"),
  )

  // ---- §2.D aggregations -------------------------------------------------

  private val aggQueries: Map[String, Q] = Map(
    "agg_groupby_q1" -> q1,
    "agg_distinct" -> ((s, d) =>
      Tables(s, d, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")),
    "agg_grouping_sets" -> ((s, d) => {
      Tables(s, d, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql(groupingSetsSql("lineitem_gs"))
    }),
    "agg_rollup" -> ((s, d) =>
      Tables(s, d, "orders").rollup("o_orderstatus", "o_orderpriority")
        .agg(Det.dsum(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),
    "agg_cube" -> ((s, d) =>
      Tables(s, d, "orders").cube("o_orderstatus", "o_orderpriority")
        .agg(Det.dsum(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),
    "agg_having" -> ((s, d) =>
      Tables(s, d, "lineitem").groupBy("l_partkey")
        .agg(Det.dsum(col("l_quantity")).as("sum_qty"))
        .where(col("sum_qty") > 800)
        .orderBy("l_partkey")),
    "agg_filtered" -> ((s, d) =>
      // FILTER'd (conditional) aggregates: differently-predicated
      // aggregates in ONE pass over the fact table — the pivot-free
      // shape that avoids N scans for N conditions
      Tables(s, d, "orders").groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_all"),
             count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
             sum(when(col("o_orderstatus") === "O",
               Det.dec(col("o_totalprice")))).cast("double").as("open_total"))
        .orderBy("o_orderpriority")),
    "agg_collect_sorted" -> ((s, d) =>
      Tables(s, d, "customer").where(col("c_acctbal") > 9000)
        .groupBy("c_nationkey")
        .agg(concat_ws(",", sort_array(collect_list(col("c_name")))).as("names"))
        .orderBy("c_nationkey")),
    "agg_stats_exact" -> ((s, d) => {
      // Exact variance from decimal Σx, Σx² (stddev builtins are float-
      // accumulation-order dependent — SURVEY §2.0.5).
      val l = Tables(s, d, "lineitem")
      val sx = sum(Det.dec(col("l_quantity"), 4)).cast("double")
      val sxx = sum(Det.dec(col("l_quantity") * col("l_quantity"), 8)).cast("double")
      val n = count(lit(1))
      l.groupBy("l_returnflag")
        .agg(n.as("n"), min("l_quantity").as("min_qty"), max("l_quantity").as("max_qty"),
             Det.r((sxx - sx * sx / n) / (n - lit(1)), 4).as("var_qty"))
        .orderBy("l_returnflag")
    }),
    "agg_pivot" -> ((s, d) =>
      Tables(s, d, "orders")
        .groupBy("o_orderpriority").pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1))).na.fill(0L)
        .orderBy("o_orderpriority")),
    "agg_percentile" -> ((s, d) =>
      // exact interpolated percentiles (not approx_percentile — sketches
      // aren't oracle-matchable)
      Tables(s, d, "lineitem").groupBy("l_returnflag")
        .agg(Det.r(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
             Det.r(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
             Det.r(expr("percentile(l_quantity, 0.75)"), 4).as("p75"))
        .orderBy("l_returnflag")),
    "agg_quantile_sketch" -> ((s, d) =>
      // Fixed-memory quantile SKETCH (Greenwald-Khanna via Spark's
      // approx_percentile) — the 100 TB percentile shape: mergeable
      // bounded state, map-side partials, one pass. Declared accuracy
      // 1e6 makes the sketch rank-EXACT whenever a group holds < 1M
      // rows (the summary never compresses, error bound ε·N < 1 rank),
      // which is what lets DuckDB's rank-exact quantile_disc
      // oracle-check the SKETCH code path end-to-end at test scale; at
      // real scale the identical plan runs with the default accuracy
      // and carries the ε·N rank bound instead of exactness.
      // agg_percentile stays the interpolated-exact twin.
      Tables(s, d, "lineitem").groupBy("l_returnflag")
        .agg(expr("approx_percentile(CAST(l_quantity AS DOUBLE), " +
          "array(0.5D, 0.9D, 0.99D), 1000000)").as("q"))
        .select(col("l_returnflag"),
                col("q")(0).as("p50"), col("q")(1).as("p90"),
                col("q")(2).as("p99"))
        .orderBy("l_returnflag")),
    "agg_chi2" -> ((s, d) => {
      // Chi-square independence statistic for event_type × day-of-week
      // — "does behavior depend on the weekday": the contingency table
      // is ONE hash aggregate over the stream (exact BIGINT counts),
      // the marginals are tiny aggregates of that table broadcast back
      // onto it, and the (o−e)²/e fold divides exact integers in one
      // shared double expression. Mergeable by construction: counts
      // combine map-side at any parallelism. dof rides along; the
      // p-value needs the incomplete gamma (libm) and is deliberately
      // left to the caller.
      val cells = Tables(s, d, "events")
        .groupBy(col("event_type").as("et"),
          dayofweek(col("ts").cast("timestamp")).cast("long").as("dow"))
        .agg(count(lit(1)).as("o"))
      val rowT = cells.groupBy("et").agg(sum("o").as("rt"))
      val colT = cells.groupBy("dow").agg(sum("o").as("ct"))
      val tot = cells.agg(sum("o").as("n"))
      val dims = cells.agg(countDistinct("et").as("nr"),
        countDistinct("dow").as("nc"))
      cells.join(broadcast(rowT), "et").join(broadcast(colT), "dow")
        .crossJoin(broadcast(tot))
        .select((col("rt").cast("double") * col("ct").cast("double") /
            col("n").cast("double")).as("e"),
          col("o").cast("double").as("od"))
        .agg(count(lit(1)).as("n_cells"),
          // each term is Det-rounded to 6dp BEFORE the decimal capture
          // (the capture is then exact), so the sum is order-free
          Det.r(sum(Det.dec(Det.r((col("od") - col("e")) * (col("od") - col("e")) /
            col("e"), 6), 6)).cast("double"), 4).as("chi2"))
        .crossJoin(broadcast(dims))
        .select(col("n_cells"), col("chi2"),
          ((col("nr") - 1) * (col("nc") - 1)).cast("long").as("dof"))
        // decision-complete: upper-tail p by the Wilson–Hilferty normal
        // transform — the SAME dialect-neutral SQL text the oracle runs
        // (Det.sql.chi2UpperP), every libm step Det-pinned
        .select(col("*"), expr(Det.sql.chi2UpperP("chi2",
          "CAST(dof AS DOUBLE)")).as("p_value"))
    }),
    "agg_ab_ttest" -> ((s, d) =>
      // Welch's two-sample t statistic (click vs view event values) —
      // the A/B-experiment readout, from the same exact-partial-sum
      // discipline as agg_regression: per-arm n / Σv / Σv² accumulate
      // exactly (decimal capture; v² is 8dp), ONE conditional hash
      // aggregate over the stream, and the mean/variance/t chain is a
      // single shared double expression. The p-value is the two-sided
      // NORMAL approximation to the t reference (exact as n grows; at
      // production sample sizes the df correction is below the 6dp
      // emit), computed by the SAME dialect-neutral Abramowitz–Stegun
      // erfc text the oracle runs (Det.sql.normTwoSidedP).
      Tables(s, d, "events")
        .where(col("event_type").isin("click", "view"))
        .agg(
          count(when(col("event_type") === "click", 1)).as("na"),
          Det.dsum(when(col("event_type") === "click", col("value")), 4).as("sa"),
          sum(Det.dec(when(col("event_type") === "click",
            col("value") * col("value")), 8)).cast("double").as("ssa"),
          count(when(col("event_type") === "view", 1)).as("nb"),
          Det.dsum(when(col("event_type") === "view", col("value")), 4).as("sb"),
          sum(Det.dec(when(col("event_type") === "view",
            col("value") * col("value")), 8)).cast("double").as("ssb"))
        .select(col("na"), col("nb"),
          Det.r(col("sa") / col("na").cast("double"), 6).as("mean_a"),
          Det.r(col("sb") / col("nb").cast("double"), 6).as("mean_b"),
          Det.r(
            (col("sa") / col("na").cast("double") -
              col("sb") / col("nb").cast("double")) /
            sqrt(
              ((col("ssa") - col("sa") * col("sa") / col("na").cast("double")) /
                (col("na").cast("double") - lit(1.0))) / col("na").cast("double") +
              ((col("ssb") - col("sb") * col("sb") / col("nb").cast("double")) /
                (col("nb").cast("double") - lit(1.0))) / col("nb").cast("double")),
            6).as("t_welch"))
        .select(col("*"),
          expr(Det.sql.normTwoSidedP("t_welch")).as("p_value"))),
    "agg_regression" -> ((s, d) =>
      // Per-group OLS (value regressed on day-of-month): the classic
      // regr_slope/regr_intercept pair, but built on EXACT partial
      // sums — n, Σx, Σx² in BIGINT, Σy, Σxy through the decimal
      // capture — so the map-side combine is order-independent at any
      // parallelism and both engines derive slope/intercept from
      // IDENTICAL doubles with one shared arithmetic expression. One
      // hash aggregate, no second pass (contrast the textbook
      // two-pass covariance form).
      Tables(s, d, "events")
        .select(col("event_type"),
          dayofmonth(col("ts").cast("timestamp")).cast("long").as("x"),
          col("value"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
             sum(col("x") * col("x")).as("sxx"),
             Det.dsum(col("value"), 4).as("sy"),
             Det.dsum(col("value") * col("x"), 4).as("sxy"))
        .select(col("event_type"), col("n"),
          Det.r((col("n").cast("double") * col("sxy") -
              col("sx").cast("double") * col("sy")) /
            (col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")), 6)
            .as("slope"),
          Det.r((col("sy") - ((col("n").cast("double") * col("sxy") -
              col("sx").cast("double") * col("sy")) /
            (col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double"))) *
              col("sx").cast("double")) / col("n").cast("double"), 6)
            .as("icept"))
        .orderBy("event_type")),
    "agg_hll_custom" -> ((s, d) => {
      // Mergeable HyperLogLog from first principles (Flajolet et al.
      // 2007, public), with register arithmetic the oracle shares
      // bit-for-bit: h = 60 md5 bits (portable, RNG-free), bucket =
      // h mod 512, rho = leading-zero rank of the remaining 51 bits
      // computed from the BINARY-STRING length (floor(log2) would
      // misround boundary values by a libm ulp and the two engines'
      // libms differ). Registers are max-per-bucket — the mergeable
      // fixed-memory sketch shape (512 registers per group at ANY
      // cardinality; the max combines map-side). The harmonic combine
      // stays EXACT: integer weights 2^(52-rho) sum associatively in
      // BIGINT (≤ 2^61 — no accumulation-order double drift), and ONE
      // final double division yields the estimate. Raw estimate only:
      // the small-range correction needs ln (libm again) and every
      // group here sits far above 2.5·m. agg_approx_distinct is the
      // built-in (non-portable-sketch) twin; this row is the one whose
      // SKETCH STATE itself is oracle-checked.
      val regs = Tables(s, d, "lineitem")
        .select(col("l_returnflag").as("flag"),
          expr("CAST(conv(substring(md5(CAST(l_orderkey AS STRING)), 1, 15)" +
            ", 16, 10) AS BIGINT)").as("h"))
        .select(col("flag"), (col("h") % 512).as("b"), expr("h div 512").as("w"))
        .select(col("flag"), col("b"),
          // both engines render bin() minimal (no leading zeros), so
          // its length IS the MSB position — no trim, no libm
          when(col("w") === 0, lit(52))
            .otherwise(lit(52) - length(expr("bin(w)"))).as("rho"))
        .groupBy("flag", "b").agg(max("rho").as("m"))
      val est = regs.groupBy("flag")
        .agg(count(lit(1)).as("regs_hit"),
             sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(52 - m AS INT))"))
               .as("w_hit"))
        .select(col("flag"), col("regs_hit"),
          (col("w_hit") + (lit(512L) - col("regs_hit")) *
            lit(4503599627370496L)).as("weight"))
        .select(col("flag"), col("regs_hit"), col("weight"),
          Det.r(lit(0.7213) / (lit(1.0) + lit(1.079) / lit(512.0)) *
            lit(262144.0) * lit(4503599627370496.0) /
            col("weight").cast("double"), 4).as("hll_estimate"))
      val exact = Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(countDistinct("l_orderkey").as("n_exact"))
      est.join(exact, "flag").orderBy("flag")
    }),
    "agg_hll_union" -> ((s, d) => {
      // Sketch ALGEBRA end-to-end: two groups' register tables merge
      // by max-per-bucket — the property that makes HLL a distributed
      // aggregate (partial states union losslessly across partitions,
      // days, shards) — and the MERGED sketch's estimate is checked
      // beside the exact distinct of the union. agg_hll_custom checks
      // per-group register state; this row checks the merge itself,
      // which is what a 100 TB rollup actually exercises (daily
      // sketches folding into monthly without touching raw data).
      val regs = Tables(s, d, "lineitem")
        .where(col("l_returnflag").isin("A", "N"))
        .select(col("l_returnflag").as("flag"),
          expr("CAST(conv(substring(md5(CAST(l_orderkey AS STRING)), 1, 15)" +
            ", 16, 10) AS BIGINT)").as("h"))
        .select(col("flag"), (col("h") % 512).as("b"), expr("h div 512").as("w"))
        .select(col("flag"), col("b"),
          when(col("w") === 0, lit(52))
            .otherwise(lit(52) - length(expr("bin(w)"))).as("rho"))
        .groupBy("flag", "b").agg(max("rho").as("m"))
      val merged = regs.groupBy("b").agg(max("m").as("m"))
      val est = merged
        .agg(count(lit(1)).as("regs_hit"),
             sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(52 - m AS INT))"))
               .as("w_hit"))
        .select(col("regs_hit"),
          (col("w_hit") + (lit(512L) - col("regs_hit")) *
            lit(4503599627370496L)).as("weight"))
        .select(col("regs_hit"), col("weight"),
          Det.r(lit(0.7213) / (lit(1.0) + lit(1.079) / lit(512.0)) *
            lit(262144.0) * lit(4503599627370496.0) /
            col("weight").cast("double"), 4).as("hll_estimate"))
      val exact = Tables(s, d, "lineitem")
        .where(col("l_returnflag").isin("A", "N"))
        .agg(countDistinct("l_orderkey").as("n_exact"))
      est.crossJoin(broadcast(exact))
    }),
    "agg_histogram" -> ((s, d) =>
      // equi-width histogram of order value (25k buckets) with per-bucket
      // mass — one hash aggregate. DuckDB 1.0 has no width_bucket, and a
      // bare BIGINT cast diverges (DuckDB rounds doubles, Spark
      // truncates — the win_moving_time precedent), so BOTH sides spell
      // the identical floor-divide on the same IEEE doubles.
      Tables(s, d, "orders")
        .groupBy((floor(col("o_totalprice") / 25000).cast("long") * 25000)
          .as("bucket_lo"))
        .agg(count(lit(1)).as("n_orders"),
             Det.dsum(col("o_totalprice")).as("bucket_value"))
        .orderBy("bucket_lo")),
    "agg_assoc_rules" -> ((s, d) => {
      // Market-basket association rules over co-purchased part pairs:
      // support (co-occurrence count), directional confidences, lift —
      // frequent-itemset mining's k=2 core. Pair generation is
      // per-order (bounded by order size, never all-parts²); the pair
      // aggregate is the only corpus-sized shuffle (map-side partials);
      // per-part counts and the 1-row order total join onto the
      // pair-count frame. All ratios divide exact BIGINT counts — the
      // identical double on both engines, Det-rounded.
      val li = Tables(s, d, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val nOrders = broadcast(li.select("o").distinct()
        .agg(count(lit(1)).as("n_orders")))
      val partCnt = li.groupBy(col("p").as("part")).agg(count(lit(1)).as("pc"))
      val pairCnt = li.as("a").join(li.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("x"), col("b.p").as("y"))
        .agg(count(lit(1)).as("support"))
      pairCnt
        .join(partCnt.select(col("part").as("x"), col("pc").as("cx")), "x")
        .join(partCnt.select(col("part").as("y"), col("pc").as("cy")), "y")
        .crossJoin(nOrders)
        .select(col("x"), col("y"), col("support"),
          Det.r(col("support") / col("cx"), 4).as("conf_xy"),
          Det.r(col("support") / col("cy"), 4).as("conf_yx"),
          Det.r(col("support") * col("n_orders") / (col("cx") * col("cy")), 4)
            .as("lift"))
        .orderBy(col("support").desc, col("x"), col("y")).limit(25)
    }),
    "agg_mode_median" -> ((s, d) => {
      // Exact median + DETERMINISTIC mode per group. Neither engine's
      // built-in mode() pins its tie-break, so the mode is computed as
      // an arg-max over (count, value): counts per (group, value) — one
      // shuffle, partial-aggregated — then max_by on a composite
      // numeric key (cnt * 1000 + qty; qty ≤ 50 so the fields can't
      // bleed). Ties break toward the LARGER value in both engines by
      // construction, not by engine whim. Median is the exact
      // interpolated percentile (agg_percentile precedent).
      val li = Tables(s, d, "lineitem")
      val mode = li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("l_returnflag")
        .agg(max_by(col("l_quantity"),
          col("cnt") * 1000 + col("l_quantity").cast("long")).as("mode_qty"))
      li.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
             Det.r(expr("median(l_quantity)"), 4).as("median_qty"))
        .join(mode, "l_returnflag")
        .select("l_returnflag", "n", "median_qty", "mode_qty")
        .orderBy("l_returnflag")
    }),
    "agg_salted" -> ((s, d) => {
      // Skew-safe two-phase aggregation: pre-aggregate on (key, salt) so a
      // hot key spreads over 16 reducers, then combine partials. Decimal
      // sums are exact → identical to the direct aggregation (the oracle
      // is the UNSALTED query — salting must be invisible in the result).
      val l = Tables(s, d, "lineitem")
        .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
      l.groupBy("l_returnflag", "salt")
        .agg(sum(Det.dec(col("l_quantity"))).as("ps"), count(lit(1)).as("pc"))
        .groupBy("l_returnflag")
        .agg(sum("ps").cast("double").as("sum_qty"), sum("pc").as("n"))
        .orderBy("l_returnflag")
    }),
    "agg_unpivot" -> ((s, d) => {
      // Wide→long melt (UNPIVOT) — the inverse of agg_pivot. The wide
      // frame is already a grouped aggregate (one row per returnflag),
      // so the unpivot itself is a map-side Expand: rows × #measures,
      // no shuffle after the aggregation. At 100 TB the aggregation
      // dominates; the melt is free.
      val wide = Tables(s, d, "lineitem").groupBy("l_returnflag")
        .agg(Det.dsum(col("l_quantity")).as("sum_qty"),
             Det.dsum(col("l_extendedprice")).as("sum_price"))
      wide.unpivot(Array(col("l_returnflag")),
                   Array(col("sum_qty"), col("sum_price")),
                   "measure", "value")
        .orderBy("l_returnflag", "measure")
    }),
    "agg_udaf_argmax" -> ((s, d) => {
      // marasa state-at-seq as a typed Aggregator UDAF (SURVEY §4.3).
      val am = udaf(graft.expr.ArgMaxBySeq)
      JournalOps.journal(s, d).groupBy("ns", "ukey")
        .agg(am(col("seq"), col("payload")).as("payload"), max("seq").as("last_seq"))
        .orderBy("ns", "ukey")
    }),
  )

  private def q1: Q = (s, d) =>
    Tables(s, d, "lineitem")
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6)
          .as("sum_charge"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_extendedprice")).as("avg_price"),
        Det.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q1Sql: String =
    "SELECT l_returnflag, l_linestatus, " +
      Det.sql.dsum("l_quantity") + " AS sum_qty, " +
      Det.sql.dsum("l_extendedprice") + " AS sum_base_price, " +
      Det.sql.dsum("l_extendedprice * (1 - l_discount)") + " AS sum_disc_price, " +
      Det.sql.dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6) + " AS sum_charge, " +
      Det.sql.davg("l_quantity") + " AS avg_qty, " +
      Det.sql.davg("l_extendedprice") + " AS avg_price, " +
      Det.sql.davg("l_discount") + " AS avg_disc, " +
      "count(*) AS count_order " +
      "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
      "GROUP BY 1, 2 ORDER BY 1, 2"

  private def groupingSetsSql(table: String): String =
    "SELECT l_returnflag, l_linestatus, " +
      Det.sql.dsum("l_quantity") + " AS sum_qty, count(*) AS n " +
      s"FROM $table GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ()) " +
      "ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"

  private val aggOracle: Map[String, String] = Map(
    "agg_groupby_q1" -> q1Sql,
    "agg_distinct" ->
      ("SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, " +
        "count(DISTINCT l_suppkey) AS n_supps FROM lineitem GROUP BY 1 ORDER BY l_returnflag"),
    "agg_grouping_sets" -> groupingSetsSql("lineitem"),
    "agg_rollup" ->
      ("SELECT o_orderstatus, o_orderpriority, " + Det.sql.dsum("o_totalprice") +
        " AS total, count(*) AS n FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority) " +
        "ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"),
    "agg_cube" ->
      ("SELECT o_orderstatus, o_orderpriority, " + Det.sql.dsum("o_totalprice") +
        " AS total, count(*) AS n FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) " +
        "ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"),
    "agg_having" ->
      ("SELECT l_partkey, " + Det.sql.dsum("l_quantity") + " AS sum_qty FROM lineitem " +
        "GROUP BY 1 HAVING " + Det.sql.dsum("l_quantity") + " > 800 ORDER BY l_partkey"),
    "agg_filtered" ->
      ("SELECT o_orderpriority, count(*) AS n_all, " +
        "count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) " +
        "FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_total " +
        "FROM orders GROUP BY 1 ORDER BY o_orderpriority"),
    "agg_collect_sorted" ->
      ("SELECT c_nationkey, string_agg(c_name, ',' ORDER BY c_name) AS names " +
        "FROM customer WHERE c_acctbal > 9000 GROUP BY 1 ORDER BY c_nationkey"),
    "agg_stats_exact" ->
      ("SELECT l_returnflag, count(*) AS n, min(l_quantity) AS min_qty, " +
        "max(l_quantity) AS max_qty, " + Det.sql.r(
        "(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(27,8))) AS DOUBLE) - " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) * " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) / count(*)" +
        ") / (count(*) - 1)", 4) +
        " AS var_qty FROM lineitem GROUP BY 1 ORDER BY l_returnflag"),
    "agg_udaf_argmax" ->
      ("SELECT event_type AS ns, user_id AS ukey, arg_max(props, event_id) AS payload, " +
        "max(event_id) AS last_seq FROM events GROUP BY 1, 2 ORDER BY ns, ukey"),
    "agg_pivot" ->
      ("SELECT o_orderpriority, count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS \"F\", " +
        "count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS \"O\", " +
        "count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS \"P\" " +
        "FROM orders GROUP BY 1 ORDER BY o_orderpriority"),
    "agg_percentile" ->
      ("SELECT l_returnflag, " +
        Det.sql.r("quantile_cont(l_quantity, 0.25)", 4) + " AS p25, " +
        Det.sql.r("quantile_cont(l_quantity, 0.5)", 4) + " AS p50, " +
        Det.sql.r("quantile_cont(l_quantity, 0.75)", 4) + " AS p75 " +
        "FROM lineitem GROUP BY 1 ORDER BY l_returnflag"),
    // rank-exact discrete quantiles: below the declared accuracy the GK
    // sketch returns an exact order statistic, matching quantile_disc
    "agg_quantile_sketch" ->
      ("SELECT l_returnflag, " +
        "CAST(quantile_disc(l_quantity, 0.5) AS DOUBLE) AS p50, " +
        "CAST(quantile_disc(l_quantity, 0.9) AS DOUBLE) AS p90, " +
        "CAST(quantile_disc(l_quantity, 0.99) AS DOUBLE) AS p99 " +
        "FROM lineitem GROUP BY 1 ORDER BY l_returnflag"),
    // chi2 from the same exact contingency counts, shared arithmetic.
    // DuckDB dayofweek(=weekday number) differs from Spark dayofweek
    // (1=Sunday); both engines bucket identically when the oracle uses
    // the same 1..7 Sunday-first convention via isodow arithmetic.
    "agg_chi2" ->
      ("WITH cells AS (SELECT event_type AS et, " +
        "CAST((isodow(ts) % 7) + 1 AS BIGINT) AS dow, count(*) AS o " +
        "FROM events GROUP BY 1, 2), " +
        "rt AS (SELECT et, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1), " +
        "ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1), " +
        "n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells), " +
        "t AS (SELECT CAST(o AS DOUBLE) AS od, " +
        "CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE) AS e " +
        "FROM cells JOIN rt USING (et) JOIN ct USING (dow) CROSS JOIN n), " +
        "s AS (SELECT count(*) AS n_cells, " +
        Det.sql.r("CAST(sum(CAST(" +
          Det.sql.r("(od - e) * (od - e) / e", 6) +
          " AS DECIMAL(27,6))) AS DOUBLE)", 4) + " AS chi2 FROM t), " +
        "d AS (SELECT CAST((count(DISTINCT et) - 1) * " +
        "(count(DISTINCT dow) - 1) AS BIGINT) AS dof FROM cells) " +
        "SELECT n_cells, chi2, dof, " +
        Det.sql.chi2UpperP("chi2", "CAST(dof AS DOUBLE)") +
        " AS p_value FROM s CROSS JOIN d"),
    // Welch t from the same exact conditional sums, shared arithmetic
    "agg_ab_ttest" ->
      ("WITH a AS (SELECT " +
        "count(CASE WHEN event_type = 'click' THEN 1 END) AS na, " +
        Det.sql.dsum("CASE WHEN event_type = 'click' THEN value END", 4) +
        " AS sa, " +
        "CAST(sum(CAST(CASE WHEN event_type = 'click' THEN value * value " +
        "END AS DECIMAL(27,8))) AS DOUBLE) AS ssa, " +
        "count(CASE WHEN event_type = 'view' THEN 1 END) AS nb, " +
        Det.sql.dsum("CASE WHEN event_type = 'view' THEN value END", 4) +
        " AS sb, " +
        "CAST(sum(CAST(CASE WHEN event_type = 'view' THEN value * value " +
        "END AS DECIMAL(27,8))) AS DOUBLE) AS ssb " +
        "FROM events WHERE event_type IN ('click', 'view')), " +
        "s AS (SELECT na, nb, " +
        Det.sql.r("sa / CAST(na AS DOUBLE)", 6) + " AS mean_a, " +
        Det.sql.r("sb / CAST(nb AS DOUBLE)", 6) + " AS mean_b, " +
        Det.sql.r(
          "(sa / CAST(na AS DOUBLE) - sb / CAST(nb AS DOUBLE)) / sqrt(" +
          "((ssa - sa * sa / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0)) " +
          "/ CAST(na AS DOUBLE) + " +
          "((ssb - sb * sb / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0)) " +
          "/ CAST(nb AS DOUBLE))", 6) + " AS t_welch FROM a) " +
        "SELECT na, nb, mean_a, mean_b, t_welch, " +
        Det.sql.normTwoSidedP("t_welch") + " AS p_value FROM s"),
    // OLS from the same exact partial sums, shared arithmetic
    "agg_regression" -> {
      val slope = "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / " +
        "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - " +
        "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
      ("WITH a AS (SELECT event_type, count(*) AS n, " +
        "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx, " +
        Det.sql.dsum("value", 4) + " AS sy, " +
        Det.sql.dsum("value * x", 4) + " AS sxy FROM (" +
        "SELECT event_type, CAST(day(ts) AS BIGINT) AS x, value " +
        "FROM events) GROUP BY 1) " +
        "SELECT event_type, n, " + Det.sql.r(slope, 6) + " AS slope, " +
        Det.sql.r(s"(sy - ($slope) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)", 6) +
        " AS icept FROM a ORDER BY event_type")
    },
    // the HLL register table and its exact integer combine, re-derived
    // from the same md5 bits — the sketch state itself is the contract
    "agg_hll_custom" ->
      ("WITH h AS (SELECT l_returnflag AS flag, " +
        "CAST(concat('0x', substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) " +
        "AS BIGINT) AS h FROM lineitem), " +
        "r AS (SELECT flag, h % 512 AS b, " +
        "CASE WHEN h // 512 = 0 THEN 52 " +
        "ELSE 52 - length(bin(h // 512)) END AS rho FROM h), " +
        "m AS (SELECT flag, b, max(rho) AS m FROM r GROUP BY 1, 2), " +
        "e AS (SELECT flag, count(*) AS regs_hit, " +
        "CAST(sum(1::BIGINT << CAST(52 - m AS INT)) AS BIGINT) AS w_hit " +
        "FROM m GROUP BY 1), " +
        "x AS (SELECT l_returnflag AS flag, " +
        "count(DISTINCT l_orderkey) AS n_exact FROM lineitem GROUP BY 1) " +
        "SELECT e.flag, e.regs_hit, " +
        "e.w_hit + (512 - e.regs_hit) * 4503599627370496 AS weight, " +
        Det.sql.r("0.7213 / (1.0 + 1.079 / 512.0) * 262144.0 * " +
          "4503599627370496.0 / CAST(e.w_hit + (512 - e.regs_hit) * " +
          "4503599627370496 AS DOUBLE)", 4) + " AS hll_estimate, " +
        "x.n_exact FROM e JOIN x USING (flag) ORDER BY flag"),
    // the union sketch re-derived: same registers, max-merged
    "agg_hll_union" ->
      ("WITH h AS (SELECT l_returnflag AS flag, " +
        "CAST(concat('0x', substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) " +
        "AS BIGINT) AS h FROM lineitem WHERE l_returnflag IN ('A', 'N')), " +
        "r AS (SELECT flag, h % 512 AS b, " +
        "CASE WHEN h // 512 = 0 THEN 52 " +
        "ELSE 52 - length(bin(h // 512)) END AS rho FROM h), " +
        "pf AS (SELECT flag, b, max(rho) AS m FROM r GROUP BY 1, 2), " +
        "mg AS (SELECT b, max(m) AS m FROM pf GROUP BY 1), " +
        "e AS (SELECT count(*) AS regs_hit, " +
        "CAST(sum(1::BIGINT << CAST(52 - m AS INT)) AS BIGINT) AS w_hit " +
        "FROM mg), " +
        "x AS (SELECT count(DISTINCT l_orderkey) AS n_exact FROM lineitem " +
        "WHERE l_returnflag IN ('A', 'N')) " +
        "SELECT e.regs_hit, " +
        "e.w_hit + (512 - e.regs_hit) * 4503599627370496 AS weight, " +
        Det.sql.r("0.7213 / (1.0 + 1.079 / 512.0) * 262144.0 * " +
          "4503599627370496.0 / CAST(e.w_hit + (512 - e.regs_hit) * " +
          "4503599627370496 AS DOUBLE)", 4) + " AS hll_estimate, " +
        "x.n_exact FROM e CROSS JOIN x"),
    "agg_histogram" ->
      ("SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) * 25000 " +
        "AS bucket_lo, count(*) AS n_orders, " +
        Det.sql.dsum("o_totalprice") + " AS bucket_value " +
        "FROM orders GROUP BY 1 ORDER BY bucket_lo"),
    "agg_assoc_rules" ->
      ("WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem), " +
        "n AS (SELECT count(DISTINCT o) AS n_orders FROM li), " +
        "pc AS (SELECT p, count(*) AS c FROM li GROUP BY 1), " +
        "pr AS (SELECT a.p AS x, b.p AS y, count(*) AS support FROM li a " +
        "JOIN li b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2) " +
        "SELECT x, y, support, " +
        Det.sql.r("CAST(support AS DOUBLE) / cx.c", 4) + " AS conf_xy, " +
        Det.sql.r("CAST(support AS DOUBLE) / cy.c", 4) + " AS conf_yx, " +
        Det.sql.r("CAST(support * n_orders AS DOUBLE) / (cx.c * cy.c)", 4) +
        " AS lift FROM pr JOIN pc cx ON cx.p = pr.x " +
        "JOIN pc cy ON cy.p = pr.y, n " +
        "ORDER BY support DESC, x, y LIMIT 25"),
    "agg_mode_median" ->
      ("WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS cnt " +
        "FROM lineitem GROUP BY 1, 2), " +
        "m AS (SELECT l_returnflag, arg_max(l_quantity, " +
        "cnt * 1000 + CAST(l_quantity AS BIGINT)) AS mode_qty FROM c GROUP BY 1) " +
        "SELECT l.l_returnflag, count(*) AS n, " +
        Det.sql.r("median(l_quantity)", 4) + " AS median_qty, " +
        "CAST(max(m.mode_qty) AS DOUBLE) AS mode_qty " +
        "FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag " +
        "GROUP BY 1 ORDER BY 1"),
    "agg_salted" ->
      ("SELECT l_returnflag, " + Det.sql.dsum("l_quantity") + " AS sum_qty, " +
        "count(*) AS n FROM lineitem GROUP BY 1 ORDER BY l_returnflag"),
    "agg_unpivot" ->
      ("WITH w AS (SELECT l_returnflag, " + Det.sql.dsum("l_quantity") +
        " AS sum_qty, " + Det.sql.dsum("l_extendedprice") + " AS sum_price " +
        "FROM lineitem GROUP BY 1) " +
        "SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w " +
        "UNION ALL SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM w " +
        "ORDER BY l_returnflag, measure"),
  )

  // ---- assembled ---------------------------------------------------------

  val queries: Map[String, Q] =
    Map("scan_project_filter" -> scanQ) ++ joinQueries ++ aggQueries

  val oracle: Map[String, String] = Map(
    "scan_project_filter" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
        "AND l_discount BETWEEN 0.05 AND 0.07 " +
        "ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate " +
        "LIMIT 100"),
  ) ++ joinOracle ++ aggOracle
}
