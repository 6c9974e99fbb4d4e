package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** SURVEY §5.2.5 — assert the physical-plan properties the 100 TB story
  * relies on (pushdown, pruning, join strategy, top-k, partial agg).
  * These are regression guards: a refactor that silently loses pushdown
  * or broadcests the wrong side fails here, not at the bench. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("scan_project_filter pushes predicates and prunes columns") {
    val p = plan("scan_project_filter")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // only the 5 projected + filter columns reach the parquet reader
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_tax"), "scan must not read unprojected columns")
  }

  test("join_broadcast uses BroadcastHashJoin (no shuffle of the fact side)") {
    val p = plan("join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("join_shuffle_hash honors the SHUFFLE_HASH hint") {
    assert(plan("join_shuffle_hash").contains("ShuffledHashJoin"))
  }

  test("join_sortmerge honors the MERGE hint") {
    assert(plan("join_sortmerge").contains("SortMergeJoin"))
  }

  test("join_range stays an equi join with range residual (no BNLJ)") {
    val p = plan("join_range")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("join_skew_handoff: hot-key handoff broadcasts, salted join shuffles, no BNLJ") {
    val df = SparkEntry.queries("join_skew_handoff")(spark, sf)
    df.collect() // AQE: final plan only materializes after execution
    val p = df.queryExecution.executedPlan.toString
    // the report->factor handoff must ride broadcasts to both sides
    assert(p.contains("BroadcastHashJoin"), p)
    // the salted fact-dim join itself stays a SHUFFLED HASH join keyed
    // on (key, salt) — a lost salt equi-key would degrade it to a
    // nested-loop/cartesian plan, the scale killer this pin guards.
    // (The 1-row `tot` scalar rides a broadcast nested loop by design —
    // the scalar-subquery pattern — so the assertion targets the fact
    // join's keys, not the operator's absence globally.)
    assert("ShuffledHashJoin \\[user_id#\\d+L?, salt#\\d+L?\\]".r
      .findFirstIn(p).isDefined, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("topk_global compiles to TakeOrderedAndProject (no global sort)") {
    assert(plan("topk_global").contains("TakeOrderedAndProject"))
  }

  test("sample_reservoir compiles to TakeOrderedAndProject (no global " +
      "sort, no shuffle of the corpus)") {
    val p = plan("sample_reservoir")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("sim_ann_pq scores inside the corpus scan stage with a broadcast " +
      "probe and keeps k via TakeOrderedAndProject") {
    val p = plan("sim_ann_pq")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("Broadcast"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("agg_hll_custom: registers build through two-phase hash " +
      "aggregation, no UDF anywhere") {
    val p = plan("agg_hll_custom")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "expected partial+final for both the register and combine aggs: " + p)
    assert(!p.contains("ScalaUDF"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("agg_regression is ONE two-phase hash aggregate (no second pass)") {
    val p = plan("agg_regression")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Join"), "OLS must not need a join: " + p)
  }

  test("events_interpolate windows run over the pre-aggregated minute " +
      "frame, never the event stream") {
    val df = SparkEntry.queries("events_interpolate")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the event-grain aggregation happens BELOW the window operators:
    // a Window directly over the parquet scan would be the scale bug
    val winIdx = p.indexOf("Window")
    val aggIdx = p.indexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx >= 0, p)
    // plan strings print root-first: the Window must sit ABOVE the
    // aggregate that collapsed the stream to minutes
    assert(winIdx < aggIdx, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("agg_groupby_q1 runs two-phase hash aggregation (map-side partial)") {
    val p = plan("agg_groupby_q1")
    assert(p.contains("HashAggregate"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final")
  }

  test("whole-stage codegen spans the Q1 pipeline") {
    // AQE only materializes the final plan (with codegen stages) after
    // execution — run the query first
    val df = SparkEntry.queries("agg_groupby_q1")(spark, sf)
    df.collect()
    // codegen stages render as "*(n) Operator" in the final AQE plan
    assert(df.queryExecution.executedPlan.toString.contains("*("))
  }

  /** Full traversal including AQE query-stage wrappers (leaf nodes for
    * plain TreeNode.collect). */
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: flatten(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: flatten(q.plan)
    case _ => p +: p.children.flatMap(flatten)
  }

  private def assertMapSideCentroidAssign(q: String): Unit = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect()
    val all = flatten(df.queryExecution.executedPlan)
    // the quantizer join must stream the embeddings scan with NO exchange
    // of any kind on the vector side (the argmax happens in the projection)
    val ok = all.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.exists { j =>
      val l = flatten(j.left)
      l.exists(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]) &&
        !l.exists(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    }
    assert(ok, df.queryExecution.executedPlan.toString)
  }

  test("sim_knn_join assigns centroids map-side (no vector-side shuffle)") {
    assertMapSideCentroidAssign("sim_knn_join")
  }

  test("sim_ann_ivf assigns centroids map-side (no vector-side shuffle)") {
    assertMapSideCentroidAssign("sim_ann_ivf")
  }

  test("emb_kmeans: every assignment round is map-side (broadcast packed " +
    "centroids, no corpus-keyed exchange); updates shuffle only (cl, dim)") {
    val df = SparkEntry.queries("emb_kmeans")(spark, sf)
    df.collect()
    val all = flatten(df.queryExecution.executedPlan)
    // three Lloyd assignment rounds = three broadcast cross joins whose
    // STREAM side reaches the parquet scan with no shuffle in between
    val assigns = all.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.filter { j =>
      val l = flatten(j.left)
      l.exists(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]) &&
        !l.exists(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    }
    assert(assigns.size >= 3, df.queryExecution.executedPlan.toString)
    // no exchange anywhere is keyed on the corpus (vec_id / q) — the only
    // hash shuffles carry (cl[, i]) partial sums; the final global sort's
    // range exchange is output ordering, not computation
    val badExchange = all.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.exists(e => e.outputPartitioning.toString.contains("vec_id") &&
      !e.outputPartitioning.toString.contains("range"))
    assert(!badExchange, df.queryExecution.executedPlan.toString)
  }

  test("journal stateAt after checkpoint prunes segment partitions") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_plan_").toString + "/store"
    val store = journal.JournalStore.create(spark, path, epochSize = 2)
    store.append(Seq(
      ("a", 1L, TestSpark.ts("2024-01-01 00:00:01"), "p0", 0.0),
      ("a", 1L, TestSpark.ts("2024-01-01 00:00:02"), "p1", 0.0),
      ("a", 1L, TestSpark.ts("2024-01-01 00:00:03"), "p2", 0.0),
      ("a", 1L, TestSpark.ts("2024-01-01 00:00:04"), "p3", 0.0),
      ("a", 1L, TestSpark.ts("2024-01-01 00:00:05"), "p4", 0.0),
      ("a", 1L, TestSpark.ts("2024-01-01 00:00:06"), "p5", 0.0),
    ).toDF("ns", "ukey", "ts", "payload", "val"))
    store.checkpoint(3L)
    val p = store.stateAt(5L).queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("epoch"), p)
  }

  test("journal scan-mode read is a columnar BatchScan with epoch/file pruning") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_plan_").toString + "/store"
    val store = journal.JournalStore.create(spark, path, epochSize = 2)
    store.append(Seq( // seqs 0..5 → epochs 0..2; keys split across epochs
      ("a", 1L, TestSpark.ts("2024-01-01 00:00:01"), "p0", 0.0),
      ("a", 2L, TestSpark.ts("2024-01-01 00:00:02"), "p1", 0.0),
      ("a", 1L, TestSpark.ts("2024-01-01 00:00:03"), "p2", 0.0),
      ("a", 2L, TestSpark.ts("2024-01-01 00:00:04"), "p3", 0.0),
      ("a", 11L, TestSpark.ts("2024-01-01 00:00:05"), "p4", 0.0),
      ("a", 12L, TestSpark.ts("2024-01-01 00:00:06"), "p5", 0.0),
    ).toDF("ns", "ukey", "ts", "payload", "val"))
    val scan = spark.read.format("journal").load(path)
    // the DSv2 path: vectorized parquet BatchScan, no RDD[Row] bridge
    val p = scan.where($"seq" >= 4).queryExecution.executedPlan.toString
    assert(p.contains("BatchScan"), p)
    assert(!p.contains("ExistingRDD"), p)
    assert(p.contains("PushedFilters") && p.contains("seq"), p)
    def nFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
            .toBatch.planInputPartitions().foldLeft(0)((n, ip) =>
              n + ip.asInstanceOf[org.apache.spark.sql.execution.datasources.FilePartition]
                .files.length)
      }.foldLeft(0)(_ + _)
    val all = nFiles(scan)
    assert(all === 3, s"expected 3 epoch files, planned $all")
    // pushed seq bound → epoch partition-DIRECTORY pruning (seq div
    // epochSize is store arithmetic Spark can't derive on its own)
    assert(nFiles(scan.where($"seq" >= 4)) === 1)
    assert(nFiles(scan.where($"seq" < 2)) === 1)
    // pushed ukey equality → per-file stats pruning below directory level
    assert(nFiles(scan.where($"ukey" === 12L)) === 1)
    // and the pruned reads stay correct
    assert(scan.where($"seq" >= 4).select("payload").as[String].collect().sorted
      === Array("p4", "p5"))
    assert(scan.where($"ukey" === 12L).select("payload").as[String].head() === "p5")
  }

  test("journal readStream resolves to the V2 MicroBatchStream, not a V1 Source") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_plan_").toString + "/store"
    val store = journal.JournalStore.create(spark, path, epochSize = 2)
    store.append(Seq(("a", 1L, TestSpark.ts("2024-01-01 00:00:01"), "p0", 0.0))
      .toDF("ns", "ukey", "ts", "payload", "val"))
    val df = spark.readStream.format("journal").load(path)
    // V2 resolution: the logical plan is StreamingRelationV2 over the
    // journal table (a V1 fallback would plan StreamingRelation over a
    // DataSource). The stream itself (admission control, per-file
    // partitions, offset restart) is exercised end-to-end in
    // streaming/StreamingSpec.
    val cls = df.queryExecution.analyzed.getClass.getSimpleName
    assert(cls === "StreamingRelationV2", cls)
    // and the streamed surface matches the batch table surface
    assert(df.schema.fieldNames.toSeq ===
      spark.read.format("journal").load(path).schema.fieldNames.toSeq)
  }

  test("win_ntile_pct plans no single-partition window stage") {
    // the global-order ranking runs as range-partition + per-partition
    // offsets — there must be NO WindowExec (a total-order window
    // collapses to one task) and no SinglePartition exchange
    val df = SparkEntry.queries("win_ntile_pct")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    // (the one-row scalar count agg legitimately exchanges to a single
    // partition — that's 32 partial counts, not the data path)
    assert(p.contains("rangepartitioning"), p)
    // and the rank is DF-native: no RDD bridge (the zipWithIndex hop
    // dropped codegen and paid Row ser/deser on the whole table)
    assert(!p.contains("ExistingRDD"), p)
  }

  test("win_ntile_pct survives plan caching (AQE per-reader coalescing regression)") {
    // a cached plan disables AQE coalescing on the output branch but
    // not on other readers of a reused exchange — with a count-less
    // range repartition the partition ids diverged between the data and
    // counts branches and the offset join silently dropped rows. The
    // explicit-partition-count fix must keep every row under persist.
    val df = SparkEntry.queries("win_ntile_pct")(spark, sf).persist()
    try assert(df.count() ===
      graft.Tables(spark, sf, "part").count())
    finally df.unpersist()
  }

  test("text_pack_sequences windows partition by source (no global cumsum)") {
    val df = SparkEntry.queries("text_pack_sequences")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Window"), p)
    assert(!p.contains("SinglePartition"), p)
    assert("hashpartitioning\\(source".r.findFirstIn(p).isDefined, p)
  }

  test("dedup_span merges intervals through doc-partitioned windows " +
      "(no single-partition window; anchor counts combine map-side)") {
    val df = SparkEntry.queries("dedup_span")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the gaps-and-islands lag/sum windows ride the doc_id hash
    // partitioning — a corpus-wide window would read SinglePartition
    assert(p.contains("Window"), p)
    assert(!p.contains("SinglePartition"), p)
    assert("hashpartitioning\\(doc_id".r.findFirstIn(p).isDefined, p)
    // the ≥2-count anchor detection is a count(*) aggregate (partial_
    // count map-side), never an exact-distinct expansion
    assert(p.contains("partial_count"), p)
  }

  test("dedup_span_scrub: first-occurrence is a min-struct aggregate " +
      "(map-side partials), never a window partitioned on the gram axis") {
    val df = SparkEntry.queries("dedup_span_scrub")(spark, sf)
    df.collect()
    val lp = df.queryExecution.optimizedPlan
    val wins = lp.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    // the gaps-and-islands windows remain (doc_id axis — bounded by a
    // document's own length); NONE may partition on the corpus-hot
    // shingle hash, where one boilerplate 8-gram becomes a straggler
    assert(wins.nonEmpty, lp.toString)
    wins.foreach { w =>
      val parts = w.partitionSpec.map(_.toString).mkString(",")
      assert(parts.contains("doc_id"), w.toString)
      assert(!w.partitionSpec.exists(_.toString.startsWith("g#")),
        w.toString)
    }
    // the first-occurrence mark partial-aggregates map-side: a hot
    // gram contributes one (min, count) partial per map task
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_min"), p)
    assert(p.contains("partial_count"), p)
  }

  test("text_domain_cap caps through topk_by (no per-domain rank window)") {
    val lp = SparkEntry.queries("text_domain_cap")(spark, sf)
      .queryExecution.optimizedPlan
    assert(lp.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.isEmpty, lp.toString)
    assert(lp.toString.contains("topk_by"), lp.toString)
  }

  test("sim_hybrid_rrf ranks both legs via topk_by arrays (no corpus window)") {
    val lp = SparkEntry.queries("sim_hybrid_rrf")(spark, sf)
      .queryExecution.optimizedPlan
    assert(lp.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.isEmpty, lp.toString)
    assert("topk_by".r.findAllIn(lp.toString).size >= 2, lp.toString)
  }

  test("text_shard_pack: the only global-order window runs over bucket " +
      "totals, never the corpus") {
    val lp = SparkEntry.queries("text_shard_pack")(spark, sf)
      .queryExecution.optimizedPlan
    val wins = lp.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.size === 2, lp.toString)
    val (glob, part) = wins.partition(_.partitionSpec.isEmpty)
    assert(part.size === 1 && glob.size === 1, lp.toString)
    // the empty-partition window must consume the 64-row bucket
    // ROLLUP (an Aggregate beneath it), never corpus-grain rows
    assert(glob.head.child.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty, glob.head.toString)
  }

  test("text_repetition is a single map-side pass (no mid-query shuffle)") {
    val p = plan("text_repetition")
    // the only exchange allowed is the final presentation orderBy;
    // no Exchange may appear below the Sort (i.e. no agg/join shuffle)
    val belowSort = p.substring(p.indexOf("Sort"))
    assert(!belowSort.contains("hashpartitioning"),
      s"per-doc metrics must not shuffle:\n$p")
  }

  test("sim_ann_lsh buckets map-side and broadcasts the probe buckets") {
    // candidates must come from an equi BroadcastHashJoin on
    // (table, bucket) — the corpus side is never shuffled for the join
    val p = plan("sim_ann_lsh")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("journal_diff joins the two states without an extra exchange") {
    // both state aggregates hash-partition on (ns, ukey); the diff join
    // must reuse that partitioning — exactly 2 hash exchanges (one per
    // aggregate), none for the join itself
    val df = SparkEntry.queries("journal_diff")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges === 2, s"expected 2 hash exchanges, plan:\n$p")
  }

  test("runtime bloom filter prunes the fact scan under a selective dim filter") {
    // The 100 TB shuffle-join lever beyond broadcast: when the dim side
    // of a shuffle join carries a selective filter, Catalyst's
    // InjectRuntimeFilter builds a bloom filter from the dim keys and
    // applies might_contain on the fact scan — fact rows that can't join
    // die before the exchange. Thresholds here only widen eligibility so
    // the rule fires at test scale; the plan shape is what's asserted.
    val sets = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val olds = sets.map { case (k, _) => k -> spark.conf.getOption(k) }
    sets.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables(spark, sf, "lineitem")
      val ord = Tables(spark, sf, "orders")
        .where(org.apache.spark.sql.functions.col("o_totalprice") > 500000)
      val j = li.join(ord,
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"), p)
    } finally olds.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("dedup_corpus_minhash scans+tokenizes the corpus exactly once") {
    // the shingle-array frame is localCheckpoint'd at build time and
    // reused by signatures, verification (both sides) and the final
    // anti-join: the query's own executed plan must contain NO parquet
    // scan of documents — every consumer reads the one materialized RDD
    val df = SparkEntry.queries("dedup_corpus_minhash")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("documents.parquet"),
      "corpus subtree must be shared, not re-scanned:\n" + p)
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"), p)
  }

  test("text_decontaminate broadcasts the eval n-gram set (corpus never shuffles on grams)") {
    val df = SparkEntry.queries("text_decontaminate")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "eval grams must broadcast into a map-side semi join:\n" + p)
  }

  test("dedup_minhash reuses the signature aggregation across the self-join") {
    val df = SparkEntry.queries("dedup_minhash")(spark, sf)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "both band sides should share one signature shuffle")
  }

  test("sample_source_mix broadcasts the rate table (corpus never shuffles)") {
    val df = SparkEntry.queries("sample_source_mix")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "per-source rates must broadcast into the corpus scan:\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the corpus side must not shuffle for the rate join:\n" + p)
  }

  test("events_anomaly windows over the daily pre-aggregate, not the event stream") {
    val df = SparkEntry.queries("events_anomaly")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the window's input partitioning is the daily aggregate's (event_
    // type, day) grouping — Catalyst must not add a second full-stream
    // exchange for the window pass (partial agg → one hash exchange on
    // the grouping, then a tiny repartition of daily rows at most)
    assert(p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
    // node-level count (the AQE plan STRING renders the same scan twice,
    // once under Final and once under Initial)
    val fullScans = flatten(df.queryExecution.executedPlan).count(
      _.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
    assert(fullScans == 1, s"expected one events scan, plan:\n$p")
  }

  test("dedup_embedding_lsh shares one bucket exchange and never goes all-pairs") {
    val df = SparkEntry.queries("dedup_embedding_lsh")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // candidate generation must be an EQUI join on (tbl, bucket). At this
    // fixture size AQE broadcasts one side (BroadcastHashJoin); at scale
    // both sides shuffle on the bucket and share the exchange — either
    // hash flavor is the banded shape. What must never appear is a
    // nested-loop/cartesian, i.e. all-pairs.
    assert(p.contains("BroadcastHashJoin") || p.contains("ReusedExchange"),
      "bucket join must be an equi hash join:\n" + p)
    assert(!p.contains("CartesianProduct"),
      "candidate generation must be the banded equi-join, never all-pairs:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("events_rolling_dau expands map-side — no spine join, no nested loop over events") {
    val df = SparkEntry.queries("events_rolling_dau")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Generate"),
      "each (day, user) row must explode to its <=7 report days:\n" + p)
    // only joins allowed: the 1-row broadcast max-day scalar (a BNLJ with
    // a single-row build side); no shuffled join of any flavor
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("text_cms_topk probes the sketch with a broadcast, one corpus-token shuffle") {
    val df = SparkEntry.queries("text_cms_topk")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "the 80-row probe side must broadcast into the sketch:\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("dedup_normtext shuffles md5 digests, never document bodies") {
    val df = SparkEntry.queries("dedup_normtext")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the aggregation exchange must key on the digest column h — a plan
    // that exchanges on text means bodies cross the wire at 100 TB
    assert("Exchange hashpartitioning\\(h#".r.findFirstIn(p).isDefined,
      "aggregate must shuffle on the md5 digest:\n" + p)
    assert(!"Exchange hashpartitioning\\(text#".r.findFirstIn(p).isDefined, p)
  }

  test("TopN pushdown on seq: a tail read plans only the extreme files; " +
      "both directions stay correct; filters disable the pruning") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = java.nio.file.Files.createTempDirectory("graft_topn_")
      .toString + "/store"
    val store = journal.JournalStore.create(spark, path, epochSize = 2)
    store.append((0 until 10).map(i =>
      ("a", i.toLong, TestSpark.ts(f"2024-01-01 00:00:${i + 1}%02d"),
        s"p$i", i.toDouble))
      .toDF("ns", "ukey", "ts", "payload", "val")) // 5 epoch files
    def nFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
            .toBatch.planInputPartitions().foldLeft(0)((n, ip) =>
              n + ip.asInstanceOf[org.apache.spark.sql.execution.datasources.FilePartition]
                .files.length)
      }.foldLeft(0)(_ + _)
    val scan = spark.read.format("journal").load(path)
    val tail = scan.orderBy(col("seq").desc).limit(3)
    assert(nFiles(tail) === 2, "top-3 of 2-row files needs 2 files")
    assert(tail.select("payload").as[String].collect().toSeq ===
      Seq("p9", "p8", "p7"))
    val head3 = scan.orderBy(col("seq").asc).limit(3)
    assert(nFiles(head3) === 2)
    assert(head3.select("payload").as[String].collect().toSeq ===
      Seq("p0", "p1", "p2"))
    // a pushed row filter makes file row counts unusable — no pruning,
    // and the answer is still exact
    val filtered = scan.where(col("ukey") % 2 === 0)
      .orderBy(col("seq").desc).limit(2)
    assert(nFiles(filtered) === 5)
    assert(filtered.select("payload").as[String].collect().toSeq ===
      Seq("p8", "p6"))
  }

  test("sim_batch_topk reduces map-side through the bounded topk_by " +
      "aggregate — no rank window, partial before the exchange") {
    val df = SparkEntry.queries("sim_batch_topk")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // typed-imperative top-k → ObjectHashAggregate partial+final; a
    // Window here would mean every scored row crossed the exchange
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_topk_by") || p.contains("partial topk_by") ||
      "partial.*topk_by".r.findFirstIn(p).isDefined, p)
  }

  test("nsGrouped journal scan: ns-keyed aggregation and two-store join " +
      "plan ZERO exchanges (storage-partitioned execution)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, max, max_by}
    def mkStore(tag: String, rows: Seq[(String, Long, String, Double)]): String = {
      val path = java.nio.file.Files.createTempDirectory(s"graft_spj_$tag")
        .toString + "/store"
      val store = journal.JournalStore.create(spark, path, epochSize = 3)
      store.append(rows.zipWithIndex.map { case ((ns, k, p, v), i) =>
        (ns, k, TestSpark.ts(f"2024-01-01 00:00:${i + 1}%02d"), p, v)
      }.toDF("ns", "ukey", "ts", "payload", "val"))
      path
    }
    // 3 namespaces × multiple epochs, overlapping keys across stores
    val pa = mkStore("a", Seq(
      ("x", 1L, "a0", 1.0), ("x", 2L, "a1", 2.0), ("y", 1L, "a2", 3.0),
      ("y", 3L, "a3", 4.0), ("z", 5L, "a4", 5.0), ("x", 1L, "a5", 6.0),
      ("z", 6L, "a6", 7.0), ("y", 1L, "a7", 8.0)))
    val pb = mkStore("b", Seq(
      ("x", 1L, "b0", 10.0), ("y", 1L, "b1", 20.0), ("y", 3L, "b2", 30.0),
      ("z", 9L, "b3", 40.0), ("x", 2L, "b4", 50.0)))
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def grouped(p: String) = spark.read.format("journal")
        .option("nsGrouped", "true").load(p)
      // (a) state reconstruction — groupBy(ns, ukey) arg-max — runs
      // entirely inside the scan stage: no exchange anywhere
      val state = grouped(pa).groupBy("ns", "ukey")
        .agg(max_by(col("payload"), col("seq")).as("payload"),
             max(col("seq")).as("last_seq"))
      val rows = state.collect()
      val p1 = state.queryExecution.executedPlan.toString
      assert(!p1.contains("Exchange"), "ns-grouped agg must not shuffle:\n" + p1)
      // and it agrees with the stock (shuffling) plan row for row
      val stock = spark.read.format("journal").load(pa).groupBy("ns", "ukey")
        .agg(max_by(col("payload"), col("seq")).as("payload"),
             max(col("seq")).as("last_seq"))
      assert(rows.map(_.toString).sorted.toSeq ===
        stock.collect().map(_.toString).sorted.toSeq)
      assert(rows.length === 6)
      // (b) storage-partitioned JOIN: both sides ns-grouped, equi key =
      // the partition key — broadcast disabled, so a shuffle-free plan
      // can only come from SPJ. (Join keys ⊋ partition keys still
      // shuffle: Spark's co-partitioning check requires the partition
      // keys to cover the join keys — see the scan's scaladoc.)
      val j = grouped(pa).select("ns", "payload")
        .join(grouped(pb).select(col("ns"), col("payload").as("pb")),
          Seq("ns"))
      val got = j.collect()
      val p2 = j.queryExecution.executedPlan.toString
      assert(!p2.contains("Exchange"), "SPJ join must not shuffle:\n" + p2)
      assert(got.length === 14, got.length) // per-ns m×n: 3·2 + 3·2 + 2·1
      // (b2) journal ⋈ PLAIN table on ns with one-sided shuffle
      // (v2.bucketing.shuffle.enabled): the 100 TB log side stays in
      // place; only the small plain side exchanges INTO the log's
      // key-grouped layout
      spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      val dim = Seq(("x", "alpha"), ("y", "beta"), ("z", "gamma"),
        ("w", "nope")).toDF("ns", "label")
      val j2 = grouped(pa).select("ns", "payload").join(dim, Seq("ns"))
      assert(j2.collect().length === 8)
      val p3 = j2.queryExecution.executedPlan.toString
      assert(p3.contains("Exchange keygroupedpartitioning"), p3)
      assert(!p3.contains("Exchange hashpartitioning"),
        "the journal side must not shuffle:\n" + p3)
      // (c) without the option the same aggregate DOES exchange — the
      // pin above is meaningful, not vacuous
      val off = spark.read.format("journal").load(pa).groupBy("ns", "ukey")
        .agg(max(col("seq")).as("last_seq"))
      off.collect()
      assert(off.queryExecution.executedPlan.toString.contains("Exchange"))
      // (c2) static partition pruning composes with grouping: an ns
      // filter drops whole directories BEFORE the regroup, the agg
      // still plans zero exchanges and the answer is exact
      val one = grouped(pa).where(col("ns") === "y").groupBy("ns", "ukey")
        .agg(max(col("seq")).as("last_seq"))
      val oneRows = one.collect()
      assert(oneRows.map(_.getLong(1)).sorted.toSeq === Seq(1L, 3L))
      assert(!one.queryExecution.executedPlan.toString.contains("Exchange"))
      // (d) LIVE DELETION VECTORS trump grouping: the DV-subtracted
      // read path serves correct rows; the nsGrouped option degrades
      // gracefully (no grouping claim, never a wrong answer)
      journal.JournalStore.open(spark, pb).deleteWhereDv(col("ukey") === 9L)
      val dv = grouped(pb).groupBy("ns")
        .agg(max(col("ukey")).as("mx")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(dv === Map("x" -> 2L, "y" -> 3L)) // z's only row (9) is dead
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
