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

  test("topk_global compiles to TakeOrderedAndProject (no global sort)") {
    assert(plan("topk_global").contains("TakeOrderedAndProject"))
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
}
