package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.{SparkEntry, TestSpark}

/** Subquery decorrelation guards (SURVEY §2 round-8 delta).
  *
  * The oracle gate proves the fixture answers; these pin the two things
  * the fixture can't: NOT IN's three-valued-logic edge (the fixture inner
  * side is null-free) and the plan shapes the 100 TB story relies on —
  * EXISTS/NOT IN must decorrelate to joins, never per-row re-execution.
  */
class SubquerySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("NOT IN with a NULL in the inner side returns zero rows (3VL)") {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").createOrReplaceTempView("outer_3vl")
    Seq(Some(2L), None).toDF("k2").createOrReplaceTempView("inner_3vl")
    // k NOT IN (2, NULL): k=1 gives (1<>2)=true AND (1<>NULL)=unknown
    // → unknown → filtered. The whole result must be empty.
    val n = spark.sql(
      "SELECT k FROM outer_3vl WHERE k NOT IN (SELECT k2 FROM inner_3vl)").count()
    assert(n == 0L, "NOT IN must drop every row when the inner side has a NULL")
    // and the same query with the NULL filtered out keeps the non-match
    val kept = spark.sql(
      "SELECT k FROM outer_3vl WHERE k NOT IN " +
        "(SELECT k2 FROM inner_3vl WHERE k2 IS NOT NULL)").as[Long].collect()
    assert(kept.toSeq == Seq(1L))
  }

  private def executed(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("sub_exists decorrelates to a hash semi join (no per-row subquery)") {
    val p = executed("sub_exists")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("InSubquery"), p)
  }

  test("sub_not_in plans the null-aware anti join, probe side unshuffled") {
    val p = executed("sub_not_in")
    assert(p.contains("LeftAnti"), p)
    // single-column NOT IN + small inner ⇒ broadcast NAAJ: the orders
    // probe side must not exchange
    assert(p.contains("Broadcast"), p)
  }

  test("sub_scalar_corr decorrelates to an aggregate+join, not re-execution") {
    val p = executed("sub_scalar_corr")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("Join"), p)
    // a surviving correlated ScalarSubquery node would mean per-row
    // re-execution — the scale-killer this query exists to disprove
    assert(!p.toLowerCase.contains("scalarsubquery"), p)
  }

  test("agg_unpivot expands rows x measures with no post-agg shuffle") {
    val df = SparkEntry.queries("agg_unpivot")(spark, sf)
    val rows = df.collect()
    // 3 returnflags x 2 measures, alternating measure labels per flag
    assert(rows.length == 6)
    assert(rows.map(_.getString(1)).distinct.sorted.toSeq ==
      Seq("sum_price", "sum_qty"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Expand") || p.contains("Generate"), p)
  }

  test("events_sessionize: session boundaries respect the 30-min gap") {
    import spark.implicits._
    val df = SparkEntry.queries("events_sessionize")(spark, sf)
      .select("user_id", "session_id", "n_events", "start_us", "end_us")
    val rows = df.as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2)
      // session ids are 1..k dense per user
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      // consecutive sessions are separated by MORE than the 30-min gap
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._4 - a._5 > 1800000000L,
          s"adjacent sessions closer than the gap: $a $b")
        case _ => ()
      }
      // within a session, span never jumps the gap across the boundary
      sorted.foreach(s => assert(s._5 >= s._4))
    }
  }
}
