package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** 100 TB technique proof: bucketing both fact tables on the join key
  * makes the join exchange-free — each task reads matching buckets from
  * both sides (co-located join). At cluster scale this removes the
  * dominant shuffle of fact-fact joins; here the plan shape is the
  * assertion. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed fact-fact join runs without a shuffle exchange") {
    // warehouse dir is a temp dir, set statically in TestSpark
    val sf = "/root/testdata/sf0.001"
    Tables(spark, sf, "orders").write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables(spark, sf, "lineitem").write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")
    try {
      // AQE can hide the exchange analysis; check the deterministic plan
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the only exchange allowed is the post-join aggregation shuffle —
      // neither join input may be re-partitioned
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
             !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        "join inputs must be co-located via buckets:\n" + plan)
      assert(plan.contains("Bucketed: true"), plan)
      // correctness: same result as the unbucketed join
      val expect = Tables(spark, sf, "lineitem")
        .join(Tables(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(_.toString).sorted.toSeq
      assert(j.collect().map(_.toString).sorted.toSeq === expect)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
