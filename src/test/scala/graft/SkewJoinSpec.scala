package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** 100 TB technique proof #2: AQE skew-join splitting. A hot key that
  * would pin one reducer gets split into multiple tasks at runtime —
  * asserted from the final adaptive plan ("skewed" AQEShuffleRead). */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AQE splits a skewed join partition at runtime") {
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows on one hot key vs uniform tail. payload is md5 noise —
      // incompressible (skew stats measure COMPRESSED shuffle bytes) —
      // and flows through the agg so pruning can't drop it.
      val left = spark.range(0, 60000)
        .select(when($"id" < 50000, 1L).otherwise($"id").as("k"),
                md5(concat(lit("x"), $"id")).as("payload"))
      val right = spark.range(0, 10000).select($"id".as("k"), lit("r").as("tag"))
      val j = left.join(right, "k")
        .groupBy("tag").agg(count(lit(1)).as("n"), max("payload").as("mx"))
      // 50k hot-key rows match k=1 on the right; tail keys 50000+ miss
      val n = j.collect().map(_.getLong(1)).sum
      assert(n === 50000L)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skewed"), "expected a skew-split AQEShuffleRead:\n" + plan)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
