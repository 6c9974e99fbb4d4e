package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan dump (dev tool): runMain graft.PlanDump <name> [sfDir] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .appName("graft-plan").master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, dir)
    df.collect()
    // formatted explain (the plans/rNN deliverable shape) + the executed
    // plan with final AQE decisions
    println("== EXPLAIN FORMATTED ==")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    println("== EXECUTED (final adaptive) ==")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
