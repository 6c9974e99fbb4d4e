package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §2 (the binding operator
  * inventory) and §7 (build plan). Each section object keeps its Spark
  * builders and their DuckDB oracle SQL textually adjacent so the two
  * sides evolve together. */
object SparkEntry {

  /** Flagship: TPC-H Q1 (SURVEY §2.D `agg_groupby_q1`) on sf0.001;
    * driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.queries("agg_groupby_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    JournalOps.queries ++ RelationalOps.queries ++ SubqueryOps.queries ++
      WindowSetOps.queries ++ ScalarFnOps.queries ++ LlmOps.queries ++
      LlmExtOps.queries ++ StreamBatchOps.queries ++ GraphOps.queries

  /** DuckDB 1.0 twin for every SQL-expressible query (driver's t2 gate).
    * Keys absent here get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    JournalOps.oracle ++ RelationalOps.oracle ++ SubqueryOps.oracle ++
      WindowSetOps.oracle ++ ScalarFnOps.oracle ++ LlmOps.oracle ++
      LlmExtOps.oracle ++ StreamBatchOps.oracle ++ GraphOps.oracle
}
