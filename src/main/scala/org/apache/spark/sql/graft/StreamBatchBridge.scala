package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** The one Spark-internal call the `journal` streaming sink needs.
  *
  * The DataFrame handed to `Sink.addBatch` carries the micro-batch's
  * incremental plan, which only executes inside the streaming query —
  * feeding it to a normal batch write throws "streaming sources must be
  * executed with writeStream.start()". The established fix (what Spark's
  * own `ForeachBatchSink` does) is to re-root the executed micro-batch
  * RDD under a fresh non-streaming `LogicalRDD`. Both `Dataset.ofRows`
  * and `LogicalRDD.fromDataset` are `private[sql]`, hence this shim
  * lives under `org.apache.spark.sql`.
  */
object StreamBatchBridge {
  def asBatchDF(data: DataFrame): DataFrame = {
    val ds = data.asInstanceOf[ClassicDataset[Row]]
    ClassicDataset.ofRows(ds.sparkSession,
      LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds, isStreaming = false))
  }

  /** The mirror move for a DSv1 streaming SOURCE: `Source.getBatch` must
    * hand MicroBatchExecution a STREAMING DataFrame (it asserts
    * isStreaming), but the journal's per-batch plan is an ordinary batch
    * scan of immutable segment files — re-root its executed RDD under a
    * streaming `LogicalRDD`, exactly what Spark's own FileStreamSource
    * does via internalCreateDataFrame(isStreaming = true). */
  def asStreamingDF(data: DataFrame): DataFrame = {
    val ds = data.asInstanceOf[ClassicDataset[Row]]
    ClassicDataset.ofRows(ds.sparkSession,
      LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds, isStreaming = true))
  }

  /** Column-from-Expression for the SQL DELETE extension rule: Spark 4
    * removed the public Column(expr) constructor and the replacement
    * `ExpressionUtils.column` is private[sql]. */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** DataFrame-from-LogicalPlan for the SQL MERGE extension rule: the
    * resolved MergeIntoTable's source subtree must become an ordinary
    * DataFrame to feed the store's merge, and `Dataset.ofRows` is
    * private[sql]. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    ClassicDataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
