package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.journal.JournalStore

/** `spark.read.format("journal")` — the journal store as a first-class
  * Spark data source, so a reference user's "open the log and query it"
  * entry point exists without touching the `JournalStore` API:
  *
  *   spark.read.format("journal").load("/path/to/store")          // scan
  *   spark.read.format("journal").option("asOfSeq", 5000).load(p) // state
  *   spark.read.format("journal").option("asOfTs", t).load(p)     // ″ by ts
  *
  * Built on the stable DataSource V1 relation API (`RelationProvider` +
  * `PrunedFilteredScan`): the store already yields optimized DataFrames
  * (manifest-scoped file lists, checkpoint + bounded tail replay), so the
  * relation only needs to translate pushed filters — notably turning a
  * pushed `seq` bound into an `epoch` partition-directory bound, which is
  * what actually prunes IO at 100 TB (epoch dirs are partition columns;
  * `seq = epoch·epochSize + k` is arithmetic Spark can't derive itself).
  * Column pruning is forwarded so the parquet scan reads only requested
  * columns. Filters are ALSO left in the plan (Spark re-applies what DSv1
  * sources don't declare handled), so pruning here is pure IO savings,
  * never a correctness dependency. */
class JournalSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "journal"

  override def createRelation(ctx: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("journal source requires a path"))
    val store = JournalStore.open(ctx.sparkSession, path)
    val asOfSeq = parameters.get("asOfSeq").map(_.toLong)
    val asOfTs = parameters.get("asOfTs")
    val ns = parameters.get("ns")
    val epochSize = store.epochSize

    // state mode (point-in-time read) vs scan mode (raw log); the ns
    // option filters BOTH modes. asOfTs accepts ISO-8601 'T' or the
    // JDBC space-separated form.
    val base0 = (asOfSeq, asOfTs) match {
      case (Some(s), _) => store.stateAt(s)
      case (None, Some(t)) =>
        store.stateAtTs(java.sql.Timestamp.valueOf(t.replace('T', ' ')))
      case _ => store.scanUnordered()
    }
    val base = ns.fold(base0)(n => base0.where(col("ns") === n))
    val isScan = asOfSeq.isEmpty && asOfTs.isEmpty

    new BaseRelation with PrunedFilteredScan {
      override val sqlContext: SQLContext = ctx
      override val schema: StructType = base.schema

      override def buildScan(requiredColumns: Array[String],
                             filters: Array[Filter]): RDD[Row] = {
        var d = base
        if (isScan) filters.foreach {
          // seq bounds → epoch partition-dir bounds (the IO pruner) +
          // the row-level bound itself
          case GreaterThan("seq", v: Long) =>
            d = d.where(col("epoch") >= v / epochSize && col("seq") > v)
          case GreaterThanOrEqual("seq", v: Long) =>
            d = d.where(col("epoch") >= v / epochSize && col("seq") >= v)
          case LessThan("seq", v: Long) =>
            d = d.where(col("epoch") <= v / epochSize && col("seq") < v)
          case LessThanOrEqual("seq", v: Long) =>
            d = d.where(col("epoch") <= v / epochSize && col("seq") <= v)
          case EqualTo("seq", v: Long) =>
            d = d.where(col("epoch") === v / epochSize && col("seq") === v)
          case EqualTo("ns", v: String) => d = d.where(col("ns") === v)
          case EqualTo("ukey", v: Long) => d = d.where(col("ukey") === v)
          case _ => () // unsupported filters: Spark re-applies them anyway
        }
        val cols = if (requiredColumns.isEmpty) Array(schema.fieldNames.head)
                   else requiredColumns
        d.select(cols.map(col).toIndexedSeq: _*).rdd
      }
    }
  }
}
