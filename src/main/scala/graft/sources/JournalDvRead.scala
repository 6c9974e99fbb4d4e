package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, Project, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** DV-aware FAST batch reads (SURVEY §2 journal store; the Delta
  * deletion-vector read path re-expressed as a logical rewrite): a
  * batch read of a journal table that carries live deletion vectors is
  * rewritten AT ANALYSIS TIME from the V2 relation into the store's
  * DV-subtracted DataFrame plan — Spark's own vectorized parquet scan
  * over the manifest's file list, `_metadata.file_path`/`row_index`
  * row identity, and a broadcast-bounded anti-join against the tiny DV
  * table. Everything downstream is ordinary Catalyst: whole-stage
  * codegen, filter/column pushdown into the parquet scan, epoch/ns
  * partition pruning — where the no-extensions fallback
  * ([[JournalDvScan]]'s V1 bridge) pays an `RDD[Row]` conversion for
  * every read until the vectors are purged. At 100 TB with long-lived
  * vectors (GDPR holds, slow compaction windows) this rewrite is what
  * keeps every reader on the columnar path.
  *
  * The rewrite grafts the replacement plan under a Project that aliases
  * the new output to the relation's original attribute ids, so
  * references above (joins, filters, projections already resolved
  * against the relation) stay valid. Write positions are left alone:
  * a V2 write command's `table` must remain a relation (only its query
  * side is descended), and DELETE is owned by [[JournalDeleteRule]],
  * which runs earlier in the same post-hoc batch.
  *
  * Installed by `spark.sql.extensions=graft.expr.GraftExtensions`. */
class JournalDvReadRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** `spark.graft.journal.dvRewrite=false` disables the rewrite (the
    * read then rides [[JournalDvScan]]'s V1 bridge — the behavior of a
    * session without extensions); session-scoped escape hatch and the
    * lever that keeps the fallback path testable. */
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!spark.conf.getOption("spark.graft.journal.dvRewrite")
        .forall(_.toBoolean)) plan
    else rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case w: V2WriteCommand =>
      // rewrite only the query side; the table side must stay a relation
      w.withNewQuery(rewrite(w.query))
    case d: DeleteFromTable => d // JournalDeleteRule's node (already ran)
    case r: DataSourceV2Relation if r.table.isInstanceOf[JournalTable] &&
        r.table.asInstanceOf[JournalTable].hasLiveDv =>
      val child = r.table.asInstanceOf[JournalTable]
        .dvSubtractedFrame().queryExecution.analyzed
      val byName = child.output.map(a => a.name.toLowerCase -> a).toMap
      Project(r.output.map { a =>
        val src = byName.getOrElse(a.name.toLowerCase,
          throw new IllegalStateException(
            s"journal DV rewrite: store scan lacks column '${a.name}' " +
              s"declared by ${r.table.name()}"))
        Alias(src, a.name)(exprId = a.exprId)
      }, child)
    case other => other.mapChildren(rewrite)
  }
}
