package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.LongType

/** SQL `DELETE FROM <journal table> WHERE …` → [[graft.journal.JournalStore.deleteWhere]]
  * (physical erasure: manifest candidate pruning, touched-file rewrite,
  * checkpoint drop, single-writer CAS), via a session-extension rule —
  * the same pattern Delta's DeltaAnalysis uses, and for the same reason:
  * Spark's built-in metadata-only DELETE path requires the scan relation
  * DIRECTLY under DeleteFromTable, but every file-based scan outputs
  * partition columns last, so a table whose declared column order
  * interleaves them (ours puts `ns` second, matching the V1 surface)
  * always gets a reorder Project inserted by scan pushdown and the
  * built-in path dies with an internal error. Rewriting at post-hoc
  * resolution time sidesteps scan planning entirely — a DELETE needs no
  * scan; the store runs its own probe.
  *
  * Installed by `spark.sql.extensions=graft.expr.GraftExtensions`. */
class JournalDeleteRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case d @ DeleteFromTable(child, cond) =>
      EliminateSubqueryAliases(child) match {
        case r: DataSourceV2Relation if r.table.isInstanceOf[JournalTable] =>
          require(!SubqueryExpression.hasSubquery(cond),
            "DELETE on a journal table does not support subqueries in the " +
              "condition; materialize the subquery into a literal list first")
          JournalDeleteCommand(r.table.asInstanceOf[JournalTable], cond)
        case _ => d
      }
  }
}

/** Runs the erase on the driver (the store operation launches its own
  * probe/rewrite Spark jobs); returns the erased-row count. */
case class JournalDeleteCommand(@transient table: JournalTable,
                                cond: Expression)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("deleted_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(table.deleteWhereExpr(cond)))
}
