package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, DeleteFromTable, LogicalPlan, Project, V2WriteCommand}
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
    * lever that keeps the fallback path testable.
    *
    * A plan that IS the bare relation (what `load(path)` analyzes
    * eagerly, before any operator exists above it) is left alone:
    * every Dataset operation built on it re-analyzes the composed
    * tree, where this rule then sees the operator context — which is
    * what lets the count-star case below keep its metadata answer
    * (`df.count()` on a DV store is a manifest parse, not a scan). The
    * one shape that stays on the V1 bridge is a bare
    * `load(path).collect()` — correct, and not a plan worth a fast
    * path (an unprojected full-table driver collect). */
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!spark.conf.getOption("spark.graft.journal.dvRewrite")
        .forall(_.toBoolean)) plan
    else plan match {
      case _: DataSourceV2Relation => plan
      case _ => rewrite(plan)
    }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case w: V2WriteCommand =>
      // rewrite only the query side; the table side must stay a relation
      w.withNewQuery(rewrite(w.query))
    case d: DeleteFromTable => d // JournalDeleteRule's node (already ran)
    case a: Aggregate if countStarOverDvJournal(a) =>
      // `SELECT count(*) [GROUP BY ns/epoch] FROM t` directly over a
      // DV-carrying relation: per-file row counts are DV-decremented
      // exactly, so the scan builder answers it from the manifest with
      // ZERO files opened (ManifestAggScan) — a rewrite here would turn
      // the metadata parse into a full scan + anti-join. Left alone on
      // purpose; every other shape (filters, other aggregates) falls
      // through to the rewrite below.
      a
    case r: DataSourceV2Relation if r.table.isInstanceOf[JournalTable] &&
        r.table.asInstanceOf[JournalTable].hasLiveDv &&
        !r.table.asInstanceOf[JournalTable].isChangeFeed =>
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

  /** True for an Aggregate whose child is a live-DV journal relation and
    * whose surface is exactly the manifest-answerable shape: groupings
    * only on the layout axes (ns/epoch) and aggregates only
    * non-distinct, unfiltered count(<literal>) — i.e. count(*). */
  private def countStarOverDvJournal(a: Aggregate): Boolean = {
    val dvRel = a.child match {
      case r: DataSourceV2Relation => r.table match {
        case t: JournalTable => t.hasLiveDv
        case _ => false
      }
      case _ => false
    }
    def okGroup(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      e match {
        case at: Attribute => Seq("ns", "epoch").contains(at.name.toLowerCase)
        case _ => false
      }
    dvRel && a.groupingExpressions.forall(okGroup) &&
      a.aggregateExpressions.forall {
        case at: Attribute => okGroup(at)
        case al: Alias => al.child match {
          case ae: AggregateExpression
              if !ae.isDistinct && ae.filter.isEmpty =>
            ae.aggregateFunction match {
              case c: Count => c.children.forall(_.foldable)
              case _ => false
            }
          case at: Attribute => okGroup(at)
          case _ => false
        }
        case _ => false
      }
  }
}

/** Batch CDC by TABLE NAME —
  * `spark.read.option("changeFeed", true).option("fromVersion", v)
  * .table("jcat.t")`, the Delta `readChangeFeed`-on-a-name idiom. The
  * catalog resolved the table BEFORE the read options were visible, so
  * the relation's schema is the plain row surface and no Scan built
  * from it could ever add `_change_type`; instead this RESOLUTION rule
  * (not post-hoc — the replacement widens the plan's output, and the
  * analyzer's fixpoint must re-resolve references above it, exactly
  * Delta's DeltaAnalysis CDC pattern) swaps the relation for the
  * store's NET-diff plan, the same [[graft.journal.JournalStore.changes]]
  * frame the path reader's ChangeFeedBatchScan serves.
  *
  * Installed by `spark.sql.extensions=graft.expr.GraftExtensions`. */
class JournalCdfReadRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case r: DataSourceV2Relation if r.table.isInstanceOf[JournalTable] &&
        !r.table.asInstanceOf[JournalTable].isChangeFeed &&
        Option(r.options.get("changeFeed")).exists(_.toBoolean) =>
      val t = r.table.asInstanceOf[JournalTable]
      val from = Option(r.options.get("fromVersion")).map(_.toLong)
        .getOrElse(throw new IllegalArgumentException(
          "changeFeed by table name reads a BATCH change window and " +
            "needs an explicit base: option(\"fromVersion\", <v>) emits " +
            "the NET diff (v, to]; a LIVE feed streams through the path " +
            "API (spark.readStream.format(\"journal\")" +
            ".option(\"changeFeed\", true).load(path))"))
      val st = graft.journal.JournalStore.open(spark, t.path)
      val to = Option(r.options.get("toVersion")).map(_.toLong)
        .getOrElse(st.manifest.version)
      st.changes(from, to).queryExecution.analyzed
  }
}
