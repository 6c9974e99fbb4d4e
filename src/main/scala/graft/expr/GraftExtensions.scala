package graft.expr

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Registration for the native expressions and journal TVFs — two paths:
  *
  * 1. Cluster config (the 100 TB deployment shape):
  *    `spark.sql.extensions=graft.expr.GraftExtensions`
  * 2. Programmatic: `GraftFunctions.register(spark)` (idempotent; used by
  *    the declared queries so the driver's plain session works too).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.entries.foreach(ext.injectFunction)
    GraftFunctions.tableEntries.foreach(ext.injectTableFunction)
    // Batch CDC by table name (`option("changeFeed", true).table(...)`):
    // a RESOLUTION rule, because the rewrite widens the relation's
    // output with `_change_type` and the analyzer fixpoint must
    // re-resolve references above it (see JournalCdfReadRule)
    ext.injectResolutionRule(sp => new graft.sources.JournalCdfReadRule(sp))
    // SQL MERGE INTO / UPDATE on journal tables (the store's own merge:
    // touched-file pruning, no-op suppression, CAS re-derivation; see
    // JournalMerge.scala). Injected FIRST so the target relation is
    // consumed before the DV-read rewrite descends into the plan.
    ext.injectPostHocResolutionRule(sp => new graft.sources.JournalMergeRule(sp))
    // SQL DELETE on journal tables (physical erasure through the store;
    // see JournalDelete.scala for why the built-in path can't serve it)
    ext.injectPostHocResolutionRule(sp => new graft.sources.JournalDeleteRule(sp))
    // DV-aware fast batch reads: a journal table with live deletion
    // vectors is rewritten to DV subtraction ABOVE the columnar parquet
    // scan (codegen + pushdown preserved); must run AFTER the delete
    // rule so DELETE keeps its relation node (see JournalDvRead.scala)
    ext.injectPostHocResolutionRule(sp => new graft.sources.JournalDvReadRule(sp))
  }
}

object GraftFunctions {
  type FnEntry = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)
  type TvfEntry = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)

  val entries: Seq[FnEntry] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    (FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNGrams].getName, "char_ngrams"),
      (es: Seq[Expression]) => CharNGrams(es(0), es(1))),
    (FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimhashSig].getName, "simhash60"),
      (es: Seq[Expression]) => SimhashSig(es(0))),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      (es: Seq[Expression]) => MinhashSig(es(0))),
    (FunctionIdentifier("lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "lsh_buckets"),
      // tables/planes shape the per-row kernel, so they must be plan-time
      // literals — guard like the TVFs do instead of letting a non-
      // foldable argument die in an opaque NPE inside eval(null)
      (es: Seq[Expression]) => LshBuckets(es(0),
        foldedLong(es, 1, "lsh_buckets").toInt,
        foldedLong(es, 2, "lsh_buckets").toInt)),
    // Spark's own runtime-filter bloom aggregate, surfaced as a callable
    // function: the journal write path builds per-file key blooms with
    // it (manifest data-skipping beyond min/max ranges). Not registered
    // by stock Spark; the expression class itself is public and its
    // serialized form is the public sketch.BloomFilter layout, which the
    // driver-side prune reads back.
    // bounded top-k as a first-class aggregate: partial buffers are
    // O(k), the exchange carries ≤ k rows per (partition, group) — the
    // window-rank plan this replaces shuffles EVERY scored row
    (FunctionIdentifier("topk_by"),
      new ExpressionInfo(classOf[TopKBy].getName, "topk_by"),
      (es: Seq[Expression]) => TopKBy(es(0), es(1),
        foldedLong(es, 2, "topk_by").toInt)),
    (FunctionIdentifier("key_bloom_agg"),
      new ExpressionInfo(
        "org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate",
        "key_bloom_agg"),
      (es: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          es(0), es(1), es(2))),
  )

  /** SQL table-valued functions over the journal store — time travel from
    * plain SQL, e.g.
    * `SELECT * FROM journal_state_at('/path/to/store', 5000)` or
    * `SELECT * FROM journal_scan('/path/to/store')`. Arguments must be
    * foldable literals (resolved at plan time, driver-side). */
  val tableEntries: Seq[TvfEntry] = Seq(
    (FunctionIdentifier("journal_state_at"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "journal_state_at"),
      (es: Seq[Expression]) => {
        val path = foldedString(es, 0, "journal_state_at")
        val seq = foldedLong(es, 1, "journal_state_at")
        graft.journal.JournalStore.open(SparkSession.active, path)
          .stateAt(seq).queryExecution.logical
      }),
    (FunctionIdentifier("journal_scan"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "journal_scan"),
      (es: Seq[Expression]) => {
        val path = foldedString(es, 0, "journal_scan")
        graft.journal.JournalStore.open(SparkSession.active, path)
          .scan().queryExecution.logical
      }),
    (FunctionIdentifier("journal_state_at_ts"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "journal_state_at_ts"),
      (es: Seq[Expression]) => {
        // journal_state_at_ts('/path', '2024-01-15 00:00:00') — time
        // travel by wall clock from SQL (ISO 'T' or JDBC space form);
        // rides the per-file ts stats + certified-checkpoint shortcut
        val path = foldedString(es, 0, "journal_state_at_ts")
        val t = foldedString(es, 1, "journal_state_at_ts")
        graft.journal.JournalStore.open(SparkSession.active, path)
          .stateAtTs(java.sql.Timestamp.valueOf(t.replace('T', ' ')))
          .queryExecution.logical
      }),
    (FunctionIdentifier("journal_changes"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "journal_changes"),
      (es: Seq[Expression]) => {
        // journal_changes('/path', v1, v2) — CDC delta between two
        // retained manifest versions (rows with seq in (v1.max, v2.max]);
        // exact under compaction, per-file seq stats prune the scan
        val path = foldedString(es, 0, "journal_changes")
        val v1 = foldedLong(es, 1, "journal_changes")
        val v2 = foldedLong(es, 2, "journal_changes")
        graft.journal.JournalStore.open(SparkSession.active, path)
          .changesBetween(v1, v2).queryExecution.logical
      }),
    (FunctionIdentifier("journal_files"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "journal_files"),
      (es: Seq[Expression]) => {
        // journal_files('/path') — the live file inventory with its
        // data-skipping stats (rows, seq/key/ts ranges) as a table:
        // Delta's DESCRIBE DETAIL / files view, answered from the
        // manifest sidecar without opening a single data file
        val path = foldedString(es, 0, "journal_files")
        graft.journal.JournalStore.open(SparkSession.active, path)
          .fileStats().queryExecution.logical
      }),
    (FunctionIdentifier("journal_commits"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "journal_commits"),
      (es: Seq[Expression]) => {
        // journal_commits('/path') — DESCRIBE HISTORY for the journal:
        // one row per retained manifest version (version, high-water
        // seq, live file count, exact stats row count, checkpoints),
        // derived from the tiny version manifests, zero data files open
        val path = foldedString(es, 0, "journal_commits")
        graft.journal.JournalStore.open(SparkSession.active, path)
          .commitHistory().queryExecution.logical
      }),
    (FunctionIdentifier("journal_history"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "journal_history"),
      (es: Seq[Expression]) => {
        // journal_history('/path', ns [, ukey]) — per-ns (or per-key)
        // history from SQL; the key form rides the manifest key-stats
        // file pruning
        val path = foldedString(es, 0, "journal_history")
        val ns = foldedString(es, 1, "journal_history")
        val key = if (es.length > 2) Some(foldedLong(es, 2, "journal_history")) else None
        graft.journal.JournalStore.open(SparkSession.active, path)
          .history(ns, key).queryExecution.logical
      }),
  )

  private def foldedString(es: Seq[Expression], i: Int, fn: String): String = {
    require(es.length > i && es(i).foldable, s"$fn: argument $i must be a literal")
    val v = es(i).eval(null)
    require(v != null, s"$fn: argument $i must not be NULL")
    v.toString
  }
  private def foldedLong(es: Seq[Expression], i: Int, fn: String): Long = {
    require(es.length > i && es(i).foldable, s"$fn: argument $i must be a literal")
    val v = es(i).eval(null)
    require(v != null, s"$fn: argument $i must not be NULL")
    v.asInstanceOf[Number].longValue
  }

  def register(spark: SparkSession): Unit = {
    entries.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    tableEntries.foreach { case (id, info, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(id, info, builder)
    }
  }
}
