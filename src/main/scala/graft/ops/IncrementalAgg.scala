package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Incremental maintenance of ADDITIVE aggregates over a journal store,
  * driven by the NET change feed (`JournalStore.changes` /
  * `changeFeed=true` reads) — the "incremental materialized view via
  * CDF" idiom: refreshing a downstream rollup costs O(change window),
  * never O(store). At 100 TB, a nightly per-namespace revenue rollup
  * over a log that gained 0.1% new rows reads 0.1% of the data.
  *
  * Scope is deliberately the abelian-group aggregates — count and
  * decimal-exact sums — because those are the ones a NET diff can
  * maintain EXACTLY: an insert contributes +1/+x, a delete -1/-x, and
  * the fold is order-free (Det.dec decimal sums, no float drift, so
  * maintained state hash-matches a from-scratch recompute). min/max are
  * NOT maintainable from a diff (a deleted row may have carried the
  * extremum — recompute those groups from the store instead; avg/stddev
  * derive from (n, sum, sum²) which ARE additive: carry sum² as another
  * `sums` column if needed).
  *
  * State shape (the contract between [[snapshot]] and [[maintain]]):
  * the key columns, `n` (BIGINT row count), and one DECIMAL(27,4)
  * column per tracked sum, named after its source column. The same
  * frame flows through any number of maintain() windows; [[present]]
  * casts for emission.
  */
object IncrementalAgg {

  /** One fixed decimal type for the state's sum columns, so the state
    * schema is IDENTICAL after any number of maintain() windows (sum
    * and + both widen decimal precision; without the pin, window 1's
    * output type would differ from the snapshot's and window 2's). */
  private val StateDec = org.apache.spark.sql.types.DecimalType(38, 4)

  /** Bootstrap the aggregate state from the store's visible rows (one
    * full scan — paid once, at materialization time). */
  def snapshot(rows: DataFrame, keys: Seq[String],
               sums: Seq[String]): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sums.map(c => sum(graft.Det.dec(col(c))).cast(StateDec).as(c)): _*)

  /** Fold one NET change window into the prior state: inserts add,
    * deletes subtract, groups whose count reaches zero disappear
    * (exactly as a recompute would drop them). `changes` is the NET
    * diff surface — `_change_type` ∈ insert/delete over the canonical
    * row columns; NET semantics make the fold idempotent-by-window:
    * an append+delete of the same row inside the window never appears.
    * One shuffle at CHANGE-WINDOW grain + one at state grain; the
    * store itself is not touched. */
  def maintain(prior: DataFrame, changes: DataFrame, keys: Seq[String],
               sums: Seq[String]): DataFrame = {
    val sign = when(col("_change_type") === "insert", lit(1L))
      .otherwise(lit(-1L))
    val delta = changes
      .groupBy(keys.map(col): _*)
      .agg(sum(sign).as("__dn"),
        sums.map(c => sum(graft.Det.dec(col(c)) * sign).as("__d_" + c)): _*)
    // null-safe key equality: a null group key is still ONE group (the
    // plain `join(…, keys)` equality would fork it into two rows)
    val cond = keys.map(k => prior(k) <=> delta(k)).reduce(_ && _)
    val merged = prior.join(delta, cond, "full_outer")
    val keyCols = keys.map(k => coalesce(prior(k), delta(k)).as(k))
    val n = (coalesce(prior("n"), lit(0L)) +
      coalesce(delta("__dn"), lit(0L))).as("n")
    val zero = lit(0).cast(StateDec)
    val sumCols = sums.map { c =>
      (coalesce(prior(c), zero) + coalesce(delta("__d_" + c), zero))
        .cast(StateDec).as(c)
    }
    merged.select((keyCols :+ n) ++ sumCols: _*).where(col("n") > 0)
  }

  /** Emission surface: decimal sums → double (the Det.dsum geometry —
    * exact decimal fold first, ONE cast at the end). */
  def present(state: DataFrame, sums: Seq[String]): DataFrame = {
    val cols = state.columns.map { c =>
      if (sums.contains(c)) col(c).cast(DoubleType).as(c) else col(c)
    }
    state.select(cols.toIndexedSeq: _*)
  }
}
