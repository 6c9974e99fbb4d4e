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
               sums: Seq[String]): DataFrame =
    maintainFull(prior, changes, keys, sums).where(col("n") > 0)

  /** The fold WITHOUT the liveness filter — rows with n ≤ 0 are the
    * window's DEAD groups (MaterializedRollup turns them into
    * matched-DELETE rows; plain callers want them gone, hence the
    * public maintain() filters). */
  private[ops] def maintainFull(prior: DataFrame, changes: DataFrame,
                                keys: Seq[String],
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
    merged.select((keyCols :+ n) ++ sumCols: _*)
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

/** A rollup MAINTAINED AS A JOURNAL STORE — the full incremental-
  * materialized-view lifecycle on top of [[IncrementalAgg]]:
  *
  *   - one rollup group = one store row: `ns` is the JSON-encoded key
  *     tuple (collision-free, typed parse-back via the SOURCE schema),
  *     `payload` the JSON state (n + decimal sums), `val` mirrors n;
  *   - refresh() folds the source's NET change window since the last
  *     sync into the parsed prior state and lands the result with ONE
  *     `merge` commit — unchanged groups are dropped by merge's no-op
  *     suppression (payload-keyed), dead groups ride matched-DELETE
  *     rows, and the last-synced source version travels INSIDE the
  *     same merge as a marker row, so a crash between fold and commit
  *     can never double-apply a window (exactly-once by atomicity,
  *     not by ordering);
  *   - if the last-synced version fell out of the source's manifest
  *     retention, refresh() self-heals: it recomputes the snapshot
  *     and RECONCILES the rollup to it (same merge shape — upserts +
  *     deletes of groups that no longer exist), converging from any
  *     rollup state.
  *
  * Refresh cost: O(change window) on the source + O(rollup) on the
  * group-grain state — never a second source scan after bootstrap. */
object MaterializedRollup {

  /** Group rows are JSON objects (their ns starts with '{'); a
    * space-prefixed name cannot collide with them. */
  val Marker = " rollup.sourceVersion"

  private val Epoch0 = java.sql.Timestamp.valueOf("1970-01-01 00:00:00")

  private def stateStruct(sums: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType) +:
      sums.map(c => org.apache.spark.sql.types.StructField(c,
        org.apache.spark.sql.types.DecimalType(38, 4))))

  /** The rollup's CURRENT state parsed back to (keys…, n, sums…) —
    * the same shape [[IncrementalAgg.maintain]] chains on. Key types
    * come from the SOURCE schema so parsed keys join source-derived
    * frames natively. */
  def parsedState(dst: graft.journal.JournalStore, keys: Seq[String],
                  sums: Seq[String],
                  srcSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    val keyStruct = org.apache.spark.sql.types.StructType(
      keys.map(k => srcSchema(k)))
    if (dst.manifest.files.isEmpty)
      // a never-refreshed rollup: empty state in the canonical shape
      // (an empty store has no pinned schema to scan through)
      return org.apache.spark.sql.SparkSession.active
        .createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(keyStruct.fields.toSeq ++
            stateStruct(sums).fields))
    dst.latest().where(col("ns") =!= Marker)
      .select(from_json(col("ns"), keyStruct).as("__k"),
        from_json(col("payload"), stateStruct(sums)).as("__s"))
      .select((keys.map(k => col(s"__k.$k").as(k)) :+
        col("__s.n").as("n")) ++ sums.map(c => col(s"__s.$c").as(c)): _*)
  }

  /** Synchronize `dst` to `src`'s current version. Returns the number
    * of rows the merge appended (0 = already in sync / nothing
    * changed). */
  def refresh(src: graft.journal.JournalStore,
              dst: graft.journal.JournalStore,
              keys: Seq[String], sums: Seq[String]): Long = {
    val cur = src.manifest.version
    val srcSchema = src.scanUnordered().schema
    val last =
      if (dst.manifest.files.isEmpty) None
      else dst.latest().where(col("ns") === Marker)
        .select("payload").collect().headOption.map(_.getString(0).toLong)
    if (last.contains(cur)) return 0L
    val prior = parsedState(dst, keys, sums, srcSchema)
    val (newState, dead) = last match {
      case Some(v) if src.versions().contains(v) =>
        // incremental: the unfiltered fold carries dead groups as
        // n ≤ 0 rows directly (an anti-join against the fold would be
        // a self-referential join — the fold's plan contains `prior`)
        val full = IncrementalAgg.maintainFull(
          prior, src.changes(v, cur), keys, sums)
        (full.where(col("n") > 0),
          full.where(col("n") <= 0).select(keys.map(col): _*))
      case _ => // bootstrap, or the sync point left retention: reconcile
        val snap = IncrementalAgg.snapshot(src.scanUnordered(), keys, sums)
        val cond = keys.map(k => prior(k) <=> snap(k)).reduce(_ && _)
        (snap, prior.join(snap, cond, "left_anti")
          .select(keys.map(prior(_)): _*))
    }
    def nsOf(df: DataFrame) = to_json(struct(keys.map(df(_)): _*))
    val ups = newState.select(nsOf(newState).as("ns"), lit(0L).as("ukey"),
      lit(Epoch0).as("ts"),
      to_json(struct(col("n") +: sums.map(col): _*)).as("payload"),
      col("n").cast(DoubleType).as("val"))
    val dels = dead.select(nsOf(dead).as("ns"), lit(0L).as("ukey"),
      lit(Epoch0).as("ts"), lit("").as("payload"), lit(-1.0).as("val"))
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val markerRow = Seq((Marker, 0L, Epoch0, cur.toString, 0.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
    // ONE commit: upserts (no-op-suppressed when unchanged), deletes,
    // and the sync marker — atomic or not at all
    val before = dst.manifest.maxSeq
    val after = dst.merge(ups.unionByName(dels).unionByName(markerRow),
      whenMatchedDelete = Some(col("val") < 0))
    after - before
  }

  /** Read surface: (keys…, n, sums-as-double), ready for comparison
    * with a from-scratch aggregate. */
  def read(dst: graft.journal.JournalStore, keys: Seq[String],
           sums: Seq[String],
           srcSchema: org.apache.spark.sql.types.StructType): DataFrame =
    IncrementalAgg.present(parsedState(dst, keys, sums, srcSchema), sums)
}
