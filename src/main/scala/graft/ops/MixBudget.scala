package graft.ops

/** Token-budget water-filling allocation, as ONE dialect-neutral SQL
  * text parameterized only by the table name and the portable-hash
  * spelling — Spark executes it via `spark.sql`, DuckDB executes the
  * same text as the oracle, so the two engines run the exact same
  * arithmetic (the Det shared-text discipline).
  *
  * Problem: keep a target fraction of the corpus' total size while
  * flattening source proportions toward weights w_s = sqrt(toks_s),
  * never asking a source for more tokens than it has (no upsampling).
  * Exact solution is water-filling: sort sources by toks_s/w_s
  * ascending; a prefix saturates (alloc = toks, the whole source fits
  * under the water level), the suffix is rationed alloc = θ·w_s with
  * ONE level θ = (B − Σ_sat toks) / Σ_unsat w, found in closed form by
  * the prefix scan below (sat0 tests each position against the level
  * implied by saturating everything before it; the running MIN makes
  * saturation prefix-monotone; θ is read at the first unsaturated row).
  *
  * Cross-engine determinism: weights are round(sqrt(toks)·1e6) BIGINTs
  * (sqrt is IEEE-correctly-rounded in both engines, and the fixed-point
  * round collapses any representation doubt); every running/total sum
  * is an INTEGER sum (exact, order-free); θ and the rates come from
  * single divisions of identical integers — bit-identical doubles on
  * both sides. The keep/drop projection then uses the engine's portable
  * md5 hash against rate·1e6, the sample_stratified idiom. */
object MixBudget {

  /** Budget as a fraction of the corpus' total tokens. */
  val BudgetFrac = "0.4"

  /** Temperature weights w = toks^Alpha; 0.5 is spelled SQRT below
    * because pow() is not correctly-rounded across libms but sqrt is. */
  val Alpha = 0.5

  def sql(tbl: String, hash: String): String =
    s"""WITH sz AS (
       |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS toks
       |  FROM $tbl GROUP BY source),
       |w AS (
       |  SELECT source, toks,
       |         CAST(ROUND(SQRT(CAST(toks AS DOUBLE)) * 1000000.0) AS BIGINT) AS wgt
       |  FROM sz),
       |r AS (
       |  SELECT source, toks, wgt,
       |         (CAST(toks AS DOUBLE) * 1000000.0) / CAST(wgt AS DOUBLE) AS ratio
       |  FROM w),
       |o AS (
       |  SELECT source, toks, wgt, ratio,
       |         COALESCE(SUM(toks) OVER (ORDER BY ratio, source
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ctoks,
       |         COALESCE(SUM(wgt) OVER (ORDER BY ratio, source
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cwgt,
       |         SUM(wgt) OVER () AS twgt,
       |         SUM(toks) OVER () AS ttoks,
       |         ROW_NUMBER() OVER (ORDER BY ratio, source) AS rn
       |  FROM r),
       |t AS (
       |  SELECT *, ($BudgetFrac * CAST(ttoks AS DOUBLE) - CAST(ctoks AS DOUBLE))
       |              * 1000000.0 / CAST(twgt - cwgt AS DOUBLE) AS th
       |  FROM o),
       |s2 AS (SELECT *, CASE WHEN ratio <= th THEN 1 ELSE 0 END AS sat0 FROM t),
       |s3 AS (SELECT *, MIN(sat0) OVER (ORDER BY rn) AS sat FROM s2),
       |s4 AS (SELECT *, MIN(CASE WHEN sat = 0 THEN rn END) OVER () AS fu FROM s3),
       |s5 AS (SELECT *, MAX(CASE WHEN rn = fu THEN th END) OVER () AS thf FROM s4),
       |k AS (
       |  SELECT source,
       |         CASE WHEN sat = 1 THEN 1.0
       |              ELSE thf * CAST(wgt AS DOUBLE) / 1000000.0
       |                   / CAST(toks AS DOUBLE) END AS rate
       |  FROM s5)
       |SELECT d.source, COUNT(*) AS n_kept,
       |       CAST(SUM(d.n_chars) AS BIGINT) AS chars_kept,
       |       (ROUND(k.rate * 1000000.0) / 1000000.0 + 0.0) AS rate
       |FROM $tbl d JOIN k ON d.source = k.source
       |WHERE CAST($hash % 1000000 AS DOUBLE) < k.rate * 1000000.0
       |GROUP BY d.source, k.rate
       |ORDER BY d.source""".stripMargin

  /** DuckDB spelling of the portable doc_id hash (Spark side uses
    * conv(); both produce the first 15 md5 hex chars as a BIGINT). */
  val duckHash: String =
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
}
