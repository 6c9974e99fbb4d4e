package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Determinism helpers implementing the oracle-parity contract
  * (SURVEY.md §2.0) between Spark 4.1 and DuckDB 1.0.
  *
  * Additive aggregates over DOUBLE are partition-order dependent, so every
  * sum/avg routes through exact DECIMAL arithmetic. The capture cast's
  * scale must be >= the true decimal precision of the input value (raw
  * money columns are 2dp; products of three 2dp factors are 6dp) so the
  * cast never rounds — both engines then recover the identical decimal
  * from the identical IEEE double, and the sum is exact and
  * order-independent.
  *
  * Note: /root/reference is empty (SURVEY.md §0); rows cite SURVEY §2
  * instead of reference file:line.
  */
object Det {
  /** Exact-capture decimal cast (never rounds when scale >= true dp). */
  def dec(c: Column, scale: Int = 4): Column = c.cast(DecimalType(27, scale))

  /** Order-independent exact sum. Accumulation is exact DECIMAL; the final
    * emitted column is DOUBLE because the driver's hash canonicalizes
    * decimal renderings (`947.0000`) and float renderings (`947.0`)
    * differently — identical decimals cast to identical doubles, and
    * double output is hash-safe on both engines (VERDICT r1 §wrong-1).
    * The cast is lossless for sums within 2^53 of significance. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(dec(c, scale)).cast(DoubleType)

  /** DuckDB-compatible double rounding. DuckDB's ROUND(x, s) computes
    * round(x * 10^s) / 10^s in DOUBLE arithmetic — the multiply can tip a
    * value across the .5 boundary (e.g. 0.90174999…e0 * 1e4 → the double
    * 9017.5 → 0.9018), while Spark's round() applies HALF_UP to the exact
    * binary value (→ 0.9017). Verified empirically over 200k randoms:
    * ROUND(x, s) ≡ ROUND(x * 10^s) / 10^s in DuckDB with zero mismatches,
    * and scale-0 round is half-away-from-zero in both engines. So every
    * emitted rounded double uses THIS two-step form on BOTH sides. */
  def r(c: Column, scale: Int = 4): Column = {
    val p = math.pow(10, scale)
    // + 0.0 normalizes IEEE -0.0 to +0.0 (exact for every other finite
    // value) — the two zeros render differently ("-0.0" vs "0.0") and
    // would hash-mismatch even though they compare numerically equal.
    round(c * lit(p)) / lit(p) + lit(0.0)
  }

  /** avg = exact decimal sum → double → / count → DuckDB-compatible
    * round(4). */
  def davg(c: Column, scale: Int = 4): Column =
    r(sum(dec(c, scale)).cast(DoubleType) / count(lit(1)), scale)

  /** DuckDB-side SQL fragments kept textually adjacent to their Spark
    * twins so the two sides evolve together. The p-value helpers below
    * are DIALECT-NEUTRAL on purpose (ABS/SQRT/EXP/CBRT/ROUND/CASE spell
    * identically in Spark SQL and DuckDB), so ONE string feeds both
    * `expr(...)` on the Spark side and the oracle SQL — the two engines
    * run the exact same arithmetic, and every libm-touched step (cbrt,
    * exp) is followed by a Det round that absorbs cross-libm ulps. */
  object sql {
    def dsum(e: String, scale: Int = 4): String =
      s"CAST(SUM(CAST($e AS DECIMAL(27,$scale))) AS DOUBLE)"
    /** DuckDB twin of Det.r — the two-step form, spelled out so both
      * engines share the exact double sequence. */
    def r(e: String, scale: Int = 4): String = {
      val p = s"${math.pow(10, scale).toLong}.0"
      s"(ROUND(($e) * $p) / $p + 0.0)"
    }
    def davg(e: String, scale: Int = 4): String =
      r(s"CAST(SUM(CAST($e AS DECIMAL(27,$scale))) AS DOUBLE) / COUNT(*)", scale)

    /** `0.5 * erfc(x)` for x >= 0 via the Abramowitz–Stegun 7.1.26
      * rational polynomial (|err| < 1.5e-7 — below the 6dp emit
      * rounding): erf(x) = 1 - poly(t)·exp(-x²), t = 1/(1+0.3275911·x).
      * Private building block; x must already be Det-pinned. */
    private def halfErfc(x: String): String = {
      val t = s"(1.0 / (1.0 + 0.3275911 * $x))"
      val poly = s"(((((1.061405429 * $t) - 1.453152027) * $t + " +
        s"1.421413741) * $t - 0.284496736) * $t + 0.254829592) * $t"
      s"(0.5 * ($poly) * EXP(-(($x) * ($x))))"
    }

    /** Two-sided standard-normal p-value for a z (or large-sample t)
      * statistic: 2·P(Z > |z|) = erfc(|z|/√2). The input is pinned to
      * 6dp (absorbing whatever chain produced it), the √2 scaling to
      * 8dp (sqrt is IEEE-exact, the divide is not re-rounded by both
      * engines identically otherwise), and the result to `scale`. */
    def normTwoSidedP(z: String, scale: Int = 6): String = {
      val zr = r(z, 6)
      val x = r(s"ABS($zr) / SQRT(2.0)", 8)
      r(s"2.0 * ${halfErfc(x)}", scale)
    }

    /** One-sided upper-tail P(Z > z) for a signed z: 0.5·erfc(z/√2),
      * with the negative-z branch via erfc(-y) = 2 - erfc(y). */
    def normUpperP(z: String, scale: Int = 6): String = {
      val zr = r(z, 6)
      val x = r(s"ABS($zr) / SQRT(2.0)", 8)
      val tail = halfErfc(x)
      r(s"CASE WHEN $zr >= 0.0 THEN $tail ELSE 1.0 - $tail END", scale)
    }

    /** Upper-tail chi-square p-value by the Wilson–Hilferty cube-root
      * normal transform (1931, public): with k dof,
      * z = ((x/k)^(1/3) - (1 - 2/(9k))) / sqrt(2/(9k)), p = P(Z > z).
      * Accurate to ~1e-3 for the moderate-k regime these rows serve —
      * a DECISION-complete column, not a reference implementation; the
      * statistic itself stays exact. cbrt's libm ulp is absorbed by
      * normUpperP's 6dp input pin. */
    def chi2UpperP(chi2: String, dofDouble: String, scale: Int = 6): String = {
      val k = s"($dofDouble)"
      val z = s"((CBRT(($chi2) / $k) - (1.0 - 2.0 / (9.0 * $k))) / " +
        s"SQRT(2.0 / (9.0 * $k)))"
      normUpperP(z, scale)
    }
  }
}
