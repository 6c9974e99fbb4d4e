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
    * twins so the two sides evolve together. */
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
  }
}
