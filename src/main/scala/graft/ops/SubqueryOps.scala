package graft.ops

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Correlated / nested subqueries (SURVEY §2 round-8 delta).
  *
  * These deliberately enter through SQL text (`spark.sql`) rather than
  * the DataFrame API: the operator under test is Catalyst's subquery
  * DEcorrelation — `RewritePredicateSubquery` turns EXISTS / NOT IN into
  * semi / anti joins, `RewriteCorrelatedScalarSubquery` turns the
  * correlated aggregate into a grouped aggregate joined back on the
  * correlation key — so the physical plan is ordinary shuffles, never a
  * per-outer-row re-execution of the inner query. The SAME SQL text is
  * the DuckDB oracle (common dialect, engine-specific functions avoided),
  * so the two engines parse one string.
  *
  * Scale notes (100 TB):
  * - `sub_exists` decorrelates into one hash left-semi join on the
  *   correlation key — the same shuffle budget as `join_semi`; the inner
  *   filter (`o_totalprice > 400000`) prunes before the join.
  * - `sub_not_in` is the NULL-aware anti join (NAAJ): single-column
  *   NOT IN plans as a broadcast null-aware anti join when the inner
  *   side is small (here: negative-balance customers), so the orders
  *   probe side never shuffles. Three-valued-logic semantics (inner NULL
  *   ⇒ empty result) are pinned in SubquerySpec, not here — the fixture
  *   column is non-null.
  * - `sub_scalar_corr` decorrelates to an aggregate over orders grouped
  *   by o_custkey joined back to orders — the orders scan feeds both
  *   sides of one exchange. The per-group average routes through exact
  *   DECIMAL (Det policy, SURVEY §2.0.5): identical text on both
  *   engines, order-independent accumulation, so the `>` boundary cannot
  *   flip between engines or partitionings.
  */
object SubqueryOps {

  /** Register the fixture tables under their bare names so the shared
    * SQL text resolves identically in Spark (temp views) and DuckDB
    * (driver-registered tables). */
  private def views(s: SparkSession, d: String): Unit = {
    Tables(s, d, "customer").createOrReplaceTempView("customer")
    Tables(s, d, "orders").createOrReplaceTempView("orders")
  }

  private val subExistsSql: String =
    "SELECT c_custkey, c_name FROM customer c WHERE EXISTS (" +
      "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
      "AND o.o_totalprice > 400000) ORDER BY c_custkey"

  private val subNotInSql: String =
    "SELECT o_orderkey, o_custkey FROM orders WHERE o_custkey NOT IN (" +
      "SELECT c_custkey FROM customer WHERE c_acctbal < 0) " +
      "ORDER BY o_orderkey"

  // exact decimal avg spelled inline (Det.sql.davg rounds for emission;
  // here the avg feeds a predicate, so the unrounded exact form is right)
  private val subScalarSql: String =
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders o " +
      "WHERE o_totalprice > 1.9 * (" +
      "SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(27,4))) AS DOUBLE) / COUNT(*) " +
      "FROM orders o2 WHERE o2.o_custkey = o.o_custkey) " +
      "ORDER BY o_orderkey"

  // Lateral correlated subquery with ORDER BY + LIMIT — per-customer
  // top-2 orders. Catalyst decorrelates the lateral into a windowed
  // rank over ONE orders shuffle (no per-customer re-execution); ties
  // break on o_orderkey so the top-2 boundary is deterministic.
  private val subLateralSql: String =
    "SELECT c_custkey, l.o_orderkey, l.o_totalprice FROM customer c, " +
      "LATERAL (SELECT o_orderkey, o_totalprice FROM orders o " +
      "WHERE o.o_custkey = c.c_custkey " +
      "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l " +
      "ORDER BY c_custkey, o_totalprice DESC, o_orderkey"

  val queries: Map[String, Q] = Map(
    "sub_exists" -> ((s, d) => { views(s, d); s.sql(subExistsSql) }),
    "sub_not_in" -> ((s, d) => { views(s, d); s.sql(subNotInSql) }),
    "sub_scalar_corr" -> ((s, d) => { views(s, d); s.sql(subScalarSql) }),
    "sub_lateral" -> ((s, d) => { views(s, d); s.sql(subLateralSql) }),
  )

  val oracle: Map[String, String] = Map(
    "sub_exists" -> subExistsSql,
    "sub_not_in" -> subNotInSql,
    "sub_scalar_corr" -> subScalarSql,
    "sub_lateral" -> subLateralSql,
  )
}
