package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Exact TIMESTAMP_NTZ → raw micros (SURVEY §2.2q): Spark stores a
  * TIMESTAMP_NTZ physically as a LONG of microseconds since
  * 1970-01-01T00:00 of the WALL time itself (no zone), so the exact
  * numeric form is an identity REINTERPRETATION of the internal value —
  * this expression is a type re-label with zero arithmetic, fully
  * codegen'd.
  *
  * Why it exists: the SQL route the journal's stats capture previously
  * took (`unix_micros(from_utc_timestamp(CAST(ntz AS TIMESTAMP),
  * zone))`) round-trips through the session zone, and the two offset
  * lookups disagree for wall times inside a DST gap — close enough for
  * planner-advisory histograms, but NOT for load-bearing file skipping,
  * which is why NTZ columns were excluded from cstats pruning. With the
  * capture exact, FilterEstimation's NTZ literals, the histogram bins
  * and the sidecar's minus/maxus all live in the same raw-micros
  * domain, and NTZ joins TIMESTAMP as a skipping-eligible type. */
case class NtzMicros(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == TimestampNTZType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ntz_micros expects TIMESTAMP_NTZ, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "ntz_micros"

  override protected def nullSafeEval(input: Any): Any = input

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): NtzMicros =
    copy(child = newChild)
}
