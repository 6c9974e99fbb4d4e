package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native multi-table random-hyperplane LSH bucketing (SURVEY §2.H ANN
  * surface, §4.3 custom-expression rule): all `tables` × `planes`
  * projections of a 64-dim float embedding in one tight per-row loop,
  * returning the per-table bucket ids as ARRAY<INT>.
  *
  * Semantics are EXACTLY the declarative formulation the DuckDB oracle
  * runs (pinned in LlmExtSpec): weight(t,j,d) = ((1103515245·flat +
  * 12345) mod 2^31) mod 2001 − 1000 with flat = (t·planes + j)·64 + d;
  * dot products accumulate float→double casts in ascending d (the same
  * left fold as `aggregate(sequence(0,63), …)`), bucket bit j set iff
  * the plane-j dot is > 0. A missing/short/null-holed embedding follows
  * the SQL null semantics: element_at out of range poisons every fold →
  * no plane fires → all buckets 0.
  *
  * Why native: Spark higher-order functions are interpreted (no
  * whole-stage codegen), so the 32 aggregate() folds per row dominated
  * sim_ann_lsh (2.4 s at sf0.1). The kernel is one static call from
  * generated code — primitive arithmetic, zero allocation per plane. */
case class LshBuckets(child: Expression, tables: Int, planes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_buckets expects ARRAY<FLOAT>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  // A NULL embedding follows the SAME poisoned-fold semantics as a short
  // or null-holed one (the SQL twin's CASE WHEN NULL > 0 … ELSE 0 chain
  // yields bucket 0 everywhere): all-zero buckets, never NULL. Default
  // UnaryExpression null propagation would instead return NULL and
  // silently drop the row from the ANN candidate stream in the native
  // path only — breaking the "exactly the declarative formulation"
  // contract on null inputs.
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) LshBuckets.zeroBuckets(tables)
    else LshBuckets.compute(v.asInstanceOf[ArrayData], tables, planes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    val block = code"""
      |${c.code}
      |$javaType ${ev.value} = ${c.isNull}
      |  ? (org.apache.spark.sql.catalyst.util.ArrayData) graft.expr.LshBuckets.zeroBuckets($tables)
      |  : (org.apache.spark.sql.catalyst.util.ArrayData) graft.expr.LshBuckets.compute(${c.value}, $tables, $planes);
      |""".stripMargin
    ev.copy(code = block, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {
  /** Poisoned result — one zero bucket per table (Java-callable). */
  def zeroBuckets(tables: Int): GenericArrayData =
    new GenericArrayData(new Array[Int](tables))

  /** Java-callable kernel (codegen emits a single static call). */
  def compute(emb: ArrayData, tables: Int, planes: Int): GenericArrayData = {
    val out = new Array[Int](tables)
    // SQL twin semantics: any null / out-of-range element poisons every
    // plane's fold (CASE WHEN NULL > 0 → ELSE 0) → all buckets stay 0
    var poisoned = emb.numElements() < 64
    var d = 0
    while (!poisoned && d < 64) {
      if (emb.isNullAt(d)) poisoned = true
      d += 1
    }
    if (!poisoned) {
      var t = 0
      while (t < tables) {
        var bucket = 0
        var j = 0
        while (j < planes) {
          val base = (t * planes + j) * 64
          var acc = 0.0
          var i = 0
          while (i < 64) {
            val w = ((1103515245L * (base + i) + 12345L) % 2147483648L % 2001L - 1000L).toDouble
            acc += emb.getFloat(i).toDouble * w
            i += 1
          }
          if (acc > 0) bucket |= 1 << j
          j += 1
        }
        out(t) = bucket
        t += 1
      }
    }
    new GenericArrayData(out)
  }
}
