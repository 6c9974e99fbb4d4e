package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Generator (UDTF) expression emitting the character n-grams of a string
  * (SURVEY §4.3 — the native upgrade over explode(udf)). One output row
  * per gram; n is a foldable int argument. */
case class CharNGrams(child: Expression, nExpr: Expression)
  extends BinaryExpression with Generator with CodegenFallback {

  override def left: Expression = child
  override def right: Expression = nExpr
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType != StringType || !nExpr.foldable ||
        nExpr.dataType != IntegerType ||
        nExpr.eval(null).asInstanceOf[Int] < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "char_ngrams(str, n) expects (STRING, foldable INT >= 1)")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  private lazy val n: Int = nExpr.eval(null).asInstanceOf[Int]

  override def elementSchema: StructType =
    StructType(StructField("gram", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val s = v.asInstanceOf[UTF8String].toString
      if (s.length < n) Iterator.empty
      else (0 to s.length - n).iterator
        .map(i => InternalRow(UTF8String.fromString(s.substring(i, i + n))))
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharNGrams =
    copy(child = newLeft, nExpr = newRight)
}
