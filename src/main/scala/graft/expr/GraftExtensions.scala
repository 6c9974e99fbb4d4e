package graft.expr

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration for the native expressions — two paths:
  *
  * 1. Cluster config (the 100 TB deployment shape):
  *    `spark.sql.extensions=graft.expr.GraftExtensions`
  * 2. Programmatic: `GraftFunctions.register(spark)` (idempotent; used by
  *    the declared queries so the driver's plain session works too).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.entries.foreach(ext.injectFunction)
}

object GraftFunctions {
  type FnEntry = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val entries: Seq[FnEntry] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    (FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNGrams].getName, "char_ngrams"),
      (es: Seq[Expression]) => CharNGrams(es(0), es(1))),
  )

  def register(spark: SparkSession): Unit =
    entries.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
