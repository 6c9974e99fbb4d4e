package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Native Catalyst expressions: value parity with the interpreted/UDF
  * forms, null handling, and codegen participation. */
class ExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine_sim matches the UDF fold bit-for-bit") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(0.3f, -0.7f, 0.2f), Seq(-0.1f, 0.9f, 0.5f)),
    ).toDF("a", "b")
    val both = df.select(
      expr("cosine_sim(a, b)").as("native"),
      graft.ops.LlmOps.cosineFF2(col("a"), col("b")).as("viaUdf"))
      .as[(Double, Double)].collect()
    both.foreach { case (n, u) => assert(n === u) }
  }

  test("cosine_sim null propagation") {
    GraftFunctions.register(spark)
    val df = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]])).toDF("a", "b")
    assert(df.select(expr("cosine_sim(a, b)")).collect().head.isNullAt(0))
  }

  test("cosine_sim runs inside whole-stage codegen (no ScalaUDF in plan)") {
    GraftFunctions.register(spark)
    val df = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(expr("cosine_sim(embedding, embedding)").as("c"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(plan.contains("*("), "expected codegen stage: " + plan)
  }

  test("char_ngrams generator emits exactly the n-grams") {
    GraftFunctions.register(spark)
    val out = Seq("abcd").toDF("t")
      .select(expr("char_ngrams(t, 3)")).as[String].collect().toSeq
    assert(out === Seq("abc", "bcd"))
    val short = Seq("ab").toDF("t").select(expr("char_ngrams(t, 3)")).count()
    assert(short === 0)
  }
}
