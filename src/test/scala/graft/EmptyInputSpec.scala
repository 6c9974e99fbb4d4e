package graft

import org.scalatest.funsuite.AnyFunSuite

/** Edge-case sweep (SURVEY §5.2.2 "empty input"): every declared query
  * must execute — not necessarily return rows — against zero-row tables
  * with the production schemas. Catches empty-aggregate folds,
  * sequence() on empty arrays, missing query vectors, etc. */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emptyDir: String = {
    val src = "/root/testdata/sf0.001"
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    TestSpark.fixtureDir(tables.map(t => t -> Tables(spark, src, t).limit(0)): _*)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes on empty inputs") {
      val n = fn(spark, emptyDir).collect().length
      assert(n >= 0)
    }
  }
}
