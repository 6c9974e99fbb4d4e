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

  test("journal TVFs: SQL time travel over a store") {
    GraftFunctions.register(spark)
    val path = java.nio.file.Files.createTempDirectory("graft_tvf_").toString + "/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 2)
    store.append(Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-01 00:00:01"), "v0", 0.0),
      ("users", 1L, graft.TestSpark.ts("2024-01-01 00:00:02"), "v1", 0.0),
      ("users", 2L, graft.TestSpark.ts("2024-01-01 00:00:03"), "v2", 0.0),
    ).toDF("ns", "ukey", "ts", "payload", "val"))
    val atSeq0 = spark.sql(s"SELECT payload FROM journal_state_at('$path', 0) ORDER BY ukey")
      .as[String].collect().toSeq
    assert(atSeq0 === Seq("v0"))
    val latest = spark.sql(
      s"SELECT ukey, payload FROM journal_state_at('$path', 2) ORDER BY ukey")
      .as[(Long, String)].collect().toSeq
    assert(latest === Seq((1L, "v1"), (2L, "v2")))
    assert(spark.sql(s"SELECT count(*) FROM journal_scan('$path')").head().getLong(0) === 3L)
    // per-key history from SQL (the 3-arg form rides key-stat pruning)
    val hist = spark.sql(
      s"SELECT seq, payload FROM journal_history('$path', 'users', 1) ORDER BY seq")
      .as[(Long, String)].collect().toSeq
    assert(hist === Seq((0L, "v0"), (1L, "v1")))
    assert(spark.sql(s"SELECT count(*) FROM journal_history('$path', 'users')")
      .head().getLong(0) === 3L)
    // time travel by wall clock (both timestamp forms), pruned via the
    // per-file ts stats underneath
    val atTs = spark.sql("SELECT ukey, payload FROM " +
      s"journal_state_at_ts('$path', '2024-01-01 00:00:02') ORDER BY ukey")
      .as[(Long, String)].collect().toSeq
    assert(atTs === Seq((1L, "v1")))
    assert(spark.sql("SELECT count(*) FROM " +
      s"journal_state_at_ts('$path', '2024-01-01T00:00:03')").head().getLong(0) === 2L)
    // DESCRIBE HISTORY from SQL: one row per retained commit, derived
    // from the tiny version manifests (create, append, and the
    // append's auto-checkpoint registration = 3 commits)
    val commits = spark.sql("SELECT version, max_seq, n_files, n_rows " +
      s"FROM journal_commits('$path') ORDER BY version")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(commits.map(_._1) === Seq(1L, 2L, 3L))
    assert(commits.last === ((3L, 2L, 2L, 3L)))
    // the operation column names what produced each commit
    assert(spark.sql(s"SELECT op FROM journal_commits('$path') ORDER BY version")
      .as[String].collect().toSeq === Seq("create", "append", "checkpoint"))
    // the live file inventory + skipping stats as a table, manifest-only
    val files = spark.sql("SELECT file, rows, minSeq, maxSeq " +
      s"FROM journal_files('$path') ORDER BY file")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(files.size === 2)
    assert(files.map(_._2).sum === 3L)
    assert(files.map(_._3).min === 0L && files.map(_._4).max === 2L)
  }

  test("char_ngrams generator emits exactly the n-grams") {
    GraftFunctions.register(spark)
    val out = Seq("abcd").toDF("t")
      .select(expr("char_ngrams(t, 3)")).as[String].collect().toSeq
    assert(out === Seq("abc", "bcd"))
    val short = Seq("ab").toDF("t").select(expr("char_ngrams(t, 3)")).count()
    assert(short === 0)
  }

  test("topk_by: bounded top-k aggregate — order, ties, small groups, " +
      "null skip, partial/final merge across many partitions") {
    GraftFunctions.register(spark)
    // group a: 100 rows over 32 partitions (forces real partial+merge);
    // ties at score 50.0 must break on the LOWER id
    val rows =
      (0 until 100).map(i => ("a", (i % 51).toDouble, i.toLong)) ++
      Seq(("b", 1.0, 7L), ("b", 2.0, 3L)) ++           // fewer than k
      Seq(("c", Double.NaN, 1L), ("c", 0.5, 2L)) ++    // NaN sorts last
      Seq(("d", 1.0, 1L))
    val df = rows.toDF("g", "s", "i").repartition(32)
    val got = df.groupBy("g").agg(expr("topk_by(s, i, 3)").as("top"))
      .select(col("g"), col("top"))
      .as[(String, Seq[(Double, Long)])].collect().toMap
    // a: scores 50 occurs at i=50; 49 at i=49,100? ids 0..99, i%51:
    // score 50 ← i=50; score 49 ← i=49 and i=100? (no, i<100) → i=49.
    // second 50s: none (i%51=50 only at i=50). 48 ← i=48,99
    assert(got("a") === Seq((50.0, 50L), (49.0, 49L), (48.0, 48L)))
    assert(got("b") === Seq((2.0, 3L), (1.0, 7L)))
    assert(got("c").head === ((0.5, 2L))) // NaN never beats a real score
    assert(got("d") === Seq((1.0, 1L)))
    // null scores/ids are skipped, not ranked
    val withNulls = Seq(("x", Some(5.0), Some(1L)), ("x", None, Some(2L)),
      ("x", Some(9.0), None)).toDF("g", "s", "i")
    val g2 = withNulls.groupBy("g").agg(expr("topk_by(s, i, 2)").as("top"))
      .select("top").as[Seq[(Double, Long)]].head()
    assert(g2 === Seq((5.0, 1L)))
    // tie-break across the k boundary: four ids at the same score, k=2
    // keeps the two LOWEST ids — deterministic under any partitioning
    val ties = Seq(("t", 1.0, 9L), ("t", 1.0, 2L), ("t", 1.0, 7L),
      ("t", 1.0, 4L)).toDF("g", "s", "i").repartition(4)
    val g3 = ties.groupBy("g").agg(expr("topk_by(s, i, 2)").as("top"))
      .select("top").as[Seq[(Double, Long)]].head()
    assert(g3 === Seq((1.0, 2L), (1.0, 4L)))
  }
}
