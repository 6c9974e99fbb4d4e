package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** SURVEY §2.B test-surface rows: CSV/JSON sources with explicit schema +
  * inference, and the file-source streaming read. */
class SourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("source_csv_json: schema'd and inferred reads agree") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src_").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/t.csv"),
      "id,name,score\n1,alpha,1.5\n2,beta,2.5\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/t.json"),
      """{"id":1,"name":"alpha","score":1.5}""" + "\n" +
        """{"id":2,"name":"beta","score":2.5}""" + "\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val csvS = spark.read.schema(schema).option("header", "true").csv(s"$dir/t.csv")
    val csvI = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/t.csv")
    val jsonS = spark.read.schema(schema).json(s"$dir/t.json")
    assert(csvS.as[(Long, String, Double)].collect().toSet ===
      Set((1L, "alpha", 1.5), (2L, "beta", 2.5)))
    assert(csvI.count() === 2 && csvI.schema("score").dataType === DoubleType)
    assert(jsonS.select("id", "name", "score").as[(Long, String, Double)]
      .collect().toSet === Set((1L, "alpha", 1.5), (2L, "beta", 2.5)))
  }

  test("orc and text sources roundtrip; csv/json sinks write readable output") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_").toString
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5)).toDF("id", "name", "score")
    df.write.mode("overwrite").orc(s"$dir/t_orc")
    assert(spark.read.orc(s"$dir/t_orc").as[(Long, String, Double)]
      .collect().toSet === Set((1L, "alpha", 1.5), (2L, "beta", 2.5)))
    df.select(concat_ws(",", $"id", $"name").as("value"))
      .write.mode("overwrite").text(s"$dir/t_txt")
    assert(spark.read.text(s"$dir/t_txt").as[String].collect().toSet ===
      Set("1,alpha", "2,beta"))
    df.write.mode("overwrite").option("header", "true").csv(s"$dir/t_csv_out")
    df.write.mode("overwrite").json(s"$dir/t_json_out")
    assert(spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/t_csv_out").count() === 2)
    assert(spark.read.json(s"$dir/t_json_out").count() === 2)
  }

  test("source_stream_files: file-source stream of events equals batch agg") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src_").toString
    val events = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    events.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema)
      .parquet(s"$dir/in")
    val agg = stream.groupBy("event_type").agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("filesrc")
      .outputMode("complete").start()
    q.processAllAvailable()
    val got = spark.table("filesrc").as[(String, Long)].collect().toMap
    val want = events.groupBy("event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got === want)
    q.stop()
  }

  test("journal format: scan, filters, asOfSeq and asOfTs reads") {
    import graft.journal.JournalStore
    import graft.TestSpark.ts
    val path = java.nio.file.Files.createTempDirectory("graft_jsrc_")
      .toString + "/store"
    val store = JournalStore.create(spark, path, epochSize = 2)
    store.append(Seq(
      ("users", 1L, ts("2024-01-01 00:00:01"), """{"v":1}""", 1.0),
      ("users", 2L, ts("2024-01-01 00:00:02"), """{"v":2}""", 2.0),
      ("users", 1L, ts("2024-01-01 00:00:03"), """{"v":3}""", 3.0),
      ("carts", 1L, ts("2024-01-01 00:00:04"), """{"c":1}""", 4.0),
    ).toDF("ns", "ukey", "ts", "payload", "val"))

    val scan = spark.read.format("journal").load(path)
    assert(scan.count() === 4)
    // seqs are assigned 0..3 in ts order; row filter + seq->epoch pruning
    assert(scan.where(col("seq") <= 1L).count() === 2)
    assert(scan.where(col("ns") === "carts").select("payload")
      .as[String].head() === """{"c":1}""")
    // column pruning path
    assert(scan.select("ukey").distinct().count() === 2)

    // asOfSeq=1 covers seqs 0,1 -> users/1 state is the seq-0 payload
    val state = spark.read.format("journal").option("asOfSeq", "1").load(path)
    assert(state.where(col("ns") === "users" && col("ukey") === 1L)
      .select("payload").as[String].head() === """{"v":1}""")
    val latest = spark.read.format("journal")
      .option("asOfTs", "2024-01-01 00:00:03").load(path)
    assert(latest.where(col("ns") === "users" && col("ukey") === 1L)
      .select("payload").as[String].head() === """{"v":3}""")
    assert(latest.where(col("ns") === "carts").count() === 0)
    // ns filters state mode too, and asOfTs accepts the ISO 'T' form
    val nsState = spark.read.format("journal")
      .option("asOfTs", "2024-01-01T00:00:04").option("ns", "carts").load(path)
    assert(nsState.select("ns").distinct().as[String].collect().toSeq === Seq("carts"))
    assert(nsState.count() === 1)
  }

  test("journal format: txnAppId/txnVersion make batch writes idempotent " +
      "per writer (Delta's idempotent-write options)") {
    import graft.TestSpark.ts
    val path = java.nio.file.Files.createTempDirectory("graft_jtxn_")
      .toString + "/store"
    def batch(k: Long) = Seq(
      ("users", k, ts("2024-01-01 00:00:01"), s"p$k", k.toDouble))
      .toDF("ns", "ukey", "ts", "payload", "val")
    def put(k: Long, app: String, ver: Long): Unit =
      batch(k).write.format("journal").mode("append")
        .option("txnAppId", app).option("txnVersion", ver.toString).save(path)
    batch(0L).write.format("journal").save(path)
    put(1L, "etl_a", 1)
    put(1L, "etl_a", 1) // orchestrator retry of a committed version: no-op
    put(2L, "etl_a", 2)
    put(3L, "etl_a", 1) // stale re-submission after ver 2: no-op, row 3 dropped
    // a DIFFERENT appId has its own high-water mark — ver 1 is fresh for it
    put(4L, "etl_b", 1)
    val got = spark.read.format("journal").load(path)
      .select("ukey").as[Long].collect().sorted.toSeq
    assert(got === Seq(0L, 1L, 2L, 4L))
    // option-pair validation: one without the other is a config error,
    // and a non-numeric version fails loudly (never a silent non-
    // idempotent write)
    def fails(f: => Unit): String =
      intercept[Exception](f).getMessage
    assert(fails(batch(9L).write.format("journal").mode("append")
      .option("txnAppId", "etl_a").save(path)).contains("txnVersion"))
    assert(fails(batch(9L).write.format("journal").mode("append")
      .option("txnVersion", "7").save(path)).contains("txnAppId"))
    assert(fails(batch(9L).write.format("journal").mode("append")
      .option("txnAppId", "etl_a").option("txnVersion", "seven").save(path))
      .toLowerCase.contains("number"))
    // nothing from the failed attempts leaked into the store
    assert(spark.read.format("journal").load(path).count() === 4)
  }

  test("journal format: schema evolution is visible through the DSv2 scan") {
    import graft.TestSpark.ts
    val path = java.nio.file.Files.createTempDirectory("graft_jevo_")
      .toString + "/store"
    Seq(("users", 1L, ts("2024-01-01 00:00:01"), "p0", 1.0),
        ("users", 2L, ts("2024-01-01 00:00:02"), "p1", 2.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .write.format("journal").option("epochSize", "10").save(path)
    Seq(("users", 3L, ts("2024-01-01 00:00:03"), "p2", 3.0, "T"))
      .toDF("ns", "ukey", "ts", "payload", "val", "tag")
      .write.format("journal").mode("append").save(path)
    val scan = spark.read.format("journal").load(path)
    // the evolved column resolves from the manifest-pinned schema; rows
    // from pre-evolution files read it as null — all through the
    // columnar V2 path
    assert(scan.columns.contains("tag"))
    val p = scan.queryExecution.executedPlan.toString
    assert(p.contains("BatchScan"), p)
    assert(scan.where(col("tag") === "T").count() === 1)
    assert(scan.where(col("tag").isNull).count() === 2)
    // the V1 fallback surface (ns option) exposes the SAME evolved
    // schema — a read must not lose columns by switching paths
    val v1 = spark.read.format("journal").option("ns", "users").load(path)
    assert(v1.columns.toSeq === scan.columns.toSeq)
    assert(v1.where(col("tag") === "T").count() === 1)
    // and the KEY-PRUNED V1 path (ns option + pushed ukey equality swaps
    // in scanUnorderedPruned) must keep the evolved surface too: a
    // narrower pruned projection would make the select of the evolved
    // column fail or silently change the scan's columns
    val pruned = v1.where(col("ukey") === 3L).select("ukey", "tag", "payload")
    assert(pruned.as[(Long, String, String)].collect().toSeq === Seq((3L, "T", "p2")))
    assert(v1.where(col("ukey") === 1L).select("tag").as[String]
      .collect().toSeq === Seq(null))
  }

  test("journal sink: write.format roundtrip; append-only save modes") {
    import graft.TestSpark.ts
    val path = java.nio.file.Files.createTempDirectory("graft_jsink_")
      .toString + "/store"
    val batch1 = Seq(
      ("users", 1L, ts("2024-01-01 00:00:01"), """{"v":1}""", 1.0),
      ("users", 2L, ts("2024-01-01 00:00:02"), """{"v":2}""", 2.0),
    ).toDF("ns", "ukey", "ts", "payload", "val")
    // default mode is ErrorIfExists; no store yet -> creates one
    batch1.write.format("journal").option("epochSize", "2").save(path)
    val back = spark.read.format("journal").load(path)
      .select("ns", "ukey", "ts", "payload", "val")
      .as[(String, Long, java.sql.Timestamp, String, Double)].collect().toSet
    assert(back === batch1.as[(String, Long, java.sql.Timestamp, String, Double)]
      .collect().toSet)
    // append accumulates into the SAME store (epochSize comes from its
    // manifest now, not the writer option)
    Seq(("carts", 1L, ts("2024-01-01 00:00:03"), """{"c":1}""", 3.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .write.format("journal").mode("append").save(path)
    assert(spark.read.format("journal").load(path).count() === 3)
    // append-only log: Overwrite refused, ErrorIfExists errors, Ignore no-ops
    intercept[UnsupportedOperationException] {
      batch1.write.format("journal").mode("overwrite").save(path)
    }
    intercept[IllegalArgumentException] {
      batch1.write.format("journal").mode("errorifexists").save(path)
    }
    batch1.write.format("journal").mode("ignore").save(path)
    assert(spark.read.format("journal").load(path).count() === 3)
  }

  test("change feed latestOffset advances the version axis even while " +
      "the seq axis is admission-throttled (no delete starvation, no " +
      "retention-kill under sustained ingest)") {
    import graft.journal.JournalStore
    val dir = java.nio.file.Files.createTempDirectory("graft_jcfo_").toString
    val path = s"$dir/store"
    val store = JournalStore.create(spark, path, epochSize = 100)
    store.append((0L to 9L).map(k =>
      ("users", k, graft.TestSpark.ts(f"2024-01-01 10:00:${k}%02d"),
        s"p$k", 1.0)).toDF("ns", "ukey", "ts", "payload", "val"))
    val v0 = store.manifest.version
    store.deleteWhereDv(col("ukey") === 0L) // version bumps past v0
    val v1 = store.manifest.version
    assert(v1 > v0)
    val stream = new JournalChangeFeedStream(spark, path,
      spark.read.format("journal").load(path).schema,
      maxSeqsPerTrigger = Some(2L))
    val next = JournalChangeOffset.of(stream.latestOffset(
      JournalChangeOffset(-1L, v0),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(2L)))
    // seq axis throttled to two rows — but the version axis must still
    // reach the head: freezing it until seq catch-up starves delete
    // delivery under sustained ingest and dies once retention rotates
    // past the frozen version
    assert(next.seq === 1L)
    assert(next.ver === v1)
  }
}
