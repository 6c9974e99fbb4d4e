package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.TestSpark.ts

/** SURVEY §2.I test-surface rows: streaming runs on MemoryStream with
  * processAllAvailable (never wall-clock sleeps — §7.3.5), asserting
  * final state equals the batch twin / hand expectations. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(id: Long, t: String, u: Long, k: String, v: Double) =
    Ev(id, ts(t), u, k, v, s"""{"k": $id}""")

  test("stream_tumbling_live: final windows equal the batch twin") {
    val ms = MemoryStream[Ev]
    val q = StreamingOps.tumbling(ms.toDF).writeStream
      .format("memory").queryName("tumb").outputMode("append").start()
    ms.addData(
      ev(0, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(1, "2024-01-01 10:30:00", 1, "click", 2.0),
      ev(2, "2024-01-01 11:15:00", 2, "view", 3.0))
    q.processAllAvailable()
    // two sentinel batches: advance the watermark, then emit finalized windows
    ms.addData(ev(8, "2024-01-02 00:00:00", 9, "zz", 0.0))
    q.processAllAvailable()
    ms.addData(ev(9, "2024-01-02 01:00:00", 9, "zz", 0.0))
    q.processAllAvailable()
    val got = spark.table("tumb").where($"event_type" =!= "zz")
      .select($"w_start", $"event_type", $"n", $"val_sum".cast("double"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(got === Set(
      (ts("2024-01-01 10:00:00"), "click", 2L, 3.0),
      (ts("2024-01-01 11:00:00"), "view", 1L, 3.0)))
    q.stop()
  }

  test("stream_sliding_live: sliding windows equal the batch twin expression") {
    val ms = MemoryStream[Ev]
    val sliding = ms.toDF.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
    val q = sliding.writeStream.format("memory").queryName("slide")
      .outputMode("append").start()
    ms.addData(ev(0, "2024-01-01 10:20:00", 1, "click", 1.0))
    q.processAllAvailable()
    ms.addData(ev(8, "2024-01-02 00:00:00", 9, "zz", 0.0))
    q.processAllAvailable()
    ms.addData(ev(9, "2024-01-02 01:00:00", 9, "zz", 0.0))
    q.processAllAvailable()
    val got = spark.table("slide").where($"event_type" === "click")
      .select("w_start").as[java.sql.Timestamp].collect().toSet
    // one event → exactly 4 sliding windows, starts at :30, :45, :00, :15
    assert(got === Set(ts("2024-01-01 09:30:00"), ts("2024-01-01 09:45:00"),
      ts("2024-01-01 10:00:00"), ts("2024-01-01 10:15:00")))
    q.stop()
  }

  test("stream_watermark_late: rows older than the watermark are dropped") {
    val ms = MemoryStream[Ev]
    val q = StreamingOps.tumbling(ms.toDF).writeStream
      .format("memory").queryName("late").outputMode("append").start()
    ms.addData(
      ev(0, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(1, "2024-01-01 10:10:00", 1, "click", 1.0),
      ev(2, "2024-01-01 11:30:00", 1, "click", 1.0)) // watermark → 11:20
    q.processAllAvailable()
    ms.addData(ev(3, "2024-01-01 10:15:00", 1, "click", 100.0)) // late: < 11:20
    q.processAllAvailable()
    ms.addData(ev(8, "2024-01-02 00:00:00", 9, "zz", 0.0))
    q.processAllAvailable()
    ms.addData(ev(9, "2024-01-02 01:00:00", 9, "zz", 0.0))
    q.processAllAvailable()
    val w10 = spark.table("late")
      .where($"w_start" === ts("2024-01-01 10:00:00")).select("n").as[Long].collect()
    assert(w10.toSeq === Seq(2L), "late row must not be counted")
    q.stop()
  }

  test("stream_dedup_state: duplicates within watermark dropped exactly once") {
    val ms = MemoryStream[Ev]
    val q = StreamingOps.dedupWithinWatermark(ms.toDF).writeStream
      .format("memory").queryName("dedup").outputMode("append").start()
    ms.addData(
      ev(0, "2024-01-01 10:00:00", 1, "click", 1.0),
      Ev(1, ts("2024-01-01 10:01:00"), 1, "click", 9.0, """{"k": 0}"""))
    q.processAllAvailable()
    // same (user, type, props) again in a later batch, still within watermark
    ms.addData(Ev(2, ts("2024-01-01 10:02:00"), 1, "click", 5.0, """{"k": 0}"""))
    q.processAllAvailable()
    // all three rows share (user=1, click, {"k": 0}) → exactly one survives
    val rows = spark.table("dedup")
    assert(rows.count() === 1)
    assert(rows.select("value").as[Double].head() === 1.0) // first arrival wins
    q.stop()
  }

  test("stream_dedup_minhash: signature-colliding docs dropped across micro-batches") {
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingOps.dedupMinhashStream(
        ms.toDF.toDF("doc_id", "text", "ts")).writeStream
      .format("memory").queryName("mhdedup").outputMode("append").start()
    ms.addData((0L, "spark makes big data small again", ts("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // identical shingle set in a later batch -> identical signature -> dropped;
    // a different doc survives
    ms.addData(
      (1L, "spark makes big data small again", ts("2024-01-01 10:01:00")),
      (2L, "totally different words entirely here", ts("2024-01-01 10:02:00")),
      // short docs (< 3 tokens) pass through on the exact-text fallback
      // signature: first survives, repeat is dropped
      (3L, "hi there", ts("2024-01-01 10:03:00")))
    q.processAllAvailable()
    ms.addData((4L, "hi there", ts("2024-01-01 10:04:00")))
    q.processAllAvailable()
    val got = spark.table("mhdedup").select("doc_id").as[Long].collect().toSet
    assert(got === Set(0L, 2L, 3L))
    q.stop()
  }

  test("stream_stateful_counter: running per-user counts via flatMapGroupsWithState") {
    val ms = MemoryStream[Ev]
    val q = StreamingOps.runningCounts(ms.toDS()).toDF("user_id", "n").writeStream
      .format("memory").queryName("counts").outputMode("update").start()
    ms.addData(ev(0, "2024-01-01 10:00:00", 1, "click", 1.0),
               ev(1, "2024-01-01 10:01:00", 1, "click", 1.0),
               ev(2, "2024-01-01 10:02:00", 2, "view", 1.0))
    q.processAllAvailable()
    ms.addData(ev(3, "2024-01-01 10:03:00", 1, "click", 1.0))
    q.processAllAvailable()
    val finalCounts = spark.table("counts").groupBy("user_id")
      .agg(max("n").as("n")).as[(Long, Long)].collect().toMap
    assert(finalCounts === Map(1L -> 3L, 2L -> 1L))
    q.stop()
  }

  test("stream_stateful_counter (transformWithState): same totals on RocksDB state") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Ev]
      val q = StreamingOps.runningCountsTws(ms.toDS()).toDF("user_id", "n").writeStream
        .format("memory").queryName("counts_tws").outputMode("update").start()
      ms.addData(ev(0, "2024-01-01 10:00:00", 1, "click", 1.0),
                 ev(1, "2024-01-01 10:01:00", 1, "click", 1.0),
                 ev(2, "2024-01-01 10:02:00", 2, "view", 1.0))
      q.processAllAvailable()
      ms.addData(ev(3, "2024-01-01 10:03:00", 1, "click", 1.0))
      q.processAllAvailable()
      val finalCounts = spark.table("counts_tws").groupBy("user_id")
        .agg(max("n").as("n")).as[(Long, Long)].collect().toMap
      assert(finalCounts === Map(1L -> 3L, 2L -> 1L))
      q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream_journal_ingest: foreachBatch append, state matches batch") {
    val path = java.nio.file.Files.createTempDirectory("graft_stream_store_").toString + "/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 2)
    val ms = MemoryStream[Ev]
    val q = ms.toDF.writeStream.foreachBatch { (df: DataFrame, _: Long) =>
      store.append(df.select(col("event_type").as("ns"), col("user_id").as("ukey"),
        col("ts"), col("props").as("payload"), col("value").as("val")))
      ()
    }.start()
    ms.addData(
      ev(0, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(1, "2024-01-01 10:01:00", 1, "click", 2.0),
      ev(2, "2024-01-01 10:02:00", 2, "view", 3.0))
    q.processAllAvailable()
    val st = store.latest().orderBy("ns", "ukey")
      .select("ns", "ukey", "payload").as[(String, Long, String)].collect().toSeq
    assert(st === Seq(("click", 1L, """{"k": 1}"""), ("view", 2L, """{"k": 2}""")))
    // the 3-row batch crossed the 2-seq epoch boundary, so streaming
    // ingest gets the auto-checkpoint for free — a long-running stream's
    // stateAt stays bounded with NO maintenance call anywhere
    assert(store.manifest.checkpoints.nonEmpty,
      s"append inside foreachBatch must auto-checkpoint: ${store.manifest}")
    q.stop()
  }

  test("stream_merge_sink: an upsert stream maintained via merge in " +
      "foreachBatch — no-op batches never grow the log") {
    val path = java.nio.file.Files.createTempDirectory("graft_merge_stream_")
      .toString + "/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 100)
    val ms = MemoryStream[Ev]
    // merge per micro-batch: value < 0 is the stream's delete marker
    val q = ms.toDF.writeStream.foreachBatch { (df: DataFrame, _: Long) =>
      store.merge(
        df.select(col("event_type").as("ns"), col("user_id").as("ukey"),
          col("ts"), col("props").as("payload"), col("value").as("val")),
        whenMatchedDelete = Some(col("val") < 0.0))
      ()
    }.start()
    ms.addData(
      ev(1, "2024-01-01 10:00:00", 1, "users", 1.0),
      ev(2, "2024-01-01 10:00:01", 2, "users", 1.0))
    q.processAllAvailable()
    assert(store.manifest.maxSeq === 1L) // two inserts
    ms.addData(
      ev(1, "2024-01-01 10:01:00", 1, "users", 1.0),  // same payload → no-op
      ev(9, "2024-01-01 10:01:01", 2, "users", -1.0)) // delete marker
    q.processAllAvailable()
    // only the tombstone landed; the unchanged upsert appended nothing
    assert(store.manifest.maxSeq === 2L)
    val st = store.latest().orderBy("ukey")
      .select("ukey", "payload").as[(Long, String)].collect().toSeq
    assert(st === Seq((1L, """{"k": 1}""")))
    q.stop()
  }

  test("stream_journal_sink: writeStream.format(journal) is exactly-once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsink_stream_").toString
    val path = s"$dir/store"
    val ms = MemoryStream[Ev]
    val q = ms.toDF
      .select(col("event_type").as("ns"), col("user_id").as("ukey"),
        col("ts"), col("props").as("payload"), col("value").as("val"))
      .writeStream.format("journal")
      .option("checkpointLocation", s"$dir/ckpt")
      .option("epochSize", "2")
      .start(path)
    ms.addData(
      ev(0, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(1, "2024-01-01 10:01:00", 1, "click", 2.0),
      ev(2, "2024-01-01 10:02:00", 2, "view", 3.0))
    q.processAllAvailable()
    ms.addData(ev(3, "2024-01-01 10:03:00", 3, "view", 4.0))
    q.processAllAvailable()
    q.stop()
    val store = graft.journal.JournalStore.open(spark, path)
    assert(store.scan().count() === 4)
    // the batch id high-water mark rode the manifest swap and PERSISTED
    // (a fresh open sees it — survives a driver restart). The sink keys
    // its mark by its checkpoint location, so a SECOND sink sharing the
    // store could never collide with this one's batch-id space.
    val sinkId = s"$dir/ckpt"
    assert(store.manifest.writerMarks.get(sinkId) === Some(1L))
    val st = store.latest().orderBy("ns", "ukey")
      .select("ns", "ukey", "payload").as[(String, Long, String)].collect().toSeq
    assert(st === Seq(("click", 1L, """{"k": 1}"""),
      ("view", 2L, """{"k": 2}"""), ("view", 3L, """{"k": 3}""")))

    // crash-recovery replay: re-delivering an already-committed batch id
    // must be a no-op (this is what Spark does with the last batch after
    // a checkpointed restart) — while a NEW id appends normally
    val replay = Seq(("view", 9L, ts("2024-01-01 10:09:00"), "{}", 9.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
    val maxBefore = store.manifest.maxSeq
    assert(store.append(replay, Some(1L), sinkId) === maxBefore)
    assert(store.scan().count() === 4, "replayed batch must not duplicate rows")
    assert(store.append(replay, Some(2L), sinkId) === maxBefore + 1)
    assert(store.scan().count() === 5)
    assert(store.manifest.writerMarks.get(sinkId) === Some(2L))
  }

  test("stream_journal_sink materializes DEFAULT and IDENTITY columns " +
      "(the shared append path) with identity unique across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsink_cspec_").toString
    val path = s"$dir/store"
    val store = graft.journal.JournalStore.create(spark, path, 100L,
      Some(org.apache.spark.sql.types.StructType.fromDDL(
        "ns STRING, ukey BIGINT, ts TIMESTAMP, payload STRING, " +
          "val DOUBLE, tier STRING, rid BIGINT")))
    store.setMeta(Map("default.tier" -> "'bronze'",
      "identity.rid" -> "100,2,false,0"))
    val ms = MemoryStream[Ev]
    val q = ms.toDF
      .select(col("event_type").as("ns"), col("user_id").as("ukey"),
        col("ts"), col("props").as("payload"), col("value").as("val"))
      .writeStream.format("journal")
      .option("checkpointLocation", s"$dir/ckpt")
      .start(path)
    ms.addData(
      ev(0, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(1, "2024-01-01 10:01:00", 2, "click", 2.0))
    q.processAllAvailable()
    ms.addData(ev(2, "2024-01-01 10:02:00", 3, "view", 3.0))
    q.processAllAvailable()
    q.stop()
    // both columns materialized batch by batch; identity values never
    // collide because the counter rides each batch's manifest commit
    val rows = graft.journal.JournalStore.open(spark, path).scanUnordered()
      .orderBy("seq").select("ukey", "tier", "rid")
      .as[(Long, String, Long)].collect().toSeq
    assert(rows.map(_._2).forall(_ == "bronze"), rows.toString)
    assert(rows.map(_._3) === Seq(100L, 102L, 104L), rows.toString)
  }

  test("stream_journal_sink: auto-compaction keeps per-dir files bounded over 20 micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsink_ac_").toString
    val path = s"$dir/store"
    val ms = MemoryStream[Ev]
    val q = ms.toDF
      .select(col("event_type").as("ns"), col("user_id").as("ukey"),
        col("ts"), col("props").as("payload"), col("value").as("val"))
      .writeStream.format("journal")
      .option("checkpointLocation", s"$dir/ckpt")
      .option("epochSize", "1000") // all 20 batches land in epoch 0
      .option("autoCompactFiles", "3")
      .start(path)
    (0 until 20).foreach { i =>
      ms.addData(ev(i.toLong, f"2024-01-01 10:00:${i}%02d", (i % 3).toLong, "click", i.toDouble))
      q.processAllAvailable()
    }
    q.stop()
    val store = graft.journal.JournalStore.open(spark, path)
    // one file per micro-batch would be 20 in epoch=0/ns=click without
    // the policy; the manifest's live view must stay within threshold
    val perDir = store.manifest.files.groupBy(_.split('/').init.mkString("/"))
    assert(perDir.nonEmpty)
    perDir.foreach { case (d, fs) =>
      assert(fs.size <= 3, s"$d has ${fs.size} live files") }
    // and every row is present exactly once, state intact
    assert(store.scan().count() === 20)
    assert(store.latest().count() === 3)
    assert(store.latest().where($"ukey" === 1L).select("payload")
      .as[String].head() === """{"k": 19}""")
  }

  test("stream_interval_join: clicks attribute to in-window impressions, state bounded") {
    val imps = MemoryStream[Ev]
    val clks = MemoryStream[Ev]
    val q = StreamingOps.attributeClicks(imps.toDF, clks.toDF)
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    imps.addData(
      ev(10, "2024-01-01 10:00:00", 1, "imp", 0.0),
      ev(11, "2024-01-01 10:02:00", 1, "imp", 0.0),
      ev(12, "2024-01-01 10:00:00", 2, "imp", 0.0))
    clks.addData(
      ev(20, "2024-01-01 10:04:00", 1, "click", 0.0),  // joins imps 10 & 11
      ev(21, "2024-01-01 10:06:00", 2, "click", 0.0),  // imp is 6 min old
      ev(22, "2024-01-01 10:03:00", 3, "click", 0.0))  // user never saw one
    q.processAllAvailable()
    // advance both watermarks so results finalize
    imps.addData(ev(18, "2024-01-01 12:00:00", 9, "imp", 0.0))
    clks.addData(ev(28, "2024-01-01 12:00:00", 9, "click", 0.0))
    q.processAllAvailable()
    imps.addData(ev(19, "2024-01-01 13:00:00", 9, "imp", 0.0))
    clks.addData(ev(29, "2024-01-01 13:00:00", 9, "click", 0.0))
    q.processAllAvailable()
    val got = spark.table("attr").where($"user_id" <= 3)
      .select($"c_id", $"i_ts").as[(Long, java.sql.Timestamp)].collect().toSet
    // click 20 matches both of user 1's impressions inside its 5-minute
    // lookback; click 21's only impression is 6 minutes old; click 22's
    // user never saw one — inner interval join drops both
    assert(got === Set(
      (20L, ts("2024-01-01 10:00:00")),
      (20L, ts("2024-01-01 10:02:00"))))
    // the batch twin over the same rows agrees (same declarative join)
    val impB = Seq(ev(10, "2024-01-01 10:00:00", 1, "imp", 0.0),
      ev(11, "2024-01-01 10:02:00", 1, "imp", 0.0),
      ev(12, "2024-01-01 10:00:00", 2, "imp", 0.0)).toDF
    val clkB = Seq(ev(20, "2024-01-01 10:04:00", 1, "click", 0.0),
      ev(21, "2024-01-01 10:06:00", 2, "click", 0.0),
      ev(22, "2024-01-01 10:03:00", 3, "click", 0.0)).toDF
    val batch = StreamingOps.attributeClicks(impB, clkB)
      .select($"c_id", $"i_ts").as[(Long, java.sql.Timestamp)].collect().toSet
    assert(batch === got)
    q.stop()
  }

  test("stream_journal_source: readStream tails the log by seq offset") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsrc_").toString
    val path = s"$dir/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 2)
    def row(ns: String, k: Long, t: String, p: String) =
      Seq((ns, k, ts(t), p, 1.0)).toDF("ns", "ukey", "ts", "payload", "val")
    store.append(row("click", 1L, "2024-01-01 10:00:00", "p0")
      .union(row("click", 2L, "2024-01-01 10:01:00", "p1")))
    val q = spark.readStream.format("journal").load(path)
      .writeStream.format("memory").queryName("jtail").outputMode("append")
      .start()
    q.processAllAvailable()
    def got = spark.table("jtail").select("seq", "payload")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(got === Seq((0L, "p0"), (1L, "p1")))
    // records appended while the stream runs arrive as the next batch —
    // the seq high-water mark is the offset, (lastSeq, maxSeq] the batch
    store.append(row("view", 3L, "2024-01-01 10:02:00", "p2"))
    q.processAllAvailable()
    assert(got === Seq((0L, "p0"), (1L, "p1"), (2L, "p2")))
    q.stop()
  }

  test("stream_cdc_merge: tailing a journal emits exactly merge's " +
      "reconciliation delta — suppressed no-ops never reach the stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jcdc_").toString
    val path = s"$dir/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 100)
    store.append(Seq(
      ("users", 1L, ts("2024-01-01 10:00:00"), "pa", 1.0),
      ("users", 2L, ts("2024-01-01 10:00:01"), "pb", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val"))
    val q = spark.readStream.format("journal").option("startingSeq", "latest")
      .load(path)
      .writeStream.format("memory").queryName("jcdc").outputMode("append")
      .start()
    q.processAllAvailable()
    store.merge(Seq(
      ("users", 1L, ts("2024-01-01 11:00:00"), "pa", 9.0),   // no-op
      ("users", 2L, ts("2024-01-01 11:00:01"), "pb2", 1.0),  // update
      ("users", 3L, ts("2024-01-01 11:00:02"), "pc", 1.0),   // insert
      ("users", 4L, ts("2024-01-01 11:00:03"), "x", -1.0))   // insert too
      .toDF("ns", "ukey", "ts", "payload", "val"),
      whenMatchedDelete = Some(col("val") < 0.0))
    q.processAllAvailable()
    // delta = update + 2 inserts; the unchanged upsert emitted NOTHING
    val got = spark.table("jcdc").select("ukey", "payload")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(got === Seq((2L, "pb2"), (3L, "pc"), (4L, "x")))
    q.stop()
  }

  test("stream_change_feed: inserts and retractions arrive with net " +
      "per-batch semantics; applying the feed reproduces live state") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jcf_").toString
    val path = s"$dir/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 100)
    def rows(ks: Long*) = ks.map(k =>
      ("users", k, ts(f"2024-01-01 10:00:${k}%02d"), s"p$k", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
    store.append(rows(1L, 2L, 3L))
    val q = spark.readStream.format("journal")
      .option("changeFeed", "true").load(path)
      .writeStream.format("memory").queryName("jcf").outputMode("append")
      .start()
    q.processAllAvailable()
    def got = spark.table("jcf").select("_change_type", "ukey")
      .as[(String, Long)].collect().toSeq
    assert(got.sorted === Seq(("insert", 1L), ("insert", 2L), ("insert", 3L)))
    // a vector landing on a DELIVERED row emits a retraction
    store.deleteWhereDv(col("ukey") === 2L)
    q.processAllAvailable()
    assert(got.sorted === Seq(("delete", 2L),
      ("insert", 1L), ("insert", 2L), ("insert", 3L)))
    // append + delete in quick succession: if both land inside one
    // window the events NET OUT (nothing for key 4); if a free-running
    // trigger slips a batch between them, a matched insert+delete pair
    // arrives — either way the fold below sees key 4 as dead
    store.append(rows(4L, 5L))
    store.deleteWhereDv(col("ukey") === 4L)
    q.processAllAvailable()
    val k4 = got.filter(_._2 == 4L).map(_._1).sorted
    assert(k4.isEmpty || k4 === Seq("delete", "insert"))
    assert(got.count(_ == ("insert", 5L)) === 1)
    // CDC-consumer contract: folding the feed reproduces live state
    val folded = spark.table("jcf")
      .groupBy("ukey")
      .agg(sum(when(col("_change_type") === "insert", 1)
        .otherwise(-1)).as("alive"))
      .where(col("alive") > 0)
      .select("ukey").as[Long].collect().toSeq.sorted
    val live = store.scan().select("ukey").as[Long].collect().toSeq.sorted
    assert(folded === live)
    q.stop()
    // batch reads through a changeFeed table are refused (batch CDC is
    // JournalStore.changes)
    val ex = intercept[Exception](
      spark.read.format("journal").option("changeFeed", "true")
        .load(path).collect())
    assert(ex.getMessage.toLowerCase.contains("batch"))
  }

  test("batch change window through the reader (fromVersion/toVersion): " +
      "net diff matches changes(); option hygiene refuses bad combos") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jcfb_").toString
    val path = s"$dir/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 100)
    def rows(ks: Long*) = ks.map(k =>
      ("users", k, ts(f"2024-01-01 10:00:${k}%02d"), s"p$k", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
    store.append(rows(1L, 2L, 3L))
    val v1 = store.manifest.version
    store.deleteWhereDv(col("ukey") === 2L)
    store.append(rows(4L, 5L))
    val v2 = store.manifest.version
    def read(opts: (String, String)*) = {
      val r0 = spark.read.format("journal").option("changeFeed", "true")
      opts.foldLeft(r0) { case (a, (k, v)) => a.option(k, v) }.load(path)
    }
    val win = read("fromVersion" -> v1.toString, "toVersion" -> v2.toString)
    // schema = _change_type + the CANONICAL surface (no epoch: the diff
    // is a row-surface object, not a storage listing)
    assert(win.columns.toSeq ===
      Seq("_change_type", "seq", "ns", "ukey", "ts", "payload", "val"))
    assert(win.select("_change_type", "ukey").as[(String, Long)]
      .collect().toSeq.sorted ===
      Seq(("delete", 2L), ("insert", 4L), ("insert", 5L)))
    // agrees with the Scala API row-for-row
    assert(win.select("_change_type", "seq", "ns", "ukey", "payload")
      .collect().toSet ===
      store.changes(v1, v2)
        .select("_change_type", "seq", "ns", "ukey", "payload")
        .collect().toSet)
    // toVersion defaults to the CURRENT manifest
    assert(read("fromVersion" -> v1.toString)
      .select("_change_type", "ukey").as[(String, Long)]
      .collect().toSeq.sorted ===
      Seq(("delete", 2L), ("insert", 4L), ("insert", 5L)))
    // identity window: empty
    assert(read("fromVersion" -> v2.toString).isEmpty)
    // hygiene: fromVersion without the feed; toVersion alone; a
    // version-pinned window streamed; snapshot mode combined
    def msg(f: => Any): String = intercept[Exception](f).getMessage
    assert(msg(spark.read.format("journal")
      .option("fromVersion", v1.toString).load(path).collect())
      .contains("changeFeed"))
    assert(msg(read("toVersion" -> v2.toString).collect())
      .contains("fromVersion"))
    val sex = intercept[Exception] {
      val q = spark.readStream.format("journal")
        .option("changeFeed", "true").option("fromVersion", v1.toString)
        .load(path).writeStream.format("noop").start()
      try q.awaitTermination(5000) finally q.stop()
    }
    assert((Option(sex.getMessage) ++ Option(sex.getCause)
      .flatMap(c => Option(c.getMessage))).mkString(" ")
      .toLowerCase.contains("batch"), sex)
    assert(msg(read("fromVersion" -> v1.toString,
      "startMode" -> "snapshot").collect()).contains("startMode"))
  }

  test("stream_change_feed: a delete PURGED away inside one window " +
      "still retracts (step-walked manifests); a rewrite-delete window " +
      "fails with the precise restart error, never a silent skip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jcfm_").toString
    val path = s"$dir/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 100)
    store.append(Seq(
      ("users", 1L, ts("2024-01-01 10:00:00"), "pa", 1.0),
      ("users", 2L, ts("2024-01-01 10:00:01"), "pb", 1.0),
      ("users", 3L, ts("2024-01-01 10:00:02"), "pc", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val"))
    // memory sinks cannot recover from a checkpoint, so the restartable
    // one-shot runs land in parquet (same shape as the DV-stream test)
    val ckpt = s"$dir/ckpt"; val out = s"$dir/out"
    def runOnce(): Unit = {
      val q = spark.readStream.format("journal")
        .option("changeFeed", "true").load(path)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      q.awaitTermination()
    }
    runOnce() // delivers the three inserts
    // delete then PURGE before the next trigger: the endpoint diff sees
    // no new dv part (the purge consolidated it away), but the
    // step-walked window still finds the vector — the retraction lands
    store.deleteWhereDv(col("ukey") === 1L)
    assert(store.purgeDeletes(0.01) === 1)
    runOnce()
    val got = spark.read.parquet(out).select("_change_type", "ukey")
      .as[(String, Long)].collect().toSeq
    assert(got.count(_ == ("delete", 1L)) === 1)
    // a deleteWhere REWRITE loses rows without vectors: precise refusal
    store.deleteWhere(col("ukey") === 2L)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("cannot be derived"))))
  }

  test("stream_change_feed: a vector landing on a COMPACTION-BORN file " +
      "still retracts — candidate files come from the parts, not the " +
      "start manifest's file list") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jcfc_").toString
    val path = s"$dir/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 100)
    store.append(Seq(
      ("users", 1L, ts("2024-01-01 10:00:00"), "pa", 1.0),
      ("users", 2L, ts("2024-01-01 10:00:01"), "pb", 1.0),
      ("users", 3L, ts("2024-01-01 10:00:02"), "pc", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val"))
    val ckpt = s"$dir/ckpt"; val out = s"$dir/out"
    def runOnce(): Unit = {
      val q = spark.readStream.format("journal")
        .option("changeFeed", "true").load(path)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      q.awaitTermination()
    }
    runOnce() // the three inserts deliver
    // compact rewrites the delivered rows into a NEW file, then a
    // vector names that file: the retraction must still flow (the old
    // start-manifest file filter silently dropped it)
    store.compact(upToEpoch = 0L)
    store.deleteWhereDv(col("ukey") === 2L)
    runOnce()
    val got = spark.read.parquet(out).select("_change_type", "ukey")
      .as[(String, Long)].collect().toSeq
    assert(got.count(_ == ("delete", 2L)) === 1)
    // CDC contract: folding the feed equals live state
    val folded = got.groupBy(_._2).collect {
      case (k, evs) if evs.count(_._1 == "insert") > evs.count(_._1 == "delete") => k
    }.toSeq.sorted
    assert(folded === Seq(1L, 3L))
  }

  test("stream_change_feed: a delete-dv that kills a file OUTRIGHT " +
      "still retracts its rows, and the part fold it triggers never " +
      "re-emits pre-window deletions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jcfk_").toString
    val path = s"$dir/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 100)
    def batch(ks: Long*) = ks.map(k =>
      ("users", k, ts(f"2024-01-01 10:00:${k}%02d"), s"p$k", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
    store.append(batch(1L, 2L)) // file A
    store.append(batch(3L, 4L)) // file B
    val ckpt = s"$dir/ckpt"; val out = s"$dir/out"
    def runOnce(): Unit = {
      val q = spark.readStream.format("journal")
        .option("changeFeed", "true").load(path)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      q.awaitTermination()
    }
    runOnce() // 4 inserts
    store.deleteWhereDv(col("ukey") === 1L)
    runOnce() // retraction of 1 delivers; its vector is now pre-window
    // kill file B outright: both its rows die under one predicate — the
    // commit drops B from the manifest AND strips its vector entries,
    // folding file A's surviving entry into a fresh part name
    store.deleteWhereDv(col("ukey") === 3L || col("ukey") === 4L)
    runOnce()
    val got = spark.read.parquet(out).select("_change_type", "ukey")
      .as[(String, Long)].collect().toSeq
    // key 1's retraction arrived exactly once — the fold's fresh part
    // name must not re-emit it
    assert(got.count(_ == ("delete", 1L)) === 1)
    // the vanished file's rows retract even though no position list
    // survives to name them
    assert(got.count(_ == ("delete", 3L)) === 1)
    assert(got.count(_ == ("delete", 4L)) === 1)
    val folded = got.groupBy(_._2).collect {
      case (k, evs) if evs.count(_._1 == "insert") > evs.count(_._1 == "delete") => k
    }.toSeq.sorted
    assert(folded === Seq(2L))
    assert(store.scan().select("ukey").as[Long].collect().toSeq.sorted === Seq(2L))
  }

  test("stream_change_feed: startMode=snapshot re-bootstraps a feed " +
      "killed by a deleteWhere rewrite — first batch emits live state " +
      "as inserts at a pinned offset, then the tail resumes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jcfsnap_").toString
    val path = s"$dir/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 100)
    def batch(ks: Long*) = ks.map(k =>
      ("users", k, ts(f"2024-01-01 10:00:${k}%02d"), s"p$k", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
    store.append(batch(1L, 2L, 3L))
    def runOnce(ckpt: String, out: String,
                opts: Map[String, String] = Map.empty): Unit = {
      val r0 = spark.readStream.format("journal")
        .option("changeFeed", "true")
      val r = opts.foldLeft(r0) { case (acc, (k, v)) => acc.option(k, v) }
      val q = r.load(path)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      q.awaitTermination()
    }
    val ckpt1 = s"$dir/ckpt1"; val out1 = s"$dir/out1"
    runOnce(ckpt1, out1) // three inserts deliver
    store.deleteWhereDv(col("ukey") === 2L)
    runOnce(ckpt1, out1) // retraction of 2 delivers
    // a deleteWhere REWRITE loses rows without vectors → the feed dies
    // with the precise refusal
    store.deleteWhere(col("ukey") === 3L)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce(ckpt1, out1)
    }
    // RECOVERY (the refusal's own instruction): discard the downstream
    // copy, restart on a FRESH checkpoint in snapshot mode — the first
    // batch is the store's live state as inserts
    val ckpt2 = s"$dir/ckpt2"; val out2 = s"$dir/out2"
    runOnce(ckpt2, out2, Map("startMode" -> "snapshot"))
    def got2 = spark.read.parquet(out2).select("_change_type", "ukey")
      .as[(String, Long)].collect().toSeq
    assert(got2.sorted === Seq(("insert", 1L))) // 2 dv-dead, 3 rewritten away
    // the tail resumes from the pinned offset: an append and a vector
    // delete flow as ordinary events on the SAME checkpoint (startMode
    // only governs a fresh start — a checkpointed restart ignores it,
    // the Kafka startingOffsets rule)
    store.append(batch(6L))
    store.deleteWhereDv(col("ukey") === 1L)
    runOnce(ckpt2, out2, Map("startMode" -> "snapshot"))
    val folded = got2.groupBy(_._2).collect {
      case (k, evs) if evs.count(_._1 == "insert") > evs.count(_._1 == "delete") => k
    }.toSeq.sorted
    assert(folded === store.scan().select("ukey").as[Long].collect().toSeq.sorted)
    assert(folded === Seq(6L))
    // option hygiene: snapshot+startingSeq contradict; startMode needs
    // the change feed; unknown modes refuse
    def startErr(opts: Map[String, String], feed: Boolean = true): String = {
      val r0 = spark.readStream.format("journal")
      val r1 = if (feed) r0.option("changeFeed", "true") else r0
      val ex = intercept[Exception] {
        val q = opts.foldLeft(r1) { case (acc, (k, v)) => acc.option(k, v) }
          .load(path)
          .writeStream.format("noop").start()
        try q.awaitTermination(2000) finally q.stop()
      }
      (Option(ex.getMessage) ++ Option(ex.getCause).flatMap(c =>
        Option(c.getMessage))).mkString(" ")
    }
    assert(startErr(Map("startMode" -> "snapshot", "startingSeq" -> "1"))
      .contains("startingSeq"))
    assert(startErr(Map("startMode" -> "snapshot"), feed = false)
      .contains("change-feed"))
    assert(startErr(Map("startMode" -> "rewind")).contains("startMode"))
  }

  test("Trigger.AvailableNow drains the journal in rate-limited " +
      "batches, stops, and a later run resumes from the checkpoint") {
    val dir = java.nio.file.Files.createTempDirectory("graft_janow_").toString
    val path = s"$dir/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 100)
    def batch(ks: Range) = ks.map(k =>
      ("users", k.toLong, ts(f"2024-01-01 10:00:${k % 60}%02d"), s"p$k", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
    store.append(batch(0 until 10))
    def drain(): Unit = {
      val q = spark.readStream.format("journal")
        .option("maxSeqsPerTrigger", "3").load(path)
        .writeStream.format("parquet").option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // AvailableNow must TERMINATE on its own once the pinned end is
      // reached — a hang here is the bug
      assert(q.awaitTermination(120000), "AvailableNow did not stop")
    }
    drain()
    def got() = spark.read.parquet(s"$dir/out")
      .select("ukey").as[Long].collect().sorted.toSeq
    assert(got() === (0L until 10L))
    // rate limit respected: 10 seqs at 3/trigger = 4 committed batches
    val batches = new java.io.File(s"$dir/ckpt/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 4, s"expected >= 4 rate-limited batches, got $batches")
    // a later run picks up ONLY what landed since, from the checkpoint
    store.append(batch(10 until 12))
    drain()
    assert(got() === (0L until 12L))
  }

  test("Trigger.AvailableNow on the change feed: drains inserts AND " +
      "retractions to the pinned offsets, stops, resumes incrementally") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jcfan_").toString
    val path = s"$dir/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 100)
    def batch(ks: Range) = ks.map(k =>
      ("users", k.toLong, ts(f"2024-01-01 10:00:${k % 60}%02d"), s"p$k", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
    store.append(batch(0 until 6))
    store.deleteWhereDv(col("ukey") === 2L)
    def drain(): Unit = {
      val q = spark.readStream.format("journal")
        .option("changeFeed", "true").load(path)
        .writeStream.format("parquet").option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow did not stop")
    }
    drain()
    def fold(): Seq[Long] = spark.read.parquet(s"$dir/out")
      .groupBy("ukey").agg(sum(when(col("_change_type") === "insert", 1)
        .otherwise(-1)).as("alive"))
      .where(col("alive") > 0).select("ukey").as[Long].collect().sorted.toSeq
    assert(fold() === Seq(0L, 1L, 3L, 4L, 5L))
    // mutate, drain again: the second run delivers exactly the delta
    store.append(batch(6 until 8))
    store.deleteWhereDv(col("ukey") === 0L)
    drain()
    assert(fold() === store.scan().select("ukey")
      .as[Long].collect().sorted.toSeq)
    assert(fold() === Seq(1L, 3L, 4L, 5L, 6L, 7L))
  }

  test("stream_incr_rollup: a snapshot-mode change feed maintains the " +
      "IncrementalAgg rollup exactly across appends and vector deletes") {
    // the round-trip the batch journal_incr_agg row proves offline, now
    // LIVE: snapshot bootstrap folds current state from zero, then every
    // micro-batch's inserts/retractions fold incrementally — the rollup
    // never rescans the store, and after arbitrary mutations it must
    // hash-equal a from-scratch recompute
    val dir = java.nio.file.Files.createTempDirectory("graft_jroll_").toString
    val path = s"$dir/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 100)
    def batch(rows: (String, Long, Double)*) = rows.map { case (ns, k, v) =>
      (ns, k, ts(f"2024-01-01 10:00:${k % 60}%02d"), s"p$k", v)
    }.toDF("ns", "ukey", "ts", "payload", "val")
    store.append(batch(("a", 1L, 1.5), ("a", 2L, 2.5), ("b", 3L, 10.0)))
    val stateSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ns",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("val",
        org.apache.spark.sql.types.DecimalType(38, 4))))
    @volatile var state: Array[org.apache.spark.sql.Row] = Array.empty
    def prior = spark.createDataFrame(
      java.util.Arrays.asList(state: _*), stateSchema)
    val q = spark.readStream.format("journal")
      .option("changeFeed", "true").option("startMode", "snapshot")
      .load(path)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        state = graft.ops.IncrementalAgg
          .maintain(prior, df, Seq("ns"), Seq("val")).collect()
      }
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.processAllAvailable()
    store.append(batch(("b", 4L, 0.25), ("c", 5L, 7.0)))
    q.processAllAvailable()
    store.deleteWhereDv(col("ns") === "a") // retract the whole a group
    store.append(batch(("c", 6L, 3.0)))
    q.processAllAvailable()
    q.stop()
    def snap(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toPlainString))
      .sortBy(_._1).toSeq
    val maintained = snap(prior)
    val recompute = snap(graft.ops.IncrementalAgg.snapshot(
      store.scanUnordered(), Seq("ns"), Seq("val")))
    assert(maintained === recompute)
    assert(maintained.map(t => (t._1, t._2)) === Seq(("b", 2L), ("c", 2L)))
  }

  test("stream over a deletion-vector store subtracts the visible " +
      "vectors; offsets stay seq-stable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jdvstream_").toString
    val path = s"$dir/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 100)
    store.append(Seq(
      ("users", 1L, ts("2024-01-01 10:00:00"), "pa", 1.0),
      ("users", 2L, ts("2024-01-01 10:00:01"), "pb", 1.0),
      ("users", 3L, ts("2024-01-01 10:00:02"), "pc", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val"))
    store.deleteWhereDv(col("ukey") === 1L)
    // one-shot triggers + a shared checkpoint make each step's batch
    // boundary deterministic (a free-running trigger could deliver an
    // append before the test's vector lands — legitimate under the
    // no-retraction contract, but untestable)
    val ckpt = s"$dir/ckpt"; val out = s"$dir/out"
    def runOnce(): Unit = {
      val q = spark.readStream.format("journal").load(path)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      q.awaitTermination()
    }
    def keys = spark.read.parquet(out)
      .select("ukey").as[Long].collect().toSeq.sorted
    runOnce()
    // the vector-deleted row is subtracted; the offset still covers its
    // seq (vectors delete rows, never seqs)
    assert(keys === Seq(2L, 3L))
    // a vector landing MID-stream applies from the first batch that
    // plans over it (rows already delivered are not retracted — the
    // Delta streaming-over-deletes contract)
    store.append(Seq(
      ("users", 4L, ts("2024-01-01 10:00:03"), "pd", 1.0),
      ("users", 5L, ts("2024-01-01 10:00:04"), "pe", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val"))
    store.deleteWhereDv(col("ukey") === 4L)
    runOnce() // resumes from the checkpointed offset — only seq 4 lands
    assert(keys === Seq(2L, 3L, 5L))
    // physical purge changes nothing a NEW stream can observe
    store.compact(upToEpoch = 100L, clusterByKey = true)
    val q3 = spark.readStream.format("journal").load(path)
      .writeStream.format("memory").queryName("jdvs3").outputMode("append")
      .start()
    q3.processAllAvailable()
    assert(spark.table("jdvs3").select("ukey").as[Long].collect().toSeq.sorted
      === Seq(2L, 3L, 5L))
    q3.stop()
  }

  test("stream_journal_source: startingSeq skips history on a fresh query") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jseek_").toString
    val path = s"$dir/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 2)
    def row(ns: String, k: Long, t: String, p: String) =
      Seq((ns, k, ts(t), p, 1.0)).toDF("ns", "ukey", "ts", "payload", "val")
    store.append(row("click", 1L, "2024-01-01 10:00:00", "p0")
      .union(row("click", 2L, "2024-01-01 10:01:00", "p1"))
      .union(row("click", 3L, "2024-01-01 10:02:00", "p2")))
    // numeric form: first delivered seq is startingSeq
    val q1 = spark.readStream.format("journal").option("startingSeq", "2")
      .load(path)
      .writeStream.format("memory").queryName("jseek1").outputMode("append")
      .start()
    q1.processAllAvailable()
    assert(spark.table("jseek1").select("seq").as[Long].collect().toSeq
      === Seq(2L), "startingSeq=2 must deliver only seq 2")
    q1.stop()
    // latest: history is skipped entirely; commits after start arrive
    val q2 = spark.readStream.format("journal").option("startingSeq", "latest")
      .load(path)
      .writeStream.format("memory").queryName("jseek2").outputMode("append")
      .start()
    q2.processAllAvailable()
    assert(spark.table("jseek2").count() === 0L, "latest must skip history")
    store.append(row("view", 4L, "2024-01-01 10:03:00", "p3"))
    q2.processAllAvailable()
    assert(spark.table("jseek2").select("seq", "payload")
      .as[(Long, String)].collect().toSeq === Seq((3L, "p3")))
    q2.stop()
  }

  test("stream_dedup_durable: duplicate arriving AFTER a checkpointed restart is suppressed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dddur_").toString
    val src = s"$dir/src"; val idx = s"$dir/sigidx"; val out = s"$dir/out"
    val store = graft.journal.JournalStore.create(spark, src, epochSize = 100)
    def doc(id: Long, text: String, t: String) =
      Seq(("doc", id, ts(t), text, 0.0)).toDF("ns", "ukey", "ts", "payload", "val")
    // emit = journal-sink append carrying the batch id (batch-id
    // idempotent, as durableDedupBatch's contract requires)
    val emit: (DataFrame, Long) => Unit = (fresh, bid) => {
      val s = fresh.sparkSession
      val sunk = fresh.select(lit("d").as("ns"), col("doc_id").as("ukey"),
        col("ts"), col("text").as("payload"), lit(0.0).as("val"))
      val o = if (graft.journal.JournalStore.exists(out))
        graft.journal.JournalStore.open(s, out)
      else graft.journal.JournalStore.create(s, out, 1000L)
      o.append(sunk, Some(bid))
      ()
    }
    def start() = spark.readStream.format("journal").load(src)
      .select(col("ukey").as("doc_id"), col("payload").as("text"), col("ts"))
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(StreamingOps.durableDedupBatch(idx, emit))
      .start()
    store.append(doc(0, "spark makes big data small again", "2024-01-01 10:00:00"))
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // the duplicate arrives a DAY later, into a fresh query incarnation
    // restarted from the checkpoint — far past any watermark horizon, and
    // the first query's in-memory state is long gone. Only the journal
    // index can still know the signature.
    store.append(
      doc(1, "spark makes big data small again", "2024-01-02 10:00:00")
        .union(doc(2, "totally different words entirely here", "2024-01-02 10:01:00")))
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val got = graft.journal.JournalStore.open(spark, out).scan()
      .select("ukey").as[Long].collect().toSet
    assert(got === Set(0L, 2L), s"duplicate doc 1 must be suppressed: $got")
    // in-batch first-arrival dedup also holds: replaying the same text
    // twice in ONE batch emits one row
    store.append(
      doc(5, "brand new sentence for the third batch", "2024-01-03 10:00:00")
        .union(doc(6, "brand new sentence for the third batch", "2024-01-03 10:00:01")))
    val q3 = start(); q3.processAllAvailable(); q3.stop()
    val got3 = graft.journal.JournalStore.open(spark, out).scan()
      .select("ukey").as[Long].collect().toSet
    assert(got3 === Set(0L, 2L, 5L), s"$got3")
  }

  test("stream_journal_source: checkpointed restart resumes from the stored offset") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsrc_ckpt_").toString
    val path = s"$dir/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 2)
    def row(k: Long, t: String, p: String) =
      Seq(("ns", k, ts(t), p, 1.0)).toDF("ns", "ukey", "ts", "payload", "val")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    def start() = spark.readStream.format("journal").load(path)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        df.select("seq", "payload").collect()
          .foreach(r => seen.synchronized {
            seen += ((batchId, r.getLong(0), r.getString(1))) })
        ()
      }.start()
    store.append(row(1L, "2024-01-01 10:00:00", "p0"))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert(seen.map(x => (x._2, x._3)).sorted.toSeq === Seq((0L, "p0")))
    // offline appends, then restart from the checkpoint: ONLY the tail is
    // delivered — the committed offset log + immutable segments give
    // exactly-once without any dedup pass
    store.append(row(2L, "2024-01-01 10:01:00", "p1"))
    store.append(row(3L, "2024-01-01 10:02:00", "p2"))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(seen.map(x => (x._2, x._3)).sorted.toSeq ===
      Seq((0L, "p0"), (1L, "p1"), (2L, "p2")))
  }

  test("stream_journal_source: maxSeqsPerTrigger drains a backlog in bounded batches") {
    // Without the cap the first micro-batch after an outage is the whole
    // backlog; with it, each trigger advances the offset by at most N
    // seqs and the backlog drains across several bounded batches —
    // exactly-once throughout (no gap, no redelivery, restart included).
    val dir = java.nio.file.Files.createTempDirectory("graft_jsrc_cap_").toString
    val path = s"$dir/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 2)
    def rows(ks: Range) = ks.map(k =>
      ("ns", k.toLong, ts(f"2024-01-01 10:00:$k%02d"), s"p$k", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
    store.append(rows(0 until 10)) // 10-seq backlog before the stream exists
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    def start() = spark.readStream.format("journal")
      .option("maxSeqsPerTrigger", "3").load(path)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: DataFrame, _: Long) =>
        val seqs = df.select("seq").as[Long].collect().toSeq.sorted
        if (seqs.nonEmpty) batches.synchronized { batches += seqs }
        ()
      }.start()
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    assert(batches.size >= 4, s"10 seqs at cap 3 need >=4 batches: $batches")
    assert(batches.forall(_.size <= 3), s"a batch exceeded the cap: $batches")
    assert(batches.flatten.sorted.toSeq === (0L until 10L), s"$batches")
    // checkpointed restart over new data: cap still bounds each batch and
    // nothing below the committed offset is redelivered
    batches.clear()
    store.append(rows(10 until 17)) // seqs 10..16
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(batches.forall(_.size <= 3), s"$batches")
    assert(batches.flatten.sorted.toSeq === (10L until 17L), s"$batches")
  }

  test("stream_journal_source: tail survives compaction+vacuum of the source") {
    // Compaction rewrites segment files and vacuum deletes the originals
    // while the tail is live — offsets are SEQ-based and every read goes
    // through the manifest snapshot, so the stream neither loses nor
    // duplicates records across the rewrite.
    val dir = java.nio.file.Files.createTempDirectory("graft_jsrc_cmp_").toString
    val path = s"$dir/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 1)
    def row(k: Long, t: String, p: String) =
      Seq(("ns", k, ts(t), p, 1.0)).toDF("ns", "ukey", "ts", "payload", "val")
    store.append(row(1L, "2024-01-01 10:00:00", "p0")
      .union(row(2L, "2024-01-01 10:01:00", "p1"))
      .union(row(3L, "2024-01-01 10:02:00", "p2")))
    val q = spark.readStream.format("journal").load(path)
      .writeStream.format("memory").queryName("jcmp").outputMode("append")
      .start()
    q.processAllAvailable()
    store.compact(Long.MaxValue, clusterByKey = true)
    store.vacuum(retain = 0, graceMs = 0L)
    store.append(row(4L, "2024-01-01 10:03:00", "p3"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("jcmp").select("seq", "payload")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(got === Seq((0L, "p0"), (1L, "p1"), (2L, "p2"), (3L, "p3")))
  }

  test("stream_journal_source: tail survives a mid-run ALTER TABLE ADD " +
    "COLUMNS (output schema pinned at stream start; new column ignored)") {
    // A stream's output schema is fixed when the query starts; a column
    // added to the store mid-run must neither break the tail nor change
    // its frame — post-alter rows keep flowing with the ORIGINAL columns
    // (a consumer wanting the new column restarts the query, the Delta
    // rule).
    val dir = java.nio.file.Files.createTempDirectory("graft_jsrc_alt_").toString
    val path = s"$dir/store"
    val store = graft.journal.JournalStore.create(spark, path, epochSize = 100)
    def row(k: Long, t: String, p: String) =
      Seq(("ns", k, ts(t), p, 1.0)).toDF("ns", "ukey", "ts", "payload", "val")
    store.append(row(1L, "2024-01-01 10:00:00", "p0"))
    val q = spark.readStream.format("journal").load(path)
      .writeStream.format("memory").queryName("jalt").outputMode("append")
      .start()
    q.processAllAvailable()
    store.addColumn("score", org.apache.spark.sql.types.DoubleType)
    // a post-alter append CARRYING the new column still streams
    store.append(Seq(("ns", 2L, ts("2024-01-01 10:01:00"), "p1", 1.0, 0.5))
      .toDF("ns", "ukey", "ts", "payload", "val", "score"))
    q.processAllAvailable()
    q.stop()
    val t = spark.table("jalt")
    assert(!t.columns.contains("score"), t.columns.mkString(","))
    assert(t.select("seq", "payload").as[(Long, String)].collect().toSeq
      .sortBy(_._1) === Seq((0L, "p0"), (1L, "p1")))
    // a FRESH query sees the widened schema (null-filled history)
    val q2 = spark.readStream.format("journal").load(path)
      .writeStream.format("memory").queryName("jalt2").outputMode("append")
      .start()
    q2.processAllAvailable(); q2.stop()
    val t2 = spark.table("jalt2")
    assert(t2.columns.contains("score"), t2.columns.mkString(","))
    assert(t2.select("seq", "score").as[(Long, Option[Double])].collect()
      .toSeq.sortBy(_._1) === Seq((0L, None), (1L, Some(0.5))))
  }

  test("stream_journal_pipeline: log -> windowless agg -> log, exactly-once both ends") {
    // The materialized-view-over-log shape: tail one journal, maintain a
    // running per-(ns, ukey) count, land every revision in a SECOND
    // journal through the exactly-once sink. The destination's latest()
    // is the view; its history is the view's full change log — marasa
    // semantics end to end with no glue code.
    val dir = java.nio.file.Files.createTempDirectory("graft_jpipe_").toString
    val src = s"$dir/src"
    val dst = s"$dir/dst"
    val store = graft.journal.JournalStore.create(spark, src, epochSize = 2)
    def row(ns: String, k: Long, t: String) =
      Seq((ns, k, ts(t), "p", 1.0)).toDF("ns", "ukey", "ts", "payload", "val")
    store.append(row("click", 1L, "2024-01-01 10:00:00")
      .union(row("click", 1L, "2024-01-01 10:01:00"))
      .union(row("view", 2L, "2024-01-01 10:02:00")))
    val q = spark.readStream.format("journal").load(src)
      .groupBy("ns", "ukey")
      .agg(count(lit(1)).as("n"), max("ts").as("mts"))
      .select(col("ns"), col("ukey"), col("mts").as("ts"),
              concat(lit("n="), col("n")).as("payload"),
              col("n").cast("double").as("val"))
      .writeStream.format("journal").outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .option("epochSize", "2")
      .start(dst)
    q.processAllAvailable()
    store.append(row("click", 1L, "2024-01-01 10:03:00"))
    q.processAllAvailable()
    q.stop()
    val out = graft.journal.JournalStore.open(spark, dst)
    // the view's final state equals the batch aggregate over the source
    val st = out.latest().orderBy("ns", "ukey")
      .select("ns", "ukey", "payload").as[(String, Long, String)].collect().toSeq
    assert(st === Seq(("click", 1L, "n=3"), ("view", 2L, "n=1")))
    // and the destination's history holds the view's change log: the
    // click counter was revised (n=2 in batch 0, n=3 in batch 1)
    val hist = out.history("click", Some(1L))
      .select("payload").as[String].collect().toSeq
    assert(hist === Seq("n=2", "n=3"))
  }

  test("stream_topk_state (transformWithState ListState): per-user running top-3") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Ev]
      val q = StreamingOps.runningTopKTws(ms.toDS(), 3).toDF("user_id", "top")
        .writeStream.format("memory").queryName("topk")
        .outputMode("update").start()
      ms.addData(ev(0, "2024-01-01 10:00:00", 1, "m", 5.0),
                 ev(1, "2024-01-01 10:01:00", 1, "m", 9.0),
                 ev(2, "2024-01-01 10:02:00", 2, "m", 2.0))
      q.processAllAvailable()
      // second batch merges against the ListState, not the history:
      // 7.0 enters user 1's top-3, 1.0 does not
      ms.addData(ev(3, "2024-01-01 10:03:00", 1, "m", 7.0),
                 ev(4, "2024-01-01 10:04:00", 1, "m", 1.0),
                 ev(5, "2024-01-01 10:05:00", 2, "m", 8.0))
      q.processAllAvailable()
      // the running top-k string only ever grows (k not yet reached) or
      // improves in place at equal length — the LONGEST string per user
      // is the final state (both users end strictly longer here)
      val last = spark.table("topk").groupBy("user_id")
        .agg(max_by(col("top"), length(col("top"))).as("top"))
        .as[(Long, String)].collect().toMap
      assert(last === Map(1L -> "9.0,7.0,5.0", 2L -> "8.0,2.0"))
      q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream_join_leftouter: unmatched clicks emit with nulls after eviction") {
    val imps = MemoryStream[Ev]
    val clks = MemoryStream[Ev]
    val q = StreamingOps.attributeClicksJoin(imps.toDF, clks.toDF, "leftOuter")
      .writeStream.format("memory").queryName("attr_lo")
      .outputMode("append").start()
    imps.addData(ev(10, "2024-01-01 10:00:00", 1, "imp", 0.0))
    clks.addData(
      ev(20, "2024-01-01 10:04:00", 1, "click", 0.0), // attributed
      ev(21, "2024-01-01 10:03:00", 2, "click", 0.0)) // no impression
    q.processAllAvailable()
    // march the watermark twice so unmatched state finalizes and emits
    for (t <- Seq("2024-01-01 12:00:00", "2024-01-01 13:00:00")) {
      imps.addData(ev(30, t, 9, "imp", 0.0))
      clks.addData(ev(31, t, 9, "click", 0.0))
      q.processAllAvailable()
    }
    val got = spark.table("attr_lo").where($"user_id" <= 2)
      .select($"c_id", $"i_ts").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    // the attributed click carries its impression; the orphan click is
    // REPORTED (null impression) rather than dropped — the left-outer
    // contract — and only after the watermark proved nothing can match
    assert(got === Set(
      (20L, Some(ts("2024-01-01 10:00:00"))),
      (21L, None)))
    q.stop()
  }

  test("stream_ann_index: streamed vectors become probe-visible in the persisted LSH index") {
    graft.expr.GraftFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_stream_").toString
    val path = s"$dir/index"
    // deterministic 64-dim unit-ish vectors: v(seed) clusters with itself
    def vec(seed: Int): Array[Float] =
      (0 until 64).map(d => (((seed * 31 + d * 7) % 13) - 6).toFloat / 6f).toArray
    // batch-build the index over a base corpus (ids 1..20)
    val base = (1 to 20).map(i => (i.toLong, vec(i % 5))).toDF("vec_id", "embedding")
    graft.ops.LlmExtOps.annIndexRows(base)
      .write.format("journal").option("epochSize", "1000000").save(path)
    val store = graft.journal.JournalStore.open(spark, path)
    // probe = exactly the shape sim_ann_index serves: the query vector's
    // multi-probe ns list against the index namespaces
    def probe(q: Array[Float]): Set[Long] = {
      val qb = Seq(q).toDF("embedding")
        .select(expr("lsh_buckets(embedding, 4, 8)")).head.getSeq[Int](0)
      val probeNs = (0 until 4).flatMap(t =>
        (0 until 256).filter(b => Integer.bitCount(b ^ qb(t)) <= 3)
          .map(b => s"t${t}_b$b"))
      store.scan().where(col("ns").isin(probeNs: _*))
        .select(col("ukey")).distinct().as[Long].collect().toSet
    }
    val newVec = vec(99)
    val before = probe(newVec)
    assert(!before.contains(777L))
    // stream new vectors through the journal sink — the SAME index rows
    // the batch build writes, maintained incrementally, exactly-once
    val ms = MemoryStream[(Long, Array[Float])]
    val q = graft.ops.LlmExtOps.annIndexRows(
        ms.toDF.toDF("vec_id", "embedding"))
      .writeStream.format("journal")
      .option("checkpointLocation", s"$dir/ckpt")
      .start(path)
    ms.addData((777L, newVec))
    q.processAllAvailable()
    q.stop()
    // a vector always lands in its own bucket, and self-probe radius
    // includes it: the appended vector is now probe-visible
    val after = probe(newVec)
    assert(after.contains(777L), s"streamed vector not probe-visible: $after")
    // base corpus unchanged
    assert(before.subsetOf(after))
  }

  test("stream_auto_maintain: a checkpointed ingest with " +
      "autoMaintainBatches physically sheds expired rows — no CALL") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_automaint_").toString
    val path = s"$dir/store"
    // declare the policy FIRST (a table attribute, not sink config)
    val store = graft.journal.JournalStore.create(spark, path, 1000L)
    store.setMeta(Map(
      graft.journal.JournalStore.RetentionKey -> "1 HOURS"))
    def at(minusMin: Long) = java.sql.Timestamp.from(
      java.time.Instant.now().minus(minusMin,
        java.time.temporal.ChronoUnit.MINUTES))
    val ms = MemoryStream[(String, Long, java.sql.Timestamp, String, Double)]
    val q = ms.toDF.toDF("ns", "ukey", "ts", "payload", "val")
      .writeStream.format("journal")
      .option("checkpointLocation", s"$dir/ckpt")
      .option("autoMaintainBatches", "1")
      .start(path)
    // batch 0: one already-expired row, one fresh
    ms.addData(("n", 1L, at(180), "stale", 1.0),
      ("n", 2L, at(1), "fresh-a", 2.0))
    q.processAllAvailable()
    // batch 1: fresh only — its commit hook sweeps batch 0's stale row
    ms.addData(("n", 3L, at(0), "fresh-b", 3.0))
    q.processAllAvailable()
    q.stop()
    val kept = graft.journal.JournalStore.open(spark, path).scan()
      .select("payload").as[String].collect().toSeq.sorted
    assert(kept === Seq("fresh-a", "fresh-b"),
      s"expired row must be SHED by the commit hook, got $kept")

    // a POLICY-LESS store with the option on: the cadence is a no-op —
    // nothing erased, nothing failed
    val path2 = s"$dir/store2"
    val ms2 = MemoryStream[(String, Long, java.sql.Timestamp, String, Double)]
    val q2 = ms2.toDF.toDF("ns", "ukey", "ts", "payload", "val")
      .writeStream.format("journal")
      .option("checkpointLocation", s"$dir/ckpt2")
      .option("autoMaintainBatches", "1")
      .start(path2)
    ms2.addData(("n", 1L, at(999999), "ancient-but-kept", 1.0))
    q2.processAllAvailable()
    q2.stop()
    assert(graft.journal.JournalStore.open(spark, path2).scan().count() === 1L)
  }
}
