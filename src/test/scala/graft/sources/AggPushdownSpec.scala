package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Manifest-stats aggregate pushdown (JournalV2.ManifestAggScan): a
  * global count/min/max over a journal table must be answered from the
  * manifest — one driver-built row, zero data files opened — and must
  * DECLINE (exact-or-decline contract) whenever a filter or group-by
  * makes the stats insufficient. */
class AggPushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkStore(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_aggpd_").toString + "/store"
    val df = Seq(
      (0L, "a", 10L, "2024-01-01 00:00:01", "p0", 1.0),
      (1L, "a", 20L, "2024-01-02 00:00:02", "p1", 2.0),
      (2L, "b", 5L, "2024-01-03 00:00:03", "p2", 3.0),
      (3L, "b", 70L, "2024-01-04 00:00:04", "p3", 4.0),
      (4L, "c", 40L, "2024-01-05 00:00:05", "p4", 5.0))
      .toDF("seq", "ns", "ukey", "ts", "payload", "val")
      .withColumn("ts", col("ts").cast("timestamp"))
    df.write.format("journal").option("epochSize", "2").save(dir)
    dir
  }

  private def scans(df: DataFrame) = {
    df.collect() // force execution (AQE finalizes the plan)
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.getClass.getSimpleName
    }
  }

  test("global count/min/max answers from the manifest (no file scan)") {
    val dir = mkStore()
    val agg = spark.read.format("journal").load(dir)
      .agg(count(lit(1)).as("n"),
        min("seq").as("mns"), max("seq").as("mxs"),
        min("ukey").as("mnk"), max("ukey").as("mxk"),
        min("ts").as("mnt"), max("ts").as("mxt"))
    val row = agg.collect()(0)
    assert(row.getLong(0) === 5L)
    assert(row.getLong(1) === 0L && row.getLong(2) === 4L)
    assert(row.getLong(3) === 5L && row.getLong(4) === 70L)
    assert(row.getTimestamp(5).toString.startsWith("2024-01-01") &&
      row.getTimestamp(6).toString.startsWith("2024-01-05"))
    assert(scans(agg) === Seq("ManifestAggScan"),
      agg.queryExecution.executedPlan.toString)
  }

  test("count(*) alone answers from the manifest") {
    val dir = mkStore()
    val agg = spark.read.format("journal").load(dir).agg(count(lit(1)).as("n"))
    assert(agg.as[Long].collect()(0) === 5L)
    assert(scans(agg) === Seq("ManifestAggScan"))
  }

  test("count(*) stays a manifest parse while deletion vectors live; " +
      "min/max answers from the subtracted scan") {
    val dir = mkStore()
    val store = graft.journal.JournalStore.open(spark, dir)
    store.deleteWhereDv(col("ukey") === 20L)
    // global count: per-file counts are DV-decremented exactly →
    // ManifestAggScan, zero data files opened, subtracted answer
    val cnt = spark.read.format("journal").load(dir).agg(count(lit(1)).as("n"))
    assert(scans(cnt) === Seq("ManifestAggScan"))
    assert(cnt.collect()(0).getLong(0) === 4L)
    // grouped on a layout axis: still manifest-answered
    val byNs = spark.read.format("journal").load(dir)
      .groupBy("ns").agg(count(lit(1)).as("n"))
    assert(scans(byNs) === Seq("ManifestAggScan"))
    assert(byNs.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("a" -> 1L, "b" -> 2L, "c" -> 1L))
    // min/max cannot trust ranges while vectors live: the query rides
    // the DV-subtracted columnar plan instead, still exact
    val mm = spark.read.format("journal").load(dir).agg(max("ukey").as("mx"))
    assert(mm.collect()(0).getLong(0) === 70L)
    assert(!mm.queryExecution.executedPlan.toString.contains("ManifestAggScan"))
  }

  test("a filtered aggregate declines pushdown (stats describe unfiltered data)") {
    val dir = mkStore()
    val agg = spark.read.format("journal").load(dir)
      .where(col("ns") === "a").agg(count(lit(1)).as("n"))
    assert(agg.as[Long].collect()(0) === 2L)
    assert(!scans(agg).contains("ManifestAggScan"))
    val agg2 = spark.read.format("journal").load(dir)
      .where(col("seq") >= 2).agg(max("ukey").as("m"))
    assert(agg2.as[Long].collect()(0) === 70L)
    assert(!scans(agg2).contains("ManifestAggScan"))
  }

  test("group-by and unsupported columns decline pushdown") {
    val dir = mkStore()
    val byNs = spark.read.format("journal").load(dir)
      .groupBy("ns").agg(count(lit(1)).as("n")).orderBy("ns")
    assert(byNs.as[(String, Long)].collect().toSeq ===
      Seq(("a", 2L), ("b", 2L), ("c", 1L)))
    assert(!scans(byNs).contains("ManifestAggScan"))
    val valAgg = spark.read.format("journal").load(dir).agg(min("val").as("m"))
    assert(valAgg.as[Double].collect()(0) === 1.0)
    assert(!scans(valAgg).contains("ManifestAggScan"))
  }

  test("journal_meta_agg (declared query) rides ManifestAggScan and matches the data") {
    val sf = "/root/testdata/sf0.001"
    val q = graft.SparkEntry.queries("journal_meta_agg")(spark, sf)
    val row = q.collect()(0)
    val ev = graft.Tables(spark, sf, "events").where(col("event_id") < 6000)
      .agg(count(lit(1)), min("event_id"), max("event_id"),
        min("user_id"), max("user_id"), min("ts"), max("ts")).collect()(0)
    assert(row === ev)
    assert(scans(q).contains("ManifestAggScan"),
      q.queryExecution.executedPlan.toString)
  }

  test("GROUP BY ns / epoch answers from the manifest (layout-axis rollup)") {
    val dir = mkStore()
    // no orderBy: an exchange would wrap the scan in an AQE query stage
    // the scans() collector can't traverse — sort driver-side instead
    val byNs = spark.read.format("journal").load(dir)
      .groupBy("ns").agg(count(lit(1)).as("n"),
        min("ukey").as("mnk"), max("ukey").as("mxk"))
    val rows = byNs.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(rows === Seq(("a", 2L, 10L, 20L), ("b", 2L, 5L, 70L),
      ("c", 1L, 40L, 40L)))
    assert(scans(byNs) === Seq("ManifestAggScan"),
      byNs.queryExecution.executedPlan.toString)

    val byBoth = spark.read.format("journal").load(dir)
      .groupBy("ns", "epoch").agg(max("seq").as("mxs"))
    assert(byBoth.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted ===
      Seq(("a", 0L, 1L), ("b", 1L, 3L), ("c", 2L, 4L)))
    assert(scans(byBoth) === Seq("ManifestAggScan"))

    // non-layout grouping key → ordinary scan (exact-or-decline)
    val byKey = spark.read.format("journal").load(dir)
      .groupBy("ukey").agg(count(lit(1)).as("n"))
    byKey.collect()
    assert(scans(byKey) !== Seq("ManifestAggScan"))
  }

  test("the scan reports the EXACT manifest row count to the optimizer") {
    // the root may be a Project (column reorder) whose default stats
    // visitor drops rowCount — assert on the scan relation itself
    def scanStats(df: DataFrame) = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.stats.rowCount
    }.head
    val dir = mkStore()
    assert(scanStats(spark.read.format("journal").load(dir)) === Some(BigInt(5)))
    // a pushed filter invalidates the file-level count — no exact claim
    assert(scanStats(spark.read.format("journal").load(dir)
      .where(col("ukey") > 20)).isEmpty)
  }

  test("a pushed range on an ANALYZED store reports post-prune, " +
      "selectivity-priced cardinality from the per-file sketches, and " +
      "the static broadcast decision flips on the scaled bytes") {
    def mk(analyze: Boolean): String = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_aggpd_cs_").toString + "/store"
      val store = graft.journal.JournalStore.create(spark, dir,
        epochSize = 100000)
      def batch(lo: Long) = (0 until 200).map(i =>
        ("n", lo + i, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"),
          s"p${lo + i}", (lo + i).toDouble))
        .toDF("ns", "ukey", "ts", "payload", "val")
      store.append(batch(0)); store.append(batch(1000))
      store.append(batch(2000))
      if (analyze) store.analyze()
      dir
    }
    def scanStats(df: DataFrame) = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.stats
    }.head
    val dir = mk(analyze = true)
    def rd = spark.read.format("journal").load(dir)
    // unfiltered: the exact manifest count still serves
    assert(scanStats(rd).rowCount === Some(BigInt(600)))
    // a range into the top quarter of ONE file: pruning drops the scan
    // to that file, and the estimate prices the range FRACTION within
    // it (used to decline to bytes — no rowCount at all)
    val est = scanStats(rd.where(col("val") >= 2150.0)).rowCount
    assert(est.isDefined, "filtered scan must report estimated rows")
    assert(est.get >= BigInt(25) && est.get <= BigInt(100),
      s"expected a fraction of one 200-row file, got $est")
    // equality prices through the per-file HLL ndv — the sidecar's
    // first planner consumer
    val estEq = scanStats(rd.where(col("ukey") === 2100L)).rowCount
    assert(estEq.isDefined && estEq.get >= BigInt(1) &&
      estEq.get <= BigInt(10), s"ndv-priced equality, got $estEq")
    // provably-empty prune reports zero rows
    assert(scanStats(rd.where(col("val") === 500.0)).rowCount ===
      Some(BigInt(0)))
    // STATIC broadcast flip: size the threshold between the
    // selectivity-scaled bytes (analyzed) and the unscaled full-scan
    // bytes (never-analyzed twin). sparkPlan (pre-AQE) pins the
    // planner's own decision, not a runtime rescue.
    val fullBytes = scanStats(spark.read.format("journal").load(
      mk(analyze = false)).where(col("val") >= 2150.0))
      .sizeInBytes.toLong
    val scaledBytes = scanStats(rd.where(col("val") >= 2150.0))
      .sizeInBytes.toLong
    assert(scaledBytes < fullBytes / 4,
      s"scaled=$scaledBytes full=$fullBytes")
    val threshold = (scaledBytes + fullBytes) / 2
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      threshold.toString)
    try {
      val big = spark.read.format("journal").load(mk(analyze = false))
      val joinedA = big.join(rd.where(col("val") >= 2150.0), Seq("ukey"))
      assert(joinedA.queryExecution.sparkPlan.toString
        .contains("BroadcastHashJoin"),
        joinedA.queryExecution.sparkPlan.toString)
      val twin = spark.read.format("journal").load(mk(analyze = false))
      val joinedB = big.join(twin.where(col("val") >= 2150.0), Seq("ukey"))
      assert(!joinedB.queryExecution.sparkPlan.toString
        .contains("BroadcastHashJoin"),
        joinedB.queryExecution.sparkPlan.toString)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("all-null ukey in every file answers NULL min/max from the sentinel") {
    val dir = java.nio.file.Files.createTempDirectory("graft_aggpd_n_").toString + "/store"
    Seq((0L, "a", "2024-01-01 00:00:01", "p0", 1.0),
        (1L, "a", "2024-01-02 00:00:02", "p1", 2.0))
      .toDF("seq", "ns", "ts", "payload", "val")
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("ukey", lit(null).cast("long"))
      .write.format("journal").option("epochSize", "10").save(dir)
    val agg = spark.read.format("journal").load(dir)
      .agg(count(lit(1)).as("n"), min("ukey").as("mn"), max("ukey").as("mx"))
    val row = agg.collect()(0)
    assert(row.getLong(0) === 2L && row.isNullAt(1) && row.isNullAt(2))
    assert(scans(agg) === Seq("ManifestAggScan"))
  }

  test("histogram-refined selectivity (round 19): a skewed BIGINT " +
      "range prices through the table histogram where the uniform " +
      "assumption is an order of magnitude off; a stale histogram " +
      "declines back to uniform") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_aggpd_h_").toString + "/store"
    val store = graft.journal.JournalStore.create(spark, dir,
      epochSize = 100000)
    // 1024 rows in ONE file: 960 dense in [0, 960) and a 64-row tail
    // uniformly spread over [37_500, 2_400_000] — exactly one
    // equi-height bin. The file's bounds are [0, 2.4M], so the
    // uniform fraction for `ukey > 1.2M` reads ~0.5 (≈512 rows) while
    // the truth is 32 — 16× off; the table histogram's last bin is
    // the tail itself, linear within the bin, so the refined estimate
    // lands on ~32.
    val rows = (0 until 960).map(i => ("n", i.toLong,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), s"p$i", 1.0)) ++
      (1 to 64).map(i => ("n", 37500L * i,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), s"t$i", 2.0))
    store.append(rows.toDF("ns", "ukey", "ts", "payload", "val"))
    store.analyze()
    def scanStats(df: DataFrame) = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => r.stats
    }.head
    def rd = spark.read.format("journal").load(dir)
    val est = scanStats(rd.where(col("ukey") > 1200000L)).rowCount
    assert(est.isDefined, "filtered scan must report estimated rows")
    assert(est.get >= BigInt(16) && est.get <= BigInt(64),
      s"histogram-refined estimate should land near the true 32, " +
        s"got $est (uniform would say ~512)")
    // stale histogram: grow the table past 2× the capture point — the
    // two-sided freshness gate declines the refinement and the same
    // probe prices uniform again (the dense second file prunes, so
    // the surviving file's uniform fraction is back to ~0.5)
    store.append((0 until 1600).map(i => ("n", (10000 + i).toLong,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), s"d$i", 3.0))
      .toDF("ns", "ukey", "ts", "payload", "val"))
    val est2 = scanStats(rd.where(col("ukey") > 1200000L)).rowCount
    assert(est2.isDefined && est2.get >= BigInt(256),
      s"a stale histogram must decline to the uniform fraction, got $est2")
  }
}
