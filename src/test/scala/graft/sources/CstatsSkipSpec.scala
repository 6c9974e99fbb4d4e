package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.journal.JournalStore

/** cstats FILE-level data skipping (round 17): the per-file column
  * sketches the analyze bootstrap / append path records double as a
  * Delta-style skipping index — pushed predicates on ANY sketched
  * column prune whole files by their recorded bounds, the axis the
  * partition directories and the (seq, ts, ukey) manifest stats cannot
  * express. These tests pin the pruning (file counts through the built
  * scan's index), its SOUNDNESS (results equal an identical
  * never-analyzed store on every boundary), the all-null-file prune,
  * and the conservative keeps (no sketch / unhandled predicate). */
class CstatsSkipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** THREE files in one (epoch, ns) directory with disjoint `val`
    * ranges, distinct payload prefixes, distinct ts days, and an
    * `extra` column that is ALL NULL in the first file. */
  private def mkStore(analyze: Boolean): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cskip_").toString + "/store"
    val store = JournalStore.create(spark, dir, epochSize = 1000)
    def batch(lo: Double, tag: String, day: Int, extra: Option[Long]) =
      (0 until 20).map(i => ("n", (lo + i).toLong, ts(f"2024-01-$day%02d 00:00:01"),
        s"$tag$i", lo + i, extra))
        .toDF("ns", "ukey", "ts", "payload", "val", "extra")
    store.append(batch(0.0, "aaa", 1, None))
    store.append(batch(100.0, "mmm", 10, Some(7L)))
    store.append(batch(200.0, "zzz", 20, Some(9L)))
    if (analyze) store.analyze()
    dir
  }

  private def scannedFiles(df: DataFrame): Int =
    df.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b.scan }
      .collectFirst { case s: JournalParquetScan => s.fileIndex.inputFiles.length }
      .getOrElse(fail("expected a JournalParquetScan"))

  test("pushed range/equality predicates prune files by per-file " +
      "column bounds (double, string, timestamp)") {
    val path = mkStore(analyze = true)
    def rd = spark.read.format("journal").load(path)
    assert(scannedFiles(rd) === 3, "fixture must hold 3 files")
    // double range: only the third file can hold val > 150
    assert(scannedFiles(rd.where(col("val") > 150.0)) === 1)
    assert(rd.where(col("val") > 150.0).count() === 20L)
    // double equality inside the second file's range
    assert(scannedFiles(rd.where(col("val") === 105.0)) === 1)
    assert(rd.where(col("val") === 105.0).count() === 1L)
    // equality BETWEEN ranges: provably empty — zero files open
    assert(scannedFiles(rd.where(col("val") === 50.0)) === 0)
    assert(rd.where(col("val") === 50.0).count() === 0L)
    // string bound (unsigned UTF-8 order, the recorded domain)
    assert(scannedFiles(rd.where(col("payload") >= "z")) === 1)
    assert(rd.where(col("payload") >= "z").count() === 20L)
    // timestamp bound serves from epoch-micros extrema
    assert(scannedFiles(
      rd.where(col("ts") < lit(ts("2024-01-05 00:00:00")))) === 1)
    assert(rd.where(col("ts") < lit(ts("2024-01-05 00:00:00")))
      .count() === 20L)
    // IN-list touching two ranges keeps exactly those two files
    assert(scannedFiles(rd.where(col("val").isin(5.0, 205.0))) === 2)
    assert(rd.where(col("val").isin(5.0, 205.0)).count() === 2L)
  }

  test("an all-null file prunes for null-rejecting predicates; IS NULL " +
      "/ IS NOT NULL prune from the exact per-file null counts") {
    val path = mkStore(analyze = true)
    def rd = spark.read.format("journal").load(path)
    // extra = 7 can only live where extra has values AND the bound fits
    assert(scannedFiles(rd.where(col("extra") === 7L)) === 1)
    assert(rd.where(col("extra") === 7L).count() === 20L)
    // IS NULL prunes the two files whose extra has ZERO nulls; the
    // all-null file's rows still come back
    assert(scannedFiles(rd.where(col("extra").isNull)) === 1)
    assert(rd.where(col("extra").isNull).count() === 20L)
    // IS NOT NULL prunes the all-null file (nulls == rows)
    assert(scannedFiles(rd.where(col("extra").isNotNull)) === 2)
    assert(rd.where(col("extra").isNotNull).count() === 40L)
    // a never-nulled column: IS NULL is provably empty — zero files
    assert(scannedFiles(rd.where(col("payload").isNull)) === 0)
    assert(rd.where(col("payload").isNull).count() === 0L)
    // timestamp flavors push NOTHING to parquet (INT96/NTZ), so their
    // IS [NOT] NULL rides the catalyst-grain capture — same pruning
    assert(scannedFiles(rd.where(col("ts").isNull)) === 0)
    assert(rd.where(col("ts").isNull).count() === 0L)
    assert(scannedFiles(rd.where(col("ts").isNotNull)) === 3)
    assert(rd.where(col("ts").isNotNull).count() === 60L)
  }

  test("string-prefix predicates prune by UTF-8 bounds (prefix window " +
      "[p, successor(p)) against per-file min/max)") {
    val path = mkStore(analyze = true)
    def rd = spark.read.format("journal").load(path)
    // each payload family lives in exactly one file
    assert(scannedFiles(rd.where(col("payload").startsWith("aaa"))) === 1)
    assert(rd.where(col("payload").startsWith("aaa")).count() === 20L)
    assert(scannedFiles(rd.where(col("payload").startsWith("zz"))) === 1)
    assert(rd.where(col("payload").startsWith("zz")).count() === 20L)
    // a prefix BETWEEN families is provably empty — zero files open
    assert(scannedFiles(rd.where(col("payload").startsWith("b"))) === 0)
    assert(rd.where(col("payload").startsWith("b")).count() === 0L)
    // a single-occurrence narrow prefix keeps only its file
    assert(scannedFiles(rd.where(col("payload").startsWith("mmm1"))) === 1)
    assert(rd.where(col("payload").startsWith("mmm1")).count() === 11L)
  }

  test("soundness: every boundary probe returns exactly what the " +
      "never-analyzed twin returns") {
    val pruned = mkStore(analyze = true)
    val full = mkStore(analyze = false)
    def both(f: DataFrame => DataFrame): Unit = {
      val a = f(spark.read.format("journal").load(pruned))
        .orderBy("ukey", "seq").collect().map(_.toString).toSeq
      val b = f(spark.read.format("journal").load(full))
        .orderBy("ukey", "seq").collect().map(_.toString).toSeq
      assert(a === b)
    }
    // inclusive boundaries on every file edge, both directions
    Seq(0.0, 19.0, 100.0, 119.0, 200.0, 219.0).foreach { edge =>
      both(_.where(col("val") >= edge))
      both(_.where(col("val") <= edge))
      both(_.where(col("val") === edge))
      both(_.where(col("val") > edge))
      both(_.where(col("val") < edge))
    }
    both(_.where(col("payload") === "mmm0"))
    both(_.where(col("ts") >= lit(ts("2024-01-10 00:00:01"))))
    both(_.where(col("extra") <= 7L))
    both(_.where(col("extra").isNull))
    both(_.where(col("extra").isNotNull))
    both(_.where(col("payload").isNull))
    both(_.where(col("payload").isNotNull))
    // prefix probes on every file edge, plus the non-ASCII and
    // empty-prefix corners (empty prefix has no finite successor for
    // its lower half; multi-byte prefixes exercise the byte-level
    // compare beyond valid-UTF-8 successors)
    Seq("aaa0", "aaa9", "aaa19", "aaa", "a", "mmm", "mmm0", "zzz19",
        "zzz", "z", "b", "", "ÿ", "zzz19x").foreach { pre =>
      both(_.where(col("payload").startsWith(pre)))
    }
  }

  test("TIMESTAMP_NTZ predicates prune by exact raw-micros bounds, " +
      "including on a DST-gap wall time (NtzMicros capture)") {
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      def mk(analyze: Boolean): String = {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_cskipntz_").toString + "/store"
        val store = JournalStore.create(spark, dir, epochSize = 1000)
        def batch(lo: Long, wall: Seq[String]) =
          wall.zipWithIndex.map { case (w, i) =>
            ("n", lo + i, ts("2024-01-01 00:00:01"), "p", 1.0, w) }
            .toDF("ns", "ukey", "ts", "payload", "val", "w")
            .withColumn("tn", expr("to_timestamp_ntz(w)")).drop("w")
        store.append(batch(0, Seq("2024-03-09 10:00:00",
          "2024-03-09 11:00:00")))
        // the middle file's range brackets the New York spring-forward
        // gap (02:00-03:00 on 2024-03-10) — the wall times inside it
        // exist as NTZ values even though no local instant matches
        store.append(batch(10, Seq("2024-03-10 01:30:00",
          "2024-03-10 02:30:00", "2024-03-10 02:45:00")))
        store.append(batch(20, Seq("2024-03-11 09:00:00")))
        if (analyze) store.analyze(Seq("tn"))
        dir
      }
      val path = mk(analyze = true)
      def rd = spark.read.format("journal").load(path)
      def ntz(s: String) = java.time.LocalDateTime.parse(s)
      // an equality probe AT the gap wall time opens only its file
      assert(scannedFiles(
        rd.where(col("tn") === lit(ntz("2024-03-10T02:30:00")))) === 1)
      assert(rd.where(col("tn") === lit(ntz("2024-03-10T02:30:00")))
        .count() === 1L)
      // a range ending INSIDE the gap hour keeps the bracket file and
      // drops the later day
      assert(scannedFiles(
        rd.where(col("tn") < lit(ntz("2024-03-10T02:40:00")))) === 2)
      assert(rd.where(col("tn") < lit(ntz("2024-03-10T02:40:00")))
        .count() === 4L)
      // soundness at every boundary vs the never-analyzed twin
      val full = mk(analyze = false)
      Seq("2024-03-09T10:00:00", "2024-03-10T01:30:00",
          "2024-03-10T02:30:00", "2024-03-10T02:45:00",
          "2024-03-10T03:00:00", "2024-03-11T09:00:00").foreach { e =>
        def probe(p: String) = {
          val d = spark.read.format("journal").load(p)
          Seq(d.where(col("tn") >= lit(ntz(e))),
            d.where(col("tn") <= lit(ntz(e))),
            d.where(col("tn") === lit(ntz(e))))
            .map(_.orderBy("ukey").collect().map(_.toString).toSeq)
        }
        assert(probe(path) === probe(full), e)
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("a never-analyzed store has no sketches: predicates prune " +
      "nothing (conservative), results unchanged") {
    val path = mkStore(analyze = false)
    def rd = spark.read.format("journal").load(path)
    assert(scannedFiles(rd.where(col("val") > 150.0)) === 3)
    assert(rd.where(col("val") > 150.0).count() === 20L)
  }

  test("a refold DECLINE keeps the sidecar: file skipping survives " +
      "even when the merged stats drop") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cskipd_").toString + "/store"
    val store = JournalStore.create(spark, dir, epochSize = 1)
    def batch(lo: Int) = (lo until lo + 70).map(i =>
      ("n", i.toLong, ts("2024-01-01 00:00:01"), "p", i.toDouble))
      .toDF("ns", "ukey", "ts", "payload", "val")
    store.append(batch(0))       // 70 single-row files
    store.analyze(Seq("val"))    // bootstrap sketches them all
    store.append(batch(100))     // 70 MORE files, > MaxSketchDirs: no sketches
    // the erase cannot refold (sketchless survivors) — merged stats drop
    assert(store.deleteWhere(col("val") === 150.0) === 1L)
    assert(store.analyzedRowCount === None)
    // ...but the surviving per-file sketches still skip: a probe into
    // the SKETCHED range opens that one file plus the 69 sketchless
    // (never-pruned) survivors — not all 139
    def rd = spark.read.format("journal").load(dir)
    assert(scannedFiles(rd.where(col("val") === 5.0)) === 70)
    assert(rd.where(col("val") === 5.0).count() === 1L)
  }

  test("pruning survives the lifecycle: post-analyze appends are " +
      "sketched, deleteWhere re-sketches, and bounds narrow") {
    val path = mkStore(analyze = true)
    val store = JournalStore.open(spark, path)
    // a post-analyze append lands WITH sketches (delta part)
    store.append((0 until 10).map(i =>
      ("n", (300 + i).toLong, ts("2024-02-01 00:00:01"), s"qqq$i",
        300.0 + i, Option.empty[Long]))
      .toDF("ns", "ukey", "ts", "payload", "val", "extra"))
    def rd = spark.read.format("journal").load(path)
    assert(scannedFiles(rd.where(col("val") >= 300.0)) === 1)
    assert(rd.where(col("val") >= 300.0).count() === 10L)
    // erase the middle range: the rewrite re-sketches; the file leaves
    store.deleteWhere(col("val") >= 100.0 && col("val") < 120.0)
    assert(scannedFiles(rd.where(col("val") === 105.0)) === 0)
    assert(rd.where(col("val") === 105.0).count() === 0L)
    assert(rd.count() === 50L)
  }

  test("envelope consult (round 19): every sidecar part carries a " +
      "decodable manifest envelope, a selective scan probes a strict " +
      "subset of parts, and skipped parts only ever KEEP files") {
    import graft.journal.ColumnStatsSidecar
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cenv_").toString + "/store"
    val store = JournalStore.create(spark, dir, epochSize = 100)
    // six batches with DISJOINT ukey and val ranges, one per epoch —
    // each post-analyze append lands its own delta part, so the part
    // set is many and each part's file-name range covers one batch
    def batch(i: Int) = (0 until 100).map { j =>
      ("n", (i * 100 + j).toLong, ts("2024-01-01 00:00:01"),
        s"p$i$j", (i * 1000 + j).toDouble)
    }.toDF("ns", "ukey", "ts", "payload", "val")
    store.append(batch(0))
    store.analyze()
    (1 to 5).foreach(i => store.append(batch(i)))
    val m = store.manifest
    assert(m.cstatsParts.size >= 6, s"parts=${m.cstatsParts.size}")
    // every part — the distributed bootstrap's AND the driver deltas' —
    // carries a decodable, non-empty envelope beside its name
    m.cstatsParts.foreach { p =>
      val env = m.cstatsEnvs.get(p).flatMap(ColumnStatsSidecar.decodeEnv)
      assert(env.exists(_.nonEmpty), s"part $p lacks an envelope")
    }
    def rd = spark.read.format("journal").load(dir)
    def probesOf(f: => Unit): Long = {
      val before = ColumnStatsSidecar.partProbes.get()
      f
      ColumnStatsSidecar.partProbes.get() - before
    }
    val total = m.cstatsParts.size.toLong
    // SELECTIVE scan: the key probe narrows candidates to one batch's
    // file; the envelopes' file-name ranges admit only that batch's
    // part, and its value proof shows nothing prunable — the prune
    // pass opens NOTHING, the estimator opens only the matching part
    val pSel = probesOf {
      assert(scannedFiles(rd.where(col("ukey") === 250L)) === 1)
    }
    assert(pSel <= 2L && pSel < total,
      s"selective scan probed $pSel of $total parts")
    // UNSELECTIVE range matching only the last batch: the five
    // excluded batches' parts must open (each CAN prune its files),
    // the matching batch's part proves nothing-prunable and is
    // skipped by the prune pass — strictly fewer touches than the
    // open-everything-twice round-18 behavior
    val pRange = probesOf {
      assert(scannedFiles(rd.where(col("val") >= 5000.0)) === 1)
    }
    assert(pRange < 2L * total,
      s"range scan probed $pRange of $total parts twice over")
    // soundness of every skip: the pruned plans return exactly the
    // expected rows
    assert(rd.where(col("ukey") === 250L).count() === 1L)
    assert(rd.where(col("val") >= 5000.0).count() === 100L)
  }

  test("NTZ skipping is gated on the raw-micros certification marker " +
      "(ADVICE r18): analyze stamps it, a marker-less family keeps " +
      "every file under NTZ predicates, re-analyze re-arms") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cntzm_").toString + "/store"
    val store = JournalStore.create(spark, dir, epochSize = 1000)
    def batch(lo: Long, wall: String) =
      Seq(("n", lo, ts("2024-01-01 00:00:01"), "p", 1.0, wall))
        .toDF("ns", "ukey", "ts", "payload", "val", "w")
        .withColumn("tn", expr("to_timestamp_ntz(w)")).drop("w")
    store.append(batch(0, "2024-03-09 10:00:00"))
    store.append(batch(1, "2024-06-01 10:00:00"))
    store.analyze(Seq("tn"))
    assert(store.manifest.meta.get(JournalStore.StatsNtzExactKey)
      === Some("1"), "analyze must stamp the NTZ certification marker")
    def rd = spark.read.format("journal").load(dir)
    def ntz(s: String) = java.time.LocalDateTime.parse(s)
    val pred = col("tn") < lit(ntz("2024-04-01T00:00:00"))
    assert(scannedFiles(rd.where(pred)) === 1)
    // strip the marker — the model of a family analyzed by a
    // pre-marker build whose capture zone is unknowable: NTZ declines
    // from skipping (conservative keep), results unchanged
    store.unsetMeta(Seq(JournalStore.StatsNtzExactKey))
    assert(scannedFiles(rd.where(pred)) === 2,
      "a marker-less family must not prune on NTZ bounds")
    assert(rd.where(pred).count() === 1L)
    // a fresh analyze() re-stamps and re-arms
    store.analyze(Seq("tn"))
    assert(scannedFiles(rd.where(pred)) === 1)
    assert(rd.where(pred).count() === 1L)
  }
}
