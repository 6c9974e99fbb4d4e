package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** SQL addressability of journal stores through [[JournalCatalog]]
  * (SURVEY §3.2's SQL entry point beyond fixture views): CREATE /
  * INSERT / SELECT / DROP by NAME, with INSERT riding the V2 commit
  * framework into the store's whole-batch append. */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ONE root for the suite: Spark instantiates and caches the catalog at
  // first resolution, so later conf changes would be ignored anyway
  private lazy val catalogRoot: String = {
    val root = java.nio.file.Files.createTempDirectory("graft_jcat_").toString
    spark.conf.set("spark.sql.catalog.jcat", classOf[JournalCatalog].getName)
    spark.conf.set("spark.sql.catalog.jcat.root", root)
    root
  }
  private def withCatalog[A](f: String => A): A = f(catalogRoot)

  test("journal_catalog: create, insert, select, drop by name") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.clicks (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '2')")
    // the table IS a journal store directory under the catalog root
    assert(graft.journal.JournalStore.exists(s"$root/clicks"))
    assert(intercept[Exception] {
      spark.sql("CREATE TABLE jcat.clicks (x INT) USING journal")
    }.getMessage.toLowerCase.contains("exist"))

    // INSERT is by NAME (the table schema carries engine-assigned seq /
    // epoch columns, so appends project the writer columns and the V2
    // commit framework hands the batch to the store's global-sort append)
    spark.sql("INSERT INTO jcat.clicks SELECT 'users' AS ns, " +
      "CAST(1 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:01' AS ts, " +
      "'p0' AS payload, CAST(1.0 AS DOUBLE) AS val")
    spark.sql("INSERT INTO jcat.clicks SELECT 'users' AS ns, " +
      "CAST(1 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:02' AS ts, " +
      "'p1' AS payload, CAST(2.0 AS DOUBLE) AS val")

    // reads resolve to the same columnar V2 scan as the path API
    val byName = spark.sql("SELECT seq, payload FROM jcat.clicks ORDER BY seq")
    assert(byName.as[(Long, String)].collect().toSeq === Seq((0L, "p0"), (1L, "p1")))
    assert(byName.queryExecution.executedPlan.toString.contains("BatchScan"))
    // seq assignment + manifest rode the normal append path: the path
    // API sees the same store, state mode included
    val st = spark.read.format("journal").option("asOfSeq", "1").load(s"$root/clicks")
    assert(st.where(col("ukey") === 1L).select("payload").as[String].head() === "p1")

    // an append-only log: INSERT OVERWRITE is refused
    assert(intercept[Exception] {
      spark.sql("INSERT OVERWRITE jcat.clicks SELECT 'x' AS ns, " +
        "CAST(9 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:09' AS ts, " +
        "'p9' AS payload, CAST(9.0 AS DOUBLE) AS val")
    } != null)

    assert(spark.sql("SHOW TABLES IN jcat").select("tableName")
      .as[String].collect().toSeq === Seq("clicks"))
    spark.sql("DROP TABLE jcat.clicks")
    assert(!graft.journal.JournalStore.exists(s"$root/clicks"))
    assert(intercept[Exception] {
      spark.sql("SELECT * FROM jcat.clicks").collect()
    } != null)
  }}

  test("journal_catalog: VERSION AS OF pins a commit; TIMESTAMP AS OF resolves by wall clock") {
    withCatalog { root =>
      spark.sql("CREATE TABLE jcat.tt (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
        "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '2')")
      spark.sql("INSERT INTO jcat.tt SELECT 'a' AS ns, CAST(1 AS BIGINT) AS ukey, " +
        "TIMESTAMP '2024-01-01 00:00:01' AS ts, 'p0' AS payload, CAST(1.0 AS DOUBLE) AS val")
      // wall-clock instant strictly between the two commits (commitTsMs
      // is millisecond-granular — step past both boundaries)
      Thread.sleep(20); val between = System.currentTimeMillis(); Thread.sleep(20)
      spark.sql("INSERT INTO jcat.tt SELECT 'a' AS ns, CAST(2 AS BIGINT) AS ukey, " +
        "TIMESTAMP '2024-01-01 00:00:02' AS ts, 'p1' AS payload, CAST(2.0 AS DOUBLE) AS val")

      val store = graft.journal.JournalStore.open(spark, s"$root/tt")
      val vFirstInsert = store.versions()(1) // [create, insert1, insert2]
      // VERSION AS OF the first insert's commit: second batch invisible
      val pinned = spark.sql(
        s"SELECT ukey, payload FROM jcat.tt VERSION AS OF $vFirstInsert")
        .as[(Long, String)].collect().toSeq
      assert(pinned === Seq((1L, "p0")))
      // the unpinned table still sees both
      assert(spark.sql("SELECT count(*) FROM jcat.tt").as[Long].head() === 2L)

      // TIMESTAMP AS OF an instant between the commits = first insert's
      // snapshot (session tz is UTC — format the instant accordingly)
      val lit = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(between))
      val byTs = spark.sql(
        s"SELECT ukey, payload FROM jcat.tt TIMESTAMP AS OF '$lit'")
        .as[(Long, String)].collect().toSeq
      assert(byTs === Seq((1L, "p0")))
      // an instant before every retained commit is refused, not answered
      // with a newer snapshot
      val err = intercept[Exception] {
        spark.sql("SELECT * FROM jcat.tt TIMESTAMP AS OF '2001-01-01 00:00:00'")
          .collect()
      }
      assert(err.getMessage.contains("no version committed at or before") ||
        Option(err.getCause).exists(_.getMessage.contains("no version committed at or before")),
        err.getMessage)
      spark.sql("DROP TABLE jcat.tt")
    }
  }

  test("journal_catalog: CALL system.compact / system.vacuum maintain the store by SQL") {
    withCatalog { root =>
      spark.sql("CREATE TABLE jcat.mt (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
        "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
      // 4 commits into the same epoch directory → 4 fragment files
      (0 until 4).foreach { i =>
        spark.sql(s"INSERT INTO jcat.mt SELECT 'a' AS ns, CAST($i AS BIGINT) AS ukey, " +
          s"TIMESTAMP '2024-01-01 00:00:0$i' AS ts, 'p$i' AS payload, " +
          s"CAST($i.0 AS DOUBLE) AS val")
      }
      def segFiles(): Seq[java.io.File] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
          else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
        walk(new java.io.File(s"$root/mt/segments"))
      }
      val before = segFiles().size
      assert(before >= 4, s"expected fragmentation, got $before files")

      // ns-scoped partial OPTIMIZE first: only one namespace rewrites
      spark.sql("CALL jcat.system.compact(table => 'mt', ns => 'a')")
      spark.sql("CALL jcat.system.compact(table => 'mt', cluster_by_key => true)")
      // compact REWRITES (old files stay for retained versions until
      // vacuum); aggressive vacuum with no grace reclaims them
      spark.sql("CALL jcat.system.vacuum(table => 'mt', retain => 1, grace_ms => 0)")
      val after = segFiles().size
      assert(after === 1, s"expected one compacted file per dir, got $after")
      // maintenance is invisible to readers
      assert(spark.sql("SELECT count(*) FROM jcat.mt").as[Long].head() === 4L)
      assert(spark.sql("SELECT payload FROM jcat.mt WHERE ukey = 2").as[String].head() === "p2")

      val bad = intercept[Exception] {
        spark.sql("CALL jcat.system.frobnicate(table => 'mt')").collect()
      }
      assert(bad.getMessage.toLowerCase.contains("frobnicate"), bad.getMessage)
      spark.sql("DROP TABLE jcat.mt")
    }
  }

  test("CALL system.advise reads skew/layout signals from the " +
      "sidecar: compact, salt and zorder candidates on a constructed " +
      "skewed store") { withCatalog { root =>
    import graft.journal.JournalStore
    val store = JournalStore.create(spark, s"$root/adv", epochSize = 100000)
    // 10 interleaved appends into ONE namespace: fragmented dir
    // (compact candidate); `hot` has 2 distinct values over 400 rows
    // (salting candidate); `v` ranges interleave across every file
    // (z-order candidate); ukey is monotone (clean — no advice)
    (0 until 10).foreach { b =>
      store.append((0 until 40).map { i =>
        val u = b * 40L + i
        ("n", u, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"),
          "p", (i * 10 + b).toDouble, if (u % 2 == 0) "x" else "y")
      }.toDF("ns", "ukey", "ts", "payload", "val", "hot"))
    }
    store.analyze()
    val rows = spark.sql("CALL jcat.system.advise(table => 'adv')")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getString(6))).toMap
    // the fragmented namespace reads `compact`
    val (nsFiles, nsRows, _, nsAdvice) = rows(("ns", "n"))
    assert(nsFiles === 10L && nsRows === 400L && nsAdvice === "compact")
    // the 2-value hot key reads `salt` (≥ 64 rows per key in a file:
    // 40 rows / 2 values = 20 per file... per-file density is 20 —
    // use the corpus-hot shape: every file holds 20 rows per value)
    val (_, _, hotDensity, hotAdvice) = rows(("column", "hot"))
    assert(hotDensity >= 15.0, s"density=$hotDensity")
    // interleaved ranges read `zorder` on val
    assert(rows(("column", "val"))._4 === "zorder", rows.toString)
    // the monotone ukey is clean: disjoint per-file ranges, high ndv
    assert(rows(("column", "ukey"))._4 === "", rows.toString)
    // sanity on the salting label at a genuinely hot density: append
    // one fat single-value batch and re-read
    store.append((0 until 200).map(i =>
      ("n", 9999L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"),
        "p", 1.0, "x")).toDF("ns", "ukey", "ts", "payload", "val", "hot"))
    val rows2 = spark.sql("CALL jcat.system.advise(table => 'adv')")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getString(6)).toMap
    assert(rows2(("column", "hot")) === "salt", rows2.toString)
    assert(hotAdvice === "" || hotAdvice === "salt") // density-gated
  }}

  test("maintenance consumes the advisor (round 19): a fragmented, " +
      "interleaved store self-heals through the auto-maintain cadence " +
      "with no explicit CALL — the probe plans fewer files, the labels " +
      "clear, and the z-order latch stops repeat rewrites") {
    withCatalog { root =>
    import graft.journal.JournalStore
    val store = JournalStore.create(spark, s"$root/heal", epochSize = 100000)
    // the advise fixture's shape: 10 interleaved appends into ONE
    // (epoch, ns) dir — `n` fragments (compact label) and every
    // file's `val` range overlaps every other (zorder label). The
    // cadence arms AFTER the buildup: armed during it, maintenance
    // would (correctly) heal the fragmentation as it forms and there
    // would be no 10-file fixture left to witness.
    // every non-val column is per-row distinct (ts a second ladder,
    // payload row-unique): a healed single file must not read as
    // salt-dense on a deliberately-constant column, or the labels
    // could never clear
    def fix(b: Int, i: Int) = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z")
        .plusSeconds(b * 40L + i))
    (0 until 10).foreach { b =>
      store.append((0 until 40).map { i =>
        ("n", b * 40L + i, fix(b, i), s"p${b}_$i", (i * 10 + b).toDouble)
      }.toDF("ns", "ukey", "ts", "payload", "val"))
    }
    store.analyze()
    store.withAutoMaintain(1)
    def scanned(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan
        .collect { case b: BatchScanExec => b.scan }
        .collectFirst { case s: JournalParquetScan =>
          s.fileIndex.inputFiles.length }
        .getOrElse(fail("expected a JournalParquetScan"))
    def rd = spark.read.format("journal").load(s"$root/heal")
    // pre-heal: the interleave defeats file skipping — all 10 open
    assert(scanned(rd.where(col("val") >= 380.0)) === 10)
    assert(store.advise().exists(r => r.advice === "zorder"))
    assert(store.advise().exists(r => r.advice === "compact"))
    // the NEXT append's maintenance cadence consumes the labels: the
    // advised z-order compact rewrites the store clustered by the
    // measured columns — no CALL, no operator in the loop
    store.append(Seq(("n", 9999L, fix(10, 0), "p_trigger", 395.0))
      .toDF("ns", "ukey", "ts", "payload", "val"))
    val m = store.manifest
    assert(m.meta.contains(JournalStore.ZorderedByKey),
      "the cadence must record the acted z-order column set")
    // healed: one file per directory — the probe plans strictly fewer
    val post = scanned(rd.where(col("val") >= 380.0))
    assert(post < 10, s"post-heal probe planned $post files")
    // the LAYOUT labels clear afterward — nothing left for the next
    // cycle to rewrite (the constant-ns column legitimately keeps its
    // `salt` density readout: that is query-time shuffle advice,
    // deliberately never acted by layout maintenance)
    assert(store.advise().forall(r =>
      r.advice != "compact" && r.advice != "zorder"),
      store.advise().toString)
    // the latch: re-running layout maintenance acts on nothing and
    // commits nothing
    val v = store.manifest.version
    assert(store.maintainLayout() === 0L)
    assert(store.manifest.version === v)
    // content preserved through the self-heal
    assert(rd.count() === 401L)
    assert(rd.where(col("val") >= 380.0).count() === 21L)
  }}

  test("advise reports namespaces manifest-honestly (round 19): " +
      "escaped directory names decode to the real ns value") {
    withCatalog { root =>
    import graft.journal.JournalStore
    val store = JournalStore.create(spark, s"$root/esc", epochSize = 1000)
    // an ns OUTSIDE the safe charset: the partition dir spells it
    // escaped (ns=a%20b); the advisor must report the VALUE, not the
    // escaping
    store.append(Seq(("a b", 1L,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), "p", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val"))
    val names = store.advise().filter(_.scope == "ns").map(_.name)
    assert(names === Seq("a b"), names.toString)
  }}

  test("journal_catalog: readStream.table tails a catalog table by name") {
    withCatalog { root =>
      spark.sql("CREATE TABLE jcat.st (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
        "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '2')")
      spark.sql("INSERT INTO jcat.st SELECT 'a' AS ns, CAST(1 AS BIGINT) AS ukey, " +
        "TIMESTAMP '2024-01-01 00:00:01' AS ts, 'p0' AS payload, CAST(1.0 AS DOUBLE) AS val")
      val q = spark.readStream.table("jcat.st")
        .writeStream.format("memory").queryName("jcat_tail").outputMode("append")
        .start()
      try {
        q.processAllAvailable()
        def got = spark.table("jcat_tail").select("seq", "payload")
          .as[(Long, String)].collect().toSeq.sortBy(_._1)
        assert(got === Seq((0L, "p0")))
        // a catalog INSERT that lands while the stream runs arrives as
        // the next micro-batch — same MicroBatchStream as the path API
        spark.sql("INSERT INTO jcat.st SELECT 'a' AS ns, CAST(2 AS BIGINT) AS ukey, " +
          "TIMESTAMP '2024-01-01 00:00:02' AS ts, 'p1' AS payload, CAST(2.0 AS DOUBLE) AS val")
        q.processAllAvailable()
        assert(got === Seq((0L, "p0"), (1L, "p1")))
      } finally q.stop()
      spark.sql("DROP TABLE jcat.st")
    }
  }

  test("journal_catalog: readStream.table -> transform -> " +
      "writeStream.toTable round-trip is exactly-once across a " +
      "checkpointed restart") {
    withCatalog { root =>
      Seq("ttsrc", "ttdst").foreach(t => spark.sql(
        s"CREATE TABLE jcat.$t (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
          "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '2')"))
      def ins(t: String, k: Long, p: String): Unit = spark.sql(
        s"INSERT INTO jcat.$t SELECT 'a' AS ns, CAST($k AS BIGINT) AS ukey, " +
          s"TIMESTAMP '2024-01-01 00:00:0$k' AS ts, '$p' AS payload, " +
          s"CAST($k.0 AS DOUBLE) AS val")
      ins("ttsrc", 1L, "p1"); ins("ttsrc", 2L, "p2")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_tt_ckpt_").toString
      var queryId: String = null
      def run(): Unit = {
        val q = spark.readStream.table("jcat.ttsrc")
          .select(col("ns"), col("ukey"), col("ts"),
            upper(col("payload")).as("payload"), col("val"))
          .writeStream.option("checkpointLocation", ckpt)
          .toTable("jcat.ttdst")
        try { q.processAllAvailable(); queryId = q.id.toString }
        finally q.stop()
      }
      run()
      def dst = graft.journal.JournalStore.open(spark, s"$root/ttdst")
      def got = dst.latest().orderBy("ukey").select("ukey", "payload")
        .as[(Long, String)].collect().toSeq
      assert(got === Seq((1L, "P1"), (2L, "P2")))
      val rowsAfterFirst = dst.scan().count()
      // RESTART from the same checkpoint: Spark replays the last batch —
      // the (queryId, batchId) mark must swallow it, then the new source
      // row arrives exactly once
      ins("ttsrc", 3L, "p3")
      run()
      assert(got === Seq((1L, "P1"), (2L, "P2"), (3L, "P3")))
      assert(dst.scan().count() === rowsAfterFirst + 1,
        "replayed batches must not duplicate rows")
      // the exactly-once mark is keyed by the streaming QUERY id (stable
      // across restarts of one checkpoint), so a second query writing
      // the same table could never collide with this one's batch ids
      assert(dst.manifest.writerMarks.contains(queryId),
        s"marks: ${dst.manifest.writerMarks}")
      // the staged files were transient: no stream staging remains
      assert(!new java.io.File(s"$root/ttdst").listFiles()
        .exists(_.getName.startsWith(".streamstage")),
        "stage dirs must be cleaned after commit")
      Seq("ttsrc", "ttdst").foreach(t => spark.sql(s"DROP TABLE jcat.$t"))
    }
  }

  test("SQL MERGE WITH SCHEMA EVOLUTION: new columns ride the delta, " +
      "star maps source columns, no-op suppression sees extras, " +
      "mismatched clause sets refuse") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.mev (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
    Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-01 00:00:01"), "pa", 1.0),
      ("users", 2L, graft.TestSpark.ts("2024-01-01 00:00:02"), "pb", 2.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .write.format("journal").mode("append").save(s"$root/mev")
    def refuses(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(Option(e.getMessage).exists(_.contains(frag)),
        s"expected '$frag' in: ${e.getMessage}")
    }
    Seq(("users", 1L, graft.TestSpark.ts("2024-01-02 00:00:01"), "pa", 1.0, 0.9),
        ("users", 3L, graft.TestSpark.ts("2024-01-02 00:00:03"), "pc", 3.0, 0.3))
      .toDF("ns", "ukey", "ts", "payload", "val", "score")
      .createOrReplaceTempView("mev_src")
    // without the clause, a new column refuses with the hint
    refuses("""
      MERGE INTO jcat.mev AS t USING mev_src AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN MATCHED THEN UPDATE SET ts = s.ts, payload = s.payload,
        val = s.val, score = s.score""", "WITH SCHEMA EVOLUTION")
    // UPDATE/INSERT evolving different column sets refuse
    refuses("""
      MERGE WITH SCHEMA EVOLUTION INTO jcat.mev AS t USING mev_src AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN MATCHED THEN UPDATE SET ts = s.ts, payload = s.payload,
        val = s.val, score = s.score
      WHEN NOT MATCHED THEN INSERT (ns, ukey, ts, payload, val)
        VALUES (s.ns, s.ukey, s.ts, s.payload, s.val)""", "SAME column set")
    // star with evolution maps every source column by name; key 1's
    // payload is unchanged but its score is NEW — the row must land
    // (extras join the no-op decision)
    spark.sql("""
      MERGE WITH SCHEMA EVOLUTION INTO jcat.mev AS t USING mev_src AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val store = graft.journal.JournalStore.open(spark, s"$root/mev")
    def state() = store.scanUnordered()
      .groupBy("ukey").agg(max(struct(col("seq"), col("payload"),
        col("score"))).as("t"))
      .select(col("ukey"), col("t.payload"), col("t.score"))
      .as[(Long, String, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(state() === Seq((1L, "pa", Some(0.9)), (2L, "pb", None),
      (3L, "pc", Some(0.3))))
    // re-merging the identical source is a complete no-op now that
    // payload AND score both match current state
    val maxBefore = store.manifest.maxSeq
    spark.sql("""
      MERGE WITH SCHEMA EVOLUTION INTO jcat.mev AS t USING mev_src AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(store.manifest.maxSeq === maxBefore,
      "an identical re-merge must suppress every row as no-op")
  }}

  test("journal_catalog: batch CDC by table name — " +
      "option(changeFeed).table(...) reads the NET version diff") {
    withCatalog { root =>
      spark.sql("CREATE TABLE jcat.cdft (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
        "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
      val store = graft.journal.JournalStore.open(spark, s"$root/cdft")
      Seq(("a", 1L, graft.TestSpark.ts("2024-01-01 00:00:01"), "p1", 1.0),
          ("a", 2L, graft.TestSpark.ts("2024-01-01 00:00:02"), "p2", 2.0))
        .toDF("ns", "ukey", "ts", "payload", "val")
        .write.format("journal").mode("append").save(s"$root/cdft")
      val v1 = store.manifest.version
      store.append(Seq(
        ("a", 3L, graft.TestSpark.ts("2024-01-02 00:00:03"), "p3", 3.0))
        .toDF("ns", "ukey", "ts", "payload", "val"))
      store.deleteWhereDv(col("ukey") === 1L)
      val v2 = store.manifest.version
      val got = spark.read
        .option("changeFeed", "true")
        .option("fromVersion", v1).option("toVersion", v2)
        .table("jcat.cdft")
        .select("_change_type", "ukey", "payload")
        .as[(String, Long, String)].collect().toSeq.sorted
      assert(got === Seq(("delete", 1L, "p1"), ("insert", 3L, "p3")))
      // fromVersion is mandatory by name (a live feed streams via path)
      val e = intercept[Exception](spark.read
        .option("changeFeed", "true").table("jcat.cdft").collect())
      assert(Option(e.getMessage).exists(_.contains("fromVersion")),
        e.getMessage)
    }
  }

  test("journal_catalog: two sessions-worth of metadata is just the directory") {
    withCatalog { root =>
      // a store created through the PATH api is immediately visible as a
      // catalog table (no metastore to sync) — the manifest is the
      // existence marker
      Seq(("a", 1L, graft.TestSpark.ts("2024-01-01 00:00:01"), "p", 1.0))
        .toDF("ns", "ukey", "ts", "payload", "val")
        .write.format("journal").save(s"$root/ext")
      assert(spark.sql("SELECT count(*) FROM jcat.ext").as[Long].head() === 1L)
      // rename is a directory move (the TO name is catalog-relative)
      spark.sql("ALTER TABLE jcat.ext RENAME TO ext2")
      assert(!graft.journal.JournalStore.exists(s"$root/ext"))
      assert(spark.sql("SELECT count(*) FROM jcat.ext2").as[Long].head() === 1L)
    }
  }

  test("SQL DELETE FROM physically erases through the store's deleteWhere") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.gdpr (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '2')")
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO jcat.gdpr SELECT 'users' AS ns, " +
        s"CAST($i AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:0$i' AS ts, " +
        s"'p$i' AS payload, CAST($i.0 AS DOUBLE) AS val")
    }
    // equality delete (the GDPR shape) — pruned via manifest key stats
    spark.sql("DELETE FROM jcat.gdpr WHERE ukey = 1")
    assert(spark.sql("SELECT count(*) FROM jcat.gdpr").as[Long].head() === 2L)
    assert(spark.sql("SELECT count(*) FROM jcat.gdpr WHERE ukey = 1")
      .as[Long].head() === 0L)
    // the erase is PHYSICAL: the store's raw history no longer holds the
    // key either (not a tombstone — contrast store.delete())
    val store = graft.journal.JournalStore.open(spark, s"$root/gdpr")
    assert(store.scan().where(col("ukey") === 1L).count() === 0)
    // retained rows keep their seqs — erasure never renumbers history
    assert(spark.sql("SELECT seq FROM jcat.gdpr ORDER BY seq")
      .as[Long].collect().toSeq === Seq(0L, 2L))
    // arbitrary predicate deletes work too (no-pruning fallback path)
    spark.sql("DELETE FROM jcat.gdpr WHERE val > 1.5")
    assert(spark.sql("SELECT ukey FROM jcat.gdpr").as[Long].collect().toSeq === Seq(0L))
    // a version-pinned table refuses DELETE: pin a reader, not an eraser
    val err = intercept[Exception] {
      spark.sql("DELETE FROM jcat.gdpr VERSION AS OF 1 WHERE ukey = 0")
    }
    assert(err.getMessage != null)
  }}

  test("CALL lifecycle procedures: checkpoint, zorder, purge_deletes, " +
      "constraints and set_property maintain the store by SQL") {
    withCatalog { root =>
      spark.sql("CREATE TABLE jcat.lc (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
        "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
      spark.sql("INSERT INTO jcat.lc SELECT 'a' AS ns, CAST(id AS BIGINT) AS ukey, " +
        "TIMESTAMP '2024-01-01 00:00:00' AS ts, concat('p', id) AS payload, " +
        "CAST(id AS DOUBLE) AS val FROM range(60)")
      def store = graft.journal.JournalStore.open(spark, s"$root/lc")
      // checkpoint at the current high water: future state reads replay
      // only the tail after it
      spark.sql("CALL jcat.system.checkpoint(table => 'lc')")
      assert(store.manifest.checkpoints.nonEmpty)
      // constraint gate by SQL: a violating insert refuses atomically,
      // drop lifts the gate
      spark.sql("CALL jcat.system.add_constraint(table => 'lc', " +
        "name => 'val_nonneg', expr => 'val >= 0')")
      val bad = intercept[Exception] {
        spark.sql("INSERT INTO jcat.lc SELECT 'a' AS ns, CAST(-1 AS BIGINT) " +
          "AS ukey, TIMESTAMP '2024-01-01 00:01:00' AS ts, 'neg' AS payload, " +
          "CAST(-5.0 AS DOUBLE) AS val")
      }
      assert(bad.getMessage.contains("val_nonneg") ||
        Option(bad.getCause).exists(_.getMessage.contains("val_nonneg")), bad)
      assert(spark.sql("SELECT count(*) FROM jcat.lc").as[Long].head() === 60L)
      spark.sql("CALL jcat.system.drop_constraint(table => 'lc', " +
        "name => 'val_nonneg')")
      spark.sql("INSERT INTO jcat.lc SELECT 'a' AS ns, CAST(-1 AS BIGINT) " +
        "AS ukey, TIMESTAMP '2024-01-01 00:01:00' AS ts, 'neg' AS payload, " +
        "CAST(-5.0 AS DOUBLE) AS val")
      assert(spark.sql("SELECT count(*) FROM jcat.lc").as[Long].head() === 61L)
      // dv delete + purge by SQL: every file past the threshold rewrites,
      // its vector entries drop, rows stay subtracted
      spark.conf.set("spark.graft.journal.deleteMode", "dv")
      try spark.sql("DELETE FROM jcat.lc WHERE ukey >= 50")
      finally spark.conf.unset("spark.graft.journal.deleteMode")
      assert(store.manifest.dvParts.nonEmpty)
      spark.sql("CALL jcat.system.purge_deletes(table => 'lc', " +
        "min_dead_fraction => 0.01)")
      assert(store.manifest.dvParts.isEmpty)
      assert(spark.sql("SELECT count(*) FROM jcat.lc").as[Long].head() === 51L)
      // zorder rewrite by SQL preserves content
      spark.sql("CALL jcat.system.zorder(table => 'lc', columns => 'ukey,val')")
      assert(spark.sql("SELECT count(*) FROM jcat.lc").as[Long].head() === 51L)
      assert(spark.sql("SELECT payload FROM jcat.lc WHERE ukey = 7")
        .as[String].head() === "p7")
      // property by SQL, visible on reopen
      spark.sql("CALL jcat.system.set_property(table => 'lc', " +
        "key => 'owner', value => 'pipeline-b')")
      assert(store.manifest.meta.get("owner").contains("pipeline-b"))
      spark.sql("DROP TABLE jcat.lc")
    }
  }

  test("nsGrouped as a TABLE PROPERTY: pure-SQL grouped aggregation " +
      "plans zero exchanges") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.nsg (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '20')")
    spark.sql("INSERT INTO jcat.nsg SELECT concat('s', id % 3) AS ns, " +
      "CAST(id % 7 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:00' AS ts, " +
      "concat('p', id) AS payload, CAST(id AS DOUBLE) AS val FROM range(60)")
    // a SQL-only consumer flips the property once; every later SELECT
    // plans storage-partitioned — no reader options anywhere
    spark.sql("CALL jcat.system.set_property(table => 'nsg', " +
      "key => 'nsGrouped', value => 'true')")
    val saved = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val df = spark.sql(
        "SELECT ns, ukey, max(seq) AS last_seq FROM jcat.nsg GROUP BY ns, ukey")
      assert(df.collect().length === 21) // 3 ns × 7 keys
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        "property-driven grouped agg must not shuffle:\n" + p)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
      case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
    spark.sql("DROP TABLE jcat.nsg")
  }}

  test("CALL system.refresh_rollup maintains a rollup table by SQL — " +
      "incremental after mutations, equal to a recompute") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.rsrc (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
    spark.sql("CREATE TABLE jcat.rdst (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
    spark.sql("INSERT INTO jcat.rsrc SELECT concat('s', id % 3) AS ns, " +
      "CAST(id AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:00' AS ts, " +
      "concat('p', id) AS payload, CAST(id AS DOUBLE) AS val FROM range(30)")
    def call() = spark.sql("CALL jcat.system.refresh_rollup(" +
      "source => 'rsrc', rollup => 'rdst', keys => 'ns', sums => 'val')")
    call()
    // the rollup is an ordinary journal table — readable by plain SQL
    // the rollup table is a journal LOG — reconstruct state the usual
    // way (arg-max by seq, tombstones = dead groups drop out)
    def rollup(): Map[String, (Long, Double)] =
      spark.sql("SELECT ns, " +
        "CAST(get_json_object(p, '$.n') AS BIGINT) AS n, " +
        "CAST(get_json_object(p, '$.val') AS DOUBLE) AS v FROM (" +
        "SELECT ns, max_by(payload, seq) AS p FROM jcat.rdst " +
        "WHERE ns LIKE '{%' GROUP BY ns) WHERE p IS NOT NULL")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
    val r1 = rollup()
    assert(r1.size === 3 && r1("""{"ns":"s0"}""")._1 === 10L)
    // mutate: append + SQL DELETE of a namespace, refresh incrementally
    spark.sql("INSERT INTO jcat.rsrc SELECT 's3' AS ns, " +
      "CAST(100 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:01' AS ts, " +
      "'px' AS payload, CAST(7.5 AS DOUBLE) AS val")
    spark.conf.set("spark.graft.journal.deleteMode", "dv")
    try spark.sql("DELETE FROM jcat.rsrc WHERE ns = 's1'")
    finally spark.conf.unset("spark.graft.journal.deleteMode")
    call()
    val r2 = rollup()
    assert(!r2.contains("""{"ns":"s1"}"""), r2.keys) // dead group deleted
    assert(r2("""{"ns":"s3"}""") === ((1L, 7.5)))
    assert(r2("""{"ns":"s0"}""") === r1("""{"ns":"s0"}""")) // untouched
    spark.sql("DROP TABLE jcat.rsrc"); spark.sql("DROP TABLE jcat.rdst")
  }}

  test("CALL system.restore rolls a table back by SQL") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.rst (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
    spark.sql("INSERT INTO jcat.rst SELECT 'users' AS ns, " +
      "CAST(1 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:00' AS ts, " +
      "'p1' AS payload, CAST(1.0 AS DOUBLE) AS val")
    val v = graft.journal.JournalStore.open(spark, s"$root/rst").manifest.version
    spark.sql("INSERT INTO jcat.rst SELECT 'users' AS ns, " +
      "CAST(2 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:01' AS ts, " +
      "'p2' AS payload, CAST(2.0 AS DOUBLE) AS val")
    assert(spark.sql("SELECT count(*) FROM jcat.rst").as[Long].head() === 2L)
    spark.sql(s"CALL jcat.system.restore(table => 'rst', version => $v)")
    assert(spark.sql("SELECT ukey FROM jcat.rst").as[Long].collect().toSeq
      === Seq(1L))
  }}

  test("SQL DELETE in dv mode records a deletion vector instead of " +
      "rewriting segments") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.dvdel (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
    // two rows per commit → two rows per segment file, so a single-key
    // delete leaves a live row behind and must go through a VECTOR (a
    // fully-dead file would just leave the manifest)
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO jcat.dvdel SELECT 'users' AS ns, " +
        s"CAST($i AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:0$i' AS ts, " +
        s"'p$i' AS payload, CAST($i.0 AS DOUBLE) AS val UNION ALL " +
        s"SELECT 'users', CAST(${i + 10} AS BIGINT), " +
        s"TIMESTAMP '2024-01-01 00:01:0$i', 'q$i', CAST(${i + 10}.0 AS DOUBLE)")
    }
    val store = graft.journal.JournalStore.open(spark, s"$root/dvdel")
    val filesBefore = store.manifest.files.sorted
    spark.conf.set("spark.graft.journal.deleteMode", "dv")
    try spark.sql("DELETE FROM jcat.dvdel WHERE ukey = 1")
    finally spark.conf.unset("spark.graft.journal.deleteMode")
    val m = store.manifest
    // vector recorded, nothing rewritten, reads subtract — including the
    // catalog read itself (the V1Scan fallback)
    assert(m.dvParts.nonEmpty)
    assert(m.files.sorted === filesBefore)
    assert(store.scan().where(col("ukey") === 1L).count() === 0)
    assert(spark.sql("SELECT count(*) FROM jcat.dvdel").as[Long].head() === 5L)
    assert(spark.sql("SELECT ukey FROM jcat.dvdel ORDER BY ukey")
      .as[Long].collect().toSeq === Seq(0L, 2L, 10L, 11L, 12L))
    // without the conf the same statement rewrites its touched file;
    // ukey=1's vector rides an UNTOUCHED file and survives until purge
    spark.sql("DELETE FROM jcat.dvdel WHERE ukey = 2")
    assert(spark.sql("SELECT ukey FROM jcat.dvdel ORDER BY ukey")
      .as[Long].collect().toSeq === Seq(0L, 10L, 11L, 12L))
    assert(store.manifest.dvParts.nonEmpty)
    // compacting the epoch materializes the subtraction and clears it
    store.compact(upToEpoch = 100L, clusterByKey = true)
    assert(store.manifest.dvParts.isEmpty)
    assert(spark.sql("SELECT ukey FROM jcat.dvdel ORDER BY ukey")
      .as[Long].collect().toSeq === Seq(0L, 10L, 11L, 12L))
  }}

  test("TRUNCATE TABLE physically empties the store (SupportsDelete truncate path)") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.trunc (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '2')")
    spark.sql("INSERT INTO jcat.trunc SELECT 'users' AS ns, " +
      "CAST(1 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:01' AS ts, " +
      "'p0' AS payload, CAST(1.0 AS DOUBLE) AS val")
    spark.sql("TRUNCATE TABLE jcat.trunc")
    assert(spark.sql("SELECT count(*) FROM jcat.trunc").as[Long].head() === 0L)
    assert(graft.journal.JournalStore.open(spark, s"$root/trunc").scan().count() === 0)
  }}

  test("SQL MERGE INTO routes through the store's merge: delete, " +
      "update, insert clauses with no-op suppression") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.msql (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
    Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-01 00:00:01"), "pa", 1.0),
      ("users", 2L, graft.TestSpark.ts("2024-01-01 00:00:02"), "pb", 1.0),
      ("users", 3L, graft.TestSpark.ts("2024-01-01 00:00:03"), "px", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .write.format("journal").mode("append").save(s"$root/msql")
    Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-02 00:00:01"), "pa", 9.0),   // no-op: payload unchanged
      ("users", 2L, graft.TestSpark.ts("2024-01-02 00:00:02"), "pb2", 1.0),  // update
      ("users", 3L, graft.TestSpark.ts("2024-01-02 00:00:03"), "dd", -5.0),  // delete (val < 0)
      ("users", 4L, graft.TestSpark.ts("2024-01-02 00:00:04"), "pc", 1.0))   // insert
      .toDF("ns", "ukey", "ts", "payload", "val").createOrReplaceTempView("msrc")
    val res = spark.sql("""
      MERGE INTO jcat.msql AS t USING msrc AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN MATCHED AND s.val < 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET ts = s.ts, payload = s.payload, val = s.val
      WHEN NOT MATCHED THEN INSERT (ns, ukey, ts, payload, val)
        VALUES (s.ns, s.ukey, s.ts, s.payload, s.val)""")
    // update + tombstone + insert landed; the no-op was suppressed
    assert(res.as[Long].head() === 3L)
    val got = graft.journal.JournalStore.open(spark, s"$root/msql")
      .latest().select("ukey", "payload")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(got === Seq((1L, "pa"), (2L, "pb2"), (4L, "pc")))
    // idempotent re-run: everything now matches state → zero rows append
    val again = spark.sql("""
      MERGE INTO jcat.msql AS t USING msrc AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN MATCHED AND s.val < 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET ts = s.ts, payload = s.payload, val = s.val
      WHEN NOT MATCHED THEN INSERT (ns, ukey, ts, payload, val)
        VALUES (s.ns, s.ukey, s.ts, s.payload, s.val)""")
    // NOT fully idempotent by SQL semantics: key 3 is now unmatched
    // (tombstoned), so the INSERT clause re-inserts it — the one row
    assert(again.as[Long].head() === 1L)
  }}

  test("SQL MERGE INTO clause subsets: delete-only and insert-only " +
      "leave the other routes untouched; unsupported shapes refuse " +
      "precisely") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.msub (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
    Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-01 00:00:01"), "pa", 1.0),
      ("users", 2L, graft.TestSpark.ts("2024-01-01 00:00:02"), "pb", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .write.format("journal").mode("append").save(s"$root/msub")
    Seq(
      ("users", 2L, graft.TestSpark.ts("2024-01-02 00:00:02"), "zz", 1.0),
      ("users", 5L, graft.TestSpark.ts("2024-01-02 00:00:05"), "p5", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val").createOrReplaceTempView("msub_src")
    // delete-only: matched-but-not-deleted rows and unmatched source
    // rows are both left alone (no implicit upsert, no implicit insert)
    spark.sql("""
      MERGE INTO jcat.msub AS t USING msub_src AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN MATCHED THEN DELETE""")
    def live() = graft.journal.JournalStore.open(spark, s"$root/msub")
      .latest().select("ukey", "payload")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(live() === Seq((1L, "pa"))) // 2 deleted; 5 NOT inserted
    // insert-only: matched rows never update
    Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-03 00:00:01"), "CHANGED", 1.0),
      ("users", 7L, graft.TestSpark.ts("2024-01-03 00:00:07"), "p7", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val").createOrReplaceTempView("msub_src2")
    spark.sql("""
      MERGE INTO jcat.msub AS t USING msub_src2 AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN NOT MATCHED THEN INSERT (ns, ukey, ts, payload, val)
        VALUES (s.ns, s.ukey, s.ts, s.payload, s.val)""")
    assert(live() === Seq((1L, "pa"), (7L, "p7"))) // 1 untouched, 7 inserted
    // unsupported shapes refuse with precise errors
    def refuses(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(Option(e.getMessage).exists(_.contains(frag)),
        s"expected '$frag' in: ${e.getMessage}")
    }
    refuses("""
      MERGE INTO jcat.msub AS t USING msub_src2 AS s
      ON t.ns = s.ns AND t.ukey = s.ukey AND t.val > s.val
      WHEN MATCHED THEN DELETE""", "ns/ukey")
    refuses("""
      MERGE INTO jcat.msub AS t USING msub_src2 AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET ukey = 0""",
      "reassign join key")
    // a target ts/val reference in a gate is SUPPORTED (it widens state
    // reconstruction to the full record): here every state key is in
    // the source, so the gated complement is empty and nothing changes
    spark.sql("""
      MERGE INTO jcat.msub AS t USING msub_src2 AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN NOT MATCHED BY SOURCE AND t.val > 0 THEN DELETE""")
    assert(live() === Seq((1L, "pa"), (7L, "p7")))
    // a truly unknown target column still refuses precisely
    refuses("""
      MERGE INTO jcat.msub AS t USING msub_src2 AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN NOT MATCHED BY SOURCE AND t.seq > 0 THEN DELETE""",
      "carries no")
  }}

  test("SQL MERGE WHEN NOT MATCHED BY SOURCE THEN UPDATE: absent keys " +
      "rewrite through target-scope assignments, unassigned columns " +
      "ride current values, first-match-wins with DELETE") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.msup (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
    Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-01 00:00:01"), "pa", 1.0),
      ("users", 2L, graft.TestSpark.ts("2024-01-01 00:00:02"), "pb", 2.0),
      ("users", 3L, graft.TestSpark.ts("2024-01-01 00:00:03"), "pc", 3.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .write.format("journal").mode("append").save(s"$root/msup")
    Seq(("users", 1L, graft.TestSpark.ts("2024-01-02 00:00:01"), "UP1", 10.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .createOrReplaceTempView("msup_src")
    // key 1 matches (upserts); keys 2 and 3 are absent from the source —
    // 2 (val < 3) marks stale via the UPDATE gate, 3 falls through to
    // the conditional DELETE (first-match-wins)
    spark.sql("""
      MERGE INTO jcat.msup AS t USING msup_src AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN MATCHED THEN UPDATE SET ts = s.ts, payload = s.payload, val = s.val
      WHEN NOT MATCHED BY SOURCE AND t.val < 3.0
        THEN UPDATE SET payload = concat(t.payload, ':stale'), val = t.val + 100
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    val store = graft.journal.JournalStore.open(spark, s"$root/msup")
    val got = store.latest().orderBy("ukey")
      .select("ukey", "payload").as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "UP1"), (2L, "pb:stale")))
    // the stale rewrite carried current ts and assigned val: full-record
    // semantics over the reconstructed state
    val row2 = store.scanUnordered().where(col("ukey") === 2L)
      .orderBy(col("seq").desc).limit(1)
      .select(col("val"), col("ts").cast("string"))
      .as[(Double, String)].head()
    assert(row2._1 === 102.0)
    assert(row2._2.startsWith("2024-01-01"), row2._2) // rode current ts
  }}

  test("SQL MERGE conditional clauses: matched UPDATE gates, " +
      "first-match-wins with DELETE, NOT MATCHED BY SOURCE deletes " +
      "the gated complement") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.mcond (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
    Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-01 00:00:01"), "pa", 1.0),
      ("users", 2L, graft.TestSpark.ts("2024-01-01 00:00:02"), "pb", 2.0),
      ("users", 3L, graft.TestSpark.ts("2024-01-01 00:00:03"), "pc", 3.0),
      ("users", 4L, graft.TestSpark.ts("2024-01-01 00:00:04"), "pd", 4.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .write.format("journal").mode("append").save(s"$root/mcond")
    def live() = graft.journal.JournalStore.open(spark, s"$root/mcond")
      .latest().select("ukey", "payload")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    // conditional UPDATE: only gate-passing matches rewrite; gate-failing
    // matches keep current state; unmatched keys insert
    Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-02 00:00:01"), "UP1", 10.0),
      ("users", 2L, graft.TestSpark.ts("2024-01-02 00:00:02"), "UP2", -1.0),
      ("users", 9L, graft.TestSpark.ts("2024-01-02 00:00:09"), "p9", -5.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .createOrReplaceTempView("mcond_src")
    spark.sql("""
      MERGE INTO jcat.mcond AS t USING mcond_src AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN MATCHED AND s.val > 0 THEN UPDATE SET ts = s.ts,
        payload = s.payload, val = s.val
      WHEN NOT MATCHED THEN INSERT (ns, ukey, ts, payload, val)
        VALUES (s.ns, s.ukey, s.ts, s.payload, s.val)""")
    assert(live() === Seq((1L, "UP1"), (2L, "pb"), (3L, "pc"), (4L, "pd"),
      (9L, "p9")))
    // first-match-wins: conditional UPDATE before DELETE — gate-passing
    // rows update, the rest fall through to the (conditional) DELETE;
    // a target-side reference in the gate sees current payload
    Seq(
      ("users", 3L, graft.TestSpark.ts("2024-01-03 00:00:03"), "UP3", 7.0),
      ("users", 4L, graft.TestSpark.ts("2024-01-03 00:00:04"), "x", -2.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .createOrReplaceTempView("mcond_src2")
    spark.sql("""
      MERGE INTO jcat.mcond AS t USING mcond_src2 AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN MATCHED AND s.val > 0 AND t.payload != 'never'
        THEN UPDATE SET ts = s.ts, payload = s.payload, val = s.val
      WHEN MATCHED THEN DELETE""")
    assert(live() === Seq((1L, "UP1"), (2L, "pb"), (3L, "UP3"), (9L, "p9")))
    // NOT MATCHED BY SOURCE: state keys absent from the source tombstone
    // through the target-side gate; present keys upsert
    Seq(("users", 1L, graft.TestSpark.ts("2024-01-04 00:00:01"), "KEEP1", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .createOrReplaceTempView("mcond_src3")
    spark.sql("""
      MERGE INTO jcat.mcond AS t USING mcond_src3 AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN MATCHED THEN UPDATE SET ts = s.ts, payload = s.payload, val = s.val
      WHEN NOT MATCHED BY SOURCE AND t.ukey < 9 THEN DELETE""")
    // 2, 3 die (absent + ukey < 9); 9 survives the gate; 1 upserts
    assert(live() === Seq((1L, "KEEP1"), (9L, "p9")))
    // bySource-only merge: no matched/insert clauses at all — the
    // statement's ONLY product is the gated complement tombstones
    Seq(("users", 9L)).toDF("ns", "ukey").createOrReplaceTempView("mcond_src4")
    spark.sql("""
      MERGE INTO jcat.mcond AS t USING mcond_src4 AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(live() === Seq((9L, "p9")))
    // conditional INSERT: gate-failing (and NULL-gate) unmatched source
    // rows are dropped, never inserted
    Seq(
      ("users", 20L, graft.TestSpark.ts("2024-01-05 00:00:20"), "p20", 5.0),
      ("users", 21L, graft.TestSpark.ts("2024-01-05 00:00:21"), "p21", -1.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .createOrReplaceTempView("mcond_src5")
    spark.sql("""
      MERGE INTO jcat.mcond AS t USING mcond_src5 AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN NOT MATCHED AND s.val > 0 THEN INSERT (ns, ukey, ts, payload, val)
        VALUES (s.ns, s.ukey, s.ts, s.payload, s.val)""")
    assert(live() === Seq((9L, "p9"), (20L, "p20")))
  }}

  test("SQL MERGE N-clause chains: ≥3 conditional WHEN MATCHED UPDATEs " +
      "first-match-wins, per-clause values, differing INSERT values, " +
      "t.ts late-arrival guard, N INSERT and N BY SOURCE clauses") {
    withCatalog { root =>
    spark.sql("CREATE TABLE jcat.mn (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
    Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-01 00:00:01"), "pa", 1.0),
      ("users", 2L, graft.TestSpark.ts("2024-01-01 00:00:02"), "pb", 2.0),
      ("users", 3L, graft.TestSpark.ts("2024-01-01 00:00:03"), "pc", 3.0),
      ("users", 4L, graft.TestSpark.ts("2024-01-01 00:00:04"), "pd", 4.0),
      ("users", 5L, graft.TestSpark.ts("2024-01-01 00:00:05"), "pe", 5.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .write.format("journal").mode("append").save(s"$root/mn")
    def live() = graft.journal.JournalStore.open(spark, s"$root/mn")
      .latest().select("ukey", "payload")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    // three conditional UPDATE clauses with DIFFERENT per-clause values,
    // a fall-through DELETE, and an INSERT whose values differ from
    // every UPDATE (the per-route carrier path): first-match-wins picks
    // exactly one band per key
    Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-02 00:00:01"), "u1", 150.0),
      ("users", 2L, graft.TestSpark.ts("2024-01-02 00:00:02"), "u2", 20.0),
      ("users", 3L, graft.TestSpark.ts("2024-01-02 00:00:03"), "u3", 5.0),
      ("users", 4L, graft.TestSpark.ts("2024-01-02 00:00:04"), "u4", -1.0),
      ("users", 30L, graft.TestSpark.ts("2024-01-02 00:00:30"), "u30", 7.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .createOrReplaceTempView("mn_src1")
    spark.sql("""
      MERGE INTO jcat.mn AS t USING mn_src1 AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN MATCHED AND s.val >= 100 THEN UPDATE SET ts = s.ts,
        payload = concat('hot:', s.payload), val = s.val
      WHEN MATCHED AND s.val >= 10 THEN UPDATE SET ts = s.ts,
        payload = concat('warm:', s.payload), val = s.val
      WHEN MATCHED AND s.val >= 0 THEN UPDATE SET ts = s.ts,
        payload = concat('cold:', s.payload), val = s.val
      WHEN MATCHED THEN DELETE
      WHEN NOT MATCHED THEN INSERT (ns, ukey, ts, payload, val)
        VALUES (s.ns, s.ukey, s.ts, concat('new:', s.payload), s.val)""")
    assert(live() === Seq((1L, "hot:u1"), (2L, "warm:u2"), (3L, "cold:u3"),
      (5L, "pe"), (30L, "new:u30")))
    // idempotence on the carrier path: re-merging the matched band keys
    // with the same clause chain is a complete no-op — the PER-CLAUSE
    // carrier values join the no-op comparison
    val st = graft.journal.JournalStore.open(spark, s"$root/mn")
    val seqBefore = st.manifest.maxSeq
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW mn_src1b AS
      SELECT * FROM mn_src1 WHERE ukey IN (1, 2, 3)""")
    spark.sql("""
      MERGE INTO jcat.mn AS t USING mn_src1b AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN MATCHED AND s.val >= 100 THEN UPDATE SET ts = s.ts,
        payload = concat('hot:', s.payload), val = s.val
      WHEN MATCHED AND s.val >= 10 THEN UPDATE SET ts = s.ts,
        payload = concat('warm:', s.payload), val = s.val
      WHEN MATCHED AND s.val >= 0 THEN UPDATE SET ts = s.ts,
        payload = concat('cold:', s.payload), val = s.val
      WHEN NOT MATCHED THEN INSERT (ns, ukey, ts, payload, val)
        VALUES (s.ns, s.ukey, s.ts, concat('new:', s.payload), s.val)""")
    assert(graft.journal.JournalStore.open(spark, s"$root/mn")
      .manifest.maxSeq === seqBefore,
      "identical N-clause re-merge must suppress every row as no-op")
    // the late-arrival guard (t.ts in a matched gate widens state to the
    // full record): a STALE source row must not overwrite newer state,
    // and the gate may read a source column that is not an assigned
    // carrier (s.tag rides a dedicated auto-carrier)
    Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-01 12:00:00"), "stale1", 1.0, "go"),
      ("users", 2L, graft.TestSpark.ts("2024-01-03 00:00:02"), "fresh2", 2.0, "go"),
      ("users", 3L, graft.TestSpark.ts("2024-01-03 00:00:03"), "held3", 3.0, "hold"))
      .toDF("ns", "ukey", "ts", "payload", "val", "tag")
      .createOrReplaceTempView("mn_src2")
    spark.sql("""
      MERGE INTO jcat.mn AS t USING mn_src2 AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN MATCHED AND t.ts < s.ts AND s.tag = 'go' THEN UPDATE SET
        ts = s.ts, payload = s.payload, val = s.val""")
    assert(live() === Seq((1L, "hot:u1"), (2L, "fresh2"), (3L, "cold:u3"),
      (5L, "pe"), (30L, "new:u30")))
    // N conditional INSERT clauses: a projection-time first-match CASE
    Seq(
      ("users", 40L, graft.TestSpark.ts("2024-01-04 00:00:40"), "i40", 100.0),
      ("users", 41L, graft.TestSpark.ts("2024-01-04 00:00:41"), "i41", 1.0),
      ("users", 42L, graft.TestSpark.ts("2024-01-04 00:00:42"), "i42", -9.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .createOrReplaceTempView("mn_src3")
    spark.sql("""
      MERGE INTO jcat.mn AS t USING mn_src3 AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN NOT MATCHED AND s.val >= 50 THEN INSERT (ns, ukey, ts, payload, val)
        VALUES (s.ns, s.ukey, s.ts, concat('big:', s.payload), s.val)
      WHEN NOT MATCHED AND s.val >= 0 THEN INSERT (ns, ukey, ts, payload, val)
        VALUES (s.ns, s.ukey, s.ts, concat('small:', s.payload), s.val)""")
    assert(live() === Seq((1L, "hot:u1"), (2L, "fresh2"), (3L, "cold:u3"),
      (5L, "pe"), (30L, "new:u30"), (40L, "big:i40"), (41L, "small:i41")))
    // N BY SOURCE clauses: gated UPDATE chain + fall-through DELETE over
    // the state complement
    Seq(("users", 40L, graft.TestSpark.ts("2024-01-05 00:00:40"), "k40", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .createOrReplaceTempView("mn_src4")
    spark.sql("""
      MERGE INTO jcat.mn AS t USING mn_src4 AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN MATCHED THEN UPDATE SET ts = s.ts, payload = s.payload, val = s.val
      WHEN NOT MATCHED BY SOURCE AND t.ukey < 3
        THEN UPDATE SET payload = concat(t.payload, ':old')
      WHEN NOT MATCHED BY SOURCE AND t.ukey < 30
        THEN UPDATE SET payload = concat(t.payload, ':mid')
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(live() === Seq((1L, "hot:u1:old"), (2L, "fresh2:old"),
      (3L, "cold:u3:mid"), (5L, "pe:mid"), (40L, "k40")))
  }}

  test("SQL MERGE N-clause x SCHEMA EVOLUTION: per-clause evolved " +
      "values ride carriers; mismatched evolve sets refuse precisely") {
    withCatalog { root =>
    spark.sql("CREATE TABLE jcat.mne (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
    Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-01 00:00:01"), "pa", 1.0),
      ("users", 2L, graft.TestSpark.ts("2024-01-01 00:00:02"), "pb", 2.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .write.format("journal").mode("append").save(s"$root/mne")
    Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-02 00:00:01"), "u1", 9.0),
      ("users", 2L, graft.TestSpark.ts("2024-01-02 00:00:02"), "u2", 1.0),
      ("users", 9L, graft.TestSpark.ts("2024-01-02 00:00:09"), "u9", 3.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .createOrReplaceTempView("mne_src")
    // two conditional UPDATE clauses evolving the SAME new column with
    // DIFFERENT values, plus an INSERT evolving it a third way — every
    // route's evolved value rides its own carrier
    spark.sql("""
      MERGE WITH SCHEMA EVOLUTION INTO jcat.mne AS t USING mne_src AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN MATCHED AND s.val >= 5 THEN UPDATE SET ts = s.ts,
        payload = s.payload, val = s.val, score = s.val * 10
      WHEN MATCHED THEN UPDATE SET ts = s.ts,
        payload = s.payload, val = s.val, score = s.val * 100
      WHEN NOT MATCHED THEN INSERT (ns, ukey, ts, payload, val, score)
        VALUES (s.ns, s.ukey, s.ts, s.payload, s.val, s.val * 1000)""")
    val got = graft.journal.JournalStore.open(spark, s"$root/mne")
      .scanUnordered().groupBy("ns", "ukey")
      .agg(max(struct(col("seq"), col("payload"), col("score"))).as("top"))
      .select(col("ukey"), col("top.payload").as("payload"),
        col("top.score").as("score"))
      .where(col("payload").isNotNull)
      .orderBy("ukey").as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "u1", 90.0), (2L, "u2", 100.0),
      (9L, "u9", 3000.0)))
    // clauses evolving DIFFERENT column sets refuse with the set diff
    val e = intercept[Exception](spark.sql("""
      MERGE WITH SCHEMA EVOLUTION INTO jcat.mne AS t USING mne_src AS s
      ON t.ns = s.ns AND t.ukey = s.ukey
      WHEN MATCHED AND s.val >= 5 THEN UPDATE SET ts = s.ts,
        payload = s.payload, val = s.val, extra_a = s.val
      WHEN MATCHED THEN UPDATE SET ts = s.ts,
        payload = s.payload, val = s.val, extra_b = s.val"""))
    assert(Option(e.getMessage).exists(_.contains("SAME column set")),
      e.getMessage)
  }}

  test("SQL UPDATE rewrites current state through append: assignments " +
      "see target columns, the count is the matched-row count") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.usql (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
    Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-01 00:00:01"), "pa", 1.0),
      ("users", 2L, graft.TestSpark.ts("2024-01-01 00:00:02"), "pb", 2.0),
      ("carts", 3L, graft.TestSpark.ts("2024-01-01 00:00:03"), "pc", 3.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .write.format("journal").mode("append").save(s"$root/usql")
    val res = spark.sql(
      "UPDATE jcat.usql SET val = val * 10, payload = concat(payload, '!') " +
        "WHERE ns = 'users'")
    assert(res.as[Long].head() === 2L)
    // current full-row state = per-key argmax by seq over the table
    val got = spark.sql("""
      SELECT ukey, payload, val FROM (
        SELECT *, row_number() OVER (PARTITION BY ns, ukey ORDER BY seq DESC) rn
        FROM jcat.usql) WHERE rn = 1 ORDER BY ukey""")
      .as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "pa!", 10.0), (2L, "pb!", 20.0), (3L, "pc", 3.0)))
    // history is preserved — UPDATE appends state, never rewrites it
    assert(graft.journal.JournalStore.open(spark, s"$root/usql")
      .scan().count() === 5L)
    // engine/key columns refuse assignment
    val e = intercept[Exception](
      spark.sql("UPDATE jcat.usql SET ukey = ukey + 1 WHERE ns = 'users'"))
    assert(Option(e.getMessage).exists(_.contains("reassign")))
  }}

  test("CALL system.history RETURNS rows: one per retained version, " +
    "op labels and seq high water in commit order") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.hist (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
    spark.sql("INSERT INTO jcat.hist SELECT 'users' AS ns, " +
      "CAST(1 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:01' AS ts, " +
      "'p0' AS payload, CAST(1.0 AS DOUBLE) AS val")
    spark.sql("INSERT INTO jcat.hist SELECT 'users' AS ns, " +
      "CAST(2 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:02' AS ts, " +
      "'p1' AS payload, CAST(2.0 AS DOUBLE) AS val")
    spark.sql("DELETE FROM jcat.hist WHERE ukey = 1")
    val rows = spark.sql("CALL jcat.system.history(table => 'hist')")
      .orderBy("version")
      .select("version", "op", "max_seq")
      .as[(Long, String, Long)].collect().toSeq
    // retained version numbers are 1-based (writeManifest bumps at commit)
    assert(rows === Seq((1L, "create", -1L), (2L, "append", 0L),
      (3L, "append", 1L), (4L, "delete", 1L)))
    // commit wall clock rides along and is monotone non-decreasing
    val ts = spark.sql("CALL jcat.system.history(table => 'hist')")
      .orderBy("version").select("commit_ts_ms").as[Long].collect().toSeq
    assert(ts.zip(ts.tail).forall { case (a, b) => a <= b })
    // the Scala API serves the identical frame
    val api = graft.journal.JournalStore.open(spark, s"$root/hist")
      .commitHistory().select("version", "op", "max_seq")
      .as[(Long, String, Long)].collect().toSeq
    assert(api === rows)
  }}

  test("CALL system.analyze RETURNS the recorded column stats and arms " +
    "the scan's CBO report; a write stales it") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.anl (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
    spark.sql("INSERT INTO jcat.anl SELECT * FROM VALUES " +
      "('users', CAST(1 AS BIGINT), TIMESTAMP '2024-01-01 00:00:01', 'p0', CAST(1.0 AS DOUBLE)), " +
      "('users', CAST(2 AS BIGINT), TIMESTAMP '2024-01-01 00:00:02', 'p1', CAST(2.0 AS DOUBLE)), " +
      "('carts', CAST(3 AS BIGINT), TIMESTAMP '2024-01-01 00:00:03', 'p2', CAST(NULL AS DOUBLE)) " +
      "AS t(ns, ukey, ts, payload, val)")
    val stats = spark.sql(
      "CALL jcat.system.analyze(table => 'anl', columns => 'ns, ukey, val')")
      .orderBy("col_name")
      .select("col_name", "n_rows", "n_nulls", "ndv", "vmin", "vmax")
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(stats === Seq(
      ("ns", 3L, 0L, 2L, "carts", "users"),
      ("ukey", 3L, 0L, 3L, "1", "3"),
      ("val", 3L, 1L, 2L, "1.0", "2.0")))
    // the by-name read serves the stats to the optimizer (CBO carries
    // them above the leaf), keyed on the live-row-count match
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      def attr = spark.table("jcat.anl").queryExecution
        .optimizedPlan.stats.attributeStats
        .map { case (a, s) => a.name -> s }
      assert(attr("ukey").distinctCount.map(_.toLong) === Some(3L))
      assert(attr("val").nullCount.map(_.toLong) === Some(1L))
      // an INSERT folds its batch sketch into the recorded stats (the
      // round-16 incremental ANALYZE) — the report survives the write
      // with merged values, no re-analyze
      spark.sql("INSERT INTO jcat.anl SELECT 'users' AS ns, " +
        "CAST(9 AS BIGINT) AS ukey, TIMESTAMP '2024-01-02 00:00:00' AS ts, " +
        "'p9' AS payload, CAST(9.0 AS DOUBLE) AS val")
      assert(attr("ukey").distinctCount.map(_.toLong) === Some(4L))
      assert(attr("ukey").max === Some(9L))
      assert(attr("val").nullCount.map(_.toLong) === Some(1L))
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
    // the analyze commit is first-class history
    val ops = spark.sql("CALL jcat.system.history(table => 'anl')")
      .orderBy("version").select("op").as[String].collect().toSeq
    assert(ops.contains("analyze"))
  }}

  test("column DEFAULTs: SET DEFAULT fills omitted INSERT columns and " +
    "absent append columns; old rows stay null; DROP DEFAULT reverts") {
    withCatalog { root =>
    spark.sql("CREATE TABLE jcat.dft (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
    // the table ACCEPTS_ANY_SCHEMA (system columns ride the schema), so
    // INSERT literals cast explicitly like every other catalog test
    def ins(n: Int, extraCols: String, extraVals: String): Unit =
      spark.sql(s"INSERT INTO jcat.dft (ns, ukey, ts, payload, val$extraCols) " +
        s"VALUES ('users', CAST($n AS BIGINT), " +
        s"TIMESTAMP '2024-01-01 00:00:0$n', 'p$n', " +
        s"CAST($n.0 AS DOUBLE)$extraVals)")
    ins(1, "", "")
    // evolve a column, then give it a write-time default
    spark.sql("ALTER TABLE jcat.dft ADD COLUMNS (tier STRING)")
    spark.sql("ALTER TABLE jcat.dft ALTER COLUMN tier SET DEFAULT 'bronze'")
    // INSERT omitting tier → Spark fills the current default
    ins(2, "", "")
    // the DEFAULT keyword resolves too
    ins(3, ", tier", ", DEFAULT")
    // an explicit value and an explicit NULL are both honored verbatim
    ins(4, ", tier", ", 'gold'")
    ins(5, ", tier", ", CAST(NULL AS STRING)")
    val got = spark.table("jcat.dft").orderBy("ukey")
      .select("ukey", "tier").as[(Long, String)].collect().toSeq
    // row 1 predates the column: write-time semantics keep it null
    assert(got === Seq((1L, null), (2L, "bronze"), (3L, "bronze"),
      (4L, "gold"), (5L, null)))
    // the Scala append path fills an ABSENT defaulted column the same way
    val store = graft.journal.JournalStore.open(spark, s"$root/dft")
    assert(store.columnDefaults === Map("tier" -> "'bronze'"))
    store.append(Seq(("users", 6L, graft.TestSpark.ts("2024-01-01 00:00:06"),
      "p5", 6.0)).toDF("ns", "ukey", "ts", "payload", "val"))
    assert(spark.table("jcat.dft").where($"ukey" === 6)
      .select("tier").as[String].head() === "bronze")
    // DROP DEFAULT: later omissions revert to null-fill
    spark.sql("ALTER TABLE jcat.dft ALTER COLUMN tier DROP DEFAULT")
    ins(7, "", "")
    assert(spark.table("jcat.dft").where($"ukey" === 7)
      .select("tier").as[String].head() === null)
    // a non-constant or non-castable default is refused at DDL time
    val e1 = intercept[Exception](spark.sql(
      "ALTER TABLE jcat.dft ALTER COLUMN val SET DEFAULT ukey + 1"))
    assert(e1.getMessage.toLowerCase.contains("default"))
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE jcat.dft ALTER COLUMN val SET DEFAULT 'nope'"))
    assert(e2.getMessage.toLowerCase.contains("default"))
    // CREATE-time defaults persist through the catalog too
    spark.sql("CREATE TABLE jcat.dft2 (ns STRING, ukey BIGINT, " +
      "ts TIMESTAMP, payload STRING, val DOUBLE DEFAULT 0.5) USING journal")
    assert(graft.journal.JournalStore.open(spark, s"$root/dft2")
      .columnDefaults === Map("val" -> "0.5"))
  }}

  test("GENERATED ALWAYS AS: the store computes omitted columns, " +
    "validates provided ones, rejects disagreement") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.gen (ns STRING, ukey BIGINT, " +
      "ts TIMESTAMP, payload STRING, val DOUBLE, " +
      "bucket BIGINT GENERATED ALWAYS AS (ukey % 8)) USING journal " +
      "OPTIONS (epochSize '100')")
    val store = graft.journal.JournalStore.open(spark, s"$root/gen")
    assert(store.generatedColumns === Map("bucket" -> "ukey % 8"))
    // a batch that omits the column gets it computed from its own rows
    store.append(Seq(
      ("users", 10L, graft.TestSpark.ts("2024-01-01 00:00:01"), "p0", 1.0),
      ("users", 13L, graft.TestSpark.ts("2024-01-01 00:00:02"), "p1", 2.0))
      .toDF("ns", "ukey", "ts", "payload", "val"))
    assert(spark.table("jcat.gen").orderBy("ukey")
      .select("ukey", "bucket").as[(Long, Long)].collect().toSeq ===
      Seq((10L, 2L), (13L, 5L)))
    // a batch PROVIDING agreeing values is accepted verbatim
    store.append(Seq(("users", 16L,
      graft.TestSpark.ts("2024-01-01 00:00:03"), "p2", 3.0, 0L))
      .toDF("ns", "ukey", "ts", "payload", "val", "bucket"))
    // ... and a disagreeing value rejects the whole batch atomically
    val before = spark.table("jcat.gen").count()
    val e = intercept[IllegalArgumentException] {
      store.append(Seq(("users", 17L,
        graft.TestSpark.ts("2024-01-01 00:00:04"), "p3", 4.0, 3L))
        .toDF("ns", "ukey", "ts", "payload", "val", "bucket"))
    }
    assert(e.getMessage.contains("generated column 'bucket'"))
    assert(spark.table("jcat.gen").count() === before)
  }}

  test("CALL system.restore(timestamp => ...): rolls to the newest " +
    "version committed at or before the bound") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.rts (ns STRING, ukey BIGINT, " +
      "ts TIMESTAMP, payload STRING, val DOUBLE) USING journal " +
      "OPTIONS (epochSize '100')")
    val store = graft.journal.JournalStore.open(spark, s"$root/rts")
    def one(k: Long) = Seq(("users", k,
      graft.TestSpark.ts("2024-01-01 00:00:01"), s"p$k", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
    store.append(one(1))
    val tsAfterFirst = graft.journal.JournalStore.open(spark, s"$root/rts")
      .manifest.commitTsMs
    Thread.sleep(5)
    store.append(one(2))
    assert(spark.table("jcat.rts").count() === 2)
    // the bound is exactly the first append's commit wall clock —
    // deterministic: restore lands on that version
    spark.sql(s"CALL jcat.system.restore(table => 'rts', " +
      s"timestamp => '${new java.sql.Timestamp(tsAfterFirst)}')")
    assert(spark.table("jcat.rts").select("ukey")
      .as[Long].collect().toSeq === Seq(1L))
    // exactly-one-arg contract
    val e = intercept[Exception](spark.sql(
      "CALL jcat.system.restore(table => 'rts')").collect())
    assert(e.getMessage.contains("exactly one"))
  }}

  test("CALL system.detail: one-row manifest-only operational summary") {
    withCatalog { root =>
    spark.sql("CREATE TABLE jcat.det (ns STRING, ukey BIGINT, " +
      "ts TIMESTAMP, payload STRING, val DOUBLE DEFAULT 0.0, " +
      "bucket BIGINT GENERATED ALWAYS AS (ukey % 4)) USING journal " +
      "OPTIONS (epochSize '2')")
    val store = graft.journal.JournalStore.open(spark, s"$root/det")
    store.append(Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-01 00:00:01"), "p0", 1.0),
      ("users", 2L, graft.TestSpark.ts("2024-01-01 00:00:02"), "p1", 2.0),
      ("carts", 3L, graft.TestSpark.ts("2024-01-01 00:00:03"), "p2", 3.0))
      .toDF("ns", "ukey", "ts", "payload", "val"))
    store.analyze(Seq("ukey"))
    val d = spark.sql("CALL jcat.system.detail(table => 'det')").collect()(0)
    assert(d.getAs[Long]("n_rows") === 3L)
    assert(d.getAs[Long]("max_seq") === 2L)
    assert(d.getAs[Long]("n_files") >= 2L) // multi-(epoch,ns) layout
    assert(d.getAs[Long]("size_bytes") > 0L)
    assert(d.getAs[Long]("n_defaults") === 1L)
    assert(d.getAs[Long]("n_generated") === 1L)
    assert(d.getAs[Long]("n_identity") === 0L)
    assert(d.getAs[Long]("analyzed_rows") === 3L)
  }}

  test("CALL system.expire erases rows older than the bound and " +
    "returns the count; newer rows survive") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.exp (ns STRING, ukey BIGINT, " +
      "ts TIMESTAMP, payload STRING, val DOUBLE) USING journal " +
      "OPTIONS (epochSize '100')")
    val store = graft.journal.JournalStore.open(spark, s"$root/exp")
    store.append(Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-01 00:00:01"), "old1", 1.0),
      ("users", 2L, graft.TestSpark.ts("2024-01-15 00:00:00"), "old2", 2.0),
      ("users", 3L, graft.TestSpark.ts("2024-02-01 00:00:00"), "new1", 3.0))
      .toDF("ns", "ukey", "ts", "payload", "val"))
    val n = spark.sql("CALL jcat.system.expire(table => 'exp', " +
      "older_than => '2024-01-20 00:00:00')")
      .select("n_deleted").as[Long].head()
    assert(n === 2L)
    assert(spark.table("jcat.exp").select("payload")
      .as[String].collect().toSeq === Seq("new1"))
    // the erase is first-class history (a delete commit)
    assert(spark.sql("CALL jcat.system.history(table => 'exp')")
      .orderBy("version").select("op").as[String].collect()
      .toSeq.last === "delete")
  }}

  test("IDENTITY columns: unique monotone values across appends, " +
    "counter rides the commit, ALWAYS refuses explicit values") {
    withCatalog { root =>
    spark.sql("CREATE TABLE jcat.idt (ns STRING, ukey BIGINT, " +
      "ts TIMESTAMP, payload STRING, val DOUBLE, " +
      "rid BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 " +
      "INCREMENT BY 2)) USING journal OPTIONS (epochSize '100')")
    val store = graft.journal.JournalStore.open(spark, s"$root/idt")
    val spec0 = store.identityColumns("rid")
    assert((spec0.start, spec0.step, spec0.allowExplicit, spec0.used) ===
      (100L, 2L, false, 0L))
    def batch(ks: Long*) = ks.map(k => ("users", k,
      graft.TestSpark.ts(f"2024-01-01 00:00:${k}%02.0f"), s"p$k", k.toDouble))
      .toDF("ns", "ukey", "ts", "payload", "val")
    store.append(batch(1, 2, 3))
    store.append(batch(4, 5))
    // values follow the deterministic seq order: 100,102,104 then 106,108
    assert(spark.table("jcat.idt").orderBy("seq")
      .select("ukey", "rid").as[(Long, Long)].collect().toSeq ===
      Seq((1L, 100L), (2L, 102L), (3L, 104L), (4L, 106L), (5L, 108L)))
    assert(graft.journal.JournalStore.open(spark, s"$root/idt")
      .identityColumns("rid").used === 5L)
    // GENERATED ALWAYS: an explicit rid is refused before any write
    val e = intercept[IllegalArgumentException] {
      store.append(batch(6).withColumn("rid", lit(999L)))
    }
    assert(e.getMessage.contains("GENERATED ALWAYS AS IDENTITY"))
    // BY DEFAULT: explicit values pass through, counter does not move
    spark.sql("CREATE TABLE jcat.idt2 (ns STRING, ukey BIGINT, " +
      "ts TIMESTAMP, payload STRING, val DOUBLE, " +
      "rid BIGINT GENERATED BY DEFAULT AS IDENTITY) USING journal " +
      "OPTIONS (epochSize '100')")
    val st2 = graft.journal.JournalStore.open(spark, s"$root/idt2")
    st2.append(batch(7).withColumn("rid", lit(999L)))
    st2.append(batch(8))
    assert(spark.table("jcat.idt2").orderBy("seq")
      .select("ukey", "rid").as[(Long, Long)].collect().toSeq ===
      Seq((7L, 999L), (8L, 1L)))
    // SYNC IDENTITY re-arms the counter past the explicit max, so the
    // next generated value clears 999 instead of colliding with it
    spark.sql("CALL jcat.system.sync_identity(table => 'idt2', " +
      "column => 'rid')")
    st2.append(batch(9))
    assert(spark.table("jcat.idt2").where($"ukey" === 9)
      .select("rid").as[Long].head() === 1000L)
    // syncing again is a no-op (never moves the counter backwards)
    val usedBefore = graft.journal.JournalStore.open(spark, s"$root/idt2")
      .identityColumns("rid").used
    spark.sql("CALL jcat.system.sync_identity(table => 'idt2', " +
      "column => 'rid')")
    assert(graft.journal.JournalStore.open(spark, s"$root/idt2")
      .identityColumns("rid").used === usedBefore)
  }}

  test("MERGE INTO a table with GENERATED + IDENTITY columns: inserted " +
    "rows compute both; updated rows keep their identity") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.mgen (ns STRING, ukey BIGINT, " +
      "ts TIMESTAMP, payload STRING, val DOUBLE, " +
      "bucket BIGINT GENERATED ALWAYS AS (ukey % 8), " +
      "rid BIGINT GENERATED ALWAYS AS IDENTITY) USING journal " +
      "OPTIONS (epochSize '100')")
    val store = graft.journal.JournalStore.open(spark, s"$root/mgen")
    store.append(Seq(
      ("users", 10L, graft.TestSpark.ts("2024-01-01 00:00:01"), "p0", 1.0),
      ("users", 11L, graft.TestSpark.ts("2024-01-01 00:00:02"), "p1", 2.0))
      .toDF("ns", "ukey", "ts", "payload", "val"))
    Seq(("users", 11L, graft.TestSpark.ts("2024-01-02 00:00:00"), "p1b", 9.0),
        ("users", 12L, graft.TestSpark.ts("2024-01-02 00:00:01"), "p2", 3.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .createOrReplaceTempView("mgen_src")
    spark.sql("MERGE INTO jcat.mgen t USING mgen_src s " +
      "ON t.ns = s.ns AND t.ukey = s.ukey " +
      "WHEN MATCHED THEN UPDATE SET t.ts = s.ts, t.payload = s.payload, " +
      "t.val = s.val " +
      "WHEN NOT MATCHED THEN INSERT (ns, ukey, ts, payload, val) " +
      "VALUES (s.ns, s.ukey, s.ts, s.payload, s.val)")
    val got = spark.table("jcat.mgen")
      .groupBy("ukey")
      .agg(max_by(col("payload"), col("seq")).as("payload"),
        max_by(col("bucket"), col("seq")).as("bucket"),
        max_by(col("rid"), col("seq")).as("rid"))
      .orderBy("ukey")
      .select("ukey", "payload", "bucket", "rid")
      .as[(Long, String, Long, Long)].collect().toSeq
    // inserted row 12 generated bucket (12 % 8 = 4) and a FRESH rid;
    // all rids distinct; every bucket equals ukey % 8
    assert(got.map(r => (r._1, r._2, r._3)) ===
      Seq((10L, "p0", 2L), (11L, "p1b", 3L), (12L, "p2", 4L)))
    assert(got.map(_._4).distinct.size === 3, got.toString)
    // STABLE identity under merge (Delta semantics): the updated row
    // KEEPS the rid its original append assigned — value equality, not
    // just distinctness. Original appends assigned rid 1 (ukey 10) and
    // rid 2 (ukey 11) in deterministic seq order.
    assert(got.map(r => (r._1, r._4)).take(2) ===
      Seq((10L, 1L), (11L, 2L)), got.toString)
  }}

  test("merge refuses a source that carries an ALWAYS identity or a " +
    "generated column (the internal-rewrite bypass must not launder " +
    "explicit values)") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.mref (ns STRING, ukey BIGINT, " +
      "ts TIMESTAMP, payload STRING, val DOUBLE, " +
      "bucket BIGINT GENERATED ALWAYS AS (ukey % 8), " +
      "rid BIGINT GENERATED ALWAYS AS IDENTITY) USING journal " +
      "OPTIONS (epochSize '100')")
    val store = graft.journal.JournalStore.open(spark, s"$root/mref")
    store.append(Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-01 00:00:01"), "p0", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val"))
    val base = Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-02 00:00:00"), "p0b", 2.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
    // explicit rid=999 through merge would bypass the append-time
    // ALWAYS refusal (the delta commits with internalRewrite) and
    // could collide with an assigned identity value — refused up front
    val ei = intercept[IllegalArgumentException](
      store.merge(base.withColumn("rid", lit(999L))))
    assert(ei.getMessage.contains("IDENTITY"))
    // a source-supplied generated value would be silently recomputed
    // over — refused loudly instead (updateWhere's rule)
    val eg = intercept[IllegalArgumentException](
      store.merge(base.withColumn("bucket", lit(7L))))
    assert(eg.getMessage.contains("GENERATED"))
    // the clean merge still works and preserves identity
    store.merge(base)
    assert(spark.table("jcat.mref")
      .groupBy("ukey").agg(max_by(col("rid"), col("seq")).as("rid"))
      .select("rid").as[Long].head() === 1L)
  }}

  test("UPDATE on a table with ALWAYS identity + generated columns: " +
    "identity passes through verbatim, generated recomputes from the " +
    "post-assignment row; direct assignment of either is refused") {
    withCatalog { root =>
    spark.sql("CREATE TABLE jcat.uid (ns STRING, ukey BIGINT, " +
      "ts TIMESTAMP, payload STRING, val DOUBLE, " +
      "dbl DOUBLE GENERATED ALWAYS AS (val * 2), " +
      "rid BIGINT GENERATED ALWAYS AS IDENTITY) USING journal " +
      "OPTIONS (epochSize '100')")
    val store = graft.journal.JournalStore.open(spark, s"$root/uid")
    store.append(Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-01 00:00:01"), "p0", 1.0),
      ("users", 2L, graft.TestSpark.ts("2024-01-01 00:00:02"), "p1", 2.0))
      .toDF("ns", "ukey", "ts", "payload", "val"))
    // SQL UPDATE re-appends rewritten state through the internal path:
    // the ALWAYS identity refusal must NOT fire on the carried rids
    // (the r15 regression: every UPDATE on an identity table threw)
    spark.sql("UPDATE jcat.uid SET val = 100.0 WHERE ukey = 1")
    val got = spark.table("jcat.uid")
      .groupBy("ukey")
      .agg(max_by(col("val"), col("seq")).as("val"),
        max_by(col("dbl"), col("seq")).as("dbl"),
        max_by(col("rid"), col("seq")).as("rid"))
      .orderBy("ukey")
      .as[(Long, Double, Double, Long)].collect().toSeq
    // dbl RECOMPUTED from the assigned val (Delta's UPDATE rule), rid
    // kept verbatim (1 and 2 from the original append)
    assert(got === Seq((1L, 100.0, 200.0, 1L), (2L, 2.0, 4.0, 2L)))
    // the identity counter did not advance: the rewrite carried values
    assert(graft.journal.JournalStore.open(spark, s"$root/uid")
      .identityColumns("rid").used === 2L)
    // direct assignment of a generated or ALWAYS identity column refuses
    val eg = intercept[IllegalArgumentException] {
      store.updateWhere(Seq("dbl" -> lit(5.0)), None)
    }
    assert(eg.getMessage.contains("GENERATED"))
    val ei = intercept[IllegalArgumentException] {
      store.updateWhere(Seq("rid" -> lit(5L)), None)
    }
    assert(ei.getMessage.contains("IDENTITY"))
  }}

  test("MERGE INSERT into a table with a column DEFAULT: unlisted " +
    "defaulted columns fill the DEFAULT, not null") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.mdef (ns STRING, ukey BIGINT, " +
      "ts TIMESTAMP, payload STRING, val DOUBLE, " +
      "tag STRING DEFAULT 'fresh') USING journal OPTIONS (epochSize '100')")
    val store = graft.journal.JournalStore.open(spark, s"$root/mdef")
    store.append(Seq(
      ("users", 1L, graft.TestSpark.ts("2024-01-01 00:00:01"), "p0", 1.0))
      .toDF("ns", "ukey", "ts", "payload", "val"))
    Seq(("users", 1L, graft.TestSpark.ts("2024-01-02 00:00:00"), "p0b", 9.0),
        ("users", 2L, graft.TestSpark.ts("2024-01-02 00:00:01"), "p2", 2.0))
      .toDF("ns", "ukey", "ts", "payload", "val")
      .createOrReplaceTempView("mdef_src")
    spark.sql("MERGE INTO jcat.mdef t USING mdef_src s " +
      "ON t.ns = s.ns AND t.ukey = s.ukey " +
      "WHEN MATCHED THEN UPDATE SET t.ts = s.ts, t.payload = s.payload, " +
      "t.val = s.val " +
      "WHEN NOT MATCHED THEN INSERT (ns, ukey, ts, payload, val) " +
      "VALUES (s.ns, s.ukey, s.ts, s.payload, s.val)")
    val got = spark.table("jcat.mdef")
      .groupBy("ukey")
      .agg(max_by(col("payload"), col("seq")).as("payload"),
        max_by(col("tag"), col("seq")).as("tag"))
      .orderBy("ukey")
      .as[(Long, String, String)].collect().toSeq
    // the INSERT route (ukey 2) materialized the write-time DEFAULT
    // exactly as append() does — Delta's MERGE INSERT default semantics
    assert(got === Seq((1L, "p0b", "fresh"), (2L, "p2", "fresh")))
  }}

  test("declared retention policy: retention.olderThan property + " +
    "CALL system.maintain sweeps old rows, keeps new, no-ops twice, " +
    "and the property rides clones") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.ret (ns STRING, ukey BIGINT, " +
      "ts TIMESTAMP, payload STRING, val DOUBLE) USING journal " +
      "OPTIONS (epochSize '100')")
    // a maintain with NO declared policy is a no-op, not an error
    assert(spark.sql("CALL jcat.system.maintain(table => 'ret')")
      .select("n_deleted").as[Long].head() === 0L)
    // two ancient rows (2024) and one fresh row (now)
    spark.sql("INSERT INTO jcat.ret SELECT * FROM VALUES " +
      "('users', CAST(1 AS BIGINT), TIMESTAMP '2024-01-01 00:00:01', 'old1', CAST(1.0 AS DOUBLE)), " +
      "('users', CAST(2 AS BIGINT), TIMESTAMP '2024-01-02 00:00:02', 'old2', CAST(2.0 AS DOUBLE)) " +
      "AS t(ns, ukey, ts, payload, val)")
    spark.sql("INSERT INTO jcat.ret SELECT 'users' AS ns, " +
      "CAST(3 AS BIGINT) AS ukey, current_timestamp() AS ts, " +
      "'new' AS payload, CAST(3.0 AS DOUBLE) AS val")
    spark.sql("ALTER TABLE jcat.ret SET TBLPROPERTIES " +
      "('retention.olderThan' = '30 DAYS')")
    // the sweep erases the 2024 rows, keeps the fresh one
    assert(spark.sql("CALL jcat.system.maintain(table => 'ret')")
      .select("n_deleted").as[Long].head() === 2L)
    assert(spark.table("jcat.ret").select("payload")
      .as[String].collect().toSeq === Seq("new"))
    // a second sweep is a no-op (nothing older than the bound remains)
    assert(spark.sql("CALL jcat.system.maintain(table => 'ret')")
      .select("n_deleted").as[Long].head() === 0L)
    assert(spark.table("jcat.ret").count() === 1L)
    // the policy is ordinary table meta: a clone carries it
    spark.sql("CALL jcat.system.clone(table => 'ret', dest => 'retc')")
    assert(graft.journal.JournalStore.open(spark, s"$root/retc")
      .manifest.meta.get("retention.olderThan") === Some("30 DAYS"))
    // a malformed policy fails loudly AT THE SET DOOR (round 17 — the
    // strict interval parser runs when the property lands, so a typo
    // is never a delayed error some future sweep trips over)
    val e = intercept[Exception](
      spark.sql("ALTER TABLE jcat.ret SET TBLPROPERTIES " +
        "('retention.olderThan' = 'not an interval')"))
    assert(e.getMessage.contains("retention.olderThan"))
    // the table kept its valid policy; maintain stays a clean no-op
    assert(spark.sql("CALL jcat.system.maintain(table => 'ret')")
      .select("n_deleted").as[Long].head() === 0L)
  }}

  test("per-namespace retention by SQL: two namespaces with different " +
    "TTLs, ONE CALL maintain, each bounded correctly; global policy " +
    "covers the rest") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.nsret (ns STRING, ukey BIGINT, " +
      "ts TIMESTAMP, payload STRING, val DOUBLE) USING journal " +
      "OPTIONS (epochSize '1000')")
    def at(minusHours: Long) = java.sql.Timestamp.from(
      java.time.Instant.now().minus(minusHours,
        java.time.temporal.ChronoUnit.HOURS))
    Seq(
      ("hot", 1L, at(2), "doomed-hot", 1.0),
      ("hot", 2L, at(0), "kept-hot", 1.0),
      ("cold", 3L, at(2), "kept-cold", 1.0),
      ("cold", 4L, at(48), "doomed-cold", 1.0),
      ("other", 5L, at(2), "kept-other", 1.0),
      ("other", 6L, at(12), "doomed-other", 1.0),
    ).toDF("ns", "ukey", "ts", "payload", "val")
      .writeTo("jcat.nsret").append()
    spark.sql("ALTER TABLE jcat.nsret SET TBLPROPERTIES (" +
      "'retention.olderThan' = '6 HOURS', " +
      "'retention.olderThan.hot' = '1 HOURS', " +
      "'retention.olderThan.cold' = '1 DAYS')")
    assert(spark.sql("CALL jcat.system.maintain(table => 'nsret')")
      .select("n_deleted").as[Long].head() === 3L)
    assert(spark.table("jcat.nsret").select("payload")
      .as[String].collect().toSeq.sorted ===
      Seq("kept-cold", "kept-hot", "kept-other"))
    // ns-scoped specs validate at the set door like the global one
    val e = intercept[Exception](
      spark.sql("ALTER TABLE jcat.nsret SET TBLPROPERTIES " +
        "('retention.olderThan.hot' = 'bogus')"))
    assert(e.getMessage.contains("retention.olderThan.hot"))
  }}

  test("CREATE TABLE with the column-spec trio is ONE atomic manifest " +
    "commit; ALTER SET DEFAULT refuses non-deterministic and " +
    "per-append expressions") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.atomic (ns STRING, ukey BIGINT, " +
      "ts TIMESTAMP, payload STRING, val DOUBLE, " +
      "tag STRING DEFAULT 'x', " +
      "bucket BIGINT GENERATED ALWAYS AS (ukey % 4), " +
      "rid BIGINT GENERATED ALWAYS AS IDENTITY) USING journal " +
      "OPTIONS (epochSize '100')")
    val store = graft.journal.JournalStore.open(spark, s"$root/atomic")
    // the INITIAL commit carries all three spec families — no window
    // where the columns exist without their specs, and RESTORE to the
    // first version keeps them
    assert(store.manifest.op === "create",
      s"expected one atomic create commit, last op = ${store.manifest.op}")
    assert(store.columnDefaults.get("tag") === Some("'x'"))
    assert(store.generatedColumns.get("bucket") === Some("ukey % 4"))
    assert(store.identityColumns.contains("rid"))
    // DDL-time refusal of non-constant defaults: nondeterministic and
    // per-append (current-time family) expressions are not DEFAULTs
    Seq("rand()", "uuid()", "current_timestamp()", "now()").foreach { bad =>
      val e = intercept[IllegalArgumentException](store.alterSchema(
        Seq(graft.journal.JournalStore.SetDefault("tag", bad))))
      assert(e.getMessage.toLowerCase.contains("default"), s"$bad: $e")
    }
    // a proper literal still lands
    store.alterSchema(
      Seq(graft.journal.JournalStore.SetDefault("tag", "'y'")))
    assert(graft.journal.JournalStore.open(spark, s"$root/atomic")
      .columnDefaults.get("tag") === Some("'y'"))
    // the OTHER DDL door enforces the same contract: Spark itself
    // accepts CURRENT_TIMESTAMP as a CREATE-time default, but a
    // per-append re-evaluating expression is refused here too
    val ec = intercept[Exception](spark.sql(
      "CREATE TABLE jcat.baddft (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
        "payload STRING, val DOUBLE, " +
        "created TIMESTAMP DEFAULT current_timestamp()) USING journal"))
    assert(ec.getMessage.toUpperCase.contains("DEFAULT"), ec.getMessage)
    assert(!graft.journal.JournalStore.exists(s"$root/baddft"),
      "a refused CREATE must leave no store behind")
  }}

  test("CALL system.clone: zero-copy clone by name; states diverge " +
    "independently after the clone") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.csrc (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
    spark.sql("INSERT INTO jcat.csrc SELECT 'users' AS ns, " +
      "CAST(1 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:01' AS ts, " +
      "'p0' AS payload, CAST(1.0 AS DOUBLE) AS val")
    spark.sql("INSERT INTO jcat.csrc SELECT 'users' AS ns, " +
      "CAST(2 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:02' AS ts, " +
      "'p1' AS payload, CAST(2.0 AS DOUBLE) AS val")
    spark.sql("CALL jcat.system.clone(table => 'csrc', dest => 'cdst')")
    // the clone is a real catalog table sharing bytes, not state
    spark.sql("INSERT INTO jcat.csrc SELECT 'users' AS ns, " +
      "CAST(3 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:03' AS ts, " +
      "'p2' AS payload, CAST(3.0 AS DOUBLE) AS val")
    assert(spark.sql("SELECT count(*) FROM jcat.cdst").head().getLong(0) === 2L)
    assert(spark.sql("SELECT count(*) FROM jcat.csrc").head().getLong(0) === 3L)
    // and writable independently — divergence flows the other way too
    spark.sql("INSERT INTO jcat.cdst SELECT 'users' AS ns, " +
      "CAST(9 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:09' AS ts, " +
      "'p9' AS payload, CAST(9.0 AS DOUBLE) AS val")
    assert(spark.sql("SELECT count(*) FROM jcat.cdst").head().getLong(0) === 3L)
    assert(spark.sql("SELECT count(*) FROM jcat.csrc").head().getLong(0) === 3L)
    // refuses to overwrite an existing table
    val e = intercept[Exception](
      spark.sql("CALL jcat.system.clone(table => 'csrc', dest => 'cdst')"))
    assert(Option(e.getMessage).exists(_.toLowerCase.contains("exist")))
  }}

  test("CALL system.vacuum dry_run RETURNS the reclaim plan and deletes " +
    "nothing; the real call then reclaims") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.vdr (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO jcat.vdr SELECT 'a' AS ns, CAST($i AS BIGINT) AS ukey, " +
        s"TIMESTAMP '2024-01-01 00:00:0$i' AS ts, 'p$i' AS payload, " +
        s"CAST($i.0 AS DOUBLE) AS val")
    }
    spark.sql("CALL jcat.system.compact(table => 'vdr')")
    def segCount(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(s"$root/vdr/segments")).size
    }
    val before = segCount()
    val plan = spark.sql("CALL jcat.system.vacuum(table => 'vdr', " +
      "retain => 1, grace_ms => 0, dry_run => true)")
      .as[(String, String)].collect().toSeq
    assert(plan.exists(_._1 == "segment"), plan.mkString(", "))
    assert(segCount() === before, "dry run must not delete")
    spark.sql("CALL jcat.system.vacuum(table => 'vdr', retain => 1, grace_ms => 0)")
    assert(segCount() < before)
    assert(spark.sql("SELECT count(*) FROM jcat.vdr").head().getLong(0) === 3L)
  }}

  test("ALTER TABLE: ADD COLUMNS widens with nulls, DROP COLUMN hides " +
    "instantly, SET/UNSET TBLPROPERTIES ride the manifest; renames refuse") {
    withCatalog { root =>
      spark.sql("CREATE TABLE jcat.alt (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
        "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
      spark.sql("INSERT INTO jcat.alt SELECT 'users' AS ns, " +
        "CAST(1 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:01' AS ts, " +
        "'p0' AS payload, CAST(1.0 AS DOUBLE) AS val")
      // ADD COLUMNS: zero rewrite; pre-add rows read back NULL
      spark.sql("ALTER TABLE jcat.alt ADD COLUMNS (score DOUBLE)")
      assert(spark.sql("SELECT score FROM jcat.alt").as[Option[Double]]
        .collect().toSeq === Seq(None))
      // new appends can now land the column by name
      spark.sql("INSERT INTO jcat.alt SELECT 'users' AS ns, " +
        "CAST(2 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:02' AS ts, " +
        "'p1' AS payload, CAST(2.0 AS DOUBLE) AS val, " +
        "CAST(0.75 AS DOUBLE) AS score")
      assert(spark.sql("SELECT ukey, score FROM jcat.alt ORDER BY ukey")
        .as[(Long, Option[Double])].collect().toSeq ===
        Seq((1L, None), (2L, Some(0.75))))
      // TBLPROPERTIES through ALTER
      spark.sql("ALTER TABLE jcat.alt SET TBLPROPERTIES ('team' = 'data-eng')")
      assert(graft.journal.JournalStore.open(spark, s"$root/alt")
        .manifest.meta.get("team") === Some("data-eng"))
      spark.sql("ALTER TABLE jcat.alt UNSET TBLPROPERTIES ('team')")
      assert(graft.journal.JournalStore.open(spark, s"$root/alt")
        .manifest.meta.get("team") === None)
      // DROP COLUMN hides the column instantly (no rewrite)
      spark.sql("ALTER TABLE jcat.alt DROP COLUMN score")
      assert(!spark.table("jcat.alt").columns.contains("score"))
      // re-adding the dropped name refuses until a compact forgets the bytes
      val e1 = intercept[Exception](
        spark.sql("ALTER TABLE jcat.alt ADD COLUMNS (score DOUBLE)"))
      assert(Option(e1.getMessage).exists(_.contains("DROPPED")))
      // renames re-map parquet bytes by name — refused
      val e2 = intercept[Exception](
        spark.sql("ALTER TABLE jcat.alt RENAME COLUMN payload TO body"))
      assert(Option(e2.getMessage).exists(m =>
        m.contains("rename") || m.contains("Rename")))
    }
  }

  test("ALTER TABLE statement atomicity: a failing change list leaves " +
    "the store untouched; IF EXISTS no-ops; FIRST/AFTER refuse") {
    withCatalog { root =>
      spark.sql("CREATE TABLE jcat.atom (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
        "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '100')")
      spark.sql("INSERT INTO jcat.atom SELECT 'a' AS ns, " +
        "CAST(1 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:01' AS ts, " +
        "'p' AS payload, CAST(1.0 AS DOUBLE) AS val")
      spark.sql("ALTER TABLE jcat.atom ADD COLUMNS (lapsed DOUBLE)")
      spark.sql("ALTER TABLE jcat.atom DROP COLUMN lapsed")
      val store = graft.journal.JournalStore.open(spark, s"$root/atom")
      val vBefore = store.manifest.version
      // ONE statement, two adds; the second refuses (dropped name whose
      // bytes linger) — the FIRST must not be durably committed either
      val e = intercept[Exception](spark.sql(
        "ALTER TABLE jcat.atom ADD COLUMNS (fresh INT, lapsed DOUBLE)"))
      assert(Option(e.getMessage).exists(_.contains("DROPPED")))
      assert(store.manifest.version === vBefore,
        "a failing ALTER statement committed a manifest version")
      assert(!spark.table("jcat.atom").columns.contains("fresh"),
        "half of a failing ALTER statement was applied")
      // DROP COLUMN IF EXISTS on a missing column: validated no-op
      spark.sql("ALTER TABLE jcat.atom DROP COLUMN IF EXISTS never_there")
      assert(store.manifest.version === vBefore,
        "an IF EXISTS no-op must not commit a version")
      // non-default column positions silently land at the end otherwise —
      // refuse loudly instead
      val ePos = intercept[Exception](spark.sql(
        "ALTER TABLE jcat.atom ADD COLUMNS (early INT FIRST)"))
      assert(Option(ePos.getMessage).exists(_.contains("FIRST/AFTER")))
      // a mixed statement that succeeds lands as ONE commit
      val v1 = store.manifest.version
      spark.sql("ALTER TABLE jcat.atom ADD COLUMNS (s1 STRING, s2 STRING)")
      assert(store.manifest.version === v1 + 1,
        "a multi-column ADD must land as one manifest commit")
      assert(spark.table("jcat.atom").columns.toSet.intersect(
        Set("s1", "s2")).size === 2)
    }
  }
}
