package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot ~10x scale smoke (VERDICT r6 item 8): no sf1 fixture exists,
  * so synthesize one from sf0.1 — events replicated with shifted
  * event_ids; documents replicated with per-replica token salting, which
  * preserves each replica's internal near-dup structure exactly (every
  * token of every doc in replica i gets the same suffix, so jaccard
  * within a replica is unchanged) while sharing no shingles ACROSS
  * replicas — dup pairs, minhash candidates and CC components all scale
  * linearly, the way a 10x corpus does, instead of quadratically the
  * way naive replication would. Embeddings replicate 10x with shifted
  * ids and a per-replica perturbation (kmeans/semantic-dedup/IVF probes
  * see 10x the vectors, not 10 exact copies). Prints per-query seconds
  * for the scale-sensitive subset; compare against the sf0.1 bench
  * medians for super-linearity.
  */
object Sf1Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-sf1-smoke").master("local[32]")
      // the SQL MERGE/UPDATE rows ride the session-extension rules
      .withExtensions(new graft.expr.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "16g")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val out = "/tmp/graft_sf1"
    val reps = 10

    val ev = Tables(spark, src, "events")
    val evMax = ev.agg(max("event_id")).head.getLong(0) + 1
    val evBig = (0 until reps).map { i =>
      ev.select((col("event_id") + lit(i * evMax)).as("event_id"),
        col("event_type"), col("user_id"), col("ts"), col("props"), col("value"))
    }.reduce(_ unionByName _)
    evBig.repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docBig = (0 until reps).map { i =>
      docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        (if (i == 0) col("text")
         else concat_ws(" ",
           expr(s"transform(split(text, ' '), t -> concat(t, '_r$i'))"))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    docBig.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")
    // embeddings: 10x with shifted ids and a per-replica perturbation
    // (kmeans/semantic-dedup probes see 10x the vectors, not 10 exact
    // copies — exact copies would make every replica a trivial dup)
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    (0 until reps).map { i =>
      emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        expr(s"transform(embedding, x -> x + CAST($i AS FLOAT) * 0.003f)")
          .as("embedding"), col("label"))
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    // customer: dim-side pass-through (join_skew_handoff replicates the
    // FACT side 10x; the dim stays dim — that's the point of the shape)
    spark.read.parquet(s"$src/customer.parquet")
      .write.mode("overwrite").parquet(s"$out/customer.parquet")

    // lineitem/orders: replicated with ALL keys shifted per replica —
    // the 10x graph is 10 disjoint copies (nodes, edges, components all
    // scale linearly; the co-purchase graph of 10x more orders over 10x
    // more customers/parts, not a 10x-denser graph)
    val K = 100000000L
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    (0 until reps).map { i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i * K))
        .withColumn("l_partkey", col("l_partkey") + lit(i * K))
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    val ord = spark.read.parquet(s"$src/orders.parquet")
    (0 until reps).map { i =>
      ord.withColumn("o_orderkey", col("o_orderkey") + lit(i * K))
        .withColumn("o_custkey", col("o_custkey") + lit(i * K))
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")

    println(s"[sf1] events=${spark.read.parquet(s"$out/events.parquet").count()} " +
      s"docs=${spark.read.parquet(s"$out/documents.parquet").count()}")

    val names = Seq("journal_scan", "journal_write_segments", "journal_format_scan",
      "journal_latest", "journal_diff", "events_funnel", "stream_session_batch",
      "dedup_exact", "dedup_minhash", "dedup_simhash", "dedup_corpus_minhash",
      "text_tokens_top", "text_tfidf", "text_repetition", "sample_stratified",
      "graph_pagerank", "graph_degree", "win_gaps_islands",
      "text_inverted_index", "dedup_substring", "events_sessionize",
      "graph_triangles", "journal_scd2", "text_chunk", "text_bpe_pairs",
      "events_markov", "win_moving_median",
      // round 10: frontier BFS (graph grows 10x), report-driven salt
      // join (events fact side grows 10x), erase + compact lifecycle
      // (journal build + rewrite scale with ingest)
      "graph_bfs", "join_skew_handoff", "journal_erase",
      "journal_compact_scan",
      // round 11: DV delete + purge, merge reconciliation and z-order
      // rewrite all scale with ingest; entropy scales with the corpus
      "journal_dv_erase", "journal_merge_upsert", "journal_zorder_scan",
      "text_entropy",
      // round 12/13 rows: batch CDC (delete tier reads the window's dv
      // parts, linear in the window), constraint validation (one
      // predicate scan per appended batch), PMI (vocabulary-sized count
      // tables — corpus scan once, then vocab-grain joins)
      "journal_changes", "journal_constraints", "text_pmi",
      // round 13: storage-partitioned state reconstruction — the
      // zero-exchange grouped agg must scale with the DATA, since there
      // is no shuffle to grow super-linearly; txn replay suppression is
      // manifest-mark work, so its cost is the ingest itself; the
      // incremental rollup's REFRESH is O(window) — at 10x data the
      // bootstrap grows, the fold does not (fixed 2000-seq window)
      "journal_grouped_state", "journal_txn_append", "journal_incr_agg",
      // tail reads stay O(files-holding-the-tail) as the store grows;
      // the rollup's refresh delta is O(window) like incr_agg
      "journal_tail_scan", "journal_rollup_refresh",
      // round 13 session 3: the version walk is metadata (fixed #versions;
      // per-version counts scan the 10x ingest — linear, bound = ingest);
      // kmeans assignment is broadcast-map-side (linear in vectors) and
      // its update shuffle is O(k·dim·partitions), data-size-free;
      // dedup_semantic's within-cluster pairs grow (n/k)^2 at FIXED k=4 —
      // the smoke PRINTS that quadratic on purpose: production sizing is
      // k ∝ n (constant cluster size ⇒ linear pairs), see SURVEY §2.2
      "journal_history", "emb_kmeans", "dedup_semantic",
      // paragraph dedup = one shuffle keyed on block text + the per-doc
      // re-agg — linear in corpus bytes at any scale
      "text_dedup_paragraph",
      // trained-codebook IVF = the kmeans train cost + a probed-cluster
      // candidate scan — train linear, probe sub-corpus
      "sim_ann_ivf_kmeans",
      // round 14: the SCALE twin of dedup_semantic — k = ceil(n/32)
      // keeps expected cluster size constant, so within-cluster pairs
      // and runtime grow ~linearly where the fixed-k row goes quadratic
      // (the pair-count probe below prints the witness numbers)
      "dedup_semantic_scaled",
      // round 14 (VERDICT r13 item 8 — the r13 session-2 rows' 10x
      // probes): SQL MERGE/UPDATE seed a FIXED seq window (the 10x axis
      // is the pushed-down events scan that extracts it — linear);
      // batch CDC reads a fixed version window (delete tier rides the
      // window's dv parts, not the store); token-budget mixing is a
      // |sources|-row aggregate + two corpus passes, no corpus shuffle;
      // batch top-k serving carries <= k rows per (partition, group)
      // through the one exchange, linear corpus scan
      "journal_merge_sql", "journal_update_sql", "journal_changes_read",
      "mix_token_budget", "sim_batch_topk",
      // conditional-update and reconcile MERGE shapes (round 14): same
      // fixed-window seed as journal_merge_sql; reconcile's state side
      // is deliberately the FULL latest() (checkpoint-bounded) — its
      // 10x cost axis is the state size, stated and linear
      "journal_merge_cond_sql", "journal_merge_reconcile",
      // round 15 (VERDICT r14 item 6): the two un-probed r14 rows —
      // stale's by-source UPDATE reads the FULL-RECORD segment arg-max
      // (its stated 10x axis is the state reconstruction, linear in
      // store bytes); evolve's merge window is fixed, its axis is the
      // pushed-down source extraction
      "journal_merge_stale", "journal_merge_evolve_sql",
      // round 15 rows: N-clause merge shares journal_merge_cond_sql's
      // shape (one extra carrier column per clause — constant width);
      // BPE encode is one corpus scan + vocab-sized broadcasts + the
      // doc-keyed position window (linear); pack twin has no corpus
      // window before the per-source cumsum; quality model is two
      // vocabulary-collapsing passes + one map-side scoring pass
      "journal_merge_multi", "text_bpe_encode", "text_pack_bpe",
      "text_quality_model",
      // incremental dedup: index build is the linear corpus pass; the
      // batch side pays batch signatures + the bucket join — its 10x
      // axis is candidate volume, never corpus x batch
      "dedup_incremental",
      // LM scoring: model size is FIXED (top-256/512), so 10x data
      // grows only the two vocabulary-collapsing train passes and the
      // map-side scoring scan — linear, no corpus shuffle
      "text_lm_score",
      // int8 codebook quantization: one 64-group codebook aggregate +
      // a map-side scoring scan — linear in vectors
      "emb_quantize_codebook",
      // round-15 session 2: ANALYZE is two linear passes ending in
      // metadata-sized results (1-row aggregate; ≤ cols×512 HLL
      // registers); the domain cap's exchange carries ≤ C rows per
      // (partition, domain) whatever the corpus; hybrid RRF bounds
      // both legs to 64-entry topk_by arrays before fusing; shard
      // packing's only global window runs over 64 bucket TOTALS — the
      // corpus sees one partitioned window + a broadcast join
      "journal_analyze", "text_domain_cap", "sim_hybrid_rrf",
      "text_shard_pack",
      // round 16: the BPE-count shard cutter shares text_shard_pack's
      // two-level window plus text_pack_bpe's linear count frame — its
      // 10x axis is the corpus explode, never a global window
      "text_shard_pack_bpe",
      // round 16: declared retention = fixed-window ingest + the same
      // ts-range-pruned sweep journal_expire_sql probes, plus a
      // metadata-only second sweep
      "journal_retention_sql",
      // round 16: span dedup's wire is (doc_id, pos, md5) shingles —
      // linear in corpus tokens; anchor counts combine map-side and
      // the interval merge windows ride doc_id partitioning
      "dedup_span",
      // round 17: the materialized scrub adds one keep-first window
      // over the same shingle wire plus a map-side excision — text
      // moves exactly twice (in, out), still linear in corpus tokens
      "dedup_span_scrub",
      // round 16: the hash-gated incremental-analyze lineage (analyze
      // a fixed window + append a fixed batch) — both windows fixed,
      // so the probe states near-constant cost; the corpus-scale
      // refresh witness is the analyze_incr_append probe below
      "journal_analyze_incr",
      // colspec materialization (DEFAULT + GENERATED + IDENTITY) is a
      // pure projection inside the append — its 10x axis is the fixed
      // 3000-row ingest window, so the probe states near-constant cost
      "journal_colspec_sql",
      // retention sweep: fixed-window ingest + a ts-range-pruned
      // deleteWhere — near-constant; at scale the axis is the number
      // of files whose ts range overlaps the bound, never store size
      "journal_expire_sql")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, out).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[sf1] $n%-24s ${sec}%8.2f s  rows=$cnt")
    }
    // SemDeDup sizing witness (VERDICT r13 item 4): within-cluster pair
    // counts at 1x vs 10x, fixed k=4 vs corpus-sized k = ceil(n/32).
    // Fixed k must print ~100x pairs (the (n/k)^2 quadratic); scaled k
    // must print ~10x (constant expected cluster size ⇒ linear pairs).
    locally {
      def pairs(dir: String, scaled: Boolean): Long = {
        val asg = if (scaled) graft.ops.LlmExtOps.kmeansAssignScaled(spark, dir)
                  else graft.ops.LlmExtOps.kmeansAssign(spark, dir)
        asg.groupBy("cl").count()
          .agg(sum(expr("count * (count - 1) div 2"))).head.getLong(0)
      }
      val (f1, f10) = (pairs(src, scaled = false), pairs(out, scaled = false))
      val (s1, s10) = (pairs(src, scaled = true), pairs(out, scaled = true))
      println(f"[sf1] semdedup_pairs fixed-k  1x=$f1%d 10x=$f10%d " +
        f"(${f10.toDouble / f1}%.1fx — quadratic, the k=4 contract row)")
      println(f"[sf1] semdedup_pairs scaled-k 1x=$s1%d 10x=$s10%d " +
        f"(${s10.toDouble / s1}%.1fx — ~linear, k = ceil(n/32))")
    }
    // BPE driver-round contract probe (see bpeTrainRounds' scaladoc):
    // the loop pays one job-launch sync per merge round; print s/round
    // at 10x data so the constant is a measured, stated number — a real
    // vocab training multiplies it by ~30k rounds.
    locally {
      val rounds = graft.ops.LlmExtOps.bpeTrainRounds
      val t0 = System.nanoTime()
      SparkEntry.queries("text_bpe_train")(spark, out).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[sf1] text_bpe_train          ${sec}%8.2f s  " +
        f"($rounds rounds incl. corpus round 0, ${sec / rounds}%.2f s/round)")
    }
    // Batched-BPE lever probe (text_bpe_batch): K symbol-disjoint
    // merges per driver sync — print merges/sync so the lever's payoff
    // at 10x data is a measured number next to text_bpe_train's 1/sync.
    locally {
      val t0 = System.nanoTime()
      val merges = SparkEntry.queries("text_bpe_batch")(spark, out).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val rounds = 3
      println(f"[sf1] text_bpe_batch          ${sec}%8.2f s  " +
        f"($merges merges / $rounds syncs = ${merges.toDouble / rounds}%.1f " +
        f"merges/sync, ${sec / rounds}%.2f s/round)")
    }
    // Streaming change-feed probe: the snapshot batch is O(live rows)
    // by contract; a TAIL window carrying K vector deletions must cost
    // O(K + window appends), never O(store) — the number printed next
    // to the snapshot time is the evidence.
    locally {
      val path = s"$out/cf_store"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      val store = graft.journal.JournalStore.create(spark, path,
        epochSize = 1 << 20)
      store.append(graft.ops.JournalOps.journal(spark, out))
      val n = store.scan().count() // manifest-parse count, not a scan
      val ckpt = s"$out/cf_ckpt"; val sink = s"$out/cf_sink"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sink))
      def runOnce(): Double = {
        val t0 = System.nanoTime()
        val q = spark.readStream.format("journal")
          .option("changeFeed", "true").option("startMode", "snapshot")
          .load(path)
          .writeStream.format("parquet").option("path", sink)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.Once())
          .start()
        q.awaitTermination()
        (System.nanoTime() - t0) / 1e9
      }
      val tSnap = runOnce() // snapshot bootstrap: O(live rows)
      val del = store.deleteWhereDv(col("ukey") % 97L === 0L)
      val tTail = runOnce() // delete window: O(deleted), store untouched
      println(f"[sf1] changefeed_snapshot     $tSnap%8.2f s  rows=$n")
      println(f"[sf1] changefeed_delete_tail  $tTail%8.2f s  " +
        f"retractions=$del (window cost rides the deletions, not the " +
        f"$n-row store)")
    }
    // Incremental-ANALYZE refresh probe (VERDICT r15 item 1): after
    // analyze(), every append folds its batch sketch into the recorded
    // stats inside the same commit. The refresh must cost O(batch),
    // never O(store): time the SAME fixed 2000-row append on an
    // analyzed 1x store vs an analyzed 10x store — near-equal wall
    // time is the delta-sized witness, and the merged stats must still
    // be served (rows match the post-append surface).
    locally {
      def probe(dir: String, tag: String): Double = {
        val path = s"$out/ia_store_$tag"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
        val st = graft.journal.JournalStore.create(spark, path,
          epochSize = 1 << 20)
        st.append(graft.ops.JournalOps.journal(spark, dir))
        st.analyze(Seq("ns", "ukey", "ts", "val"))
        val batch = graft.ops.JournalOps.journal(spark, src)
          .where(col("seq") < 2000)
          .select(col("ns"), col("ukey"), col("ts"), col("payload"),
            col("val"))
        val t0 = System.nanoTime()
        st.append(batch)
        val sec = (System.nanoTime() - t0) / 1e9
        assert(st.analyzedRowCount.contains(
          st.manifest.fstats.map(_.rows).sum),
          s"merged stats must track the live surface at $tag")
        sec
      }
      val t1 = probe(src, "1x"); val t10 = probe(out, "10x")
      println(f"[sf1] analyze_incr_append     1x=$t1%.2f s 10x=$t10%.2f s " +
        f"(${t10 / t1}%.2fx — stat refresh rides the 2000-row batch, " +
        "not the corpus)")
    }
    // Distributed cstats-BOOTSTRAP witness (VERDICT r17 item 1): the
    // analyze() sidecar bootstrap is ONE distributed action — per-file
    // sketches assemble executor-side and the write tasks emit the
    // parquet parts, so wall time must ride the DATA (≈10x for 10x
    // rows spread over ~10x as many files), never a per-file driver
    // loop; the part count stays flush-bounded (64k rows/part). A
    // small epochSize forces a many-files layout at both scales so
    // the files axis is actually exercised.
    locally {
      def probe(dir: String, tag: String): (Double, Int, Int) = {
        val path = s"$out/cb_store_$tag"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
        val st = graft.journal.JournalStore.create(spark, path,
          epochSize = 16384)
        st.append(graft.ops.JournalOps.journal(spark, dir))
        val t0 = System.nanoTime()
        st.analyze(Seq("ns", "ukey", "val"))
        ((System.nanoTime() - t0) / 1e9, st.manifest.files.size,
          st.manifest.cstatsParts.size)
      }
      val (t1, f1, p1) = probe(src, "1x")
      val (t10, f10, p10) = probe(out, "10x")
      println(f"[sf1] cstats_bootstrap        1x=$t1%8.2f s " +
        f"($f1 files, $p1 parts)  10x=$t10%.2f s ($f10 files, $p10 " +
        f"parts)  (${t10 / t1}%.2fx — one distributed job; driver " +
        "holds part names only)")
    }
    // Scan-build witness (VERDICT r18 item 1 — the READ side of the
    // sidecar seam): round 18 left every filtered scan build
    // materializing the WHOLE sidecar on the driver; round 19's
    // manifest envelopes let the build open only the parts whose
    // file-name range admits a candidate. Grow both bootstrap stores'
    // sidecars to many parts (10 delta appends each), then time the
    // planning of a selective key probe: wall and part-probe count
    // must stay ~flat across the 10x files axis.
    locally {
      def probe(tag: String): (Double, Long, Int, Int) = {
        val path = s"$out/cb_store_$tag"
        val st = graft.journal.JournalStore.open(spark, path)
        val batch = graft.ops.JournalOps.journal(spark, src)
          .where(col("seq") < 200)
          .select(col("ns"), col("ukey"), col("ts"), col("payload"),
            col("val"))
        (0 until 10).foreach(_ => st.append(batch))
        val parts = st.manifest.cstatsParts.size
        val probes0 = graft.journal.ColumnStatsSidecar.partProbes.get()
        val t0 = System.nanoTime()
        val df = spark.read.format("journal").load(path)
          .where(col("ukey") === 123L)
        df.queryExecution.executedPlan // forces build(): prune + estimate
        val sec = (System.nanoTime() - t0) / 1e9
        (sec,
          graft.journal.ColumnStatsSidecar.partProbes.get() - probes0,
          parts, st.manifest.files.size)
      }
      val (t1, pr1, ps1, f1) = probe("1x")
      val (t10, pr10, ps10, f10) = probe("10x")
      println(f"[sf1] cstats_scan_build       1x=$t1%8.2f s " +
        f"($pr1 probes / $ps1 parts, $f1 files)  10x=$t10%.2f s " +
        f"($pr10 probes / $ps10 parts, $f10 files)  " +
        f"(${t10 / math.max(t1, 1e-9)}%.2fx — the envelope consult " +
        "opens only admitting parts; the driver never materializes " +
        "the sidecar)")
    }
    // writeStream.toTable staged double-write probe (VERDICT r14 item
    // 6): the V2 whole-batch table sink stages parquet per task, then
    // lands the staged rows as ONE ordinary store append — streamed
    // bytes are written twice by design (the structural price of V2's
    // per-task contract for a whole-batch sink; Delta ships a V1 sink
    // for the same reason). The path-based V1 journal sink
    // single-writes. Time BOTH on the same 10x batch so the constant
    // is a measured, stated number: route high-volume ingest through
    // the V1 path sink; toTable buys catalog naming at ~the printed
    // multiple.
    locally {
      val srcStore = s"$out/tt_src_store"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(srcStore))
      graft.journal.JournalStore.create(spark, srcStore, epochSize = 1 << 20)
        .append(graft.ops.JournalOps.journal(spark, out))
      val root = s"$out/tt_root"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      spark.conf.set("spark.sql.catalog.sf1cat", "graft.sources.JournalCatalog")
      spark.conf.set("spark.sql.catalog.sf1cat.root", root)
      spark.sql("CREATE TABLE sf1cat.ttdst (ns STRING, ukey BIGINT, " +
        "ts TIMESTAMP, payload STRING, val DOUBLE) USING journal " +
        "OPTIONS (epochSize '1048576')")
      def streamed(f: org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row] =>
            org.apache.spark.sql.streaming.StreamingQuery): Double = {
        val t0 = System.nanoTime()
        val q = f(spark.readStream.format("journal").load(srcStore)
          .select("ns", "ukey", "ts", "payload", "val")
          .writeStream.option("checkpointLocation", java.nio.file.Files
            .createTempDirectory("graft_tt_ck_").toString))
        try q.processAllAvailable() finally q.stop()
        (System.nanoTime() - t0) / 1e9
      }
      val tTable = streamed(_.toTable("sf1cat.ttdst"))
      val pathDst = s"$out/tt_path_dst"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(pathDst))
      val tPath = streamed(_.format("journal")
        .option("epochSize", (1 << 20).toString).start(pathDst))
      println(f"[sf1] stream_totable          $tTable%8.2f s  (staged " +
        f"double-write; V1 path sink single-write $tPath%.2f s → " +
        f"constant ${tTable / tPath}%.2fx)")
    }
    spark.stop()
  }
}
