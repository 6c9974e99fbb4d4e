package graft.ops

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class LlmExtSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("dedup_minhash_lsh: candidates recall the exact jaccard pairs (scale path)") {
    val docs = Tables(spark, sf, "documents").where(col("doc_id") < 500)
      .withColumn("w", split(col("text"), " "))
      .withColumn("sh", expr(
        "array_distinct(transform(sequence(0, size(w) - 3), " +
          "i -> concat_ws(' ', w[i], w[i+1], w[i+2])))"))
      .select("doc_id", "sh")
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 16).setBinary(true)
    val feat = tf.transform(docs)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42)
    val model = lsh.fit(feat)
    val cand = model.approxSimilarityJoin(feat, feat, 0.6, "dist")
      .select(col("datasetA.doc_id").as("a_id"), col("datasetB.doc_id").as("b_id"))
      .where(col("a_id") < col("b_id")).distinct()
    val exact = LlmOps.queries("dedup_near_jaccard")(spark, sf).select("a_id", "b_id")
    val nExact = exact.count()
    val recalled = exact.join(cand, Seq("a_id", "b_id")).count()
    assert(nExact > 0, "fixture should contain near-dup pairs")
    assert(recalled.toDouble / nExact >= 0.9,
      s"MinHashLSH recalled $recalled of $nExact exact pairs")
  }

  test("sim_ann_ivf is deterministic and returns exact cosines") {
    val r1 = LlmExtOps.queries("sim_ann_ivf")(spark, sf).collect().toSeq
    val r2 = LlmExtOps.queries("sim_ann_ivf")(spark, sf).collect().toSeq
    assert(r1 === r2)
    assert(r1.size === 10)
    // sims must agree with the brute-force cosine for the same vec_ids
    val brute = {
      val e = Tables(spark, sf, "embeddings")
      val q = e.where(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      e.where(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"), round(LlmOps.cosineFF2(col("embedding"), col("q_emb")), 4).as("sim"))
        .as[(Long, Double)].collect().toMap
    }
    r1.foreach { row =>
      assert(brute(row.getLong(0)) === row.getDouble(1), s"wrong cosine for ${row.getLong(0)}")
    }
    // report recall vs global top-10 (approx op: informational floor only)
    val global = LlmOps.queries("sim_cosine_topk")(spark, sf)
      .as[(Long, Double)].collect().map(_._1).toSet
    val recall = r1.map(_.getLong(0)).count(global.contains).toDouble / 10
    info(s"IVF recall@10 vs brute force: $recall")
  }

  test("agg_approx_distinct: HLL within 5% of exact (test-surface row)") {
    val l = Tables(spark, sf, "lineitem")
    val (approx, exact) = l
      .agg(approx_count_distinct("l_partkey").as("a"), countDistinct("l_partkey").as("e"))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile within tolerance of exact (test-surface companion)") {
    val l = Tables(spark, sf, "lineitem")
    val (approx, exact) = l.agg(
      expr("approx_percentile(l_quantity, 0.5, 1000)").as("a"),
      expr("percentile(l_quantity, 0.5)").as("e"))
      .as[(Double, Double)].head()
    assert(math.abs(approx - exact) <= 2.0, s"approx=$approx exact=$exact")
  }

  test("rolling hash: hand-computed values, stable across calls") {
    assert(LlmExtOps.rollingHash("") === 0L)
    assert(LlmExtOps.rollingHash("a") === 97L)
    assert(LlmExtOps.rollingHash("ab") === 97L * 257 + 98)
    assert(LlmExtOps.rollingHash("ab") === LlmExtOps.rollingHash("ab"))
  }

  test("dedup_simhash: identical token streams collide at hamming 0") {
    val dir = TestSpark.fixtureDir("documents" -> Seq(
      (0L, "spark makes big data small again today", "en", "s1", 38L),
      (1L, "spark makes big data small again today", "en", "s1", 38L),
      (2L, "completely unrelated text about cooking pasta nicely", "en", "s1", 52L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = LlmExtOps.queries("dedup_simhash")(spark, dir)
      .as[(Long, Long, Int)].collect().toSeq
    assert(out.contains((0L, 1L, 0)))
    assert(!out.exists(p => p._3 > 3))
  }

  test("text_decontaminate: training docs sharing eval 4-grams are flagged with counts") {
    val dir = TestSpark.fixtureDir("documents" -> Seq(
      // eval set (doc_id < 50): 4-grams of doc 1 = {a b c d, b c d e}
      (1L, "a b c d e", "en", "s1", 9L),
      // shares exactly "a b c d" -> n_shared 1
      (100L, "x a b c d y", "en", "s1", 11L),
      // shares both eval grams -> n_shared 2
      (101L, "a b c d e f", "en", "s1", 11L),
      // shares none -> absent from the output
      (102L, "p q r s t u", "en", "s1", 11L),
      // too short for a 4-gram -> absent
      (103L, "a b c", "en", "s1", 5L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = LlmExtOps.queries("text_decontaminate")(spark, dir)
      .select("doc_id", "n_shared").as[(Long, Long)].collect().toSeq
    assert(out === Seq((100L, 1L), (101L, 2L)))
  }

  test("dedup_span: hand-computed maximal duplicated intervals — " +
      "cross-doc spans, adjacent intra-doc repeats merge, clean and " +
      "short docs report zero") {
    val shared = "a b c d e f g h i j" // 10 shared tokens
    val rep8 = "m n o p q r s t"       // an 8-token unit repeated below
    val dir = TestSpark.fixtureDir("documents" -> Seq(
      // docs 1+2 share the 10-token prefix: dup anchors p=1..3 merge
      // into ONE island covering exactly the shared span (10 tokens)
      (1L, s"$shared x y", "en", "s1", 24L),
      (2L, s"$shared p q", "en", "s1", 24L),
      // intra-doc repetition: the two copies of rep8 are ADJACENT
      // anchors (p=1 and p=9, gap exactly k) — they merge into one
      // 16-token duplicated interval, not two
      (3L, s"$rep8 $rep8 z", "en", "s1", 35L),
      // clean doc: no 8-gram occurs twice anywhere
      (4L, "u v w one two three four five six seven", "en", "s1", 40L),
      // too short for any 8-gram
      (5L, "a b c", "en", "s1", 5L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = LlmExtOps.queries("dedup_span")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 12L, 10L, 1L), (2L, 12L, 10L, 1L),
      (3L, 17L, 16L, 1L), (4L, 10L, 0L, 0L), (5L, 3L, 0L, 0L)))
  }

  test("mm_decode_features: stubbed decoder plumbing produces typed features") {
    val dir = TestSpark.fixtureDir("documents" -> Seq(
      (0L, "ab", "en", "s1", 2L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = LlmExtOps.queries("mm_decode_features")(spark, dir)
      .as[(Long, Int, Int, Long)].collect().toSeq
    assert(out === Seq((0L, 2, 97, 195L))) // len=2, 'a'=97, 97+98=195
  }

  test("dedup_minhash: declared banded-minhash output recalls every exact jaccard pair") {
    val exact = LlmOps.queries("dedup_near_jaccard")(spark, sf)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val mh = LlmExtOps.queries("dedup_minhash")(spark, sf)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(exact.subsetOf(mh), s"missed: ${exact -- mh}")
  }

  test("simhash signatures: 60-sum single-pass equals the exploded ±1 formulation") {
    val docs = Tables(spark, sf, "documents")
    val fast = LlmExtOps.simhashSignatures(docs)
    // the r1 formulation: explode 60 bit rows per token, ±1 accumulate
    val slow = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .select(col("doc_id"),
              expr("CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)").as("h"),
              explode(expr("sequence(0, 59)")).as("bit"))
      .groupBy("doc_id", "bit")
      .agg(sum(when(expr("(h >> bit) & 1") === 1, 1).otherwise(-1)).as("acc"))
      .groupBy("doc_id")
      .agg(sum(when(col("acc") > 0, expr("shiftleft(1L, bit)")).otherwise(0L)).as("sig"))
    assert(fast.except(slow).count() === 0)
    assert(slow.except(fast).count() === 0)
    assert(fast.count() === docs.count())
  }

  test("lsh_buckets native expression equals the SQL aggregate formulation") {
    graft.expr.GraftFunctions.register(spark)
    val e = Tables(spark, sf, "embeddings")
    val native = e.select(col("vec_id"),
        expr(s"lsh_buckets(embedding, ${LlmExtOps.lshTables}, ${LlmExtOps.lshPlanes})").as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val sqlForm = e.select(col("vec_id"),
        array((0 until LlmExtOps.lshTables)
          .map(t => expr(LlmExtOps.lshBucketSqlSpark(t))): _*).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(native === sqlForm)
    assert(native.nonEmpty)
  }

  test("lsh_buckets: NULL embedding poisons to all-zero buckets; args must be literals") {
    graft.expr.GraftFunctions.register(spark)
    val df = Seq((1L, Some(Array.fill(64)(0.5f))), (2L, None))
      .toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"), expr("lsh_buckets(embedding, 4, 15)").as("b"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Int](1).toSeq)).toMap
    // same poisoned-fold semantics as the SQL twin (CASE WHEN NULL > 0 →
    // ELSE 0): the row keeps bucket 0 everywhere instead of vanishing
    assert(out(2L) === Seq(0, 0, 0, 0))
    assert(out(1L) !== null)
    // non-literal tables/planes → clean analysis-time error, not an NPE
    val err = intercept[Exception] {
      df.select(expr("lsh_buckets(embedding, vec_id, 15)")).collect()
    }
    assert(err.getMessage.contains("lsh_buckets"), err.getMessage)
  }

  test("sim_ann_lsh: multi-table multi-probe recall >= 0.9 vs exact top-10") {
    val out = LlmExtOps.queries("sim_ann_lsh")(spark, sf)
      .as[(Long, Int, Double)].collect().toSeq
    assert(out.nonEmpty && out.size <= 10)
    assert(out.map(_._3) === out.map(_._3).sorted.reverse) // descending sim
    // every candidate is recalled by between 1 and K tables
    assert(out.map(_._2).forall(n => n >= 1 && n <= LlmExtOps.lshTables))
    // sims are the EXACT cosine values (LSH only prunes candidates)
    val brute = LlmOps.queries("sim_cosine_topk")(spark, sf)
      .as[(Long, Double)].collect().toSeq
    val bruteMap = brute.toMap
    out.foreach { case (id, _, sim) =>
      bruteMap.get(id).foreach(b => assert(b === sim)) }
    // the ANN output must recover >= 90% of the exact top-10 — the
    // K-table union + multi-probe levers exist exactly for this
    val exactIds = brute.map(_._1).toSet
    val recall = out.map(_._1).count(exactIds.contains).toDouble / exactIds.size
    assert(recall >= 0.9, s"LSH recall $recall < 0.9 (got ${out.map(_._1)})")
  }

  test("sim_ann_index: a corpus change under an UNCHANGED row count is " +
      "caught by the content fingerprint and triggers a rebuild") {
    graft.expr.GraftFunctions.register(spark)
    // 40 vectors; the "changed" corpus NEGATES every non-query vector —
    // identical row count, different content, completely different
    // top-10 (a count-only identity check serves the stale buckets)
    def vecs(flip: Boolean) = (0L until 40L).map { id =>
      val base = Array.tabulate(64)(j =>
        (((id * 31 + j * 7) % 97).toFloat / 97f) - 0.5f)
      (id, if (flip && id > 0L) base.map(-_) else base)
    }.toDF("vec_id", "embedding")
    val dir = TestSpark.fixtureDir("embeddings" -> vecs(flip = false))
    def probe() = LlmExtOps.queries("sim_ann_index")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    def recompute() = LlmExtOps.queries("sim_ann_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(probe() === recompute())
    val idxPath = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      "graft_annindex_" + graft.ops.JournalOps.tmpTag(dir)).toString
    val fp1 = graft.journal.JournalStore.open(spark, idxPath)
      .manifest.meta("source_fp")
    // overwrite the corpus IN PLACE: same path, same count, new bytes
    vecs(flip = true).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    assert(probe() === recompute(),
      "index served stale buckets after the corpus changed under an " +
        "unchanged row count")
    val fp2 = graft.journal.JournalStore.open(spark, idxPath)
      .manifest.meta("source_fp")
    assert(fp1 !== fp2, "fingerprint did not change with the content")
  }

  test("sim_ann_index: append-only corpus growth TOPS UP the index " +
      "(delta append, no rebuild) and probes stay oracle-exact") {
    graft.expr.GraftFunctions.register(spark)
    def vecs(ids: Range) = ids.map { id =>
      val base = Array.tabulate(64)(j =>
        (((id * 31 + j * 7) % 97).toFloat / 97f) - 0.5f)
      (id.toLong, base)
    }.toDF("vec_id", "embedding")
    val dir = TestSpark.fixtureDir("embeddings" -> vecs(0 until 40))
    def probe() = LlmExtOps.queries("sim_ann_index")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    def recompute() = LlmExtOps.queries("sim_ann_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(probe() === recompute())
    val idxPath = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      "graft_annindex_" + graft.ops.JournalOps.tmpTag(dir)).toString
    // a rebuild deletes the store dir; this sentinel survives only a top-up
    val sentinel = java.nio.file.Paths.get(idxPath, "_spec_sentinel")
    java.nio.file.Files.write(sentinel, Array[Byte](1))
    val seqBefore = graft.journal.JournalStore.open(spark, idxPath)
      .manifest.maxSeq
    // grow the corpus append-only: 20 new vectors, old rows untouched
    vecs(40 until 60).coalesce(1).write.mode("append")
      .parquet(s"$dir/embeddings.parquet")
    assert(probe() === recompute(),
      "index did not serve the grown corpus correctly")
    assert(java.nio.file.Files.exists(sentinel),
      "append-only growth rebuilt the index instead of topping up")
    val st = graft.journal.JournalStore.open(spark, idxPath)
    assert(st.manifest.maxSeq > seqBefore, "top-up appended no rows")
    assert(st.manifest.meta("source_max_id") === "59")
    // an in-place edit of an OLD row (not growth) must still rebuild
    vecs(0 until 60).withColumn("embedding",
        when(col("vec_id") === 7L, expr("transform(embedding, x -> -x)"))
          .otherwise(col("embedding")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    assert(probe() === recompute(),
      "index served stale buckets after an old row changed")
    assert(!java.nio.file.Files.exists(sentinel),
      "an in-place edit of an old row must trigger a full rebuild")
  }

  test("dedup_embedding_lsh pairs are a subset of the exact near-dup pairs") {
    // LSH banding trades recall, never precision: every surviving pair
    // carries the EXACT rounded cosine, so on the slice dedup_embedding
    // covers (both ids < 500) the LSH pairs must be exactly a subset of
    // the brute-force pairs, with identical sims.
    val lsh = LlmExtOps.queries("dedup_embedding_lsh")(spark, sf)
      .where(col("a_id") < 500 && col("b_id") < 500)
      .select("a_id", "b_id", "sim")
    val exact = LlmExtOps.queries("dedup_embedding")(spark, sf)
      .select("a_id", "b_id", "sim")
    assert(lsh.join(exact, Seq("a_id", "b_id", "sim"), "left_anti").count() == 0,
      "an LSH pair missing from the exact pairs would mean a false positive")
  }

  test("text_cms_topk: estimates are one-sided (est >= exact count)") {
    val rows = LlmExtOps.queries("text_cms_topk")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val est = r.getAs[Long]("est")
      assert(est >= n, s"CMS must never undercount: ${r}")
    }
  }

  test("text_fingerprint_rolling: declarative query equals the Scala accumulator") {
    val out = LlmExtOps.queries("text_fingerprint_rolling")(spark, sf)
      .as[(Long, Long)].collect().toMap
    val expect = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) => id -> LlmExtOps.rollingHash(t) }.toMap
    assert(out === expect)
    assert(out.nonEmpty)
  }

  test("connectedComponents: star pre-rounds cut total rounds on a deep chain") {
    // 256-node chain — the pathological diameter case for label
    // propagation. Large-star rounds contract the chain
    // multiplicatively BEFORE the label loop, so the total number of
    // driver-synchronized rounds drops; labels must be identical.
    val chain = (0L until 255L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val (r0, n0) = LlmExtOps.connectedComponentsWithRounds(chain, starRounds = 0)
    val (r2, n2) = LlmExtOps.connectedComponentsWithRounds(chain, starRounds = 2)
    val expect = (0L to 255L).map(i => (i, 0L, i == 0L)).toSet
    assert(r0.as[(Long, Long, Boolean)].collect().toSet === expect)
    assert(r2.as[(Long, Long, Boolean)].collect().toSet === expect)
    assert(n2 < n0, s"star pre-rounds should cut total rounds: $n2 vs $n0")
  }

  test("dedup_clusters: min-id propagation finds connected components") {
    // 0-1, 1-2 one cluster (via 'spark makes big data' 3-shingle overlap
    // chain); 5-6 a second; 9 isolated (never appears)
    val dir = TestSpark.fixtureDir("documents" -> Seq(
      (0L, "aa bb cc dd ee", "en", "s1", 14L),
      (1L, "aa bb cc dd ff", "en", "s1", 14L),
      (2L, "zz bb cc dd ff", "en", "s1", 14L),
      (5L, "qq ww ee rr tt yy", "en", "s1", 17L),
      (6L, "qq ww ee rr tt uu", "en", "s1", 17L),
      (9L, "totally different words here now", "en", "s1", 32L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val pairs = LlmOps.queries("dedup_near_jaccard")(spark, dir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 2L)))
    assert(pairs.contains((5L, 6L)))
    val out = LlmExtOps.queries("dedup_clusters")(spark, dir)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out.filter(_._2 == 0L).map(_._1).toSet === Set(0L, 1L, 2L))
    assert(out.filter(_._2 == 5L).map(_._1).toSet === Set(5L, 6L))
    assert(out.filter(_._3).map(_._1).toSet === Set(0L, 5L)) // one survivor per cluster
    assert(!out.exists(_._1 == 9L)) // isolated docs are not in the pair graph
  }

  test("connectedComponents runs to fixpoint on a path longer than any fixed cap") {
    // path 0-1-2-...-24: min-label propagation advances one hop per
    // iteration, so this needs 24 iterations — a hard 20-iteration cap
    // (the original implementation) silently mislabels the far end
    val path = (0L until 24L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val out = LlmExtOps.connectedComponents(path)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out.size === 25)
    assert(out.forall(_._2 == 0L), out.filter(_._2 != 0L).toString)
    assert(out.count(_._3) === 1)
  }

  test("mm_decode_features declarative query equals the mapPartitions decoder twin") {
    val decl = LlmExtOps.queries("mm_decode_features")(spark, sf)
      .collect().map(_.toString).toSeq
    val mp = LlmExtOps.decodeFeaturesMapPartitions(spark, sf)
      .collect().map(_.toString).toSeq
    assert(decl === mp)
  }

  test("text_pii_scrub masks emails and number runs, counts redactions") {
    val dir = TestSpark.fixtureDir("documents" -> Seq(
      (0L, "contact bob.smith+x@example.co.uk or call +1 (555) 123-4567 now", "en", "s1", 62L),
      (1L, "no pii here at all", "en", "s1", 18L),
      (2L, "two mails a@b.io c@d.org and id 12345678", "en", "s1", 40L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = LlmExtOps.queries("text_pii_scrub")(spark, dir)
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(out(0)._2 === 1 && out(0)._3 === 1)
    assert(out(0)._4.contains("<EMAIL>") && out(0)._4.contains("<NUMBER>"))
    assert(out(1) === ((1L, 0, 0, "no pii here at all")))
    assert(out(2)._2 === 2 && out(2)._3 === 1)
  }

  test("decodeStub is deterministic on raw bytes") {
    assert(LlmExtOps.decodeStub("ab".getBytes("UTF-8")) === ((2, 97, 195L)))
    assert(LlmExtOps.decodeStub(Array.emptyByteArray) === ((0, 0, 0L)))
  }

  test("journal-corpus ANN index: identity is a MANIFEST read (zero " +
      "corpus data files opened), append-only growth tops up, a " +
      "row-losing corpus commit rebuilds") {
    graft.expr.GraftFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_annj_").toString
    val corpusPath = s"$dir/corpus"; val idxPath = s"$dir/index"
    def vec(id: Long): Seq[Float] = Seq.tabulate(64)(j =>
      (((id * 31 + j * 7) % 97).toFloat / 97f) - 0.5f)
    def rows(ids: Range) = ids.map { id =>
      ("emb", id.toLong, graft.TestSpark.ts("2024-01-01 00:00:00"),
        Seq.tabulate(64)(j => (((id * 31 + j * 7) % 97).toFloat / 97f) - 0.5f)
          .mkString("[", ",", "]"), 0.0)
    }.toDF("ns", "ukey", "ts", "payload", "val")
    val corpus = graft.journal.JournalStore.create(spark, corpusPath, 1000000L)
    corpus.append(rows(1 until 40))
    val idx = LlmExtOps.annIndexForJournalCorpus(spark, corpusPath, idxPath)
    val q = vec(1L)
    val first = LlmExtOps.annProbe(spark, idx, q)
      .collect().map(_.getLong(0)).toSeq
    assert(first.nonEmpty && first.head === 1L) // self-similarity wins

    // ---- append-only growth: top-up, not rebuild (sentinel survives),
    // and the new vector is probe-visible. Use a clone of vector 1 so
    // it must land at the TOP of vector-1's probe.
    val sentinel = java.nio.file.Paths.get(idxPath, "_spec_sentinel")
    java.nio.file.Files.write(sentinel, Array[Byte](1))
    corpus.append(Seq(("emb", 999L, graft.TestSpark.ts("2024-01-02 00:00:00"),
      q.mkString("[", ",", "]"), 0.0)).toDF("ns", "ukey", "ts", "payload", "val"))
    val idx2 = LlmExtOps.annIndexForJournalCorpus(spark, corpusPath, idxPath)
    val grown = LlmExtOps.annProbe(spark, idx2, q)
      .collect().map(_.getLong(0)).toSeq
    assert(grown.take(2).toSet === Set(1L, 999L),
      s"top-up missed the appended clone: $grown")
    assert(java.nio.file.Files.exists(sentinel),
      "append-only corpus growth rebuilt the index instead of topping up")

    // ---- THE metadata pin: delete every corpus DATA file (manifest
    // stays). Validation must still serve the index — it reads the
    // corpus MANIFEST only; any content-fingerprint scan would throw.
    val segRoot = java.nio.file.Paths.get(corpusPath, "segments")
    val walk = java.nio.file.Files.walk(segRoot)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.toList.reverse
        .filter(java.nio.file.Files.isRegularFile(_))
        .foreach(java.nio.file.Files.delete(_))
    } finally walk.close()
    val idx3 = LlmExtOps.annIndexForJournalCorpus(spark, corpusPath, idxPath)
    val served = LlmExtOps.annProbe(spark, idx3, q)
      .collect().map(_.getLong(0)).toSeq
    assert(served === grown,
      "warm probe of an unchanged journal corpus must serve from the " +
        "index with zero corpus data files opened")

    // ---- a row-losing corpus commit (vector withdrawn) rebuilds: the
    // dead vector leaves the index. Rebuild needs readable data files —
    // recreate the corpus at the same path.
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(corpusPath))
    val corpus2 = graft.journal.JournalStore.create(spark, corpusPath, 1000000L)
    corpus2.append(rows(1 until 40))
    corpus2.append(Seq(("emb", 999L, graft.TestSpark.ts("2024-01-02 00:00:00"),
      q.mkString("[", ",", "]"), 0.0)).toDF("ns", "ukey", "ts", "payload", "val"))
    LlmExtOps.annIndexForJournalCorpus(spark, corpusPath, idxPath) // rebuild (new store)
    java.nio.file.Files.write(sentinel, Array[Byte](1))
    corpus2.deleteWhereDv(col("ukey") === 999L)
    val idx4 = LlmExtOps.annIndexForJournalCorpus(spark, corpusPath, idxPath)
    val afterDelete = LlmExtOps.annProbe(spark, idx4, q)
      .collect().map(_.getLong(0)).toSeq
    assert(!afterDelete.contains(999L),
      "a row-losing corpus commit must rebuild the index")
    assert(!java.nio.file.Files.exists(sentinel),
      "delete-dv on the corpus must trigger a full rebuild, not a top-up")
  }

  test("emb_kmeans equals an independent driver-side Lloyd reference " +
    "(init, exact distances, floor-mean updates, tie-breaks)") {
    // Re-derive the whole 3-round iteration in plain Scala from the raw
    // fixture and demand bit-equality — pins the distributed plan's
    // argmin, the (cluster, dim) partial-sum update, and the empty-
    // cluster carry-forward against straight-line arithmetic.
    // half-away-from-zero at scale 0 — the engines' shared rule
    // (math.round is half-UP, which differs for negative ties)
    def r0(y: Double): Long =
      (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
    val raw = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => r0(x.toDouble * 1000000.0)).toArray)
      .sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.foldLeft(0L)((acc, i) =>
        acc + (a(i) - b(i)) * (a(i) - b(i)))
    var cents: Vector[Array[Long]] = raw.take(4).map(_._2).toVector
    var asg: Map[Long, Int] = Map.empty
    def assignAll(): Unit = asg = raw.map { case (id, q) =>
      id -> cents.zipWithIndex.minBy { case (c, cl) => (d2(q, c), cl) }._2
    }.toMap
    for (round <- 1 to 3) {
      assignAll()
      if (round < 3) {
        val byCl = raw.groupBy { case (id, _) => asg(id) }
        cents = cents.zipWithIndex.map { case (old, cl) =>
          byCl.get(cl).fold(old) { members =>
            val n = members.length
            old.indices.map(i => math.floor(
              members.map(_._2(i)).sum.toDouble / n).toLong).toArray
          }
        }
      }
    }
    val got = LlmExtOps.queries("emb_kmeans")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val want = raw.map { case (id, q) =>
      val cl = asg(id); (id, cl, d2(q, cents(cl))) }.toSeq
    assert(got === want)
  }

  test("sim_ann_ivf_kmeans: nprobe=2 over the trained codebook recalls " +
    "the exact integer-cosine top-10") {
    def r0(y: Double): Long =
      (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
    val vecs = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => r0(x.toDouble * 1000000.0)).toArray)
    val qq = vecs.find(_._1 == 0L).get._2
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact = vecs.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(v, qq)) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    val got = LlmExtOps.queries("sim_ann_ivf_kmeans")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got.size === 10)
    val recall = (exact & got).size / 10.0
    assert(recall >= 0.7, s"recall@10 = $recall (exact=$exact got=$got)")
  }

  test("text_dedup_paragraph equals a driver-side first-occurrence fold " +
    "(block split, corpus-wide winner rule, reassembly order)") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val seen = scala.collection.mutable.Set.empty[String]
    val want = docs.map { case (id, text) =>
      val w = text.split(" ", -1)
      val blocks = w.grouped(8).map(_.mkString(" ")).toSeq
      val kept = blocks.filter(b => seen.add(b)) // first occurrence wins
      (id, blocks.size.toLong, kept.size.toLong, kept.mkString(" "))
    }.toSeq
    val got = LlmExtOps.queries("text_dedup_paragraph")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got === want)
    assert(want.map(_._2).sum > want.map(_._3).sum,
      "fixture should contain repeated blocks")
  }

  test("dedup_semantic: every dropped vector has a smaller-id clustermate " +
    "at cosine >= 0.45; every survivor has none") {
    val asg = LlmExtOps.queries("emb_kmeans")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos4(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      val y = dot / (math.sqrt(na) * math.sqrt(nb)) * 10000.0
      (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)) / 10000.0
    }
    val survivors = LlmExtOps.queries("dedup_semantic")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(survivors.nonEmpty && survivors.size < vecs.size,
      "fixture should contain semantic dups at 0.45")
    vecs.keys.foreach { id =>
      val hasDup = vecs.keys.exists(o => o < id && asg(o) == asg(id) &&
        cos4(vecs(o), vecs(id)) >= 0.45)
      assert(survivors.contains(id) === !hasDup,
        s"vec $id survivor=${survivors.contains(id)} but hasDup=$hasDup")
    }
  }

  test("text_quality_model: map-side scoring (no join, no corpus " +
      "shuffle before the per-source rollup), sane funnel") {
    val df = LlmExtOps.queries("text_quality_model")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the returned frame is score → rollup: the broadcast weight map is
    // a literal, so there must be NO join OPERATOR anywhere in the plan
    // (match operator names, not the substring — the learned vocabulary
    // itself contains words like 'join'), and the only exchanges are
    // the rollup's hash partitioning + the output sort's range
    // partitioning
    Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct").foreach { op =>
      assert(!plan.contains(op), s"unexpected $op in:\n$plan")
    }
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <= 2 exchanges (rollup + sort):\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val nDocs = rows.map(_.getLong(1)).sum
    assert(nDocs === Tables(spark, sf, "documents").count())
    val nKept = rows.map(_.getLong(2)).sum
    assert(nKept > 0 && nKept <= nDocs)
    rows.foreach { r =>
      val p = r.getDouble(3)
      assert(p >= 0.0 && p <= 1.0, s"avg_prob out of range: $r")
    }
  }

  test("text_bpe_encode: lossless segmentation, bounded vocab, counts " +
      "agree with text_pack_bpe") {
    // the encode map must SEGMENT, never rewrite: concatenating a
    // word's tokens reproduces the word, for every vocabulary word
    val wtok = LlmExtOps.bpeWordTokens(spark, sf)
      .select(col("w"), expr("concat_ws('', ts)").as("glued"),
        col("ts")).collect()
    assert(wtok.nonEmpty)
    wtok.foreach { r =>
      assert(r.getString(0) === r.getString(1),
        s"BPE tokens must concatenate back to the word: ${r.getString(0)}")
      assert(r.getSeq[String](2).nonEmpty)
    }
    // token vocabulary = base [a-z] symbols + at most one new symbol
    // per merge round
    val tokens = wtok.flatMap(_.getSeq[String](2)).toSet
    assert(tokens.size <= 26 + LlmExtOps.bpeTrainRounds)
    assert(tokens.exists(_.length >= 2),
      "six merge rounds over the fixture must produce multi-char tokens")
    // the packing row's token counts are the encode row's counts
    val encCounts = LlmExtOps.queries("text_bpe_encode")(spark, sf)
      .select("doc_id", "n_bpe_tokens").as[(Long, Long)].collect().toMap
    val packCounts = LlmExtOps.queries("text_pack_bpe")(spark, sf)
      .select("doc_id", "n_tok").as[(Long, Int)].collect().toMap
    assert(packCounts.nonEmpty)
    packCounts.foreach { case (id, n) =>
      assert(encCounts.getOrElse(id, 0L) === n.toLong,
        s"doc $id: pack n_tok $n != encode count ${encCounts.get(id)}")
    }
  }
}
