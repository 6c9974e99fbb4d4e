package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.2.3 — property-based invariants (scalacheck driven directly;
  * no scalatest bridge available offline). */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(10)

  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val edgesGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(15, for {
      a <- Gen.choose(0L, 11L)
      b <- Gen.choose(0L, 11L) if a != b
    } yield (math.min(a, b), math.max(a, b)))

  test("connectedComponents equals a union-find model on random graphs") {
    check(Prop.forAll(edgesGen) { edges =>
      edges.isEmpty || {
        val got = ops.LlmExtOps.connectedComponents(
            edges.distinct.toDF("a_id", "b_id"))
          .as[(Long, Long, Boolean)].collect().toSet
        // reference model: driver-side union-find with min-root election
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expect = parent.keys.map { v =>
          val root = find(v)
          (v, root, v == root)
        }.toSet
        got == expect
      }
    })
  }

  private val recordsGen: Gen[List[(String, Long, String)]] =
    Gen.listOfN(12, for {
      ns <- Gen.oneOf("a", "b")
      key <- Gen.choose(1L, 3L)
      payload <- Gen.alphaStr.map(_.take(4))
    } yield (ns, key, payload))

  test("stateAt(seq) equals the left-fold of history up to seq (marasa invariant)") {
    check(Prop.forAll(recordsGen, Gen.choose(0, 11)) { (recs, cut) =>
      recs.isEmpty || {
        val df = recs.zipWithIndex.map { case ((ns, k, p), i) =>
          (i.toLong, ns, k, TestSpark.ts("2024-01-01 00:00:01"), p, 0.0)
        }.toDF("seq", "ns", "ukey", "ts", "payload", "val")
        val got = ops.JournalOps.stateAt(df, col("seq") <= cut.toLong)
          .select("ns", "ukey", "payload").as[(String, Long, String)].collect().toSet
        // reference model: fold deltas in seq order into a Map
        val expect = recs.zipWithIndex.filter(_._2 <= cut)
          .foldLeft(Map.empty[(String, Long), String]) {
            case (m, ((ns, k, p), _)) => m.updated((ns, k), p)
          }.map { case ((ns, k), p) => (ns, k, p) }.toSet
        got == expect
      }
    })
  }

  test("stateAt is incrementally consistent: replaying (s, s'] onto stateAt(s) = stateAt(s')") {
    check(Prop.forAll(recordsGen, Gen.choose(0, 11), Gen.choose(0, 11)) { (recs, a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      recs.isEmpty || {
        val df = recs.zipWithIndex.map { case ((ns, k, p), i) =>
          (i.toLong, ns, k, TestSpark.ts("2024-01-01 00:00:01"), p, 0.0)
        }.toDF("seq", "ns", "ukey", "ts", "payload", "val")
        // checkpoint-at-lo (state rows re-tagged with their last_seq)
        // plus the raw tail (lo, hi] must reproduce stateAt(hi) exactly —
        // the bounded-replay invariant JournalStore.stateAt relies on.
        val base = ops.JournalOps.stateAt(df, col("seq") <= lo.toLong)
          .select(col("ns"), col("ukey"), col("last_seq").as("seq"), col("payload"))
        val tail = df.where(col("seq") > lo.toLong && col("seq") <= hi.toLong)
          .select("ns", "ukey", "seq", "payload")
        val replayed = ops.JournalOps.stateAt(base.unionByName(tail), lit(true))
          .select("ns", "ukey", "payload", "last_seq")
          .as[(String, Long, String, Long)].collect().toSet
        val direct = ops.JournalOps.stateAt(df, col("seq") <= hi.toLong)
          .select("ns", "ukey", "payload", "last_seq")
          .as[(String, Long, String, Long)].collect().toSet
        replayed == direct
      }
    })
  }

  test("dedup_near_jaccard agrees with a Scala-set reference model") {
    check(Prop.forAll(Gen.listOfN(6,
      Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, "en", "s1", t.length.toLong)
      }
      val dir = TestSpark.fixtureDir("documents" ->
        docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
      val got = ops.LlmOps.queries("dedup_near_jaccard")(spark, dir)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      // reference: distinct word-3-shingle sets, exact jaccard >= 0.4
      def sh(t: String): Set[String] =
        t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val expect = (for {
        a <- docs; b <- docs if a._1 < b._1
        sa = sh(a._2); sb = sh(b._2)
        if sa.nonEmpty && sb.nonEmpty
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        // mirror the query's rounding before the threshold compare
        if BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP) >= 0.4
      } yield (a._1, b._1)).toSet
      got == expect
    })
  }

  test("key-stat file pruning never changes history(ns, key) results") {
    // the data-skipping invariant: for ANY key — present in one epoch,
    // both, or neither — the manifest-stats-pruned read equals the full
    // scan filtered row-for-row (pruning is IO-only, never semantic)
    val keysGen = Gen.listOfN(6, Gen.choose(0L, 30L))
    val fewTrials = SCTest.Parameters.default.withMinSuccessfulTests(5)
    val r = SCTest.check(fewTrials, Prop.forAll(keysGen, keysGen) { (ks1, ks2) =>
      ks1.isEmpty || ks2.isEmpty || {
        val path = java.nio.file.Files
          .createTempDirectory("graft_kprop_").toString + "/s"
        val store = journal.JournalStore.create(spark, path,
          epochSize = ks1.size.toLong)
        def batch(keys: List[Long], base: Int) = keys.zipWithIndex.map {
          case (k, i) =>
            ("ns", k, TestSpark.ts(
              f"2024-01-01 00:${(base + i) / 60}%02d:${(base + i) % 60}%02d"),
              s"p$k-$i", 1.0)
        }.toDF("ns", "ukey", "ts", "payload", "val")
        store.append(batch(ks1, 0))
        store.append(batch(ks2, 100))
        val probes = (ks1 ++ ks2).distinct.take(3) :+ 99L
        probes.forall { k =>
          val pruned = store.history("ns", Some(k))
            .collect().map(_.toString).sorted.toSeq
          val full = store.scan()
            .where(col("ns") === "ns" && col("ukey") === k)
            .orderBy("seq").collect().map(_.toString).sorted.toSeq
          pruned == full
        }
      }
    })
    assert(r.passed, r.status.toString)
  }

  test("stateAtTs equals the brute-force ts-filtered fold for any probe") {
    // fuzzes the checkpoint-certificate + ts-file-pruning machinery:
    // random batch sizes (auto-checkpoints land at varying boundaries),
    // occasional NULL ts rows (must never ride a checkpoint into the
    // result), probes before/inside/after the data's ts range
    val batchGen = Gen.listOfN(2, Gen.listOfN(5, for {
      key <- Gen.choose(1L, 4L)
      nullTs <- Gen.frequency(4 -> false, 1 -> true)
    } yield (key, nullTs)))
    val fewTrials = SCTest.Parameters.default.withMinSuccessfulTests(5)
    val r = SCTest.check(fewTrials,
      Prop.forAll(batchGen, Gen.choose(-1, 11)) { (batches, probeMin) =>
        batches.flatten.isEmpty || {
          val path = java.nio.file.Files
            .createTempDirectory("graft_tsprop_").toString + "/s"
          val store = journal.JournalStore.create(spark, path, epochSize = 3)
          var minute = 0
          batches.foreach { b =>
            val rows = b.map { case (k, nul) =>
              minute += 1
              val t = if (nul) "CAST(NULL AS TIMESTAMP)"
                      else f"TIMESTAMP'2024-01-01 00:$minute%02d:00'"
              s"('ns', ${k}L, $t, 'p$minute', 1.0D)"
            }.mkString(", ")
            store.append(spark.sql(
              s"SELECT * FROM VALUES $rows AS t(ns, ukey, ts, payload, val)"))
          }
          val t = TestSpark.ts(f"2024-01-01 00:${probeMin.max(0)}%02d:30")
          val got = store.stateAtTs(t)
            .collect().map(_.toString).sorted.toSeq
          val brute = store.scan().where(col("ts") <= t)
            .groupBy("ns", "ukey")
            .agg(max_by(col("payload"), col("seq")).as("payload"),
                 max("seq").as("last_seq"))
            .collect().map(_.toString).sorted.toSeq
          got == brute
        }
      })
    assert(r.passed, r.status.toString)
  }

  test("incremental stat fold == fresh analyze over the union (stat " +
      "keys identical, packed HLL registers byte-equal)") {
    // THE invariant incremental ANALYZE rests on: analyze(A) folded
    // with sketch(B) at append time must equal analyze(A ∪ B) exactly —
    // rows, nulls, extrema, ndv, and the raw packed registers
    // (union-of-sketches ≡ sketch-of-union). Histograms and the
    // histogram capture point are deliberately excluded: boundaries
    // don't merge and the serving side bounds their staleness instead.
    val batchGen = Gen.listOfN(8, for {
      ns <- Gen.oneOf("a", "b")
      k <- Gen.choose(0L, 9L)
      p <- Gen.alphaStr.map(_.take(4))
      v <- Gen.option(Gen.choose(-5, 5).map(_.toDouble))
    } yield (ns, k, p, v))
    val few = SCTest.Parameters.default.withMinSuccessfulTests(5)
    val r = SCTest.check(few, Prop.forAll(batchGen, batchGen) { (a, b) =>
      a.isEmpty || b.isEmpty || {
        def df(xs: List[(String, Long, String, Option[Double])]) =
          xs.map { case (ns, k, p, v) =>
            (ns, k, TestSpark.ts("2024-01-01 00:00:01"), p, v)
          }.toDF("ns", "ukey", "ts", "payload", "val")
        val cols = Seq("ns", "ukey", "payload", "val")
        def stats(build: journal.JournalStore => Unit): Map[String, String] = {
          val path = java.nio.file.Files
            .createTempDirectory("graft_pinc_").toString + "/s"
          val st = journal.JournalStore.create(spark, path, 1000)
          build(st)
          st.manifest.meta.filter { case (k2, _) =>
            (k2 == "stats.rows" || k2.startsWith("stats.col.")) &&
              !k2.endsWith(".hist")
          }
        }
        val inc = stats { st =>
          st.append(df(a)); st.analyze(cols); st.append(df(b)) }
        val full = stats { st =>
          st.append(df(a)); st.append(df(b)); st.analyze(cols) }
        inc == full
      }
    })
    assert(r.passed, r.status.toString)
  }

  test("stats refold after deleteWhere == fresh analyze over the " +
      "survivors (stat keys identical, packed HLL registers byte-equal)") {
    // THE invariant the cstats sidecar rests on: analyze(A) then
    // erase(P) — which refolds the merged stats from the surviving
    // files' per-file sketches — must equal analyzing the survivors
    // from scratch, exactly: rows, nulls, extrema, ndv, raw registers.
    // (Histograms and the capture point are excluded as in the append
    // invariant: the refold deliberately keeps the old capture and the
    // serving side bounds its staleness.)
    val batchGen = Gen.listOfN(10, for {
      ns <- Gen.oneOf("a", "b")
      k <- Gen.choose(0L, 9L)
      p <- Gen.alphaStr.map(_.take(4))
      v <- Gen.option(Gen.choose(-5, 5).map(_.toDouble))
    } yield (ns, k, p, v))
    val few = SCTest.Parameters.default.withMinSuccessfulTests(5)
    val r = SCTest.check(few, Prop.forAll(batchGen, Gen.choose(0L, 9L)) {
      (a, cutKey) =>
      // skip the all-erased case (analyze refuses an empty store) —
      // nothing-erased stays in: the no-op sweep must also agree
      a.isEmpty || a.forall(_._2 > cutKey) || {
        def df(xs: List[(String, Long, String, Option[Double])]) =
          xs.map { case (ns, k, p, v) =>
            (ns, k, TestSpark.ts("2024-01-01 00:00:01"), p, v)
          }.toDF("ns", "ukey", "ts", "payload", "val")
        val cols = Seq("ns", "ukey", "payload", "val")
        def stats(build: journal.JournalStore => Unit): Map[String, String] = {
          val path = java.nio.file.Files
            .createTempDirectory("graft_pref_").toString + "/s"
          val st = journal.JournalStore.create(spark, path, 4)
          build(st)
          st.manifest.meta.filter { case (k2, _) =>
            (k2 == "stats.rows" || k2.startsWith("stats.col.")) &&
              !k2.endsWith(".hist")
          }
        }
        val refolded = stats { st =>
          st.append(df(a)); st.analyze(cols)
          st.deleteWhere(col("ukey") > cutKey) }
        val fresh = stats { st =>
          st.append(df(a)); st.deleteWhere(col("ukey") > cutKey)
          st.analyze(cols) }
        refolded == fresh
      }
    })
    assert(r.passed, r.status.toString)
  }

  test("set ops agree with Scala set algebra") {
    check(Prop.forAll(Gen.listOf(Gen.choose(0, 20)), Gen.listOf(Gen.choose(0, 20))) {
      (xs, ys) =>
        val a = xs.toDF("v")
        val b = ys.toDF("v")
        val inter = a.intersect(b).as[Int].collect().toSet
        val exc = a.except(b).as[Int].collect().toSet
        val uni = a.union(b).distinct.as[Int].collect().toSet
        inter == (xs.toSet intersect ys.toSet) &&
          exc == (xs.toSet diff ys.toSet) &&
          uni == (xs.toSet union ys.toSet)
    })
  }

  test("ImageCodec: encode->parse->decode round-trips over the parameter space") {
    val gen = for {
      w <- Gen.choose(1, 64)
      h <- Gen.choose(1, 64)
      g <- Gen.choose(0, 255)
    } yield (w, h, g)
    check(Prop.forAll(gen) { case (w, h, g) =>
      val png = ops.ImageCodec.buildPng(w, h, g)
      ops.ImageCodec.parseDims(png) == Some(("png", w, h)) &&
        ops.ImageCodec.decodePixels(png) == Some((w, h, w.toLong * h * g))
    })
  }

  test("kmeansTrainOn equals a driver-side Lloyd model on random vector " +
    "sets (argmin ties, empty-cluster carry-forward, floor means)") {
    // small integer coordinates: the generated sets force the edge cases
    // the fixture rarely hits — exact distance ties (broken by smaller
    // cluster id) and clusters emptied mid-iteration (carry forward)
    val vecsGen: Gen[List[List[Long]]] =
      Gen.choose(1, 10).flatMap(n => Gen.listOfN(n,
        Gen.listOfN(3, Gen.choose(0L, 3L))))
    check(Prop.forAll(vecsGen) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "q")
      val got = ops.LlmExtOps.kmeansTrainOn(df)._1
        .select("vec_id", "cl", "dist")
        .as[(Long, Int, Long)].collect().toSeq.sortBy(_._1)
      // reference: straight-line Lloyd, 3 assigns / 2 updates
      val raw = vecs.zipWithIndex.map { case (v, i) => i.toLong -> v.toArray }
      def d2(a: Array[Long], b: Array[Long]): Long =
        a.indices.foldLeft(0L)((acc, i) => acc + (a(i) - b(i)) * (a(i) - b(i)))
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
              old.indices.map(i => math.floor(
                members.map(_._2(i)).sum.toDouble / members.length).toLong)
                .toArray
            }
          }
        }
      }
      val want = raw.map { case (id, q) =>
        val cl = asg(id); (id, cl, d2(q, cents(cl))) }.toSeq
      got == want
    })
  }
}
