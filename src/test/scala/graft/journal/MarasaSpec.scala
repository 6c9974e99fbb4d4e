package graft.journal

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Reference-API fidelity: the semantics recalled in SURVEY §0.1 —
  * one seqno per write, dict-merge state, point-in-time reads, per-key
  * history, persistence across reopen. (Reference repo unavailable —
  * SURVEY §0 — so these pin the recalled contract.) */
class MarasaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshPath =
    java.nio.file.Files.createTempDirectory("graft_marasa_").toString + "/store"

  test("write returns monotonic seqnos; whole delta shares one seq") {
    val m = Marasa.create(spark, freshPath)
    val s0 = m.write("cfg", Map("a" -> "1", "b" -> "2"))
    val s1 = m.write("cfg", Map("a" -> "3"))
    assert(s0 === 0L && s1 === 1L)
    assert(m.history("cfg", Some("a")) === Seq((0L, "a", "1"), (1L, "a", "3")))
  }

  test("read(ns) folds deltas; read(ns, seq) time-travels") {
    val m = Marasa.create(spark, freshPath)
    m.write("cfg", Map("a" -> "1", "b" -> "2"))
    m.write("cfg", Map("a" -> "3", "c" -> "4"))
    m.write("other", Map("x" -> "9"))
    assert(m.read("cfg") === Map("a" -> "3", "b" -> "2", "c" -> "4"))
    assert(m.read("cfg", Some(0L)) === Map("a" -> "1", "b" -> "2"))
    assert(m.read("other") === Map("x" -> "9"))
    assert(m.read("missing") === Map.empty)
  }

  test("namespaces are independent but share the global seq counter") {
    val m = Marasa.create(spark, freshPath)
    val s0 = m.write("n1", Map("k" -> "v"))
    val s1 = m.write("n2", Map("k" -> "w"))
    assert(Seq(s0, s1) === Seq(0L, 1L))
    assert(m.namespaces() === Seq("n1", "n2"))
    assert(m.read("n1") === Map("k" -> "v"))
  }

  test("random write sequences match an in-memory dict model (incl. time travel)") {
    val gen = org.scalacheck.Gen.listOfN(6, for {
      ns <- org.scalacheck.Gen.oneOf("a", "b")
      k <- org.scalacheck.Gen.oneOf("x", "y", "z")
      v <- org.scalacheck.Gen.choose(0, 9)
    } yield (ns, k, v.toString))
    val prop = org.scalacheck.Prop.forAll(gen) { writes =>
      val m = Marasa.create(spark, freshPath)
      val model = scala.collection.mutable.Map.empty[(String, String), String]
      val snapshots = writes.map { case (ns, k, v) =>
        val seq = m.write(ns, Map(k -> v))
        model((ns, k)) = v
        (seq, model.toMap)
      }
      def dictOf(snap: Map[(String, String), String], ns: String) =
        snap.collect { case ((n, k), v) if n == ns => k -> v }
      val latestOk = Seq("a", "b").forall(ns => m.read(ns) == dictOf(model.toMap, ns))
      // time travel: state at each recorded seq equals the model snapshot
      val travelOk = snapshots.zipWithIndex.forall { case ((seq, snap), _) =>
        Seq("a", "b").forall(ns => m.read(ns, Some(seq)) == dictOf(snap, ns))
      }
      latestOk && travelOk
    }
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(r.passed, r.status.toString)
  }

  test("store persists across close/reopen") {
    val path = freshPath
    val m1 = Marasa.create(spark, path)
    m1.write("cfg", Map("a" -> "1"))
    val m2 = Marasa.open(spark, path)
    assert(m2.read("cfg") === Map("a" -> "1"))
    assert(m2.write("cfg", Map("a" -> "2")) === 1L)
    assert(m2.read("cfg") === Map("a" -> "2"))
  }

  test("DataFrame tier equals the collecting tier (readDF/historyDF/namespacesDF)") {
    val m = Marasa.create(spark, freshPath)
    m.write("cfg", Map("a" -> "1", "b" -> "2"))
    m.write("cfg", Map("a" -> "3"))
    m.write("other", Map("x" -> "9"))
    import spark.implicits._
    assert(m.readDF("cfg").as[(String, String)].collect().toMap === m.read("cfg"))
    assert(m.readDF("cfg", Some(0L)).as[(String, String)].collect().toMap
      === m.read("cfg", Some(0L)))
    assert(m.historyDF("cfg", Some("a")).as[(Long, String, String)]
      .collect().toSeq === m.history("cfg", Some("a")))
    assert(m.namespacesDF().as[String].collect().sorted.toSeq === m.namespaces())
  }

  test("collecting tier throws loudly past the cap, names the DF alternative") {
    // shrink the cap to make the guard testable without 1M rows
    val m = new Marasa(graft.journal.JournalStore.create(spark, freshPath, 1000L)) {
      override protected def collectCap: Int = 2
    }
    m.write("cfg", Map("a" -> "1", "b" -> "2", "c" -> "3"))
    val e = intercept[IllegalArgumentException] { m.read("cfg") }
    assert(e.getMessage.contains("readDF"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] { m.history("cfg") }
    assert(e2.getMessage.contains("historyDF"), e2.getMessage)
    // the DF tier still serves the same data unbounded
    assert(m.readDF("cfg").count() === 3)
  }
}
