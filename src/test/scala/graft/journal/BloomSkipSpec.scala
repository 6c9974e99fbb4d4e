package graft.journal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Per-file key-bloom data skipping (SURVEY §2 round-8 delta).
  *
  * Min/max key ranges prune nothing when every file spans the key space
  * (the append-order norm for a user-keyed journal). The manifest's
  * per-file blooms prune at point-probe grain below the range — these
  * tests pin the interleaved-key case ranges cannot win, exactness
  * (no false negatives, ever), and survival through compaction's
  * stat merge. Bloom probes are deterministic (fixed xxhash64 seed),
  * so the pinned outcomes cannot flake.
  */
class BloomSkipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** One epoch, one ns, TWO files with fully overlapping key ranges:
    * file A holds keys ≡ 0 (mod 4), file B keys ≡ 2 (mod 4). Odd keys
    * exist in neither file but sit inside both ranges. */
  private def mkStore(): JournalStore = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bloom_").toString + "/store"
    val store = JournalStore.create(spark, dir, epochSize = 1000)
    def batch(start: Long) =
      (start to 196L by 4).map(k =>
        ("users", k, ts("2024-01-01 00:00:01"), s"p$k", 1.0))
        .toDF("ns", "ukey", "ts", "payload", "val")
    store.append(batch(0L))  // file A: 0, 4, …, 196
    store.append(batch(2L))  // file B: 2, 6, …, 194
    store
  }

  test("point probe opens only the file whose bloom admits the key") {
    val store = mkStore()
    val all = store.scanUnorderedPruned(None, None).inputFiles.length
    assert(all === 2, s"fixture must hold 2 files, got $all")
    // ranges overlap ([0,196] vs [2,194]) — only the bloom can split them
    val a = store.scanUnorderedPruned(None, Some(4L))
    assert(a.inputFiles.length === 1, "key 4 lives only in file A")
    assert(a.where(col("ukey") === 4L).count() === 1L)
    val b = store.scanUnorderedPruned(None, Some(6L))
    assert(b.inputFiles.length === 1, "key 6 lives only in file B")
    assert(b.where(col("ukey") === 6L).count() === 1L)
    // an in-range key present in NO file: both blooms reject
    val none = store.scanUnorderedPruned(None, Some(5L))
    assert(none.inputFiles.isEmpty, "absent in-range key must prune all files")
  }

  test("no false negatives: every present key survives its own prune") {
    val store = mkStore()
    (0L to 196L by 2).foreach { k =>
      val hit = store.scanUnorderedPruned(None, Some(k))
        .where(col("ukey") === k).count()
      assert(hit === 1L, s"key $k lost by bloom pruning")
    }
  }

  test("changesBetween is the exact seq delta, compaction-proof, file-pruned") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cdc_").toString + "/store"
    val store = JournalStore.create(spark, dir, epochSize = 4)
    def batch(ks: Seq[Long]) =
      ks.map(k => ("users", k, ts("2024-01-01 00:00:01"), s"p$k", 1.0))
        .toDF("ns", "ukey", "ts", "payload", "val")
    store.append(batch(Seq(1L, 2L, 3L, 4L)))
    val v1 = store.manifest.version
    store.append(batch(Seq(5L, 6L)))
    val v2 = store.manifest.version
    store.compact(upToEpoch = Long.MaxValue)
    val v3 = store.manifest.version
    store.append(batch(Seq(7L)))
    val v4 = store.manifest.version

    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("ukey").as[Long].collect().toSeq
    assert(keys(store.changesBetween(v1, v2)) === Seq(5L, 6L))
    // compaction between the endpoints must not duplicate or drop rows
    assert(keys(store.changesBetween(v1, v4)) === Seq(5L, 6L, 7L))
    assert(keys(store.changesBetween(v3, v4)) === Seq(7L))
    assert(keys(store.changesBetween(v2, v3)) === Seq())
    // tail delta must NOT open files fully below the from-watermark:
    // v4's snapshot holds the compacted epoch files + the new append;
    // (v3, v4] prunes the compacted files via per-file seq stats
    val tail = store.changesBetween(v3, v4)
    assert(tail.inputFiles.length === 1,
      s"tail CDC must open 1 file, got ${tail.inputFiles.length}")
    // SQL TVF surface
    graft.expr.GraftFunctions.register(spark)
    assert(spark.sql(s"SELECT ukey FROM journal_changes('$dir', $v1, $v2)")
      .as[Long].collect().sorted.toSeq === Seq(5L, 6L))
    intercept[IllegalArgumentException] {
      store.changesBetween(v4, v1)
    }
  }

  test("compaction ORs victim blooms; merged file still admits all keys") {
    val store = mkStore()
    store.compact(upToEpoch = Long.MaxValue, clusterByKey = true)
    assert(store.scanUnorderedPruned(None, None).inputFiles.length === 1)
    // merged bloom must admit every key either victim held
    (0L to 196L by 2).foreach { k =>
      val hit = store.scanUnorderedPruned(None, Some(k))
        .where(col("ukey") === k).count()
      assert(hit === 1L, s"key $k lost after compaction bloom merge")
    }
    // and still rejects the absent odd keys (deterministic outcome)
    assert(store.scanUnorderedPruned(None, Some(5L)).inputFiles.isEmpty,
      "absent key must stay pruned after merge")
  }
}
