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
