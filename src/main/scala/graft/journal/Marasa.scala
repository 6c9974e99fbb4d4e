package graft.journal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Compatibility facade mirroring the reference's API shape (SURVEY §0.1:
  * `write(ns, delta) -> seqno`, `read(ns, seq) -> state`, `history`) on
  * top of the distributed store. marasa assigns ONE seqno per write call
  * — the whole delta dict shares it — and state at a seqno is the fold of
  * all deltas ≤ seq; both semantics are preserved here (rows of one write
  * share a seq; stateAt's arg-max groups per key, so the shared seq is
  * harmless).
  *
  * Driver-side convenience returns Scala maps (the reference is an
  * embedded single-process store; small-state reads are its use case).
  * For analytics-scale access use the underlying JournalStore DataFrames.
  */
class Marasa(val store: JournalStore) {
  private val spark: SparkSession = store.spark
  import spark.implicits._

  /** Append one delta record: every (key → value) pair shares one new
    * seqno, like the reference. Returns that seqno. */
  def write(ns: String, delta: Map[String, String],
            ts: java.sql.Timestamp = new java.sql.Timestamp(0L)): Long = {
    val seq = store.manifest.maxSeq + 1
    val rows = delta.toSeq.map { case (k, v) => (seq, ns, k, ts, v, 0.0) }
    store.append(rows.toDF("seq", "ns", "skey", "ts", "payload", "val")
      // the store keys are longs in the analytics schema; the facade keys
      // are strings — stored in ukey via a stable bijection-free side
      // column is wrong, so keep string keys in their own column and map
      // ukey to the key's hash only for partitioning-compatible layout
      .withColumn("ukey", xxhash64(col("skey")))
      .select("seq", "ns", "ukey", "skey", "ts", "payload", "val"))
    seq
  }

  /** State as of `seq` (None = latest): key → value map. Prunes by ns
    * directory and epoch upper bound; does not use checkpoints (they
    * carry the analytics schema, not the facade's string keys). */
  def read(ns: String, seq: Option[Long] = None): Map[String, String] = {
    val bound = seq.getOrElse(store.manifest.maxSeq)
    store.readSegments()
      .where(col("ns") === ns && col("seq") <= bound &&
             col("epoch") <= lit(bound / store.epochSize))
      .groupBy("skey")
      .agg(max_by(col("payload"), col("seq")).as("payload"))
      .as[(String, String)].collect().toMap
  }

  /** Changes of one key (or the whole namespace) in seq order. */
  def history(ns: String, key: Option[String] = None): Seq[(Long, String, String)] = {
    val base = store.readSegments().where(col("ns") === ns)
    key.fold(base)(k => base.where(col("skey") === k))
      .select(col("seq"), col("skey"), col("payload"))
      .orderBy("seq", "skey")
      .as[(Long, String, String)].collect().toSeq
  }

  /** Namespace list, like iterating the reference's store directory. */
  def namespaces(): Seq[String] =
    store.readSegments().select(col("ns")).distinct()
      .as[String].collect().toSeq.sorted
}

object Marasa {
  def create(spark: SparkSession, path: String, epochSize: Long = 1000L): Marasa =
    new Marasa(JournalStore.create(spark, path, epochSize))
  def open(spark: SparkSession, path: String): Marasa =
    new Marasa(JournalStore.open(spark, path))
}
