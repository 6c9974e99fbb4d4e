package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object ops {
  /** A declared query: (session, sf-dir) => result. Driver contract shape
    * (SparkEntry.queries values). */
  type Q = (SparkSession, String) => DataFrame

  /** Widen a CPU-dense frame to cluster parallelism when its current
    * partitioning is NARROWER (round 19, guide §2.2/§6): scan split
    * counts derive from input BYTES (maxPartitionBytes with the 4 MB
    * open-cost floor), so a small-bytes/high-compute frame — shingle
    * md5 kernels, per-row BPE encodes, k-means argmin over packed float
    * arrays — can land on 1–2 tasks and serialize the whole stage on
    * one core regardless of cluster size. The guard makes this a no-op
    * at scale: a 100 TB scan already has ≥ defaultParallelism splits
    * and is never re-shuffled. Row-order independence is the caller's
    * contract (everything downstream is aggregates/joins/sorts), and
    * round-robin repartition keeps Spark's sort-before-repartition
    * determinism under task retry. Call ONLY on exchange-free frames
    * (scan + narrow ops): probing partition count via .rdd plans the
    * frame but runs no job exactly when the plan holds no exchange. */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }
}
