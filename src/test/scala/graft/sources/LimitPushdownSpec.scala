package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Manifest-stats limit pushdown (JournalScanBuilder § pushLimit):
  * `LIMIT n` with no filters keeps only a file prefix covering n rows —
  * and declines whenever a filter makes per-file post-filter counts
  * unknowable. */
class LimitPushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 4 files × 10 rows (epochSize 10 → one file per epoch). */
  private def mkStore(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_lim_").toString + "/store"
    val rows = for (i <- 0L to 39L) yield
      (i, "ns0", i, "2024-01-01 00:00:00", s"p$i", 1.0)
    rows.toDF("seq", "ns", "ukey", "ts", "payload", "val")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.format("journal").option("epochSize", "10").save(dir)
    dir
  }

  private def scanPartitions(df: DataFrame): Int = {
    df.collect()
    val root = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    root.collect { case b: BatchScanExec => b.scan }
      .collectFirst { case s: JournalParquetScan => s.planInputPartitions().length }
      .get
  }

  test("LIMIT 5 opens one file; the limit still applies") {
    val dir = mkStore()
    val df = spark.read.format("journal").load(dir).limit(5)
    assert(df.count() === 5)
    assert(scanPartitions(df) === 1, "limit should keep a 1-file prefix")
  }

  test("LIMIT beyond the row count keeps every file and every row") {
    val dir = mkStore()
    val df = spark.read.format("journal").load(dir).limit(100)
    assert(df.count() === 40)
    assert(scanPartitions(df) === 4)
  }

  test("a filtered LIMIT declines pruning and stays exact") {
    val dir = mkStore()
    // only the LAST file holds ukey >= 30: a pruned 1-file prefix would
    // return zero of its rows
    val df = spark.read.format("journal").load(dir)
      .where(col("ukey") >= 35).limit(5)
    assert(df.count() === 5)
    assert(scanPartitions(df) === 4, "filter must decline limit pruning")
  }
}
