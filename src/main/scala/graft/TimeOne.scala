package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer (dev tool):
  * runMain graft.TimeOne <name> [sfDir] [ext]
  * — trailing literal `ext` builds the session with GraftExtensions
  * (Bench's deployment shape), for isolating analyzer-rule overhead. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val b00 = SparkSession.builder()
      .appName("graft-time-one").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "16g")
      .config("spark.sql.session.timeZone", "UTC")
    // ad-hoc conf experiments: SPARK_GRAFT_CONFS="k=v;k2=v2"
    val b0 = sys.env.get("SPARK_GRAFT_CONFS").map(_.split(";").toSeq)
      .getOrElse(Nil).filter(_.contains("="))
      .foldLeft(b00) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }
    val spark = (if (args.contains("ext"))
      b0.withExtensions(new graft.expr.GraftExtensions) else b0)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[time] $name pass$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
