package graft
import org.apache.spark.sql.SparkSession

object Bench {
  private def r3(v: Double): String = {
    val s = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    s.bigDecimal.toPlainString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM + codegen + parquet-reader warm-up so the first timed query
    // isn't charged session startup (protocol: BASELINE.md)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case _: Throwable => failed += name; false }
      val dt = (System.nanoTime() - t0) / 1e9
      // Failures are flagged twice: negative per-query time AND the
      // "errors" array, so a throwing query can't hide as a fast pass.
      name -> (if (ok) dt else -dt)
    }
    val total = results.values.map(math.abs).sum
    val errJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Full-precision record for humans / the judge.
    val fullQs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"errors":$errJson,"sf":"$sfDir"}"""
    // Stop Spark BEFORE printing so the JSON is the final stdout line.
    spark.stop()
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench.json"), fullLine + "\n")
    // The driver only inspects the LAST ~2000 chars of sbt output
    // (BENCH_r01/r02 both came back parsed:null because the 90-query
    // full map overflowed that window). Print a compact line that is
    // guaranteed to fit: slowest queries first, greedily filled to a
    // hard character budget; the full map lives in bench.json.
    val budget = 1600
    val entries = results.toSeq.sortBy(-_._2)
      .map { case (k, v) => s"\"" + k + "\":" + r3(v) }
    val tail = s"""},"n":${results.size},"errors":$errJson,"sf":"$sfDir"}"""
    val head = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":{"""
    val sb = new StringBuilder(head)
    var first = true
    entries.foreach { e =>
      val sep = if (first) "" else ","
      if (sb.length + sep.length + e.length + tail.length <= budget) {
        sb.append(sep).append(e); first = false
      }
    }
    sb.append(tail)
    println(sb.toString)
    System.out.flush()
  }
}
