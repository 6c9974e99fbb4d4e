package graft
import org.apache.spark.sql.SparkSession
object ShowOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("g").master("local[8]")
      .withExtensions(new graft.expr.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(args(0))(spark, args(1)).show(50, false)
    spark.stop()
  }
}
