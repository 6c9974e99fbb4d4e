package graft

import org.apache.spark.sql.SparkSession

/** One shared session for every suite (Test/fork gives the suites their
  * own JVM; sharing the session keeps the run fast). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      // the deployment shape installs the graft extensions; tests run
      // with them too so the SQL surface (incl. DELETE on journal
      // tables) is exercised the way a cluster would see it
      .withExtensions(new graft.expr.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Write a micro-fixture table set under a temp dir so the declared
    * (spark, sfDir) => DataFrame queries can run against it. */
  def fixtureDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fixture_").toString
    tables.foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
}
