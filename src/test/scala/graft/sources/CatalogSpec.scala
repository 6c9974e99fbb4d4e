package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** SQL addressability of journal stores through [[JournalCatalog]]
  * (SURVEY §3.2's SQL entry point beyond fixture views): CREATE /
  * INSERT / SELECT / DROP by NAME, with INSERT riding the V2 commit
  * framework into the store's whole-batch append. */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ONE root for the suite: Spark instantiates and caches the catalog at
  // first resolution, so later conf changes would be ignored anyway
  private lazy val catalogRoot: String = {
    val root = java.nio.file.Files.createTempDirectory("graft_jcat_").toString
    spark.conf.set("spark.sql.catalog.jcat", classOf[JournalCatalog].getName)
    spark.conf.set("spark.sql.catalog.jcat.root", root)
    root
  }
  private def withCatalog[A](f: String => A): A = f(catalogRoot)

  test("journal_catalog: create, insert, select, drop by name") { withCatalog { root =>
    spark.sql("CREATE TABLE jcat.clicks (ns STRING, ukey BIGINT, ts TIMESTAMP, " +
      "payload STRING, val DOUBLE) USING journal OPTIONS (epochSize '2')")
    // the table IS a journal store directory under the catalog root
    assert(graft.journal.JournalStore.exists(s"$root/clicks"))
    assert(intercept[Exception] {
      spark.sql("CREATE TABLE jcat.clicks (x INT) USING journal")
    }.getMessage.toLowerCase.contains("exist"))

    // INSERT is by NAME (the table schema carries engine-assigned seq /
    // epoch columns, so appends project the writer columns and the V2
    // commit framework hands the batch to the store's global-sort append)
    spark.sql("INSERT INTO jcat.clicks SELECT 'users' AS ns, " +
      "CAST(1 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:01' AS ts, " +
      "'p0' AS payload, CAST(1.0 AS DOUBLE) AS val")
    spark.sql("INSERT INTO jcat.clicks SELECT 'users' AS ns, " +
      "CAST(1 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:02' AS ts, " +
      "'p1' AS payload, CAST(2.0 AS DOUBLE) AS val")

    // reads resolve to the same columnar V2 scan as the path API
    val byName = spark.sql("SELECT seq, payload FROM jcat.clicks ORDER BY seq")
    assert(byName.as[(Long, String)].collect().toSeq === Seq((0L, "p0"), (1L, "p1")))
    assert(byName.queryExecution.executedPlan.toString.contains("BatchScan"))
    // seq assignment + manifest rode the normal append path: the path
    // API sees the same store, state mode included
    val st = spark.read.format("journal").option("asOfSeq", "1").load(s"$root/clicks")
    assert(st.where(col("ukey") === 1L).select("payload").as[String].head() === "p1")

    // an append-only log: INSERT OVERWRITE is refused
    assert(intercept[Exception] {
      spark.sql("INSERT OVERWRITE jcat.clicks SELECT 'x' AS ns, " +
        "CAST(9 AS BIGINT) AS ukey, TIMESTAMP '2024-01-01 00:00:09' AS ts, " +
        "'p9' AS payload, CAST(9.0 AS DOUBLE) AS val")
    } != null)

    assert(spark.sql("SHOW TABLES IN jcat").select("tableName")
      .as[String].collect().toSeq === Seq("clicks"))
    spark.sql("DROP TABLE jcat.clicks")
    assert(!graft.journal.JournalStore.exists(s"$root/clicks"))
    assert(intercept[Exception] {
      spark.sql("SELECT * FROM jcat.clicks").collect()
    } != null)
  }}

  test("journal_catalog: two sessions-worth of metadata is just the directory") {
    withCatalog { root =>
      // a store created through the PATH api is immediately visible as a
      // catalog table (no metastore to sync) — the manifest is the
      // existence marker
      Seq(("a", 1L, graft.TestSpark.ts("2024-01-01 00:00:01"), "p", 1.0))
        .toDF("ns", "ukey", "ts", "payload", "val")
        .write.format("journal").save(s"$root/ext")
      assert(spark.sql("SELECT count(*) FROM jcat.ext").as[Long].head() === 1L)
      // rename is a directory move (the TO name is catalog-relative)
      spark.sql("ALTER TABLE jcat.ext RENAME TO ext2")
      assert(!graft.journal.JournalStore.exists(s"$root/ext"))
      assert(spark.sql("SELECT count(*) FROM jcat.ext2").as[Long].head() === 1L)
    }
  }
}
