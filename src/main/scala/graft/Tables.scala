package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver-generated parquet fixtures (TESTDATA.md):
  * region nation customer supplier part orders lineitem events
  * documents embeddings — one parquet per table under the sf dir.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4's reader
  * rejects ([PARQUET_TYPE_ILLEGAL]). We read it as nanos-since-epoch via
  * the legacy conf and convert to a micros TimestampType column (the
  * fixture data is second-granular — lossless). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      // driver fixtures carry nanos (read as long); test micro-fixtures
      // write native TimestampType — handle both
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else df
    } else spark.read.parquet(s"$dir/$name.parquet")
}
