package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object ops {
  /** A declared query: (session, sf-dir) => result. Driver contract shape
    * (SparkEntry.queries values). */
  type Q = (SparkSession, String) => DataFrame
}
