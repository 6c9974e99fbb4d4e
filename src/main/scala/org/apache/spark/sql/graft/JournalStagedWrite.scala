package org.apache.spark.sql.graft

import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOutputWriter, ParquetWriteSupport}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Executor half of the journal's DSv2 STREAMING write — the
  * `writeStream.toTable("jcat.t")` surface (graft.sources.
  * JournalStreamingWrite holds the driver half). Each task stages its
  * partition's rows as ONE parquet file under the stage dir; the
  * driver's commit(epochId) reads the staged files back as a DataFrame
  * and runs the store's ordinary exactly-once append (global seq sort,
  * constraints, manifest CAS carrying the batch id). The staged copy is
  * the price of expressing a whole-batch commit through the per-task
  * StreamingWrite contract — the path-based V1 sink (single write)
  * remains the cheaper spelling; this class exists so the CATALOG write
  * surface is complete.
  *
  * Lives in the `org.apache.spark.sql` tree because the pieces it wires
  * are Spark-internal at the Scala level: `SerializableConfiguration`
  * (private[spark] — the writers need the session's Hadoop+SQL conf for
  * ParquetWriteSupport's asserted keys) and the conf-driven
  * ParquetWriteSupport/ParquetOutputWriter pair FileFormatWriter drives.
  */
case class JournalStagedFile(path: String, rows: Long)
    extends WriterCommitMessage

object JournalStagedWrite {
  /** The serializable conf a [[JournalStagedWriterFactory]] ships:
    * the session's Hadoop conf (sql entries included) with the two
    * keys ParquetWriteSupport.init ASSERTS on pinned to the session's
    * resolved values (newHadoopConf carries only explicitly-set conf,
    * not defaults). */
  def writerConf(spark: SparkSession): SerializableConfiguration = {
    val conf = spark.sessionState.newHadoopConf()
    val sql = spark.sessionState.conf
    // the same session-resolved keys ParquetUtils.prepareWrite pins —
    // newHadoopConf carries only EXPLICITLY-SET sql conf, not defaults,
    // and ParquetWriteSupport/SparkToParquetSchemaConverter hard-read
    // these (a missing one is an executor-side parse error)
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sql.writeLegacyParquetFormat.toString)
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sql.parquetOutputTimestampType.toString)
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sql.parquetFieldIdWriteEnabled.toString)
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sql.parquetAnnotateVariantLogicalType.toString)
    conf.set(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
      sql.legacyParquetNanosAsLong.toString)
    conf.set(org.apache.parquet.hadoop.ParquetOutputFormat.WRITE_SUPPORT_CLASS,
      classOf[ParquetWriteSupport].getName)
    new SerializableConfiguration(conf)
  }
}

class JournalStagedWriterFactory(stageDir: String, schemaDdl: String,
                                 conf: SerializableConfiguration)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val hconf = new org.apache.hadoop.conf.Configuration(conf.value)
    ParquetWriteSupport.setSchema(StructType.fromDDL(schemaDdl), hconf)
    val dir = java.nio.file.Paths.get(stageDir, s"epoch=$epochId")
    java.nio.file.Files.createDirectories(dir)
    // taskId in the name: a speculative/retried attempt writes its OWN
    // file; only attempts that reach commit() report their file to the
    // driver, and the commit coordinator admits one winner per partition
    val file = dir.resolve(f"part-$partitionId%05d-$taskId.parquet").toString
    val ctx = new TaskAttemptContextImpl(hconf, new TaskAttemptID())
    val out = new ParquetOutputWriter(file, ctx)
    new DataWriter[InternalRow] {
      private var n = 0L
      override def write(row: InternalRow): Unit = { out.write(row); n += 1 }
      override def commit(): WriterCommitMessage = {
        out.close()
        JournalStagedFile(file, n)
      }
      override def abort(): Unit = {
        try out.close() catch { case _: Exception => () }
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(file))
        ()
      }
      override def close(): Unit = ()
    }
  }
}
