package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.write.{PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.graft.{JournalStagedFile, JournalStagedWrite, JournalStagedWriterFactory}
import org.apache.spark.sql.types.StructType

import graft.journal.JournalStore

/** Driver half of the journal's DSv2 STREAMING write — what makes
  * `stream.writeStream.toTable("jcat.t")` work against a catalog table
  * (the read twin `spark.readStream.table` already rides the V2
  * MicroBatchStream). Spark's V2 streaming write is per-task, but a
  * journal append is a WHOLE-BATCH operation (one deterministic global
  * seq sort, one manifest-CAS commit carrying the batch id), so the
  * tasks stage their rows as parquet (org.apache.spark.sql.graft.
  * JournalStagedWriterFactory) and `commit(epochId)` turns exactly the
  * committed tasks' files into one ordinary store append:
  *
  *  - EXACTLY-ONCE: the append rides the same (writerId, batchId)
  *    high-water mark as the V1 path sink — writerId is the streaming
  *    QUERY id (stable across restarts from one checkpoint), so a
  *    replayed epoch re-stages and is skipped by the mark, and two
  *    queries sharing a store deduplicate independently.
  *  - Constraints, schema evolution guards, auto-checkpointing, stats:
  *    all unchanged — commit() IS an append.
  *  - abort()/replay both delete the epoch's stage dir; a crashed
  *    query's orphaned stage dirs age out through vacuum()'s grace
  *    sweep, like batch `.stage-` dirs.
  *
  * Scale note: the staged copy means streamed bytes are written twice
  * (stage + final segment). That is the structural price of the V2
  * per-task contract for a sink with global commit semantics (Delta's
  * OSS connector ships a V1 sink for the same reason); the path-based
  * `writeStream.format("journal").start(path)` V1 sink keeps the
  * single-write fast path, and this surface completes the catalog
  * story for `toTable`. */
private[sources] class JournalStreamingWrite(
    spark: SparkSession, storePath: String, schema: StructType,
    queryId: String, epochSize: Option[Long], autoCompact: Option[Int],
    autoMaintain: Option[Int] = None)
    extends StreamingWrite {

  private val stageDir =
    java.nio.file.Paths.get(storePath, s".streamstage-$queryId").toString

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new JournalStagedWriterFactory(stageDir, schema.toDDL,
      JournalStagedWrite.writerConf(spark))

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    // only files whose task reached commit() — zombie attempts' files
    // sit unreferenced in the stage dir and die with the epoch cleanup
    val files = messages.collect {
      case f: JournalStagedFile if f.rows > 0 => f.path
    }
    val batch =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files.toIndexedSeq: _*)
    val st =
      if (JournalStore.exists(storePath)) JournalStore.open(spark, storePath)
      else JournalStore.create(spark, storePath, epochSize.getOrElse(1000L))
    // the streaming sink default: a long-running stream must not
    // fragment the segment tree (same threshold as the V1 path sink)
    st.withAutoCompact(autoCompact.getOrElse(16))
    // opt-in declared-retention cadence (autoMaintainBatches=N): the
    // commit hook sheds expired rows with no CALL — see withAutoMaintain
    autoMaintain.foreach(st.withAutoMaintain)
    st.append(batch, Some(epochId), queryId)
    cleanupEpoch(epochId)
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit =
    cleanupEpoch(epochId)

  private def cleanupEpoch(epochId: Long): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      java.nio.file.Paths.get(stageDir, s"epoch=$epochId").toString))
    // drop the per-query dir once empty so a finished query leaves no
    // trace (best-effort: delete fails harmlessly while files remain)
    new java.io.File(stageDir).delete()
    ()
  }
}
