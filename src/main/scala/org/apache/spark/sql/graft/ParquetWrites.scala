package org.apache.spark.sql.graft

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskID, TaskType, JobID}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetUtils}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Bridge into Spark's OWN parquet write machinery for DSv2
  * [[org.apache.spark.sql.connector.write.BatchWrite]]s that stage files
  * for a transactional commit (the graft-table row-level operations):
  * [[ParquetUtils.prepareWrite]] builds the same serializable
  * [[OutputWriterFactory]] the built-in parquet sink uses (dictionary/
  * codec/output-committer settings from the session conf), and each
  * executor task opens ONE file in the staging directory through it.
  *
  * Like [[ParquetScans]], this lives in `org.apache.spark.sql` because
  * the writer factory is session-internal API; the public surface stays
  * in `graft.streaming`.
  */
object ParquetWrites {

  /** One staged parquet file per (non-empty) task. */
  final case class StagedFiles(files: Seq[String]) extends WriterCommitMessage

  /** A serializable [[DataWriterFactory]] writing rows of `schema` as
    * parquet files under `stageDir`. Files open lazily — an empty task
    * stages nothing. Task attempts write attempt-unique names; the
    * commit coordinator picks exactly one winner per task, and losers'
    * files stay behind in the staging directory for the caller's
    * abort/vacuum cleanup (never adopted: the commit lists only winning
    * messages). */
  def factory(
      spark: SparkSession, schema: StructType, stageDir: String): GraftParquetWriterFactory = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val options = new ParquetOptions(Map.empty[String, String], spark.sessionState.conf)
    val owf = ParquetUtils.prepareWrite(spark.sessionState.conf, job, schema, options)
    new GraftParquetWriterFactory(
      owf, new SerializableConfiguration(job.getConfiguration), schema, stageDir)
  }
}

/** Serves BOTH write planes: batch ([[DataWriterFactory]]) and
  * streaming ([[org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory]]
  * — the epoch only names the file; every name is attempt-unique via
  * UUID regardless). */
final class GraftParquetWriterFactory(
    owf: OutputWriterFactory, conf: SerializableConfiguration,
    schema: StructType, stageDir: String) extends DataWriterFactory
    with org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {

  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    createWriter(partitionId, taskId)

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var writer: org.apache.spark.sql.execution.datasources.OutputWriter = _
      private var path: Path = _

      private def open(): Unit = {
        val ctx = new TaskAttemptContextImpl(
          conf.value,
          new TaskAttemptID(new TaskID(new JobID(UUID.randomUUID().toString.take(8), 0),
            TaskType.MAP, partitionId), 0))
        path = new Path(
          stageDir,
          s"part-$partitionId-$taskId-${UUID.randomUUID().toString.take(8)}" +
            owf.getFileExtension(ctx))
        writer = owf.newInstance(path.toString, schema, ctx)
      }

      override def write(row: InternalRow): Unit = {
        if (writer == null) open()
        writer.write(row)
      }

      override def commit(): WriterCommitMessage = {
        if (writer == null) return ParquetWrites.StagedFiles(Nil)
        writer.close(); writer = null
        ParquetWrites.StagedFiles(Seq(path.toString))
      }

      override def abort(): Unit = {
        if (writer != null) { writer.close(); writer = null }
        if (path != null) {
          val fs = path.getFileSystem(conf.value)
          fs.delete(path, false); ()
        }
      }

      override def close(): Unit =
        if (writer != null) { writer.close(); writer = null }
    }
}
