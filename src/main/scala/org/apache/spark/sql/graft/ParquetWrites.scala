// Lives in org.apache.spark.sql because the writer factory is
// session-internal API; the public surface stays in graft.streaming.
package org.apache.spark.sql.graft

import java.util.UUID

import scala.collection.mutable

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
  * for a transactional commit (the graft-table row-level operations and
  * streaming epochs): [[ParquetUtils.prepareWrite]] builds the same
  * serializable [[OutputWriterFactory]] the built-in parquet sink uses
  * (dictionary/codec/output-committer settings from the session conf),
  * and each executor task opens files in the staging directory through
  * it.
  *
  * Like [[ParquetScans]], this lives in `org.apache.spark.sql` because
  * the writer factory is session-internal API; the public surface stays
  * in `graft.streaming`.
  */
object ParquetWrites {

  /** The staged parquet files of one (non-empty) task. */
  final case class StagedFiles(files: Seq[String]) extends WriterCommitMessage

  /** A serializable [[DataWriterFactory]] writing rows of `schema` as
    * parquet files under `stageDir`. Files open lazily — an empty task
    * stages nothing. Task attempts write attempt-unique names; the
    * commit coordinator picks exactly one winner per task, and losers'
    * files stay behind in the staging directory for the caller's
    * abort/vacuum cleanup (never adopted: the commit lists only winning
    * messages).
    *
    * `splitKey` (from [[graft.medallion.PartitionSpec.tupleKeyFn]])
    * switches the task writer to FANOUT mode — one open file per
    * distinct transform-tuple key seen (the Iceberg fanout-writer
    * semantic): under a bucket partition spec every staged file must be
    * single-valued on the tuple or the table's storage-partitioned
    * joins silently degrade, and rows reach these writers in arbitrary
    * tuple order (streaming epochs, COW rewrite output), so rolling on
    * key CHANGE would explode the file count. Cost: one open parquet
    * writer per live tuple per task — the same bounded-by-bucket-count
    * memory trade Iceberg's fanout writer documents. */
  def factory(
      spark: SparkSession, schema: StructType, stageDir: String,
      splitKey: Option[InternalRow => String] = None): GraftParquetWriterFactory = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val options = new ParquetOptions(Map.empty[String, String], spark.sessionState.conf)
    val owf = ParquetUtils.prepareWrite(spark.sessionState.conf, job, schema, options)
    new GraftParquetWriterFactory(
      owf, new SerializableConfiguration(job.getConfiguration), schema, stageDir,
      splitKey)
  }
}

/** Serves BOTH write planes: batch ([[DataWriterFactory]]) and
  * streaming ([[org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory]]
  * — the epoch only names the file; every name is attempt-unique via
  * UUID regardless). */
final class GraftParquetWriterFactory(
    owf: OutputWriterFactory, conf: SerializableConfiguration,
    schema: StructType, stageDir: String,
    splitKey: Option[InternalRow => String] = None) extends DataWriterFactory
    with org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {

  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    createWriter(partitionId, taskId)

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // fanout state: one open writer per transform-tuple key (a single
      // sentinel key when splitKey is absent — the plain one-file path)
      private val open = mutable.LinkedHashMap.empty[
        String, (org.apache.spark.sql.execution.datasources.OutputWriter, Path)]
      private val keyOf: InternalRow => String =
        splitKey.getOrElse((_: InternalRow) => "")

      private def writerFor(key: String) =
        open.getOrElseUpdate(key, {
          val ctx = new TaskAttemptContextImpl(
            conf.value,
            new TaskAttemptID(new TaskID(new JobID(UUID.randomUUID().toString.take(8), 0),
              TaskType.MAP, partitionId), 0))
          val path = new Path(
            stageDir,
            s"part-$partitionId-$taskId-${UUID.randomUUID().toString.take(8)}" +
              owf.getFileExtension(ctx))
          (owf.newInstance(path.toString, schema, ctx), path)
        })._1

      override def write(row: InternalRow): Unit =
        writerFor(keyOf(row)).write(row)

      override def commit(): WriterCommitMessage = {
        val paths = open.values.map(_._2.toString).toSeq
        open.values.foreach(_._1.close()); open.clear()
        ParquetWrites.StagedFiles(paths)
      }

      override def abort(): Unit = {
        open.values.foreach { case (w, p) =>
          w.close()
          val fs = p.getFileSystem(conf.value)
          fs.delete(p, false); ()
        }
        open.clear()
      }

      override def close(): Unit = {
        open.values.foreach(_._1.close()); open.clear()
      }
    }
}
