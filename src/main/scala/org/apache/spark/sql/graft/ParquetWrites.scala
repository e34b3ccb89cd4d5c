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
    * writer per live tuple per task — BOUNDED: past
    * `graft.write.fanout.maxOpenWriters` (default 64) concurrent
    * writers, the least-recently-written key closes and rolls; a later
    * row for it opens a fresh attempt-unique file. Each file stays
    * single-valued on the tuple (purity is per FILE, not per key), so
    * the only cost of eviction is extra files — never straddling.
    * Without the cap, a composite spec (days × bucket) under a
    * many-day streaming epoch or MERGE rewrite opens days·buckets
    * writers per task, each buffering up to a parquet row group —
    * executor OOM at exactly the 100-TB scale the feature targets. */
  /** `ridMetaIdx`: row-tracking mode — `schema`'s TRAILING field is the
    * materialized row-id column, filled per row from ordinal
    * `ridMetaIdx` of the metadata row Spark hands to
    * `writeWithMetadata` (null for rows without one, e.g. MERGE
    * inserts); plain `write` calls append null. The split key and every
    * caller-visible ordinal keep speaking the original (un-extended)
    * row layout. */
  def factory(
      spark: SparkSession, schema: StructType, stageDir: String,
      splitKey: Option[InternalRow => String] = None,
      ridMetaIdx: Option[Int] = None): GraftParquetWriterFactory = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val options = new ParquetOptions(Map.empty[String, String], spark.sessionState.conf)
    val owf = ParquetUtils.prepareWrite(spark.sessionState.conf, job, schema, options)
    val maxOpen = spark.conf
      .get("graft.write.fanout.maxOpenWriters", "64").toInt
    require(maxOpen >= 1,
      s"graft.write.fanout.maxOpenWriters must be >= 1, got $maxOpen")
    new GraftParquetWriterFactory(
      owf, new SerializableConfiguration(job.getConfiguration), schema, stageDir,
      splitKey, maxOpen, ridMetaIdx)
  }
}

/** Serves BOTH write planes: batch ([[DataWriterFactory]]) and
  * streaming ([[org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory]]
  * — the epoch only names the file; every name is attempt-unique via
  * UUID regardless). */
final class GraftParquetWriterFactory(
    owf: OutputWriterFactory, conf: SerializableConfiguration,
    schema: StructType, stageDir: String,
    splitKey: Option[InternalRow => String] = None,
    maxOpenWriters: Int = 64,
    ridMetaIdx: Option[Int] = None) extends DataWriterFactory
    with org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {

  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    createWriter(partitionId, taskId)

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // one live writer per tuple key; `tick` is per-row recency for
      // the LRU eviction below (a mutable cell beats remove+reinsert
      // LinkedHashMap churn on the per-row hot path)
      final class Open(
          val w: org.apache.spark.sql.execution.datasources.OutputWriter,
          val path: Path) { var tick: Long = 0L }
      // fanout state: one open writer per transform-tuple key (a single
      // sentinel key when splitKey is absent — the plain one-file path)
      private val open = mutable.LinkedHashMap.empty[String, Open]
      // files already closed-and-rolled by the cap (or by commit):
      // still part of this task's staged output
      private val rolled = mutable.ArrayBuffer.empty[Path]
      private var clock = 0L
      private val keyOf: InternalRow => String =
        splitKey.getOrElse((_: InternalRow) => "")

      private def newFile(): (org.apache.spark.sql.execution.datasources.OutputWriter, Path) = {
        val ctx = new TaskAttemptContextImpl(
          conf.value,
          new TaskAttemptID(new TaskID(new JobID(UUID.randomUUID().toString.take(8), 0),
            TaskType.MAP, partitionId), 0))
        val path = new Path(
          stageDir,
          s"part-$partitionId-$taskId-${UUID.randomUUID().toString.take(8)}" +
            owf.getFileExtension(ctx))
        (owf.newInstance(path.toString, schema, ctx), path)
      }

      private def writerFor(key: String): Open =
        open.getOrElse(key, {
          // cap the live-writer count: close-and-roll the least-
          // recently-written key. The rolled file is complete and
          // tuple-pure; if its key recurs, a FRESH file opens — extra
          // files, never a straddle. O(cap) scan, only on new-key
          // opens past the cap.
          if (open.size >= maxOpenWriters) {
            val (lruKey, lru) = open.minBy(_._2.tick)
            lru.w.close()
            rolled += lru.path
            open.remove(lruKey)
          }
          val (w, p) = newFile()
          val o = new Open(w, p)
          open.put(key, o)
          o
        })

      // row-tracking append state (single-threaded writer — reused
      // per row, the standard InternalRow-wrapper pattern)
      private val ridJoin =
        new org.apache.spark.sql.catalyst.expressions.JoinedRow
      private val ridCell =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

      private def put(key: String, out: InternalRow): Unit = {
        val o = writerFor(key)
        clock += 1; o.tick = clock
        o.w.write(out)
      }

      override def write(row: InternalRow): Unit =
        ridMetaIdx match {
          case None => put(keyOf(row), row)
          case Some(_) =>
            ridCell.update(0, null)
            put(keyOf(row), ridJoin(row, ridCell))
        }

      // the DSv2 preserved-metadata write: Spark's
      // DataAndMetadataWritingSparkTask calls write(metadataProj,
      // dataProj) for rows flagged WRITE_WITH_METADATA_OPERATION
      override def write(
          meta: InternalRow, row: InternalRow): Unit =
        ridMetaIdx match {
          case None => write(row)
          case Some(idx) =>
            if (meta == null || meta.isNullAt(idx)) ridCell.update(0, null)
            else ridCell.setLong(0, meta.getLong(idx))
            put(keyOf(row), ridJoin(row, ridCell))
        }

      override def commit(): WriterCommitMessage = {
        val paths = (rolled ++ open.values.map(_.path)).map(_.toString).toSeq
        open.values.foreach(_.w.close()); open.clear(); rolled.clear()
        ParquetWrites.StagedFiles(paths)
      }

      override def abort(): Unit = {
        open.values.foreach { o =>
          o.w.close()
          val fs = o.path.getFileSystem(conf.value)
          fs.delete(o.path, false); ()
        }
        rolled.foreach { p =>
          val fs = p.getFileSystem(conf.value)
          fs.delete(p, false); ()
        }
        open.clear(); rolled.clear()
      }

      override def close(): Unit = {
        open.values.foreach(_.w.close()); open.clear()
      }
    }
}
