package graft.multimodal

import java.math.BigInteger
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded in partition-sized
  * batches.
  *
  * The Spark-side shape is the real thing — explicit schema, typed
  * `Dataset[MediaRecord]`, `mapPartitions` batch iterator (one decoder
  * instance per partition, the same batch shape a Pandas-UDF/`mapInPandas`
  * pipeline uses), narrow per-row execution with no shuffle. Only the
  * codec itself is a STUB: this container has no image/audio libraries, so
  * [[MediaCodec.decodeStub]] derives deterministic fake dimensions from an
  * md5 of the payload instead of parsing a real header. Swap that single
  * function for a real codec (JavaCV, TwelveMonkeys, ffmpeg-cli) and
  * nothing else changes.
  */
object Media {

  /** An opaque media payload: bytes + declared format. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte], fmt: String)

  /** Decoded metadata row. */
  final case class MediaMeta(
      doc_id: Long, byte_len: Int, width: Int, height: Int, fmt: String)

  object MediaCodec {

    /** 60-bit integer from the first 15 hex chars of md5 — the same value
      * as `TextFns.hash60` computes on the string column, byte-for-byte. */
    def hash60(bytes: Array[Byte], md: MessageDigest): Long = {
      md.reset()
      val hex = md.digest(bytes).map("%02x".format(_)).mkString
      new BigInteger(hex.substring(0, 15), 16).longValueExact()
    }

    /** STUB decoder — deterministic fake dimensions derived from the
      * payload hash. A real deployment replaces this body with an actual
      * header parse; signature and batch shape stay identical. */
    def decodeStub(r: MediaRecord, md: MessageDigest): MediaMeta = {
      val h = hash60(r.payload, md)
      MediaMeta(
        doc_id = r.doc_id,
        byte_len = r.payload.length,
        width = (64 + h % 1000).toInt,
        height = (64 + (h / 1000) % 1000).toInt,
        fmt = r.fmt)
    }

    /** Batch decode: one MessageDigest per partition (decoder init is the
      * expensive part for real codecs — amortize it across the batch). */
    def decodeBatch(rows: Iterator[MediaRecord]): Iterator[MediaMeta] = {
      val md = MessageDigest.getInstance("MD5")
      rows.map(decodeStub(_, md))
    }
  }

  /** documents → typed media records (payload = utf8 bytes of `text`,
    * format assigned round-robin from the numeric source suffix). */
  def mediaRecords(documents: DataFrame)(implicit s: SparkSession): Dataset[MediaRecord] = {
    import s.implicits._
    documents
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (substring(col("source"), 4, 10).cast("int") % 3) + 1).as("fmt"))
      .as[MediaRecord]
  }

  /** Full decode pipeline: typed batch map, no shuffle, scan-parallel. */
  def decodeMeta(documents: DataFrame)(implicit s: SparkSession): Dataset[MediaMeta] = {
    import s.implicits._
    mediaRecords(documents).mapPartitions(MediaCodec.decodeBatch _)
  }
}
