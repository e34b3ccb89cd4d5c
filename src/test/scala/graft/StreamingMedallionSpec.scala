package graft

import graft.medallion.Medallion
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming medallion ingest: a file-source stream over a growing bronze
  * directory drives CDC upserts into a silver parquet snapshot through
  * foreachBatch + Medallion.applyCdc — the continuous version of the
  * batch pipeline, exactly-once per micro-batch via checkpointed offsets,
  * replay-safe because applyCdc is idempotent.
  */
class StreamingMedallionSpec extends SparkSpec {

  private val changeSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("_deleted", BooleanType), StructField("_seq", LongType)))

  test("file-source stream + foreachBatch(applyCdc) maintains the silver snapshot") {
    val root = new java.io.File(
      s"target/tmp/spec_stream_medallion_${java.util.UUID.randomUUID().toString.take(8)}")
      .getAbsolutePath
    val bronzeDir = s"$root/bronze"
    val silverDir = s"$root/silver"
    new java.io.File(bronzeDir).mkdirs()

    def writeBatch(name: String, rows: Seq[String]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$bronzeDir/$name.json"),
        rows.mkString("\n").getBytes)

    def readSnapshot(sp: SparkSession): DataFrame =
      try sp.read.parquet(silverDir)
      catch { case _: Exception =>
        sp.createDataFrame(sp.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(changeSchema.take(2)))
      }

    // first batch lands before the stream starts
    writeBatch("b1", Seq(
      """{"id":1,"v":"a","_deleted":false,"_seq":1}""",
      """{"id":2,"v":"b","_deleted":false,"_seq":2}"""))

    val sp = spark
    val q = sp.readStream.schema(changeSchema).json(bronzeDir)
      .writeStream
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val current = readSnapshot(batch.sparkSession)
        val next = Medallion.applyCdc(current, batch, "id", "_seq")
        // local-FS safe two-phase write (read fully, then overwrite)
        val rows = next.collect()
        val df = batch.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](java.util.Arrays.asList(rows: _*)),
          next.schema)
        df.write.mode("overwrite").parquet(silverDir)
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(readSnapshot(sp).orderBy("id").collect().map(_.getString(1)).toSeq
        === Seq("a", "b"))

      // second batch: update id 1, delete id 2, insert id 3
      writeBatch("b2", Seq(
        """{"id":1,"v":"a2","_deleted":false,"_seq":10}""",
        """{"id":2,"v":"b","_deleted":true,"_seq":11}""",
        """{"id":3,"v":"c","_deleted":false,"_seq":12}"""))
      q.processAllAvailable()
      val snap = readSnapshot(sp).orderBy("id").collect()
      assert(snap.map(r => (r.getLong(0), r.getString(1))).toSeq
        === Seq((1L, "a2"), (3L, "c")))
    } finally q.stop()
  }
}
