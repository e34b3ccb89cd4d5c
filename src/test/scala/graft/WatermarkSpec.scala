package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Watermark + append-mode semantics on a live MemoryStream: windows
  * finalize only once the watermark passes, and late data beyond the
  * watermark is dropped — the §2.10 enhancement the reference's raw
  * consumer loop has no notion of.
  */
class WatermarkSpec extends SparkSpec {

  private def t(h: Int, m: Int = 0) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  test("dedupStream drops in-horizon redeliveries; state is watermark-bounded") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val out = graft.streaming.EventStreams.dedupStream(
      ms.toDF().toDF("ts", "event_id"), Seq("event_id"), "ts", "1 hour")
    val q = out.writeStream
      .format("memory").queryName("dedup_spec")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        new java.io.File(
          s"target/tmp/ckpt_dedup_${java.util.UUID.randomUUID()}").getAbsolutePath)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1: event 1 twice in one batch + event 2
      ms.addData((t(10, 0), 1L), (t(10, 1), 1L), (t(10, 5), 2L))
      q.processAllAvailable()
      // batch 2: event 1 REDELIVERED across batches (still in horizon)
      ms.addData((t(10, 30), 1L), (t(10, 31), 3L))
      q.processAllAvailable()
      assert(spark.table("dedup_spec").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L),
        "each key must pass exactly once within the watermark horizon")

      // advance the watermark far past event 1's dedup state, then the
      // SAME key arrives again: state was dropped → passes again. That
      // is the bounded-memory contract (horizon dedup, not forever).
      ms.addData((t(14, 0), 99L))
      q.processAllAvailable()
      ms.addData((t(14, 5), 1L))
      q.processAllAvailable()
      val ids = spark.table("dedup_spec").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(ids === Seq(1L, 1L, 2L, 3L, 99L),
        "a key re-arriving AFTER its state expired passes again")
    } finally q.stop()
  }

  test("append-mode hourly windows finalize past the watermark; late rows are dropped") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val agg = ms.toDF().toDF("ts", "v")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
      .select(date_format(col("window.start"), "HH:mm").as("h"), col("n"), col("sum_v"))
    val q = agg.writeStream
      .format("memory").queryName("wm_spec")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        new java.io.File(
          s"target/tmp/ckpt_wm_${java.util.UUID.randomUUID()}").getAbsolutePath)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1: events in hours 10 and 11 → nothing final yet
      ms.addData((t(10, 5), 1L), (t(10, 40), 2L), (t(11, 10), 4L))
      q.processAllAvailable()
      assert(spark.table("wm_spec").count() === 0)

      // batch 2: event at 13:30 → watermark 12:30 → hours 10,11 finalize
      ms.addData((t(13, 30), 8L))
      q.processAllAvailable()
      val closed = spark.table("wm_spec").orderBy("h").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(closed.toSeq === Seq(("10:00", 2L, 3L), ("11:00", 1L, 4L)))

      // batch 3: a LATE row for hour 10 (behind the watermark) is dropped
      ms.addData((t(10, 50), 100L), (t(15, 0), 16L))
      q.processAllAvailable()
      val after = spark.table("wm_spec").orderBy("h").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // hour-10 window unchanged, no duplicate emission
      assert(after.count(_._1 == "10:00") === 1)
      assert(after.find(_._1 == "10:00").get === (("10:00", 2L, 3L)))
    } finally q.stop()
  }
}
