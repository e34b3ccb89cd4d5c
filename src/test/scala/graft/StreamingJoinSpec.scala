package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval joins ([[EventStreams.joinWithin]]):
  * the impression→click attribution shape — inner matches inside the
  * window, leftOuter emits never-converted impressions once the
  * watermark proves no click can still arrive, and the interval
  * condition bounds both sides' state. */
class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val H = 3600000L
  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("inner: clicks attribute to the impression window; out-of-window never match") {
    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = EventStreams.joinWithin(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("ad_id", "click_ts"),
      "ad_id", "imp_ts", "click_ts", within = "1 hour",
      watermarkDelay = "10 minutes")
    val q = joined.select("ad_id", "imp_ts", "click_ts")
      .writeStream.format("memory").queryName("ss_inner")
      .outputMode("append").start()
    try {
      // base epoch 10:00; A clicks at +20min (in window), B at +90min
      // (outside), C's click precedes its impression (never matches)
      imps.addData((1L, ts(10 * H)), (2L, ts(10 * H)), (3L, ts(10 * H)))
      clicks.addData((1L, ts(10 * H + 20 * 60000L)),
        (2L, ts(10 * H + 90 * 60000L)), (3L, ts(9 * H)))
      q.processAllAvailable()
      val rows = spark.table("ss_inner").collect()
        .map(r => (r.getLong(0), r.getTimestamp(2).getTime))
      assert(rows.toSeq === Seq((1L, 10 * H + 20 * 60000L)))
      // a second click for ad 1 inside the window also attributes
      clicks.addData((1L, ts(10 * H + 40 * 60000L)))
      q.processAllAvailable()
      assert(spark.table("ss_inner").count() === 2L)
    } finally q.stop()
  }

  test("leftOuter: unconverted impressions emit with null click after the watermark") {
    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = EventStreams.joinWithin(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("ad_id", "click_ts"),
      "ad_id", "imp_ts", "click_ts", within = "1 hour",
      watermarkDelay = "10 minutes", joinType = "leftOuter")
    val q = joined.select("ad_id", "imp_ts", "click_ts")
      .writeStream.format("memory").queryName("ss_outer")
      .outputMode("append").start()
    try {
      imps.addData((1L, ts(10 * H)), (2L, ts(10 * H)))
      clicks.addData((1L, ts(10 * H + 30 * 60000L)))
      q.processAllAvailable()
      // advance BOTH watermarks far past 11:10 (window end + delay) so
      // ad 2's no-click outcome is provable, then one more batch to
      // flush the outer result
      imps.addData((99L, ts(20 * H)))
      clicks.addData((99L, ts(20 * H)))
      q.processAllAvailable()
      imps.addData((98L, ts(20 * H + 1)))
      clicks.addData((98L, ts(20 * H + 1)))
      q.processAllAvailable()
      val byAd = spark.table("ss_outer").collect()
        .map(r => r.getLong(0) -> Option(r.getTimestamp(2))).toMap
      assert(byAd(1L).isDefined, "converted impression keeps its click")
      assert(byAd.contains(2L) && byAd(2L).isEmpty,
        s"unconverted impression must emit with null click: $byAd")
    } finally q.stop()
  }

  test("column contract: overlapping non-key columns refuse") {
    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    intercept[IllegalArgumentException] {
      EventStreams.joinWithin(
        imps.toDF().toDF("ad_id", "ts"),
        clicks.toDF().toDF("ad_id", "ts"),
        "ad_id", "ts", "ts", within = "1 hour")
    }
  }
}
