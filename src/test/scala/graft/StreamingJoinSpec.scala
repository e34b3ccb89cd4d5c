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

  test("sliced time-ordered replay (maxFilesPerTrigger=1) equals the single-batch feed") {
    // The DataScaleProbe's batch-count protocol for q162: the feed is
    // split into time-quantile single-file slices and the pacing knob
    // makes AvailableNow consume one slice per micro-batch. The join's
    // OUTPUT must be invariant to that pacing — inner pairs straddling a
    // slice boundary join out of buffered state, and the final
    // watermark (hence the outer-emission set) is a function of the
    // data alone, not of how many batches delivered it.
    val root = java.nio.file.Files.createTempDirectory("ssj_slice").toFile
    val dirA = new java.io.File(root, "single"); dirA.mkdirs()
    java.nio.file.Files.copy(
      new java.io.File("/root/testdata/sf0.001/events.parquet").toPath,
      new java.io.File(dirA, "events.parquet").toPath)
    val dirB = new java.io.File(root, "sliced")
    // k=1 → replica 0 byte-identical to the original, 3 slices
    graft.tools.DataScaleProbe.synthEvents(
      spark, "/root/testdata/sf0.001", 1, dirB.getPath)
    assert(Option(dirB.listFiles()).toSeq.flatten
      .count(_.getName.startsWith("events_")) === 3)

    val fn = graft.SparkEntry.queries("q162_stream_stream_join")
    val single = fn(spark, dirA.getPath).collect().map(_.toString).sorted
    assert(single.nonEmpty)

    val dataBatches = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0) dataBatches.incrementAndGet()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    spark.conf.set("graft.streaming.maxFilesPerTrigger", "1")
    try {
      val sliced = fn(spark, dirB.getPath).collect().map(_.toString).sorted
      assert(sliced === single,
        "sliced replay must emit exactly the single-batch result set")
      // listener delivery is async — give the bus a moment, then require
      // one data-carrying micro-batch per slice
      val deadline = System.nanoTime() + 10_000_000_000L
      while (dataBatches.get < 3 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(dataBatches.get >= 3,
        s"pacing knob must yield one micro-batch per slice, saw ${dataBatches.get}")
    } finally {
      spark.conf.unset("graft.streaming.maxFilesPerTrigger")
      spark.streams.removeListener(listener)
    }
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
