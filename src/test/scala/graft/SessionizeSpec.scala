package graft

import java.sql.Timestamp

import graft.core.Lake
import graft.queries.PipelineOps
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Ev
import org.apache.spark.sql.functions._

/** The typed stateful sessionizer (flatMapGroupsWithState) must agree
  * exactly with the SQL window twin (q43) — same floor-second gap
  * semantics, same session ordinals, same boundaries.
  */
class SessionizeSpec extends SparkSpec {

  test("typed sessionize equals the SQL window twin on real events") {
    import spark.implicits._
    val evs = Lake(spark, sfDir).events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev]
    val typed = EventStreams.sessionize(evs, 30)
      .select(col("user_id"), col("session_id"), col("n_events"),
        date_format(col("start_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("start_ts"),
        date_format(col("end_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("end_ts"))
      .orderBy(col("user_id"), col("session_id"))
      .collect()

    val sql = PipelineOps.q43Sessionize(spark, sfDir)
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("start_ts"), col("end_ts"))
      .collect()

    assert(typed.length === sql.length)
    typed.zip(sql).foreach { case (a, b) => assert(a === b) }
  }

  test("streaming sessionize stitches sessions across micro-batches and keeps ordinals") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    def t(s: String) = Timestamp.valueOf(s"2026-01-01 $s")
    val ms = MemoryStream[Ev]
    val q = EventStreams.sessionizeStream(ms.toDS(), 30).writeStream
      .format("memory").queryName("sess_stream")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        new java.io.File(
          s"target/tmp/ckpt_sess_${java.util.UUID.randomUUID()}").getAbsolutePath)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      def rows() = spark.table("sess_stream")
        .filter(col("user_id").isin(7L, 9L))
        .orderBy("user_id", "session_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

      // batch 1: user 7 opens a session
      ms.addData(Ev(1, t("10:00:00"), 7L, "x", 1.0), Ev(2, t("10:10:00"), 7L, "x", 1.0))
      q.processAllAvailable()
      assert(rows().isEmpty, "open session must not emit early")

      // batch 2: user 7 extends WITHIN the gap (the cross-batch stitch the
      // batch-only version would break); user 9 opens independently
      ms.addData(Ev(3, t("10:20:00"), 7L, "x", 1.0), Ev(4, t("10:00:00"), 9L, "x", 1.0))
      q.processAllAvailable()
      assert(rows().isEmpty)

      // batch 3: watermark pusher (user 99 at 13:00 → wm 12:30 > 10:50)
      // expires both open sessions via event-time timeout
      ms.addData(Ev(5, t("13:00:00"), 99L, "x", 1.0))
      q.processAllAvailable()
      ms.addData(Ev(6, t("13:05:00"), 99L, "x", 1.0)) // extra batch so timeouts fire
      q.processAllAvailable()
      assert(rows() === Seq((7L, 1L, 3L), (9L, 1L, 1L)),
        "stitched session (3 events) + singleton expected")

      // batch 4: user 7 returns → session ordinal continues at 2
      ms.addData(Ev(7, t("13:10:00"), 7L, "x", 1.0))
      q.processAllAvailable()
      ms.addData(Ev(8, t("16:00:00"), 99L, "x", 1.0)) // expire it
      q.processAllAvailable()
      ms.addData(Ev(9, t("16:05:00"), 99L, "x", 1.0))
      q.processAllAvailable()
      assert(rows() === Seq((7L, 1L, 3L), (7L, 2L, 1L), (9L, 1L, 1L)),
        "per-user ordinal must survive the timeout cursor")
    } finally q.stop()
  }

  test("streaming merge tolerates an out-of-order in-gap event (boundaries stay min/max)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    def t(s: String) = Timestamp.valueOf(s"2026-01-01 $s")
    val ms = MemoryStream[Ev]
    val q = EventStreams.sessionizeStream(ms.toDS(), 30).writeStream
      .format("memory").queryName("sess_ooo")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        new java.io.File(
          s"target/tmp/ckpt_ooo_${java.util.UUID.randomUUID()}").getAbsolutePath)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1: user 7 at 12:00 (watermark still far behind)
      ms.addData(Ev(1, t("12:00:00"), 7L, "x", 1.0))
      q.processAllAvailable()
      // batch 2: an EARLIER in-gap event arrives late (11:45 ≥ watermark).
      // A naive merge would regress `last` to 11:45 and then SPLIT on the
      // 12:20 event below (35 min after the regressed last, 20 min after
      // the true one), where the batch twin merges all three.
      ms.addData(Ev(2, t("11:45:00"), 7L, "x", 1.0))
      q.processAllAvailable()
      ms.addData(Ev(3, t("12:20:00"), 7L, "x", 1.0))
      q.processAllAvailable()
      // expire via watermark pushers
      ms.addData(Ev(4, t("15:00:00"), 99L, "x", 1.0))
      q.processAllAvailable()
      ms.addData(Ev(5, t("15:05:00"), 99L, "x", 1.0))
      q.processAllAvailable()
      val out = spark.table("sess_ooo").filter(col("user_id") === 7L)
        .collect().map(r => (r.getLong(1), r.getLong(2),
          r.getTimestamp(3), r.getTimestamp(4))).toSeq
      assert(out === Seq((1L, 3L, t("11:45:00"), t("12:20:00"))),
        "one merged session, start=min end=max — matching the batch twin")
    } finally q.stop()
  }

  test("gap boundary: exactly 1800 s continues the session, 1801 s splits") {
    import spark.implicits._
    def t(sec: Long) = new Timestamp(sec * 1000L)
    val evs = Seq(
      Ev(1, t(0), 7L, "x", 1.0),
      Ev(2, t(1800), 7L, "x", 1.0),   // = gap → same session
      Ev(3, t(3601), 7L, "x", 1.0),   // 1801 s → new session
      Ev(4, t(100), 8L, "x", 1.0)     // other user independent
    ).toDS()
    val out = EventStreams.sessionize(evs, 30)
      .orderBy(col("user_id"), col("session_id")).collect()
    val u7 = out.filter(_.user_id == 7L)
    assert(u7.map(r => (r.session_id, r.n_events)).toSeq === Seq((1L, 2L), (2L, 1L)))
    assert(out.count(_.user_id == 8L) === 1)
  }
}
