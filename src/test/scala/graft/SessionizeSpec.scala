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
