package graft

import graft.core.Lake
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming must agree exactly with batch over the same data
  * (the bounded-replay equivalence the reference's consumer loop only
  * approximates).
  */
class StreamingSpec extends SparkSpec {

  test("streaming hourly windowed aggregate equals the batch computation") {
    val streamed = EventStreams
      .hourlyEventCounts(spark, sfDir, "spec_hourly")
      .orderBy(col("hour_ts"), col("event_type"))
      .collect()

    val batch = Lake(spark, sfDir).events
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .orderBy(col("hour_ts"), col("event_type"))
      .collect()

    assert(streamed.length === batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s === b) }
  }
}
