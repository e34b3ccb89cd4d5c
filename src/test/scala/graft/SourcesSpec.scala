package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Envelope/CDC parsing is testable without a broker: the parse functions
  * take any DataFrame with a `value` column (exactly what the Kafka source
  * emits).
  */
class SourcesSpec extends SparkSpec {

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("amount", DoubleType)))

  test("kafkaRecords builds the producer contract: pk key, JSON value, round-trippable") {
    import graft.sources.Sinks
    import spark.implicits._
    val src = Seq((7L, "a", 1.5), (8L, "b", 2.5)).toDF("id", "name", "amount")
    val recs = Sinks.kafkaRecords(src, Seq("id"))
    // exactly the (key, value) string pair the kafka sink requires
    assert(recs.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
      === Seq(("key", "string"), ("value", "string")))
    assert(recs.orderBy("key").collect().map(_.getString(0)).toSeq === Seq("7", "8"))
    // the value is the FULL row: parsing it back recovers every column
    val back = recs.select(from_json(col("value"),
      src.schema).as("r")).select(col("r.*"))
    assert(back.orderBy("id").collect().toSeq === src.orderBy("id").collect().toSeq)
    // composite keys (junction tables) serialize as a JSON struct —
    // distinct rows keep distinct keys even with NULLs or ':' in values
    val junction = Seq((1L, 10L), (1L, 11L)).toDF("actor_id", "film_id")
    val keys = Sinks.kafkaRecords(junction, Seq("actor_id", "film_id"))
      .select("key").collect().map(_.getString(0)).toSet
    assert(keys === Set(
      """{"actor_id":1,"film_id":10}""", """{"actor_id":1,"film_id":11}"""))
    // a NULL single pk stays a NULL key (broker round-robin), never ""
    val withNull = Seq(Some(5L), None).map(Tuple1(_)).toDF("id")
    val nullKeys = Sinks.kafkaRecords(withNull, Seq("id"))
      .select("key").collect().map(r => Option(r.getString(0)))
    assert(nullKeys.toSet === Set(Some("5"), None))
  }

  test("toKafka's transport wiring is the documented (format, options) contract") {
    import graft.sources.Sinks
    // no broker exists in this container; the write config is split from
    // the save() so the wiring itself stays covered (K1)
    val (fmt, opts) = Sinks.kafkaWriteConfig("b1:29092,b2:29092", "sakila.actor")
    assert(fmt === "kafka")
    assert(opts === Map(
      "kafka.bootstrap.servers" -> "b1:29092,b2:29092",
      "topic" -> "sakila.actor"))
    intercept[IllegalArgumentException] { Sinks.kafkaWriteConfig("", "t") }
    intercept[IllegalArgumentException] { Sinks.kafkaWriteConfig("b", "") }
  }

  test("parseEnvelope flattens the CDC envelope and keeps the operation") {
    import spark.implicits._
    val kafkaish = Seq(
      """{"table":"t","operation":"INSERT","timestamp":"2026-01-01 00:00:00","data":{"id":1,"amount":12.5}}""",
      """{"table":"t","operation":"UPDATE","timestamp":"2026-01-01 00:00:01","data":{"id":2,"amount":7.25}}""")
      .toDF("value")
    val out = Sources.parseEnvelope(kafkaish, rowSchema)
      .orderBy("id").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("INSERT", "UPDATE"))
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L))
    assert(out.map(_.getDouble(2)).toSeq === Seq(12.5, 7.25))
  }

  test("parseDebezium applies after-images and flags deletes with before-images") {
    import spark.implicits._
    val events = Seq(
      """{"payload":{"op":"c","ts_ms":1,"before":null,"after":{"id":1,"amount":5.0},"source":{"db":"d","table":"t"}}}""",
      """{"payload":{"op":"u","ts_ms":2,"before":{"id":2,"amount":1.0},"after":{"id":2,"amount":9.0},"source":{"db":"d","table":"t"}}}""",
      """{"payload":{"op":"d","ts_ms":3,"before":{"id":3,"amount":4.0},"after":null,"source":{"db":"d","table":"t"}}}""")
      .toDF("value")
    val out = Sources.parseDebezium(events, rowSchema).orderBy("id").collect()
    assert(out.length === 3)
    assert(out.map(r => (r.getLong(2), r.getDouble(3))).toSeq ===
      Seq((1L, 5.0), (2L, 9.0), (3L, 4.0)))
    assert(out.map(_.getBoolean(1)).toSeq === Seq(false, false, true))
  }
}
