package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** External source surface (SURVEY §2.1). Parquet/JSON paths are exercised
  * end-to-end by the query inventory; the JDBC and Kafka builders are the
  * production ingestion path and compile against the stock Spark API but
  * cannot run here (no broker/DB/driver jar in this zero-egress container)
  * — swap in the connector jar and they are live.
  */
object Sources {

  /** S1/S6 — parallel JDBC table scan. `partitionColumn` splits the scan
    * into `numPartitions` range-bounded queries — the Spark-native
    * replacement for the reference's single-cursor 1000-row batch loop
    * (mysql_to_kafka.py:37-55): every executor pulls its own slice.
    */
  def jdbc(
      spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int = 32,
      props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
    props.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  /** S2 — streaming Kafka source for the bronze ingest topics
    * (kafka_to_bronze.py:19-25): earliest offsets, one topic per table. */
  def kafkaStream(
      spark: SparkSession, bootstrap: String, topics: Seq[String]): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", "earliest")
      .load()

  /** The reference's CDC envelope (mysql_to_kafka.py:68-73). */
  def envelopeSchema(dataSchema: StructType): StructType =
    StructType(Seq(
      StructField("table", StringType),
      StructField("operation", StringType),
      StructField("timestamp", StringType),
      StructField("data", dataSchema)))

  /** S3 — Debezium change-event value schema (setup_debezium.py:26-38):
    * `payload.op` (c/u/d/r), `payload.before`/`payload.after` row images,
    * source metadata. */
  def debeziumSchema(rowSchema: StructType): StructType =
    StructType(Seq(StructField("payload", StructType(Seq(
      StructField("op", StringType),
      StructField("ts_ms", LongType),
      StructField("before", rowSchema),
      StructField("after", rowSchema),
      StructField("source", StructType(Seq(
        StructField("db", StringType),
        StructField("table", StringType)))))))))

  /** Parse Kafka `value` bytes as an envelope and flatten `data.*` —
    * the streaming twin of Medallion.readBronze. */
  def parseEnvelope(kafka: DataFrame, dataSchema: StructType): DataFrame =
    kafka
      .select(from_json(col("value").cast(StringType),
        envelopeSchema(dataSchema)).as("env"))
      .select(col("env.operation").as("_op"), col("env.data.*"))

  /** Parse a Debezium value: apply the after-image for c/u/r, tombstone
    * rows (op = d) keep the before-image keys with `_deleted` = true. */
  def parseDebezium(kafka: DataFrame, rowSchema: StructType): DataFrame = {
    val parsed = kafka.select(from_json(col("value").cast(StringType),
      debeziumSchema(rowSchema)).as("v"))
    parsed.select(
      col("v.payload.op").as("_op"),
      // null-safe: a missing/unknown op is NOT a delete — an unguarded
      // (op === "d") yields NULL there, which downstream applyCdc would
      // treat as neither upsert nor keep (silent row loss)
      coalesce(col("v.payload.op") === "d", lit(false)).as("_deleted"),
      coalesce(col("v.payload.after"), col("v.payload.before")).as("row"))
      .select(col("_op"), col("_deleted"), col("row.*"))
  }
}
