package graft.medallion

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Medallion-architecture layers: bronze (raw CDC-envelope JSON lines,
  * ingest-date partitioned) → silver (cleaned, typed, deduped parquet) →
  * gold (aggregated parquet).
  *
  * Mirrors the reference's layer semantics — envelope format
  * `{table, operation, timestamp, data:{…row…}}` (mysql_to_kafka.py:68-73),
  * Hive-style `year=/month=/day=` bronze partitions (kafka_to_bronze.py:51),
  * silver cleaning = flatten + cast + dedup + null-drop
  * (bronze_to_silver.py:73-120), `processed_date`-partitioned silver
  * (bronze_to_silver.py:125), unpartitioned gold (silver_to_gold.py:184-194)
  * — re-expressed as declarative DataFrame transforms.
  *
  * Determinism: the wall clock is injected (`clock` parameter) instead of
  * `current_timestamp()` (SURVEY §7.4 hard part 3), so every layer is
  * byte-reproducible and oracle-checkable.
  *
  * Scale notes: bronze partitions by INGEST date (one partition per run,
  * like the reference's consumer) — record-date partitioning would fan a
  * single load into thousands of tiny partitions. Writers use
  * `maxRecordsPerFile` to bound file size; silver dedup is the only wide
  * stage (hash shuffle on the primary key).
  */
object Medallion {

  /** Wrap rows in the bronze CDC envelope. `clock` = ingest timestamp
    * (ISO string), injected for determinism. */
  def toEnvelope(df: DataFrame, table: String, clock: String): DataFrame =
    df.select(
      to_json(struct(
        lit(table).as("table"),
        lit("INSERT").as("operation"),
        lit(clock).as("timestamp"),
        struct(df.columns.map(col): _*).as("data"))).as("value"))

  /** Bronze write: JSON lines under year=/month=/day= of the ingest date. */
  def writeBronze(df: DataFrame, table: String, clock: String, root: String): String = {
    val path = s"$root/bronze/$table"
    val d = to_date(lit(clock))
    toEnvelope(df, table, clock)
      .withColumn("year", year(d)).withColumn("month", month(d))
      .withColumn("day", dayofmonth(d))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 1000000)
      .partitionBy("year", "month", "day")
      .text(path)
    path
  }

  /** Envelope schema for a given payload schema (explicit — never inferred
    * in production paths; SURVEY §1.2). */
  def envelopeSchema(dataSchema: StructType): StructType =
    StructType(Seq(
      StructField("table", StringType),
      StructField("operation", StringType),
      StructField("timestamp", StringType),
      StructField("data", dataSchema)))

  /** Bronze read: parse the envelope with an explicit schema and flatten
    * `data.*`, keeping the operation column (P1). */
  def readBronze(spark: SparkSession, path: String, dataSchema: StructType): DataFrame =
    spark.read.text(path)
      .select(from_json(col("value"), envelopeSchema(dataSchema)).as("env"))
      .select(col("env.operation").as("_op"), col("env.data.*"))

  /** Declarative silver cleaning rule (bronze_to_silver.py:73-120). */
  final case class CleaningRule(
      dedupKeys: Seq[String],
      requiredCols: Seq[String],
      casts: Map[String, DataType] = Map.empty,
      trimCols: Seq[String] = Seq.empty)

  /** Apply a cleaning rule: cast → trim → dedup-by-key → null-drop, plus
    * the `processed_date` audit column from the injected clock. */
  def toSilver(flatBronze: DataFrame, rule: CleaningRule, clock: String): DataFrame = {
    val casted = rule.casts.foldLeft(flatBronze.drop("_op")) {
      case (d, (c, t)) => d.withColumn(c, col(c).cast(t))
    }
    val trimmed = rule.trimCols.foldLeft(casted) {
      case (d, c) => d.withColumn(c, trim(col(c)))
    }
    trimmed
      .dropDuplicates(rule.dedupKeys)
      .na.drop("any", rule.requiredCols)
      .withColumn("processed_date", to_date(lit(clock)))
  }

  /** Silver write: parquet partitioned by processed_date (K3). */
  def writeSilver(df: DataFrame, table: String, root: String): String = {
    val path = s"$root/silver/$table"
    df.write.mode("overwrite").partitionBy("processed_date").parquet(path)
    path
  }

  /** Gold write: unpartitioned parquet (K4). */
  def writeGold(df: DataFrame, table: String, root: String): String = {
    val path = s"$root/gold/$table"
    df.write.mode("overwrite").parquet(path)
    path
  }

  /** CDC apply (T6) — the Delta-MERGE equivalent as a pure DataFrame
    * operator (no table format in this environment): fold a batch of
    * parsed change rows into the current snapshot.
    *
    * `changes` carries `_deleted: boolean` (from
    * [[graft.sources.Sources.parseDebezium]]) plus a monotonic `seqCol`
    * (e.g. Debezium `ts_ms`); latest change per key wins, a winning
    * delete drops the key, untouched snapshot keys pass through.
    *
    * Scale shape: one shuffle of the (small) change batch for the
    * per-key window, then a key-aligned anti-join against the snapshot —
    * broadcastable when the batch is small, never a snapshot rewrite of
    * more than the touched partitions when layered over partitioned
    * storage.
    */
  def applyCdc(
      snapshot: DataFrame, changes: DataFrame,
      key: String, seqCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val latest = changes
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(col(seqCol).desc)))
      .filter(col("_rn") === 1)
      .drop("_rn")
    val upserts = latest.filter(!col("_deleted"))
      .drop("_deleted", "_op", seqCol)
    snapshot
      .join(latest.select(col(key)), Seq(key), "left_anti")
      .unionByName(upserts)
  }
}
