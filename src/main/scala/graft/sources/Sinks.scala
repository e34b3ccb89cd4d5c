package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External sink surface (SURVEY §2.2). File sinks are exercised by the
  * medallion pipeline; Kafka/JDBC builders compile against stock Spark
  * and go live when the connector jar is present.
  */
object Sinks {

  /** K1 — Kafka produce with primary-key keying (per-key ordering,
    * mysql_to_kafka.py:57-87): key = cast pk, value = envelope JSON. */
  def toKafka(df: DataFrame, bootstrap: String, topic: String, keyCol: String): Unit =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.map(col): _*)).as("value"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .save()

  /** K5 — direct distributed JDBC write (replaces the reference's
    * driver-side pandas collect + chunked to_sql, gold_to_postgres.py:33-58:
    * every executor writes its partition with `batchsize` inserts). */
  def toJdbc(df: DataFrame, url: String, table: String,
      props: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", 1000)
      .mode("overwrite")
    props.foldLeft(w) { case (b, (k, v)) => b.option(k, v) }.save()
  }
}
