package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External sink surface (SURVEY §2.2). File sinks are exercised by the
  * medallion pipeline; Kafka/JDBC builders compile against stock Spark
  * and go live when the connector jar is present.
  */
object Sinks {

  /** The Kafka producer record frame — `key` = the cast primary key
    * (single column, the reference's `str(pk)` contract; NULL pk stays a
    * NULL key so the broker round-robins it) or, for composite keys, the
    * key columns as a JSON struct — unambiguous under NULL components
    * and ':'-containing strings, where naive joining would collide
    * distinct keys ((\"a:b\",\"c\") vs (\"a\",\"b:c\")) or silently drop
    * nulls. `value` = the full row as JSON. Keying by pk is what gives
    * per-key ordering inside a partition (mysql_to_kafka.py:57-87).
    * Split from the write so the record construction — the actual
    * contract — is testable in this broker-less container; [[toKafka]]
    * is the thin transport layer. */
  def kafkaRecords(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "kafka keying needs at least one key column")
    val key =
      if (keyCols.sizeIs == 1) col(keyCols.head).cast("string")
      else to_json(struct(keyCols.map(col): _*))
    df.select(
      key.as("key"),
      to_json(struct(df.columns.map(col): _*)).as("value"))
  }

  /** The exact (format, options) pair [[toKafka]] submits to the
    * DataFrameWriter — split out so the transport wiring is a testable
    * contract in this broker-less container (the closest available
    * analogue of a MockedProducer assertion); [[toKafka]] stays a
    * two-liner that cannot drift from it. */
  def kafkaWriteConfig(bootstrap: String, topic: String): (String, Map[String, String]) = {
    require(bootstrap.nonEmpty, "kafka.bootstrap.servers must be non-empty")
    require(topic.nonEmpty, "topic must be non-empty")
    ("kafka", Map("kafka.bootstrap.servers" -> bootstrap, "topic" -> topic))
  }

  /** K1 — Kafka produce with primary-key keying. */
  def toKafka(df: DataFrame, bootstrap: String, topic: String, keyCol: String): Unit = {
    val (fmt, opts) = kafkaWriteConfig(bootstrap, topic)
    kafkaRecords(df, Seq(keyCol)).write.format(fmt).options(opts).save()
  }

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
