package graft

import graft.core.Lake
import graft.sources.{Sinks, Sources}
import org.apache.spark.sql.functions._

/** LIVE JDBC round-trip on embedded Derby (ships on Spark's classpath for
  * the Hive metastore): `Sinks.toJdbc` writes a gold table with
  * distributed batched inserts — the reference collects to pandas on the
  * driver instead (gold_to_postgres.py:33-58) — and `Sources.jdbc` reads
  * it back as a 4-way range-partitioned scan (mysql_to_kafka.py:37-55
  * reads a single cursor). This moves S1/S6/K5 from compile-level to
  * exercised: only the URL/driver differ against MySQL/Postgres.
  */
class JdbcSpec extends SparkSpec {

  private val dbDir = new java.io.File("target/tmp/derby_spec_db").getAbsolutePath
  private val url = s"jdbc:derby:$dbDir;create=true"
  private val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  test("toJdbc gold write round-trips through a partitioned Sources.jdbc scan") {
    val gold = Lake(spark, sfDir).orders
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_spent"))
    Sinks.toJdbc(gold, url, "customer_summary", props)

    val bounds = gold.agg(min("o_custkey"), max("o_custkey")).head()
    val back = Sources.jdbc(spark, url, "customer_summary",
      partitionColumn = "o_custkey",
      lowerBound = bounds.getLong(0), upperBound = bounds.getLong(1),
      numPartitions = 4, props = props)

    // the scan is genuinely split: every executor pulls its own range
    assert(back.rdd.getNumPartitions === 4)

    val a = gold.orderBy("o_custkey").collect()
    val b = back.orderBy("o_custkey").collect()
    assert(a.length === b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) === y.getLong(0))
      assert(x.getLong(1) === y.getLong(1))
      assert(x.getDouble(2) === y.getDouble(2))
    }
  }

  test("toJdbc overwrite mode replaces, not appends") {
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sinks.toJdbc(v1, url, "ow_check", props)
    val v2 = Seq((3L, "c")).toDF("id", "v")
    Sinks.toJdbc(v2, url, "ow_check", props)
    val back = Sources.jdbc(spark, url, "ow_check", "id", 0L, 10L, 2, props)
    assert(back.collect().map(_.getLong(0)).toSeq === Seq(3L))
  }
}
