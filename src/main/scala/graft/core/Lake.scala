package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access over a scale-factor directory of parquet files
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * Mirrors the reference's layer catalog (query_datalake.py:32-94): every
  * table is a directory/file of parquet, loaded lazily and registered as a
  * temp view on demand. Unlike the reference we do NOT run an eager
  * `count()` per table at catalog-load time (query_datalake.py:51,66,81
  * triggers one Spark job per table before any query runs) — at 100 TB that
  * is a full-lake scan just to print numbers.
  */
final case class Lake(spark: SparkSession, dir: String) {

  /** All driver-generated tables (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Raw parquet read; `table` routes through per-table fixups. */
  private def raw(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def table(name: String): DataFrame =
    if (name == "events") events else raw(name)

  // Shorthands used throughout the query inventory.
  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")

  /** events.parquet has shipped with two physical types for `ts` across
    * driver testdata generations: INT64 TIMESTAMP(NANOS) — which the Spark
    * parquet reader surfaces as plain long under the legacy nanosAsLong
    * conf (set session-wide in [[SparkSessionFactory.builder]]; repeated
    * here for sessions built outside the factory) — and standard
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false, which surfaces as
    * TIMESTAMP_NTZ. Both normalize to the SAME session-local TimestampType
    * column so every downstream query/oracle sees one shape: nanos are
    * floor-divided to micros (lossless — the generator emits
    * microsecond-resolution values), and NTZ casts 1:1 under the factory's
    * pinned UTC session timezone. */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = raw("events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Register every table as a temp view (reference C1,
    * query_datalake.py:50,65,80) so `spark.sql` works over the lake.
    */
  def registerViews(): Unit =
    tableNames.foreach(n => table(n).createOrReplaceTempView(n))
}
