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

  /** events.parquet carries INT64 TIMESTAMP(NANOS) which the Spark parquet
    * reader rejects outright. We read nanos as long via the legacy conf and
    * rebuild a proper TimestampType column. Lossless here: the generator
    * emits microsecond-resolution values (verified: epoch_ns % 1000 == 0).
    *
    * The conf is session-wide (any OTHER TIMESTAMP(NANOS) parquet in the
    * session also surfaces as long after this) — which is why
    * [[SparkSessionFactory.builder]] sets it at construction for every
    * graft session, making the behavior uniform rather than dependent on
    * whether an events scan ran first. The set here remains for sessions
    * built outside the factory. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw("events")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Register every table as a temp view (reference C1,
    * query_datalake.py:50,65,80) so `spark.sql` works over the lake.
    */
  def registerViews(): Unit =
    tableNames.foreach(n => table(n).createOrReplaceTempView(n))
}
