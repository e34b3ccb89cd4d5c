package graft.sakila

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-exact Sakila pipeline: the four silver cleaning rules
  * (bronze_to_silver.py:73-120) and four gold builders
  * (silver_to_gold.py:41-182), re-expressed declaratively with an
  * injected clock (`clock` = "yyyy-MM-dd HH:mm:ss") replacing
  * `current_timestamp()`/`current_date()` so outputs are reproducible
  * (SURVEY §7.4.3).
  *
  * Parity quirks preserved ON PURPOSE (SURVEY §7.4.2):
  *  - `customer_summary` joins payment AND rental both on customer_id
  *    (silver_to_gold.py:53-55) — a fan-out: every metric counts
  *    payment×rental combinations, exactly as the reference computes.
  *  - `film_performance` joins `f.film_id == r.inventory_id`
  *    (silver_to_gold.py:92) — the reference's ID-space conflation.
  *  - `popularity_rank` is an UNPARTITIONED row_number over
  *    desc(total_rentals) (silver_to_gold.py:122-124) — kept as-is; a
  *    scale deployment partitions it (SURVEY §7.4.5).
  */
object SakilaPipeline {

  private def audit(df: DataFrame, clock: String): DataFrame =
    df.withColumn("processed_at", to_timestamp(lit(clock)))
      .withColumn("processed_date", to_date(col("processed_at")))

  /** bronze_to_silver.py:73-83 — flatten, email upper(trim), timestamp
    * casts, active→int, dedup by pk, drop null pk/email. */
  def cleanCustomer(bronze: DataFrame, clock: String): DataFrame =
    audit(
      bronze.select(col("data.*"))
        .withColumn("email", upper(trim(col("email"))))
        .withColumn("create_date", to_timestamp(col("create_date")))
        .withColumn("last_update", to_timestamp(col("last_update")))
        .withColumn("active", col("active").cast(IntegerType))
        .dropDuplicates("customer_id")
        .na.drop("any", Seq("customer_id", "email")),
      clock)

  /** bronze_to_silver.py:85-98. Decimal columns arrive as JSON strings
    * ("2.99", mysql_to_kafka.py:27 default=str) — cast to double. */
  def cleanFilm(bronze: DataFrame, clock: String): DataFrame =
    audit(
      bronze.select(col("data.*"))
        .withColumn("title", trim(col("title")))
        .withColumn("release_year", col("release_year").cast(IntegerType))
        .withColumn("rental_duration", col("rental_duration").cast(IntegerType))
        .withColumn("rental_rate", col("rental_rate").cast(DoubleType))
        .withColumn("length", col("length").cast(IntegerType))
        .withColumn("replacement_cost", col("replacement_cost").cast(DoubleType))
        .withColumn("last_update", to_timestamp(col("last_update")))
        .dropDuplicates("film_id")
        .na.drop("any", Seq("film_id", "title")),
      clock)

  /** bronze_to_silver.py:100-109 — negative amounts clamp to 0. */
  def cleanPayment(bronze: DataFrame, clock: String): DataFrame =
    audit(
      bronze.select(col("data.*"))
        // the reference's `when(amount < 0, 0)` relies on Spark 3.5
        // non-ANSI string→double coercion; Spark 4 ANSI coerces the
        // comparison to BIGINT and rejects "10.00" — cast explicitly,
        // identical semantics
        .withColumn("amount",
          when(col("amount").cast(DoubleType) < 0, 0)
            .otherwise(col("amount").cast(DoubleType)))
        .withColumn("payment_date", to_timestamp(col("payment_date")))
        .withColumn("last_update", to_timestamp(col("last_update")))
        .dropDuplicates("payment_id")
        .na.drop("any", Seq("payment_id", "amount")),
      clock)

  /** bronze_to_silver.py:111-120 — open rentals keep null return_date. */
  def cleanRental(bronze: DataFrame, clock: String): DataFrame =
    audit(
      bronze.select(col("data.*"))
        .withColumn("rental_date", to_timestamp(col("rental_date")))
        .withColumn("return_date", to_timestamp(col("return_date")))
        .withColumn("last_update", to_timestamp(col("last_update")))
        .dropDuplicates("rental_id")
        .na.drop("any", Seq("rental_id", "rental_date")),
      clock)

  /** silver_to_gold.py:41-77 — customer_summary with the reference's
    * payment×rental fan-out and ≥200/≥100/≥50 tier thresholds. */
  def customerSummary(
      customer: DataFrame, payment: DataFrame, rental: DataFrame,
      clock: String): DataFrame =
    customer.alias("c")
      .join(payment.alias("p"), col("c.customer_id") === col("p.customer_id"), "left")
      .join(rental.alias("r"), col("c.customer_id") === col("r.customer_id"), "left")
      .groupBy(col("c.customer_id"), col("c.email"), col("c.active"))
      .agg(
        count(col("p.payment_id")).as("total_payments"),
        // exact DECIMAL accumulation, cast back to the double the
        // reference materializes: plain double sum/avg is partial-agg
        // ORDER-dependent and can differ run to run at multi-partition
        // scale (repo determinism policy)
        sum(col("p.amount").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("total_spent"),
        (sum(col("p.amount").cast(DecimalType(18, 2))).cast(DoubleType)
          / count(col("p.amount"))).as("avg_payment_amount"),
        count(col("r.rental_id")).as("total_rentals"),
        max(col("p.payment_date")).as("last_payment_date"),
        max(col("r.rental_date")).as("last_rental_date"))
      .withColumn("customer_value_tier",
        when(col("total_spent") >= 200, "Premium")
          .when(col("total_spent") >= 100, "Gold")
          .when(col("total_spent") >= 50, "Silver")
          .otherwise("Bronze"))
      .withColumn("created_at", to_timestamp(lit(clock)))

  /** silver_to_gold.py:79-127 — film_performance, preserving the
    * film_id==inventory_id join and the release-year/day guard. */
  def filmPerformance(
      film: DataFrame, rental: DataFrame, payment: DataFrame,
      clock: String): DataFrame = {
    val base = film.alias("f")
      .join(rental.alias("r"), col("f.film_id") === col("r.inventory_id"), "left")
      .join(payment.alias("p"), col("r.rental_id") === col("p.rental_id"), "left")
      .groupBy(col("f.film_id"), col("f.title"), col("f.release_year"),
        col("f.rental_rate"), col("f.rental_duration"))
      .agg(
        count(col("r.rental_id")).as("total_rentals"),
        sum(col("p.amount").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("total_revenue"),
        (sum(col("p.amount").cast(DecimalType(18, 2))).cast(DoubleType)
          / count(col("p.amount"))).as("avg_revenue_per_rental"),
        countDistinct(col("r.customer_id")).as("unique_customers"))
    val days = datediff(to_date(lit(clock)),
      to_date(col("release_year").cast(StringType), "yyyy"))
    base
      .withColumn("revenue_per_day",
        col("total_revenue") / when(days > 0, days).otherwise(lit(1)))
      .withColumn("popularity_rank",
        // film_id tie-break: equal rental counts (every never-rented
        // film ties at 0) would otherwise rank in shuffle arrival order
        row_number().over(Window.orderBy(desc("total_rentals"), col("f.film_id"))))
      .withColumn("created_at", to_timestamp(lit(clock)))
  }

  /** silver_to_gold.py:129-156 — daily_revenue with lag growth %. */
  def dailyRevenue(payment: DataFrame, clock: String): DataFrame = {
    val w = Window.orderBy("payment_date")
    payment
      .withColumn("payment_date", to_date(col("payment_date")))
      .groupBy("payment_date")
      .agg(
        count(col("payment_id")).as("total_transactions"),
        sum(col("amount").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("total_revenue"),
        (sum(col("amount").cast(DecimalType(18, 2))).cast(DoubleType)
          / count(col("amount"))).as("avg_transaction_amount"),
        min(col("amount")).as("min_transaction"),
        max(col("amount")).as("max_transaction"))
      .withColumn("revenue_growth",
        (col("total_revenue") - lag("total_revenue", 1).over(w))
          / lag("total_revenue", 1).over(w) * 100)
      .withColumn("created_at", to_timestamp(lit(clock)))
      .orderBy("payment_date")
  }

  /** silver_to_gold.py:158-182 — rental_trends by (year, month, dow). */
  def rentalTrends(rental: DataFrame, clock: String): DataFrame =
    rental
      .withColumn("rental_date", to_date(col("rental_date")))
      .withColumn("year", year(col("rental_date")))
      .withColumn("month", month(col("rental_date")))
      .withColumn("day_of_week", dayofweek(col("rental_date")))
      .groupBy("year", "month", "day_of_week")
      .agg(
        count(col("rental_id")).as("total_rentals"),
        countDistinct(col("customer_id")).as("unique_customers"),
        avg(datediff(col("return_date"), col("rental_date"))).as("avg_rental_duration"))
      .withColumn("created_at", to_timestamp(lit(clock)))
      .orderBy("year", "month", "day_of_week")
}
