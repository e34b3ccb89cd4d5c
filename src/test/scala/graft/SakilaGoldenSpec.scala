package graft

import java.time.LocalDate
import java.time.temporal.ChronoUnit

import graft.sakila.SakilaPipeline
import org.apache.spark.sql.DataFrame

/** Golden end-to-end over Sakila-shaped envelope fixtures (FIXTURES.md §A-C):
  * bronze JSON (string decimals, mixed-type `active`, nulls, duplicates) →
  * silver cleaning → all four gold tables, asserted against hand-computed
  * rows — including the reference's parity quirks (payment×rental fan-out,
  * film_id==inventory_id join, clamp-to-zero).
  */
class SakilaGoldenSpec extends SparkSpec {

  private val clock = "2026-08-12 00:00:00"

  private def bronze(table: String, lines: Seq[String]): DataFrame = {
    val dir = new java.io.File(s"target/tmp/spec_sakila/$table")
    dir.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"${dir.getAbsolutePath}/data.json"),
      lines.mkString("\n").getBytes)
    spark.read.json(dir.getAbsolutePath)
  }

  private def env(table: String, data: String) =
    s"""{"table":"$table","operation":"INSERT","timestamp":"2026-08-12T10:00:00","data":$data}"""

  private lazy val customers = SakilaPipeline.cleanCustomer(bronze("customer", Seq(
    env("customer", """{"customer_id":1,"store_id":1,"first_name":"Mary","last_name":"Smith","email":" mary@x.com ","address_id":5,"active":"1","create_date":"2006-02-14 22:04:36","last_update":"2026-01-01 00:00:00"}"""),
    env("customer", """{"customer_id":1,"store_id":1,"first_name":"Mary","last_name":"Smith","email":" mary@x.com ","address_id":5,"active":"1","create_date":"2006-02-14 22:04:36","last_update":"2026-01-01 00:00:00"}"""),
    env("customer", """{"customer_id":2,"store_id":1,"first_name":"NoMail","last_name":"Null","email":null,"address_id":6,"active":"1","create_date":"2006-02-14 22:04:36","last_update":"2026-01-01 00:00:00"}"""),
    env("customer", """{"customer_id":3,"store_id":2,"first_name":"Bob","last_name":"Jones","email":"bob@y.com","address_id":7,"active":"0","create_date":"2006-02-14 22:04:36","last_update":"2026-01-01 00:00:00"}"""))),
    clock)

  private lazy val payments = SakilaPipeline.cleanPayment(bronze("payment", Seq(
    env("payment", """{"payment_id":101,"customer_id":1,"staff_id":1,"rental_id":201,"amount":"10.00","payment_date":"2026-01-01 10:00:00","last_update":"2026-01-01 00:00:00"}"""),
    env("payment", """{"payment_id":102,"customer_id":1,"staff_id":1,"rental_id":202,"amount":"-5.00","payment_date":"2026-01-01 11:00:00","last_update":"2026-01-01 00:00:00"}"""),
    env("payment", """{"payment_id":103,"customer_id":1,"staff_id":2,"rental_id":null,"amount":"60.00","payment_date":"2026-01-02 10:00:00","last_update":"2026-01-01 00:00:00"}"""),
    env("payment", """{"payment_id":103,"customer_id":1,"staff_id":2,"rental_id":null,"amount":"60.00","payment_date":"2026-01-02 10:00:00","last_update":"2026-01-01 00:00:00"}"""),
    env("payment", """{"payment_id":105,"customer_id":3,"staff_id":1,"rental_id":null,"amount":null,"payment_date":"2026-01-02 11:00:00","last_update":"2026-01-01 00:00:00"}"""),
    env("payment", """{"payment_id":106,"customer_id":9,"staff_id":1,"rental_id":203,"amount":"4.99","payment_date":"2026-01-02 12:00:00","last_update":"2026-01-01 00:00:00"}"""))),
    clock)

  private lazy val rentals = SakilaPipeline.cleanRental(bronze("rental", Seq(
    env("rental", """{"rental_id":201,"rental_date":"2026-01-01 09:00:00","inventory_id":501,"customer_id":1,"return_date":"2026-01-03 09:00:00","staff_id":1,"last_update":"2026-01-01 00:00:00"}"""),
    env("rental", """{"rental_id":202,"rental_date":"2026-01-05 09:00:00","inventory_id":502,"customer_id":1,"return_date":null,"staff_id":1,"last_update":"2026-01-01 00:00:00"}"""),
    env("rental", """{"rental_id":203,"rental_date":"2026-01-01 08:00:00","inventory_id":1,"customer_id":9,"return_date":"2026-01-02 08:00:00","staff_id":2,"last_update":"2026-01-01 00:00:00"}"""),
    env("rental", """{"rental_id":204,"rental_date":null,"inventory_id":503,"customer_id":3,"return_date":null,"staff_id":1,"last_update":"2026-01-01 00:00:00"}"""))),
    clock)

  private lazy val films = SakilaPipeline.cleanFilm(bronze("film", Seq(
    env("film", """{"film_id":1,"title":" Film One ","description":"d","release_year":"2006","language_id":1,"original_language_id":null,"rental_duration":3,"rental_rate":"2.99","length":90,"replacement_cost":"19.99","rating":"PG","special_features":"Trailers,Deleted Scenes","last_update":"2026-01-01 00:00:00"}"""),
    env("film", """{"film_id":2,"title":null,"description":"d","release_year":"2007","language_id":1,"original_language_id":null,"rental_duration":5,"rental_rate":"0.99","length":80,"replacement_cost":"12.99","rating":"G","special_features":"Trailers","last_update":"2026-01-01 00:00:00"}"""),
    env("film", """{"film_id":3,"title":"Film Three","description":"d","release_year":"2010","language_id":1,"original_language_id":null,"rental_duration":5,"rental_rate":"0.99","length":80,"replacement_cost":"12.99","rating":"G","special_features":"Trailers","last_update":"2026-01-01 00:00:00"}"""))),
    clock)

  test("silver cleaning: dedup, null-drop, clamp, trim/upper, string-decimal casts") {
    assert(customers.count() === 2) // dup collapsed, null-email dropped
    val c1 = customers.filter("customer_id = 1").head()
    assert(c1.getAs[String]("email") === "MARY@X.COM")
    assert(c1.getAs[Int]("active") === 1)
    assert(payments.count() === 4) // dup + null-amount dropped
    assert(payments.filter("payment_id = 102").head().getAs[Double]("amount") === 0.0)
    assert(rentals.count() === 3) // null rental_date dropped
    val f1 = films.filter("film_id = 1").head()
    assert(f1.getAs[String]("title") === "Film One")
    assert(f1.getAs[Double]("rental_rate") === 2.99)
    assert(films.count() === 2) // null title dropped
  }

  test("gold customer_summary reproduces the reference fan-out and tiers") {
    val rows = SakilaPipeline.customerSummary(customers, payments, rentals, clock)
      .orderBy("customer_id").collect()
    assert(rows.length === 2)
    val c1 = rows(0)
    // 3 payments × 2 rentals = 6 fanned rows, exactly like the reference
    assert(c1.getAs[Long]("total_payments") === 6L)
    assert(c1.getAs[Double]("total_spent") === 140.0)
    assert(c1.getAs[Double]("avg_payment_amount") === 140.0 / 6)
    assert(c1.getAs[Long]("total_rentals") === 6L)
    assert(c1.getAs[String]("customer_value_tier") === "Gold")
    val c3 = rows(1)
    assert(c3.getAs[Long]("total_payments") === 0L)
    assert(c3.isNullAt(c3.fieldIndex("total_spent")))
    assert(c3.getAs[String]("customer_value_tier") === "Bronze")
  }

  test("gold film_performance preserves the film_id==inventory_id quirk") {
    val rows = SakilaPipeline.filmPerformance(films, rentals, payments, clock)
      .orderBy("film_id").collect()
    assert(rows.length === 2)
    val f1 = rows(0) // matched by rental 203 (inventory_id = 1), payment 106
    assert(f1.getAs[Long]("total_rentals") === 1L)
    assert(f1.getAs[Double]("total_revenue") === 4.99)
    assert(f1.getAs[Long]("unique_customers") === 1L)
    val days = ChronoUnit.DAYS.between(
      LocalDate.of(2006, 1, 1), LocalDate.of(2026, 8, 12)).toDouble
    assert(math.abs(f1.getAs[Double]("revenue_per_day") - 4.99 / days) < 1e-12)
    assert(f1.getAs[Int]("popularity_rank") === 1)
    val f3 = rows(1) // no inventory ids match film_id 3
    assert(f3.getAs[Long]("total_rentals") === 0L)
    assert(f3.isNullAt(f3.fieldIndex("total_revenue")))
    assert(f3.getAs[Int]("popularity_rank") === 2)
  }

  test("gold daily_revenue computes lag growth like the reference") {
    val rows = SakilaPipeline.dailyRevenue(payments, clock)
      .orderBy("payment_date").collect()
    assert(rows.length === 2)
    val d1 = rows(0)
    assert(d1.getAs[Long]("total_transactions") === 2L)
    assert(d1.getAs[Double]("total_revenue") === 10.0)
    assert(d1.getAs[Double]("min_transaction") === 0.0) // the clamped payment
    assert(d1.isNullAt(d1.fieldIndex("revenue_growth")))
    val d2 = rows(1)
    assert(d2.getAs[Double]("total_revenue") === 60.0 + 4.99)
    assert(math.abs(d2.getAs[Double]("revenue_growth")
      - ((60.0 + 4.99) - 10.0) / 10.0 * 100) < 1e-9)
  }

  test("gold rental_trends groups by (year, month, dow) with null-skipping avg") {
    val rows = SakilaPipeline.rentalTrends(rentals, clock)
      .orderBy("year", "month", "day_of_week").collect()
    assert(rows.length === 2)
    val mon = rows(0) // 2026-01-05 is a Monday → dayofweek 2 (open rental)
    assert(mon.getAs[Int]("day_of_week") === 2)
    assert(mon.getAs[Long]("total_rentals") === 1L)
    assert(mon.isNullAt(mon.fieldIndex("avg_rental_duration")))
    val thu = rows(1) // 2026-01-01 is a Thursday → dayofweek 5
    assert(thu.getAs[Int]("day_of_week") === 5)
    assert(thu.getAs[Long]("total_rentals") === 2L)
    assert(thu.getAs[Long]("unique_customers") === 2L)
    assert(thu.getAs[Double]("avg_rental_duration") === 1.5)
  }
}
