package graft.sakila

import org.apache.spark.sql.types._

/** Explicit bronze-arrival schemas for all 15 Sakila tables the reference
  * ingests (topic list kafka_to_bronze.py:115-121; DDL
  * sakila-schema.sql:44-345).
  *
  * These are the types as they ARRIVE in the CDC envelope's `data` field,
  * not the MySQL DDL types verbatim: the reference's extractor serializes
  * rows with `json.dumps(default=str)` (mysql_to_kafka.py:27), so
  * temporal and DECIMAL values land as strings — the silver cleaners own
  * the casts (`SakilaPipeline.cleanFilm` string→double etc.), exactly as
  * the reference splits the work. Integer-ish DDL types (including
  * BOOLEAN = TINYINT(1) and YEAR) arrive as JSON numbers → IntegerType;
  * BLOB arrives stringified → StringType.
  *
  * An explicit registry (vs schema inference) is the 100 TB posture:
  * inference re-scans data, drifts run-to-run, and silently widens types;
  * a fixed StructType per table makes bronze parsing deterministic and
  * schema drift an explicit, reviewable change.
  */
object SakilaSchema {

  private def s(name: String) = StructField(name, StringType)
  private def i(name: String) = StructField(name, IntegerType)

  /** sakila-schema.sql:44-55 */
  val actor: StructType = StructType(Seq(
    i("actor_id"), s("first_name"), s("last_name"), s("last_update")))

  /** sakila-schema.sql:57-77 (GEOMETRY column is version-gated out in the
    * reference dump and never reaches the topics) */
  val address: StructType = StructType(Seq(
    i("address_id"), s("address"), s("address2"), s("district"),
    i("city_id"), s("postal_code"), s("phone"), s("last_update")))

  /** sakila-schema.sql:79-88 */
  val category: StructType = StructType(Seq(
    i("category_id"), s("name"), s("last_update")))

  /** sakila-schema.sql:90-102 */
  val city: StructType = StructType(Seq(
    i("city_id"), s("city"), i("country_id"), s("last_update")))

  /** sakila-schema.sql:104-113 */
  val country: StructType = StructType(Seq(
    i("country_id"), s("country"), s("last_update")))

  /** sakila-schema.sql:115-135 */
  val customer: StructType = StructType(Seq(
    i("customer_id"), i("store_id"), s("first_name"), s("last_name"),
    s("email"), i("address_id"), i("active"), s("create_date"),
    s("last_update")))

  /** sakila-schema.sql:137-161 (DECIMALs arrive as strings; ENUM/SET as
    * strings) */
  val film: StructType = StructType(Seq(
    i("film_id"), s("title"), s("description"), i("release_year"),
    i("language_id"), i("original_language_id"), i("rental_duration"),
    s("rental_rate"), i("length"), s("replacement_cost"), s("rating"),
    s("special_features"), s("last_update")))

  /** sakila-schema.sql:163-175 */
  val filmActor: StructType = StructType(Seq(
    i("actor_id"), i("film_id"), s("last_update")))

  /** sakila-schema.sql:177-189 */
  val filmCategory: StructType = StructType(Seq(
    i("film_id"), i("category_id"), s("last_update")))

  /** sakila-schema.sql:242-256 */
  val inventory: StructType = StructType(Seq(
    i("inventory_id"), i("film_id"), i("store_id"), s("last_update")))

  /** sakila-schema.sql:258-267 */
  val language: StructType = StructType(Seq(
    i("language_id"), s("name"), s("last_update")))

  /** sakila-schema.sql:269-288 */
  val payment: StructType = StructType(Seq(
    i("payment_id"), i("customer_id"), i("staff_id"), i("rental_id"),
    s("amount"), s("payment_date"), s("last_update")))

  /** sakila-schema.sql:290-310 */
  val rental: StructType = StructType(Seq(
    i("rental_id"), s("rental_date"), i("inventory_id"), i("customer_id"),
    s("return_date"), i("staff_id"), s("last_update")))

  /** sakila-schema.sql:312-333 (BLOB picture arrives stringified) */
  val staff: StructType = StructType(Seq(
    i("staff_id"), s("first_name"), s("last_name"), i("address_id"),
    s("picture"), s("email"), i("store_id"), i("active"), s("username"),
    s("password"), s("last_update")))

  /** sakila-schema.sql:335-345 */
  val store: StructType = StructType(Seq(
    i("store_id"), i("manager_staff_id"), i("address_id"), s("last_update")))

  /** Every ingested table, in the reference's topic order
    * (kafka_to_bronze.py:115-121). */
  val tables: Map[String, StructType] = Map(
    "actor" -> actor, "address" -> address, "category" -> category,
    "city" -> city, "country" -> country, "customer" -> customer,
    "film" -> film, "film_actor" -> filmActor,
    "film_category" -> filmCategory, "inventory" -> inventory,
    "language" -> language, "payment" -> payment, "rental" -> rental,
    "staff" -> staff, "store" -> store)

  /** Primary key columns per table — the dedup/merge identity of a row.
    * The junction tables have COMPOSITE keys: `film_actor` is unique on
    * (actor_id, film_id) and `film_category` on (film_id, category_id);
    * keying either by a single column would collapse distinct rows in a
    * dedup or CDC merge. (The reference's Kafka producer keys those
    * topics by `record.get(f'{table}_id', record_count)` — a counter
    * FALLBACK, since no `film_actor_id` exists, mysql_to_kafka.py:57-87 —
    * so partition affinity there is arbitrary; the registry records the
    * true relational key instead.) */
  val primaryKeys: Map[String, Seq[String]] = Map(
    "actor" -> Seq("actor_id"), "address" -> Seq("address_id"),
    "category" -> Seq("category_id"), "city" -> Seq("city_id"),
    "country" -> Seq("country_id"), "customer" -> Seq("customer_id"),
    "film" -> Seq("film_id"), "film_actor" -> Seq("actor_id", "film_id"),
    "film_category" -> Seq("film_id", "category_id"),
    "inventory" -> Seq("inventory_id"), "language" -> Seq("language_id"),
    "payment" -> Seq("payment_id"), "rental" -> Seq("rental_id"),
    "staff" -> Seq("staff_id"), "store" -> Seq("store_id"))
}
