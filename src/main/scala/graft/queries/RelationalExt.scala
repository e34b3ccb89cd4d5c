package graft.queries

import graft.core.Lake
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second batch of relational operators: deterministic dedup, JSON
  * envelope round-trip (the bronze-layer format, mysql_to_kafka.py:68-73),
  * window frames, rollup, set ops, pivot, scalar subqueries, SQL-surface
  * queries (C4 `spark.sql`), explode/array ops. Same determinism policy as
  * [[Relational]].
  */
object RelationalExt {

  private def lake(s: SparkSession, dir: String) = Lake(s, dir)
  private def isoUs(c: Column): Column =
    date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  // --------------------------------------------------------------------
  // q21 — deterministic dedup-keep-first (P6; bronze_to_silver.py:80,95):
  // the reference's dropDuplicates keeps an arbitrary row; the
  // deterministic form (window rank over an ordering key) is what a CDC
  // silver layer needs anyway ("latest/earliest record per key"). One
  // shuffle on the dedup key; no global ordering required.
  // --------------------------------------------------------------------
  def q21DedupFirst(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    lake(s, dir).events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        isoUs(col("ts")).as("first_ts"))
      .orderBy(col("user_id"), col("event_type"))
  }

  private val q21Oracle =
    """SELECT user_id, event_type, event_id,
              strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS first_ts
       FROM (SELECT *, row_number() OVER
               (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
             FROM events)
       WHERE rn = 1 ORDER BY user_id, event_type"""

  // --------------------------------------------------------------------
  // q22 — CDC envelope round-trip (S4+P1+K1; mysql_to_kafka.py:68-73 →
  // bronze_to_silver.py:75): to_json(struct(...)) builds the bronze
  // envelope, from_json + select("data.*") flattens it back. Doubles
  // survive exactly (Jackson shortest-round-trip repr). Oracle = identity
  // projection of the source columns.
  // --------------------------------------------------------------------
  def q22EnvelopeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val envelope = lake(s, dir).orders.select(
      to_json(struct(
        lit("orders").as("table"),
        lit("INSERT").as("operation"),
        struct(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice")).as("data"))).as("value"))
    val schema = StructType(Seq(
      StructField("table", StringType),
      StructField("operation", StringType),
      StructField("data", StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType))))))
    envelope
      .select(from_json(col("value"), schema).as("env"))
      .select(col("env.data.*"))
      .orderBy(col("o_orderkey"))
  }

  private val q22Oracle =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
       FROM orders ORDER BY o_orderkey"""

  // --------------------------------------------------------------------
  // q23 — JSON field extraction (§2.9 json family): get_json_object over
  // the events.props payload.
  // --------------------------------------------------------------------
  def q23JsonExtract(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).events
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("prop_k"))
      .orderBy(col("event_id"))

  private val q23Oracle =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
       FROM events ORDER BY event_id"""

  // --------------------------------------------------------------------
  // q24 — running total over an explicit window frame (rowsBetween).
  // Summed as DECIMAL so the prefix sums are exact (no FP order issues),
  // then cast back to double for the output schema.
  // --------------------------------------------------------------------
  def q24RunningTotal(s: SparkSession, dir: String): DataFrame = {
    val daily = lake(s, dir).orders
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev_dec"))
    val w = Window.orderBy(col("order_date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("running_revenue",
        sum(col("rev_dec")).over(w).cast(DoubleType))
      .select(col("order_date"), col("rev_dec").cast(DoubleType).as("daily_revenue"),
        col("running_revenue"))
      .orderBy(col("order_date"))
  }

  private val q24Oracle =
    """WITH daily AS (
         SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_date,
                sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
         FROM orders GROUP BY 1)
       SELECT order_date, CAST(rev_dec AS DOUBLE) AS daily_revenue,
              CAST(sum(rev_dec) OVER (ORDER BY order_date
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE) AS running_revenue
       FROM daily ORDER BY order_date"""

  // --------------------------------------------------------------------
  // q25 — explode + array ops: token explode over p_name words.
  // --------------------------------------------------------------------
  def q25Explode(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).part
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("word"))

  private val q25Oracle =
    """SELECT word, count(*) AS n
       FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
       GROUP BY word ORDER BY word"""

  // --------------------------------------------------------------------
  // q26 — pivot / conditional aggregation: revenue by order status ×
  // priority. Implemented with when()-guarded sums (the codegen-friendly
  // form pivot lowers to).
  // --------------------------------------------------------------------
  def q26Pivot(s: SparkSession, dir: String): DataFrame = {
    def bucket(p: String): Column =
      coalesce(
        sum(when(col("o_orderpriority") === p, col("o_totalprice"))
          .cast(DecimalType(18, 2))).cast(DoubleType),
        lit(0.0))
    lake(s, dir).orders
      .groupBy(col("o_orderstatus"))
      .agg(
        bucket("1-URGENT").as("urgent_rev"),
        bucket("2-HIGH").as("high_rev"),
        bucket("3-MEDIUM").as("medium_rev"),
        bucket("4-NOT SPECIFIED").as("notspec_rev"),
        bucket("5-LOW").as("low_rev"))
      .orderBy(col("o_orderstatus"))
  }

  private val q26Oracle =
    """SELECT o_orderstatus,
         coalesce(CAST(sum(CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END AS DECIMAL(18,2))) AS DOUBLE), 0) AS urgent_rev,
         coalesce(CAST(sum(CAST(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END AS DECIMAL(18,2))) AS DOUBLE), 0) AS high_rev,
         coalesce(CAST(sum(CAST(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END AS DECIMAL(18,2))) AS DOUBLE), 0) AS medium_rev,
         coalesce(CAST(sum(CAST(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END AS DECIMAL(18,2))) AS DOUBLE), 0) AS notspec_rev,
         coalesce(CAST(sum(CAST(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END AS DECIMAL(18,2))) AS DOUBLE), 0) AS low_rev
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  // --------------------------------------------------------------------
  // q27 — ROLLUP grouping sets (engine capability beyond the reference's
  // flat GROUP BYs). NULL rollup slots labelled 'ALL' in both engines.
  // --------------------------------------------------------------------
  def q27Rollup(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), Det.dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("cnt"), col("sum_qty"))
      .orderBy(col("rf"), col("ls"))

  private val q27Oracle =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
              coalesce(l_linestatus, 'ALL') AS ls,
              count(*) AS cnt,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       ORDER BY rf, ls"""

  // --------------------------------------------------------------------
  // q28 — INTERSECT (set op; Catalyst-supplied, §2.8): nations having
  // both customers and suppliers.
  // --------------------------------------------------------------------
  def q28Intersect(s: SparkSession, dir: String): DataFrame = {
    val l = lake(s, dir)
    l.customer.select(col("c_nationkey").as("nationkey"))
      .intersect(l.supplier.select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))
  }

  private val q28Oracle =
    """SELECT c_nationkey AS nationkey FROM customer
       INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey"""

  // --------------------------------------------------------------------
  // q29 — scalar subquery via the SQL surface (C4 spark.sql +
  // query_datalake.py:139-146): orders above the mean price. Exercises
  // the temp-view catalog (C1) + Catalyst scalar-subquery planning.
  // --------------------------------------------------------------------
  def q29ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    lake(s, dir).registerViews()
    // The subquery mean uses the exact-DECIMAL policy ([[Det]]): a plain
    // double avg() is accumulation-order-dependent and rows at the
    // threshold boundary could differ between engines.
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_totalprice > 1.5 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM orders)
         ORDER BY o_orderkey""")
  }

  private val q29Oracle =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       WHERE o_totalprice > 1.5 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM orders)
       ORDER BY o_orderkey"""

  // --------------------------------------------------------------------
  // q30 — cross join (small × small only — a guarded capability; Catalyst
  // would reject an unhinted large cartesian).
  // --------------------------------------------------------------------
  def q30CrossJoin(s: SparkSession, dir: String): DataFrame = {
    val l = lake(s, dir)
    l.region.select(col("r_name"))
      .crossJoin(l.customer.select(col("c_mktsegment").as("segment")).distinct())
      .orderBy(col("r_name"), col("segment"))
  }

  private val q30Oracle =
    """SELECT r_name, segment FROM region
       CROSS JOIN (SELECT DISTINCT c_mktsegment AS segment FROM customer)
       ORDER BY r_name, segment"""

  // --------------------------------------------------------------------
  // q80 — time-RANGE window frame: per-customer trailing-30-day order
  // revenue. A RANGE frame over integer epoch days (value-based peers,
  // not row counts — three same-day orders all see each other, which a
  // ROWS frame gets wrong) — the window semantics q24's running total
  // and q48's rank suite don't cover. Exact-decimal window sums cast to
  // double (the Det money policy — window sums of DECIMAL are
  // order-independent). One customer-keyed exchange.
  // --------------------------------------------------------------------
  def q80TimeRangeWindow(s: SparkSession, dir: String): DataFrame = {
    val day = datediff(col("o_orderdate"), to_date(lit("1970-01-01")))
    val w = Window.partitionBy(col("o_custkey")).orderBy(day.cast(LongType))
      .rangeBetween(-29, 0)
    lake(s, dir).orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("trailing30_revenue",
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast(DoubleType))
      .withColumn("trailing30_orders", count(lit(1)).over(w))
      .select(col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_orderkey"), col("trailing30_revenue"), col("trailing30_orders"))
      .orderBy(col("o_custkey"), col("order_date"), col("o_orderkey"))
  }

  private val q80Oracle =
    """SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
              o_orderkey,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER w AS DOUBLE) AS trailing30_revenue,
              count(*) OVER w AS trailing30_orders
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey
                    ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
                    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
       ORDER BY o_custkey, order_date, o_orderkey"""

  // --------------------------------------------------------------------
  // q81 — FULL OUTER reconciliation: every customer x order-activity
  // summary, keeping rows present on either side with presence flags
  // (the audit query: "who exists but never ordered; which orders
  // reference a missing customer"). The one join type the inventory
  // lacked an oracled query for.
  // --------------------------------------------------------------------
  def q81FullOuter(s: SparkSession, dir: String): DataFrame = {
    val custs = lake(s, dir).customer
      .select(col("c_custkey"), col("c_mktsegment"))
    val activity = lake(s, dir).orders
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        graft.queries.Det.dsum(col("o_totalprice")).as("revenue"))
    custs.join(activity, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        when(col("c_custkey").isNotNull, 1).otherwise(0).as("in_customers"),
        when(col("o_custkey").isNotNull, 1).otherwise(0).as("has_orders"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"))
      .orderBy(col("custkey"))
  }

  private val q81Oracle =
    """WITH activity AS (
         SELECT o_custkey, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders GROUP BY o_custkey)
       SELECT coalesce(c_custkey, o_custkey) AS custkey,
              CAST(CASE WHEN c_custkey IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS in_customers,
              CAST(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS has_orders,
              coalesce(n_orders, 0) AS n_orders,
              coalesce(revenue, 0.0) AS revenue
       FROM customer FULL OUTER JOIN activity ON c_custkey = o_custkey
       ORDER BY custkey"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_time_range_window" -> (q80TimeRangeWindow _),
    "q81_full_outer" -> (q81FullOuter _),
    "q21_dedup_first" -> (q21DedupFirst _),
    "q22_envelope_roundtrip" -> (q22EnvelopeRoundtrip _),
    "q23_json_extract" -> (q23JsonExtract _),
    "q24_running_total" -> (q24RunningTotal _),
    "q25_explode" -> (q25Explode _),
    "q26_pivot" -> (q26Pivot _),
    "q27_rollup" -> (q27Rollup _),
    "q28_intersect" -> (q28Intersect _),
    "q29_scalar_subquery" -> (q29ScalarSubquery _),
    "q30_cross_join" -> (q30CrossJoin _))

  val oracle: Map[String, String] = Map(
    "q80_time_range_window" -> q80Oracle,
    "q81_full_outer" -> q81Oracle,
    "q21_dedup_first" -> q21Oracle,
    "q22_envelope_roundtrip" -> q22Oracle,
    "q23_json_extract" -> q23Oracle,
    "q24_running_total" -> q24Oracle,
    "q25_explode" -> q25Oracle,
    "q26_pivot" -> q26Oracle,
    "q27_rollup" -> q27Oracle,
    "q28_intersect" -> q28Oracle,
    "q29_scalar_subquery" -> q29Oracle,
    "q30_cross_join" -> q30Oracle)
}
