package graft.queries

import graft.core.Lake
import graft.queries.Det._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-parity relational operators (SURVEY.md §2) expressed over the
  * driver testdata tables. Each entry has a DuckDB oracle with identical
  * column names/types and a deterministic total ORDER BY so the driver's
  * hash compare is stable.
  *
  * Determinism policy (SURVEY §7.4 hard part 1):
  *  - money aggregates use exact DECIMAL sums ([[Det]]) — order-independent
  *    and bit-identical across engines; means are exact-sum / count;
  *  - date/timestamp OUTPUTS are formatted as ISO strings in both engines
  *    (sidesteps parquet timestamp unit / tz-annotation mismatches);
  *  - every query ends in a total ORDER BY over a unique key.
  *
  * Scale notes are attached per query: the testdata is small, but each plan
  * is shaped for the 100 TB case (pre-aggregate before joins, broadcast
  * dimensions, partial aggregation, no driver-side collects).
  */
object Relational {

  private def lake(s: SparkSession, dir: String) = Lake(s, dir)

  /** ISO second-resolution timestamp string, identical to DuckDB
    * `strftime(x, '%Y-%m-%d %H:%M:%S')`. */
  private def isoS(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** ISO date string, identical to DuckDB `strftime(x, '%Y-%m-%d')`. */
  private def isoD(c: Column): Column = date_format(c, "yyyy-MM-dd")

  // --------------------------------------------------------------------
  // q01 — hash aggregate, multi-function (A1/A3: count/sum/avg/min/max;
  // silver_to_gold.py:56-68,141-148). Tiny group cardinality → map-side
  // partial agg collapses the shuffle to ~6 rows per partition.
  // --------------------------------------------------------------------
  def q01AggBasic(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("cnt"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        davg(col("l_discount")).as("avg_disc"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q01Oracle =
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price
       FROM lineitem GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  // --------------------------------------------------------------------
  // q02 — customer summary: left join + agg + tier bucketing + coalesce
  // (J1+A1+P4+IFNULL; silver_to_gold.py:41-77). Scale shape: orders is
  // pre-aggregated BY KEY before the join (one shuffle of orders, then a
  // key-aligned join with the customer table) instead of joining raw
  // orders rows into customers and aggregating the join output — at 100 TB
  // that halves shuffle volume and keeps the join build side small.
  // --------------------------------------------------------------------
  def q02CustomerSummary(s: SparkSession, dir: String): DataFrame = {
    val l = lake(s, dir)
    val perCust = l.orders
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders0"),
        dsum(col("o_totalprice")).as("spent0"),
        davg(col("o_totalprice")).as("avg0"),
        max(col("o_orderdate")).as("last0"))
    l.customer
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"),
        coalesce(col("n_orders0"), lit(0L)).as("n_orders"),
        coalesce(col("spent0"), lit(0.0)).as("total_spent"),
        coalesce(col("avg0"), lit(0.0)).as("avg_order"),
        isoD(col("last0")).as("last_order_date"))
      .withColumn("tier",
        when(col("total_spent") > 1500000, "Premium")
          .when(col("total_spent") > 700000, "Gold")
          .when(col("total_spent") > 200000, "Silver")
          .otherwise("Bronze"))
      .orderBy(col("c_custkey"))
  }

  private val q02Oracle =
    """WITH per_cust AS (
         SELECT o_custkey, count(*) AS n_orders0,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent0,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg0,
                max(o_orderdate) AS last0
         FROM orders GROUP BY o_custkey)
       SELECT c_custkey, c_name, c_mktsegment,
              coalesce(n_orders0, 0) AS n_orders,
              coalesce(spent0, 0) AS total_spent,
              coalesce(avg0, 0) AS avg_order,
              strftime(last0, '%Y-%m-%d') AS last_order_date,
              CASE WHEN coalesce(spent0, 0) > 1500000 THEN 'Premium'
                   WHEN coalesce(spent0, 0) > 700000 THEN 'Gold'
                   WHEN coalesce(spent0, 0) > 200000 THEN 'Silver'
                   ELSE 'Bronze' END AS tier
       FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
       ORDER BY c_custkey"""

  // --------------------------------------------------------------------
  // q03 — part performance: left join + countDistinct (J2+A2;
  // silver_to_gold.py:79-106). Same pre-aggregate-then-join shape; the
  // per-part aggregate is ≤|part| rows, so the join strategy is LEFT TO
  // AQE: it broadcasts when the aggregate is actually small and falls
  // back to sort-merge when |part| is large — a hard broadcast() hint
  // here would force a |part|-sized collect onto the driver at scale.
  // --------------------------------------------------------------------
  def q03PartPerformance(s: SparkSession, dir: String): DataFrame = {
    val l = lake(s, dir)
    val perPart = l.lineitem
      .groupBy(col("l_partkey"))
      .agg(
        count(lit(1)).as("n_lines0"),
        dsum(col("l_quantity")).as("qty0"),
        dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev0"),
        countDistinct(col("l_orderkey")).as("ord0"))
    l.part
      .join(perPart, col("p_partkey") === col("l_partkey"), "left")
      .select(
        col("p_partkey"), col("p_name"), col("p_brand"),
        coalesce(col("n_lines0"), lit(0L)).as("n_lines"),
        coalesce(col("qty0"), lit(0.0)).as("sum_qty"),
        coalesce(col("rev0"), lit(0.0)).as("revenue"),
        coalesce(col("ord0"), lit(0L)).as("n_orders"))
      .orderBy(col("p_partkey"))
  }

  private val q03Oracle =
    """WITH per_part AS (
         SELECT l_partkey, count(*) AS n_lines0,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty0,
                CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS rev0,
                count(DISTINCT l_orderkey) AS ord0
         FROM lineitem GROUP BY l_partkey)
       SELECT p_partkey, p_name, p_brand,
              coalesce(n_lines0, 0) AS n_lines,
              coalesce(qty0, 0) AS sum_qty,
              coalesce(rev0, 0) AS revenue,
              coalesce(ord0, 0) AS n_orders
       FROM part LEFT JOIN per_part ON p_partkey = l_partkey
       ORDER BY p_partkey"""

  // --------------------------------------------------------------------
  // q04 — daily revenue (A3; silver_to_gold.py:131-156): date-grouped
  // count/sum/avg/min/max. Group key cardinality = #days → trivially
  // partial-aggregated; at 100 TB this stays one narrow shuffle.
  // --------------------------------------------------------------------
  def q04DailyRevenue(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).orders
      .groupBy(isoD(col("o_orderdate")).as("order_date"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_revenue"),
        davg(col("o_totalprice")).as("avg_order_value"),
        min(col("o_totalprice")).as("min_order_value"),
        max(col("o_totalprice")).as("max_order_value"))
      .orderBy(col("order_date"))

  private val q04Oracle =
    """SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_date,
              count(*) AS n_orders,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_order_value,
              min(o_totalprice) AS min_order_value,
              max(o_totalprice) AS max_order_value
       FROM orders GROUP BY 1 ORDER BY order_date"""

  // --------------------------------------------------------------------
  // q05 — shipping trends by (year, month, weekday) + avg ship delay
  // (A4; silver_to_gold.py:158-182): date-part extraction, join to
  // orders, countDistinct. Spark dayofweek is 1=Sunday; DuckDB dow is
  // 0=Sunday → oracle adds 1.
  // --------------------------------------------------------------------
  def q05ShipTrends(s: SparkSession, dir: String): DataFrame = {
    val l = lake(s, dir)
    l.lineitem
      .join(l.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(
        year(col("l_shipdate")).as("yr"),
        month(col("l_shipdate")).as("mo"),
        dayofweek(col("l_shipdate")).as("dow"))
      .agg(
        count(lit(1)).as("n_lines"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        davgInt(datediff(col("l_shipdate"), col("o_orderdate"))).as("avg_ship_delay"))
      .orderBy(col("yr"), col("mo"), col("dow"))
  }

  private val q05Oracle =
    """SELECT CAST(year(l_shipdate) AS INTEGER) AS yr,
              CAST(month(l_shipdate) AS INTEGER) AS mo,
              CAST(dayofweek(l_shipdate) + 1 AS INTEGER) AS dow,
              count(*) AS n_lines,
              count(DISTINCT l_orderkey) AS n_orders,
              CAST(sum(date_diff('day', CAST(o_orderdate AS DATE),
                                 CAST(l_shipdate AS DATE))) AS DOUBLE)
                / count(*) AS avg_ship_delay
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY 1, 2, 3 ORDER BY yr, mo, dow"""

  // --------------------------------------------------------------------
  // q06 — global ranking window (W1; silver_to_gold.py:122-124):
  // row_number over ORDER BY revenue DESC. Ranking runs over the per-part
  // AGGREGATE (≤|part| rows), not raw lineitem — the unpartitioned window
  // single-partition sort (SURVEY §7.4.5) only ever sees dimension-sized
  // input. Ties broken by p_partkey for determinism.
  // --------------------------------------------------------------------
  def q06WindowRank(s: SparkSession, dir: String): DataFrame = {
    val l = lake(s, dir)
    val rev = l.lineitem
      .groupBy(col("l_partkey"))
      .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    val w = Window.orderBy(col("revenue").desc, col("l_partkey"))
    rev.withColumn("popularity_rank", row_number().over(w))
      .select(col("l_partkey").as("p_partkey"), col("revenue"), col("popularity_rank"))
      .orderBy(col("p_partkey"))
  }

  private val q06Oracle =
    """WITH rev AS (
         SELECT l_partkey AS p_partkey,
                CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM lineitem GROUP BY l_partkey)
       SELECT p_partkey, revenue,
              CAST(row_number() OVER (ORDER BY revenue DESC, p_partkey) AS INTEGER)
                AS popularity_rank
       FROM rev ORDER BY p_partkey"""

  // --------------------------------------------------------------------
  // q07 — lag window + growth pct (W2; silver_to_gold.py:139-156):
  // day-over-day revenue growth. lag runs over the daily AGGREGATE
  // (#days rows), division guarded like the reference's
  // when(datediff>0).otherwise(1) pattern. Growth is an IEEE expression
  // over exact daily totals → bit-identical across engines.
  // --------------------------------------------------------------------
  def q07WindowLag(s: SparkSession, dir: String): DataFrame = {
    val daily = lake(s, dir).orders
      .groupBy(isoD(col("o_orderdate")).as("order_date"))
      .agg(dsum(col("o_totalprice")).as("total_revenue"))
    val w = Window.orderBy(col("order_date"))
    daily
      .withColumn("prev_revenue", lag(col("total_revenue"), 1).over(w))
      .withColumn("revenue_growth",
        when(col("prev_revenue").isNull || col("prev_revenue") === 0, lit(null))
          .otherwise((col("total_revenue") - col("prev_revenue"))
            / col("prev_revenue") * 100))
      .orderBy(col("order_date"))
  }

  private val q07Oracle =
    """WITH daily AS (
         SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_date,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
         FROM orders GROUP BY 1),
       lagd AS (
         SELECT order_date, total_revenue,
                lag(total_revenue, 1) OVER (ORDER BY order_date) AS prev_revenue
         FROM daily)
       SELECT order_date, total_revenue, prev_revenue,
              CASE WHEN prev_revenue IS NULL OR prev_revenue = 0 THEN NULL
                   ELSE (total_revenue - prev_revenue) / prev_revenue * 100
              END AS revenue_growth
       FROM lagd ORDER BY order_date"""

  // --------------------------------------------------------------------
  // q08 — top-k (O2; query_datalake.py:219-229): ORDER BY DESC LIMIT 10.
  // Catalyst plans TakeOrderedAndProject: per-partition heaps + a k-row
  // merge on the driver — no global sort even at 100 TB.
  // --------------------------------------------------------------------
  def q08TopK(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).lineitem
      .groupBy(col("l_partkey"))
      .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_partkey"))
      .limit(10)

  private val q08Oracle =
    """SELECT l_partkey,
              CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM lineitem GROUP BY l_partkey
       ORDER BY revenue DESC, l_partkey LIMIT 10"""

  // --------------------------------------------------------------------
  // q09 — filter predicates: IN-list + comparison (P7; fast_query.py:143,
  // readme.txt:59). Both predicates reach the parquet scan as
  // PushedFilters (verified in PlanChecksSpec).
  // --------------------------------------------------------------------
  def q09FilterIn(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).customer
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY")
        && col("c_acctbal") > 1000)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  private val q09Oracle =
    """SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
       WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
         AND c_acctbal > 1000
       ORDER BY c_custkey"""

  // --------------------------------------------------------------------
  // q10 — scalar string functions (§2.9: trim/upper/lower/concat/
  // substring/length; bronze_to_silver.py:76,88, sakila views).
  // Narrow projection, zero shuffles.
  // --------------------------------------------------------------------
  def q10ScalarString(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).customer
      .select(
        col("c_custkey"),
        upper(trim(col("c_name"))).as("name_upper"),
        lower(col("c_mktsegment")).as("seg_lower"),
        concat(col("c_mktsegment"), lit("#"), col("c_name")).as("tag"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        length(col("c_name")).as("name_len"))
      .orderBy(col("c_custkey"))

  private val q10Oracle =
    """SELECT c_custkey,
              upper(trim(c_name)) AS name_upper,
              lower(c_mktsegment) AS seg_lower,
              concat(c_mktsegment, '#', c_name) AS tag,
              substring(c_name, 1, 8) AS name_prefix,
              CAST(length(c_name) AS INTEGER) AS name_len
       FROM customer ORDER BY c_custkey"""

  // --------------------------------------------------------------------
  // q11 — event-time tumbling hourly aggregation (batch equivalent of the
  // Structured Streaming window; §2.10). date_trunc alignment matches the
  // streaming window(ts, "1 hour") start bounds, so the same oracle
  // validates the streaming path in StreamingSpec.
  // --------------------------------------------------------------------
  def q11HourlyEvents(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).events
      .groupBy(
        isoS(date_trunc("hour", col("ts"))).as("hour_ts"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value")).as("sum_value"))
      .orderBy(col("hour_ts"), col("event_type"))

  private val q11Oracle =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
              event_type, count(*) AS n_events,
              count(DISTINCT user_id) AS n_users,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type"""

  // --------------------------------------------------------------------
  // q12 — exact countDistinct, multiple (A2; silver_to_gold.py:103).
  // Exact distinct = Expand + two-phase agg; the HLL sketch variant for
  // 100 TB lives in the functions package (approx_count_distinct).
  // --------------------------------------------------------------------
  def q12CountDistinct(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_returnflag"))

  private val q12Oracle =
    """SELECT l_returnflag,
              count(DISTINCT l_suppkey) AS n_suppliers,
              count(DISTINCT l_partkey) AS n_parts,
              count(*) AS n_lines
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // --------------------------------------------------------------------
  // q13 — GROUP BY + HAVING (A5; sakila-schema.sql:519-525
  // rewards_report semantics: SUM > x AND COUNT > y).
  // --------------------------------------------------------------------
  def q13Having(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).orders
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spent"))
      .filter(col("n_orders") > 12 && col("total_spent") > 1500000)
      .orderBy(col("o_custkey"))

  private val q13Oracle =
    """SELECT o_custkey, count(*) AS n_orders,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
       FROM orders GROUP BY o_custkey
       HAVING count(*) > 12
          AND CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) > 1500000
       ORDER BY o_custkey"""

  // --------------------------------------------------------------------
  // q14 — ordered string aggregation (A7 GROUP_CONCAT;
  // sakila-schema.sql:365): concat_ws over array_sort(collect_list).
  // collect_list is bounded by group size — here ≤ customers-per-nation.
  // --------------------------------------------------------------------
  def q14GroupConcat(s: SparkSession, dir: String): DataFrame = {
    val l = lake(s, dir)
    l.nation
      .join(l.customer, col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        concat_ws(", ", array_sort(collect_list(col("c_name")))).as("customer_names"))
      .orderBy(col("n_name"))
  }

  private val q14Oracle =
    """SELECT n_name, count(*) AS n_customers,
              string_agg(c_name, ', ' ORDER BY c_name) AS customer_names
       FROM nation JOIN customer ON n_nationkey = c_nationkey
       GROUP BY n_name ORDER BY n_name"""

  // --------------------------------------------------------------------
  // q15 — CASE bucketing + tier rollup (P4+A6; the reference's canonical
  // tier query, query_datalake.py:186-196).
  // --------------------------------------------------------------------
  def q15TierAgg(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).customer
      .withColumn("balance_tier",
        when(col("c_acctbal") >= 7500, "Platinum")
          .when(col("c_acctbal") >= 5000, "Gold")
          .when(col("c_acctbal") >= 2500, "Silver")
          .otherwise("Bronze"))
      .groupBy(col("balance_tier"))
      .agg(
        count(lit(1)).as("n_customers"),
        davg(col("c_acctbal")).as("avg_balance"),
        dsum(col("c_acctbal")).as("total_balance"))
      .orderBy(col("balance_tier"))

  private val q15Oracle =
    """SELECT CASE WHEN c_acctbal >= 7500 THEN 'Platinum'
                   WHEN c_acctbal >= 5000 THEN 'Gold'
                   WHEN c_acctbal >= 2500 THEN 'Silver'
                   ELSE 'Bronze' END AS balance_tier,
              count(*) AS n_customers,
              CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_balance,
              CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
       FROM customer GROUP BY 1 ORDER BY balance_tier"""

  // --------------------------------------------------------------------
  // q16 — UNION ALL cross-layer reconciliation (U1;
  // query_datalake.py:199-214): per-branch counts+sums with literal
  // labels — the reference's only invariant check, kept as an operator.
  // --------------------------------------------------------------------
  def q16UnionAll(s: SparkSession, dir: String): DataFrame = {
    val l = lake(s, dir)
    val a = l.orders.agg(
      count(lit(1)).as("record_count"),
      dsum(col("o_totalprice")).as("total_amount"))
      .select(lit("orders").as("layer"), col("record_count"), col("total_amount"))
    val b = l.lineitem.agg(
      count(lit(1)).as("record_count"),
      dsum(col("l_extendedprice")).as("total_amount"))
      .select(lit("lineitem").as("layer"), col("record_count"), col("total_amount"))
    a.unionByName(b).orderBy(col("layer"))
  }

  private val q16Oracle =
    """SELECT * FROM (
         SELECT 'orders' AS layer, count(*) AS record_count,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amount
         FROM orders
         UNION ALL
         SELECT 'lineitem' AS layer, count(*) AS record_count,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amount
         FROM lineitem)
       ORDER BY layer"""

  // --------------------------------------------------------------------
  // q17 — anti join (NOT EXISTS): customers with no orders. Spark
  // left_anti avoids the naive NOT IN null-trap and broadcast-builds on
  // the aggregated key set.
  // --------------------------------------------------------------------
  def q17AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val l = lake(s, dir)
    l.customer
      .join(l.orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  private val q17Oracle =
    """SELECT c_custkey, c_name FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       ORDER BY c_custkey"""

  // --------------------------------------------------------------------
  // q18 — semi join (EXISTS): customers having at least one big order.
  // The order-side filter pushes to the parquet scan before the join.
  // --------------------------------------------------------------------
  def q18SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val l = lake(s, dir)
    l.customer
      .join(l.orders.filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  private val q18Oracle =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
       ORDER BY c_custkey"""

  // --------------------------------------------------------------------
  // q19 — multi-way inner join snowflake (J3; sakila views): region →
  // nation → customer → orders. region/nation are broadcast explicitly
  // (dimension tables stay broadcast at any fact-table scale).
  // --------------------------------------------------------------------
  def q19MultiJoin(s: SparkSession, dir: String): DataFrame = {
    val l = lake(s, dir)
    broadcast(l.region)
      .join(broadcast(l.nation), col("r_regionkey") === col("n_regionkey"))
      .join(l.customer, col("n_nationkey") === col("c_nationkey"))
      .join(l.orders, col("c_custkey") === col("o_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        countDistinct(col("c_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val q19Oracle =
    """SELECT r_name, n_name, count(DISTINCT c_custkey) AS n_customers,
              count(*) AS n_orders,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       FROM region JOIN nation ON r_regionkey = n_regionkey
       JOIN customer ON n_nationkey = c_nationkey
       JOIN orders ON c_custkey = o_custkey
       GROUP BY r_name, n_name ORDER BY r_name, n_name"""

  // --------------------------------------------------------------------
  // q20 — DISTINCT projection (P6 as set-dedup).
  // --------------------------------------------------------------------
  def q20Distinct(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).customer
      .select(col("c_mktsegment"), col("c_nationkey"))
      .distinct()
      .orderBy(col("c_mktsegment"), col("c_nationkey"))

  private val q20Oracle =
    """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
       ORDER BY c_mktsegment, c_nationkey"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_basic" -> (q01AggBasic _),
    "q02_customer_summary" -> (q02CustomerSummary _),
    "q03_part_performance" -> (q03PartPerformance _),
    "q04_daily_revenue" -> (q04DailyRevenue _),
    "q05_ship_trends" -> (q05ShipTrends _),
    "q06_window_rank" -> (q06WindowRank _),
    "q07_window_lag" -> (q07WindowLag _),
    "q08_topk" -> (q08TopK _),
    "q09_filter_in" -> (q09FilterIn _),
    "q10_scalar_string" -> (q10ScalarString _),
    "q11_hourly_events" -> (q11HourlyEvents _),
    "q12_count_distinct" -> (q12CountDistinct _),
    "q13_having" -> (q13Having _),
    "q14_group_concat" -> (q14GroupConcat _),
    "q15_tier_agg" -> (q15TierAgg _),
    "q16_union_all" -> (q16UnionAll _),
    "q17_anti_join" -> (q17AntiJoin _),
    "q18_semi_join" -> (q18SemiJoin _),
    "q19_multi_join" -> (q19MultiJoin _),
    "q20_distinct" -> (q20Distinct _))

  val oracle: Map[String, String] = Map(
    "q01_agg_basic" -> q01Oracle,
    "q02_customer_summary" -> q02Oracle,
    "q03_part_performance" -> q03Oracle,
    "q04_daily_revenue" -> q04Oracle,
    "q05_ship_trends" -> q05Oracle,
    "q06_window_rank" -> q06Oracle,
    "q07_window_lag" -> q07Oracle,
    "q08_topk" -> q08Oracle,
    "q09_filter_in" -> q09Oracle,
    "q10_scalar_string" -> q10Oracle,
    "q11_hourly_events" -> q11Oracle,
    "q12_count_distinct" -> q12Oracle,
    "q13_having" -> q13Oracle,
    "q14_group_concat" -> q14Oracle,
    "q15_tier_agg" -> q15Oracle,
    "q16_union_all" -> q16Oracle,
    "q17_anti_join" -> q17Oracle,
    "q18_semi_join" -> q18Oracle,
    "q19_multi_join" -> q19Oracle,
    "q20_distinct" -> q20Oracle)
}
