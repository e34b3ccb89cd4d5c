package graft.queries

import graft.core.Lake
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third batch: medians, exact-accumulator statistics, the full ranking
  * window family, and date/string/null scalar suites. Same determinism
  * policy as [[Relational]] (see SURVEY §8.3).
  */
object RelationalMore {

  private def lake(s: SparkSession, dir: String) = Lake(s, dir)

  // --------------------------------------------------------------------
  // q46 — median over an integer column. f = 0.5 interpolation on ints is
  // exact under every formula ((a+b)/2 ≡ a+(b-a)·0.5 in IEEE for int
  // values), so Spark median() and DuckDB quantile_cont(0.5) agree
  // bit-for-bit. Fractional quantiles of doubles are NOT in the inventory
  // because the interpolation expression tree differs between engines.
  // --------------------------------------------------------------------
  def q46Median(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        median(col("l_quantity").cast(IntegerType)).as("median_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q46Oracle =
    """SELECT l_returnflag, l_linestatus,
              quantile_cont(CAST(l_quantity AS INTEGER), 0.5) AS median_qty,
              count(*) AS n
       FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus"""

  // --------------------------------------------------------------------
  // q47 — variance/stddev via EXACT decimal accumulators: built-in
  // stddev is accumulation-order-dependent (Welford over doubles), so
  // the deterministic form computes n, Σx, Σx² exactly in DECIMAL and
  // derives var = (n·Σx² − (Σx)²)/(n·(n−1)) in double — identical
  // operand order in both engines. This is also the scale-correct shape:
  // three commutative partial aggregates, one shuffle.
  // --------------------------------------------------------------------
  def q47ExactStats(s: SparkSession, dir: String): DataFrame = {
    // Accumulate in integer CENTS at decimal scale 0: a scale-carrying
    // DECIMAL(38,4) → DOUBLE cast is engine-dependent in the last ulp
    // (DuckDB converts the int128 then multiplies by 10^-scale — two
    // roundings; Spark rounds once), and the variance's near-equal
    // subtraction amplifies that ulp ~4× (observed at sf0.1). A scale-0
    // decimal → double is a single correctly-rounded integer conversion
    // in every engine; the /100 and /10^4 rescales are then identical
    // double ops on identical operands.
    val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
      .cast(DecimalType(18, 0))
    lake(s, dir).orders
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(cents).cast(DoubleType).as("sum_c"),
        sum(cents * cents).cast(DoubleType).as("sum_c2"))
      .select(
        col("o_orderstatus"), col("n"),
        (col("sum_c") / lit(100.0)).as("sum_x"),
        // n > 1 guard: a singleton group's sample variance is undefined —
        // unguarded 0/0 gives NaN in Spark but NULL in some DuckDB
        // configurations; NULL in both engines is the well-defined answer
        when(col("n") > 1,
          ((col("n") * col("sum_c2") - col("sum_c") * col("sum_c"))
            / (col("n") * (col("n") - 1))) / lit(10000.0)).as("var_samp"))
      // stddev = sqrt of the MATERIALIZED var column, never a re-derived
      // copy of the variance expression (FMA contraction could differ)
      .withColumn("stddev_samp", sqrt(col("var_samp")))
      .orderBy(col("o_orderstatus"))
  }

  private val q47Oracle =
    """WITH c AS (
         SELECT o_orderstatus,
                CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS DECIMAL(18,0)) AS cents
         FROM orders),
       acc AS (
         SELECT o_orderstatus, count(*) AS n,
                CAST(sum(cents) AS DOUBLE) AS sum_c,
                CAST(sum(cents * cents) AS DOUBLE) AS sum_c2
         FROM c GROUP BY 1),
       v AS (
         SELECT o_orderstatus, n, sum_c / 100.0 AS sum_x,
                CASE WHEN n > 1 THEN
                  ((n * sum_c2 - sum_c * sum_c) / (n * (n - 1))) / 10000.0
                END AS var_samp
         FROM acc)
       SELECT o_orderstatus, n, sum_x, var_samp, sqrt(var_samp) AS stddev_samp
       FROM v ORDER BY o_orderstatus"""

  // --------------------------------------------------------------------
  // q48 — ranking window family: rank, dense_rank, ntile, first/last
  // value over a per-segment window (partitioned → parallel at scale).
  // Total ordering inside the window (acctbal DESC, custkey) removes
  // ties' nondeterminism.
  // --------------------------------------------------------------------
  def q48WindowSuite(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    lake(s, dir).customer
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("top_bal", first(col("c_acctbal")).over(wf))
      .withColumn("bottom_bal", last(col("c_acctbal")).over(wf))
      .filter(col("rnk") <= 10)
      .orderBy(col("c_mktsegment"), col("rnk"))
  }

  private val q48Oracle =
    """SELECT * FROM (
         SELECT c_custkey, c_mktsegment, c_acctbal,
                CAST(rank() OVER w AS INTEGER) AS rnk,
                CAST(dense_rank() OVER w AS INTEGER) AS drnk,
                CAST(ntile(4) OVER w AS INTEGER) AS quartile,
                first_value(c_acctbal) OVER wf AS top_bal,
                last_value(c_acctbal) OVER wf AS bottom_bal
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey),
                wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
       WHERE rnk <= 10 ORDER BY c_mktsegment, rnk"""

  // --------------------------------------------------------------------
  // q49 — date arithmetic suite: add days/months, last_day, quarter,
  // day-of-year, all formatted ISO for engine-neutral output.
  // --------------------------------------------------------------------
  def q49DateFns(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).orders
      .filter(col("o_orderkey") <= 2000)
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30d"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3mo"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        quarter(col("o_orderdate")).as("qtr"),
        dayofyear(col("o_orderdate")).as("doy"))
      .orderBy(col("o_orderkey"))

  private val q49Oracle =
    """SELECT o_orderkey,
              strftime(o_orderdate, '%Y-%m-%d') AS d,
              strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30d,
              strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo,
              strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
              CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
              CAST(dayofyear(o_orderdate) AS INTEGER) AS doy
       FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey"""

  // --------------------------------------------------------------------
  // q50 — extended string suite: regexp extract/replace, pad, translate,
  // reverse, position. Narrow, zero-shuffle, codegen-friendly.
  // --------------------------------------------------------------------
  def q50StringFns(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).part
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        lpad(col("p_brand"), 12, "#").as("brand_pad"),
        translate(col("p_type"), "AEIOU", "aeiou").as("type_tr"),
        reverse(col("p_brand")).as("brand_rev"),
        instr(col("p_name"), "a").as("first_a"))
      .orderBy(col("p_partkey"))

  private val q50Oracle =
    """SELECT p_partkey,
              regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
              regexp_replace(p_name, ' ', '_', 'g') AS snake,
              lpad(p_brand, 12, '#') AS brand_pad,
              translate(p_type, 'AEIOU', 'aeiou') AS type_tr,
              reverse(p_brand) AS brand_rev,
              CAST(strpos(p_name, 'a') AS INTEGER) AS first_a
       FROM part ORDER BY p_partkey"""

  // --------------------------------------------------------------------
  // q52 — as-of join (graft.operators.AsOfJoin): each purchase event
  // matched to the user's most recent prior-or-simultaneous click.
  // Merge-style composition (union + keyed window) — one shuffle, never
  // the quadratic range join. The oracle mirrors the same construction
  // (DuckDB's native ASOF JOIN picks arbitrarily among timestamp ties, so
  // the deterministic window form is the comparison standard).
  // --------------------------------------------------------------------
  def q52AsofJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AsOfJoin
    val ev = lake(s, dir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    AsOfJoin.asofJoin(purchases, clicks, "user_id", "ts", "ts",
      payload = Seq("event_id", "ts"))
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
        col("asof_event_id").as("prior_click_id"),
        date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("prior_click_ts"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("asof_ts"))).as("gap_s"))
      .orderBy(col("event_id"))
  }

  private val q52Oracle =
    """WITH tagged AS (
         SELECT user_id, ts AS t, 0 AS tag,
                {'event_id': event_id, 'ts': ts} AS p,
                CAST(NULL AS BIGINT) AS event_id
         FROM events WHERE event_type = 'click'
         UNION ALL
         SELECT user_id, ts AS t, 1 AS tag,
                CAST(NULL AS STRUCT(event_id BIGINT, ts TIMESTAMP)) AS p,
                event_id
         FROM events WHERE event_type = 'purchase'),
       filled AS (
         SELECT *, last_value(p IGNORE NULLS) OVER
                  (PARTITION BY user_id ORDER BY t, tag, p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
         FROM tagged)
       SELECT event_id, user_id,
              strftime(t, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
              m.event_id AS prior_click_id,
              strftime(m.ts, '%Y-%m-%d %H:%M:%S.%f') AS prior_click_ts,
              date_diff('second', m.ts, t) AS gap_s
       FROM filled WHERE tag = 1 ORDER BY event_id"""

  // --------------------------------------------------------------------
  // q53 — range (interval) join via time-bucket banding: error events
  // joined to same-user click events within ±2 h. A naive range
  // theta-join is a nested loop over every same-user pair; banding the
  // time axis into bucket = ⌊t/7200⌋ and exploding the probe side into
  // {b−1, b, b+1} turns it into ONE equi-join on (user, bucket) whose
  // per-bucket pair count is bounded — the standard interval-join shape
  // at scale. The residual |Δt| ≤ 7200 filter restores exact semantics,
  // so the oracle is the plain range join.
  // --------------------------------------------------------------------
  def q53RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = lake(s, dir).events
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"),
        col("ts").as("err_ts"),
        explode(array(
          (unix_timestamp(col("ts")) / 7200 - 1).cast(LongType),
          (unix_timestamp(col("ts")) / 7200).cast(LongType),
          (unix_timestamp(col("ts")) / 7200 + 1).cast(LongType))).as("bucket"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"),
        (unix_timestamp(col("ts")) / 7200).cast(LongType).as("c_bucket"))
    errors
      .join(clicks, col("user_id") === col("c_user") && col("bucket") === col("c_bucket"))
      .withColumn("gap_s",
        unix_timestamp(col("click_ts")) - unix_timestamp(col("err_ts")))
      .filter(abs(col("gap_s")) <= 7200)
      .select(col("err_id"), col("user_id"), col("click_id"), col("gap_s"))
      .orderBy(col("err_id"), col("click_id"))
  }

  private val q53Oracle =
    """SELECT e.event_id AS err_id, e.user_id, c.event_id AS click_id,
              date_diff('second', e.ts, c.ts) AS gap_s
       FROM events e JOIN events c
         ON e.user_id = c.user_id
        AND e.event_type = 'error' AND c.event_type = 'click'
        AND abs(date_diff('second', e.ts, c.ts)) <= 7200
       ORDER BY err_id, click_id"""

  // --------------------------------------------------------------------
  // q57 — CUBE grouping sets (all 2^n slices; q27 covers ROLLUP). NULL
  // slots labelled 'ALL' in both engines.
  // --------------------------------------------------------------------
  def q57Cube(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), Det.dsum(col("o_totalprice")).as("revenue"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("cnt"), col("revenue"))
      .orderBy(col("status"), col("priority"))

  private val q57Oracle =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
              coalesce(o_orderpriority, 'ALL') AS priority,
              count(*) AS cnt,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
       ORDER BY status, priority"""

  // --------------------------------------------------------------------
  // q58 — array function suite: per-group ordered collect, contains/
  // position/max over the array, stringified outputs (array-valued
  // columns render differently in the two engines' pandas bridges, so
  // the comparison surface is scalar).
  // --------------------------------------------------------------------
  def q58ArrayFns(s: SparkSession, dir: String): DataFrame = {
    val l = lake(s, dir)
    l.nation
      .join(l.supplier, col("n_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(array_sort(collect_list(col("s_suppkey"))).as("supp_keys"))
      .select(
        col("n_name"),
        size(col("supp_keys")).as("n_suppliers"),
        concat_ws(",", transform(col("supp_keys"), _.cast(StringType))).as("keys_csv"),
        array_contains(col("supp_keys"), 1L).as("has_supp1"),
        array_position(col("supp_keys"), element_at(col("supp_keys"), -1)).as("last_pos"),
        array_max(col("supp_keys")).as("max_key"),
        array_min(col("supp_keys")).as("min_key"),
        element_at(col("supp_keys"), 1).as("first_key"))
      .orderBy(col("n_name"))
  }

  private val q58Oracle =
    """WITH g AS (
         SELECT n_name, list_sort(list(s_suppkey)) AS supp_keys
         FROM nation JOIN supplier ON n_nationkey = s_nationkey
         GROUP BY n_name)
       SELECT n_name,
              CAST(len(supp_keys) AS INTEGER) AS n_suppliers,
              array_to_string(supp_keys, ',') AS keys_csv,
              list_contains(supp_keys, 1) AS has_supp1,
              CAST(list_position(supp_keys, supp_keys[-1]) AS BIGINT) AS last_pos,
              list_max(supp_keys) AS max_key,
              list_min(supp_keys) AS min_key,
              supp_keys[1] AS first_key
       FROM g ORDER BY n_name"""

  // --------------------------------------------------------------------
  // q60 — EXCEPT (set difference; completes the set-op family with q16
  // UNION ALL and q28 INTERSECT): nations with customers but no suppliers.
  // --------------------------------------------------------------------
  def q60Except(s: SparkSession, dir: String): DataFrame = {
    val l = lake(s, dir)
    // supplier side restricted to the first 20 keys so the difference is
    // non-trivial at every scale factor
    l.customer.select(col("c_nationkey").as("nationkey"))
      .except(l.supplier.filter(col("s_suppkey") <= 20)
        .select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))
  }

  private val q60Oracle =
    """SELECT c_nationkey AS nationkey FROM customer
       EXCEPT SELECT s_nationkey FROM supplier WHERE s_suppkey <= 20
       ORDER BY nationkey"""

  // --------------------------------------------------------------------
  // q61 — CORRELATED scalar subquery (J5, the actor_info pattern;
  // Catalyst decorrelates it into a left outer aggregate join — verify
  // with explain that no per-row re-execution survives).
  // --------------------------------------------------------------------
  def q61CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    lake(s, dir).registerViews()
    s.sql(
      """SELECT c_custkey, c_mktsegment,
                (SELECT CAST(max(o_totalprice) AS DOUBLE) FROM orders
                 WHERE o_custkey = c_custkey) AS max_order
         FROM customer
         WHERE c_custkey <= 500
         ORDER BY c_custkey""")
  }

  private val q61Oracle =
    """SELECT c_custkey, c_mktsegment,
              (SELECT CAST(max(o_totalprice) AS DOUBLE) FROM orders
               WHERE o_custkey = c_custkey) AS max_order
       FROM customer
       WHERE c_custkey <= 500
       ORDER BY c_custkey"""

  // --------------------------------------------------------------------
  // q62 — null-handling scalar family: coalesce/nullif/nvl2-equivalent/
  // greatest-least with null propagation, over the left join's null side.
  // --------------------------------------------------------------------
  def q62NullFns(s: SparkSession, dir: String): DataFrame = {
    val l = lake(s, dir)
    val perCust = l.orders.groupBy(col("o_custkey"))
      .agg(Det.dsum(col("o_totalprice")).as("spent"))
    l.customer
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(
        col("c_custkey"),
        coalesce(col("spent"), lit(0.0)).as("spent_or_zero"),
        nullif(col("c_acctbal"), lit(0.0)).as("bal_nullif_zero"),
        when(col("spent").isNull, "never").otherwise("buyer").as("status"),
        greatest(col("spent"), col("c_acctbal")).as("max_metric"),
        least(coalesce(col("spent"), lit(0.0)), col("c_acctbal")).as("min_metric"),
        isnull(col("spent")).as("no_orders"))
      .orderBy(col("c_custkey"))
  }

  private val q62Oracle =
    """WITH per_cust AS (
         SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent
         FROM orders GROUP BY 1)
       SELECT c_custkey,
              coalesce(spent, 0.0) AS spent_or_zero,
              nullif(c_acctbal, 0.0) AS bal_nullif_zero,
              CASE WHEN spent IS NULL THEN 'never' ELSE 'buyer' END AS status,
              greatest(spent, c_acctbal) AS max_metric,
              least(coalesce(spent, 0.0), c_acctbal) AS min_metric,
              spent IS NULL AS no_orders
       FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
       ORDER BY c_custkey"""

  // --------------------------------------------------------------------
  // q65 — argmax aggregates: max_by/min_by (Spark) ≡ arg_max/arg_min
  // (DuckDB) — "the row attribute at the extreme" without a window.
  // Ties: orders have a unique max/min price per status at this data's
  // precision (verified by the oracle hash itself).
  // --------------------------------------------------------------------
  def q65ArgMax(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).orders
      .groupBy(col("o_orderstatus"))
      .agg(
        max_by(col("o_orderkey"), col("o_totalprice")).as("biggest_order"),
        max(col("o_totalprice")).as("max_price"),
        min_by(col("o_orderkey"), col("o_totalprice")).as("smallest_order"),
        min(col("o_totalprice")).as("min_price"))
      .orderBy(col("o_orderstatus"))

  private val q65Oracle =
    """SELECT o_orderstatus,
              arg_max(o_orderkey, o_totalprice) AS biggest_order,
              max(o_totalprice) AS max_price,
              arg_min(o_orderkey, o_totalprice) AS smallest_order,
              min(o_totalprice) AS min_price
       FROM orders GROUP BY 1 ORDER BY o_orderstatus"""

  // --------------------------------------------------------------------
  // q66 — FILTER-clause conditional aggregation (the SQL-standard form of
  // q26's when()-guarded sums) via the spark.sql surface.
  // --------------------------------------------------------------------
  def q66FilterClause(s: SparkSession, dir: String): DataFrame = {
    lake(s, dir).registerViews()
    s.sql(
      """SELECT l_returnflag,
                count(*) AS n_all,
                count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                     FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS discounted_price,
                count(DISTINCT l_suppkey) FILTER (WHERE l_tax > 0.04) AS taxed_suppliers
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  }

  private val q66Oracle =
    """SELECT l_returnflag,
              count(*) AS n_all,
              count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                   FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS discounted_price,
              count(DISTINCT l_suppkey) FILTER (WHERE l_tax > 0.04) AS taxed_suppliers
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // --------------------------------------------------------------------
  // q67 — relative-rank windows: percent_rank ((rank−1)/(n−1)) and
  // cume_dist (rows≤current / n) are int-ratio doubles → deterministic
  // across engines. Partitioned per segment, bounded output via rank.
  // --------------------------------------------------------------------
  def q67WindowPct(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    lake(s, dir).customer
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .withColumn("rnk", rank().over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .filter(col("rnk") <= 5)
      .orderBy(col("c_mktsegment"), col("rnk"))
  }

  private val q67Oracle =
    """SELECT * FROM (
         SELECT c_custkey, c_mktsegment, c_acctbal,
                CAST(rank() OVER w AS INTEGER) AS rnk,
                percent_rank() OVER w AS pct_rank,
                cume_dist() OVER w AS cume
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey))
       WHERE rnk <= 5 ORDER BY c_mktsegment, rnk"""

  // --------------------------------------------------------------------
  // q68 — grouping flags on ROLLUP: grouping() distinguishes real NULL
  // group keys from rollup subtotal slots — the correct way to label
  // grouping-set output (q27/q57 use coalesce labels instead).
  // --------------------------------------------------------------------
  def q68GroupingId(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast(IntegerType).as("g_rf"),
        grouping(col("l_linestatus")).cast(IntegerType).as("g_ls"),
        count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("-")).as("rf"),
        coalesce(col("l_linestatus"), lit("-")).as("ls"),
        col("g_rf"), col("g_ls"), col("cnt"))
      .orderBy(col("g_rf"), col("g_ls"), col("rf"), col("ls"))

  private val q68Oracle =
    """SELECT coalesce(l_returnflag, '-') AS rf,
              coalesce(l_linestatus, '-') AS ls,
              CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
              CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
              count(*) AS cnt
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       ORDER BY g_rf, g_ls, rf, ls"""

  // --------------------------------------------------------------------
  // q116 — per-group EXACT quantile profile by rank selection: the value
  // at index ((n-1)*p) div 100 of the group-sorted column. Pure integer
  // index math — no interpolation, so no engine-specific float rounding
  // to diverge on (q46's median uses the same trick for one quantile;
  // this is the general profile). ONE shuffle on the group key serves
  // both windows AND the final aggregate (same partitioning, Catalyst
  // reuses the exchange). At 100 TB the same shape holds per group; for
  // a GLOBAL quantile prefer the percentile_approx sketch (spec'd in
  // ApproxDistinctSpec) over a single-partition global sort.
  // --------------------------------------------------------------------
  def q116QuantileProfile(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
    val wAll = Window.partitionBy(col("lang"))
    def pick(p: Int): Column =
      max(when(col("rn") === expr(s"((n - 1) * $p) div 100") + 1, col("n_chars")))
    lake(s, dir).documents
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        pick(25).as("p25"), pick(50).as("p50"), pick(75).as("p75"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"))
  }

  private val q116Oracle =
    """WITH r AS (SELECT lang, n_chars,
                         row_number() OVER (PARTITION BY lang
                                            ORDER BY n_chars, doc_id) AS rn,
                         count(*) OVER (PARTITION BY lang) AS n
                  FROM documents)
       SELECT lang, count(*) AS n_docs, min(n_chars) AS min_chars,
              max(CASE WHEN rn = ((n - 1) * 25) // 100 + 1 THEN n_chars END) AS p25,
              max(CASE WHEN rn = ((n - 1) * 50) // 100 + 1 THEN n_chars END) AS p50,
              max(CASE WHEN rn = ((n - 1) * 75) // 100 + 1 THEN n_chars END) AS p75,
              max(n_chars) AS max_chars
       FROM r GROUP BY lang ORDER BY lang"""

  // --------------------------------------------------------------------
  // q117 — explicit GROUPING SETS (the non-hierarchical shape ROLLUP/CUBE
  // can't express: ((rf,ls),(ls),()) skips the (rf) level). Spark 4's
  // native Dataset.groupingSets — one Expand + one hash aggregate, the
  // same partial-agg plan as q27/q57. Money total under the Det exact-
  // decimal policy.
  // --------------------------------------------------------------------
  def q117GroupingSets(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).lineitem
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast(IntegerType).as("g_rf"),
        grouping(col("l_linestatus")).cast(IntegerType).as("g_ls"),
        count(lit(1)).as("cnt"),
        Det.dsum(col("l_extendedprice")).as("sum_price"))
      .select(
        coalesce(col("l_returnflag"), lit("-")).as("rf"),
        coalesce(col("l_linestatus"), lit("-")).as("ls"),
        col("g_rf"), col("g_ls"), col("cnt"), col("sum_price"))
      .orderBy(col("g_rf"), col("g_ls"), col("rf"), col("ls"))

  private val q117Oracle =
    """SELECT coalesce(l_returnflag, '-') AS rf,
              coalesce(l_linestatus, '-') AS ls,
              CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
              CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
              count(*) AS cnt,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
       ORDER BY g_rf, g_ls, rf, ls"""

  // --------------------------------------------------------------------
  // q120 — multiset set ops: INTERSECT ALL (multiplicity = min of the two
  // sides) and EXCEPT ALL (left multiplicity minus right, floored at 0) —
  // the bag semantics q28/q60's DISTINCT variants can't express. Output
  // is the per-value multiplicity so the bag itself is hash-checked.
  // Spark plans both as count-aggregate + replicate (Generate) — two
  // uniform-key shuffles, never a join.
  // --------------------------------------------------------------------
  def q120SetOpsAll(s: SparkSession, dir: String): DataFrame = {
    val l = lake(s, dir)
    val c = l.customer.select(col("c_nationkey").as("nationkey"))
    val sup = l.supplier.select(col("s_nationkey").as("nationkey"))
    c.intersectAll(sup).withColumn("op", lit("intersect_all"))
      .unionAll(c.exceptAll(sup).withColumn("op", lit("except_all")))
      .groupBy(col("op"), col("nationkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("op"), col("nationkey"))
  }

  private val q120Oracle =
    """WITH ia AS (SELECT c_nationkey AS nationkey FROM customer
                   INTERSECT ALL SELECT s_nationkey FROM supplier),
            ea AS (SELECT c_nationkey AS nationkey FROM customer
                   EXCEPT ALL SELECT s_nationkey FROM supplier)
       SELECT 'intersect_all' AS op, nationkey, count(*) AS n
       FROM ia GROUP BY nationkey
       UNION ALL
       SELECT 'except_all' AS op, nationkey, count(*) AS n
       FROM ea GROUP BY nationkey
       ORDER BY op, nationkey"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q120_setops_all" -> (q120SetOpsAll _),
    "q116_quantile_profile" -> (q116QuantileProfile _),
    "q117_grouping_sets" -> (q117GroupingSets _),
    "q46_median" -> (q46Median _),
    "q47_exact_stats" -> (q47ExactStats _),
    "q48_window_suite" -> (q48WindowSuite _),
    "q49_date_fns" -> (q49DateFns _),
    "q50_string_fns" -> (q50StringFns _),
    "q52_asof_join" -> (q52AsofJoin _),
    "q53_range_join" -> (q53RangeJoin _),
    "q57_cube" -> (q57Cube _),
    "q58_array_fns" -> (q58ArrayFns _),
    "q60_except" -> (q60Except _),
    "q61_correlated_subquery" -> (q61CorrelatedSubquery _),
    "q62_null_fns" -> (q62NullFns _),
    "q65_argmax" -> (q65ArgMax _),
    "q66_filter_clause" -> (q66FilterClause _),
    "q67_window_pct" -> (q67WindowPct _),
    "q68_grouping_id" -> (q68GroupingId _),
    "q161_window_partitioned" -> (q161WindowPartitioned _))

  // --------------------------------------------------------------------
  // q161 — SCALE-PARTITIONED ranking + lag windows: the W1/W2 shapes the
  // reference computes UNPARTITIONED (silver_to_gold.py:122-124 and
  // :139-156 — a single reducer sorts the whole gold table), re-expressed
  // the way a 100 TB layer must run them: rank and delta WITHIN a
  // partition key. The window exchange hash-partitions on p_brand, every
  // brand ranks in parallel, and no stage ever sees more than one
  // brand's rows sorted together. The unpartitioned originals stay as
  // oracle-checked parity (q06/q07); this row proves the scale variant
  // computes the SAME semantics where partitioning doesn't change them —
  // a within-brand rank IS the global revenue order restricted to that
  // brand (pinned rank-for-rank in WindowScaleSpec). Plan guard: zero
  // SinglePartition exchanges anywhere (the exact hazard the reference's
  // Window.orderBy plants); the final presentation sort is a RANGE
  // exchange and stays legal.
  // --------------------------------------------------------------------
  def q161WindowPartitioned(s: SparkSession, dir: String): DataFrame = {
    val l = lake(s, dir)
    val rev = l.lineitem
      .join(l.part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(Det.dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("revenue").desc, col("p_partkey"))
    val q = rev
      .withColumn("brand_rank", row_number().over(w))
      .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
      .withColumn("revenue_gap",
        when(col("prev_revenue").isNull, lit(null))
          .otherwise(col("prev_revenue") - col("revenue")))
      .select(col("p_brand"), col("p_partkey"), col("revenue"),
        col("brand_rank"), col("revenue_gap"))
      .orderBy(col("p_brand"), col("brand_rank"))
    require(graft.plans.AdaptivePlans.collectDeep(q) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
        if e.outputPartitioning ==
          org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
    }.isEmpty,
      "the partitioned window must never funnel through one reducer")
    q
  }

  private val q161Oracle =
    """WITH rev AS (
         SELECT p_brand, p_partkey,
                CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                  AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand, p_partkey)
       SELECT p_brand, p_partkey, revenue,
              CAST(row_number() OVER w AS INTEGER) AS brand_rank,
              lag(revenue) OVER w - revenue AS revenue_gap
       FROM rev
       WINDOW w AS (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey)
       ORDER BY p_brand, brand_rank"""

  val oracle: Map[String, String] = Map(
    "q161_window_partitioned" -> q161Oracle,
    "q120_setops_all" -> q120Oracle,
    "q116_quantile_profile" -> q116Oracle,
    "q117_grouping_sets" -> q117Oracle,
    "q46_median" -> q46Oracle,
    "q47_exact_stats" -> q47Oracle,
    "q48_window_suite" -> q48Oracle,
    "q49_date_fns" -> q49Oracle,
    "q50_string_fns" -> q50Oracle,
    "q52_asof_join" -> q52Oracle,
    "q53_range_join" -> q53Oracle,
    "q57_cube" -> q57Oracle,
    "q58_array_fns" -> q58Oracle,
    "q60_except" -> q60Oracle,
    "q61_correlated_subquery" -> q61Oracle,
    "q62_null_fns" -> q62Oracle,
    "q65_argmax" -> q65Oracle,
    "q66_filter_clause" -> q66Oracle,
    "q67_window_pct" -> q67Oracle,
    "q68_grouping_id" -> q68Oracle)
}
