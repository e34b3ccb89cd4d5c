package graft

import graft.core.Lake
import graft.functions.Scale
import org.apache.spark.sql.functions._

/** Skew salting, bucketed co-located joins, and sketch aggregates — the
  * scale-path variants behind the exact operators.
  */
class ScaleSpec extends SparkSpec {

  test("saltedJoin returns exactly the plain join's rows under a skewed key") {
    import spark.implicits._
    // 10k rows of one hot key + uniform tail vs a 100-row dim
    val left = ((1 to 10000).map(_ => 1L) ++ (1L to 2000L)).toDF("k")
    val right = (1L to 100L).map(k => (k, s"dim_$k")).toDF("rk", "v")
    val plain = left.join(right, col("k") === col("rk"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    val salted = Scale.saltedJoin(left, right, col("k"), col("rk"), salts = 8)
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    assert(plain.orderBy("k").collect().toSeq ===
      salted.orderBy("k").collect().toSeq)
  }

  test("AQE skew join: a hot key's partition is split at runtime (OptimizeSkewedJoin)") {
    import spark.implicits._
    // one key owns ~95% of the left side — the classic hot-key join.
    // Thresholds are lowered so the optimization triggers at spec scale;
    // on a real cluster the defaults (256 MB) play the same role.
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      // coalescing would merge the small partitions and hide the skew
      // reader — production keeps both on; the test isolates the splitter
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // pad must be incompressible AND survive into the join output —
      // skew detection reads COMPRESSED shuffle bytes, and 200k copies
      // of one long deflate to nothing
      val left = ((1 to 200000).map(_ => 1L) ++ (1L to 10000L))
        .toDF("k")
        .withColumn("pad", md5(monotonically_increasing_id().cast("string")))
      val right = (1L to 10000L).map(j => (j, s"dim_$j")).toDF("rk", "v")
      val joined = left.join(right, col("k") === col("rk"))
        .select(col("k"), col("pad"), col("v"))
      // collect on the join's own plan so AQE finalizes THIS queryExecution
      assert(joined.collect().length === 200000 + 10000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead skewed"),
        s"expected AQE to mark/split the skewed partition in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed tables join with zero shuffle exchanges") {
    val l = Lake(spark, sfDir) // warehouse dir set at session build (static conf)
    // in-memory catalog forgets tables between JVMs but the warehouse
    // dirs persist — clear both
    Seq("orders_bkt", "customer_bkt").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val d = new java.io.File(s"target/tmp/warehouse/$t")
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(d)
      }
    }
    l.orders.write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    l.customer.write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bkt")
    // force the sort-merge path (broadcast would hide the bucketing at
    // this tiny scale; at 100 TB neither side broadcasts)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("customer_bkt")
        .join(spark.table("orders_bkt"), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // co-located: no exchange anywhere below the join (the only
      // exchange permitted is none — bucketing satisfies the aggregate's
      // distribution too, since it groups on the bucket key)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("static partition pruning: a partition-column filter prunes the scan") {
    import spark.implicits._
    val path = new java.io.File("target/tmp/spec_pruning/orders_part").getAbsolutePath
    val l = Lake(spark, sfDir)
    l.orders.withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(path)
    val df = spark.read.parquet(path).filter(col("o_year") === 1995)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"),
      s"expected partition filter in:\n$plan")
    // pruned scan must read fewer files than the full table has partitions
    val years = spark.read.parquet(path).select("o_year").distinct().count()
    assert(years > 1)
  }

  test("dynamic partition pruning: a dim-side filter prunes the fact scan at runtime") {
    import spark.implicits._
    val path = new java.io.File("target/tmp/spec_pruning/orders_part").getAbsolutePath
    // dim must be a file source: a LocalRelation filter constant-folds
    // away and leaves no selective predicate for the DPP rule to see
    val dimPath = new java.io.File("target/tmp/spec_pruning/dim_year").getAbsolutePath
    (1994 to 2001).map(y => (y, if (y == 1995) "keep" else "drop"))
      .toDF("d_year", "d_tag").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val fact = spark.read.parquet(path)
    val joined = fact.join(dim,
      col("o_year") === col("d_year") && col("d_tag") === "keep")
      .groupBy(col("o_year")).agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic pruning subquery in:\n$plan")
  }

  test("runtime bloom-filter join pruning: a selective dim filter reaches the fact scan") {
    import spark.implicits._
    // the row-level sibling of DPP: when the fact side is NOT partitioned
    // by the join key, the optimizer builds a bloom filter from the
    // filtered dim side and pushes a might_contain probe into the fact
    // scan — at 100 TB this is the difference between shuffling the full
    // fact table into a join that keeps 1% and pre-dropping 99% at scan.
    val factPath = new java.io.File("target/tmp/spec_bloom/fact").getAbsolutePath
    val dimPath = new java.io.File("target/tmp/spec_bloom/dim").getAbsolutePath
    val l = Lake(spark, sfDir)
    l.lineitem.select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite").parquet(factPath)
    l.orders.select(col("o_orderkey"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(dimPath)
    val prev = Map(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      // spec-scale knobs: the rule's size thresholds assume cluster-scale
      // tables, so drop them to fire on the fixture; a broadcast join
      // would make the filter pointless, so force a shuffle join
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = spark.read.parquet(factPath)
      val dim = spark.read.parquet(dimPath).filter(col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val n = joined.collect().head.getLong(0)
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a bloom-filter probe on the fact scan in:\n$plan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("schema evolution: mergeSchema unions parquet batches with added columns") {
    import spark.implicits._
    val path = new java.io.File("target/tmp/spec_evolve/t").getAbsolutePath
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(path)
    Seq((2L, "b", 9.5)).toDF("id", "v", "score")
      .write.mode("append").parquet(path)
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    assert(df.columns.toSet === Set("id", "v", "score"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score"))) // old batch null-filled
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) === 9.5)
  }

  test("percentile_approx (quantile sketch) lands within 5% of exact quantiles") {
    // the mergeable-sketch path for quantiles: like HLL for distincts,
    // percentile_approx aggregates a bounded sketch partial-first — the
    // only way to get quantiles out of a 100 TB column in one pass
    // (exact percentile sorts the whole column per group)
    val l = Lake(spark, sfDir)
    val r = l.lineitem
      .agg(
        expr("percentile_approx(CAST(l_quantity AS DOUBLE), array(0.25, 0.5, 0.75), 1000)")
          .as("approx"),
        expr("percentile(CAST(l_quantity AS DOUBLE), array(0.25, 0.5, 0.75))")
          .as("exact"))
      .head()
    val approx = r.getSeq[Double](0)
    val exact = r.getSeq[Double](1)
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) <= math.max(0.05 * e, 1.0),
        s"sketch quantile $a too far from exact $e")
    }
  }

  test("approx_count_distinct (HLL) lands within 5% of exact at this scale") {
    val li = Lake(spark, sfDir).lineitem
    val exact = li.agg(countDistinct(col("l_orderkey"))).head().getLong(0)
    val approx = li.agg(approx_count_distinct(col("l_orderkey"), 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
