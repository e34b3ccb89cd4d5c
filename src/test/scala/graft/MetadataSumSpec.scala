package graft

import graft.medallion.{GraftTable, TxLog}
import org.apache.spark.sql.functions._

/** Exact per-file sums (`sum.columns`): unfiltered SUM aggregates
  * answer from the commit log with zero files opened — the COUNT/MIN/
  * MAX metadata-aggregate story extended to the dashboard's other
  * column. Integral types only (exact, order-independent); anything
  * uncovered falls back to a real scan, never to a wrong answer. */
class MetadataSumSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String): GraftTable = {
    val dir = new java.io.File(
      s"target/tmp/msum_${tag}_${java.util.UUID.randomUUID().toString.take(8)}")
    new GraftTable(dir.getAbsolutePath)
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect(); df.queryExecution.executedPlan.toString
  }

  test("unfiltered SUM answers from the log, zero files opened") {
    val t = freshTable("zero")
    t.append(Seq((0L, 0L)).toDF("id", "x"))
    t.delete(spark, "id", Some(0L), Some(0L))
    t.setProperty(TxLog.SumColumnsProp, "x")
    t.append((1L to 100L).map(i => (i, i * 3L)).toDF("id", "x"))
    t.append((101L to 200L).map(i => (i, i * 3L)).toDF("id", "x"))
    val agg = spark.read.format("graft-table").load(t.tablePath)
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
    val p = planOf(agg)
    assert(!p.contains("BatchScan"), s"SUM must not scan data:\n$p")
    assert(agg.head() === org.apache.spark.sql.Row(3L * 200L * 201L / 2L, 200L))
  }

  test("GROUP BY single-valued column + per-group SUM stays zero-scan") {
    val t = freshTable("grouped")
    t.append(Seq((0L, "z", 0L)).toDF("id", "g", "x"))
    t.delete(spark, "id", Some(0L), Some(0L))
    t.setProperty(TxLog.SumColumnsProp, "x")
    Seq("a", "b").foreach { g =>
      t.append((1L to 50L).map(i => (i, g, i)).toDF("id", "g", "x"))
    }
    val agg = spark.read.format("graft-table").load(t.tablePath)
      .groupBy(col("g")).agg(sum(col("x")).as("sx")).orderBy(col("g"))
    val p = planOf(agg)
    assert(!p.contains("BatchScan"), s"grouped SUM must not scan:\n$p")
    assert(agg.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 1275L), ("b", 1275L)))
  }

  test("deletion vectors and partial coverage fall back to a real scan, exactly") {
    val t = freshTable("fallback")
    t.append((1L to 50L).map(i => (i, i)).toDF("id", "x")) // pre-property file
    t.setProperty(TxLog.SumColumnsProp, "x")
    t.append((51L to 100L).map(i => (i, i)).toDF("id", "x"))
    def sumDf = spark.read.format("graft-table").load(t.tablePath)
      .agg(sum(col("x")).as("sx"))
    val p1 = planOf(sumDf)
    assert(p1.contains("BatchScan"),
      s"a pre-property file must force a real scan:\n$p1")
    assert(sumDf.head().getLong(0) === 5050L)
    // full rewrite re-stages with sums -> zero-scan again
    t.compact(spark)
    assert(!planOf(sumDf).contains("BatchScan"))
    // ...until a DV makes per-file sums stale
    t.deleteRows(spark, "x % 10 = 0")
    val p2 = planOf(sumDf)
    assert(p2.contains("BatchScan"), s"DVs must force a real scan:\n$p2")
    assert(sumDf.head().getLong(0) === 5050L - (10L to 100L by 10L).sum)
  }

  test("property validation: non-integral columns refuse") {
    val t = freshTable("validate")
    t.append(Seq((1L, 0.5, "s")).toDF("id", "d", "v"))
    intercept[IllegalArgumentException] {
      t.setProperty(TxLog.SumColumnsProp, "d") }
    intercept[IllegalArgumentException] {
      t.setProperty(TxLog.SumColumnsProp, "v") }
    intercept[IllegalArgumentException] {
      t.setProperty(TxLog.SumColumnsProp, "nope") }
    t.setProperty(TxLog.SumColumnsProp, "id") // integral: fine
  }

  test("metadata MIN/MAX folds strings in UTF-8 byte order (supplementary chars)") {
    val smile = new String(Character.toChars(0x1F600)) // U+1F600
    val t = freshTable("utf8minmax")
    // two files whose maxes invert under String.compareTo: the emoji
    // sorts ABOVE U+FFFD in UTF8String order, below it in UTF-16 units
    t.append(Seq((1L, smile + "alpha")).toDF("id", "s").coalesce(1))
    t.append(Seq((2L, "�zeta"), (3L, "ascii")).toDF("id", "s").coalesce(1))
    val agg = spark.read.format("graft-table").load(t.tablePath)
      .agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
    val plan = planOf(agg)
    assert(plan.contains("LocalTableScan"),
      s"string MIN/MAX must answer from the log: $plan")
    val row = agg.head()
    // the oracle: what a genuine scan computes
    val real = spark.read.format("graft-table").load(t.tablePath)
      .select(col("s")).collect().map(_.getString(0))
    val realMax = real.reduce((a, b) =>
      if (org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) >= 0) a else b)
    assert(row.getString(0) === "ascii")
    assert(row.getString(1) === realMax && realMax === smile + "alpha",
      s"metadata max ${row.getString(1)} must equal the scan's $realMax")
  }
}
