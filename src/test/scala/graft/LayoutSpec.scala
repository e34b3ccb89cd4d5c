package graft

import graft.core.Lake
import graft.medallion.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: per-file min/max ranges must be compact on EVERY
  * participating dimension — that is the whole point (single-column
  * sorting leaves the other column full-width per file, so filters on
  * it skip nothing). */
class LayoutSpec extends SparkSpec {

  /** Per-file normalized [min,max] width of `column`, for each parquet
    * file under `path`. */
  private def fileRanges(path: String, column: String): Seq[Double] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    val global = spark.read.parquet(path)
      .agg(min(col(column)).cast("double"), max(col(column)).cast("double"))
      .head()
    val span = math.max(global.getDouble(1) - global.getDouble(0), 1e-9)
    walk(new java.io.File(path)).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col(column)).cast("double"), max(col(column)).cast("double"))
        .head()
      (r.getDouble(1) - r.getDouble(0)) / span
    }
  }

  test("z-order gives compact per-file ranges on BOTH dims; single-sort leaves one full-width") {
    val orders = Lake(spark, sfDir).orders
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).as("o_day"))

    val zPath = new java.io.File("target/tmp/spec_layout/z").getAbsolutePath
    val sPath = new java.io.File("target/tmp/spec_layout/s").getAbsolutePath
    Layout.zorderBy(orders, Seq("o_custkey", "o_day"), targetFiles = 8)
      .write.mode("overwrite").parquet(zPath)
    // baseline: the classic single-column sort
    orders.repartitionByRange(8, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.mode("overwrite").parquet(sPath)

    def avg(xs: Seq[Double]) = xs.sum / xs.size
    val zCust = avg(fileRanges(zPath, "o_custkey"))
    val zDay = avg(fileRanges(zPath, "o_day"))
    val sCust = avg(fileRanges(sPath, "o_custkey"))
    val sDay = avg(fileRanges(sPath, "o_day"))

    // single-sort: custkey tight, date full-width — a date filter reads
    // every file. z-order: both dims compact.
    assert(sCust < 0.3, s"baseline custkey ranges should be tight: $sCust")
    assert(sDay > 0.8, s"baseline date ranges should be full-width: $sDay")
    assert(zCust < 0.7, s"z-order custkey ranges should be compact: $zCust")
    assert(zDay < 0.7, s"z-order date ranges should be compact: $zDay")
    // and the second dim improves by a wide margin over the baseline
    assert(zDay < sDay * 0.75, s"z-order must beat single-sort on the 2nd dim: $zDay vs $sDay")
  }

  test("z-order layout preserves rows exactly") {
    val orders = Lake(spark, sfDir).orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val path = new java.io.File("target/tmp/spec_layout/rows").getAbsolutePath
    Layout.zorderBy(orders, Seq("o_custkey", "o_orderdate"), targetFiles = 4)
      .write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path)
    assert(back.count() === orders.count())
    assert(back.select("o_orderkey").except(orders.select("o_orderkey")).count() === 0)
    assert(back.columns.toSet === orders.columns.toSet, "no _zorder column leaks")
  }

  test("degenerate inputs: constant column and one-file target don't crash") {
    import spark.implicits._
    val df = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("a", "c")
    val out = Layout.zorderBy(df, Seq("a", "c"), targetFiles = 1)
    assert(out.count() === 3)
  }
}
