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

  test("HilbertCurve.index: bijective and everywhere-adjacent (the defining property)") {
    import org.apache.spark.sql.graft.HilbertCurve
    for (dims <- 2 to 3; bits <- 1 to (if (dims == 2) 5 else 3)) {
      val side = 1 << bits
      val total = math.pow(side.toDouble, dims.toDouble).toLong
      // enumerate every grid point, order by index
      def coords(i: Long): Array[Long] = {
        var x = i; val c = new Array[Long](dims)
        var d = 0
        while (d < dims) { c(d) = x % side; x /= side; d += 1 }
        c
      }
      val byIndex = (0L until total).map { i =>
        val c = coords(i)
        HilbertCurve.index(c.clone(), bits) -> c
      }.sortBy(_._1)
      assert(byIndex.map(_._1) === (0L until total),
        s"dims=$dims bits=$bits: indexes must be a bijection onto [0, $total)")
      // consecutive indexes are GRID NEIGHBORS: L1 distance exactly 1 —
      // this is what Morton lacks (its seams jump diagonally)
      byIndex.sliding(2).foreach { case Seq((i1, c1), (_, c2)) =>
        val l1 = c1.zip(c2).map { case (a, b) => math.abs(a - b) }.sum
        assert(l1 === 1L,
          s"dims=$dims bits=$bits: step after index $i1 moved L1=$l1 " +
            s"(${c1.mkString(",")} -> ${c2.mkString(",")})")
      }
    }
  }

  test("hilbert layout: rows exact, both dims compact, beats Morton on range tightness") {
    val orders = Lake(spark, sfDir).orders
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).as("o_day"))
    val hPath = new java.io.File("target/tmp/spec_layout/h").getAbsolutePath
    val zPath = new java.io.File("target/tmp/spec_layout/z2").getAbsolutePath
    Layout.hilbertBy(orders, Seq("o_custkey", "o_day"), targetFiles = 16)
      .write.mode("overwrite").parquet(hPath)
    Layout.zorderBy(orders, Seq("o_custkey", "o_day"), targetFiles = 16)
      .write.mode("overwrite").parquet(zPath)
    // row-exact
    val back = spark.read.parquet(hPath)
    assert(back.count() === orders.count())
    assert(back.select("o_orderkey").except(orders.select("o_orderkey")).count() === 0)
    def avg(xs: Seq[Double]) = xs.sum / xs.size
    val hCust = avg(fileRanges(hPath, "o_custkey"))
    val hDay = avg(fileRanges(hPath, "o_day"))
    val zCust = avg(fileRanges(zPath, "o_custkey"))
    val zDay = avg(fileRanges(zPath, "o_day"))
    assert(hCust < 0.7 && hDay < 0.7,
      s"hilbert must be compact on both dims: cust=$hCust day=$hDay")
    // the curve's adjacency should not LOSE to Morton's seam files on
    // combined tightness (ties possible on easy data — require <=)
    assert(hCust + hDay <= (zCust + zDay) * 1.05,
      s"hilbert combined ranges regress vs Morton: " +
        s"h=${hCust + hDay} z=${zCust + zDay}")
  }

  test("optimizeZorder(layout = hilbert): transactional rewrite, range pruning bites") {
    import spark.implicits._
    val t = new graft.medallion.GraftTable(new java.io.File(
      s"target/tmp/spec_layout/tbl_${java.util.UUID.randomUUID().toString.take(8)}")
      .getAbsolutePath)
    val rows = for (a <- 0L until 64L; b <- 0L until 16L) yield (a, b, a * 16 + b)
    t.append(rows.toDF("a", "b", "v").repartition(4))
    val before = t.read(spark).collect().map(_.toSeq).toSet
    val (in, out, _) = t.optimizeZorder(spark, Seq("a", "b"), 16, layout = "hilbert")
    assert(in === 4 && out >= 8)
    assert(t.history().head._2 === "zorder")
    assert(t.read(spark).collect().map(_.toSeq).toSet === before, "row-neutral")
    // q105-style pruning: a narrow probe on EITHER dim prunes most files
    val total = t.snapshot().files.size
    val na = t.filesForRange("a", Some(10L), Some(12L))
    val nb = t.filesForRange("b", Some(3L), Some(4L))
    assert(na * 3 <= total, s"a-probe must prune: $na of $total")
    assert(nb * 2 <= total, s"b-probe must prune: $nb of $total")
    assert(t.readRange(spark, "a", Some(10L), Some(12L)).count() === 3 * 16L)
    assert(t.readRange(spark, "b", Some(3L), Some(4L)).count() === 2 * 64L)
  }
}
