package graft.medallion

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType}

/** Multi-dimensional data-layout clustering (Z-ORDER) for the write
  * side — the Delta/Iceberg `OPTIMIZE ZORDER BY` equivalent as a plain
  * DataFrame transform.
  *
  * WHY at 100 TB: parquet scans skip whole files (and row groups) by
  * min/max footer stats, but stats only prune when the data is
  * CLUSTERED on the filtered column. Sorting by one column makes its
  * ranges tight and every other column's ranges full-width — a filter
  * on the second column skips nothing. Interleaving the bits of several
  * columns' scaled values (the Morton / Z-curve) gives every
  * participating column a ~k-th-root-width range per file, so a
  * selective filter on ANY of them skips most files. That multiplies
  * directly with partition pruning and the bloom/DPP runtime filters.
  *
  * Mechanics: each column is linearly scaled to a `bits`-wide integer
  * using its global min/max (one aggregate pass), the bits interleave
  * into one Z value, and the frame is range-partitioned + sorted on it.
  * Linear scaling is exact for the uniform-ish key/date domains this
  * lake's tables have; for heavily skewed columns substitute
  * rank-based boundaries (`approxQuantile` per column) in `scaled` —
  * the interleave and layout machinery is unchanged.
  */
object Layout {

  /** Cluster `df` on the Z-curve over `cols` (numeric or date), into
    * `targetFiles` range partitions sorted by the interleaved value.
    * Write the result with plain `.parquet(...)` — one file per
    * partition, each covering a compact hyper-rectangle of the `cols`
    * space. */
  def zorderBy(df: DataFrame, cols: Seq[String], targetFiles: Int,
      bits: Int = 12, prefix: Seq[Column] = Nil): DataFrame =
    clusterBy(df, cols, targetFiles, bits, prefix, hilbert = false)

  /** Cluster `df` on the HILBERT curve over `cols` — same scaling and
    * range-partitioned layout as [[zorderBy]], but the interleaved
    * Morton value is replaced by the codegen'd
    * [[org.apache.spark.sql.graft.HilbertIndex]]. The Hilbert curve is
    * everywhere-adjacent (no Z-seam diagonal jumps), so equal-sized
    * file runs cover compact CONNECTED regions: tighter per-file
    * min/max on every clustered dimension — strictly better stats
    * pruning for 2-3-dim clustering at identical write cost. */
  def hilbertBy(df: DataFrame, cols: Seq[String], targetFiles: Int,
      bits: Int = 12, prefix: Seq[Column] = Nil): DataFrame =
    clusterBy(df, cols, targetFiles, bits, prefix, hilbert = true)

  private def clusterBy(df: DataFrame, cols: Seq[String], targetFiles: Int,
      bits: Int, prefix: Seq[Column], hilbert: Boolean): DataFrame = {
    require(cols.nonEmpty, "zorderBy needs at least one column")
    require(cols.size * bits <= 60,
      s"${cols.size} cols x $bits bits exceeds the 60-bit z-value budget")
    require(targetFiles >= 1, s"targetFiles must be >= 1: $targetFiles")

    // one pass for global [min, max] per column — the model state that
    // parameterizes the scaling, tiny and driver-held
    def asDouble(name: String): Column = {
      val c = col(name)
      df.schema(name).dataType match {
        // day granularity for any temporal type — layout clustering
        // does not need sub-day resolution
        case DateType | org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType =>
          datediff(to_date(c), to_date(lit("1970-01-01"))).cast("double")
        case _ => c.cast("double")
      }
    }
    val aggs = cols.flatMap(c => Seq(min(asDouble(c)), max(asDouble(c))))
    val statsRow = df.agg(aggs.head, aggs.tail: _*).head()
    val stats = cols.zipWithIndex.map { case (name, i) =>
      require(!statsRow.isNullAt(2 * i),
        s"zorderBy: column '$name' has no non-null values — empty input " +
          "or an all-null clustering column cannot define a layout")
      (statsRow.getDouble(2 * i), statsRow.getDouble(2 * i + 1))
    }

    val maxVal = (1L << bits) - 1
    val scaled: Seq[Column] = cols.zip(stats).map { case (name, (mn, mx)) =>
      if (mx == mn) lit(0L)
      else ((asDouble(name) - mn) / (mx - mn) * maxVal).cast(LongType)
    }
    val dims = cols.size
    val z =
      if (hilbert) {
        // the native expression resolves through the registered graft
        // function (idempotent registration — sessions built without
        // the extensions conf still work)
        graft.engine.GraftFunctions.register(df.sparkSession)
        call_function("hilbert_index",
          (lit(bits) +: scaled.map(_.cast(LongType))): _*)
      } else (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
        scaled.zipWithIndex.foldLeft(acc) { case (a, (sc, d)) =>
          a + shiftright(sc, b).bitwiseAND(1L) * (1L << (b * dims + d))
        }
      }
    // `prefix` columns lead the range exchange and the within-partition
    // sort (PARTITION-MAJOR, z-within): a partitioned table keeps its
    // transform clustering while the z-curve orders inside each tuple
    val keys = prefix :+ col("_zorder")
    df.withColumn("_zorder", z)
      .repartitionByRange(targetFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .drop("_zorder")
  }
}
