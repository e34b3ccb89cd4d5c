package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Determinism helpers for oracle-matched numeric aggregation.
  *
  * Rounding doubles post-hoc is NOT portable across engines: Spark's
  * `round` goes through `BigDecimal.valueOf` (shortest-string HALF_UP)
  * while DuckDB rounds the binary value, and money averages land exactly
  * on half-boundaries (e.g. 141428.955) where the two disagree.
  *
  * Instead: the money columns in the testdata are 2-decimal rationals, so
  * summing them as DECIMAL is exact and order-independent; the decimal
  * total converts to double exactly (scaled value < 2^53); and a final
  * IEEE division by a count is bit-deterministic given identical inputs.
  * No rounding anywhere → bit-identical hashes.
  *
  * THE 2^53 BOUND IS LOAD-BEARING. When the scaled integer (value ×
  * 10^scale) exceeds 2^53, the decimal → double conversion must round —
  * and engines round DIFFERENTLY from a scale-carrying decimal (DuckDB
  * converts the int128 then multiplies by 10^-scale, two roundings;
  * Spark/BigDecimal rounds once). Measured consequence: q47's Σx² at
  * sf0.1 diverged by ulps, amplified ~4× by the variance's near-equal
  * subtraction. Past the bound, accumulate at decimal SCALE 0 (integer
  * cents — a single correctly-rounded integer conversion everywhere) and
  * rescale afterwards in double, the way q47 does; and always take
  * sqrt/log-like functions of the MATERIALIZED column, never a re-derived
  * expression copy.
  */
object Det {

  /** Exact sum of a 2-decimal money column, as double.
    * Oracle: `CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`. */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact sum of a product of two 2-decimal factors (a 4-decimal
    * rational), as double.
    * Oracle: `CAST(sum(CAST(expr AS DECIMAL(18,4))) AS DOUBLE)`. */
  def dsum4(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Bit-deterministic mean of a 2-decimal money column: exact sum / n.
    * Oracle: `CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / count(*)`. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Bit-deterministic mean of an integer column.
    * Oracle: `CAST(sum(x) AS DOUBLE) / count(*)`. */
  def davgInt(c: Column): Column =
    sum(c).cast(DoubleType) / count(lit(1))
}
