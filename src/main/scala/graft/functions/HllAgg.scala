package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-file HyperLogLog register builder for the table format's NDV
  * stats ([[graft.medallion.TxLog]] `ndv.columns`): input is the
  * column's `xxhash64` (computed codegen'd in the staging projection),
  * buffer/output are the `2^p` one-byte registers — Flajolet et al.'s
  * HLL with the standard split: the hash's top `p` bits pick the
  * register, the rank of the remainder (leading zeros + 1) updates it.
  *
  * Mergeable by element-wise MAX, so it rides ordinary partial
  * aggregation like [[BloomAgg]] — and, crucially, the same property
  * is what makes the stored per-file sketches a DISTRIBUTED NDV for
  * free: the union of any file subset is the max of their registers,
  * so a snapshot's distinct-count estimate needs only the log
  * (file-count × 2^p bytes on the driver, zero data scanned), and it
  * stays exact-in-expectation under compaction/rewrite because staging
  * recomputes sketches from the bytes. At p = 11 the registers are
  * 2 KiB per (file × column) and the relative error ≈ 1.04/√2048 ≈
  * 2.3%.
  */
class HllAgg(p: Int)
    extends Aggregator[java.lang.Long, Array[Byte], Array[Byte]] {
  require(p >= 4 && p <= 16, s"HllAgg: p must be in [4,16], got $p")

  private val m = 1 << p
  private val maxRank = (64 - p + 1).toByte

  override def zero: Array[Byte] = new Array[Byte](m)

  // null input = a NULL column value (the staging projection maps them
  // to null rather than hashing them — Spark's xxhash64 returns its
  // seed for NULL, which would register one phantom distinct value per
  // file). Nulls contribute nothing, per the NDV contract.
  override def reduce(buf: Array[Byte], hBoxed: java.lang.Long): Array[Byte] = {
    if (hBoxed == null) return buf
    val h = hBoxed.longValue()
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val rank =
      if (w == 0L) maxRank
      else math.min(java.lang.Long.numberOfLeadingZeros(w) + 1, maxRank.toInt).toByte
    if (rank > buf(idx)) buf(idx) = rank
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Byte]): Array[Byte] = buf

  override def bufferEncoder: Encoder[Array[Byte]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Byte]]()

  override def outputEncoder: Encoder[Array[Byte]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Byte]]()
}

object HllAgg {

  /** Merge registers in place (element-wise max); arrays must agree in
    * size — the caller refuses mixed-p sketches. */
  def mergeInto(acc: Array[Byte], regs: Array[Byte]): Unit = {
    require(acc.length == regs.length,
      s"hll: register size mismatch (${acc.length} vs ${regs.length})")
    var i = 0
    while (i < acc.length) { if (regs(i) > acc(i)) acc(i) = regs(i); i += 1 }
  }

  /** The classic HLL estimator with the small-range linear-counting
    * correction (HLL++'s empirical bias table omitted — the stats
    * consumer needs planning-grade accuracy, not ±0.5%). */
  def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += 1.0 / (1L << regs(i)).toDouble
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / sum
    val e =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(e)
  }
}
