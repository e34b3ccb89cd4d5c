package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash signature aggregator (`Aggregator[IN, BUF, OUT]`): merges
  * per-document signatures into the signature of their UNION of shingle
  * sets by element-wise minimum.
  *
  * MinHash's defining property — min over a union = min of mins — makes
  * the signature a mergeable sketch: per-partition partial signatures
  * combine associatively/commutatively, so a corpus-level (or per-group)
  * dedup index builds in one pass with ordinary partial aggregation, and
  * incremental maintenance (new batch → merge into stored signature) costs
  * O(slots) per group. This is the §2.12 custom-aggregate path the
  * reference never needed but a 100 TB dedup pipeline does.
  */
class MinHashAgg(slots: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(slots)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < slots && i < sig.length) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < slots) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  // Catalyst array encoder, NOT javaSerialization: the buffer crosses
  // the partial→final exchange once per group per partition, and the
  // expression encoder writes a primitive long array directly into
  // UnsafeRow (no object stream, no reflection)
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
