package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One reported heavy hitter: `count` is an UPPER bound on the true
  * frequency, `count - err` a LOWER bound (err = 0 ⇒ exact). */
final case class TokenCount(token: String, count: Long, err: Long)

/** Mergeable Space-Saving heavy-hitters sketch (Metwally et al., ICDT
  * 2005) as a typed `Aggregator`: top-k frequent items in ONE pass with
  * O(k) state, merged across partitions by the Mergeable Summaries rule
  * (Agarwal et al., PODS 2012).
  *
  * Why it exists next to the exact top-k (q71's explode + groupBy +
  * rank): the exact form shuffles one row per DISTINCT key — fine for a
  * 31-token toy vocabulary, but "top URLs/hosts/n-grams in a 100 TB
  * crawl" has billions of distinct keys, and the vocabulary-sized
  * shuffle IS the bottleneck. This sketch reduces each partition to k
  * entries map-side and ships only those: the shuffle is O(partitions·k)
  * regardless of key cardinality, the classic sketch-vs-exact trade any
  * large-scale counting pipeline makes.
  *
  * Guarantees (standard Space-Saving, preserved under merge):
  *   - every item with true frequency > n/k is present in the summary;
  *   - for each entry, trueCount ≤ count and count − err ≤ trueCount;
  *   - with capacity ≥ distinct-key count nothing is ever evicted, every
  *     err is 0 and counts are EXACT regardless of merge order — which
  *     is what lets q97 hash-match a DuckDB GROUP BY oracle.
  *
  * Determinism: eviction and truncation tie-break on (count, token), so
  * the summary is a function of the multiset per partition; in exact
  * mode the output is fully merge-order-independent.
  */
class TopKAgg(k: Int)
    extends Aggregator[String, Map[String, (Long, Long)], Seq[TokenCount]] {

  require(k > 0, s"TopKAgg capacity must be positive: $k")

  override def zero: Map[String, (Long, Long)] = Map.empty

  override def reduce(
      buf: Map[String, (Long, Long)], token: String): Map[String, (Long, Long)] =
    buf.get(token) match {
      case Some((c, e)) => buf.updated(token, (c + 1, e))
      case None if buf.size < k => buf.updated(token, (1L, 0L))
      case None =>
        // evict the (deterministically) smallest entry; the newcomer
        // inherits its count as upper bound and error
        val (mt, (mc, _)) = buf.minBy { case (t, (c, _)) => (c, t) }
        (buf - mt).updated(token, (mc + 1, mc))
    }

  override def merge(
      a: Map[String, (Long, Long)], b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    // a key absent from a FULL summary may still have occurred up to
    // that summary's minimum count times — charge that floor as both
    // count and error; a non-full summary saw every key (floor 0)
    val fa = if (a.size < k) 0L else a.valuesIterator.map(_._1).min
    val fb = if (b.size < k) 0L else b.valuesIterator.map(_._1).min
    val merged = (a.keySet ++ b.keySet).iterator.map { t =>
      val (ca, ea) = a.getOrElse(t, (fa, fa))
      val (cb, eb) = b.getOrElse(t, (fb, fb))
      t -> (ca + cb, ea + eb)
    }.toMap
    if (merged.size <= k) merged
    else merged.toSeq.sortBy { case (t, (c, _)) => (-c, t) }.take(k).toMap
  }

  override def finish(buf: Map[String, (Long, Long)]): Seq[TokenCount] =
    buf.toSeq.map { case (t, (c, e)) => TokenCount(t, c, e) }
      .sortBy(tc => (-tc.count, tc.token))

  // Catalyst map/struct encoders (not javaSerialization): the buffer
  // crosses the partial→final exchange once per partition and must stay
  // an UnsafeRow-packed map, not an object stream
  override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, (Long, Long)]]()

  override def outputEncoder: Encoder[Seq[TokenCount]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TokenCount]]()
}
