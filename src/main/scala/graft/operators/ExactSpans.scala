package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXACT cross-document shared-span detection — the distributed exact
  * step past q112's windowed approximation of suffix-array substring
  * dedup (Lee et al., "Deduplicating Training Data Makes Language
  * Models Better", ACL '22; the reference has no equivalent).
  *
  * Output: every MAXIMAL shared character span of length ≥ [[T]]
  * between every pair of documents — maximal per (pair, alignment
  * diagonal): extending the span one char left or right at that
  * alignment breaks equality. Exactly the spans a per-pair
  * suffix-automaton walk (or the oracle's T-gram diagonal-islands SQL)
  * enumerates.
  *
  * Candidate generation is WINNOWING (Schleimer/Wilkerson/Aiken,
  * SIGMOD '03), not all-pairs: each doc selects the rightmost-minimal
  * k-gram hash of every w-window; the scheme GUARANTEES any shared
  * span of length ≥ w + k − 1 = T yields a shared selected hash in
  * both documents (a window of w consecutive k-grams fits inside the
  * span, its content is identical in both docs, so both select the
  * same hash). Fingerprint density is ~2/(w+1) per position, so the
  * shuffle carries ~9% of positions as (doc_id, hash) longs — never
  * text. Hash collisions only ADD candidate pairs (the per-pair scan
  * is exact and emits nothing for a false pair); they can never drop
  * a true span. Cost: O(corpus) fingerprinting + an equi-join on the
  * fingerprint + O(|ta|·|tb| matches) per CANDIDATE pair — no
  * pairwise stage over the corpus exists anywhere.
  */
object ExactSpans {

  /** k-gram length, winnowing window, and the guarantee threshold
    * T = w + k − 1: every shared span of ≥ T chars is detected. 40
    * matches q112's span width, so the two queries report the same
    * notion of "span". */
  val K = 20
  val W = 21
  val T: Int = K + W - 1

  /** Polynomial rolling hashes of every k-gram (base 257 over chars,
    * wrapping 64-bit — deterministic, Spark-side only: the oracle
    * never sees fingerprints, so the hash family is free). */
  private def kgramHashes(t: String): Array[Long] = {
    val n = t.length - K + 1
    val hs = new Array[Long](n)
    var h = 0L
    var pow = 1L // 257^(K-1)
    var i = 0
    while (i < K) {
      h = h * 257L + t.charAt(i)
      if (i < K - 1) pow *= 257L
      i += 1
    }
    hs(0) = h
    i = 1
    while (i < n) {
      h = (h - t.charAt(i - 1) * pow) * 257L + t.charAt(i + K - 1)
      hs(i) = h
      i += 1
    }
    hs
  }

  /** Winnowing selection: the rightmost minimal hash of each w-window
    * of consecutive k-gram hashes, deduplicated (pairing only needs
    * the hash set). w is small, so the per-window min scan is the
    * clear-at-a-glance O(n·w) form. */
  private[operators] def winnow(t: String): Array[Long] = {
    if (t.length < T) return Array.emptyLongArray
    val hs = kgramHashes(t)
    val out = new java.util.HashSet[java.lang.Long]()
    var s = 0
    while (s + W <= hs.length) {
      var best = s
      var j = s + 1
      while (j < s + W) {
        if (hs(j) <= hs(best)) best = j // <= : rightmost minimal
        j += 1
      }
      out.add(hs(best))
      s += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    arr
  }

  /** EXACT maximal shared spans of one candidate pair: index tb's
    * T-grams (string-keyed — verification never trusts a hash), match
    * ta's T-grams, then merge consecutive matches per alignment
    * diagonal into islands. Returns (aStart, bStart, len), 1-based —
    * the oracle's exact semantics. */
  private[operators] def maximalSpans(
      ta: String, tb: String): Seq[(Int, Int, Int)] = {
    if (ta.length < T || tb.length < T) return Nil
    val idx = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
    var j = 0
    while (j + T <= tb.length) {
      idx.computeIfAbsent(tb.substring(j, j + T),
        _ => scala.collection.mutable.ArrayBuffer.empty[Int]) += j
      j += 1
    }
    // per diagonal (i - j), the ascending match positions i
    val byDiag = new java.util.HashMap[Integer, scala.collection.mutable.ArrayBuffer[Int]]()
    var i = 0
    while (i + T <= ta.length) {
      val js = idx.get(ta.substring(i, i + T))
      if (js != null) {
        val ic = i
        js.foreach { jj =>
          byDiag.computeIfAbsent(ic - jj,
            _ => scala.collection.mutable.ArrayBuffer.empty[Int]) += ic
        }
      }
      i += 1
    }
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    byDiag.forEach { (diag, ais) =>
      var runStart = ais.head
      var prev = ais.head
      def close(last: Int): Unit =
        spans += ((runStart + 1, runStart - diag + 1, last - runStart + T))
      ais.iterator.drop(1).foreach { a =>
        if (a != prev + 1) { close(prev); runStart = a }
        prev = a
      }
      close(prev)
    }
    spans.toSeq
  }

  /** The distributed operator: fingerprint → pair → exact per-pair
    * enumeration. Output (doc_a, doc_b, a_start, b_start, span_len),
    * doc_a < doc_b, positions 1-based. */
  def sharedSpans(docs: DataFrame, idCol: String, textCol: String)(
      implicit s: SparkSession): DataFrame = {
    import s.implicits._
    val txt = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    val fp = txt
      .filter(length(col("text")) >= T)
      .as[(Long, String)]
      .flatMap { case (id, t) => winnow(t).map(h => (id, h)) }
      .toDF("doc_id", "h")
      .distinct()
    val pairs = fp.as("a")
      .join(fp.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    pairs
      .join(txt.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(txt.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("ta"), col("tb"))
      .as[(Long, Long, String, String)]
      .flatMap { case (a, b, ta, tb) =>
        maximalSpans(ta, tb).map { case (as, bs, len) =>
          (a, b, as.toLong, bs.toLong, len.toLong)
        }
      }
      .toDF("doc_a", "doc_b", "a_start", "b_start", "span_len")
  }
}
