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

  /** [[winnow]] keeping POSITIONS: the selected (position, hash) pairs,
    * deduplicated — the star-pairing path needs the anchor position to
    * extend the exact span around it. */
  private[operators] def winnowPositions(t: String): Array[(Int, Long)] = {
    if (t.length < T) return Array.empty
    val hs = kgramHashes(t)
    val out = new java.util.LinkedHashSet[(Int, Long)]()
    var s = 0
    while (s + W <= hs.length) {
      var best = s
      var j = s + 1
      while (j < s + W) {
        if (hs(j) <= hs(best)) best = j
        j += 1
      }
      out.add((best, hs(best)))
      s += 1
    }
    out.toArray(new Array[(Int, Long)](out.size))
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
    * doc_a < doc_b, positions 1-based.
    *
    * SKEW CAVEAT (by construction of the contract, not a bug): the
    * pairwise OUTPUT itself is quadratic in a hot span's document
    * frequency — a license header shared by n docs genuinely IS
    * C(n,2) span rows, and the fingerprint equi-join must emit a
    * candidate pair for each. This exact all-pairs form is therefore
    * for bounded-df corpora (the q164 oracle contract); `maxDf` drops
    * over-frequent fingerprints first (the Moss convention — winnowing
    * hashes shared by more than maxDf docs are boilerplate noise, not
    * pair evidence), and the DEDUP use case at corpus scale is
    * [[spanOccurrences]], whose candidate work and output are both
    * group-LINEAR. */
  def sharedSpans(docs: DataFrame, idCol: String, textCol: String,
      maxDf: Option[Int] = None)(
      implicit s: SparkSession): DataFrame = {
    import s.implicits._
    val txt = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    val fp0 = txt
      .filter(length(col("text")) >= T)
      .as[(Long, String)]
      .flatMap { case (id, t) => winnow(t).map(h => (id, h)) }
      .toDF("doc_id", "h")
      .distinct()
    // optional hot-fingerprint cap: an aggregate-and-semi-join, never
    // a collect — dropping a hash can only drop candidate PAIRS whose
    // every shared span is boilerplate-frequent (they may still pair
    // via a rarer hash of the same span)
    val fp = maxDf.fold(fp0) { cap =>
      fp0.join(
        fp0.groupBy(col("h")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("h"),
        Seq("h"), "left_semi")
    }
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

  /** Exact maximal extension around a shared k-gram anchor: verifies
    * the K chars really match (a hash collision emits nothing), then
    * extends the equality left and right as far as it goes. Returns
    * (aStart, bStart, len) 1-based when the maximal span reaches [[T]].
    */
  private[operators] def extendMax(
      ta: String, i0: Int, tb: String, j0: Int): Option[(Long, Long, Long)] = {
    var k = 0
    while (k < K) {
      if (ta.charAt(i0 + k) != tb.charAt(j0 + k)) return None
      k += 1
    }
    var i = i0; var j = j0
    while (i > 0 && j > 0 && ta.charAt(i - 1) == tb.charAt(j - 1)) {
      i -= 1; j -= 1
    }
    var ie = i0 + K; var je = j0 + K
    while (ie < ta.length && je < tb.length && ta.charAt(ie) == tb.charAt(je)) {
      ie += 1; je += 1
    }
    val len = ie - i
    if (len >= T) Some(((i + 1).toLong, (j + 1).toLong, len.toLong)) else None
  }

  private def positioned(docs: DataFrame, idCol: String, textCol: String)(
      implicit s: SparkSession): (DataFrame, DataFrame) = {
    import s.implicits._
    val txt = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    val fp = txt
      .filter(length(col("text")) >= T)
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        winnowPositions(t).map { case (p, h) => (id, p, h) } }
      .toDF("doc_id", "pos", "h")
    (txt, fp)
  }

  /** The GROUP-LINEAR candidate stage of [[spanOccurrences]]: every
    * occurrence of a df ≥ 2 fingerprint, paired with its group's
    * REPRESENTATIVE occurrence (min (doc_id, pos) — an aggregate, the
    * q155 exact-hash-collapse precedent). A span shared by n documents
    * yields n−1 edges here, never C(n,2) — the hot-boilerplate shape
    * the pairwise join cannot avoid. Package-visible so the spec can
    * count the candidate work directly. */
  private[operators] def starEdges(txt: DataFrame, fp: DataFrame): DataFrame = {
    val reps = fp.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("r"),
        count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .select(col("h"), col("r.doc_id").as("rep_doc"),
        col("r.pos").as("rep_pos"))
    fp.join(reps, "h")
      .filter(col("doc_id") =!= col("rep_doc") ||
        col("pos") =!= col("rep_pos"))
      .select(col("doc_id"), col("pos"), col("rep_doc"), col("rep_pos"))
  }

  /** OCCURRENCE-GROUPED exact shared spans — the corpus-scale dedup
    * form of [[sharedSpans]]: instead of enumerating every document
    * PAIR (quadratic in a hot span's document frequency), each
    * occurrence of a shared winnowing fingerprint is verified against
    * its fingerprint group's single REPRESENTATIVE occurrence, and the
    * output is one row per (document, maximal span vs the rep) —
    * `(doc_id, start, span_len, rep_doc, rep_start)`, 1-based. A
    * license header in a million documents costs ~10⁶ verifications
    * and rows, not ~10¹² — candidate generation, verification work,
    * and output are all LINEAR in the span's occurrence count.
    *
    * Exactness contract: every reported row is an exactly-verified
    * maximal shared span (char-compare anchored at the shared k-gram,
    * extended both ways; hash collisions emit nothing). Detection is
    * relative to each fingerprint GROUP's rep: a document's duplicated
    * region is reported whenever the rep shares it — always true for
    * the boilerplate shape this targets (every group member carries
    * the span), while an adversarial mix where the group minimum
    * shares only the bare k-gram can under-report a pair
    * relationship; [[sharedSpans]] remains the exact all-pairs
    * contract. For removal à la Lee et al. '22 ("keep the first
    * occurrence"), a doc's duplicated chars are the union of its
    * [start, start+len) rows.
    *
    * Scale notes: the rep join replicates only the REP's text per
    * occurrence (the verification input itself, O(group · |text|));
    * AQE's skew-join splits the hot rep_doc partitions. */
  def spanOccurrences(docs: DataFrame, idCol: String, textCol: String)(
      implicit s: SparkSession): DataFrame = {
    import s.implicits._
    val (txt, fp) = positioned(docs, idCol, textCol)
    starEdges(txt, fp)
      .join(txt, "doc_id")
      .join(txt.select(col("doc_id").as("rep_doc"),
        col("text").as("rep_text")), "rep_doc")
      .select(col("doc_id"), col("pos"), col("rep_doc"), col("rep_pos"),
        col("text"), col("rep_text"))
      .as[(Long, Int, Long, Int, String, String)]
      .flatMap { case (d, p, rd, rp, t, rt) =>
        extendMax(t, p, rt, rp).map { case (as, rs, len) =>
          (d, as, len, rd, rs) }
      }
      .toDF("doc_id", "start", "span_len", "rep_doc", "rep_start")
      .distinct()
  }

  /** Convenience entry pairing [[positioned]] with [[starEdges]] for
    * tests/probes that need the candidate frame alone. */
  private[graft] def candidateEdges(
      docs: DataFrame, idCol: String, textCol: String)(
      implicit s: SparkSession): DataFrame = {
    val (txt, fp) = positioned(docs, idCol, textCol)
    starEdges(txt, fp)
  }
}
