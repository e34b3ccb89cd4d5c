package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType}

import graft.functions.TextFns

/** Hashed-n-gram two-distribution scorers — the shared core behind the
  * two classic corpus-selection stages every LLM data pipeline runs:
  *
  *   - '''DSIR''' (Data Selection via Importance Resampling, Xie et al.,
  *     NeurIPS 2023): score RAW documents by how much more likely a
  *     TARGET-domain hashed-n-gram model makes their tokens than the raw
  *     model, then keep the top slice / resample proportionally.
  *   - '''Quality classification''' (the fastText-supervised /
  *     CCNet-style filter, Joulin et al. 2017; Wenzek et al. 2020):
  *     fit the same ratio model over GOOD-vs-BAD training labels and
  *     threshold the per-document score.
  *
  * Both reduce to one model shape: bucket every token n-gram into `b`
  * hash buckets, count per class, and weight bucket `i` by the smoothed
  * class-probability ratio
  * `((ct_i+1)·(R+b)) / ((cr_i+1)·(T+b))` (add-one smoothing; `T`/`R`
  * are total target/raw tokens) — the per-token factor of the Naive
  * Bayes likelihood ratio.
  *
  * Scale shape: fitting is ONE explode + ONE b-bounded partial
  * aggregate (the model is `b` doubles — KiB, broadcast as a literal);
  * scoring is a single stateless pass with zero shuffles (codegen'd
  * higher-order functions over the token array); selection is a
  * TakeOrderedAndProject top-k or a hash-threshold resample. Nothing
  * grows with corpus size except the two linear passes.
  *
  * Cross-engine determinism (SURVEY §8.3): the oracle-checked scoring
  * is the LINEAR-domain mean ratio — per-bucket weights are single IEEE
  * divisions of exact integer products, and the per-document fold adds
  * the SORTED weight multiset left-to-right (0.0-init fold ≡ DuckDB's
  * first-element-init `list_reduce`; all weights are positive, so the
  * ±0.0 edge cannot arise). The paper-faithful LOG-domain
  * log-likelihood-ratio ([[logScore]]) and the importance
  * resampler ([[resample]]) ride the same model but are spec-gated —
  * `ln` is engine-dependent (q51/q71's policy).
  */
object TokenClassifier {

  /** Default bucket count: 2^12 keeps the model literal at 32 KiB. */
  val DefaultBuckets = 4096

  /** Hash buckets of each whitespace token, in document order
    * (portable md5-family [[TextFns.hash60]] mod `b`). */
  def unigramBuckets(text: Column, b: Int = DefaultBuckets): Column =
    transform(TextFns.tokens(text),
      t => pmod(TextFns.hash60(t), lit(b.toLong)).cast(IntegerType))

  /** Hash buckets of each word BIGRAM (`tok_i ⧺ " " ⧺ tok_i+1`);
    * empty for documents of fewer than two tokens. */
  def bigramBuckets(text: Column, b: Int = DefaultBuckets): Column = {
    val toks = TextFns.tokens(text)
    when(size(toks) < 2, array().cast(ArrayType(IntegerType)))
      .otherwise(transform(sequence(lit(0), size(toks) - 2),
        i => pmod(TextFns.hash60(concat(
          element_at(toks, i + 1), lit(" "), element_at(toks, i + 2))),
          lit(b.toLong)).cast(IntegerType)))
  }

  /** Fit the smoothed ratio model: `labeled` must have an `array<int>`
    * feature-bucket column and a boolean target/class column. One
    * explode + one `b`-bounded aggregate; the collect is MODEL-sized
    * (≤ b rows) — the KMeans/BpeTrainer precedent, never O(corpus).
    * Returns the dense per-bucket weight array (exact integer products
    * per [[TokenClassifier]]'s formula, one IEEE division each — what
    * the DuckDB oracle replays bit-for-bit). */
  def fitRatio(labeled: DataFrame, featureCol: String, targetCol: String,
      b: Int = DefaultBuckets): Array[Double] = {
    val counts = labeled
      .select(col(targetCol).as("t"), explode(col(featureCol)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(when(col("t"), 1)).as("ct"),
        count(when(!col("t"), 1)).as("cr"))
      .collect() // ≤ b rows — the model, not the data
    val ct = new Array[Long](b); val cr = new Array[Long](b)
    counts.foreach { r =>
      ct(r.getInt(0)) = r.getLong(1); cr(r.getInt(0)) = r.getLong(2)
    }
    val tTot = ct.sum; val rTot = cr.sum
    Array.tabulate(b) { i =>
      (BigInt(ct(i) + 1L) * BigInt(rTot + b)).toDouble /
        (BigInt(cr(i) + 1L) * BigInt(tTot + b)).toDouble
    }
  }

  /** Mean per-token ratio score (linear-domain; oracle-portable): the
    * SORTED weight multiset folded left-to-right, divided by the token
    * count; 0.0 for featureless documents. A document of target-typical
    * tokens scores > 1, raw-typical < 1. */
  def meanRatioScore(featureBuckets: Column, weights: Array[Double]): Column = {
    val wl = typedLit(weights.toSeq)
    val sorted = array_sort(transform(featureBuckets,
      bkt => element_at(wl, bkt + 1)))
    when(size(featureBuckets) === 0, lit(0.0)).otherwise(
      aggregate(sorted, lit(0.0), (a, x) => a + x) /
        size(featureBuckets).cast(DoubleType))
  }

  /** Paper-faithful log-likelihood-ratio score
    * `Σ log(w_bucket)` — DSIR's importance log-weight / the Naive Bayes
    * log-odds. Engine-dependent `ln` ⇒ spec-gated, not oracled; the
    * HASH-CHECKABLE twin is [[fitRatioLogFp]] + [[logScoreFp]]. */
  def logScore(featureBuckets: Column, weights: Array[Double]): Column = {
    val wl = typedLit(weights.toSeq)
    aggregate(transform(featureBuckets, bkt => log(element_at(wl, bkt + 1))),
      lit(0.0), (a, x) => a + x)
  }

  /** FIXED-POINT per-bucket log weights: lnFp of the smoothed ratio's
    * exact integer numerator and denominator (the products stay under
    * 2^63 for any real corpus: (count+1)·(total+b) ≤ ~(2^40)²), via
    * the pinned [[org.apache.spark.sql.graft.LnFixedPoint]] algorithm
    * — so DSIR's LOG-domain importance weight becomes an int64 a
    * DuckDB oracle reproduces bit-for-bit (q166), closing the one
    * spec-gated scorer [[logScore]] left. Model-sized work: 2·b lnFp
    * evaluations on the driver, never per token. */
  def fitRatioLogFp(labeled: DataFrame, featureCol: String, targetCol: String,
      b: Int = DefaultBuckets): Array[Long] = {
    val counts = labeled
      .select(col(targetCol).as("t"), explode(col(featureCol)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(when(col("t"), 1)).as("ct"),
        count(when(!col("t"), 1)).as("cr"))
      .collect() // ≤ b rows — the model, not the data
    val ct = new Array[Long](b); val cr = new Array[Long](b)
    counts.foreach { r =>
      ct(r.getInt(0)) = r.getLong(1); cr(r.getInt(0)) = r.getLong(2)
    }
    val tTot = ct.sum; val rTot = cr.sum
    import org.apache.spark.sql.graft.LnFixedPoint.lnFp
    Array.tabulate(b)(i =>
      lnFp((ct(i) + 1L) * (rTot + b)) - lnFp((cr(i) + 1L) * (tTot + b)))
  }

  /** `Σ lnwFp(bucket)` per document — [[logScore]]'s hash-checkable
    * twin over [[fitRatioLogFp]] weights. Accumulates in DECIMAL(38,0)
    * (a long-count document could overflow an int64 sum of
    * 10^16-scale terms) and returns the exact integer as a long. */
  def logScoreFp(featureBuckets: Column, lnwFp: Array[Long]): Column = {
    val wl = typedLit(lnwFp.toSeq)
    aggregate(featureBuckets,
      lit(java.math.BigDecimal.ZERO)
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)),
      (a, bkt) => a + element_at(wl, bkt + 1)
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
      .cast(LongType)
  }

  /** Deterministic importance resampling: keep a row iff its id-hash
    * point in [0,1) falls under `scale · exp(logScore)` (capped at 1) —
    * Bernoulli sampling proportional to the importance weight with a
    * reproducible hash in place of a RNG (the q54/q86 family). Callers
    * pick `scale` to hit their token budget. */
  def resample(docs: DataFrame, idCol: String, logScoreCol: String,
      scale: Double): DataFrame =
    docs.filter(
      TextFns.hash60(col(idCol).cast("string")).cast(DoubleType) /
        lit(Math.pow(2.0, 60)) <
        least(lit(1.0), lit(scale) * exp(col(logScoreCol))))

  /** Oracle-portable importance resampling over the LINEAR-domain
    * score: keep a row iff its id-hash point in [0,1) falls under
    * `min(1, scale · score)` — the same deterministic Bernoulli as
    * [[resample]] with a RATIONAL acceptance probability (one IEEE
    * multiply + compare; no engine-dependent `exp`/`ln`), so the DSIR
    * SELECTION stage itself reproduces bit-exactly in any engine.
    * Monotone twice over: a row kept at `scale` is kept at any larger
    * scale, and — at a fixed hash point — a higher-scoring row is
    * never dropped where a lower-scoring one survives. */
  def resampleLinear(docs: DataFrame, idCol: String, scoreCol: String,
      scale: Double): DataFrame =
    docs.filter(
      TextFns.hash60(col(idCol).cast("string")).cast(DoubleType) /
        lit(Math.pow(2.0, 60)) <
        least(lit(1.0), lit(scale) * col(scoreCol)))

  /** The PAPER-FAITHFUL exp-domain resampling, HASH-CHECKABLE: keep a
    * row iff its id-hash point falls under `min(1, exp(logScore))`,
    * with every step a pinned integer — `p_fp = S` when the fixed-
    * point log score is ≥ 0, else the native `exp_fp` of it
    * ([[org.apache.spark.sql.graft.ExpFixedPoint]]); the Bernoulli
    * test is the EXACT integer compare `hash60 · S < p_fp · 2^60` in
    * DECIMAL(38,0) (both products < 1.2·10^33), which a DuckDB HUGEINT
    * mirror replays bit-for-bit. [[resample]] (double `exp`) stays the
    * engine-local form; [[resampleLinear]] the linear-domain one. This
    * closes the family: DSIR's §3 Bernoulli on `exp(Σ log w)` is now
    * an oracle-checkable operator. Stateless codegen'd filter — zero
    * shuffles, zero state, survivors a pure function of
    * (corpus, model). */
  def resampleFp(docs: DataFrame, idCol: String, logScoreFpCol: String): DataFrame = {
    import org.apache.spark.sql.functions.call_function
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val s = org.apache.spark.sql.graft.ExpFixedPoint.Scale
    val pFp = when(col(logScoreFpCol) >= 0L, lit(s))
      .otherwise(call_function("exp_fp", col(logScoreFpCol)))
    docs.filter(
      TextFns.hash60(col(idCol).cast("string")).cast(dec) * lit(s).cast(dec) <
        pFp.cast(dec) * lit(1L << 60).cast(dec))
  }
}
