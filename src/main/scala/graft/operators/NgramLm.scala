package graft.operators

import graft.core.CacheScope
import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Corpus bigram language model for LM-based quality filtering — the
  * CCNet/KenLM stage every web-scale pretraining pipeline runs: train a
  * cheap n-gram LM on trusted text, score candidate documents by mean
  * token log-probability, and keep the head of the distribution
  * (low-perplexity ≈ natural prose; gibberish, boilerplate soup, and
  * wrong-language text land in the tail).
  *
  * Model: add-one-smoothed bigram probabilities
  * P(b|a) = (c(a,b) + 1) / (c(a) + V). Both count tables are
  * VOCABULARY-sized (the explode's fan-out is absorbed map-side by
  * partial aggregation), so at 100 TB the model is a broadcast-sized
  * artifact while the corpus is only ever scanned — fit is two
  * vocab-sized aggregates, scoring is two broadcast joins plus one
  * doc-keyed partial aggregate.
  *
  * Determinism: per-bigram log terms are `java.lang.Math.log` doubles
  * (identical bit patterns on every JVM); the per-document MEAN
  * accumulates them through an exact DECIMAL(38,18) sum (the `Det`
  * money policy), so the score is independent of partitioning and
  * summation order — reruns and cluster layouts cannot reorder a
  * document across a filter threshold.
  */
object NgramLm {

  /** Trained model: unigram/bigram count tables + vocabulary size. */
  final case class Model(unigrams: DataFrame, bigrams: DataFrame, vocabSize: Long)

  private def docBigrams(df: DataFrame, cols: Seq[String], textCol: String) =
    df.select(cols.map(col) :+ TextFns.tokens(col(textCol)).as("toks"): _*)
      .filter(size(col("toks")) >= 2)
      .select(cols.map(col) :+ explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "k -> struct(toks[k-1] AS a, toks[k] AS b))")).as("p"): _*)
      .select(cols.map(col) :+ col("p.a").as("a") :+ col("p.b").as("b"): _*)

  /** Train on `docs` — typically the TRUSTED corpus (the wiki-side of
    * CCNet), not the candidates being scored. */
  def fit(docs: DataFrame, textCol: String): Model = {
    val uni = CacheScope.cached(
      docs.select(explode(TextFns.tokens(col(textCol))).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy(col("tok")).agg(count(lit(1)).as("c_uni")))
    val bi = CacheScope.cached(
      docBigrams(docs, Seq.empty, textCol)
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_bi")))
    Model(uni, bi, uni.count())
  }

  /** Score each document: `(idCol, n_bigrams, avg_logprob)` — the mean
    * add-one bigram log-probability (exp(−avg_logprob) = perplexity).
    * Documents with fewer than 2 tokens produce no row (no bigram, no
    * evidence either way — callers decide their fate explicitly). */
  def score(docs: DataFrame, idCol: String, textCol: String, model: Model): DataFrame = {
    val v = model.vocabSize
    docBigrams(docs, Seq(idCol), textCol)
      .join(broadcast(model.bigrams), Seq("a", "b"), "left")
      .join(broadcast(model.unigrams.withColumnRenamed("tok", "a")), Seq("a"), "left")
      .select(col(idCol),
        log((coalesce(col("c_bi"), lit(0L)) + 1).cast(DoubleType)
          / (coalesce(col("c_uni"), lit(0L)) + v).cast(DoubleType)).as("lp"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        (sum(col("lp").cast(DecimalType(38, 18))).cast(DoubleType)
          / count(lit(1))).as("avg_logprob"))
  }

  /** FIXED-POINT scoring twin of [[score]] — same model, same joins,
    * but every log is `ln_fp` (the pinned 10^15-scaled integer atanh
    * series, [[org.apache.spark.sql.graft.LnFixedPoint]]) so the score
    * is an int64 a DuckDB oracle reproduces BIT-FOR-BIT — the
    * hash-comparable form of a log-domain score (`Math.log` doubles
    * are engine-identical but SQL engines' `ln()` is not).
    *
    * Output: `(idCol, n_bigrams, avg_nll_fp)` where avg_nll_fp =
    * floor(Σ (lnFp(c(a)+V) − lnFp(c(a,b)+1)) / n) — the mean NEGATIVE
    * log-likelihood, kept positive so every division in the pipeline
    * is floor-on-nonnegative (identical to truncation, the one
    * integer-division semantic every engine agrees on). Scale shape:
    * `ln_fp` runs over the count TABLES (model-sized, broadcast), so
    * the per-bigram stream does a long subtraction; the per-doc sum
    * accumulates in DECIMAL(38,0) (a 2000-term document would overflow
    * an int64 sum of 10^16-scale terms). */
  def scoreFp(docs: DataFrame, idCol: String, textCol: String, model: Model): DataFrame = {
    import org.apache.spark.sql.functions.call_function
    val v = model.vocabSize
    // ln over the MODEL tables: O(vocab) evaluations, broadcast after
    val lnNum = model.bigrams.select(col("a"), col("b"),
      call_function("ln_fp", col("c_bi") + 1).as("ln_num"))
    val lnDen = model.unigrams.select(col("tok").as("a"),
      call_function("ln_fp", col("c_uni") + v).as("ln_den"))
    // a scored bigram absent from the model: num = lnFp(0+1) = 0,
    // den = lnFp(0+V) — driver-side constants, not per-row recompute
    val lnDenMiss = org.apache.spark.sql.graft.LnFixedPoint.lnFp(v)
    docBigrams(docs, Seq(idCol), textCol)
      .join(broadcast(lnNum), Seq("a", "b"), "left")
      .join(broadcast(lnDen), Seq("a"), "left")
      .select(col(idCol),
        (coalesce(col("ln_den"), lit(lnDenMiss))
          - coalesce(col("ln_num"), lit(0L))).as("nll"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        expr("CAST(sum(CAST(nll AS DECIMAL(38,0))) DIV count(1) AS BIGINT)")
          .as("avg_nll_fp"))
  }
}
