package graft.operators

import graft.functions.TextFns._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators as plain DataFrame-in / DataFrame-out
  * building blocks — the single implementations behind the oracle-
  * verified q70/q71/q72/q74 AND the `Graft` facade, so library surface
  * and verified queries cannot drift (the NearDup pattern).
  *
  * All are hash-family aware where hashing matters: `fast = true`
  * switches to the xxhash64 family (callers pass
  * `TextFns.fastHash(spark)`); the oracle queries pin `fast = false`.
  */
object Curation {

  /** Stratified sample with EXACT per-stratum quotas, deterministic by
    * portable hash rank within each stratum. Plans as partial+final
    * WindowGroupLimit — no stratum is globally sorted. */
  def stratifiedSample(
      df: DataFrame, stratumCol: String, idCol: String, quota: Int,
      fast: Boolean = false): DataFrame = {
    val h = if (fast) xxhash60(col(idCol).cast("string"))
            else hash60(col(idCol).cast("string"))
    val w = Window.partitionBy(col(stratumCol)).orderBy(h, col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= quota)
  }

  /** Top-k tokens per group by corpus frequency (vocabulary pass). The
    * explode's fan-out is absorbed by map-side partial counts: the
    * shuffle carries one row per DISTINCT (group, token). */
  def vocabTopK(df: DataFrame, groupCol: String, textCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("n_occurrences").desc, col("token"))
    df.select(col(groupCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Documents sharing ≥ `minOverlap` distinct `shingleSize`-shingles
    * with the probe set. The probe side (benchmark suites — megabytes by
    * nature) broadcasts; the corpus side stays scan-parallel and is
    * never shuffled in full. Returns (idCol, n_shared_shingles). */
  def contamination(
      corpus: DataFrame, probes: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, minOverlap: Int = 5,
      fast: Boolean = false): DataFrame = {
    val bench = probes
      .select(explode(hashedShingles(col(textCol), shingleSize, fast)).as("h"))
      .distinct()
    corpus
      .select(col(idCol), explode(hashedShingles(col(textCol), shingleSize, fast)).as("h"))
      .join(broadcast(bench), "h") // shingle sets are distinct per doc
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared_shingles"))
      .filter(col("n_shared_shingles") >= minOverlap)
  }

  /** Gopher-style repetition/diversity flags per document: top-token
    * mass ratio, type-token ratio, and the repetitive flag. Int/int
    * double divisions — bit-deterministic. */
  def repetitionFlags(
      df: DataFrame, idCol: String, textCol: String,
      maxTokenRatio: Double = 0.1, minTypeTokenRatio: Double = 0.3): DataFrame =
    df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(idCol))
      .agg(max(col("n")).as("max_tok"),
        sum(col("n")).as("n_toks"),
        count(lit(1)).as("n_distinct"))
      .select(col(idCol),
        (col("max_tok").cast("double") / col("n_toks")).as("max_token_ratio"),
        (col("n_distinct").cast("double") / col("n_toks")).as("type_token_ratio"),
        when(col("max_tok").cast("double") / col("n_toks") > maxTokenRatio
          || col("n_distinct").cast("double") / col("n_toks") < minTypeTokenRatio, 1)
          .otherwise(0).as("is_repetitive"))

}
