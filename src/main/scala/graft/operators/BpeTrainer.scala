package graft.operators

import graft.core.CacheScope
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding TRAINER (Sennrich et al., ACL 2016 —
  * the word-level variant GPT-2-family tokenizers train with). q89
  * computes ONE round's pair-count statistic over the raw corpus; this
  * runs the full merge loop, the way real trainers scale:
  *
  *   - '''one corpus-sized pass, ever''': the corpus collapses to a
  *     WORD-FREQUENCY table up front (distinct words + counts — the
  *     groupBy absorbs repetition map-side, and natural-language word
  *     frequency follows Zipf, so the table is orders of magnitude
  *     smaller than the corpus);
  *   - '''vocabulary-sized merge rounds''': each round counts
  *     freq-weighted adjacent symbol pairs over the word table (one
  *     pair-vocabulary-sized shuffle), takes the best pair via
  *     TakeOrderedAndProject (never a global sort), and rewrites each
  *     word's symbol array with ONE left-to-right greedy fold — a
  *     narrow map over the word table. At 100 TB the corpus is read
  *     once; 50k merge rounds iterate over millions of words, not TB;
  *   - '''bounded lineage''': the symbol column is re-derived per round,
  *     so the loop caches each round's table and releases the previous
  *     one (the ConnectedComponents discipline) — plans stay
  *     round-sized instead of growing by numMerges.
  *
  * Determinism: the best pair is (max weighted count, then lexicographic
  * (a, b)) — a total order, so training is bit-reproducible and
  * partitioning-invariant; the greedy merge fold is a per-row pure
  * function.
  *
  * `encode` applies the learned merges with the standard rank-greedy
  * loop as a typed map over a broadcast model — tokenization is
  * per-row JVM logic (what every production tokenizer is), not a plan
  * of numMerges nested expressions.
  */
object BpeTrainer {

  /** Ordered merge list (training order = rank) + the final symbol
    * vocabulary with corpus frequencies. */
  final case class BpeModel(
      merges: Seq[(String, String)], vocab: Seq[(String, Long)]) {
    def mergeRank: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  /** The greedy non-overlapping (a,b)→ab rewrite of a symbol array as a
    * single left-to-right SQL fold (the q93 run-length shape — no
    * explode, no window, no shuffle). */
  private def mergeFold(a: String, b: String): org.apache.spark.sql.Column = {
    val qa = a.replace("\\", "\\\\").replace("'", "\\'")
    val qb = b.replace("\\", "\\\\").replace("'", "\\'")
    expr(
      s"""aggregate(syms, cast(array() as array<string>),
            (out, s) ->
              if (size(out) > 0 AND element_at(out, -1) = '$qa' AND s = '$qb',
                  concat(slice(out, 1, size(out) - 1), array('$qa$qb')),
                  concat(out, array(s))))""")
  }

  /** Train `numMerges` merges over the whitespace words of `textCol`.
    * Stops early when no adjacent pair occurs at least `minFreq` times
    * (default 2 — merging a pair seen once memorizes, not generalizes). */
  def fit(docs: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 2L): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    require(minFreq >= 1L, s"minFreq must be >= 1: $minFreq")
    // the single corpus-sized pass: word frequencies, then chars
    var cur = CacheScope.cached(
      docs.select(explode(TextFns.tokens(col(textCol))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
        .withColumn("syms", split(col("w"), "")))
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var round = 0
    while (round < numMerges && !done) {
      val top = cur
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "k -> struct(syms[k-1] AS a, syms[k] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .filter(col("n") >= minFreq)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val a = top(0).getString(0); val b = top(0).getString(1)
        merges += ((a, b))
        // re-derive symbols; cache the new round, release the old (the
        // fold is cheap — the cache exists to truncate growing lineage)
        val next = CacheScope.cached(
          cur.withColumn("syms", mergeFold(a, b)))
        next.count()
        cur.unpersist()
        cur = next
        round += 1
      }
    }
    val vocab = cur
      .select(col("freq"), explode(col("syms")).as("sym"))
      .groupBy(col("sym")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("sym"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    cur.unpersist()
    BpeModel(merges.result(), vocab)
  }

  /** Tokenize each document's words with the trained merges — the
    * standard rank-greedy encode (always apply the LOWEST-rank
    * applicable merge first), as a typed `mapPartitions` over the
    * broadcast model (the Media batch-decode pattern: tokenization is
    * per-row JVM logic, and the partition-batched typed map keeps it
    * off the UDF path). Returns (idCol, `bpe_tokens` array<string>). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      model: BpeModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = spark.sparkContext.broadcast(model.mergeRank)
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val r = ranks.value
        it.map { case (id, text) =>
          val toks =
            if (text == null) Seq.empty[String]
            else text.trim.split(" ").filter(_.nonEmpty).toSeq
              .flatMap(w => encodeWord(w, r))
          (id, toks)
        }
      }
      .toDF(idCol, "bpe_tokens")
  }

  /** Rank-greedy BPE of one word: repeatedly merge the present pair
    * with the lowest training rank until none applies. Shared by
    * `encode` and the spec's reference comparisons. */
  def encodeWord(word: String, rank: Map[(String, String), Int]): Seq[String] = {
    // split by CODE POINT, not UTF-16 code unit — fit's split(w, "") is
    // code-point aware, so encode must be too or non-BMP characters
    // (emoji, supplementary CJK) decompose into lone surrogate halves
    // that no trained merge can ever match
    var syms = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b.result()
    }
    var continue = syms.length >= 2
    while (continue) {
      val best = syms.zip(syms.tail).zipWithIndex
        .flatMap { case (p, i) => rank.get(p).map(r => (r, i)) }
        .sortBy(identity).headOption
      best match {
        case None => continue = false
        case Some((_, i)) =>
          syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
          continue = syms.length >= 2
      }
    }
    syms
  }
}
