package graft.api

import graft.core.Lake
import graft.engine.GraftFunctions
import graft.functions.TextFns
import graft.medallion.Medallion
import graft.operators.AsOfJoin
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The public library facade: the engine's operator surface as plain
  * DataFrame-in / DataFrame-out methods, so a pipeline author composes
  * them without knowing the internal packages. Every method delegates to
  * the same building blocks the oracle-verified query inventory runs
  * (`TextFns`, `Medallion`, `AsOfJoin`, the native `cosine_sim`), so the
  * correctness gate covers this surface transitively (plus GraftApiSpec's
  * direct equivalences).
  */
object Graft {

  /** Attach graft's native functions to a running session. */
  def init(spark: SparkSession): SparkSession = {
    GraftFunctions.register(spark)
    spark
  }

  /** Open a table directory as a lake catalog with temp views. */
  def openLake(spark: SparkSession, dir: String): Lake = {
    init(spark)
    val l = Lake(spark, dir)
    l.registerViews()
    l
  }

  /** Release every query-internal cache registered since the last call.
    * Operators like [[nearDupPairs]] cache an intermediate that their
    * returned (lazy) plan references more than once; call this after
    * materializing results so cached blocks don't accumulate over a
    * long-lived session. Safe to call any time — released frames are
    * recomputed from lineage if a plan still needs them. */
  def releaseCaches(): Unit = graft.core.CacheScope.releaseAll()

  // ---------------- deduplication ----------------

  /** Exact dedup by normalized content: keep the smallest `idCol` per
    * distinct `textCol` (after trim+lowercase). */
  def dedupExact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(lower(trim(col(textCol))))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** MinHash-LSH near-duplicate PAIRS (doc ids with Jaccard ≥ threshold).
    * Delegates to [[graft.operators.NearDup]] — the same implementation
    * the oracle-verified q36 runs, so facade and query cannot drift.
    * `bands` must divide `minHashes` (enforced). */
  def nearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, minHashes: Int = 12, bands: Int = 4,
      threshold: Double = 0.5): DataFrame =
    graft.operators.NearDup.minHashLshPairs(
      df, idCol, textCol, shingleSize, minHashes, bands, threshold)

  /** Per-group MinHash index: one `slots`-wide signature per `groupCol`
    * value, built by partial aggregation (the mergeable-sketch path —
    * signatures combine by elementwise min, so partials merge exactly).
    * Persist the result and fold new batches in with
    * [[mergeMinHashIndexes]] instead of rescanning the corpus. Honors
    * `spark.graft.fastHash`. */
  def minHashIndex(df: DataFrame, groupCol: String, textCol: String,
      slots: Int = 12): DataFrame = {
    val fast = TextFns.fastHash(df.sparkSession)
    val mergeSig = udaf(new graft.functions.MinHashAgg(slots))
    df
      // a NULL group has no index identity (and null keys would split
      // into per-side rows under the merge's full-outer join)
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("group_key"),
        TextFns.hashedShingles(col(textCol), 3, fast).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("group_key"), TextFns.minHash(col("hs"), slots, fast).as("sig"))
      .groupBy(col("group_key"))
      .agg(mergeSig(col("sig")).as("sig"))
      // the signature is meaningless without its hash family: persist it
      // with the index so a later merge can refuse a cross-family fold
      .withColumn("family", lit(if (fast) "xxhash64" else "md5"))
  }

  /** Fold one index into another (stored index + new batch's index):
    * elementwise min per group; groups on one side only pass through.
    * `mergeMinHashIndexes(minHashIndex(a), minHashIndex(b))` equals
    * `minHashIndex(a union b)` exactly — min-of-mins — which is what
    * makes incremental maintenance O(|batch| + |index|), no rescan.
    * Merging indexes built under DIFFERENT hash families (one md5, one
    * xxhash64 — e.g. a stored index meeting a fastHash session) or with
    * DIFFERENT slot widths (a 12-slot index meeting a 16-slot batch —
    * `zip_with` would null-pad the shorter side and `least` would
    * ignore the nulls, yielding a mixed-width garbage signature) would
    * silently corrupt the index; both are rejected at execution via
    * `raise_error` — mirroring the query path's
    * `NearDup.guardedIndexSigs` width guard. */
  def mergeMinHashIndexes(stored: DataFrame, batch: DataFrame): DataFrame = {
    val mismatch = col("fam_a").isNotNull && col("fam_b").isNotNull &&
      col("fam_a") =!= col("fam_b")
    val badWidth = col("sig_a").isNotNull && col("sig_b").isNotNull &&
      size(col("sig_a")) =!= size(col("sig_b"))
    stored.select(col("group_key"), col("sig").as("sig_a"), col("family").as("fam_a"))
      .join(batch.select(col("group_key"), col("sig").as("sig_b"), col("family").as("fam_b")),
        Seq("group_key"), "full_outer")
      .select(col("group_key"),
        when(mismatch,
          raise_error(format_string(
            "minhash index hash-family mismatch: %s vs %s — rebuild one side",
            col("fam_a"), col("fam_b"))).cast(ArrayType(LongType)))
          .when(badWidth,
            raise_error(format_string(
              "minhash index signature-width mismatch: %d vs %d slots — rebuild one side",
              size(col("sig_a")), size(col("sig_b")))).cast(ArrayType(LongType)))
          .otherwise(coalesce(
            zip_with(col("sig_a"), col("sig_b"), (a, b) => least(a, b)),
            col("sig_a"), col("sig_b"))).as("sig"),
        coalesce(col("fam_a"), col("fam_b")).as("family"))
  }

  /** Which stored groups is each NEW document a near-duplicate of? The
    * arrival-time incremental dedup query against a [[minHashIndex]] —
    * banded candidate join + signature-agreement verify, O(|batch| +
    * |index|), no corpus rescan. Honors `spark.graft.fastHash` and
    * raises on a hash-family mismatch with the stored index. */
  def nearDupsAgainstIndex(batch: DataFrame, idCol: String, textCol: String,
      index: DataFrame, slots: Int = 12, bands: Int = 4,
      threshold: Double = 0.5): DataFrame =
    graft.operators.NearDup.nearDupsAgainstIndex(
      batch, idCol, textCol, index, slots = slots, bands = bands,
      threshold = threshold)

  // ---------------- similarity search ----------------

  /** Exact cosine top-k neighbors for each row of `queries` against
    * `corpus` (both need `idCol` + a float-array `vecCol`). */
  def knn(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    init(spark)
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val n = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    q.join(n, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        call_function("cosine_sim", col("qv"), col("nv")).as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  // ---------------- text analysis ----------------

  /** Per-row token count, char count, stopword ratio. */
  def textStats(df: DataFrame, textCol: String,
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")): DataFrame = {
    val toks = TextFns.tokens(col(textCol))
    df.withColumn("n_tokens", size(toks))
      .withColumn("n_chars", length(col(textCol)))
      .withColumn("stopword_ratio",
        size(filter(toks, t => t.isin(stopwords: _*))).cast(DoubleType)
          / size(toks))
  }

  /** Deterministic p-percent sample keyed on a stable expression. Honors
    * `spark.graft.fastHash` (xxhash64 family — cheaper, equally
    * deterministic, different members than the portable md5 family). */
  def hashSample(df: DataFrame, keyCol: Column, percent: Int): DataFrame = {
    val h =
      if (TextFns.fastHash(df.sparkSession)) TextFns.xxhash60(keyCol.cast(StringType))
      else TextFns.hash60(keyCol.cast(StringType))
    df.filter(h % 100 < percent)
  }

  /** Near-duplicate REMOVAL: the corpus minus every doc that collides
    * with a lower-id near-duplicate — the end-to-end "give me the
    * deduped corpus" operator (q63's dedup stage as a facade method).
    * For each near-dup pair (d1 < d2) the higher id drops, so one
    * canonical member per pairwise-connected group survives (the
    * lowest-id chain head; full transitive closure would need iterative
    * connected components — at LSH thresholds ≥ 0.8 clusters are
    * near-cliques and the difference is marginal). The anti-join side is
    * the duplicate-id set; AQE broadcasts it when small. */
  def removeNearDups(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, minHashes: Int = 12, bands: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val dupIds = nearDupPairs(df, idCol, textCol, shingleSize, minHashes,
      bands, threshold)
      .select(col("d2").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }

  /** Transitive near-duplicate removal: EXACTLY one canonical survivor
    * (the minimum id) per connected component of the near-dup pair
    * graph. This is the closure [[removeNearDups]] approximates — a
    * component {1,2,3} with edges (1,3),(2,3) keeps both 1 and 2 there
    * (2 never collides with a lower id) but only 1 here. Costs the
    * pairwise pass plus O(component diameter) small label-propagation
    * rounds (see [[graft.operators.ConnectedComponents]]); at near-dup
    * thresholds components are near-cliques, so 2–4 rounds.
    *
    * NOT lazy, unlike the rest of the facade: the propagation loop runs
    * Spark jobs AT CALL TIME (the pair pipeline plus one job per round)
    * to find the fixpoint; the returned frame is then the cheap
    * anti-join. Call it when inputs are final, not while assembling a
    * plan. */
  def removeNearDupsTransitive(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, minHashes: Int = 12, bands: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val pairs = nearDupPairs(df, idCol, textCol, shingleSize, minHashes,
      bands, threshold)
    val drop = graft.operators.ConnectedComponents.run(pairs, "d1", "d2")
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Connected components of an edge list (e.g. the near-dup pair
    * graph): (`id`, `component` = min reachable id). `alternating =
    * false` runs min-label propagation — the cheap choice for near-dup
    * clusters, whose near-clique components converge in 2–4 rounds;
    * `alternating = true` runs large-star/small-star (Kiveris et al.,
    * SoCC '14) — O(log n) rounds regardless of component diameter, for
    * unknown or chain-like graph shapes. Both reach the same unique
    * fixpoint. NOT lazy: the loop runs jobs at call time. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      alternating: Boolean = false): DataFrame =
    if (alternating)
      graft.operators.ConnectedComponents.runAlternating(edges, srcCol, dstCol)
    else graft.operators.ConnectedComponents.run(edges, srcCol, dstCol)

  /** COLLAPSED perceptual near-dup surface over 60-bit fingerprints
    * (the `dHash60` / `simHashW` family): `(groups, edges)` where
    * `groups` has one row per DISTINCT hash — (`h`, `rep` = minimum
    * member id, `cnt` = member count) — and `edges` has the near-dup
    * relations BETWEEN distinct hashes (`ha`, `hb`, `hamming_dist` ≤ 3,
    * `ha` < `hb`, via the exact 4×15-bit pigeonhole band equi-join).
    *
    * This is the surface a 100 TB pipeline consumes (q159's composed
    * media dedup does): output is O(groups + edges) — a million exact
    * copies of one meme are ONE group row and at most a handful of
    * edges, never a quadratic pair set. For transitive clustering, map
    * `edges` through `groups` to rep-level id pairs, run
    * [[connectedComponents]] on those, then join membership back as
    * doc→rep stars. The fully-expanded pairwise form (every DOC pair
    * at Hamming ≤ 3) exists in the query suite only to honor the
    * q155–q157 oracle contract — it is intentionally not part of this
    * facade. Input: one row per document, `idCol` + `hashCol` (a
    * 60-bit long, e.g. from [[graft.multimodal.Media]]'s per-modality
    * fingerprint entry points). */
  def perceptualNearDupGroups(
      hashes: DataFrame, idCol: String, hashCol: String): (DataFrame, DataFrame) =
    graft.queries.PipelineOps.hammingBandedGroups(
      hashes.select(col(idCol).as("doc_id"), col(hashCol).as("h")))

  // ---------------- curation ----------------

  /** Stratified sample with exact per-stratum quotas (adds an `rk`
    * column, 1..quota within each stratum), deterministic by hash rank.
    * Delegates to [[graft.operators.Curation]] — the implementation the
    * oracle-verified q70 runs. Honors `spark.graft.fastHash`. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      quota: Int): DataFrame =
    graft.operators.Curation.stratifiedSample(
      df, stratumCol, idCol, quota, TextFns.fastHash(df.sparkSession))

  /** Weighted deterministic Bernoulli sample: keep each row with its own
    * probability, given as an integer parts-per-million column —
    * quality-weighted subsampling (q86's implementation; [[hashSample]]
    * is the constant-rate case, [[stratifiedSample]] the exact-quota
    * one). Honors `spark.graft.fastHash`. */
  def weightedSample(df: DataFrame, idCol: String, weightPpmCol: String): DataFrame =
    graft.operators.Curation.weightedSample(
      df, idCol, weightPpmCol, TextFns.fastHash(df.sparkSession))

  /** Top-k tokens per group by corpus frequency (vocabulary pass; q71's
    * implementation). */
  def vocabulary(df: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame =
    graft.operators.Curation.vocabTopK(df, groupCol, textCol, k)

  /** Edit-distance-1 fuzzy pairs over a short string column (q123's
    * implementation): deletion-neighborhood equi-join + Levenshtein
    * verify — record-linkage without a quadratic stage. */
  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String): DataFrame =
    graft.operators.FuzzyJoin.editDistance1Pairs(df, idCol, strCol)

  /** Corpus-wide exact paragraph dedup with reassembly (q121's
    * implementation): duplicated segments keep their first corpus
    * occurrence, documents rebuild from survivors in order. */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
      delim: String = "\n"): DataFrame =
    graft.operators.Curation.dedupParagraphs(df, idCol, textCol, delim)

  /** Inverted index: term → document frequency, corpus term frequency,
    * and a bounded ascending posting list (q115's implementation; cap
    * bounds the per-term output regardless of Zipf skew). */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      postingsCap: Int = 8): DataFrame =
    graft.operators.InvertedIndex.build(df, idCol, textCol, postingsCap)

  /** Documents sharing ≥ `minOverlap` distinct shingles with the probe
    * set (benchmark-contamination check; q72's implementation — probe
    * side broadcasts, corpus side never shuffles in full). Honors
    * `spark.graft.fastHash`. */
  def contamination(corpus: DataFrame, probes: DataFrame, idCol: String,
      textCol: String, minOverlap: Int = 5): DataFrame =
    graft.operators.Curation.contamination(
      corpus, probes, idCol, textCol,
      minOverlap = minOverlap, fast = TextFns.fastHash(corpus.sparkSession))

  /** Gopher-style repetition/diversity flags (q74's implementation). */
  def repetitionFlags(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.operators.Curation.repetitionFlags(df, idCol, textCol)

  /** GPT-style sequence packing (q75's implementation): per-stratum
    * hash-ordered layout, each document's training-sequence id and
    * offset under `budgetTokens`. Honors `spark.graft.fastHash`. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      stratumCol: String, budgetTokens: Int): DataFrame =
    graft.operators.Curation.packSequences(df, idCol, textCol, stratumCol,
      budgetTokens, TextFns.fastHash(df.sparkSession))

  /** Weighted corpus mixing (q76's implementation): source-weight map →
    * deterministic epoch-carrying repetition, no shuffle. Honors
    * `spark.graft.fastHash`. */
  def mixCorpus(df: DataFrame, idCol: String, srcCol: String,
      weights: Map[String, Double]): DataFrame =
    graft.operators.Curation.mixCorpus(df, idCol, srcCol, weights,
      TextFns.fastHash(df.sparkSession))

  /** Top-k adjacent token pairs by corpus frequency — one BPE training
    * round's merge-candidate count pass (q89's implementation). */
  def bigramTopK(df: DataFrame, textCol: String, k: Int): DataFrame =
    graft.operators.Curation.bigramTopK(df, textCol, k)

  /** Sliding-window chunking with overlap (q90's implementation): RAG
    * indexing / long-context splits with engine-independent integer
    * boundaries. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, strideTokens: Int): DataFrame =
    graft.operators.Curation.chunkDocuments(
      df, idCol, textCol, chunkTokens, strideTokens)

  /** Exact dedup after lowercase/strip/collapse normalization (q91's
    * implementation) — catches trivially-reformatted copies
    * [[dedupExact]] misses. */
  def normalizedDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.operators.Curation.normalizedDedup(df, idCol, textCol)

  /** Deterministic seeded shuffle into training shards (q92's
    * implementation): (seed, id) fully determines (shard, pos). Honors
    * `spark.graft.fastHash`. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
      seed: Long): DataFrame =
    graft.operators.Curation.shuffleShards(df, idCol, nShards, seed,
      TextFns.fastHash(df.sparkSession))

  // ---------------- vector index training ----------------

  /** Train IVF centroids with deterministic distributed Lloyd's k-means
    * (see [[graft.operators.KMeans]]): per-iteration cost is one corpus
    * scan whose shuffle carries k × dims rows. The model then drives
    * [[ivfAssign]] (cell-partitioned storage) and [[ivfSearch]]. */
  def kmeansFit(df: DataFrame, idCol: String, vecCol: String, dims: Int,
      k: Int, iters: Int): graft.operators.KMeans.Model =
    graft.operators.KMeans.fit(df, idCol, vecCol, dims, k, iters)

  /** Tag rows with their trained IVF cell — write the corpus partitioned
    * by this column and probes prune to nprobe/k of the files. */
  def ivfAssign(df: DataFrame, vecCol: String,
      model: graft.operators.KMeans.Model): DataFrame =
    graft.operators.KMeans.ivfAssign(df, vecCol, model)

  /** Probe-pruned cosine top-k under a trained model; nprobe = model.k
    * degrades exactly to [[knn]] (each corpus row lives in one cell). */
  def ivfSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, model: graft.operators.KMeans.Model,
      nprobe: Int, topK: Int): DataFrame =
    graft.operators.KMeans.ivfSearch(
      corpus, queries, idCol, vecCol, model, nprobe, topK)

  /** SemDeDup (Abbas et al. 2023): cluster-scoped semantic dedup —
    * remove every vector cosine-`tau`-close to a lower-id vector in the
    * same cell. Compose with [[kmeansFit]]+[[ivfAssign]] for the cell
    * column, or pass any coarse assignment; see
    * [[graft.operators.SemDedup.semanticDedup]]. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      cellCol: String, tau: Double): DataFrame =
    graft.operators.SemDedup.semanticDedup(df, idCol, vecCol, cellCol, tau)

  // ---------------- quality filtering & canonicalization ----------------

  /** Gopher-style hard-filter rule suite with per-rule audit flags;
    * see [[graft.operators.Curation.gopherFilters]]. */
  def gopherFilters(df: DataFrame, idCol: String, textCol: String,
      carryCols: Seq[String] = Nil): DataFrame =
    graft.operators.Curation.gopherFilters(df, idCol, textCol, carryCols = carryCols)

  /** CCNet-style cross-document boilerplate segment removal;
    * see [[graft.operators.Curation.boilerplateRemoval]]. */
  def boilerplateRemoval(df: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 10, minDocs: Int = 3): DataFrame =
    graft.operators.Curation.boilerplateRemoval(df, idCol, textCol, segTokens, minDocs)

  /** Bag-of-words dedup keeping the highest-`scoreCol` copy per content
    * group; see [[graft.operators.Curation.dedupKeepBest]]. */
  def dedupKeepBest(df: DataFrame, idCol: String, textCol: String,
      scoreCol: String): DataFrame =
    graft.operators.Curation.dedupKeepBest(df, idCol, textCol, scoreCol)

  /** α=0.5 temperature mixture reweighting per source;
    * see [[graft.operators.Curation.temperatureWeights]]. */
  def temperatureWeights(df: DataFrame, srcCol: String): DataFrame =
    graft.operators.Curation.temperatureWeights(df, srcCol)

  /** Leakage-proof deterministic train/val/test assignment;
    * see [[graft.operators.Curation.trainValTestSplit]]. */
  def trainValTestSplit(df: DataFrame, idCol: String,
      ppmTrain: Int, ppmVal: Int, seed: Long = 0L): DataFrame =
    graft.operators.Curation.trainValTestSplit(df, idCol, ppmTrain, ppmVal, seed)

  /** Corpus bigram LM for perplexity-style quality filtering: fit on
    * trusted text, then [[scoreLm]] candidates;
    * see [[graft.operators.NgramLm]]. */
  def fitLm(trusted: DataFrame, textCol: String): graft.operators.NgramLm.Model =
    graft.operators.NgramLm.fit(trusted, textCol)

  /** Mean add-one bigram log-probability per document under a fitted
    * LM (exp(−avg_logprob) = perplexity). */
  def scoreLm(docs: DataFrame, idCol: String, textCol: String,
      model: graft.operators.NgramLm.Model): DataFrame =
    graft.operators.NgramLm.score(docs, idCol, textCol, model)

  // ---------------- tokenizer training ----------------

  /** Distributed BPE training (one corpus pass + vocabulary-sized merge
    * rounds, bit-reproducible); see [[graft.operators.BpeTrainer]]. */
  def bpeFit(docs: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 2L): graft.operators.BpeTrainer.BpeModel =
    graft.operators.BpeTrainer.fit(docs, textCol, numMerges, minFreq)

  /** Rank-greedy BPE tokenization under a trained model. */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      model: graft.operators.BpeTrainer.BpeModel): DataFrame =
    graft.operators.BpeTrainer.encode(docs, idCol, textCol, model)

  // ---------------- vector compression ----------------

  /** Product-quantization training (fused one-scan-per-iteration across
    * subspaces); see [[graft.operators.ProductQuantizer]]. */
  def pqFit(df: DataFrame, idCol: String, vecCol: String, dims: Int,
      m: Int, k: Int, iters: Int): graft.operators.ProductQuantizer.PQModel =
    graft.operators.ProductQuantizer.fit(df, idCol, vecCol, dims, m, k, iters)

  /** Encode vectors as m-code arrays under a trained PQ model. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      pq: graft.operators.ProductQuantizer.PQModel): DataFrame =
    graft.operators.ProductQuantizer.encode(df, idCol, vecCol, pq)

  /** Asymmetric-distance top-k over PQ codes (the compressed-scan ANN). */
  def pqSearch(codes: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, pq: graft.operators.ProductQuantizer.PQModel,
      topK: Int): DataFrame =
    graft.operators.ProductQuantizer.adcSearch(codes, queries, idCol, vecCol, pq, topK)

  // ---------------- domain selection & quality ----------------

  /** Fit the DSIR / quality-classifier ratio model (hashed token
    * buckets, add-one-smoothed class ratio — Xie et al. '23 / the
    * fastText-supervised shape); `bigrams = true` hashes word pairs.
    * Returns the 4096-double weight array — the MODEL, KiB-sized.
    * See [[graft.operators.TokenClassifier]]. */
  def fitTokenRatio(labeled: DataFrame, textCol: String, targetCol: String,
      bigrams: Boolean = false): Array[Double] = {
    val feats =
      if (bigrams) graft.operators.TokenClassifier.bigramBuckets(col(textCol))
      else graft.operators.TokenClassifier.unigramBuckets(col(textCol))
    graft.operators.TokenClassifier.fitRatio(
      labeled.select(col(targetCol).as("t"), feats.as("f")), "f", "t")
  }

  /** Score documents under a fitted ratio model: `scoreCol` is the
    * linear-domain mean ratio (>1 ⇒ target-typical; the oracle-portable
    * form), `logScoreCol` the paper-faithful log-likelihood ratio. */
  def tokenRatioScore(docs: DataFrame, textCol: String,
      weights: Array[Double], scoreCol: String = "score",
      logScoreCol: String = "log_score",
      bigrams: Boolean = false): DataFrame = {
    val feats =
      if (bigrams) graft.operators.TokenClassifier.bigramBuckets(col(textCol))
      else graft.operators.TokenClassifier.unigramBuckets(col(textCol))
    docs
      .withColumn(scoreCol,
        graft.operators.TokenClassifier.meanRatioScore(feats, weights))
      .withColumn(logScoreCol,
        graft.operators.TokenClassifier.logScore(feats, weights))
  }

  /** DSIR importance resampling: keep rows Bernoulli-∝ exp(logScore),
    * reproducible hash in place of a RNG. */
  def importanceResample(docs: DataFrame, idCol: String,
      logScoreCol: String, scale: Double): DataFrame =
    graft.operators.TokenClassifier.resample(docs, idCol, logScoreCol, scale)

  /** Cap each source/domain at `k` best documents (anti-dominance);
    * see [[graft.operators.Curation.capPerSource]]. */
  def capPerSource(df: DataFrame, idCol: String, srcCol: String,
      scoreCol: String, k: Int): DataFrame =
    graft.operators.Curation.capPerSource(df, idCol, srcCol, scoreCol, k)

  // ---------------- temporal ----------------

  /** Point-in-time enrichment; see [[graft.operators.AsOfJoin]]. */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame =
    AsOfJoin.asofJoin(left, right, key, leftTime, rightTime, payload)

  /** Watermarked STREAM-STREAM interval join (impression→click
    * attribution); see [[graft.streaming.EventStreams.joinWithin]]. */
  def joinWithin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, within: String,
      watermarkDelay: String = "10 minutes",
      joinType: String = "inner"): DataFrame =
    graft.streaming.EventStreams.joinWithin(
      left, right, key, leftTs, rightTs, within, watermarkDelay, joinType)

  // ---------------- medallion & tables ----------------

  /** Bronze→silver→gold helpers re-exported. */
  val medallion: Medallion.type = Medallion

  /** Open the log-structured transactional table at `path` (append /
    * upsert / range delete / schema widening / time travel / compact /
    * zorder / streaming source+sink);
    * see [[graft.medallion.GraftTable]]. */
  def table(path: String): graft.medallion.GraftTable =
    new graft.medallion.GraftTable(path)

  /** Register `warehouse` as SQL catalog `name`, making every graft
    * table under it a full SQL-DML citizen — `CREATE TABLE` / CTAS /
    * `INSERT INTO` / `INSERT OVERWRITE` / `UPDATE` / `MERGE INTO` /
    * `DELETE` / `ALTER TABLE ADD COLUMNS` / `VERSION AS OF` time
    * travel / `TRUNCATE` / `DROP`, plus the `_commit_version` metadata
    * column; see [[graft.streaming.GraftCatalog]].
    *
    * Re-registering the SAME name with a DIFFERENT warehouse fails
    * loudly: Spark's CatalogManager caches catalog instances per
    * session at first use and never re-reads the conf, so the silent
    * alternative would keep reading AND WRITING the old warehouse.
    * Use a fresh catalog name per warehouse within a session. */
  def registerCatalog(spark: SparkSession, name: String, warehouse: String): Unit = {
    val prev = spark.conf.getOption(s"spark.sql.catalog.$name.warehouse")
    require(prev.forall(_ == warehouse),
      s"catalog '$name' is already registered at warehouse ${prev.get} — " +
        "Spark caches catalog instances per session, so re-pointing the " +
        "conf would silently keep using the old warehouse; register a " +
        "different catalog name instead")
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.streaming.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", warehouse)
  }
}
