package graft.operators

import graft.functions.TextFns._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** Deterministic WEIGHTED Bernoulli sample: keep a row iff
    * hash60(id) mod 10⁶ < its weight in parts-per-million. Per-row
    * probabilities (quality-weighted subsampling — keep 90% of high-
    * quality documents, 5% of low) where [[stratifiedSample]] does exact
    * quotas and a fixed-rate hash sample is the constant-ppm case.
    * Selection is pure integer arithmetic on a portable hash: the same
    * id keeps or drops identically across runs, engines, and cluster
    * layouts, so reruns and backfills are reproducible. Narrow filter —
    * scan-parallel, no shuffle. */
  def weightedSample(df: DataFrame, idCol: String, weightPpmCol: String,
      fast: Boolean = false): DataFrame = {
    val h = if (fast) xxhash60(col(idCol).cast("string"))
            else hash60(col(idCol).cast("string"))
    df.filter(h % 1000000L < col(weightPpmCol).cast(LongType))
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

  /** GPT-style sequence packing (concat-and-chunk): lay documents out in
    * a deterministic per-stratum order (portable hash rank — a stable
    * shuffle, so adjacent source documents don't land in one training
    * sequence) and assign each a starting token offset in the stratum's
    * concatenated token stream; `seq_id` = which fixed-`budget` training
    * sequence the document STARTS in, `seq_offset` its position inside
    * it (documents may straddle a boundary, exactly as pretraining
    * packing does before the loss mask).
    *
    * Scale shape: one window per stratum — strata (source shards at
    * 100 TB) pack in parallel, and the running sum is a streaming
    * window frame (no buffering of the partition). All-integer math. */
  def packSequences(
      df: DataFrame, idCol: String, textCol: String, stratumCol: String,
      budgetTokens: Int, fast: Boolean = false): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    val h = if (fast) xxhash60(col(idCol).cast("string"))
            else hash60(col(idCol).cast("string"))
    val w = Window.partitionBy(col(stratumCol)).orderBy(h, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(stratumCol),
        size(tokens(col(textCol))).cast(LongType).as("n_toks"))
      .withColumn("start_offset", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .select(col(idCol), col(stratumCol), col("n_toks"),
        expr(s"start_offset div $budgetTokens").as("seq_id"),
        (col("start_offset") % budgetTokens).as("seq_offset"))
  }

  /** Weighted corpus mixing with deterministic epoch-based repetition:
    * weight 2.5 on a source = every document twice, plus a third copy
    * for a reproducible hash-chosen half. Weights are snapped to parts-
    * per-million on the driver (float thresholds never reach the data);
    * each emitted copy carries its `epoch` ordinal so downstream packing
    * / shuffling can distinguish repeats. Sources absent from `weights`
    * are excluded — the map IS the mixture recipe.
    *
    * Scale shape: narrow explode bounded by ceil(max weight) with no
    * shuffle at all — the mix composes with [[packSequences]]'s window
    * downstream. The fractional-copy test hashes (id, epoch), so the
    * kept half differs per epoch, like independent sampling rounds. */
  def mixCorpus(
      df: DataFrame, idCol: String, srcCol: String,
      weights: Map[String, Double], fast: Boolean = false): DataFrame = {
    require(weights.nonEmpty, "mixCorpus needs at least one source weight")
    val ppmOf = weights.map { case (k, v) =>
      val ppm = math.round(v * 1e6)
      require(ppm >= 1 && ppm <= 100000000L,
        s"weight for '$k' out of range (1e-6 .. 100): $v")
      k -> ppm
    }
    val ppm = ppmOf.foldLeft(lit(null).cast(LongType)) { case (acc, (k, p)) =>
      when(col(srcCol) === k, lit(p)).otherwise(acc)
    }
    val copyKey = concat(col(idCol).cast("string"), lit(":"),
      col("epoch").cast("string"))
    val copyHash = if (fast) xxhash60(copyKey) else hash60(copyKey)
    df.withColumn("ppm", ppm).filter(col("ppm").isNotNull)
      .withColumn("epoch",
        explode(sequence(lit(0L), expr("(ppm + 999999) div 1000000") - 1)))
      .filter(col("epoch") < expr("ppm div 1000000")
        || (copyHash % 1000000L) < col("ppm") % 1000000L)
      .select(col(idCol), col(srcCol), col("epoch"))
  }

  /** Top-k adjacent token pairs by corpus frequency — the merge-candidate
    * statistic at the heart of BPE tokenizer training (each merge round
    * picks the most frequent pair; this is one round's count pass over
    * the corpus). Same two-phase shape as [[vocabTopK]]: the pair explode
    * (fan-out ≈ tokens per doc) is absorbed by map-side partial counts,
    * so the one shuffle carries a row per DISTINCT pair — pair-vocabulary
    * sized, not corpus sized — then a global rank window over that small
    * aggregate. Returns (pair, n_occurrences, rk). */
  def bigramTopK(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val w = Window.orderBy(col("n_occurrences").desc, col("pair"))
    df.select(tokens(col(textCol)).as("toks"))
      // sequence(1, size-1) DESCENDS when size < 2 (see wordShingles) and
      // toks[out-of-range] nulls the concat — guard, don't clamp
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        // i-th pair = 0-based tokens i-1,i joined by one space
        "transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i]))"))
        .as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n_occurrences"))
      // global top-k via TakeOrderedAndProject (total order: count desc,
      // pair) — never a one-partition window over the full pair
      // vocabulary; the rank window below sees only k rows
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(k)
      .withColumn("rk", row_number().over(w))
  }

  /** Sliding-window document chunking with overlap — the retrieval-side
    * sibling of [[packSequences]] (RAG indexing, long-document training
    * with context overlap). Chunk starts advance by `strideTokens`; the
    * LAST chunk is the first one whose window reaches the document end
    * (no degenerate tail chunks). Every document yields at least one
    * chunk. All-integer start/length math, so chunk boundaries are
    * engine- and layout-independent; narrow explode bounded by
    * n_toks/stride with no shuffle. Returns one row per chunk:
    * (idCol, chunk_id, chunk_start, chunk_len, chunk_text). */
  def chunkDocuments(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens > 0 && strideTokens > 0 && strideTokens <= chunkTokens,
      s"need 0 < stride <= chunk: chunk=$chunkTokens stride=$strideTokens")
    df.select(col(idCol), tokens(col(textCol)).as("toks"))
      .withColumn("n_toks", size(col("toks")).cast(LongType))
      // last chunk index: ceil((n-chunk)/stride) with non-negative
      // numerator (integer div truncates toward zero — keep it floor by
      // construction), 0 when the document fits in one chunk
      .withColumn("last_k",
        when(col("n_toks") <= chunkTokens, lit(0L))
          .otherwise(expr(s"(n_toks - $chunkTokens + $strideTokens - 1) div $strideTokens")))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("last_k"))))
      .select(col(idCol), col("chunk_id"),
        (col("chunk_id") * strideTokens).as("chunk_start"),
        least(lit(chunkTokens.toLong), col("n_toks") - col("chunk_id") * strideTokens)
          .as("chunk_len"),
        concat_ws(" ", expr(
          s"slice(toks, chunk_id * $strideTokens + 1, " +
            s"least($chunkTokens, n_toks - chunk_id * $strideTokens))"))
          .as("chunk_text"))
  }

  /** Exact dedup AFTER text normalization (lowercase, strip everything
    * outside [a-z0-9 ], collapse runs of spaces, trim) — the
    * RefinedWeb-style canonicalization that catches trivially-reformatted
    * copies plain [[graft.queries.TextOps]] exact dedup misses. Character
    * classes only, so Java regex and RE2 agree. Keeps the lowest id per
    * normalized form; returns survivors as (idCol, n_variants). One
    * uniform-key shuffle on the normalized hash — same scale shape as
    * exact dedup. */
  def normalizedDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", ""), " +", " "))
    df.select(col(idCol), md5(norm).as("_nh"))
      .groupBy(col("_nh"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_variants"))
      .drop("_nh")
  }

  /** Bag-of-words dedup keeping the BEST copy per group — the
    * cross-source canonicalization stage: when the same content arrives
    * from several crawls/sources (reordered, repeated, re-chunked), keep
    * exactly one, and keep the HIGHEST-QUALITY one rather than an
    * arbitrary first (min-id dedup throws away quality information the
    * pipeline already paid to compute). The content key is the md5 of
    * the sorted DISTINCT token set, so token order and repetition do not
    * split a group — coarser than [[normalizedDedup]]'s normalized-text
    * key, the right granularity for shuffled/re-chunked copies.
    *
    * Winner per group: max `scoreCol` (must be numeric), ties to the
    * LOWEST id — deterministic and engine-portable, for ANY orderable
    * id type (string/UUID ids included). Returns one row per group:
    * winner id, its score, and `n_variants`.
    *
    * Scale shape: the key is a per-row projection (sort of a ≤vocab-size
    * distinct-token array, then one md5 — scan-parallel); the single
    * shuffle is the md5-keyed groupBy carrying (key, id, score) — never
    * the text — with `max_by`/count partially aggregated map-side.
    * Uniform hash keys: no skew at any corpus size. */
  def dedupKeepBest(
      df: DataFrame, idCol: String, textCol: String, scoreCol: String): DataFrame = {
    val key = md5(concat_ws(" ", array_sort(array_distinct(tokens(col(textCol))))))
    df.select(col(idCol), col(scoreCol), key.as("_k"))
      .groupBy(col("_k"))
      .agg(
        // struct ordering = (-score asc, id asc): min picks highest
        // score, then lowest id. Negating the (numeric) SCORE rather
        // than the id keeps the tie-break portable to string/UUID id
        // columns — negate(id) only analyzes for numeric ids
        min_by(struct(col(idCol), col(scoreCol)),
          struct(negate(col(scoreCol)), col(idCol))).as("_w"),
        count(lit(1)).as("n_variants"))
      .select(col(s"_w.$idCol"), col(s"_w.$scoreCol"), col("n_variants"))
  }

  /** Per-source frequency cap — the CCNet/RefinedWeb anti-dominance
    * stage: no single domain/crawl source may contribute more than `k`
    * documents, keeping the best by (`scoreCol` desc, `idCol` asc ties)
    * so the cut is deterministic. Emits survivors with their
    * within-source `src_rank` plus the source's pre-cap `src_total`
    * (the audit number: how dominant the source WAS). Scale: the
    * rank-then-filter shape compiles to a WindowGroupLimit — each map
    * task forwards at most k rows per source BEFORE the exchange, so a
    * mega-domain holding half a 100 TB crawl ships k rows per input
    * partition, never its whole row set. The pre-cap totals
    * DELIBERATELY do not ride the rank window (a full-frame count in
    * the same Window node would make the group limit unsound, so Spark
    * would drop it): they come from a separate partial-aggregated
    * groupBy carrying (source, count) pairs only, joined onto the
    * k-per-source survivor set. */
  def capPerSource(
      df: DataFrame, idCol: String, srcCol: String, scoreCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"capPerSource: k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val kept = df
      .withColumn("src_rank", row_number().over(w))
      .filter(col("src_rank") <= k)
    val totals = df.groupBy(col(srcCol))
      .agg(count(lit(1)).as("src_total"))
    kept.join(totals, Seq(srcCol))
  }

  /** Deterministic train/validation/test assignment — the holdout stage
    * every training pipeline runs before anything else touches the
    * data. Pure integer arithmetic on the portable id hash (salted with
    * `seed` so INDEPENDENT splits of the same corpus don't correlate):
    * ppm thresholds partition [0, 10⁶) into train/val/test bands, so
    * membership is bit-identical across engines, runs, and cluster
    * layouts, and a document can NEVER migrate between splits on a
    * backfill — the leakage property that matters. Narrow projection:
    * scan-parallel, zero shuffles. */
  def trainValTestSplit(
      df: DataFrame, idCol: String, ppmTrain: Int, ppmVal: Int,
      seed: Long = 0L, fast: Boolean = false): DataFrame = {
    require(ppmTrain >= 0 && ppmVal >= 0 && ppmTrain + ppmVal <= 1000000,
      s"ppm bands must fit in [0, 1e6]: train=$ppmTrain val=$ppmVal")
    val keyed = concat(lit(s"split:$seed:"), col(idCol).cast("string"))
    val h = (if (fast) xxhash60(keyed) else hash60(keyed)) % 1000000L
    df.withColumn("split",
      when(h < ppmTrain, "train")
        .when(h < ppmTrain + ppmVal, "val")
        .otherwise("test"))
  }

  /** Deterministic global shuffle into training shards — the final
    * layout stage of a pretraining pipeline: break curation order (which
    * correlates neighbors by source/crawl) with a seeded portable hash,
    * then assign each document a shard and its position within it.
    * Reproducible: (seed, id) fully determines (shard, pos) — reruns,
    * backfills, and a different cluster layout produce the identical
    * epoch order. One shuffle keyed by shard (uniform by construction —
    * hash-derived), position via a per-shard rank window ordered by the
    * SECOND hash so within-shard order is also seed-controlled. */
  def shuffleShards(
      df: DataFrame, idCol: String, nShards: Int, seed: Long,
      fast: Boolean = false): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val keyed = concat(lit(s"$seed:"), col(idCol).cast("string"))
    val h = if (fast) xxhash60(keyed) else hash60(keyed)
    val w = Window.partitionBy(col("shard")).orderBy(col("_h"), col(idCol))
    df.select(col(idCol), h.as("_h"))
      .withColumn("shard", (col("_h") % nShards).cast(LongType))
      .withColumn("pos", row_number().over(w).cast(LongType))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Gopher-style HARD-FILTER rule suite (the pass/fail sibling of the
    * continuous scores in [[repetitionFlags]] / TextOps quality scoring):
    * per document, one flag per rule plus the combined `keep` verdict —
    * kept as separate columns so a pipeline can audit WHICH rule killed
    * a document (the per-rule removal tally is the first thing a
    * curation report shows).
    *
    * Rules (each a published pretraining heuristic):
    *   - word count within [minToks, maxToks]
    *   - mean token length within [minMeanLen, maxMeanLen]
    *   - at least `minStopwords` DISTINCT stopwords present
    *   - no run of identical adjacent tokens longer than `maxRun`
    *
    * Scale shape: everything is a per-row fold over the token array
    * (`aggregate` HOFs — codegen'd, no UDF), so the whole suite is one
    * narrow scan-parallel projection: zero shuffles, zero joins at any
    * corpus size. The adjacent-run rule in particular is deliberately a
    * single left-to-right fold rather than the explode + gaps-and-islands
    * window form (two corpus-sized shuffles) the same statistic costs in
    * plain SQL. */
  def gopherFilters(
      df: DataFrame, idCol: String, textCol: String,
      minToks: Int = 50, maxToks: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minStopwords: Int = 2, maxRun: Int = 2,
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in"),
      carryCols: Seq[String] = Nil): DataFrame = {
    require(stopwords.nonEmpty, "gopherFilters needs a stopword list")
    val flag = (c: org.apache.spark.sql.Column) => when(c, 1).otherwise(0)
    // carryCols ride the projection so downstream per-source/per-shard
    // rollups need no corpus-sized join back to the input
    df.select(col(idCol) +: carryCols.map(col) :+ tokens(col(textCol)).as("toks"): _*)
      .withColumn("n_toks", size(col("toks")).cast(LongType))
      // int/int → double division: bit-deterministic across engines
      .withColumn("mean_tok_len",
        expr("aggregate(toks, 0L, (a, t) -> a + length(t))").cast("double")
          / col("n_toks"))
      .withColumn("n_stopwords",
        size(array_intersect(array_distinct(col("toks")),
          array(stopwords.map(lit): _*))).cast(LongType))
      // longest run of identical adjacent tokens: strict left-to-right
      // fold carrying (prev, current run, best run)
      .withColumn("max_run", expr(
        """aggregate(toks,
             named_struct('prev', cast(null as string), 'run', 0, 'best', 0),
             (acc, t) -> named_struct(
               'prev', t,
               'run',  if(acc.prev <=> t, acc.run + 1, 1),
               'best', greatest(acc.best, if(acc.prev <=> t, acc.run + 1, 1))),
             acc -> acc.best)""").cast(LongType))
      .withColumn("ok_word_count",
        flag(col("n_toks") >= minToks && col("n_toks") <= maxToks))
      .withColumn("ok_mean_len",
        flag(col("mean_tok_len") >= minMeanLen && col("mean_tok_len") <= maxMeanLen))
      .withColumn("ok_stopwords", flag(col("n_stopwords") >= minStopwords))
      .withColumn("ok_run", flag(col("max_run") <= maxRun))
      .withColumn("keep", flag(
        col("ok_word_count") === 1 && col("ok_mean_len") === 1 &&
          col("ok_stopwords") === 1 && col("ok_run") === 1))
      .drop("toks")
  }

  /** CCNet-style boilerplate removal: chop every document into
    * non-overlapping `segTokens`-token segments, hash each, and call a
    * segment boilerplate when its exact hash appears in at least
    * `minDocs` DISTINCT documents (headers, footers, navigation chrome —
    * the text that repeats across a crawl). Returns one row per document:
    * segment counts plus the document re-assembled WITHOUT its
    * boilerplate segments (original segment order preserved; empty
    * string when everything was boilerplate).
    *
    * Scale shape: segment fan-out is corpus-linear (n_toks / segTokens
    * rows per doc); the boilerplate set is found with one md5-keyed
    * groupBy whose partial aggregation collapses within-doc repeats
    * map-side, membership is marked by an equi-join on the same uniform
    * hash key (no broadcast needed — the join is hash-partitioned on
    * both sides), and re-assembly is a per-doc sort_array over collected
    * (index, kept-segment) structs — one doc-keyed shuffle whose rows
    * are segments, never all-pairs anything. */
  def boilerplateRemoval(
      df: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 10, minDocs: Int = 3): DataFrame = {
    require(segTokens > 0, s"segTokens must be positive: $segTokens")
    require(minDocs >= 2, s"minDocs below 2 flags unique text: $minDocs")
    val segs = df
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .withColumn("n_segs",
        expr(s"(size(toks) + $segTokens - 1) div $segTokens").cast(LongType))
      .select(col(idCol),
        posexplode(expr(
          s"transform(sequence(0, int(n_segs) - 1), " +
            s"k -> concat_ws(' ', slice(toks, k * $segTokens + 1, $segTokens)))"))
          .as(Seq("seg_idx", "seg_text")))
      .withColumn("_h", md5(col("seg_text")))
    val boiler = segs.groupBy(col("_h"))
      .agg(countDistinct(col(idCol)).as("_docs"))
      .filter(col("_docs") >= minDocs)
      .select(col("_h"), lit(1).as("_is_bp"))
    segs.join(boiler, Seq("_h"), "left")
      .withColumn("_bp", coalesce(col("_is_bp"), lit(0)))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(col("_bp")).as("n_boilerplate"),
        concat_ws(" ", expr(
          "transform(sort_array(collect_list(named_struct(" +
            "'i', seg_idx, 'kept', if(_bp = 0, seg_text, null)))), s -> s.kept)"))
          .as("clean_text"))
  }

  /** Temperature-based mixture reweighting at α = 0.5 (the multilingual
    * rebalancing rule: sampling probability ∝ p^α flattens the source
    * distribution so head sources stop drowning tail ones). Returns one
    * row per source: document count and `rel_epochs` — the repetition
    * weight relative to the LARGEST source, i.e. √(n_max / n_s), which
    * is exactly the α = 0.5 rate ratio q_s/p_s normalized so the head
    * source trains for one epoch. The output composes directly with
    * [[mixCorpus]] (weights) + [[packSequences]].
    *
    * α is fixed at 0.5 because √ is the one power IEEE 754 rounds
    * correctly — n_max and n_s are exact integers, the double divide and
    * sqrt are each correctly rounded, so the weights are bit-identical
    * across engines (a general pow() is last-ulp engine-dependent and
    * would break oracle hashing).
    *
    * Scale shape: one source-keyed partial-agg count (source cardinality
    * rows — tens, not billions) and a broadcast of the 1-row max back
    * over it; nothing here scales with corpus size. */
  def temperatureWeights(df: DataFrame, srcCol: String): DataFrame = {
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("n_docs"))
    counts
      .crossJoin(broadcast(counts.agg(max(col("n_docs")).as("_n_max"))))
      .select(col(srcCol), col("n_docs"),
        sqrt(col("_n_max").cast("double") / col("n_docs").cast("double"))
          .as("rel_epochs"))
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

  /** Corpus-wide exact paragraph-level deduplication with reassembly —
    * the segment-granular dedup stage (Dolma's paragraph dedup; Lee et
    * al. ACL '22 run it on substrings): every duplicated segment keeps
    * exactly its FIRST corpus occurrence (lowest (doc, position)), later
    * copies are removed, and each document's text is rebuilt from its
    * surviving segments in order. Differs from [[boilerplateRemoval]],
    * which drops frequency-flagged segments from EVERY document.
    *
    * Output: idCol, `dedup_text` (possibly empty), `n_kept`, `n_parts`.
    *
    * Scale: one shuffle keyed by segment content (uniform — duplicate-
    * heavy segments collapse through the rn=1 WindowGroupLimit, so a
    * boilerplate line repeated 10^9 times retains one row per partition
    * before the exchange), one doc-keyed shuffle to reassemble. At
    * 100 TB key the window by a 64-bit segment hash instead of the
    * string to slim the first shuffle (the oracle pins the exact-string
    * key; collision risk there is the standard birthday bound). */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
      delim: String = "\n"): DataFrame = {
    val parts = df
      .select(col(idCol), posexplode(
        split(col(textCol), java.util.regex.Pattern.quote(delim)))
        .as(Seq("pos", "para")))
      .filter(trim(col("para")) =!= "")
    val first = Window.partitionBy(col("para")).orderBy(col(idCol), col("pos"))
    val kept = parts
      .withColumn("rn", row_number().over(first))
      .filter(col("rn") === 1) // -> WindowGroupLimit
    val rebuilt = kept.groupBy(col(idCol)).agg(
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("para")))),
          _.getField("para")),
        delim).as("dedup_text"),
      count(lit(1)).as("n_kept"))
    val totals = parts.groupBy(col(idCol)).agg(count(lit(1)).as("n_parts"))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .join(totals, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("dedup_text"), lit("")).as("dedup_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_parts"), lit(0L)).as("n_parts"))
  }

  /** SUBSTRING-level dedup with KEEP-FIRST REMOVAL — the actual
    * product of Lee et al. ACL '22's suffix-array pass (q112 counts
    * shared windows, q164 locates exact spans; this one emits the
    * CLEANED corpus): every `window`-char span at `stride` is
    * content-hashed; a hash with ≥ 2 occurrences corpus-wide keeps its
    * canonical FIRST occurrence (min (doc_id, pos)) and every other
    * occurrence's interval is cut from its document. Within-doc
    * repeats count as duplicates too (the memorization guard does not
    * care who repeated the text). Output: one row per input document —
    * (doc_id, orig_len, n_removed_chars, cleaned) — docs with nothing
    * to cut pass through, cleaned = "".
    *
    * Determinism contract: hashes are the portable md5-60 family, the
    * keep-first key is integer arithmetic, interval masking is exact —
    * a DuckDB oracle reproduces the cleaned text byte-for-byte (q170).
    * A 60-bit collision could cut a non-duplicated span; both engines
    * cut identically, and at 2⁻⁶⁰ the risk is the md5-dedup family's.
    *
    * Scale shape: the shuffle carries (doc_id, pos, hash) longs —
    * never window text; the hash groupBy and the join back share one
    * partitioning; removal positions collect per DOC (bounded by
    * len/stride) and the cut is a narrow per-row pass. No pairwise
    * stage — a span duplicated n times costs n rows, the q112 shape.
    * The kept-first span of a hot boilerplate group is one row of one
    * group — no skew beyond the groupBy's own. */
  def removeDuplicatedSpans(
      df: DataFrame, idCol: String, textCol: String,
      window: Int = 40, stride: Int = 10): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val txt = df.select(col(idCol).cast(LongType).as("doc_id"),
      col(textCol).as("text"))
    val occ = txt.filter(length(col("text")) >= window)
      .select(col("doc_id"),
        explode(expr(s"sequence(1, length(text) - ${window - 1}, $stride)"))
          .as("pos"),
        col("text"))
      .select(col("doc_id"), col("pos"),
        hash60(expr(s"substring(text, pos, $window)")).as("h"))
    // keep-first key packs (doc_id, pos) into one long — positions are
    // < 10^9 by the explode bound, ids < 2^33 at any real sf
    val key = col("doc_id") * lit(1000000000L) + col("pos")
    val grp = occ.groupBy(col("h"))
      .agg(min(key).as("firstKey"), count(lit(1)).as("n"))
      .filter(col("n") >= 2)
    val removals = occ.join(grp, "h")
      .filter(key =!= col("firstKey"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
    txt.join(removals, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"),
        coalesce(col("ps"), array().cast("array<long>")).as("ps"))
      .as[(Long, String, Seq[Long])]
      .map { case (id, text, ps) =>
        val n = text.length
        val removed = new Array[Boolean](n)
        ps.foreach { p =>
          var c = p.toInt - 1
          val end = math.min(n, c + window)
          while (c < end) { removed(c) = true; c += 1 }
        }
        val sb = new java.lang.StringBuilder(n)
        var i = 0
        var nRem = 0
        while (i < n) {
          if (removed(i)) nRem += 1 else sb.append(text.charAt(i))
          i += 1
        }
        (id, n.toLong, nRem.toLong, sb.toString)
      }
      .toDF("doc_id", "orig_len", "n_removed_chars", "cleaned")
  }

}
