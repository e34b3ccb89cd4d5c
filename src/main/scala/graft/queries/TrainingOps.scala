package graft.queries

import graft.core.Lake
import graft.functions.Scale
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data curation operators beyond cleaning/dedup: stratified
  * sampling with exact per-group quotas, vocabulary construction, and
  * benchmark-contamination detection — each oracle-matched against
  * DuckDB like every other query.
  *
  * Scale notes are per-query; the common theme is that every per-group
  * top-k goes through a rank window (partial `WindowGroupLimit` prunes
  * to k per partition before the shuffle) and the only broadcast is the
  * benchmark probe set, which is small by nature (benchmark suites are
  * megabytes; corpora are the 100 TB side).
  */
object TrainingOps {

  private def lake(s: SparkSession, dir: String) = Lake(s, dir)

  /** DuckDB fragment for hash60 (keep in sync with TextFns.hash60). */
  private def dHash(x: String) =
    s"CAST(concat('0x', substr(md5($x),1,15)) AS BIGINT)"

  /** DuckDB fragment: distinct hashed word 3-shingles of `text`. */
  private val dShingles =
    s"""list_transform(
          list_distinct(list_transform(
            range(len(string_split(trim(text), ' ')) - 2),
            i -> concat_ws(' ', string_split(trim(text), ' ')[i+1],
                           string_split(trim(text), ' ')[i+2],
                           string_split(trim(text), ' ')[i+3]))),
          s -> ${dHash("s")})"""

  // --------------------------------------------------------------------
  // q70 — stratified sample with EXACT per-stratum quotas: the training-
  // mix operator ("50 documents per language", weights in rows, not
  // probabilities — Bernoulli sampling like q54 only hits quotas in
  // expectation). Deterministic: rank by the portable doc-id hash within
  // each stratum. Scale shape: rank()<=k over a partitioned window plans
  // as partial+final WindowGroupLimit — each partition pre-prunes to its
  // local top-k before one shuffle keyed by stratum; no global sort.
  // --------------------------------------------------------------------
  private val Q70_QUOTA = 50

  def q70StratifiedSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.stratifiedSample(
      lake(s, dir).documents.select(col("doc_id"), col("lang")),
      "lang", "doc_id", Q70_QUOTA)
      .orderBy(col("lang"), col("rk"))

  private val q70Oracle =
    s"""SELECT doc_id, lang, CAST(rk AS INTEGER) AS rk FROM (
          SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY ${dHash("CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
          FROM documents)
        WHERE rk <= $Q70_QUOTA ORDER BY lang, rk"""

  // --------------------------------------------------------------------
  // q86 — WEIGHTED deterministic sampling: each document keeps with its
  // own probability (integer ppm derived from document length here; in
  // production, a quality score) — the curation stage between q54's
  // fixed rate and q70's exact quotas. Pure integer arithmetic on the
  // portable doc-id hash, so the keep/drop decision is bit-identical
  // across engines, runs, and cluster layouts (reproducible backfills).
  // Narrow filter: scan-parallel, zero shuffles before the output sort.
  // --------------------------------------------------------------------
  def q86WeightedSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.weightedSample(
      lake(s, dir).documents
        .withColumn("ppm", least(col("n_chars") * 1500, lit(800000L))),
      "doc_id", "ppm")
      .select(col("doc_id"), col("lang"), col("ppm"))
      .orderBy(col("doc_id"))

  private val q86Oracle =
    s"""SELECT doc_id, lang, least(n_chars * 1500, 800000) AS ppm
       FROM documents
       WHERE ${dHash("CAST(doc_id AS VARCHAR)")} % 1000000
             < least(n_chars * 1500, 800000)
       ORDER BY doc_id"""

  // --------------------------------------------------------------------
  // q71 — vocabulary construction: top-20 tokens per language by corpus
  // frequency (the first pass of any BPE/WordPiece trainer). Two-phase:
  // token explode + (lang, token) count — partial aggregation absorbs
  // the explode's fan-out map-side, so the shuffle carries one row per
  // DISTINCT (lang, token), i.e. vocabulary-sized, not corpus-sized —
  // then a rank window per language (WindowGroupLimit again).
  // --------------------------------------------------------------------
  private val Q71_TOPK = 20

  def q71VocabTopK(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.vocabTopK(
      lake(s, dir).documents, "lang", "text", Q71_TOPK)
      .orderBy(col("lang"), col("rk"))

  private val q71Oracle =
    s"""SELECT lang, token, n_occurrences, CAST(rk AS INTEGER) AS rk FROM (
          SELECT lang, token, count(*) AS n_occurrences,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY count(*) DESC, token) AS rk
          FROM (SELECT lang, unnest(string_split(trim(text), ' ')) AS token
                FROM documents)
          GROUP BY lang, token)
        WHERE rk <= $Q71_TOPK ORDER BY lang, rk"""

  // --------------------------------------------------------------------
  // q72 — benchmark contamination: which training documents share ≥ 5
  // distinct 3-shingles with a benchmark probe set (here: the held-out
  // docs with doc_id % 100 < 2 — in production, the eval suites). Scale
  // shape: the probe set's distinct shingle hashes are SMALL (benchmarks
  // are megabytes) → broadcast hash join against the scan-parallel
  // corpus explode; one group-by doc_id on the (rare) hits. The corpus
  // side is never shuffled in full, whatever its size.
  // --------------------------------------------------------------------
  private val Q72_MIN_OVERLAP = 5

  def q72Contamination(s: SparkSession, dir: String): DataFrame = {
    // repartition before the md5-heavy shingle pass (single-file inputs
    // arrive as ONE partition) and cache: the probe-broadcast job and
    // the corpus join job otherwise each re-scan + re-shuffle documents
    val docs = graft.core.CacheScope.cached(lake(s, dir).documents
      .repartition(Scale.par(s), col("doc_id")))
    graft.operators.Curation.contamination(
      docs.filter(col("doc_id") % 100 >= 2),
      docs.filter(col("doc_id") % 100 < 2),
      "doc_id", "text", minOverlap = Q72_MIN_OVERLAP)
      .orderBy(col("doc_id"))
  }

  private val q72Oracle =
    s"""WITH sh AS (
          SELECT doc_id, $dShingles AS hs
          FROM documents
          WHERE len(string_split(trim(text), ' ')) >= 3),
        bench AS (
          SELECT DISTINCT unnest(hs) AS h FROM sh WHERE doc_id % 100 < 2),
        hits AS (
          SELECT s.doc_id, count(*) AS n_shared_shingles
          FROM (SELECT doc_id, unnest(hs) AS h FROM sh
                WHERE doc_id % 100 >= 2) s
          JOIN bench ON s.h = bench.h
          GROUP BY s.doc_id)
        SELECT doc_id, n_shared_shingles FROM hits
        WHERE n_shared_shingles >= $Q72_MIN_OVERLAP ORDER BY doc_id"""

  // --------------------------------------------------------------------
  // q74 — repetition/diversity quality flags (the Gopher-style filters
  // every pretraining pipeline applies): per document, the top-token
  // mass ratio and the type-token ratio, plus the repetitive-document
  // flag. Two-phase like q71: per-(doc, token) partial counts absorb
  // the explode map-side; both ratios are int/int double divisions —
  // bit-deterministic with no rounding anywhere.
  // --------------------------------------------------------------------
  def q74RepetitionFlags(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.repetitionFlags(
      lake(s, dir).documents, "doc_id", "text")
      .orderBy(col("doc_id"))

  private val q74Oracle =
    """WITH tf AS (
         SELECT doc_id, token, count(*) AS n
         FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
               FROM documents)
         GROUP BY doc_id, token),
       agg AS (
         SELECT doc_id, max(n) AS max_tok, CAST(sum(n) AS BIGINT) AS n_toks,
                count(*) AS n_distinct
         FROM tf GROUP BY doc_id)
       SELECT doc_id,
              CAST(max_tok AS DOUBLE) / n_toks AS max_token_ratio,
              CAST(n_distinct AS DOUBLE) / n_toks AS type_token_ratio,
              CAST(CASE WHEN CAST(max_tok AS DOUBLE) / n_toks > 0.1
                          OR CAST(n_distinct AS DOUBLE) / n_toks < 0.3
                   THEN 1 ELSE 0 END AS INTEGER) AS is_repetitive
       FROM agg ORDER BY doc_id"""

  // --------------------------------------------------------------------
  // q75 — sequence packing (concat-and-chunk): every pretraining run's
  // final data op. Documents are laid out per language in portable-hash
  // order and chunked into 512-token training sequences; each document
  // reports the sequence it starts in and its offset there. Running sums
  // over a per-stratum window — strata pack in parallel, all-integer
  // math, bit-deterministic by construction.
  // --------------------------------------------------------------------
  private val Q75_BUDGET = 512

  def q75SequencePacking(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.packSequences(
      lake(s, dir).documents, "doc_id", "text", "lang", Q75_BUDGET)
      .orderBy(col("lang"), col("seq_id"), col("seq_offset"), col("doc_id"))

  private val q75Oracle =
    s"""WITH t AS (
          SELECT doc_id, lang,
                 CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_toks,
                 ${dHash("CAST(doc_id AS VARCHAR)")} AS h
          FROM documents),
        o AS (
          SELECT doc_id, lang, n_toks,
                 COALESCE(CAST(sum(n_toks) OVER (PARTITION BY lang
                   ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT), 0) AS start_offset
          FROM t)
        SELECT doc_id, lang, n_toks,
               start_offset // $Q75_BUDGET AS seq_id,
               start_offset % $Q75_BUDGET AS seq_offset
        FROM o ORDER BY lang, seq_id, seq_offset, doc_id"""

  // --------------------------------------------------------------------
  // q76 — weighted corpus mixing: the mixture recipe as data. Each source
  // gets a repetition weight (2.5 = two full epochs + a deterministic
  // half); copies carry their epoch ordinal. No shuffle at all — a
  // bounded explode + hash filter, composing with q75's packing
  // downstream. Weights snap to integer ppm on the driver so no float
  // threshold ever reaches the data.
  // --------------------------------------------------------------------
  private val Q76_WEIGHTS: Seq[(String, Double, Long)] = Seq(
    // (source, weight, ppm) — ppm duplicated literally so the oracle SQL
    // is generated from the same numbers the Spark operator snaps to
    ("src0", 2.5, 2500000L), ("src1", 1.0, 1000000L),
    ("src2", 0.25, 250000L), ("src3", 0.6, 600000L),
    ("src4", 1.75, 1750000L))

  def q76CorpusMix(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.mixCorpus(
      lake(s, dir).documents, "doc_id", "source",
      Q76_WEIGHTS.map(w => w._1 -> w._2).toMap)
      .orderBy(col("source"), col("doc_id"), col("epoch"))

  private val q76Oracle = {
    val cases = Q76_WEIGHTS
      .map { case (src, _, ppm) => s"WHEN '$src' THEN $ppm" }
      .mkString(" ")
    val srcs = Q76_WEIGHTS.map(w => s"'${w._1}'").mkString(", ")
    s"""WITH d AS (
          SELECT doc_id, source,
                 CAST(CASE source $cases END AS BIGINT) AS ppm
          FROM documents WHERE source IN ($srcs)),
        e AS (
          SELECT doc_id, source, ppm,
                 unnest(range((ppm + 999999) // 1000000)) AS epoch
          FROM d)
        SELECT doc_id, source, epoch FROM e
        WHERE epoch < ppm // 1000000
           OR ${dHash("concat(CAST(doc_id AS VARCHAR), ':', CAST(epoch AS VARCHAR))")}
              % 1000000 < ppm % 1000000
        ORDER BY source, doc_id, epoch"""
  }

  // --------------------------------------------------------------------
  // q89 — BPE merge-candidate pass: top-50 adjacent token pairs by corpus
  // frequency (each BPE training round picks the most frequent pair and
  // merges it; this is the count pass that drives the pick). Same scale
  // shape as q71: map-side partial counts absorb the pair explode, the
  // shuffle is pair-vocabulary-sized, and the global top-k is a
  // TakeOrderedAndProject — never a one-partition window over the full
  // pair vocabulary.
  // --------------------------------------------------------------------
  private val Q89_TOPK = 50

  def q89BpePairs(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.bigramTopK(
      lake(s, dir).documents, "text", Q89_TOPK)
      .orderBy(col("rk"))

  private val q89Oracle =
    s"""WITH p AS (
          SELECT unnest(list_transform(
                   range(len(string_split(trim(text), ' ')) - 1),
                   i -> concat(string_split(trim(text), ' ')[i+1], ' ',
                               string_split(trim(text), ' ')[i+2]))) AS pair
          FROM documents
          WHERE len(string_split(trim(text), ' ')) >= 2)
        SELECT pair, n_occurrences, CAST(rk AS INTEGER) AS rk FROM (
          SELECT pair, count(*) AS n_occurrences,
                 row_number() OVER (ORDER BY count(*) DESC, pair) AS rk
          FROM p GROUP BY pair)
        WHERE rk <= $Q89_TOPK ORDER BY rk"""

  // --------------------------------------------------------------------
  // q90 — sliding-window chunking with overlap (chunk 64 tokens, stride
  // 48): the RAG-indexing / long-context sibling of q75's packing. Chunk
  // boundaries are all-integer (start = k·stride, last chunk = first
  // window reaching the end), so the split is engine- and layout-
  // independent; narrow bounded explode, no shuffle before the output
  // sort.
  // --------------------------------------------------------------------
  private val Q90_CHUNK = 64
  private val Q90_STRIDE = 48

  def q90Chunking(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.chunkDocuments(
      lake(s, dir).documents, "doc_id", "text", Q90_CHUNK, Q90_STRIDE)
      .orderBy(col("doc_id"), col("chunk_id"))

  private val q90Oracle =
    s"""WITH t AS (
          SELECT doc_id, string_split(trim(text), ' ') AS toks,
                 CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_toks
          FROM documents),
        c AS (
          SELECT doc_id, toks, n_toks,
                 unnest(range(0, CASE WHEN n_toks <= $Q90_CHUNK THEN 1
                   ELSE (n_toks - $Q90_CHUNK + $Q90_STRIDE - 1) // $Q90_STRIDE + 1
                   END)) AS chunk_id
          FROM t)
        SELECT doc_id, chunk_id,
               chunk_id * $Q90_STRIDE AS chunk_start,
               least($Q90_CHUNK, n_toks - chunk_id * $Q90_STRIDE) AS chunk_len,
               array_to_string(
                 toks[chunk_id * $Q90_STRIDE + 1 :
                      chunk_id * $Q90_STRIDE +
                      least($Q90_CHUNK, n_toks - chunk_id * $Q90_STRIDE)],
                 ' ') AS chunk_text
        FROM c ORDER BY doc_id, chunk_id"""

  // --------------------------------------------------------------------
  // q91 — normalized exact dedup: canonicalize (lowercase, strip outside
  // [a-z0-9 ], collapse space runs, trim) BEFORE hashing, catching the
  // trivially-reformatted copies raw exact dedup (q35) misses — the
  // RefinedWeb-style normalization stage. Character classes only, so
  // Java regex and DuckDB RE2 agree byte for byte. One uniform-key
  // shuffle on the normalized hash.
  // --------------------------------------------------------------------
  def q91NormalizedDedup(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.normalizedDedup(
      lake(s, dir).documents, "doc_id", "text")
      .orderBy(col("doc_id"))

  private val q91Oracle =
    """WITH n AS (
         SELECT doc_id,
                md5(trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS nh
         FROM documents)
       SELECT min(doc_id) AS doc_id, count(*) AS n_variants
       FROM n GROUP BY nh ORDER BY doc_id"""

  // --------------------------------------------------------------------
  // q92 — deterministic shuffle into training shards: the final layout
  // stage of every pretraining pipeline. A seeded portable hash breaks
  // curation order (which correlates neighbors by source/crawl); each
  // document gets its shard (hash mod 16) and in-shard position (rank by
  // a second use of the hash). (seed, doc_id) fully determines (shard,
  // pos) — reruns, backfills, and different cluster layouts reproduce
  // the identical epoch order. One uniform shard-keyed shuffle.
  // --------------------------------------------------------------------
  private val Q92_SHARDS = 16
  private val Q92_SEED = 42L

  def q92ShuffleShards(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.shuffleShards(
      lake(s, dir).documents, "doc_id", Q92_SHARDS, Q92_SEED)
      .orderBy(col("doc_id"))

  private val q92Oracle = {
    val hv = dHash(s"concat('$Q92_SEED:', CAST(doc_id AS VARCHAR))")
    s"""WITH h AS (SELECT doc_id, $hv AS hv FROM documents)
        SELECT doc_id, hv % $Q92_SHARDS AS shard,
               CAST(row_number() OVER (PARTITION BY hv % $Q92_SHARDS
                 ORDER BY hv, doc_id) AS BIGINT) AS pos
        FROM h ORDER BY doc_id"""
  }

  // --------------------------------------------------------------------
  // q93 — Gopher-style hard-filter suite: one flag per published rule
  // (word-count bounds, mean-token-length bounds, ≥2 distinct stopwords,
  // no adjacent-token run > 2) plus the combined keep verdict. Thresholds
  // here are tuned so EVERY rule splits this corpus nontrivially (each
  // flag has both 0s and 1s at sf0.01 — a rule that never fires is an
  // untested rule). Spark computes the run statistic as a per-row fold
  // (zero shuffles); the oracle pays the explode + gaps-and-islands
  // window form to agree — same numbers, independently derived.
  // --------------------------------------------------------------------
  private val Q93_STOP = Seq("the", "a", "of", "and", "to", "in")

  def q93GopherFilters(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.gopherFilters(
      lake(s, dir).documents, "doc_id", "text",
      minToks = 20, maxToks = 90, minMeanLen = 3.0, maxMeanLen = 5.0,
      minStopwords = 2, maxRun = 2, stopwords = Q93_STOP)
      .orderBy(col("doc_id"))

  private val q93Oracle = {
    val stop = Q93_STOP.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
                   FROM documents),
        base AS (
          SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
                 CAST(list_aggregate(list_transform(toks, tk -> len(tk)), 'sum')
                      AS DOUBLE) / len(toks) AS mean_tok_len,
                 CAST(len(list_intersect(list_distinct(toks), [$stop]))
                      AS BIGINT) AS n_stopwords
          FROM t),
        pos AS (SELECT doc_id, i, toks[i+1] AS token
                FROM t, UNNEST(range(len(toks))) AS u(i)),
        runs AS (
          SELECT doc_id, count(*) AS run_len
          FROM (SELECT doc_id, token,
                       i - row_number() OVER (PARTITION BY doc_id, token
                                              ORDER BY i) AS grp
                FROM pos)
          GROUP BY doc_id, token, grp),
        mr AS (SELECT doc_id, CAST(max(run_len) AS BIGINT) AS max_run
               FROM runs GROUP BY doc_id)
        SELECT b.doc_id, n_toks, mean_tok_len, n_stopwords, max_run,
               CAST(CASE WHEN n_toks BETWEEN 20 AND 90
                    THEN 1 ELSE 0 END AS INTEGER) AS ok_word_count,
               CAST(CASE WHEN mean_tok_len BETWEEN 3.0 AND 5.0
                    THEN 1 ELSE 0 END AS INTEGER) AS ok_mean_len,
               CAST(CASE WHEN n_stopwords >= 2
                    THEN 1 ELSE 0 END AS INTEGER) AS ok_stopwords,
               CAST(CASE WHEN max_run <= 2
                    THEN 1 ELSE 0 END AS INTEGER) AS ok_run,
               CAST(CASE WHEN n_toks BETWEEN 20 AND 90
                          AND mean_tok_len BETWEEN 3.0 AND 5.0
                          AND n_stopwords >= 2 AND max_run <= 2
                    THEN 1 ELSE 0 END AS INTEGER) AS keep
        FROM base b JOIN mr USING (doc_id)
        ORDER BY doc_id"""
  }

  // --------------------------------------------------------------------
  // q94 — CCNet-style boilerplate removal: 3-token segments whose exact
  // hash appears in ≥ 3 distinct documents are crawl chrome; each doc is
  // re-assembled without them. 3-token segments (not the production ~50)
  // because this vocabulary-limited corpus only repeats at that scale —
  // the operator itself takes the segment length as a parameter.
  // --------------------------------------------------------------------
  private val Q94_SEG = 3
  private val Q94_MIN_DOCS = 3

  def q94BoilerplateRemoval(s: SparkSession, dir: String): DataFrame =
    // single-file inputs arrive as ONE partition; spread before the
    // md5-per-segment pass (the q72 precedent)
    graft.operators.Curation.boilerplateRemoval(
      lake(s, dir).documents.repartition(Scale.par(s), col("doc_id")),
      "doc_id", "text",
      segTokens = Q94_SEG, minDocs = Q94_MIN_DOCS)
      .orderBy(col("doc_id"))

  private val q94Oracle =
    s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
                   FROM documents),
        seg AS (
          SELECT doc_id, k AS seg_idx,
                 array_to_string(toks[k*$Q94_SEG+1 : k*$Q94_SEG+$Q94_SEG], ' ')
                   AS seg_text
          FROM t, UNNEST(range((len(toks) + ${Q94_SEG - 1}) // $Q94_SEG)) AS u(k)),
        bp AS (
          SELECT md5(seg_text) AS h FROM seg
          GROUP BY md5(seg_text)
          HAVING count(DISTINCT doc_id) >= $Q94_MIN_DOCS),
        m AS (
          SELECT s.doc_id, s.seg_idx, s.seg_text,
                 CASE WHEN b.h IS NULL THEN 0 ELSE 1 END AS is_bp
          FROM seg s LEFT JOIN bp b ON md5(s.seg_text) = b.h)
        SELECT doc_id, count(*) AS n_segments,
               CAST(sum(is_bp) AS BIGINT) AS n_boilerplate,
               coalesce(string_agg(CASE WHEN is_bp = 0 THEN seg_text END,
                                   ' ' ORDER BY seg_idx), '') AS clean_text
        FROM m GROUP BY doc_id ORDER BY doc_id"""

  // --------------------------------------------------------------------
  // q95 — Unicode NFC normalization via the native `nfc_normalize`
  // Catalyst expression (codegen'd; see o.a.s.sql.graft.NfcNormalize).
  // The synthetic corpus is pure ASCII — where NFC is the identity and
  // would test nothing — so BOTH engines first inject the same
  // decomposed sequences ('e'+U+0301, 'o'+U+0308) and then normalize;
  // NFC must compose them back to single codepoints (é, ö), so the
  // normalized char count equals the ORIGINAL text length while the
  // injected count exceeds it. The md5 over the normalized text proves
  // byte-level agreement with DuckDB's nfc_normalize, not just lengths.
  // --------------------------------------------------------------------
  def q95NfcNormalize(s: SparkSession, dir: String): DataFrame = {
    graft.engine.GraftFunctions.register(s)
    val injected = replace(replace(col("text"),
      lit("e"), lit("e\u0301")), lit("o"), lit("o\u0308"))
    lake(s, dir).documents
      .select(col("doc_id"), col("text"),
        call_function("nfc_normalize", injected).as("_norm"),
        length(injected).cast("long").as("n_injected"))
      .select(col("doc_id"), col("n_injected"),
        length(col("_norm")).cast("long").as("n_normalized"),
        (length(col("_norm")) === length(col("text")))
          .cast("int").as("composed_back"),
        md5(col("_norm")).as("norm_hash"))
      .orderBy(col("doc_id"))
  }

  private val q95Oracle =
    """WITH i AS (
         SELECT doc_id, text,
                replace(replace(text, 'e', 'e' || chr(769)),
                        'o', 'o' || chr(776)) AS inj
         FROM documents),
       n AS (SELECT doc_id, text, inj, nfc_normalize(inj) AS norm FROM i)
       SELECT doc_id, CAST(len(inj) AS BIGINT) AS n_injected,
              CAST(len(norm) AS BIGINT) AS n_normalized,
              CAST(CASE WHEN len(norm) = len(text) THEN 1 ELSE 0 END
                   AS INTEGER) AS composed_back,
              md5(norm) AS norm_hash
       FROM n ORDER BY doc_id"""

  // --------------------------------------------------------------------
  // q96 — temperature mixture reweighting at α = 0.5: per source, the
  // repetition weight √(n_max/n_s) that flattens the source distribution
  // (head source = 1 epoch, tail sources up-weighted). √ because it is
  // the one power IEEE rounds correctly — the weights hash bit-identical
  // across engines; a general pow() would not.
  // --------------------------------------------------------------------
  def q96TemperatureWeights(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.temperatureWeights(
      lake(s, dir).documents, "source")
      .orderBy(col("source"))

  private val q96Oracle =
    """WITH c AS (SELECT source, count(*) AS n_docs
                  FROM documents GROUP BY source)
       SELECT source, n_docs,
              sqrt(CAST((SELECT max(n_docs) FROM c) AS DOUBLE)
                   / CAST(n_docs AS DOUBLE)) AS rel_epochs
       FROM c ORDER BY source"""

  // --------------------------------------------------------------------
  // q97 — heavy hitters via the mergeable Space-Saving sketch (TopKAgg):
  // top-10 corpus tokens from ONE partial-agg pass with O(k) state per
  // partition — the shuffle is O(partitions·k) whatever the key
  // cardinality, vs q71's vocabulary-sized shuffle. Capacity 64 exceeds
  // this corpus's distinct-token count, so nothing is evicted and the
  // sketch is EXACT (err = 0, merge-order-independent) — which is what
  // makes a hash-exact DuckDB GROUP BY oracle possible; the approximate
  // regime is property-tested in TopKAggSpec.
  // --------------------------------------------------------------------
  private val Q97_CAP = 64
  private val Q97_TOPK = 10

  def q97HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val hh = udaf(new graft.functions.TopKAgg(Q97_CAP))
    lake(s, dir).documents
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("token"))
      .agg(hh(col("token")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token").as("token"), col("e.count").as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(Q97_TOPK)
  }

  private val q97Oracle =
    s"""SELECT token, count(*) AS n_occurrences
       FROM (SELECT unnest(string_split(trim(text), ' ')) AS token
             FROM documents)
       GROUP BY token
       ORDER BY n_occurrences DESC, token LIMIT $Q97_TOPK"""

  // --------------------------------------------------------------------
  // q98 — bag-of-words dedup keeping the best copy: groups on the md5 of
  // the sorted distinct token set (token order/repetition don't split a
  // group — on this corpus 500 docs collapse to 446 groups, largest 29),
  // winner = max n_chars, ties to lowest doc_id. One uniform-key shuffle
  // carrying (key, id, score); max_by partial-aggregates map-side. The
  // oracle derives the same winners via a rank window — independent path,
  // same rows.
  // --------------------------------------------------------------------
  def q98DedupKeepBest(s: SparkSession, dir: String): DataFrame =
    // spread the sort+md5 key derivation before the group shuffle
    graft.operators.Curation.dedupKeepBest(
      lake(s, dir).documents.repartition(Scale.par(s), col("doc_id")),
      "doc_id", "text", "n_chars")
      .orderBy(col("doc_id"))

  private val q98Oracle =
    """WITH k AS (
         SELECT doc_id, n_chars,
                md5(array_to_string(list_sort(list_distinct(
                      string_split(trim(text), ' '))), ' ')) AS h
         FROM documents),
       w AS (
         SELECT doc_id, n_chars,
                CAST(count(*) OVER (PARTITION BY h) AS BIGINT) AS n_variants,
                row_number() OVER (PARTITION BY h
                                   ORDER BY n_chars DESC, doc_id) AS rn
         FROM k)
       SELECT doc_id, n_chars, n_variants FROM w WHERE rn = 1
       ORDER BY doc_id"""

  // --------------------------------------------------------------------
  // q101 — deterministic train/val/test split (80/10/10 in ppm bands of
  // the salted portable id hash): membership is pure integer arithmetic,
  // so a document can never migrate between splits on a rerun/backfill —
  // the leakage property holdouts exist for. Zero shuffles before the
  // output sort.
  // --------------------------------------------------------------------
  private val Q101_TRAIN = 800000
  private val Q101_VAL = 100000

  def q101TrainValTest(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.trainValTestSplit(
      lake(s, dir).documents.select(col("doc_id"), col("lang")),
      "doc_id", Q101_TRAIN, Q101_VAL)
      .orderBy(col("doc_id"))

  private val q101Oracle = {
    val hv = dHash(s"concat('split:0:', CAST(doc_id AS VARCHAR))")
    s"""SELECT doc_id, lang,
              CASE WHEN $hv % 1000000 < $Q101_TRAIN THEN 'train'
                   WHEN $hv % 1000000 < ${Q101_TRAIN + Q101_VAL} THEN 'val'
                   ELSE 'test' END AS split
       FROM documents ORDER BY doc_id"""
  }

  // --------------------------------------------------------------------
  // q102 — the per-source CURATION REPORT: the composed dashboard every
  // corpus build publishes — per source, document count, Gopher-keep
  // count + rate, bag-of-words-unique count (dedup headroom), and mean
  // token count. Composes the q93 rule suite (per-row fold, no shuffle)
  // with the q98 content key; ONE source-keyed aggregate after a narrow
  // projection — the whole report is one shuffle of source-cardinality
  // rows. keep_ppm / mean_toks as exact integer floor division on a
  // DECIMAL(38,0)-widened numerator (same policy as q103): a bare long
  // multiply overflows past ~9.2e12 kept docs, and long/long `/` in
  // Spark is double division that loses exactness past 2^53.
  // --------------------------------------------------------------------
  def q102CurationReport(s: SparkSession, dir: String): DataFrame = {
    // bow precomputed as a column and carried THROUGH the rule suite —
    // one corpus scan, one source-keyed aggregate; a join back to
    // documents here would shuffle every row on doc_id for nothing
    val docs = lake(s, dir).documents.withColumn("bow",
      md5(concat_ws(" ", array_sort(array_distinct(
        graft.functions.TextFns.tokens(col("text")))))))
    graft.operators.Curation.gopherFilters(
      docs, "doc_id", "text",
      minToks = 20, maxToks = 90, minMeanLen = 3.0, maxMeanLen = 5.0,
      minStopwords = 2, maxRun = 2, stopwords = Q93_STOP,
      carryCols = Seq("source", "bow"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("keep")).cast("long").as("n_keep"),
        expr("CAST(CAST(sum(keep) AS DECIMAL(38,0)) * 1000000" +
          " div count(1) AS BIGINT)").as("keep_ppm"),
        countDistinct(col("bow")).as("n_unique_bow"),
        expr("CAST(CAST(sum(n_toks) AS DECIMAL(38,0))" +
          " div count(1) AS BIGINT)").as("mean_toks"))
      .orderBy(col("source"))
  }

  private val q102Oracle = {
    val stop = Q93_STOP.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, source,
                          string_split(trim(text), ' ') AS toks FROM documents),
        base AS (
          SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_toks,
                 CAST(list_aggregate(list_transform(toks, tk -> len(tk)), 'sum')
                      AS DOUBLE) / len(toks) AS mean_tok_len,
                 CAST(len(list_intersect(list_distinct(toks), [$stop]))
                      AS BIGINT) AS n_stopwords,
                 md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS bow
          FROM t),
        pos AS (SELECT doc_id, i, toks[i+1] AS token
                FROM t, UNNEST(range(len(toks))) AS u(i)),
        runs AS (
          SELECT doc_id, count(*) AS run_len
          FROM (SELECT doc_id, token,
                       i - row_number() OVER (PARTITION BY doc_id, token
                                              ORDER BY i) AS grp
                FROM pos)
          GROUP BY doc_id, token, grp),
        mr AS (SELECT doc_id, CAST(max(run_len) AS BIGINT) AS max_run
               FROM runs GROUP BY doc_id),
        flags AS (
          SELECT b.doc_id, b.source, b.n_toks, b.bow,
                 CASE WHEN n_toks BETWEEN 20 AND 90
                       AND mean_tok_len BETWEEN 3.0 AND 5.0
                       AND n_stopwords >= 2 AND max_run <= 2
                      THEN 1 ELSE 0 END AS keep
          FROM base b JOIN mr USING (doc_id))
        SELECT source, count(*) AS n_docs,
               CAST(sum(keep) AS BIGINT) AS n_keep,
               CAST(sum(keep) * 1000000 // count(*) AS BIGINT) AS keep_ppm,
               CAST(count(DISTINCT bow) AS BIGINT) AS n_unique_bow,
               CAST(sum(n_toks) // count(*) AS BIGINT) AS mean_toks
        FROM flags GROUP BY source ORDER BY source"""
  }

  // --------------------------------------------------------------------
  // q103 — per-split token budget: the accounting table a training run
  // consumes — for each (split, lang): documents, total tokens, and the
  // split's token share in exact integer ppm of its language. Composes
  // q101's leakage-proof split assignment (zero-shuffle hash bands) with
  // token counting; ONE aggregate keyed by (split, lang) — cardinality
  // 3×languages — plus a broadcast of the per-language totals back over
  // it. Window-free: the per-language total is a 15-row broadcast join,
  // not a corpus-wide partition window.
  // --------------------------------------------------------------------
  def q103SplitBudget(s: SparkSession, dir: String): DataFrame = {
    val split = graft.operators.Curation.trainValTestSplit(
      lake(s, dir).documents.select(col("doc_id"), col("lang"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n_toks")),
      "doc_id", Q101_TRAIN, Q101_VAL)
    val perCell = split.groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("total_tokens"))
    val perLang = perCell.groupBy(col("lang"))
      .agg(sum(col("total_tokens")).as("_lang_tokens"))
    perCell.join(broadcast(perLang), "lang")
      .select(col("split"), col("lang"), col("n_docs"), col("total_tokens"),
        // exact integer division on a WIDENED type: a long multiply
        // overflows once one language passes ~9.2e12 tokens — a real
        // 100 TB corpus size. DECIMAL(38,0) here ≡ HUGEINT in the
        // oracle; both are exact, positive floor division.
        expr("CAST(CAST(total_tokens AS DECIMAL(38,0)) * 1000000" +
          " div _lang_tokens AS BIGINT)").as("token_ppm"))
      .orderBy(col("split"), col("lang"))
  }

  private val q103Oracle = {
    val hv = dHash(s"concat('split:0:', CAST(doc_id AS VARCHAR))")
    s"""WITH s AS (
         SELECT lang, CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_toks,
                CASE WHEN $hv % 1000000 < $Q101_TRAIN THEN 'train'
                     WHEN $hv % 1000000 < ${Q101_TRAIN + Q101_VAL} THEN 'val'
                     ELSE 'test' END AS split
         FROM documents),
       cell AS (
         SELECT split, lang, count(*) AS n_docs,
                sum(n_toks) AS total_tokens
         FROM s GROUP BY split, lang),
       tot AS (SELECT lang, sum(total_tokens) AS lt FROM cell GROUP BY lang)
       SELECT split, c.lang, n_docs,
              -- DuckDB's sum(BIGINT) is HUGEINT; an uncast HUGEINT output
              -- column canonicalizes as float (307.0 vs Spark's 307) in a
              -- pandas-side hasher even when every value is equal, so the
              -- output type must be pinned to BIGINT exactly like the
              -- Spark side's long sum.
              CAST(total_tokens AS BIGINT) AS total_tokens,
              CAST(CAST(total_tokens AS HUGEINT) * 1000000 // lt AS BIGINT)
                AS token_ppm
       FROM cell c JOIN tot USING (lang)
       ORDER BY split, lang"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q140_prep_v2" -> (q140PrepV2 _),
    "q137_dsir" -> (q137Dsir _),
    "q163_bigram_lm_fp" -> (q163BigramLmFp _),
    "q166_dsir_log_fp" -> (q166DsirLogFp _),
    "q167_perplexity_fp" -> (q167PerplexityFp _),
    "q168_dsir_resample_fp" -> (q168DsirResampleFp _),
    "q144_dsir_resample" -> (q144DsirResample _),
    "q138_quality_classifier" -> (q138QualityClassifier _),
    "q70_stratified_sample" -> (q70StratifiedSample _),
    "q71_vocab_topk" -> (q71VocabTopK _),
    "q72_contamination" -> (q72Contamination _),
    "q74_repetition_flags" -> (q74RepetitionFlags _),
    "q75_sequence_packing" -> (q75SequencePacking _),
    "q76_corpus_mix" -> (q76CorpusMix _),
    "q86_weighted_sample" -> (q86WeightedSample _),
    "q89_bpe_pairs" -> (q89BpePairs _),
    "q90_chunking" -> (q90Chunking _),
    "q91_normalized_dedup" -> (q91NormalizedDedup _),
    "q92_shuffle_shards" -> (q92ShuffleShards _),
    "q93_gopher_filters" -> (q93GopherFilters _),
    "q94_boilerplate_removal" -> (q94BoilerplateRemoval _),
    "q95_nfc_normalize" -> (q95NfcNormalize _),
    "q96_temperature_weights" -> (q96TemperatureWeights _),
    "q97_heavy_hitters" -> (q97HeavyHitters _),
    "q98_dedup_keep_best" -> (q98DedupKeepBest _),
    "q101_train_val_test" -> (q101TrainValTest _),
    "q102_curation_report" -> (q102CurationReport _),
    "q103_split_budget" -> (q103SplitBudget _))

  // --------------------------------------------------------------------
  // q137 — DSIR domain selection (Xie et al., NeurIPS 2023): score every
  // NON-target document by how much more likely the TARGET-domain
  // hashed-unigram model (here: the `lang = 'en'` slice, the paper's
  // "Wikipedia-like target" role) makes its tokens than the raw model,
  // and keep the top 20. Model = 4096 smoothed count-ratio weights
  // (TokenClassifier.fitRatio — one explode + one 4096-bounded
  // aggregate; the collect is the MODEL, 32 KiB, broadcast back as a
  // literal); scoring = one stateless codegen'd pass, zero shuffles;
  // selection = TakeOrderedAndProject. Determinism: the oracle-checked
  // score is the linear-domain MEAN ratio — each weight ONE IEEE
  // division of exact integer products, each document folding its
  // SORTED weight multiset left-to-right (≡ DuckDB list_reduce) — while
  // the paper's log-domain weight and the hash-threshold importance
  // RESAMPLER are the same model spec-side (TokenClassifierSpec), where
  // engine-dependent ln() is allowed. At 100 TB nothing here grows but
  // the two linear passes.
  // --------------------------------------------------------------------
  def q137Dsir(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.TokenClassifier
    val docs = lake(s, dir).documents
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .repartition(Scale.par(s), col("doc_id")) // md5-heavy token pass
    val feats = TokenClassifier.unigramBuckets(col("text"))
    val w = TokenClassifier.fitRatio(
      docs.select((col("lang") === "en").as("t"), feats.as("f")), "f", "t")
    val scored = docs.filter(col("lang") =!= "en")
      .select(col("doc_id"), col("lang"), col("source"),
        size(feats).cast("long").as("n_tok"),
        TokenClassifier.meanRatioScore(feats, w).as("score"))
    val rk = Window.orderBy(col("score").desc, col("doc_id"))
    scored.orderBy(col("score").desc, col("doc_id")).limit(20)
      .withColumn("rnk", row_number().over(rk).cast("int"))
      .orderBy(col("rnk"))
  }

  private val q137Oracle = {
    val toks = "string_split(trim(text), ' ')"
    val bkt = s"CAST(${dHash("t")} % 4096 AS INT)"
    s"""WITH tb AS (
         SELECT lang, $bkt AS bucket
         FROM (SELECT lang, unnest($toks) AS t FROM documents)),
       tc AS (SELECT bucket, count(*) AS ct FROM tb WHERE lang = 'en' GROUP BY 1),
       rc AS (SELECT bucket, count(*) AS cr FROM tb WHERE lang <> 'en' GROUP BY 1),
       tot AS (SELECT
         (SELECT count(*) FROM tb WHERE lang = 'en') AS t_tot,
         (SELECT count(*) FROM tb WHERE lang <> 'en') AS r_tot),
       dense AS (SELECT b.bucket, COALESCE(tc.ct, 0) AS ct,
                        COALESCE(rc.cr, 0) AS cr
                 FROM (SELECT unnest(range(4096)) AS bucket) b
                 LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket)),
       wtab AS (SELECT bucket,
           CAST(CAST(ct + 1 AS HUGEINT) * (r_tot + 4096) AS DOUBLE) /
           CAST(CAST(cr + 1 AS HUGEINT) * (t_tot + 4096) AS DOUBLE) AS w
         FROM dense, tot),
       warr AS (SELECT list(w ORDER BY bucket) AS wl FROM wtab),
       scored AS (SELECT doc_id, lang, source,
           len($toks) AS n_tok,
           list_reduce(list_sort(list_transform($toks,
               t -> wl[$bkt + 1])), (x, y) -> x + y)
             / CAST(len($toks) AS DOUBLE) AS score
         FROM documents, warr WHERE lang <> 'en'),
       ranked AS (SELECT *, CAST(row_number() OVER
           (ORDER BY score DESC, doc_id) AS INT) AS rnk FROM scored)
       SELECT doc_id, lang, source, n_tok, score, rnk
       FROM ranked WHERE rnk <= 20 ORDER BY rnk"""
  }

  // --------------------------------------------------------------------
  // q163 — bigram-LM quality scores, HASH-CHECKABLE: the CCNet/KenLM
  // perplexity stage (NgramLm — add-one-smoothed P(b|a), trained on the
  // corpus, self-scored) with every log computed by the PINNED
  // fixed-point integer algorithm `ln_fp` (10^15-scaled atanh series,
  // org.apache.spark.sql.graft.LnFixedPoint) instead of `ln()` — the
  // double `ln()` is last-ulp engine-dependent, which is why the
  // Math.log-based NgramLm.score stayed spec-gated; this twin's score
  // is an int64 DuckDB reproduces bit-for-bit in HUGEINT arithmetic.
  // Scale shape unchanged from NgramLm: two vocab-sized count
  // aggregates (map-side partial), ln over the MODEL tables only
  // (O(vocab) evaluations), two broadcast joins, one doc-keyed partial
  // aggregate. Output avg_nll_fp = floor(mean −ln P)·10^15 — positive
  // by construction (c(a,b) ≤ c(a), 1 ≤ V ⇒ every term ≥ 0) so every
  // division both engines run is floor-on-nonnegative.
  // --------------------------------------------------------------------
  def q163BigramLmFp(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.NgramLm
    val docs = lake(s, dir).documents.select(col("doc_id"), col("text"))
    val model = NgramLm.fit(docs, "text")
    NgramLm.scoreFp(docs, "doc_id", "text", model)
      .orderBy(col("doc_id"))
  }

  /** The DuckDB mirror of [[org.apache.spark.sql.graft.LnFixedPoint]]:
    * a lateral-alias chain over HUGEINT, applied to a column `x` of
    * positive integers. Kept as a builder so the pinned constants exist
    * ONCE in this file. */
  private def lnFpSql(src: String, keep: String): String = {
    val S = "1000000000000000"
    s"""SELECT $keep,
  length(bin(CAST(x AS BIGINT))) - 1 AS e,
  (CAST(x AS HUGEINT) * $S) // (CAST(1 AS HUGEINT) << e) AS m,
  ((m - $S) * $S) // (m + $S) AS z,
  (z*z) // $S AS z2,
  z AS p1, (p1*z2)//$S AS p3, (p3*z2)//$S AS p5, (p5*z2)//$S AS p7,
  (p7*z2)//$S AS p9, (p9*z2)//$S AS p11, (p11*z2)//$S AS p13,
  (p13*z2)//$S AS p15, (p15*z2)//$S AS p17, (p17*z2)//$S AS p19,
  (p19*z2)//$S AS p21, (p21*z2)//$S AS p23, (p23*z2)//$S AS p25,
  (p25*z2)//$S AS p27, (p27*z2)//$S AS p29, (p29*z2)//$S AS p31,
  CAST(e AS HUGEINT)*693147180559945
    + 2*(p1//1+p3//3+p5//5+p7//7+p9//9+p11//11+p13//13+p15//15+p17//17
         +p19//19+p21//21+p23//23+p25//25+p27//27+p29//29+p31//31) AS lnv
  FROM $src"""
  }

  /** The q163 model CTE chain (toks → counts → pinned ln tables →
    * per-bigram nll `terms`) — shared with q167, which carries the
    * per-doc aggregate one exp_fp step further. */
  private lazy val q163Cte = {
    // left joins + coalesce mirror NgramLm.scoreFp's miss semantics
    // (num → lnFp(1) = 0, den → lnFp(V)) even though self-scoring can
    // only miss on empty tokens, which this corpus has none of
    s"""WITH toks AS (
         SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
       uni AS (
         SELECT tok, count(*) AS c_uni
         FROM (SELECT unnest(t) AS tok FROM toks)
         WHERE length(tok) > 0 GROUP BY 1),
       vc AS (SELECT count(*) AS v FROM uni),
       big AS (
         SELECT doc_id, t[i] AS a, t[i+1] AS b
         FROM toks, unnest(generate_series(1, len(t)-1)) AS s(i)
         WHERE len(t) >= 2),
       bic AS (SELECT a, b, count(*) AS c_bi FROM big GROUP BY 1, 2),
       numx AS (SELECT DISTINCT c_bi, c_bi + 1 AS x FROM bic),
       denx AS (SELECT DISTINCT c_uni, c_uni + (SELECT v FROM vc) AS x FROM uni
                UNION SELECT 0 AS c_uni, (SELECT v FROM vc) AS x),
       ln_num AS (SELECT c_bi, lnv AS ln_num FROM (${lnFpSql("numx", "c_bi")})),
       ln_den AS (SELECT c_uni, lnv AS ln_den FROM (${lnFpSql("denx", "c_uni")})),
       terms AS (
         SELECT g.doc_id,
                d.ln_den - COALESCE(n.ln_num, 0) AS nll
         FROM big g
         LEFT JOIN bic ON g.a = bic.a AND g.b = bic.b
         LEFT JOIN ln_num n ON n.c_bi = bic.c_bi
         LEFT JOIN uni ON g.a = uni.tok
         JOIN ln_den d ON d.c_uni = COALESCE(uni.c_uni, 0))"""
  }

  private lazy val q163Oracle =
    s"""$q163Cte
       SELECT doc_id, count(*) AS n_bigrams,
              CAST(sum(CAST(nll AS HUGEINT)) // count(*) AS BIGINT) AS avg_nll_fp
       FROM terms GROUP BY doc_id ORDER BY doc_id"""

  // --------------------------------------------------------------------
  // q166 — DSIR's LOG-domain importance weight, HASH-CHECKABLE: the
  // paper's Σ log(w_bucket) score (q137 oracle-checks the linear-domain
  // mean; logScore stayed spec-gated on engine-dependent ln) with every
  // per-bucket log computed by the pinned fixed-point `ln_fp` of the
  // smoothed ratio's EXACT integer numerator/denominator — the same
  // q163 machinery, so the score is an int64 DuckDB reproduces
  // bit-for-bit. Model-sized ln work (2·4096 driver-side evaluations,
  // broadcast as a literal); scoring is one stateless codegen'd pass,
  // zero shuffles past the token-hash repartition.
  // --------------------------------------------------------------------
  def q166DsirLogFp(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TokenClassifier
    val docs = lake(s, dir).documents
      .select(col("doc_id"), col("text"), col("lang"))
      .repartition(Scale.par(s), col("doc_id")) // md5-heavy token pass
    val feats = TokenClassifier.unigramBuckets(col("text"))
    val w = TokenClassifier.fitRatioLogFp(
      docs.select((col("lang") === "en").as("t"), feats.as("f")), "f", "t")
    docs.filter(col("lang") =!= "en")
      .select(col("doc_id"), col("lang"),
        size(feats).cast("long").as("n_tok"),
        TokenClassifier.logScoreFp(feats, w).as("logw_fp"))
      .orderBy(col("doc_id"))
  }

  private val q166Oracle = {
    val toks = "string_split(trim(text), ' ')"
    val bkt = s"CAST(${dHash("t")} % 4096 AS INT)"
    s"""WITH tb AS (
         SELECT lang, $bkt AS bucket
         FROM (SELECT lang, unnest($toks) AS t FROM documents)),
       tc AS (SELECT bucket, count(*) AS ct FROM tb WHERE lang = 'en' GROUP BY 1),
       rc AS (SELECT bucket, count(*) AS cr FROM tb WHERE lang <> 'en' GROUP BY 1),
       tot AS (SELECT
         (SELECT count(*) FROM tb WHERE lang = 'en') AS t_tot,
         (SELECT count(*) FROM tb WHERE lang <> 'en') AS r_tot),
       dense AS (SELECT b.bucket, COALESCE(tc.ct, 0) AS ct,
                        COALESCE(rc.cr, 0) AS cr
                 FROM (SELECT unnest(range(4096)) AS bucket) b
                 LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket)),
       numx AS (SELECT bucket, CAST((ct + 1) * (r_tot + 4096) AS BIGINT) AS x
                FROM dense, tot),
       denx AS (SELECT bucket, CAST((cr + 1) * (t_tot + 4096) AS BIGINT) AS x
                FROM dense, tot),
       ln_num AS (SELECT bucket, lnv AS ln_num FROM (${lnFpSql("numx", "bucket")})),
       ln_den AS (SELECT bucket, lnv AS ln_den FROM (${lnFpSql("denx", "bucket")})),
       wtab AS (SELECT bucket, CAST(n.ln_num - d.ln_den AS BIGINT) AS w
                FROM ln_num n JOIN ln_den d USING (bucket)),
       warr AS (SELECT list(w ORDER BY bucket) AS wl FROM wtab)
       SELECT doc_id, lang, CAST(len($toks) AS BIGINT) AS n_tok,
              CAST(list_sum(list_transform($toks,
                t -> CAST(wl[$bkt + 1] AS HUGEINT))) AS BIGINT) AS logw_fp
       FROM documents, warr WHERE lang <> 'en' ORDER BY doc_id"""
  }

  /** The DuckDB mirror of [[org.apache.spark.sql.graft.ExpFixedPoint]]
    * — the inverse of [[lnFpSql]], same lateral-alias chain over
    * HUGEINT, applied to a column `x` (any sign, 10^15-scaled). DuckDB
    * `//`/`%` truncate toward zero, so the range reduction uses the
    * mod-normalized floor form the Scala side pins. */
  private def expFpSql(src: String, keep: String): String = {
    val S = "1000000000000000"
    val L = "693147180559945"
    s"""SELECT $keep, x,
  ((CAST(x AS HUGEINT) % $L) + $L) % $L AS r,
  (CAST(x AS HUGEINT) - r) // $L AS q,
  CAST($S AS HUGEINT) AS t0,
  (t0*r)//($S*1) AS t1, (t1*r)//($S*2) AS t2, (t2*r)//($S*3) AS t3,
  (t3*r)//($S*4) AS t4, (t4*r)//($S*5) AS t5, (t5*r)//($S*6) AS t6,
  (t6*r)//($S*7) AS t7, (t7*r)//($S*8) AS t8, (t8*r)//($S*9) AS t9,
  (t9*r)//($S*10) AS t10, (t10*r)//($S*11) AS t11, (t11*r)//($S*12) AS t12,
  (t12*r)//($S*13) AS t13, (t13*r)//($S*14) AS t14, (t14*r)//($S*15) AS t15,
  (t15*r)//($S*16) AS t16, (t16*r)//($S*17) AS t17, (t17*r)//($S*18) AS t18,
  (t18*r)//($S*19) AS t19, (t19*r)//($S*20) AS t20, (t20*r)//($S*21) AS t21,
  t0+t1+t2+t3+t4+t5+t6+t7+t8+t9+t10+t11
    +t12+t13+t14+t15+t16+t17+t18+t19+t20+t21 AS er,
  CASE WHEN x IS NULL OR CAST(x AS HUGEINT) > 9129000000000000 THEN NULL
       WHEN q < -63 THEN 0
       WHEN q >= 0 THEN er * (CAST(1 AS HUGEINT) << CAST(q AS INTEGER))
       ELSE er // (CAST(1 AS HUGEINT) << CAST(-q AS INTEGER)) END AS ev
  FROM $src"""
  }

  /** floor(ln(10^6) · 10^15) — the output-rescale constant q167
    * subtracts before exp so perplexity lands at 10^9 scale (headroom
    * to perplexity ~9.2·10^9 inside int64). */
  private val LnMillionFp = 13815510557964274L

  // --------------------------------------------------------------------
  // q167 — PERPLEXITY in fixed point, HASH-CHECKABLE: the CCNet/KenLM
  // quality gate's published form is perplexity = exp(mean NLL), and
  // q163 stopped one step short of it because `exp` is engine-
  // dependent. The native `exp_fp` (pinned integer Taylor over the
  // mod-normalized range reduction, ExpFixedPoint — the ln_fp family's
  // inverse) closes that: ppl_e9_fp = exp_fp(avg_nll_fp − ln(10^6)_fp)
  // is the document's perplexity scaled 10^9 as an int64 DuckDB
  // reproduces bit-for-bit in HUGEINT. Scale shape = q163 + one more
  // codegen'd scalar per DOC row (never per token).
  // --------------------------------------------------------------------
  def q167PerplexityFp(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.NgramLm
    import org.apache.spark.sql.functions.call_function
    val docs = lake(s, dir).documents.select(col("doc_id"), col("text"))
    val model = NgramLm.fit(docs, "text")
    NgramLm.scoreFp(docs, "doc_id", "text", model)
      .select(col("doc_id"), col("n_bigrams"), col("avg_nll_fp"),
        call_function("exp_fp", col("avg_nll_fp") - lit(LnMillionFp))
          .as("ppl_e9_fp"))
      .orderBy(col("doc_id"))
  }

  private val q167Oracle =
    s"""$q163Cte,
       per AS (
         SELECT doc_id, count(*) AS n_bigrams,
                CAST(sum(CAST(nll AS HUGEINT)) // count(*) AS BIGINT)
                  AS avg_nll_fp
         FROM terms GROUP BY doc_id),
       px AS (SELECT doc_id, n_bigrams, avg_nll_fp,
                     avg_nll_fp - $LnMillionFp AS x FROM per)
       SELECT doc_id, n_bigrams, avg_nll_fp, CAST(ev AS BIGINT) AS ppl_e9_fp
       FROM (${expFpSql("px", "doc_id, n_bigrams, avg_nll_fp")})
       ORDER BY doc_id"""

  // --------------------------------------------------------------------
  // q168 — DSIR resampling in the PAPER's exp domain, HASH-CHECKABLE:
  // Xie et al. §3 keeps a document with probability min(1, exp(log w));
  // q144 oracle-checked a linear-domain stand-in because exp was
  // engine-dependent. With exp_fp the faithful form becomes exact: the
  // per-token mean log-weight (logw_fp DIV n_tok — truncating integral
  // division, identical in Spark and DuckDB) feeds exp_fp, and the
  // Bernoulli test is the EXACT integer compare hash60·10^15 <
  // p_fp·2^60 (TokenClassifier.resampleFp). Output = per-source
  // survivor count + integer id checksum, q144's convention. Scale
  // shape: q166's model machinery + a stateless codegen'd filter —
  // zero extra shuffles; survivors are a pure function of
  // (corpus, model).
  // --------------------------------------------------------------------
  def q168DsirResampleFp(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TokenClassifier
    val docs = lake(s, dir).documents
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .repartition(Scale.par(s), col("doc_id")) // md5-heavy token pass
    val feats = TokenClassifier.unigramBuckets(col("text"))
    val w = TokenClassifier.fitRatioLogFp(
      docs.select((col("lang") === "en").as("t"), feats.as("f")), "f", "t")
    val scored = docs.filter(col("lang") =!= "en")
      .select(col("doc_id"), col("source"),
        size(feats).cast("long").as("n_tok"),
        TokenClassifier.logScoreFp(feats, w).as("logw_fp"))
      .filter(col("n_tok") > 0)
      .withColumn("x", expr("logw_fp DIV n_tok"))
    TokenClassifier.resampleFp(scored, "doc_id", "x")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))
      .orderBy(col("source"))
  }

  private val q168Oracle = {
    val toks = "string_split(trim(text), ' ')"
    val bkt = s"CAST(${dHash("t")} % 4096 AS INT)"
    s"""WITH tb AS (
         SELECT lang, $bkt AS bucket
         FROM (SELECT lang, unnest($toks) AS t FROM documents)),
       tc AS (SELECT bucket, count(*) AS ct FROM tb WHERE lang = 'en' GROUP BY 1),
       rc AS (SELECT bucket, count(*) AS cr FROM tb WHERE lang <> 'en' GROUP BY 1),
       tot AS (SELECT
         (SELECT count(*) FROM tb WHERE lang = 'en') AS t_tot,
         (SELECT count(*) FROM tb WHERE lang <> 'en') AS r_tot),
       dense AS (SELECT b.bucket, COALESCE(tc.ct, 0) AS ct,
                        COALESCE(rc.cr, 0) AS cr
                 FROM (SELECT unnest(range(4096)) AS bucket) b
                 LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket)),
       numx AS (SELECT bucket, CAST((ct + 1) * (r_tot + 4096) AS BIGINT) AS x
                FROM dense, tot),
       denx AS (SELECT bucket, CAST((cr + 1) * (t_tot + 4096) AS BIGINT) AS x
                FROM dense, tot),
       ln_num AS (SELECT bucket, lnv AS ln_num FROM (${lnFpSql("numx", "bucket")})),
       ln_den AS (SELECT bucket, lnv AS ln_den FROM (${lnFpSql("denx", "bucket")})),
       wtab AS (SELECT bucket, CAST(n.ln_num - d.ln_den AS BIGINT) AS w
                FROM ln_num n JOIN ln_den d USING (bucket)),
       warr AS (SELECT list(w ORDER BY bucket) AS wl FROM wtab),
       scored AS (SELECT doc_id, source,
           CAST(len($toks) AS HUGEINT) AS n_tok,
           CAST(list_sum(list_transform($toks,
             t -> CAST(wl[$bkt + 1] AS HUGEINT))) AS HUGEINT) AS logw
         FROM documents, warr WHERE lang <> 'en'),
       px AS (SELECT doc_id, source, CAST(logw // n_tok AS BIGINT) AS x
              FROM scored WHERE n_tok > 0),
       pe AS (${expFpSql("px", "doc_id, source")}),
       kept AS (SELECT doc_id, source FROM pe
         WHERE CAST(${dHash("CAST(doc_id AS VARCHAR)")} AS HUGEINT)
                 * 1000000000000000
               < (CASE WHEN x >= 0 THEN CAST(1000000000000000 AS HUGEINT)
                       ELSE ev END)
                 * CAST(1152921504606846976 AS HUGEINT))
       SELECT source, count(*) AS n_kept,
              CAST(sum(doc_id) AS BIGINT) AS id_sum
       FROM kept GROUP BY 1 ORDER BY source"""
  }

  // --------------------------------------------------------------------
  // q144 — DSIR importance RESAMPLING, the selection stage itself
  // (Xie et al., NeurIPS 2023 §3 — q137 oracle-checks the scoring;
  // this checks the Bernoulli SELECTION): each non-target document is
  // kept iff its deterministic id-hash point in [0,1) falls under
  // `min(1, scale · meanRatioScore)` — acceptance proportional to the
  // importance weight, rational arithmetic only (no engine-dependent
  // exp/ln), reproducible across engines/runs/partitionings. 100 TB
  // story: selection is a stateless codegen'd filter over the scored
  // pass — zero shuffles, zero state; the survivor set is a pure
  // function of (corpus, model, scale), so a resumed pipeline never
  // double-admits.
  // --------------------------------------------------------------------
  def q144DsirResample(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TokenClassifier
    val docs = lake(s, dir).documents
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .repartition(Scale.par(s), col("doc_id")) // md5-heavy token pass
    val feats = TokenClassifier.unigramBuckets(col("text"))
    val w = TokenClassifier.fitRatio(
      docs.select((col("lang") === "en").as("t"), feats.as("f")), "f", "t")
    val scored = docs.filter(col("lang") =!= "en")
      .select(col("doc_id"), col("lang"), col("source"),
        TokenClassifier.meanRatioScore(feats, w).as("score"))
    // survivor-set equality is checked EXACTLY: count + integer id
    // checksum per source (score sums would re-open the double-rounding
    // can q137 already closed for the scoring itself)
    TokenClassifier.resampleLinear(scored, "doc_id", "score", scale = 0.5)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy(col("source"))
  }

  private val q144Oracle = {
    val toks = "string_split(trim(text), ' ')"
    val bkt = s"CAST(${dHash("t")} % 4096 AS INT)"
    s"""WITH tb AS (
         SELECT lang, $bkt AS bucket
         FROM (SELECT lang, unnest($toks) AS t FROM documents)),
       tc AS (SELECT bucket, count(*) AS ct FROM tb WHERE lang = 'en' GROUP BY 1),
       rc AS (SELECT bucket, count(*) AS cr FROM tb WHERE lang <> 'en' GROUP BY 1),
       tot AS (SELECT
         (SELECT count(*) FROM tb WHERE lang = 'en') AS t_tot,
         (SELECT count(*) FROM tb WHERE lang <> 'en') AS r_tot),
       dense AS (SELECT b.bucket, COALESCE(tc.ct, 0) AS ct,
                        COALESCE(rc.cr, 0) AS cr
                 FROM (SELECT unnest(range(4096)) AS bucket) b
                 LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket)),
       wtab AS (SELECT bucket,
           CAST(CAST(ct + 1 AS HUGEINT) * (r_tot + 4096) AS DOUBLE) /
           CAST(CAST(cr + 1 AS HUGEINT) * (t_tot + 4096) AS DOUBLE) AS w
         FROM dense, tot),
       warr AS (SELECT list(w ORDER BY bucket) AS wl FROM wtab),
       scored AS (SELECT doc_id, source,
           CASE WHEN len($toks) = 0 THEN 0.0
                ELSE list_reduce(list_sort(list_transform($toks,
                    t -> wl[$bkt + 1])), (x, y) -> x + y)
                  / CAST(len($toks) AS DOUBLE) END AS score
         FROM documents, warr WHERE lang <> 'en'),
       kept AS (SELECT * FROM scored
         WHERE CAST(${dHash("CAST(doc_id AS VARCHAR)")} AS DOUBLE)
                 / 1152921504606846976.0
               < least(1.0, 0.5 * score))
       SELECT source, count(*) AS n_kept,
              CAST(sum(doc_id) AS BIGINT) AS id_sum
       FROM kept GROUP BY 1 ORDER BY source"""
  }

  // --------------------------------------------------------------------
  // q138 — trained QUALITY CLASSIFIER filter (the fastText-supervised /
  // CCNet stage, Joulin et al. 2017; Wenzek et al. 2020): fit the
  // hashed-BIGRAM ratio model on a labeled train split (good =
  // n_chars ≥ 400, bad = n_chars < 200 — the mid range is held out),
  // score EVERY document, and report per-source keep rates under the
  // `score > 1` decision — the per-domain quality audit that decides
  // which crawls feed the mix. Same model/determinism machinery as
  // q137 (one 4096-bounded fit aggregate, literal-broadcast weights,
  // stateless scoring); the output is one row per source: doc count,
  // predicted-good count (exact int), and their ratio (one division).
  // --------------------------------------------------------------------
  def q138QualityClassifier(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TokenClassifier
    // hash the bigrams ONCE: the fit pass and the scoring pass both
    // read the cached (source, n_chars, buckets) projection — the md5
    // tokenization is the query's dominant cost, not the model math
    val featured = graft.core.CacheScope.cached(
      lake(s, dir).documents
        .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
        .repartition(Scale.par(s), col("doc_id"))
        .select(col("source"), col("n_chars"),
          TokenClassifier.bigramBuckets(col("text")).as("f")))
    val w = TokenClassifier.fitRatio(
      featured.filter(col("n_chars") >= 400 || col("n_chars") < 200)
        .select((col("n_chars") >= 400).as("t"), col("f")), "f", "t")
    featured
      .select(col("source"),
        (TokenClassifier.meanRatioScore(col("f"), w) > 1.0).as("pred"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("pred"), 1)).as("n_good"))
      .withColumn("good_share",
        col("n_good").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("source"))
  }

  private val q138Oracle = {
    val toks = "string_split(trim(text), ' ')"
    val big = s"list_transform(range(len($toks) - 1), " +
      s"i -> concat($toks[i+1], ' ', $toks[i+2]))"
    val bkt = s"CAST(${dHash("t")} % 4096 AS INT)"
    s"""WITH tb AS (
         SELECT good, $bkt AS bucket
         FROM (SELECT n_chars >= 400 AS good, unnest($big) AS t
               FROM documents WHERE n_chars >= 400 OR n_chars < 200)),
       tc AS (SELECT bucket, count(*) AS ct FROM tb WHERE good GROUP BY 1),
       rc AS (SELECT bucket, count(*) AS cr FROM tb WHERE NOT good GROUP BY 1),
       tot AS (SELECT
         (SELECT count(*) FROM tb WHERE good) AS t_tot,
         (SELECT count(*) FROM tb WHERE NOT good) AS r_tot),
       dense AS (SELECT b.bucket, COALESCE(tc.ct, 0) AS ct,
                        COALESCE(rc.cr, 0) AS cr
                 FROM (SELECT unnest(range(4096)) AS bucket) b
                 LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket)),
       wtab AS (SELECT bucket,
           CAST(CAST(ct + 1 AS HUGEINT) * (r_tot + 4096) AS DOUBLE) /
           CAST(CAST(cr + 1 AS HUGEINT) * (t_tot + 4096) AS DOUBLE) AS w
         FROM dense, tot),
       warr AS (SELECT list(w ORDER BY bucket) AS wl FROM wtab),
       scored AS (SELECT source,
           CASE WHEN len($toks) < 2 THEN 0.0 ELSE
             list_reduce(list_sort(list_transform($big,
                 t -> wl[$bkt + 1])), (x, y) -> x + y)
               / CAST(len($toks) - 1 AS DOUBLE) END > 1.0 AS pred
         FROM documents, warr)
       SELECT source,
              count(*) AS n_docs,
              CAST(COALESCE(sum(CASE WHEN pred THEN 1 END), 0) AS BIGINT)
                AS n_good,
              CAST(COALESCE(sum(CASE WHEN pred THEN 1 END), 0) AS DOUBLE)
                / CAST(count(*) AS DOUBLE) AS good_share
       FROM scored GROUP BY source ORDER BY source"""
  }

  // --------------------------------------------------------------------
  // q140 — the ROUND-8 PREP PIPELINE, composed end to end from the new
  // selection stages (the modern data-curation recipe: quality filter →
  // domain selection → dedup → anti-dominance): (A) keep documents the
  // hashed-BIGRAM quality classifier scores > 1 (q138's model, fit on
  // the length-labeled split); (B) of those, keep English docs plus
  // non-English docs the DSIR unigram model scores ≥ 1 toward the
  // `lang='en'` target (q137's model); (C) exact-dedup by trimmed-text
  // hash, smallest doc_id survives; (D) cap every source at its 10
  // longest survivors. Each stage was hash-verified alone (q137/q138/
  // q35/q135); this row certifies the COMPOSITION — same models, same
  // fixed-order folds, one output. Scale: two 4096-bounded model fits,
  // two stateless scoring passes, one dedup shuffle on the text hash,
  // one WindowGroupLimit-capped rank — nothing grows with corpus size
  // but the linear passes.
  // --------------------------------------------------------------------
  def q140PrepV2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.{Curation, TokenClassifier}
    val docs = graft.core.CacheScope.cached(
      lake(s, dir).documents
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
        .repartition(Scale.par(s), col("doc_id")))
    val big = TokenClassifier.bigramBuckets(col("text"))
    val uni = TokenClassifier.unigramBuckets(col("text"))
    val wQ = TokenClassifier.fitRatio(
      docs.filter(col("n_chars") >= 400 || col("n_chars") < 200)
        .select((col("n_chars") >= 400).as("t"), big.as("f")), "f", "t")
    val wD = TokenClassifier.fitRatio(
      docs.select((col("lang") === "en").as("t"), uni.as("f")), "f", "t")
    val selected = docs
      .filter(TokenClassifier.meanRatioScore(big, wQ) > 1.0)           // (A)
      .filter(col("lang") === "en" ||
        TokenClassifier.meanRatioScore(uni, wD) >= 1.0)                // (B)
    val deduped = selected                                             // (C)
      .withColumn("_h", md5(trim(col("text"))))
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("_h")).orderBy(col("doc_id"))))
      .filter(col("_r") === 1).drop("_h", "_r")
    Curation.capPerSource(deduped, "doc_id", "source", "n_chars", k = 10) // (D)
      .select(col("source"), col("doc_id"), col("lang"), col("n_chars"),
        col("src_rank").cast("long").as("src_rank"))
      .orderBy(col("source"), col("src_rank"))
  }

  private val q140Oracle = {
    val toks = "string_split(trim(text), ' ')"
    val bigr = s"list_transform(range(len($toks) - 1), " +
      s"i -> concat($toks[i+1], ' ', $toks[i+2]))"
    val bkt = s"CAST(${dHash("t")} % 4096 AS INT)"
    s"""WITH qtb AS (
         SELECT good, $bkt AS bucket
         FROM (SELECT n_chars >= 400 AS good, unnest($bigr) AS t
               FROM documents WHERE n_chars >= 400 OR n_chars < 200)),
       qtc AS (SELECT bucket, count(*) AS ct FROM qtb WHERE good GROUP BY 1),
       qrc AS (SELECT bucket, count(*) AS cr FROM qtb WHERE NOT good GROUP BY 1),
       qtot AS (SELECT
         (SELECT count(*) FROM qtb WHERE good) AS t_tot,
         (SELECT count(*) FROM qtb WHERE NOT good) AS r_tot),
       qdense AS (SELECT b.bucket, COALESCE(qtc.ct, 0) AS ct,
                         COALESCE(qrc.cr, 0) AS cr
                  FROM (SELECT unnest(range(4096)) AS bucket) b
                  LEFT JOIN qtc USING (bucket) LEFT JOIN qrc USING (bucket)),
       qw AS (SELECT bucket,
           CAST(CAST(ct + 1 AS HUGEINT) * (r_tot + 4096) AS DOUBLE) /
           CAST(CAST(cr + 1 AS HUGEINT) * (t_tot + 4096) AS DOUBLE) AS w
         FROM qdense, qtot),
       qwarr AS (SELECT list(w ORDER BY bucket) AS qwl FROM qw),
       dtb AS (
         SELECT lang, $bkt AS bucket
         FROM (SELECT lang, unnest($toks) AS t FROM documents)),
       dtc AS (SELECT bucket, count(*) AS ct FROM dtb WHERE lang = 'en' GROUP BY 1),
       drc AS (SELECT bucket, count(*) AS cr FROM dtb WHERE lang <> 'en' GROUP BY 1),
       dtot AS (SELECT
         (SELECT count(*) FROM dtb WHERE lang = 'en') AS t_tot,
         (SELECT count(*) FROM dtb WHERE lang <> 'en') AS r_tot),
       ddense AS (SELECT b.bucket, COALESCE(dtc.ct, 0) AS ct,
                         COALESCE(drc.cr, 0) AS cr
                  FROM (SELECT unnest(range(4096)) AS bucket) b
                  LEFT JOIN dtc USING (bucket) LEFT JOIN drc USING (bucket)),
       dw AS (SELECT bucket,
           CAST(CAST(ct + 1 AS HUGEINT) * (r_tot + 4096) AS DOUBLE) /
           CAST(CAST(cr + 1 AS HUGEINT) * (t_tot + 4096) AS DOUBLE) AS w
         FROM ddense, dtot),
       dwarr AS (SELECT list(w ORDER BY bucket) AS dwl FROM dw),
       scored AS (SELECT doc_id, text, lang, source, n_chars,
           CASE WHEN len($toks) < 2 THEN 0.0 ELSE
             list_reduce(list_sort(list_transform($bigr,
                 t -> qwl[$bkt + 1])), (x, y) -> x + y)
               / CAST(len($toks) - 1 AS DOUBLE) END AS q_score,
           list_reduce(list_sort(list_transform($toks,
               t -> dwl[$bkt + 1])), (x, y) -> x + y)
             / CAST(len($toks) AS DOUBLE) AS d_score
         FROM documents, qwarr, dwarr),
       selected AS (SELECT * FROM scored
         WHERE q_score > 1.0 AND (lang = 'en' OR d_score >= 1.0)),
       deduped AS (SELECT * FROM (SELECT *, row_number() OVER
           (PARTITION BY md5(trim(text)) ORDER BY doc_id) AS _r
         FROM selected) WHERE _r = 1),
       capped AS (SELECT source, doc_id, lang, n_chars,
           row_number() OVER (PARTITION BY source
                              ORDER BY n_chars DESC, doc_id) AS src_rank
         FROM deduped)
       SELECT source, doc_id, lang, n_chars, CAST(src_rank AS BIGINT) AS src_rank
       FROM capped WHERE src_rank <= 10
       ORDER BY source, src_rank"""
  }

  val oracle: Map[String, String] = Map(
    "q140_prep_v2" -> q140Oracle,
    "q137_dsir" -> q137Oracle,
    "q163_bigram_lm_fp" -> q163Oracle,
    "q166_dsir_log_fp" -> q166Oracle,
    "q167_perplexity_fp" -> q167Oracle,
    "q168_dsir_resample_fp" -> q168Oracle,
    "q144_dsir_resample" -> q144Oracle,
    "q138_quality_classifier" -> q138Oracle,
    "q70_stratified_sample" -> q70Oracle,
    "q71_vocab_topk" -> q71Oracle,
    "q72_contamination" -> q72Oracle,
    "q74_repetition_flags" -> q74Oracle,
    "q75_sequence_packing" -> q75Oracle,
    "q76_corpus_mix" -> q76Oracle,
    "q86_weighted_sample" -> q86Oracle,
    "q89_bpe_pairs" -> q89Oracle,
    "q90_chunking" -> q90Oracle,
    "q91_normalized_dedup" -> q91Oracle,
    "q92_shuffle_shards" -> q92Oracle,
    "q93_gopher_filters" -> q93Oracle,
    "q94_boilerplate_removal" -> q94Oracle,
    "q95_nfc_normalize" -> q95Oracle,
    "q96_temperature_weights" -> q96Oracle,
    "q97_heavy_hitters" -> q97Oracle,
    "q98_dedup_keep_best" -> q98Oracle,
    "q101_train_val_test" -> q101Oracle,
    "q102_curation_report" -> q102Oracle,
    "q103_split_budget" -> q103Oracle)
}
