package graft.queries

import graft.core.{CacheScope, Lake}
import graft.functions.Scale
import graft.functions.TextFns._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data text pipeline: token statistics, language ID, quality
  * scoring, fingerprinting, exact + MinHash-LSH + SimHash deduplication,
  * n-gram Jaccard similarity — each oracle-matched against DuckDB over the
  * `documents` table.
  *
  * Hash portability: every hash is the md5-derived 60-bit integer of
  * [[graft.functions.TextFns.hash60]], so DuckDB computes bit-identical
  * values (`CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`).
  *
  * Scale design: per-doc feature extraction is narrow (scan-parallel, no
  * shuffle). Near-dup candidate generation is LSH banding — the shuffle key
  * is (band, bandKey), cardinality O(docs×bands) — never the O(n²) pairwise
  * join. For exact Jaccard, q37 is the bucket-blocked quadratic reference
  * and q37b the scale path: a prefix-filtered (AllPairs/PPJoin) sparse
  * equi-join, complete with no quadratic stage; q36 is the approximate
  * 100 TB path.
  */
object TextOps {

  private def lake(s: SparkSession, dir: String) = Lake(s, dir)

  /** DuckDB fragment for hash60 (keep in sync with TextFns.hash60). */
  private def dHash(x: String) =
    s"CAST(concat('0x', substr(md5($x),1,15)) AS BIGINT)"

  // --------------------------------------------------------------------
  // q31 — token statistics per language: token counting (whitespace
  // tokenizer) + char/byte stats. Narrow projection then a 5-group agg.
  // --------------------------------------------------------------------
  def q31TokenStats(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).documents
      .select(
        col("lang"),
        size(tokens(col("text"))).as("n_toks"),
        length(col("text")).as("n_chars_m"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_tokens"),
        Det.davgInt(col("n_toks")).as("avg_tokens"),
        Det.davgInt(col("n_chars_m")).as("avg_chars"),
        min(col("n_toks")).as("min_tokens"),
        max(col("n_toks")).as("max_tokens"))
      .orderBy(col("lang"))

  private val q31Oracle =
    """SELECT lang, count(*) AS n_docs,
              CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS total_tokens,
              CAST(sum(len(string_split(trim(text), ' '))) AS DOUBLE) / count(*) AS avg_tokens,
              CAST(sum(length(text)) AS DOUBLE) / count(*) AS avg_chars,
              min(len(string_split(trim(text), ' '))) AS min_tokens,
              max(len(string_split(trim(text), ' '))) AS max_tokens
       FROM documents GROUP BY lang ORDER BY lang"""

  // --------------------------------------------------------------------
  // q32 — language identification by marker-token scoring (the n-gram
  // heuristic family): count marker hits per language, argmax with a fixed
  // tiebreak order. Confusion-matrix output (metadata lang × predicted).
  // --------------------------------------------------------------------
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "data"),
    "de" -> Seq("window", "batch", "merge"),
    "fr" -> Seq("sort", "stream", "filter"),
    "es" -> Seq("join", "hash", "scan"),
    "zh" -> Seq("spark", "query", "table"))

  def q32LangId(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    def score(ws: Seq[String]): Column =
      size(filter(toks, t => t.isin(ws: _*)))
    val scored = lake(s, dir).documents
      .repartition(Scale.par(s), col("doc_id"))
      .select(col("doc_id") +: col("lang") +:
        markers.map { case (l, ws) => score(ws).as(s"s_$l") }: _*)
    // argmax with fixed precedence en > de > fr > es > zh
    val best = markers.map(m => col(s"s_${m._1}"))
    val predicted = markers.foldLeft(lit(null).cast(StringType)) {
      case (acc, (l, _)) =>
        coalesce(acc, when(col(s"s_$l") === greatest(best: _*), lit(l)))
    }
    scored
      .withColumn("predicted", predicted)
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("predicted"))
  }

  private val q32Oracle = {
    val scores = markers.map { case (l, ws) =>
      val inList = ws.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(trim(text), ' '), t -> t IN ($inList))) AS s_$l"
    }.mkString(",\n                ")
    val bestExpr = markers.map(m => s"s_${m._1}").mkString(", ")
    val caseArms = markers.map { case (l, _) =>
      s"WHEN s_$l = greatest($bestExpr) THEN '$l'"
    }.mkString(" ")
    s"""WITH scored AS (
         SELECT doc_id, lang,
                $scores
         FROM documents)
       SELECT lang, CASE $caseArms END AS predicted, count(*) AS n_docs
       FROM scored GROUP BY 1, 2 ORDER BY lang, predicted"""
  }

  // --------------------------------------------------------------------
  // q33 — document quality scoring: length, mean token length, stopword
  // ratio → weighted score → quality bucket. All-double arithmetic in a
  // fixed expression order → bit-deterministic.
  // --------------------------------------------------------------------
  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  def q33QualityScore(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    lake(s, dir).documents
      .repartition(Scale.par(s), col("doc_id"))
      .select(col("doc_id"), col("text"),
        size(toks).as("n_toks"),
        size(filter(toks, t => t.isin(stopwords: _*))).as("n_stop"),
        length(regexp_replace(col("text"), " ", "")).as("n_alpha"))
      .select(
        col("doc_id"), col("n_toks"),
        (col("n_stop").cast(DoubleType) / col("n_toks")).as("stop_ratio"),
        (col("n_alpha").cast(DoubleType) / col("n_toks")).as("avg_token_len"))
      .withColumn("quality_score",
        col("stop_ratio") * 0.4
          + least(col("n_toks").cast(DoubleType) / 100.0, lit(1.0)) * 0.3
          + least(col("avg_token_len") / 8.0, lit(1.0)) * 0.3)
      .withColumn("quality_bucket",
        when(col("quality_score") >= 0.5, "high")
          .when(col("quality_score") >= 0.35, "medium")
          .otherwise("low"))
      .orderBy(col("doc_id"))
  }

  private val q33Oracle =
    s"""WITH f AS (
         SELECT doc_id,
                len(string_split(trim(text), ' ')) AS n_toks,
                len(list_filter(string_split(trim(text), ' '),
                    t -> t IN (${stopwords.map(w => s"'$w'").mkString(", ")}))) AS n_stop,
                length(replace(text, ' ', '')) AS n_alpha
         FROM documents),
       g AS (
         SELECT doc_id, n_toks,
                CAST(n_stop AS DOUBLE) / n_toks AS stop_ratio,
                CAST(n_alpha AS DOUBLE) / n_toks AS avg_token_len
         FROM f),
       h AS (
         SELECT *, stop_ratio * 0.4
                   + least(CAST(n_toks AS DOUBLE) / 100.0, 1.0) * 0.3
                   + least(avg_token_len / 8.0, 1.0) * 0.3 AS quality_score
         FROM g)
       SELECT doc_id, n_toks, stop_ratio, avg_token_len, quality_score,
              CASE WHEN quality_score >= 0.5 THEN 'high'
                   WHEN quality_score >= 0.35 THEN 'medium'
                   ELSE 'low' END AS quality_bucket
       FROM h ORDER BY doc_id"""

  // --------------------------------------------------------------------
  // q34 — document fingerprinting: whole-doc md5, minimum char-8-gram
  // hash (the 1-slot winnowing sketch), distinct-gram count. Narrow
  // per-row expressions only.
  // --------------------------------------------------------------------
  def q34Fingerprint(s: SparkSession, dir: String): DataFrame = {
    val grams = charGrams(col("text"), 8)
    lake(s, dir).documents
      .repartition(Scale.par(s), col("doc_id"))
      .select(
        col("doc_id"),
        md5(col("text")).as("doc_md5"),
        array_min(transform(grams, g => hash60(g))).as("min_gram_hash"),
        size(grams).as("n_grams"))
      .orderBy(col("doc_id"))
  }

  private val q34Oracle =
    s"""SELECT doc_id, md5(text) AS doc_md5,
              list_min(list_transform(
                list_distinct(list_transform(range(length(text) - 7),
                  i -> substr(text, i + 1, 8))),
                g -> ${dHash("g")})) AS min_gram_hash,
              len(list_distinct(list_transform(range(length(text) - 7),
                  i -> substr(text, i + 1, 8)))) AS n_grams
       FROM documents ORDER BY doc_id"""

  // --------------------------------------------------------------------
  // q35 — exact deduplication by normalized-content hash: the hash-groupBy
  // dedup. One shuffle keyed by md5 — uniform keys, no skew at any scale.
  // --------------------------------------------------------------------
  def q35ExactDedup(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).documents
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("content_key"))
      .groupBy(col("content_key"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("canonical_id"))
      .orderBy(col("canonical_id"))

  private val q35Oracle =
    """SELECT md5(lower(trim(text))) AS content_key, count(*) AS n_copies,
              min(doc_id) AS canonical_id
       FROM documents GROUP BY 1 ORDER BY canonical_id"""

  // --------------------------------------------------------------------
  // q36 — MinHash + LSH near-duplicate detection (the 100 TB dedup path):
  // word-3-shingles → 12-slot MinHash → 4 bands × 3 rows → banded
  // self-join (the ONLY shuffle, key cardinality docs×4) → exact-Jaccard
  // verification of candidates → pairs with J ≥ 0.5. Catches every
  // planted near-dup (J ≈ 0.98) with collision probability ≈ 1.
  // --------------------------------------------------------------------
  private val MH = 12 // minhash slots
  private val BANDS = 4
  private val ROWS = 3

  def q36MinHashLsh(s: SparkSession, dir: String): DataFrame =
    // Single shared implementation with the library facade
    // (Graft.nearDupPairs) — see graft.operators.NearDup for the plan
    // shape (cached hashed-shingle projection, banded self-join as the
    // only shuffle, verify joins by id).
    graft.operators.NearDup.minHashLshPairs(
      lake(s, dir).documents, "doc_id", "text",
      shingleSize = 3, minHashes = MH, bands = BANDS, threshold = 0.5,
      partitionWidth = Some(Scale.par(s)),
      // PIN the portable md5 family: this query is oracle-checked, and a
      // session-level fastHash flip must never change a verified answer
      fastOverride = Some(false))
      .orderBy(col("d1"), col("d2"))

  /** The q36 pair pipeline as a bare CTE list ending in
    * `verified(d1, d2, jaccard)` — shared by q36 (pair listing) and q77
    * (recursive component closure over the same pairs), so the two
    * oracles cannot drift. Callers prefix `WITH ` / `WITH RECURSIVE `. */
  private val q36PairCtes = {
    // slot i = min(h1 + i*h2); h2s precomputed per shingle in the sh2 CTE
    val mh = (0 until MH).map(i =>
      s"list_min(list_transform(range(len(hs)), j -> hs[j+1] + $i * h2s[j+1]))")
      .mkString(",\n                  ")
    s"""sh AS (
         SELECT doc_id,
                list_transform(
                  list_distinct(list_transform(
                    range(len(string_split(trim(text), ' ')) - 2),
                    i -> concat_ws(' ', string_split(trim(text), ' ')[i+1],
                                   string_split(trim(text), ' ')[i+2],
                                   string_split(trim(text), ' ')[i+3]))),
                  s -> ${dHash("s")}) AS hs
         FROM documents
         WHERE len(string_split(trim(text), ' ')) >= 3),
       sh2 AS (
         SELECT doc_id, hs,
                list_transform(hs, h ->
                  CAST(concat('0x', substr(md5(CAST(h AS VARCHAR)), 1, 12)) AS BIGINT)) AS h2s
         FROM sh),
       sig AS (
         SELECT doc_id, [$mh] AS sig FROM sh2),
       bands AS (
         SELECT doc_id, b.b AS band,
                md5(array_to_string(list_transform(
                  list_slice(sig, b.b * $ROWS + 1, b.b * $ROWS + $ROWS),
                  x -> CAST(x AS VARCHAR)), ',')) AS bkey
         FROM sig CROSS JOIN (SELECT unnest(range($BANDS)) AS b) b),
       cand AS (
         SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       verified AS (
         SELECT d1, d2,
                CAST(len(list_intersect(s1.hs, s2.hs)) AS DOUBLE)
                / (len(s1.hs) + len(s2.hs)
                   - len(list_intersect(s1.hs, s2.hs))) AS jaccard
         FROM cand
         JOIN sh s1 ON s1.doc_id = d1
         JOIN sh s2 ON s2.doc_id = d2)"""
  }

  private val q36Oracle =
    s"""WITH $q36PairCtes
       SELECT d1, d2, jaccard FROM verified
       WHERE jaccard >= 0.5 ORDER BY d1, d2"""

  // --------------------------------------------------------------------
  // q37 — exact n-gram Jaccard similarity, length-bucket-blocked: the
  // quadratic baseline near-dup op. Blocking key = n_chars/8: candidate
  // pairs must sit in the same or adjacent 8-char bucket, i.e. the op
  // finds near-dups differing by < 8 chars (planted pairs differ by ~4).
  // Narrow buckets cut the within-bucket pair product ~100× vs one wide
  // bucket and give the equi-join enough distinct keys to parallelize.
  // q36 is the scale path; this is the quadratic reference check.
  // --------------------------------------------------------------------
  def q37NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = CacheScope.cached(lake(s, dir).documents
      .repartition(Scale.par(s), col("doc_id"))
      // floor-division bucket: Spark double→int cast truncates while DuckDB
      // CAST rounds, so the oracle uses `//` (floor) — identical on the
      // non-negative n_chars domain.
      .select(col("doc_id"), floor(col("n_chars") / lit(8)).cast(IntegerType).as("bucket"),
        hashedShingles(col("text"), 3).as("hs"))
      .filter(size(col("hs")) > 0))
    // Candidate generation shuffles ONLY (doc_id, bucket, |hs|): the long
    // shingle arrays stay out of the self-join entirely and are fetched by
    // id AFTER the size-ratio prune has discarded ~95% of candidate pairs
    // (the q36 verify pattern). Shuffled bytes drop by the prune ratio ×
    // the array width — at sf0.1 this was 1/3 of the whole bench.
    val keys = sh.select(col("doc_id"), col("bucket"), size(col("hs")).as("n"))
    val a = keys.select(col("doc_id").as("d1"), col("bucket").as("k1"), col("n").as("na"))
    val b = keys.select(col("doc_id").as("d2"), col("bucket").as("k2"), col("n").as("nb"))
    val same = a.join(b, col("k1") === col("k2") && col("d1") < col("d2"))
      .select(col("d1"), col("d2"), col("na"), col("nb"))
    val adj = a.join(b, col("k1") + 1 === col("k2") && col("d1") =!= col("d2"))
      // the size-ratio prune is symmetric in (na, nb), so the sizes need
      // not swap when least/greatest reorders the pair
      .select(least(col("d1"), col("d2")).as("d1"),
        greatest(col("d1"), col("d2")).as("d2"), col("na"), col("nb"))
    val cand = same.unionByName(adj)
      // Result-preserving prune: J ≥ 0.8 forces min(na,nb)/max(na,nb) ≥ 0.8
      // (integer form 5·min ≥ 4·max), so the expensive intersect is skipped
      // for the ~95% of candidate pairs that fail a two-int compare. The
      // oracle needs no equivalent — the final output is identical.
      .filter(col("na") * 5 >= col("nb") * 4 && col("nb") * 5 >= col("na") * 4)
      .select(col("d1"), col("d2"))
    cand
      .join(sh.select(col("doc_id").as("d1"), col("hs").as("sh1")), "d1")
      .join(sh.select(col("doc_id").as("d2"), col("hs").as("sh2")), "d2")
      .select(col("d1"), col("d2"),
        size(array_intersect(col("sh1"), col("sh2"))).as("inter"),
        size(col("sh1")).as("na"), size(col("sh2")).as("nb"))
      .select(col("d1"), col("d2"),
        jaccardFromSizes(col("inter"), col("na"), col("nb")).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy(col("d1"), col("d2"))
  }

  // --------------------------------------------------------------------
  // q37b — exact n-gram Jaccard at SCALE: prefix filtering (AllPairs /
  // PPJoin, Bayardo et al. WWW '07) replaces q37's length-bucket
  // blocking. Every shingle gets a global canonical rank (corpus
  // frequency asc, hash asc — rarest first); a doc with n shingles
  // exposes only its first n − ⌈t·n⌉ + 1 rarest shingles as join keys,
  // and the prefix-filter theorem guarantees every pair with J ≥ t
  // shares at least one key in BOTH prefixes — so candidate generation
  // is a sparse equi-join on RARE tokens (self-skew-resistant: hot
  // shingles are never prefix keys), complete by construction, with no
  // quadratic stage and no length restriction. ⌈t·n⌉ is computed in
  // integer arithmetic ((4n+4) div 5) — a floating 0.8·n would round
  // up on exact multiples and silently shorten prefixes, losing pairs.
  // Verification fetches shingle arrays by id AFTER the symmetric
  // size-ratio prune (the q36/q37 pattern). Unlike q37, the result is
  // ALL pairs with J ≥ 0.8, bucket-free — the oracle derives the same
  // set through DuckDB's inverted-index join.
  // --------------------------------------------------------------------
  def q37bPrefixJaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = CacheScope.cached(lake(s, dir).documents
      .repartition(Scale.par(s), col("doc_id"))
      .select(col("doc_id"), hashedShingles(col("text"), 3).as("hs"))
      .filter(size(col("hs")) > 0))
    val toks = sh.select(col("doc_id"), size(col("hs")).as("n"),
      explode(col("hs")).as("h"))
    // global canonical order: corpus frequency asc, hash asc. The freq
    // table is shingle-vocabulary sized.
    val freq = toks.groupBy(col("h")).agg(count(lit(1)).as("f"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("f"), col("h"))
    val prefix = toks.join(freq, "h")
      .withColumn("rn", row_number().over(w))
      // prefix length n − ⌈4n/5⌉ + 1, all-integer
      .filter(col("rn") <= col("n") - ((col("n") * 4 + 4).divide(5).cast(IntegerType)) + 1)
      .select(col("doc_id"), col("h"), col("n"))
    val p1 = prefix.select(col("doc_id").as("d1"), col("h"), col("n").as("na"))
    val p2 = prefix.select(col("doc_id").as("d2"), col("h"), col("n").as("nb"))
    val cand = p1.join(p2, "h")
      .filter(col("d1") < col("d2"))
      .filter(col("na") * 5 >= col("nb") * 4 && col("nb") * 5 >= col("na") * 4)
      .select(col("d1"), col("d2")).distinct()
    cand
      .join(sh.select(col("doc_id").as("d1"), col("hs").as("sh1")), "d1")
      .join(sh.select(col("doc_id").as("d2"), col("hs").as("sh2")), "d2")
      .select(col("d1"), col("d2"),
        size(array_intersect(col("sh1"), col("sh2"))).as("inter"),
        size(col("sh1")).as("na"), size(col("sh2")).as("nb"))
      .select(col("d1"), col("d2"),
        jaccardFromSizes(col("inter"), col("na"), col("nb")).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy(col("d1"), col("d2"))
  }

  private val q37bOracle =
    s"""WITH sh AS (
         SELECT doc_id,
                list_transform(
                  list_distinct(list_transform(
                    range(len(string_split(trim(text), ' ')) - 2),
                    i -> concat_ws(' ', string_split(trim(text), ' ')[i+1],
                                   string_split(trim(text), ' ')[i+2],
                                   string_split(trim(text), ' ')[i+3]))),
                  s -> ${dHash("s")}) AS hs
         FROM documents
         WHERE len(string_split(trim(text), ' ')) >= 3),
       tok AS (SELECT doc_id, len(hs) AS n, unnest(hs) AS h FROM sh),
       inter AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2,
                count(*) AS i, any_value(a.n) AS na, any_value(b.n) AS nb
         FROM tok a JOIN tok b ON a.h = b.h AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id)
       SELECT d1, d2, CAST(i AS DOUBLE) / (na + nb - i) AS jaccard
       FROM inter
       WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.8
       ORDER BY d1, d2"""

  private val q37Oracle =
    s"""WITH sh AS (
         SELECT doc_id, CAST(n_chars // 8 AS INTEGER) AS bucket,
                list_transform(
                  list_distinct(list_transform(
                    range(len(string_split(trim(text), ' ')) - 2),
                    i -> concat_ws(' ', string_split(trim(text), ' ')[i+1],
                                   string_split(trim(text), ' ')[i+2],
                                   string_split(trim(text), ' ')[i+3]))),
                  s -> ${dHash("s")}) AS hs
         FROM documents
         WHERE len(string_split(trim(text), ' ')) >= 3),
       pairs AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2, a.hs AS sh1, b.hs AS sh2
         FROM sh a JOIN sh b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
         UNION ALL
         SELECT least(a.doc_id, b.doc_id) AS d1, greatest(a.doc_id, b.doc_id) AS d2,
                a.hs AS sh1, b.hs AS sh2
         FROM sh a JOIN sh b ON a.bucket + 1 = b.bucket AND a.doc_id <> b.doc_id)
       SELECT d1, d2,
              CAST(len(list_intersect(sh1, sh2)) AS DOUBLE)
              / (len(sh1) + len(sh2) - len(list_intersect(sh1, sh2))) AS jaccard
       FROM pairs
       WHERE CAST(len(list_intersect(sh1, sh2)) AS DOUBLE)
             / (len(sh1) + len(sh2) - len(list_intersect(sh1, sh2))) >= 0.8
       ORDER BY d1, d2"""

  // --------------------------------------------------------------------
  // q38 — SimHash near-dup: 32-bit fingerprint per doc, Hamming-distance
  // histogram over pairs with distance ≤ 10. Pair generation is a banded
  // equi-join, NEVER a cross join: 11 pigeonhole bands (10 × 3 bits + the
  // top 2 bits) guarantee any pair within Hamming ≤ 10 agrees exactly on
  // ≥ 1 band, and counting each surviving pair only at its FIRST matching
  // band (an inline bit test — no distinct shuffle) makes the banded join
  // output-identical to the all-pairs formulation. A threshold this loose
  // on a 32-bit sketch admits near-quadratic candidates in the worst case
  // — q38b (wider fingerprint, tight threshold, selective bands) is the
  // 100 TB configuration; this op is the reference histogram.
  // --------------------------------------------------------------------
  private val SH_BANDS = 11 // pigeonhole: threshold 10 needs ≥ 11 bands

  /** Band j of a 32-bit fingerprint: bits [3j, 3j+3), top band 2 bits. */
  private def shBand(fp: Column, j: Int): Column =
    shiftright(fp, 3 * j).bitwiseAND(lit(if (j == SH_BANDS - 1) 3L else 7L))

  def q38SimHash(s: SparkSession, dir: String): DataFrame = {
    // 12 bytes/doc; saves recomputing the fingerprint per side
    val fp = CacheScope.cached(lake(s, dir).documents
      .repartition(Scale.par(s), col("doc_id"))
      .select(col("doc_id"), simHash(tokens(col("text"))).as("fp")))
    val banded = fp.select(col("doc_id"), col("fp"),
      posexplode(array((0 until SH_BANDS).map(j => shBand(col("fp"), j)): _*))
        .as(Seq("band", "bval")))
    // A close pair matches on several bands; keep it only where band ==
    // its first matching band so each pair is counted exactly once.
    val firstMatch = (0 until SH_BANDS).foldLeft(lit(null).cast(IntegerType)) {
      (acc, j) => coalesce(acc,
        when(shBand(col("a.fp"), j) === shBand(col("b.fp"), j), lit(j)))
    }
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval")
          && col("a.doc_id") < col("b.doc_id"))
      .filter(col("a.band") === firstMatch)
      .select(hamming(col("a.fp"), col("b.fp")).as("hamming_dist"))
      .filter(col("hamming_dist") <= 10)
      .groupBy(col("hamming_dist"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("hamming_dist"))
  }

  private val q38Oracle =
    s"""WITH th AS (
         SELECT doc_id, j,
                CASE WHEN (${dHash("t.tok")} >> j) & 1 = 1 THEN 1 ELSE -1 END AS sign
         FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
               FROM documents) t
         CROSS JOIN (SELECT unnest(range(32)) AS j)),
       votes AS (
         SELECT doc_id, j, sum(sign) AS v FROM th GROUP BY 1, 2),
       fp AS (
         SELECT doc_id,
                CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS fp
         FROM votes GROUP BY 1)
       SELECT bit_count(xor(a.fp, b.fp)) AS hamming_dist, count(*) AS n_pairs
       FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.fp, b.fp)) <= 10
       GROUP BY 1 ORDER BY hamming_dist"""

  // --------------------------------------------------------------------
  // q38b — SimHash at the 100 TB configuration: 60-bit fingerprint,
  // Hamming ≤ 3, 4 pigeonhole bands × 15 bits. A 15-bit band key has 32k
  // values, so the banded self-join prunes candidates ~(32k/4)× vs
  // all-pairs while the pigeonhole bound (4 bands > 3 differing bits)
  // keeps recall exact. Emits the near-dup pairs themselves (bounded
  // output), not a histogram — this is the operator a dedup pipeline
  // consumes.
  // --------------------------------------------------------------------
  private val SHB_BANDS = 4
  private val SHB_BITS = 15

  private def shbBand(fp: Column, j: Int): Column =
    shiftright(fp, SHB_BITS * j).bitwiseAND(lit((1L << SHB_BITS) - 1))

  def q38bSimHashScale(s: SparkSession, dir: String): DataFrame = {
    val fp = CacheScope.cached(lake(s, dir).documents
      .repartition(Scale.par(s), col("doc_id"))
      .select(col("doc_id"), simHashW(tokens(col("text")), 60).as("fp")))
    val banded = fp.select(col("doc_id"), col("fp"),
      posexplode(array((0 until SHB_BANDS).map(j => shbBand(col("fp"), j)): _*))
        .as(Seq("band", "bval")))
    val firstMatch = (0 until SHB_BANDS).foldLeft(lit(null).cast(IntegerType)) {
      (acc, j) => coalesce(acc,
        when(shbBand(col("a.fp"), j) === shbBand(col("b.fp"), j), lit(j)))
    }
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval")
          && col("a.doc_id") < col("b.doc_id"))
      .filter(col("a.band") === firstMatch)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        hamming(col("a.fp"), col("b.fp")).as("hamming_dist"))
      .filter(col("hamming_dist") <= 3)
      .orderBy(col("d1"), col("d2"))
  }

  private val q38bOracle =
    s"""WITH th AS (
         SELECT doc_id, j,
                CASE WHEN (${dHash("t.tok")} >> j) & 1 = 1 THEN 1 ELSE -1 END AS sign
         FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
               FROM documents) t
         CROSS JOIN (SELECT unnest(range(60)) AS j)),
       votes AS (
         SELECT doc_id, j, sum(sign) AS v FROM th GROUP BY 1, 2),
       fp AS (
         SELECT doc_id,
                CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS fp
         FROM votes GROUP BY 1)
       SELECT a.doc_id AS d1, b.doc_id AS d2,
              bit_count(xor(a.fp, b.fp)) AS hamming_dist
       FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.fp, b.fp)) <= 3
       ORDER BY d1, d2"""

  // --------------------------------------------------------------------
  // q51 — TF-IDF-shaped term importance: tf per (doc, term), document
  // frequency per term, score = tf·N/df (the rational IDF — log-free
  // because libm log is not bit-identical across engines), top-5 terms
  // per doc. Shape at scale: one shuffle for tf, the scalar N broadcast,
  // a doc-partitioned window. The term-df side is VOCABULARY-sized (it
  // grows with the corpus), so its join strategy is left to AQE — a hard
  // broadcast() hint would collect the whole vocabulary to the driver at
  // scale; AQE still broadcasts it when it is actually small.
  // --------------------------------------------------------------------
  def q51TermImportance(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = lake(s, dir).documents
    val toks = docs.repartition(Scale.par(s), col("doc_id"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n)) // n is ONE row — always broadcastable
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        ((col("tf") * col("n_docs")).cast(DoubleType) / col("df")).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .orderBy(col("doc_id"), col("rnk"))
  }

  private val q51Oracle =
    """WITH toks AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
         FROM documents),
       tf AS (
         SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       dfreq AS (
         SELECT term, count(*) AS df FROM tf GROUP BY 1),
       n AS (SELECT count(*) AS n_docs FROM documents),
       scored AS (
         SELECT doc_id, term, tf, df,
                CAST(tf * n_docs AS DOUBLE) / df AS score
         FROM tf JOIN dfreq USING (term) CROSS JOIN n),
       ranked AS (
         SELECT *, CAST(row_number() OVER
                  (PARTITION BY doc_id ORDER BY score DESC, term) AS INTEGER) AS rnk
         FROM scored)
       SELECT doc_id, term, tf, df, score, rnk FROM ranked
       WHERE rnk <= 5 ORDER BY doc_id, rnk"""

  // --------------------------------------------------------------------
  // q54 — deterministic hash sampling: a ~10% sample selected by
  // hash60(pk) % 100 < 10. Unlike rand()/TABLESAMPLE this is portable,
  // reproducible across engines/runs/partitionings, and stable under
  // re-partitioning — the only sane way to sample training data at
  // scale (consistent holdouts, resumable pipelines).
  // --------------------------------------------------------------------
  def q54HashSample(s: SparkSession, dir: String): DataFrame = {
    val key = concat(col("l_orderkey").cast(StringType), lit(":"),
      col("l_linenumber").cast(StringType))
    lake(s, dir).lineitem
      .filter(hash60(key) % 100 < 10)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_sampled"),
        Det.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  private val q54Oracle =
    s"""SELECT l_returnflag, count(*) AS n_sampled,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
       FROM lineitem
       WHERE ${dHash("concat(CAST(l_orderkey AS VARCHAR), ':', CAST(l_linenumber AS VARCHAR))")} % 100 < 10
       GROUP BY 1 ORDER BY l_returnflag"""

  // --------------------------------------------------------------------
  // q55 — dataset profiling (the describe/data-quality report as a
  // first-class operator): per-column null counts, distinct counts,
  // min/max/avg — one pass over the table, partial-aggregated.
  // --------------------------------------------------------------------
  def q55Profile(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).customer
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("c_name").isNull, 1).otherwise(0)).as("null_name"),
        sum(when(col("c_acctbal").isNull, 1).otherwise(0)).as("null_acctbal"),
        countDistinct(col("c_mktsegment")).as("n_segments"),
        countDistinct(col("c_nationkey")).as("n_nations"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        Det.davg(col("c_acctbal")).as("avg_bal"),
        min(length(col("c_name"))).as("min_name_len"),
        max(length(col("c_name"))).as("max_name_len"))

  private val q55Oracle =
    """SELECT count(*) AS n_rows,
              CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_name,
              CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_acctbal,
              count(DISTINCT c_mktsegment) AS n_segments,
              count(DISTINCT c_nationkey) AS n_nations,
              min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
              CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal,
              CAST(min(length(c_name)) AS INTEGER) AS min_name_len,
              CAST(max(length(c_name)) AS INTEGER) AS max_name_len
       FROM customer"""

  // --------------------------------------------------------------------
  // q56 — multimodal frame sampling: "video" documents expand to one row
  // per sampled frame index (every 30th frame of a deterministic fake
  // frame count — the real pipeline swaps the count for the decoded
  // container's, the explode shape is identical). Row explosion is
  // bounded by frames/stride per doc.
  // --------------------------------------------------------------------
  def q56FrameSample(s: SparkSession, dir: String): DataFrame = {
    val h = hash60(col("text"))
    val nFrames = (h % 900 + 100).cast(IntegerType) // fake decode: 100..999
    lake(s, dir).documents
      .filter((substring(col("source"), 4, 10).cast(IntegerType) % 3) === 2) // "video"
      .select(col("doc_id"), nFrames.as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(30))).as("frame_idx"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private val q56Oracle =
    s"""WITH vids AS (
         SELECT doc_id,
                CAST(${dHash("text")} % 900 + 100 AS INTEGER) AS n_frames
         FROM documents
         WHERE CAST(substr(source, 4) AS INTEGER) % 3 = 2)
       SELECT doc_id, n_frames,
              CAST(unnest(range(0, n_frames, 30)) AS INTEGER) AS frame_idx
       FROM vids ORDER BY doc_id, frame_idx"""

  // --------------------------------------------------------------------
  // q63 — the full training-data prep pipeline, composed from the
  // verified operators: quality filter (q33 scoring) → exact dedup keep-
  // min-id (q35) → near-dup removal via MinHash-LSH pairs (q36: drop
  // every d2) → deterministic 50% hash sample (q54) → per-language
  // corpus stats. One narrow scoring pass, one md5-key shuffle, the LSH
  // banding shuffle, a broadcast anti-join, and a 5-group aggregate —
  // the whole pipeline is 3 shuffles regardless of corpus size.
  // Aggregates restricted to order-independent forms (counts/sums of
  // ints, min/max of doubles).
  // --------------------------------------------------------------------
  def q63PrepPipeline(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = tokens(col("text"))
    val scored = lake(s, dir).documents
      .repartition(Scale.par(s), col("doc_id"))
      .select(col("doc_id"), col("lang"), col("text"),
        size(toks).as("n_toks"),
        size(filter(toks, t => t.isin(stopwords: _*))).as("n_stop"),
        length(regexp_replace(col("text"), " ", "")).as("n_alpha"))
      .withColumn("quality_score",
        (col("n_stop").cast(DoubleType) / col("n_toks")) * 0.4
          + least(col("n_toks").cast(DoubleType) / 100.0, lit(1.0)) * 0.3
          + least((col("n_alpha").cast(DoubleType) / col("n_toks")) / 8.0, lit(1.0)) * 0.3)
      .filter(col("quality_score") >= 0.35)
    val wDup = Window.partitionBy(md5(lower(trim(col("text"))))).orderBy(col("doc_id"))
    val exactCanon = scored
      .withColumn("_rn", row_number().over(wDup)).filter(col("_rn") === 1).drop("_rn")
    // the near-dup id set grows with the corpus's duplicate rate — no
    // hard broadcast hint; AQE broadcasts the anti-join side when small
    val nearDupIds = q36MinHashLsh(s, dir).select(col("d2").as("doc_id")).distinct()
    val kept = exactCanon.join(nearDupIds, Seq("doc_id"), "left_anti")
    kept
      .filter(hash60(col("doc_id").cast(StringType)) % 100 < 50)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).cast(LongType).as("total_tokens"),
        min(col("quality_score")).as("min_quality"),
        max(col("quality_score")).as("max_quality"))
      .orderBy(col("lang"))
  }

  private val q63Oracle = {
    // near-dup CTE chain = q36's oracle verbatim (same derived family)
    val mh = (0 until MH).map(i =>
      s"list_min(list_transform(range(len(hs)), j -> hs[j+1] + $i * h2s[j+1]))")
      .mkString(",\n                  ")
    s"""WITH f AS (
         SELECT doc_id, lang, text,
                len(string_split(trim(text), ' ')) AS n_toks,
                len(list_filter(string_split(trim(text), ' '),
                    t -> t IN (${stopwords.map(w => s"'$w'").mkString(", ")}))) AS n_stop,
                length(replace(text, ' ', '')) AS n_alpha
         FROM documents),
       scored AS (
         SELECT *, (CAST(n_stop AS DOUBLE) / n_toks) * 0.4
                   + least(CAST(n_toks AS DOUBLE) / 100.0, 1.0) * 0.3
                   + least((CAST(n_alpha AS DOUBLE) / n_toks) / 8.0, 1.0) * 0.3
                   AS quality_score
         FROM f),
       qualified AS (SELECT * FROM scored WHERE quality_score >= 0.35),
       canon AS (
         SELECT * FROM (
           SELECT *, row_number() OVER
             (PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
           FROM qualified) WHERE rn = 1),
       sh AS (
         SELECT doc_id,
                list_transform(
                  list_distinct(list_transform(
                    range(len(string_split(trim(text), ' ')) - 2),
                    i -> concat_ws(' ', string_split(trim(text), ' ')[i+1],
                                   string_split(trim(text), ' ')[i+2],
                                   string_split(trim(text), ' ')[i+3]))),
                  s -> ${dHash("s")}) AS hs
         FROM documents
         WHERE len(string_split(trim(text), ' ')) >= 3),
       sh2 AS (
         SELECT doc_id, hs,
                list_transform(hs, h ->
                  CAST(concat('0x', substr(md5(CAST(h AS VARCHAR)), 1, 12)) AS BIGINT)) AS h2s
         FROM sh),
       sig AS (SELECT doc_id, [$mh] AS sig FROM sh2),
       bands AS (
         SELECT doc_id, b.b AS band,
                md5(array_to_string(list_transform(
                  list_slice(sig, b.b * $ROWS + 1, b.b * $ROWS + $ROWS),
                  x -> CAST(x AS VARCHAR)), ',')) AS bkey
         FROM sig CROSS JOIN (SELECT unnest(range($BANDS)) AS b) b),
       cand AS (
         SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       removed AS (
         SELECT DISTINCT d2 AS doc_id FROM cand
         JOIN sh s1 ON s1.doc_id = d1
         JOIN sh s2 ON s2.doc_id = d2
         WHERE CAST(len(list_intersect(s1.hs, s2.hs)) AS DOUBLE)
               / (len(s1.hs) + len(s2.hs) - len(list_intersect(s1.hs, s2.hs))) >= 0.5),
       kept AS (
         SELECT * FROM canon
         WHERE doc_id NOT IN (SELECT doc_id FROM removed)
           AND ${dHash("CAST(doc_id AS VARCHAR)")} % 100 < 50)
       SELECT lang, count(*) AS n_docs,
              CAST(sum(n_toks) AS BIGINT) AS total_tokens,
              min(quality_score) AS min_quality,
              max(quality_score) AS max_quality
       FROM kept GROUP BY lang ORDER BY lang"""
  }

  // --------------------------------------------------------------------
  // q69 — grouped near-dup index via the MERGEABLE MinHash aggregator:
  // one 12-slot signature per source, built by ordinary partial
  // aggregation (min-of-mins per slot — Aggregator.merge is elementwise
  // min, so per-partition partials combine exactly). This is the
  // incremental corpus-index shape: a new batch's signatures fold into
  // the stored per-source signature in O(slots) per group, no rescan.
  // --------------------------------------------------------------------
  def q69GroupedMinhashIndex(s: SparkSession, dir: String): DataFrame = {
    val mergeSig = udaf(new graft.functions.MinHashAgg(MH))
    lake(s, dir).documents
      .repartition(Scale.par(s), col("doc_id"))
      .select(col("source"), hashedShingles(col("text"), 3).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("source"), minHash(col("hs"), MH).as("sig"))
      .groupBy(col("source"))
      .agg(mergeSig(col("sig")).as("gsig"))
      .select(col("source"),
        posexplode(col("gsig")).as(Seq("slot", "min_hash")))
      .orderBy(col("source"), col("slot"))
  }

  private val q69Oracle = {
    val mh = (0 until MH).map(i =>
      s"list_min(list_transform(range(len(hs)), j -> hs[j+1] + $i * h2s[j+1]))")
      .mkString(",\n                  ")
    s"""WITH sh AS (
         SELECT doc_id, source,
                list_transform(
                  list_distinct(list_transform(
                    range(len(string_split(trim(text), ' ')) - 2),
                    i -> concat_ws(' ', string_split(trim(text), ' ')[i+1],
                                   string_split(trim(text), ' ')[i+2],
                                   string_split(trim(text), ' ')[i+3]))),
                  s -> ${dHash("s")}) AS hs
         FROM documents
         WHERE len(string_split(trim(text), ' ')) >= 3),
       sh2 AS (
         SELECT doc_id, source, hs,
                list_transform(hs, h ->
                  CAST(concat('0x', substr(md5(CAST(h AS VARCHAR)), 1, 12)) AS BIGINT)) AS h2s
         FROM sh),
       sig AS (
         SELECT doc_id, source, [$mh] AS sig FROM sh2),
       slots AS (
         SELECT source, j.j AS slot, sig[j.j + 1] AS v
         FROM sig CROSS JOIN (SELECT unnest(range($MH)) AS j) j)
       SELECT source, CAST(slot AS INTEGER) AS slot, min(v) AS min_hash
       FROM slots GROUP BY 1, 2 ORDER BY source, slot"""
  }

  // --------------------------------------------------------------------
  // q77 — transitive near-dup CLUSTERS over q36's pairs: iterative
  // min-label propagation (graft.operators.ConnectedComponents) until
  // fixpoint, so every document in a connected component reports the
  // component's minimum doc_id. This is the closure pairwise
  // drop-the-higher-id dedup lacks — a component {1,2,3} with edges
  // (1,3),(2,3) has ONE canonical survivor here, not two. The oracle is
  // a recursive CTE over the identical pair CTEs, so Spark's iterative
  // loop is checked against DuckDB's recursive reachability exactly.
  // --------------------------------------------------------------------
  def q77NearDupComponents(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.operators.NearDup.minHashLshPairs(
      lake(s, dir).documents, "doc_id", "text",
      shingleSize = 3, minHashes = MH, bands = BANDS, threshold = 0.5,
      partitionWidth = Some(Scale.par(s)),
      fastOverride = Some(false)) // oracle-checked: pin the md5 family
    graft.operators.ConnectedComponents.run(pairs, "d1", "d2")
      .select(col("id").as("doc_id"), col("component").as("component_id"))
      .orderBy(col("doc_id"))
  }

  private val q77Oracle =
    s"""WITH RECURSIVE $q36PairCtes,
       pairs AS (SELECT d1, d2 FROM verified WHERE jaccard >= 0.5),
       edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                 UNION SELECT d2, d1 FROM pairs),
       reach(a, b) AS (
         SELECT a, a FROM (SELECT DISTINCT a FROM edges) v
         UNION
         SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
       SELECT a AS doc_id, min(b) AS component_id
       FROM reach GROUP BY a ORDER BY doc_id"""

  // --------------------------------------------------------------------
  // q83 — incremental near-dup lookup of a NEW BATCH against a STORED
  // per-source MinHash index (NearDup.nearDupsAgainstIndex — the
  // arrival-time dedup query, O(batch + index), no corpus rescan):
  // stored docs (doc_id % 3 ≠ 0) fold into one 12-slot signature per
  // source through the mergeable aggregator; batch docs (doc_id % 3 = 0)
  // sign per doc and meet the index ONLY through the banded equi-join
  // (4 bands × 3 rows — key cardinality rows × bands, never
  // batch × index); matches report signature agreement (matching
  // slots / 12, the unbiased Jaccard estimate) ≥ 0.5. The oracle
  // rebuilds both signatures arithmetically AND reproduces the banding,
  // so a hash match proves candidate generation and verification — this
  // promotes the operator from spec-only to oracle-checked. md5 family
  // pinned (oracle rule).
  // --------------------------------------------------------------------
  def q83IndexNearDup(s: SparkSession, dir: String): DataFrame = {
    val docs = lake(s, dir).documents.repartition(Scale.par(s), col("doc_id"))
    val mergeSig = udaf(new graft.functions.MinHashAgg(MH))
    val index = docs.filter(col("doc_id") % 3 =!= 0)
      .select(col("source").as("group_key"),
        hashedShingles(col("text"), 3).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("group_key"), minHash(col("hs"), MH).as("sig"))
      .groupBy(col("group_key"))
      .agg(mergeSig(col("sig")).as("sig"))
      .withColumn("family", lit("md5"))
    graft.operators.NearDup.nearDupsAgainstIndex(
      docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", index,
      shingleSize = 3, slots = MH, bands = BANDS, threshold = 0.5,
      fastOverride = Some(false))
      .orderBy(col("doc_id"), col("group_key"))
  }

  private val q83Oracle = {
    val mh = (0 until MH).map(i =>
      s"list_min(list_transform(range(len(hs)), j -> hs[j+1] + $i * h2s[j+1]))")
      .mkString(",\n                  ")
    s"""WITH sh AS (
         SELECT doc_id, source,
                list_transform(
                  list_distinct(list_transform(
                    range(len(string_split(trim(text), ' ')) - 2),
                    i -> concat_ws(' ', string_split(trim(text), ' ')[i+1],
                                   string_split(trim(text), ' ')[i+2],
                                   string_split(trim(text), ' ')[i+3]))),
                  s -> ${dHash("s")}) AS hs
         FROM documents
         WHERE len(string_split(trim(text), ' ')) >= 3),
       sh2 AS (
         SELECT doc_id, source, hs,
                list_transform(hs, h ->
                  CAST(concat('0x', substr(md5(CAST(h AS VARCHAR)), 1, 12)) AS BIGINT)) AS h2s
         FROM sh),
       sig AS (
         SELECT doc_id, source, [$mh] AS sig FROM sh2),
       gslots AS (
         SELECT source, j.j AS slot, min(sig[j.j + 1]) AS v
         FROM sig CROSS JOIN (SELECT unnest(range($MH)) AS j) j
         WHERE doc_id % 3 <> 0 GROUP BY 1, 2),
       gsig AS (
         SELECT source, list(v ORDER BY slot) AS gsig FROM gslots GROUP BY source),
       bsig AS (
         SELECT doc_id, sig AS bsig FROM sig WHERE doc_id % 3 = 0),
       bbands AS (
         SELECT doc_id, b.b AS band,
                md5(array_to_string(list_transform(
                  list_slice(bsig, b.b * $ROWS + 1, b.b * $ROWS + $ROWS),
                  x -> CAST(x AS VARCHAR)), ',')) AS bkey
         FROM bsig CROSS JOIN (SELECT unnest(range($BANDS)) AS b) b),
       gbands AS (
         SELECT source, b.b AS band,
                md5(array_to_string(list_transform(
                  list_slice(gsig, b.b * $ROWS + 1, b.b * $ROWS + $ROWS),
                  x -> CAST(x AS VARCHAR)), ',')) AS bkey
         FROM gsig CROSS JOIN (SELECT unnest(range($BANDS)) AS b) b),
       cand AS (
         SELECT DISTINCT a.doc_id, g.source
         FROM bbands a JOIN gbands g ON a.band = g.band AND a.bkey = g.bkey),
       scored AS (
         SELECT c.doc_id, c.source AS group_key,
                CAST(len(list_filter(range($MH),
                  j -> b.bsig[j + 1] = g.gsig[j + 1])) AS DOUBLE) / $MH
                  AS sig_agreement
         FROM cand c
         JOIN bsig b ON b.doc_id = c.doc_id
         JOIN gsig g ON g.source = c.source)
       SELECT doc_id, group_key, sig_agreement
       FROM scored WHERE sig_agreement >= 0.5
       ORDER BY doc_id, group_key"""
  }

  // --------------------------------------------------------------------
  // q87 — pattern redaction / normalization (the scrubbing stage every
  // training pipeline runs before tokenization — PII masking is this op
  // with PII regexes): replace every `(key|customer|order) <word>` span
  // with a mask token, report per-doc match count, redacted length, and
  // a preview. Narrow per-row regex work — scan-parallel, zero shuffles
  // before the output sort. Portability: the pattern uses only
  // alternation + explicit character classes, semantics shared by
  // Spark's Java regex and DuckDB's RE2; both engines scan
  // left-to-right non-overlapping, so counts and replacements align.
  // --------------------------------------------------------------------
  private val Q87_PATTERN = "(key|customer|order) [a-z]+"

  def q87Redact(s: SparkSession, dir: String): DataFrame = {
    val redacted = regexp_replace(col("text"), Q87_PATTERN, "<MASKED>")
    lake(s, dir).documents
      .select(col("doc_id"),
        regexp_count(col("text"), lit(Q87_PATTERN)).as("n_redacted"),
        length(redacted).as("redacted_len"),
        substring(redacted, 1, 60).as("preview"))
      .orderBy(col("doc_id"))
  }

  private val q87Oracle =
    s"""SELECT doc_id,
              CAST(len(regexp_extract_all(text, '$Q87_PATTERN')) AS INTEGER)
                AS n_redacted,
              CAST(length(regexp_replace(text, '$Q87_PATTERN', '<MASKED>', 'g'))
                AS INTEGER) AS redacted_len,
              substr(regexp_replace(text, '$Q87_PATTERN', '<MASKED>', 'g'), 1, 60)
                AS preview
       FROM documents ORDER BY doc_id"""

  // --------------------------------------------------------------------
  // q112 — exact shared-span detection: the W-gram windowed
  // approximation of suffix-array substring dedup (Lee et al., "Dedup-
  // licating Training Data Makes Language Models Better", ACL '22 —
  // /root/reference has no equivalent; this is the training-pipeline
  // memorization guard). Every 40-char window at stride 10 is hashed
  // (hash60 — the
  // md5 60-bit family DuckDB reproduces bit-for-bit); a window seen in
  // ≥ 2 distinct documents marks an exactly-shared span. Per doc:
  // how many of its distinct windows are shared.
  //
  // Scale: the shuffle carries (doc_id, hash) longs only — never the
  // window text; windows/doc = len/stride (bounded explode); the
  // groupBy(h) and the join back on h share one hash partitioning
  // (AQE reuses it), then one doc-keyed agg. No pairwise stage exists
  // at any point — cost is O(total windows), not O(docs²).
  // --------------------------------------------------------------------
  def q112SharedSpans(s: SparkSession, dir: String): DataFrame = {
    val W = 40; val S = 10
    val spans = lake(s, dir).documents
      .filter(length(col("text")) >= W)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, length(text) - ${W - 1}, $S)," +
          s" i -> substring(text, i, $W))")).as("span"))
      .select(col("doc_id"), hash60(col("span")).as("h"))
      .distinct() // a doc repeating its own span is not "shared"
    val shared = spans.groupBy(col("h"))
      .agg(count(lit(1)).as("nd")) // post-distinct: = #docs holding the span
      .filter(col("nd") >= 2)
    spans.join(shared, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_spans"))
      .orderBy(col("doc_id"))
  }

  private val q112Oracle =
    s"""WITH spans AS (
         SELECT DISTINCT doc_id,
                unnest(list_transform(
                  range(1, greatest(length(text) - 39, 0) + 1, 10),
                  i -> ${dHash("substr(text, i, 40)")})) AS h
         FROM documents WHERE length(text) >= 40),
       shared AS (SELECT h FROM spans GROUP BY h HAVING count(*) >= 2)
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_spans
       FROM spans JOIN shared USING (h)
       GROUP BY doc_id ORDER BY doc_id"""

  // --------------------------------------------------------------------
  // q170 — SUBSTRING-level dedup with KEEP-FIRST REMOVAL (round 16):
  // the actual PRODUCT of Lee et al.'s suffix-array pass — a cleaned
  // corpus. q112 counts shared windows and q164 locates exact spans;
  // this emits, per document, the text with every non-first occurrence
  // of a corpus-duplicated 40-char window (stride 10) CUT out —
  // within-doc repeats included (memorization does not care who
  // repeated the text). Keep-first is the min (doc_id, pos) occurrence
  // per content hash. The oracle rebuilds every cleaned text char by
  // char from the same interval mask and hashes it — one shifted
  // boundary anywhere hash-fails the row. Scale shape: (doc_id, pos,
  // hash) longs shuffle (never window text), removal positions
  // collect per doc (≤ len/stride), the cut is a narrow per-row pass;
  // no pairwise stage at any point.
  // --------------------------------------------------------------------
  def q170SpanRemoval(s: SparkSession, dir: String): DataFrame = {
    graft.operators.Curation.removeDuplicatedSpans(
      lake(s, dir).documents, "doc_id", "text")
      .select(col("doc_id"), col("orig_len"), col("n_removed_chars"),
        length(col("cleaned")).cast("long").as("cleaned_len"),
        hash60(col("cleaned")).as("cleaned_h"))
      .orderBy(col("doc_id"))
  }

  private val q170Oracle =
    s"""WITH occ AS (
         SELECT doc_id, i AS pos, ${dHash("substr(text, CAST(i AS INT), 40)")} AS h
         FROM documents,
              unnest(range(1, greatest(length(text) - 39, 0) + 1, 10)) s(i)
         WHERE length(text) >= 40),
       grp AS (SELECT h, min(CAST(doc_id AS BIGINT) * 1000000000 + pos) AS firstKey
               FROM occ GROUP BY h HAVING count(*) >= 2),
       rem AS (SELECT o.doc_id, list(o.pos ORDER BY o.pos) AS ps
               FROM occ o JOIN grp g USING (h)
               WHERE CAST(o.doc_id AS BIGINT) * 1000000000 + o.pos <> g.firstKey
               GROUP BY o.doc_id),
       clean AS (
         SELECT d.doc_id, length(d.text) AS orig_len,
                -- COALESCE: DuckDB's array_to_string of an EMPTY list
                -- is NULL, and a fully-removed doc's kept set is empty
                COALESCE(array_to_string(list_transform(
                  list_filter(range(1, length(d.text) + 1),
                    c -> len(list_filter(COALESCE(r.ps, []),
                           p -> p <= c AND c <= p + 39)) = 0),
                  c -> substr(d.text, CAST(c AS INT), 1)), ''), '') AS cleaned
         FROM documents d LEFT JOIN rem r USING (doc_id))
       SELECT doc_id, CAST(orig_len AS BIGINT) AS orig_len,
              CAST(orig_len - length(cleaned) AS BIGINT) AS n_removed_chars,
              CAST(length(cleaned) AS BIGINT) AS cleaned_len,
              ${dHash("cleaned")} AS cleaned_h
       FROM clean ORDER BY doc_id"""

  // --------------------------------------------------------------------
  // q164 — EXACT shared-span dedup (graft.operators.ExactSpans), the
  // step past q112's windowed approximation: every MAXIMAL cross-doc
  // shared span of ≥ 40 chars, with exact 1-based positions and
  // lengths — what Lee et al.'s suffix-array pass computes, here as
  // winnowing candidate generation (guaranteed detection at the 40 =
  // w + k − 1 threshold) + an exact per-candidate-pair diagonal-island
  // scan. The oracle enumerates ALL 40-gram equality matches and
  // merges them per (pair, diagonal) — brute force, no candidates —
  // so a winnowing recall bug cannot hide. No pairwise corpus stage:
  // fingerprint equi-join + O(matches) per surviving pair.
  // --------------------------------------------------------------------
  def q164ExactSpans(s: SparkSession, dir: String): DataFrame = {
    implicit val spark: SparkSession = s
    graft.operators.ExactSpans.sharedSpans(
      lake(s, dir).documents, "doc_id", "text")
      .orderBy(col("doc_a"), col("doc_b"), col("a_start"), col("b_start"))
  }

  private val q164Oracle =
    """WITH g AS (
         SELECT doc_id, i, substr(text, CAST(i AS INT), 40) AS gram
         FROM documents, unnest(generate_series(1, strlen(text) - 39)) AS s(i)
         WHERE strlen(text) >= 40),
       m AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.i AS ai, b.i AS bi,
                a.i - b.i AS diag
         FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
       isl AS (
         SELECT doc_a, doc_b, diag, ai, bi,
                ai - row_number() OVER (
                  PARTITION BY doc_a, doc_b, diag ORDER BY ai) AS grp
         FROM m)
       SELECT doc_a, doc_b, CAST(min(ai) AS BIGINT) AS a_start,
              CAST(min(bi) AS BIGINT) AS b_start,
              CAST(max(ai) - min(ai) + 40 AS BIGINT) AS span_len
       FROM isl GROUP BY doc_a, doc_b, diag, grp
       ORDER BY doc_a, doc_b, a_start, b_start"""

  // --------------------------------------------------------------------
  // q115 — inverted-index build (graft.operators.InvertedIndex): term →
  // df / corpus tf / first-8 posting list. Two uniform-key shuffles;
  // posting arrays capped per term BEFORE collection (rank filter →
  // WindowGroupLimit), so Zipf-hot terms cost k rows, not df rows. The
  // oracle rebuilds the same ranked cap in SQL — df and total_tf stay
  // exact over ALL occurrences while postings carry only the cap.
  // --------------------------------------------------------------------
  def q115InvertedIndex(s: SparkSession, dir: String): DataFrame =
    graft.operators.InvertedIndex.build(
      lake(s, dir).documents, "doc_id", "text", postingsCap = 8)
      .orderBy(col("term"))

  private val q115Oracle =
    """WITH tok AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
                    FROM documents),
       tf AS (SELECT term, doc_id, count(*) AS tf
              FROM tok WHERE term <> '' GROUP BY term, doc_id),
       ranked AS (SELECT term, doc_id, tf,
                         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
                  FROM tf)
       SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf,
              array_to_string(
                list_transform(
                  list_sort(list(doc_id) FILTER (WHERE rn <= 8)),
                  x -> CAST(x AS VARCHAR)),
                ',') AS postings
       FROM ranked GROUP BY term ORDER BY term"""

  // --------------------------------------------------------------------
  // q121 — corpus-wide segment dedup with reassembly (Curation
  // .dedupParagraphs): every duplicated segment keeps its FIRST corpus
  // occurrence, later copies are cut, documents rebuild from survivors
  // in order. Driven here at word granularity (the corpus has no
  // paragraph delimiters — the degenerate segmentation still exercises
  // first-occurrence choice, cut, and reassembly exactly; newline-real
  // paragraph semantics are spec'd in CurationOpsSpec). One content-
  // keyed shuffle with an rn=1 WindowGroupLimit + one doc-keyed
  // reassembly shuffle.
  // --------------------------------------------------------------------
  def q121ParagraphDedup(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.dedupParagraphs(
      lake(s, dir).documents, "doc_id", "text", delim = " ")
      .orderBy(col("doc_id"))

  private val q121Oracle =
    """WITH parts0 AS (
         SELECT doc_id,
                unnest(list_transform(range(len(string_split(text, ' '))),
                       i -> {'pos': i + 1, 'para': string_split(text, ' ')[i + 1]})) AS u
         FROM documents),
       parts AS (SELECT doc_id, u.pos AS pos, u.para AS para
                 FROM parts0 WHERE trim(u.para) <> ''),
       ranked AS (SELECT doc_id, pos, para,
                         row_number() OVER (PARTITION BY para
                                            ORDER BY doc_id, pos) AS rn
                  FROM parts),
       kept AS (SELECT doc_id, string_agg(para, ' ' ORDER BY pos) AS dedup_text,
                       count(*) AS n_kept
                FROM ranked WHERE rn = 1 GROUP BY doc_id),
       totals AS (SELECT doc_id, count(*) AS n_parts FROM parts GROUP BY doc_id)
       SELECT d.doc_id, coalesce(k.dedup_text, '') AS dedup_text,
              coalesce(k.n_kept, 0) AS n_kept, coalesce(t.n_parts, 0) AS n_parts
       FROM documents d
       LEFT JOIN kept k USING (doc_id)
       LEFT JOIN totals t USING (doc_id)
       ORDER BY d.doc_id"""

  // --------------------------------------------------------------------
  // q123 — fuzzy matching (operators.FuzzyJoin): every customer-name
  // pair within edit distance 1, found by a deletion-neighborhood
  // EQUI-join (FastSS) + Levenshtein verify on candidates only — no
  // quadratic stage. The oracle IS the quadratic definition (blocked to
  // a deterministic key subset so it stays runnable), so the green row
  // proves the neighborhood method finds exactly the brute-force pairs.
  // --------------------------------------------------------------------
  def q123FuzzyPairs(s: SparkSession, dir: String): DataFrame =
    graft.operators.FuzzyJoin.editDistance1Pairs(
      lake(s, dir).customer.filter(col("c_custkey") % 10 === 0),
      "c_custkey", "c_name")
      .orderBy(col("id_a"), col("id_b"))

  private val q123Oracle =
    """WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 10 = 0)
       SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
              CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
       FROM c a JOIN c b ON a.c_custkey < b.c_custkey
       WHERE levenshtein(a.c_name, b.c_name) <= 1
       ORDER BY id_a, id_b"""

  // --------------------------------------------------------------------
  // q132 — BM25-shaped ranked retrieval (the Robertson/Spärck Jones
  // probabilistic weighting behind Lucene/Elasticsearch scoring): rank
  // documents for a fixed 3-term query by Σ_t idf(t) ·
  // tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with k1=3/2, b=3/4. Two
  // cross-engine determinism moves: (1) the log-free rational idf
  // N/df (libm log is not bit-identical across engines — q51's
  // policy), under which each term score reduces to ONE division of two
  // exact integer products (numerator N·tf·20·total, denominator
  // df·(8·total·tf + 3·total + 9·dl·N) — multiply through by 8·total,
  // avgdl = total/N), computed DECIMAL-exact then cast to double; (2) a
  // FIXED summation order (s1+s2+s3 as written) instead of an
  // order-dependent SUM. Shape at scale: one tokenize+tf shuffle, the
  // query-term df/N/total scalars broadcast as one row, matching docs
  // only (inner join on the pivoted query-term tfs), global top-10.
  // --------------------------------------------------------------------
  def q132Bm25(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qs = Seq("spark", "merge", "window")
    val dec = DecimalType(38, 0)
    val docs = lake(s, dir).documents
    val toks = docs.repartition(Scale.par(s), col("doc_id"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    // ONE row of corpus scalars: N, total token count, per-term df
    val stats = tf.agg(
        count(lit(1)).as("ignore"), // keeps the agg non-empty pre-pivot
        sum(col("tf")).as("total"),
        countDistinct(col("doc_id")).as("n_docs"),
        count(when(col("term") === qs(0), 1)).as("df_0"),
        count(when(col("term") === qs(1), 1)).as("df_1"),
        count(when(col("term") === qs(2), 1)).as("df_2"))
      .drop("ignore")
    val qtf = tf.filter(col("term").isin(qs: _*))
      .groupBy(col("doc_id"))
      .agg(
        coalesce(sum(when(col("term") === qs(0), col("tf"))), lit(0L)).as("tf_0"),
        coalesce(sum(when(col("term") === qs(1), col("tf"))), lit(0L)).as("tf_1"),
        coalesce(sum(when(col("term") === qs(2), col("tf"))), lit(0L)).as("tf_2"))
    def termScore(tfc: Column, dfc: Column): Column =
      when(tfc === 0L, lit(0.0)).otherwise(
        (col("n_docs").cast(dec) * tfc * lit(20) * col("total"))
          .cast(DoubleType) /
        (dfc.cast(dec) * (lit(8) * col("total").cast(dec) * tfc +
          lit(3) * col("total") + lit(9) * col("dl") * col("n_docs")))
          .cast(DoubleType))
    // top-k FIRST (TakeOrderedAndProject — per-partition heaps, never a
    // single-partition global window), then rank the 10 survivors
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    qtf.join(dl, "doc_id")
      .crossJoin(broadcast(stats)) // one row — always broadcastable
      .select(col("doc_id"), col("dl"),
        col("tf_0"), col("tf_1"), col("tf_2"),
        (termScore(col("tf_0"), col("df_0")) +
          termScore(col("tf_1"), col("df_1")) +
          termScore(col("tf_2"), col("df_2"))).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(10)
      .withColumn("rnk", row_number().over(w).cast(IntegerType))
      .orderBy(col("rnk"))
  }

  private val q132Oracle =
    """WITH toks AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
         FROM documents),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       stats AS (SELECT
         CAST((SELECT count(*) FROM toks) AS BIGINT) AS total,
         CAST((SELECT count(DISTINCT doc_id) FROM tf) AS BIGINT) AS n_docs,
         CAST((SELECT count(*) FROM tf WHERE term = 'spark') AS BIGINT) AS df_0,
         CAST((SELECT count(*) FROM tf WHERE term = 'merge') AS BIGINT) AS df_1,
         CAST((SELECT count(*) FROM tf WHERE term = 'window') AS BIGINT) AS df_2),
       qtf AS (SELECT doc_id,
         CAST(COALESCE(sum(CASE WHEN term = 'spark' THEN tf END), 0) AS BIGINT) AS tf_0,
         CAST(COALESCE(sum(CASE WHEN term = 'merge' THEN tf END), 0) AS BIGINT) AS tf_1,
         CAST(COALESCE(sum(CASE WHEN term = 'window' THEN tf END), 0) AS BIGINT) AS tf_2
         FROM tf WHERE term IN ('spark', 'merge', 'window') GROUP BY 1),
       scored AS (SELECT doc_id, dl, tf_0, tf_1, tf_2,
         (CASE WHEN tf_0 = 0 THEN 0.0 ELSE
            CAST(CAST(n_docs AS HUGEINT) * tf_0 * 20 * total AS DOUBLE) /
            CAST(CAST(df_0 AS HUGEINT) * (8 * CAST(total AS HUGEINT) * tf_0
              + 3 * total + 9 * dl * n_docs) AS DOUBLE) END) +
         (CASE WHEN tf_1 = 0 THEN 0.0 ELSE
            CAST(CAST(n_docs AS HUGEINT) * tf_1 * 20 * total AS DOUBLE) /
            CAST(CAST(df_1 AS HUGEINT) * (8 * CAST(total AS HUGEINT) * tf_1
              + 3 * total + 9 * dl * n_docs) AS DOUBLE) END) +
         (CASE WHEN tf_2 = 0 THEN 0.0 ELSE
            CAST(CAST(n_docs AS HUGEINT) * tf_2 * 20 * total AS DOUBLE) /
            CAST(CAST(df_2 AS HUGEINT) * (8 * CAST(total AS HUGEINT) * tf_2
              + 3 * total + 9 * dl * n_docs) AS DOUBLE) END) AS score
         FROM qtf JOIN dl USING (doc_id) CROSS JOIN stats),
       ranked AS (SELECT *, CAST(row_number() OVER
           (ORDER BY score DESC, doc_id) AS INTEGER) AS rnk FROM scored)
       SELECT doc_id, dl, tf_0, tf_1, tf_2, score, rnk
       FROM ranked WHERE rnk <= 10 ORDER BY rnk"""

  // --------------------------------------------------------------------
  // q135 — per-source frequency cap (Curation.capPerSource): the
  // CCNet/RefinedWeb anti-dominance stage — no source contributes more
  // than 25 documents, keeping the longest (n_chars desc, doc_id ties),
  // each survivor tagged with its within-source rank and the source's
  // PRE-cap total. Scale: the rank-filter compiles to WindowGroupLimit
  // (≤25 rows per source leave each map task before the exchange —
  // plan-asserted in PlanChecksSpec), and the totals join carries one
  // (source, count) row per source, broadcast onto the capped set.
  // --------------------------------------------------------------------
  def q135SourceCap(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.capPerSource(
      lake(s, dir).documents.select(
        col("doc_id"), col("source"), col("n_chars")),
      "doc_id", "source", "n_chars", k = 25)
      .select(col("source"), col("doc_id"),
        col("src_rank").cast("long").as("src_rank"), col("src_total"))
      .orderBy(col("source"), col("src_rank"))

  private val q135Oracle =
    """WITH ranked AS (
         SELECT source, doc_id, n_chars,
                row_number() OVER (PARTITION BY source
                                   ORDER BY n_chars DESC, doc_id) AS src_rank
         FROM documents),
       totals AS (SELECT source, count(*) AS src_total
                  FROM documents GROUP BY source)
       SELECT r.source, r.doc_id, r.src_rank, t.src_total
       FROM ranked r JOIN totals t USING (source)
       WHERE r.src_rank <= 25
       ORDER BY r.source, r.src_rank"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q135_source_cap" -> (q135SourceCap _),
    "q132_bm25" -> (q132Bm25 _),
    "q123_fuzzy_pairs" -> (q123FuzzyPairs _),
    "q121_paragraph_dedup" -> (q121ParagraphDedup _),
    "q115_inverted_index" -> (q115InvertedIndex _),
    "q31_token_stats" -> (q31TokenStats _),
    "q32_lang_id" -> (q32LangId _),
    "q33_quality_score" -> (q33QualityScore _),
    "q34_fingerprint" -> (q34Fingerprint _),
    "q35_exact_dedup" -> (q35ExactDedup _),
    "q36_minhash_lsh" -> (q36MinHashLsh _),
    "q37_ngram_jaccard" -> (q37NgramJaccard _),
    "q37b_prefix_jaccard" -> (q37bPrefixJaccard _),
    "q38_simhash" -> (q38SimHash _),
    "q38b_simhash_scale" -> (q38bSimHashScale _),
    "q51_term_importance" -> (q51TermImportance _),
    "q54_hash_sample" -> (q54HashSample _),
    "q55_profile" -> (q55Profile _),
    "q56_frame_sample" -> (q56FrameSample _),
    "q63_prep_pipeline" -> (q63PrepPipeline _),
    "q69_grouped_minhash_index" -> (q69GroupedMinhashIndex _),
    "q77_neardup_components" -> (q77NearDupComponents _),
    "q83_index_neardup" -> (q83IndexNearDup _),
    "q87_redact" -> (q87Redact _),
    "q112_shared_spans" -> (q112SharedSpans _),
    "q170_span_removal" -> (q170SpanRemoval _),
    "q164_exact_spans" -> (q164ExactSpans _))

  val oracle: Map[String, String] = Map(
    "q135_source_cap" -> q135Oracle,
    "q132_bm25" -> q132Oracle,
    "q123_fuzzy_pairs" -> q123Oracle,
    "q121_paragraph_dedup" -> q121Oracle,
    "q115_inverted_index" -> q115Oracle,
    "q31_token_stats" -> q31Oracle,
    "q32_lang_id" -> q32Oracle,
    "q33_quality_score" -> q33Oracle,
    "q34_fingerprint" -> q34Oracle,
    "q35_exact_dedup" -> q35Oracle,
    "q36_minhash_lsh" -> q36Oracle,
    "q37_ngram_jaccard" -> q37Oracle,
    "q37b_prefix_jaccard" -> q37bOracle,
    "q38_simhash" -> q38Oracle,
    "q38b_simhash_scale" -> q38bOracle,
    "q51_term_importance" -> q51Oracle,
    "q54_hash_sample" -> q54Oracle,
    "q55_profile" -> q55Oracle,
    "q56_frame_sample" -> q56Oracle,
    "q63_prep_pipeline" -> q63Oracle,
    "q69_grouped_minhash_index" -> q69Oracle,
    "q77_neardup_components" -> q77Oracle,
    "q83_index_neardup" -> q83Oracle,
    "q87_redact" -> q87Oracle,
    "q112_shared_spans" -> q112Oracle,
    "q170_span_removal" -> q170Oracle,
    "q164_exact_spans" -> q164Oracle)
}
