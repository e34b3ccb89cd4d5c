package graft.operators

import graft.core.CacheScope
import graft.functions.TextFns._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate pair detection — the single shared
  * implementation behind both the library facade (`Graft.nearDupPairs`)
  * and the oracle-verified q36 (`TextOps.q36MinHashLsh`), so the two
  * cannot drift.
  *
  * Shape at scale: shingles are hashed to longs once and cached (consumed
  * by the signature pass and both verification joins); candidate
  * generation is the banded self-join — the ONLY shuffle, key cardinality
  * docs × bands — never an all-pairs product; candidates then verify by
  * exact Jaccard over the hashed shingle sets fetched by id.
  */
object NearDup {

  /** Near-dup pairs (`d1`, `d2`, `jaccard`) with Jaccard ≥ `threshold`,
    * `d1 < d2`, unordered output (callers sort if they need determinism).
    *
    * @param partitionWidth explicit pre-shuffle width for the md5-heavy
    *   shingling pass (single-file inputs arrive as ONE partition);
    *   None = leave the input partitioning alone.
    * @param fastOverride Some(x) pins the hash family regardless of the
    *   session conf — the oracle-checked q36 pins Some(false) so a
    *   session that happens to set `spark.graft.fastHash` can NEVER
    *   change a verified answer; None (the facade) honors the conf.
    */
  def minHashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, minHashes: Int = 12, bands: Int = 4,
      threshold: Double = 0.5,
      partitionWidth: Option[Int] = None,
      fastOverride: Option[Boolean] = None): DataFrame = {
    require(minHashes % bands == 0,
      s"bands ($bands) must divide minHashes ($minHashes) — " +
        s"a truncated band would silently weaken the LSH collision bound")
    val rows = minHashes / bands
    // spark.graft.fastHash=true: xxhash64 family (codegen'd, ~10× cheaper
    // than md5) for production corpora; md5 default keeps the operator
    // bit-reproducible in any engine
    val fast = fastOverride.getOrElse(fastHash(df.sparkSession))
    val base = partitionWidth.fold(df)(p => df.repartition(p, col(idCol)))
    // registered cache, released by the action-runner via CacheScope —
    // a bare .cache() here would leak the shingle blocks for the session
    val sh = CacheScope.cached(base
      .select(col(idCol).as("d_id"),
        hashedShingles(col(textCol), shingleSize, fast).as("hs"))
      .filter(size(col("hs")) > 0))
    val sig = sh.select(col("d_id"), minHash(col("hs"), minHashes, fast).as("sig"))
    val bandRows = bandedKeys(sig, "d_id", "sig", bands, rows, fast)
    val cand = bandRows.as("a")
      .join(bandRows.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.d_id") < col("b.d_id"))
      .select(col("a.d_id").as("d1"), col("b.d_id").as("d2"))
      .distinct()
    cand
      .join(sh.select(col("d_id").as("d1"), col("hs").as("sh1")), "d1")
      .join(sh.select(col("d_id").as("d2"), col("hs").as("sh2")), "d2")
      .select(col("d1"), col("d2"),
        size(array_intersect(col("sh1"), col("sh2"))).as("inter"),
        size(col("sh1")).as("na"), size(col("sh2")).as("nb"))
      .select(col("d1"), col("d2"),
        jaccardFromSizes(col("inter"), col("na"), col("nb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** One (key, band, bkey) row per band per signature — THE band-key
    * derivation, shared by the pairwise self-join, the index query, and
    * the streaming ingest so the collision paths cannot diverge. */
  private[graft] def bandedKeys(df: DataFrame, keyCol: String, sigCol: String,
      bands: Int, rows: Int, fast: Boolean): DataFrame =
    df.select(col(keyCol),
      posexplode(array((0 until bands).map(b =>
        bandKey(col(sigCol), b, rows, fast)): _*)).as(Seq("band", "bkey")))

  /** Fraction of agreeing signature slots — the unbiased MinHash
    * estimate of Jaccard similarity. Int/int double division. */
  private[graft] def sigAgreement(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column, slots: Int): org.apache.spark.sql.Column =
    size(filter(zip_with(a, b, (x, y) => x === y), x => x))
      .cast("double") / slots

  /** Guarded (`group_key`, `isig`) view of a stored index: raises at
    * execution on a family mismatch, a missing family, or a signature
    * whose width differs from `slots` — every one of these would
    * otherwise silently degrade matching instead of failing. */
  private[graft] def guardedIndexSigs(index: DataFrame, fam: String,
      slots: Int): DataFrame = {
    val badFamily = col("family").isNull || col("family") =!= fam
    val badWidth = size(col("sig")) =!= slots
    index.select(col("group_key"),
      when(badFamily,
        raise_error(format_string(
          "minhash index hash-family mismatch: index=%s session=%s — " +
            "rebuild the index or pin the family",
          coalesce(col("family"), lit("NULL")), lit(fam)))
          .cast(org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)))
        .when(badWidth,
          raise_error(format_string(
            "minhash index signature width mismatch: index=%s query slots=%s",
            size(col("sig")).cast("string"), lit(slots.toString)))
            .cast(org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType)))
        .otherwise(col("sig")).as("isig"))
  }

  /** Incremental near-dup check of a NEW BATCH against a STORED index
    * (built by `Graft.minHashIndex`, maintained by `mergeMinHashIndexes`)
    * — the arrival-time dedup query: "which stored groups is each new
    * document a near-duplicate of?", at O(|batch| + |index|) instead of
    * rescanning the corpus text.
    *
    * The index holds only signatures, so verification is SIGNATURE
    * AGREEMENT (matching slots / slots — the unbiased MinHash estimate of
    * Jaccard), not exact Jaccard: `sig_agreement` is the estimate and
    * `threshold` filters on it. Candidate generation is the same banded
    * equi-join as [[minHashLshPairs]] (key cardinality rows × bands,
    * never batch × index). An index built under a different hash family
    * than this session's raises at execution rather than silently
    * matching garbage (the `mergeMinHashIndexes` guard).
    *
    * Returns (`idCol`, `group_key`, `sig_agreement`). */
  def nearDupsAgainstIndex(
      batch: DataFrame, idCol: String, textCol: String, index: DataFrame,
      shingleSize: Int = 3, slots: Int = 12, bands: Int = 4,
      threshold: Double = 0.5,
      fastOverride: Option[Boolean] = None): DataFrame = {
    require(slots % bands == 0,
      s"bands ($bands) must divide slots ($slots)")
    val rows = slots / bands
    val fast = fastOverride.getOrElse(fastHash(batch.sparkSession))
    val fam = if (fast) "xxhash64" else "md5"
    val bsig = CacheScope.cached(batch
      .select(col(idCol).as("b_id"),
        hashedShingles(col(textCol), shingleSize, fast).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("b_id"), minHash(col("hs"), slots, fast).as("bsig")))
    // a family mismatch, missing family, or width mismatch must fail
    // loudly (see guardedIndexSigs), never silently degrade matching
    val isig = CacheScope.cached(guardedIndexSigs(index, fam, slots))
    val cand = bandedKeys(bsig, "b_id", "bsig", bands, rows, fast)
      .join(bandedKeys(isig, "group_key", "isig", bands, rows, fast),
        Seq("band", "bkey"))
      .select(col("b_id"), col("group_key"))
      .distinct()
    cand
      .join(bsig, "b_id")
      .join(isig, "group_key")
      .select(col("b_id").as(idCol), col("group_key"),
        sigAgreement(col("bsig"), col("isig"), slots).as("sig_agreement"))
      .filter(col("sig_agreement") >= threshold)
  }
}
