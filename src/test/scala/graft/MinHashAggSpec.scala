package graft
// (incremental-index facade equivalence lives at the bottom of this suite)

import graft.core.Lake
import graft.functions.TextFns._
import graft.functions.MinHashAgg
import org.apache.spark.sql.functions._

/** Mergeability: the aggregated per-group signature must equal the
  * signature computed directly over the group's unioned shingle set —
  * MinHash's min-of-mins property, exact, not approximate.
  */
class MinHashAggSpec extends SparkSpec {

  test("merged per-doc signatures equal the signature of the unioned shingle set") {
    import spark.implicits._
    val docs = Lake(spark, sfDir).documents.limit(100)
      .select(col("doc_id"), col("lang"), hashedShingles(col("text"), 3).as("hs"))
      .filter(size(col("hs")) > 0)
      .cache()

    // path A: per-doc signatures, merged per lang by the Aggregator
    val mh = udaf(new MinHashAgg(8))
    val merged = docs
      .select(col("lang"), minHash(col("hs"), 8).as("sig"))
      .groupBy(col("lang"))
      .agg(mh(col("sig")).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

    // path B: signature over the union of each lang's shingle hashes
    val direct = docs
      .select(col("lang"), explode(col("hs")).as("h"))
      .groupBy(col("lang"))
      .agg(collect_set(col("h")).as("hs"))
      .select(col("lang"), minHash(col("hs"), 8).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

    assert(merged.keySet === direct.keySet)
    merged.keySet.foreach { lang =>
      assert(merged(lang) === direct(lang), s"signature mismatch for $lang")
    }
  }

  test("incremental index maintenance: fold-in of a new batch equals a full rebuild") {
    import graft.api.Graft
    val docs = Lake(spark, sfDir).documents
    // yesterday's corpus and today's batch, split disjointly
    val stored = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)

    // the stored index survives a parquet round trip (the real shape:
    // index on disk, batch folded in, written back)
    val idxPath = new java.io.File(
      s"target/tmp/minhash_idx_${java.util.UUID.randomUUID().toString.take(8)}")
      .getAbsolutePath
    Graft.minHashIndex(stored, "lang", "text").write.parquet(idxPath)
    val incremental = Graft.mergeMinHashIndexes(
      spark.read.parquet(idxPath),
      Graft.minHashIndex(batch, "lang", "text"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

    val rebuild = Graft.minHashIndex(docs, "lang", "text")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

    assert(incremental === rebuild,
      "fold-in must equal the from-scratch index exactly (min-of-mins)")
  }

  test("mergeMinHashIndexes passes through groups present on only one side") {
    import spark.implicits._
    val a = Seq(("g1", Seq(5L, 9L)), ("g2", Seq(3L, 4L)))
      .toDF("group_key", "sig").withColumn("family", lit("md5"))
    val b = Seq(("g2", Seq(1L, 8L)), ("g3", Seq(7L, 2L)))
      .toDF("group_key", "sig").withColumn("family", lit("md5"))
    val m = graft.api.Graft.mergeMinHashIndexes(a, b)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(m === Map("g1" -> Seq(5L, 9L), "g2" -> Seq(1L, 4L), "g3" -> Seq(7L, 2L)))
  }

  test("mergeMinHashIndexes refuses to fold indexes from different hash families") {
    import spark.implicits._
    val a = Seq(("g1", Seq(5L, 9L)))
      .toDF("group_key", "sig").withColumn("family", lit("md5"))
    val b = Seq(("g1", Seq(1L, 8L)))
      .toDF("group_key", "sig").withColumn("family", lit("xxhash64"))
    val e = intercept[Exception] {
      graft.api.Graft.mergeMinHashIndexes(a, b).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("hash-family mismatch")),
      s"expected the family-mismatch error, got: $e")
    // one-sided groups don't trip the check even across-session
    val ok = graft.api.Graft.mergeMinHashIndexes(
      a, Seq(("g2", Seq(1L, 8L))).toDF("group_key", "sig")
        .withColumn("family", lit("xxhash64")))
    assert(ok.count() === 2) // passes through; families kept per group
  }

  test("mergeMinHashIndexes refuses indexes of different signature widths") {
    import spark.implicits._
    // zip_with would null-pad the 12-slot side to 16 and least() would
    // ignore the nulls — a mixed-width garbage signature, not an error;
    // the guard must raise instead (mirroring guardedIndexSigs)
    val a = Seq(("g1", Seq.fill(12)(5L)))
      .toDF("group_key", "sig").withColumn("family", lit("md5"))
    val b = Seq(("g1", Seq.fill(16)(3L)))
      .toDF("group_key", "sig").withColumn("family", lit("md5"))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val e = intercept[Exception] {
      graft.api.Graft.mergeMinHashIndexes(a, b).collect()
    }
    assert(messages(e).exists(_.contains("signature-width mismatch")),
      s"expected the width-mismatch error, got: $e")
    // one-sided groups of any width still pass through untouched
    val ok = graft.api.Graft.mergeMinHashIndexes(
      a, Seq(("g2", Seq.fill(16)(3L))).toDF("group_key", "sig")
        .withColumn("family", lit("md5")))
    assert(ok.count() === 2)
  }

  test("nearDupsAgainstIndex: banded query equals brute-force signature agreement") {
    import graft.api.Graft
    val docs = Lake(spark, sfDir).documents
    val stored = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0).limit(60)
    // per-doc index (each group = one stored doc) — the dedup use case
    val index = Graft.minHashIndex(
      stored.withColumn("gid", col("doc_id").cast("string")), "gid", "text")

    val banded = Graft.nearDupsAgainstIndex(batch, "doc_id", "text", index,
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    // brute force: every (batch sig × index sig) agreement, no banding.
    // Banding can only MISS pairs whose agreement has no full matching
    // band; at threshold 0.5 with 4 bands of 3 rows a qualifying pair
    // always shares ≥ ceil(0.5·12)=6 slots... not necessarily banded —
    // so assert (a) banded ⊆ brute, and (b) banded finds every pair
    // with a fully-agreeing band, which at agreement = 1.0 is all of
    // them (the exact-duplicate guarantee).
    val bsig = batch
      .select(col("doc_id"), hashedShingles(col("text"), 3).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), minHash(col("hs"), 12).as("bsig"))
    val brute = bsig.crossJoin(index.select(col("group_key"), col("sig")))
      .select(col("doc_id"), col("group_key"),
        (size(filter(zip_with(col("bsig"), col("sig"), (a, b) => a === b),
          x => x)).cast("double") / 12).as("agree"))
    val bruteHits = brute.filter(col("agree") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val exactDups = brute.filter(col("agree") === 1.0)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    assert(banded.subsetOf(bruteHits), "banding must never invent a hit")
    assert(exactDups.subsetOf(banded),
      "a fully-agreeing signature always shares every band — exact dups cannot be missed")
    assert(banded.nonEmpty, "synthetic corpus contains near-dups; query found none")
  }

  test("nearDupsAgainstIndex refuses an index from a different hash family") {
    import graft.api.Graft
    import spark.implicits._
    val batch = Lake(spark, sfDir).documents.limit(5)
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))

    val foreign = Seq(("g1", Seq.fill(12)(1L), "xxhash64"))
      .toDF("group_key", "sig", "family")
    val e = intercept[Exception] {
      Graft.nearDupsAgainstIndex(batch, "doc_id", "text", foreign).collect()
    }
    assert(messages(e).exists(_.contains("hash-family mismatch")),
      s"expected the family-mismatch error, got: $e")

    // a NULL family must also refuse — it would otherwise silently
    // compare signatures of unknown provenance
    val nullFam = Seq(("g1", Seq.fill(12)(1L)))
      .toDF("group_key", "sig")
      .withColumn("family", lit(null).cast("string"))
    val e2 = intercept[Exception] {
      Graft.nearDupsAgainstIndex(batch, "doc_id", "text", nullFam).collect()
    }
    assert(messages(e2).exists(_.contains("hash-family mismatch")),
      s"expected the family-mismatch error on NULL family, got: $e2")

    // a stored signature narrower than the query's slots would band
    // empty slices and cap agreement below 1.0 — must refuse, not degrade
    val narrow = Seq(("g1", Seq.fill(8)(1L), "md5"))
      .toDF("group_key", "sig", "family")
    val e3 = intercept[Exception] {
      Graft.nearDupsAgainstIndex(batch, "doc_id", "text", narrow,
        slots = 12).collect()
    }
    assert(messages(e3).exists(_.contains("signature width mismatch")),
      s"expected the width-mismatch error, got: $e3")
  }

  test("partial-merge order does not matter (associativity/commutativity)") {
    val agg = new MinHashAgg(4)
    val s1 = Array(5L, 9L, 2L, 7L)
    val s2 = Array(3L, 11L, 8L, 1L)
    val s3 = Array(6L, 4L, 10L, 12L)
    val ab = agg.merge(agg.merge(s1.clone(), s2.clone()), s3.clone()).toSeq
    val cb = agg.merge(agg.merge(s3.clone(), s2.clone()), s1.clone()).toSeq
    assert(ab === cb)
    assert(ab === Seq(3L, 4L, 2L, 1L))
  }
}
