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
