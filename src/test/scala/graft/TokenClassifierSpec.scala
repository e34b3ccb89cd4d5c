package graft

import graft.operators.TokenClassifier
import org.apache.spark.sql.functions._

/** The hashed-n-gram two-distribution scorer behind q137 (DSIR domain
  * selection) and q138 (fastText-style quality filter): model fit,
  * linear + log scoring consistency, feature extraction edges, and the
  * deterministic importance resampler (the log-domain half the oracle
  * cannot check — engine-dependent ln). */
class TokenClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64 // small bucket space: collisions exercised on purpose

  test("bigramBuckets: n-1 bigrams, empty under two tokens") {
    val df = Seq("a b c d", "one", " padded  text ").toDF("text")
      .select(size(TokenClassifier.bigramBuckets(col("text"), B)).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(3, 0, 2))
    // " padded  text " trims to "padded  text": split on single space
    // gives (padded, "", text) -> 2 bigrams — the engine-shared tokenizer
  }

  test("fitRatio learns the class vocabulary; scores separate classes") {
    // the DEFAULT bucket space here: at B=64 a shared token colliding
    // into a class-marker bucket legitimately drags a document's LINEAR
    // mean across the boundary (one 40:1 weight dominates the average) —
    // the hash width is part of the model, as in any hashing-trick
    // classifier
    val B = TokenClassifier.DefaultBuckets
    val good = (0 until 40).map(i => (s"alpha beta gamma tok$i", true))
    val bad = (0 until 40).map(i => (s"zeta eta theta tok$i", false))
    val df = (good ++ bad).toDF("text", "t")
    val feats = TokenClassifier.unigramBuckets(col("text"), B)
    val w = TokenClassifier.fitRatio(df.select(col("t"), feats.as("f")), "f", "t", B)
    assert(w.length === B)
    assert(w.forall(x => x > 0 && !x.isNaN && !x.isInfinite))
    val scored = df.select(col("t"),
      TokenClassifier.meanRatioScore(feats, w).as("s"),
      TokenClassifier.logScore(feats, w).as("ls")).collect()
    val (g, b) = scored.partition(_.getBoolean(0))
    // every good doc must outscore every bad doc in BOTH domains (3 of
    // 4 tokens are pure class markers)
    assert(g.map(_.getDouble(1)).min > b.map(_.getDouble(1)).max)
    assert(g.map(_.getDouble(2)).min > b.map(_.getDouble(2)).max)
    // target-typical text sits above 1 / 0; raw-typical below
    assert(g.map(_.getDouble(1)).min > 1.0 && b.map(_.getDouble(1)).max < 1.0)
    assert(g.map(_.getDouble(2)).min > 0.0 && b.map(_.getDouble(2)).max < 0.0)
  }

  test("degenerate fits stay finite: empty corpus and one-class corpus") {
    val empty = Seq.empty[(String, Boolean)].toDF("text", "t")
    val feats = TokenClassifier.unigramBuckets(col("text"), B)
    val w0 = TokenClassifier.fitRatio(empty.select(col("t"), feats.as("f")), "f", "t", B)
    assert(w0.forall(_ === 1.0), "no evidence -> uniform weights")
    // one-class corpora skew every weight the same way, never NaN/Inf
    val oneClass = Seq(("alpha beta", true)).toDF("text", "t")
    val w1 = TokenClassifier.fitRatio(oneClass.select(col("t"), feats.as("f")), "f", "t", B)
    assert(w1.forall(x => x > 0 && !x.isNaN && !x.isInfinite))
  }

  test("logScore is the exact sum of per-bucket log weights") {
    val df = Seq("x y x").toDF("text")
    val feats = TokenClassifier.unigramBuckets(col("text"), B)
    val w = Array.tabulate(B)(i => 1.0 + i / 64.0)
    val buckets = df.select(feats.as("f")).head().getSeq[Int](0)
    val expected = buckets.map(b => math.log(w(b))).sum
    val got = df.select(TokenClassifier.logScore(feats, w)).head().getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("resample: deterministic, monotone in scale, weight-proportional") {
    val docs = (0 until 500).map(i =>
      (i.toLong, if (i % 5 == 0) 0.0 else -3.0)) // 100 heavy, 400 light
      .toDF("doc_id", "ls")
    def kept(scale: Double) =
      TokenClassifier.resample(docs, "doc_id", "ls", scale)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val a = kept(0.5); val b2 = kept(0.5)
    assert(a === b2, "hash-threshold sampling must be reproducible")
    assert(kept(0.0).isEmpty)
    assert(kept(1e9).size === 500, "a huge scale keeps everything")
    // acceptance tracks exp(ls): heavy docs (weight 1.0) accepted at
    // ~10x the light docs' rate (weight e^-3 ~ 0.05)
    val heavy = a.count(_ % 5 == 0) / 100.0
    val light = a.count(_ % 5 != 0) / 400.0
    assert(heavy > 0.35 && heavy <= 0.6,
      s"heavy acceptance ~0.5, got $heavy")
    assert(light < heavy / 4, s"light $light vs heavy $heavy")
  }

  test("resampleLinear: monotone in scale AND in score; exp/ln-free") {
    val docs = (0 until 600).map(i =>
      (i.toLong, (i % 3) match { case 0 => 2.0; case 1 => 0.5; case _ => 0.05 }))
      .toDF("doc_id", "score")
    def kept(scale: Double) =
      TokenClassifier.resampleLinear(docs, "doc_id", "score", scale)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val s02 = kept(0.2); val s05 = kept(0.5); val s50 = kept(50.0)
    assert(kept(0.5) === s05, "reproducible")
    assert(s02.subsetOf(s05) && s05.subsetOf(s50),
      "a survivor at a small scale survives every larger scale")
    assert(s50.size === 600, "scale past 1/min(score) keeps everything")
    // per-row score monotonicity: for the SAME id-hash point, a higher
    // score can only widen acceptance — rows of score 2.0 accepted at
    // a rate tracking min(1, 0.5*2.0)=1.0 vs 0.5*0.05=0.025
    val hi = s05.count(_ % 3 == 0) / 200.0
    val lo = s05.count(_ % 3 == 2) / 200.0
    assert(hi > 0.95, s"score 2.0 at scale 0.5 saturates acceptance: $hi")
    assert(lo < 0.1, s"score 0.05 accepts rarely: $lo")
  }
}
