package graft

import graft.functions.TextFns._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5): dedup idempotence, cross-layer
  * reconciliation, tier-bucketing totality, Jaccard bounds. Raw ScalaCheck
  * generators sampled under fixed seeds (no scalatestplus bridge in the
  * dependency set).
  */
class PropertiesSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val texts: Gen[List[String]] = Gen.listOfN(30,
    Gen.listOf(Gen.oneOf("data", "row", "spark", "join", "scan", "key"))
      .map(_.mkString(" ")))

  test("dropDuplicates is idempotent and never increases row count") {
    import spark.implicits._
    samples(texts, 5).foreach { ts =>
      val df = ts.toDF("t")
      val once = df.dropDuplicates("t")
      assert(once.count() === once.dropDuplicates("t").count())
      assert(once.count() <= df.count())
    }
  }

  test("jaccard is bounded in [0,1] and symmetric") {
    import spark.implicits._
    samples(Gen.zip(texts, texts), 3).foreach { case (as, bs) =>
      val pairs = as.zip(bs).filter { case (a, b) =>
        a.split(" ").length >= 3 && b.split(" ").length >= 3
      }
      if (pairs.nonEmpty) {
        pairs.toDF("a", "b").select(
          jaccard(hashedShingles(col("a"), 3), hashedShingles(col("b"), 3)).as("ab"),
          jaccard(hashedShingles(col("b"), 3), hashedShingles(col("a"), 3)).as("ba"))
          .collect()
          .foreach { row =>
            val (ab, ba) = (row.getDouble(0), row.getDouble(1))
            assert(ab >= 0.0 && ab <= 1.0)
            assert(ab === ba)
          }
      }
    }
  }

  test("tier bucketing is total: every double lands in exactly one tier") {
    import spark.implicits._
    samples(Gen.listOfN(50, Gen.chooseNum(-1e7, 1e7)), 5).foreach { vs =>
      val n = vs.toDF("v")
        .withColumn("tier",
          when(col("v") > 1500000, "Premium")
            .when(col("v") > 700000, "Gold")
            .when(col("v") > 200000, "Silver")
            .otherwise("Bronze"))
        .filter(col("tier").isNull).count()
      assert(n === 0L)
    }
  }

  /** Run `body` with spark.graft.fastHash=true, restoring the session. */
  private def withFastHash[A](body: => A): A =
    try { spark.conf.set("spark.graft.fastHash", "true"); body }
    finally spark.conf.unset("spark.graft.fastHash")

  test("fastHash=true: nearDupPairs finds the same pairs as the md5 family") {
    import graft.api.Graft
    import spark.implicits._
    // planted corpus: disjoint per-doc vocabularies (cross-pair Jaccard =
    // 0, so neither family can candidate them) + 3 planted exact dups
    // (Jaccard = 1 — every band collides, recall certain for ANY family;
    // fuzzy-recall behavior is the oracle-checked q36's job, this test is
    // about family agreement)
    val base = (1 to 40).map(i =>
      (i.toLong, (0 until 10).map(w => s"w${i}x$w").mkString(" ")))
    val dups = Seq(41L -> base(2)._2, 42L -> base(5)._2, 43L -> base(9)._2)
    val docs = (base ++ dups).toDF("doc_id", "text")
    def pairs() = Graft.nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val md5Pairs = pairs()
    val fastPairs = withFastHash(pairs())
    assert(md5Pairs.nonEmpty, "the planted corpus must produce near-dup pairs")
    assert(fastPairs === md5Pairs,
      "both hash families must surface the same verified near-dup pairs")
    // deterministic under re-evaluation and repartitioning
    assert(withFastHash(pairs()) === fastPairs)
    graft.core.CacheScope.releaseAll()
  }

  test("fastHash=true: hashSample is deterministic, partition-invariant, ~p%") {
    import graft.api.Graft
    import spark.implicits._
    val df = (1L to 4000L).toDF("id")
    withFastHash {
      val a = Graft.hashSample(df, col("id"), 20).collect().map(_.getLong(0)).toSet
      val b = Graft.hashSample(df.repartition(13), col("id"), 20)
        .collect().map(_.getLong(0)).toSet
      assert(a === b, "sample membership must not depend on partitioning")
      assert(math.abs(a.size - 800) < 200, s"~20% of 4000 expected, got ${a.size}")
      // the fast family is a DIFFERENT deterministic family than md5
      val md5Sample = { spark.conf.unset("spark.graft.fastHash")
        val s = Graft.hashSample(df, col("id"), 20).collect().map(_.getLong(0)).toSet
        spark.conf.set("spark.graft.fastHash", "true"); s }
      assert(md5Sample !== a)
      assert(math.abs(md5Sample.size - 800) < 200)
    }
  }

  test("cross-layer reconciliation: bronze preserves rows; silver keeps distinct keys") {
    import spark.implicits._
    import graft.medallion.Medallion
    import graft.medallion.Medallion.CleaningRule
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("amount", DoubleType)))
    samples(Gen.listOfN(40, Gen.zip(Gen.chooseNum(1L, 30L), Gen.chooseNum(0.0, 1e4))), 3)
      .foreach { rows =>
        val src = rows.toDF("id", "amount")
        val root = new java.io.File(
          s"target/tmp/prop_${java.util.UUID.randomUUID()}").getAbsolutePath
        val p = Medallion.writeBronze(src, "t", "2026-03-01 00:00:00", root)
        val bronze = Medallion.readBronze(spark, p, schema)
        val silver = Medallion.toSilver(bronze,
          CleaningRule(Seq("id"), Seq("id", "amount")), "2026-03-01 00:00:00")
        assert(bronze.count() === src.count())
        assert(silver.count() === src.dropDuplicates("id").count())
      }
  }

  test("q37 (bucket-blocked) finds a subset of q37b (prefix-filtered, complete)") {
    // q37 restricts candidates to same/adjacent length buckets; q37b is
    // bucket-free and complete by the prefix-filter theorem — so on the
    // same corpus and threshold, q37's pairs must be contained in q37b's
    val blocked = graft.queries.TextOps
      .q37NgramJaccard(spark, SparkSpec.sfDir)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val complete = graft.queries.TextOps
      .q37bPrefixJaccard(spark, SparkSpec.sfDir)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(complete),
      s"bucket-blocked pairs missing from the complete join: ${blocked -- complete}")
  }
}
