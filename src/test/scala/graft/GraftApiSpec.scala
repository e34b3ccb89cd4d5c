package graft

import graft.api.Graft
import graft.core.Lake
import org.apache.spark.sql.functions._

/** The public facade must agree with the oracle-verified query inventory. */
class GraftApiSpec extends SparkSpec {

  test("nearDupPairs equals q36's verified pairs") {
    val docs = Lake(spark, sfDir).documents
    val api = Graft.nearDupPairs(docs, "doc_id", "text")
      .orderBy("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val q36 = graft.queries.TextOps.q36MinHashLsh(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(api.toSeq === q36.toSeq)
  }

  test("nearDupPairs rejects a bands count that does not divide minHashes") {
    val docs = Lake(spark, sfDir).documents
    val e = intercept[IllegalArgumentException] {
      Graft.nearDupPairs(docs, "doc_id", "text", minHashes = 12, bands = 5)
    }
    assert(e.getMessage.contains("must divide"))
  }

  test("knn equals q40's neighbors for the same query set") {
    val emb = Lake(spark, sfDir).embeddings
    val api = Graft.knn(spark,
      emb.filter(col("vec_id") < 16), emb, "vec_id", "embedding", k = 5)
      .orderBy("q_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val q40 = graft.queries.VectorOps.q40KnnBruteForce(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(api.toSeq === q40.toSeq)
  }

  test("dedupExact keeps one row per normalized text, smallest id") {
    import spark.implicits._
    val df = Seq((3L, "A b"), (1L, " a B "), (2L, "c")).toDF("id", "text")
    val out = Graft.dedupExact(df, "id", "text").orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("hashSample is deterministic and partition-invariant") {
    val li = Lake(spark, sfDir).lineitem
    val key = concat(col("l_orderkey").cast("string"), lit(":"),
      col("l_linenumber").cast("string"))
    val a = Graft.hashSample(li, key, 10).count()
    val b = Graft.hashSample(li.repartition(17), key, 10).count()
    assert(a === b && a > 0)
  }

  test("stratifiedSample hits every stratum's quota exactly (when stratum is big enough)") {
    val docs = Lake(spark, sfDir).documents
    val out = Graft.stratifiedSample(docs, "lang", "doc_id", 10)
    val perStratum = out.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val available = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    available.foreach { case (lang, n) =>
      assert(perStratum(lang) === math.min(10L, n), s"quota miss for $lang")
    }
    // deterministic under repartitioning
    val again = Graft.stratifiedSample(docs.repartition(13), "lang", "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("vocabulary and repetitionFlags run over the documents table") {
    val docs = Lake(spark, sfDir).documents
    val vocab = Graft.vocabulary(docs, "lang", "text", 5)
    assert(vocab.groupBy("lang").count().collect().forall(_.getLong(1) === 5L))
    val flags = Graft.repetitionFlags(docs, "doc_id", "text")
    assert(flags.count() === docs.count())
    assert(flags.filter(col("max_token_ratio") > 1.0).count() === 0)
  }

  test("fitTokenRatio + tokenRatioScore + importanceResample compose (DSIR facade)") {
    import spark.implicits._
    val labeled = ((0 until 30).map(i => (s"alpha beta tok$i", true)) ++
      (0 until 30).map(i => (s"zeta eta tok$i", false))).toDF("text", "t")
    val w = Graft.fitTokenRatio(labeled, "text", "t")
    assert(w.length === 4096 && w.forall(_ > 0))
    val scored = Graft.tokenRatioScore(
      labeled.withColumn("doc_id", monotonically_increasing_id()), "text", w)
    val byClass = scored.groupBy("t").agg(min("score"), max("score")).collect()
      .map(r => r.getBoolean(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(byClass(true)._1 > byClass(false)._2, "classes separate")
    val kept = Graft.importanceResample(scored, "doc_id", "log_score", 1.0)
    assert(kept.filter(col("t")).count() > kept.filter(!col("t")).count(),
      "target-typical docs survive resampling preferentially")
    // bigram variant runs end to end
    assert(Graft.fitTokenRatio(labeled, "text", "t", bigrams = true).length === 4096)
  }

  test("capPerSource keeps at most k best per source") {
    import spark.implicits._
    val df = (0 until 40).map(i => (i.toLong, s"src${i % 2}", i.toLong))
      .toDF("doc_id", "source", "score")
    val capped = Graft.capPerSource(df, "doc_id", "source", "score", k = 5)
    val per = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per === Map("src0" -> 5L, "src1" -> 5L))
    assert(capped.agg(min("score")).head().getLong(0) >= 30L, "keeps the best")
  }

  test("contamination finds a planted probe overlap and nothing else") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"),
      (3L, "red green blue yellow purple orange pink teal"))
      .toDF("doc_id", "text")
    // probe shares doc 1's text wholesale; nothing overlaps docs 2-3
    val probes = Seq((99L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val hits = Graft.contamination(corpus, probes, "doc_id", "text", minOverlap = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.toSeq === Seq((1L, 6L))) // 8 tokens → 6 distinct 3-shingles
  }

  test("removeNearDups keeps one canonical member per planted duplicate pair") {
    import spark.implicits._
    // disjoint vocabularies + exact planted dups (certain LSH recall)
    val base = (1 to 30).map(i =>
      (i.toLong, (0 until 10).map(w => s"tok${i}x$w").mkString(" ")))
    val dups = Seq(31L -> base(4)._2, 32L -> base(9)._2)
    val docs = (base ++ dups).toDF("doc_id", "text")
    val kept = Graft.removeNearDups(docs, "doc_id", "text", threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === (1L to 30L).toSet,
      "the higher-id member of each dup pair must drop; all unique docs survive")
    Graft.releaseCaches()
  }

  test("openLake registers queryable views with native functions available") {
    Graft.openLake(spark, sfDir)
    val n = spark.sql(
      "SELECT count(*) FROM embeddings WHERE cosine_sim(embedding, embedding) > 0.99")
      .head().getLong(0)
    assert(n === 500L)
  }

  test("round-5 facade delegations run end to end over the documents table") {
    import spark.implicits._
    val docs = graft.core.Lake(spark, SparkSpec.sfDir).documents.limit(60)

    assert(Graft.gopherFilters(docs, "doc_id", "text").columns.contains("keep"))
    assert(Graft.boilerplateRemoval(docs, "doc_id", "text", segTokens = 3)
      .columns.contains("clean_text"))
    assert(Graft.dedupKeepBest(docs, "doc_id", "text", "n_chars").count() > 0)
    assert(Graft.temperatureWeights(docs, "source").columns.contains("rel_epochs"))
    val split = Graft.trainValTestSplit(docs, "doc_id", 800000, 100000)
    assert(split.select("split").distinct().count() >= 2)

    val lm = Graft.fitLm(docs, "text")
    assert(Graft.scoreLm(docs, "doc_id", "text", lm).columns.contains("avg_logprob"))

    val bpe = Graft.bpeFit(docs, "text", numMerges = 3)
    assert(Graft.bpeEncode(Seq((1L, "the data")).toDF("doc_id", "text"),
      "doc_id", "text", bpe).columns.contains("bpe_tokens"))

    val emb = graft.core.Lake(spark, SparkSpec.sfDir).embeddings.limit(100)
    val pq = Graft.pqFit(emb, "vec_id", "embedding", 64, m = 4, k = 4, iters = 1)
    val codes = Graft.pqEncode(emb, "vec_id", "embedding", pq)
    assert(Graft.pqSearch(codes, emb.limit(2), "vec_id", "embedding", pq, topK = 3)
      .count() === 6L)

    val tbl = Graft.table(
      s"target/tmp/facade_tbl_${java.util.UUID.randomUUID().toString.take(8)}")
    tbl.append(Seq((1L, "a")).toDF("id", "v"))
    assert(tbl.read(spark).count() === 1L)

    // the SQL-catalog registration: one call, then plain SQL DML
    val wh = s"target/tmp/facade_wh_${java.util.UUID.randomUUID().toString.take(8)}"
    Graft.registerCatalog(spark, "gapi", new java.io.File(wh).getAbsolutePath)
    try {
      spark.sql("CREATE TABLE gapi.db.t (id BIGINT, v STRING)")
      spark.sql("INSERT INTO gapi.db.t VALUES (1, 'a'), (2, 'b')")
      spark.sql("UPDATE gapi.db.t SET v = 'z' WHERE id = 2")
      assert(spark.sql("SELECT v FROM gapi.db.t ORDER BY id").collect()
        .map(_.getString(0)).toSeq === Seq("a", "z"))
      // re-pointing a registered name must fail loudly: Spark caches
      // catalog instances per session, so the conf flip would silently
      // keep using the OLD warehouse
      intercept[IllegalArgumentException](
        Graft.registerCatalog(spark, "gapi", "/tmp/other-warehouse"))
      // same name + same warehouse is an idempotent no-op
      Graft.registerCatalog(spark, "gapi", new java.io.File(wh).getAbsolutePath)
    } finally {
      spark.conf.unset("spark.sql.catalog.gapi")
      spark.conf.unset("spark.sql.catalog.gapi.warehouse")
    }
  }

  test("perceptualNearDupGroups: O(groups+edges) collapsed surface via the facade") {
    import spark.implicits._
    // 500 exact copies of one fingerprint, one near hash (Hamming 2),
    // one far hash — the collapsed surface must be 3 group rows and
    // exactly one rep-level edge, independent of the hot group's size
    val hot = 0x0123456789abcdL & ((1L << 60) - 1)
    val near = hot ^ 0x3L        // Hamming 2
    val far = ~hot & ((1L << 60) - 1) // Hamming 60
    val rows = (1L to 500L).map(i => (i, hot)) ++
      Seq((900L, near), (901L, far))
    val hashes = rows.toDF("id", "fp")
    val (groups, edges) = Graft.perceptualNearDupGroups(hashes, "id", "fp")
    val g = groups.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(g.length === 3, s"3 distinct fingerprints: ${g.toSeq}")
    assert(g.find(_._1 == hot).get === ((hot, 1L, 500L)),
      "hot group: rep = min id, cnt = full membership")
    val e = edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(e.toSeq === Seq((math.min(hot, near), math.max(hot, near), 2)),
      s"exactly one rep-level edge at Hamming 2: ${e.toSeq}")
    // composes with connectedComponents at the REP level: one cluster
    // {hot, near}, far alone — via id-space rep edges
    val repEdges = e.toSeq.map { case (ha, hb, _) =>
      (g.find(_._1 == ha).get._2, g.find(_._1 == hb).get._2)
    }.toDF("src", "dst")
    val cc = Graft.connectedComponents(repEdges, "src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc(900L) === 1L, "near-dup rep clusters with the hot rep")
  }
}
