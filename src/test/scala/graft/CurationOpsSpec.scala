package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Unit tests for the round-5 curation operators: the Gopher hard-filter
  * suite, CCNet-style boilerplate removal, and α=0.5 temperature mixture
  * reweighting — planted-input semantics plus the zero/one-shuffle plan
  * shapes the scale notes claim.
  */
class CurationOpsSpec extends SparkSpec {

  test("gopherFilters: each rule fires on its planted violator and keep is the conjunction") {
    import spark.implicits._
    val docs = Seq(
      // good: 20+ tokens incl 2 stopwords, short words, no runs
      (1L, ("the a " + (1 to 20).map(i => s"tok$i").mkString(" ")).trim),
      (2L, "the a short doc"),                               // too few tokens
      (3L, ("the a " + (1 to 20).map(i => s"tok$i").mkString(" ")
        + " run run run run").trim),                          // long run
      (4L, (1 to 22).map(i => s"tok$i").mkString(" ")),       // no stopwords
      (5L, ("the a " + (1 to 20).map(_ => "extraordinarily").mkString(" ")).trim)
    ).toDF("doc_id", "text")
    val out = Curation.gopherFilters(docs, "doc_id", "text",
      minToks = 10, maxToks = 100, minMeanLen = 1.0, maxMeanLen = 8.0,
      minStopwords = 2, maxRun = 2).orderBy("doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Int]("ok_word_count"), r.getAs[Int]("ok_mean_len"),
          r.getAs[Int]("ok_stopwords"), r.getAs[Int]("ok_run"),
          r.getAs[Int]("keep"))).toMap
    assert(out(1L) === ((1, 1, 1, 1, 1)))
    assert(out(2L)._1 === 0 && out(2L)._5 === 0)
    assert(out(3L)._4 === 0 && out(3L)._5 === 0)
    assert(out(4L)._3 === 0 && out(4L)._5 === 0)
    assert(out(5L)._2 === 0 && out(5L)._5 === 0) // mean token len > 8
  }

  test("gopherFilters: max_run counts the longest adjacent run only") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y x y x y"),           // repeats but never adjacent → 1
      (2L, "x x y y y x"),           // runs 2 and 3 → 3
      (3L, "z z z z z z")            // one run of 6
    ).toDF("doc_id", "text")
    val runs = Curation.gopherFilters(docs, "doc_id", "text")
      .orderBy("doc_id").select("max_run").as[Long].collect()
    assert(runs.toSeq === Seq(1L, 3L, 6L))
  }

  test("gopherFilters is a narrow projection: zero exchanges in the plan") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val p = Curation.gopherFilters(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"gopherFilters must stay scan-parallel (no shuffle):\n$p")
  }

  test("boilerplateRemoval flags cross-doc repeated segments and reassembles in order") {
    import spark.implicits._
    // segment length 2: "nav bar" planted segment-aligned in docs 1-3
    val docs = Seq(
      (1L, "nav bar alpha beta gamma delta"),
      (2L, "nav bar epsilon zeta eta theta"),
      (3L, "nav bar iota kappa"),
      (4L, "lambda mu nu xi")
    ).toDF("doc_id", "text")
    val out = Curation.boilerplateRemoval(docs, "doc_id", "text",
      segTokens = 2, minDocs = 3).orderBy("doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_segments"), r.getAs[Long]("n_boilerplate"),
          r.getAs[String]("clean_text"))).toMap
    assert(out(1L) === ((3L, 1L, "alpha beta gamma delta")))
    assert(out(2L) === ((3L, 1L, "epsilon zeta eta theta")))
    assert(out(3L) === ((2L, 1L, "iota kappa")))
    assert(out(4L) === ((2L, 0L, "lambda mu nu xi")))
  }

  test("boilerplateRemoval: a document that is ALL boilerplate empties cleanly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "nav bar"), (2L, "nav bar"), (3L, "nav bar")
    ).toDF("doc_id", "text")
    val out = Curation.boilerplateRemoval(docs, "doc_id", "text",
      segTokens = 2, minDocs = 3).orderBy("doc_id").collect()
    assert(out.forall(_.getAs[String]("clean_text") === ""))
    assert(out.forall(_.getAs[Long]("n_boilerplate") === 1L))
  }

  test("boilerplateRemoval: within-doc repetition alone never flags (distinct docs counted)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"), // same segment 3× in ONE doc
      (2L, "unique words here friend")
    ).toDF("doc_id", "text")
    val out = Curation.boilerplateRemoval(docs, "doc_id", "text",
      segTokens = 2, minDocs = 2).orderBy("doc_id").collect()
    assert(out.forall(_.getAs[Long]("n_boilerplate") === 0L))
  }

  test("temperatureWeights: rel_epochs is exactly sqrt(n_max/n_s) and heads get 1.0") {
    import spark.implicits._
    val docs = (Seq.fill(100)("big") ++ Seq.fill(25)("mid") ++ Seq.fill(4)("tiny"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val out = Curation.temperatureWeights(docs, "source")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rel_epochs")).toMap
    assert(out("big") === 1.0)
    assert(out("mid") === 2.0)   // sqrt(100/25)
    assert(out("tiny") === 5.0)  // sqrt(100/4)
  }

  test("dedupKeepBest: reordered/repeated copies collapse; highest score wins, ties to lowest id") {
    import spark.implicits._
    val docs = Seq(
      (10L, "alpha beta gamma", 30L),        // group A, low score
      (11L, "gamma beta alpha alpha", 90L),  // group A (reorder + repeat), best
      (12L, "beta alpha gamma gamma", 90L),  // group A, tied score, higher id
      (20L, "delta epsilon", 50L),           // group B, alone
      (21L, "delta epsilon zeta", 10L))      // group C: different token SET
      .toDF("doc_id", "text", "quality")
    val out = Curation.dedupKeepBest(docs, "doc_id", "text", "quality")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(
      11L -> ((90L, 3L)), // beats 10 on score, beats 12 on id tie-break
      20L -> ((50L, 1L)),
      21L -> ((10L, 1L))))
  }

  test("dedupKeepBest: string/UUID id columns analyze and tie-break to the lowest id") {
    import spark.implicits._
    val docs = Seq(
      ("doc-b", "alpha beta gamma", 90L),  // group A, tied score, higher id
      ("doc-a", "gamma beta alpha", 90L),  // group A, tied score, LOWEST id → wins
      ("doc-c", "alpha beta gamma", 30L),  // group A, low score
      ("doc-z", "delta epsilon", 50L))     // group B, alone
      .toDF("doc_id", "text", "quality")
    val out = Curation.dedupKeepBest(docs, "doc_id", "text", "quality")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map("doc-a" -> ((90L, 3L)), "doc-z" -> ((50L, 1L))))
  }

  test("temperatureWeights composes with mixCorpus: weights feed the mixture recipe") {
    import spark.implicits._
    val docs = (Seq.fill(16)("big") ++ Seq.fill(4)("tiny"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val weights = Curation.temperatureWeights(docs, "source")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rel_epochs")).toMap
    val mixed = Curation.mixCorpus(docs, "doc_id", "source", weights)
    // big keeps 1 epoch = 16 rows; tiny gets exactly 2 epochs (sqrt(16/4)) = 8
    val bySrc = mixed.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("big") === 16L)
    assert(bySrc("tiny") === 8L)
  }

  test("capPerSource: k best per source survive, ranked; pre-cap totals ride along") {
    import spark.implicits._
    val docs = Seq(
      // dominant source: 5 docs, cap 2 keeps the two longest
      (1L, "web", 100L), (2L, "web", 300L), (3L, "web", 200L),
      (4L, "web", 300L), (5L, "web", 50L),
      // small source under the cap: untouched
      (6L, "books", 10L), (7L, "books", 20L)
    ).toDF("doc_id", "source", "n_chars")
    val out = Curation.capPerSource(docs, "doc_id", "source", "n_chars", 2)
      .select("source", "doc_id", "src_rank", "src_total")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    // ties on n_chars=300 break to the LOWER doc_id first
    assert(out === Set(
      ("web", 2L, 1, 5L), ("web", 4L, 2, 5L),
      ("books", 7L, 1, 2L), ("books", 6L, 2, 2L)))
  }

  test("dedupParagraphs: first corpus occurrence survives, later copies cut, order kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha\nshared one\nbeta"),
      (2L, "shared one\ngamma\nshared two"),
      (3L, "shared two\nshared one\ndelta"),
      (4L, "shared one") // ALL paragraphs duplicated -> empties cleanly
    ).toDF("doc_id", "text")
    val out = Curation.dedupParagraphs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("alpha\nshared one\nbeta", 3L, 3L)))
    assert(out(2L) == (("gamma\nshared two", 2L, 3L)),
      "doc2 loses 'shared one' (doc1 owns it) but keeps first 'shared two'")
    assert(out(3L) == (("delta", 1L, 3L)),
      "doc3 loses both shared paragraphs to earlier docs")
    assert(out(4L) == (("", 0L, 1L)), "a fully-duplicated doc empties, stays a row")
  }

  test("dedupParagraphs: within-doc repeats keep only the first position") {
    import spark.implicits._
    val docs = Seq((7L, "x\ny\nx\nz\nx")).toDF("doc_id", "text")
    val out = Curation.dedupParagraphs(docs, "doc_id", "text").collect().head
    assert(out.getString(1) == "x\ny\nz" && out.getLong(2) == 3L && out.getLong(3) == 5L)
  }

  test("removeDuplicatedSpans: keep-first cuts later occurrences, short docs untouched") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def rand(n: Int) = Iterator.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val span = rand(60)
    // doc 1 holds the first occurrence; docs 2/3 plant the SAME span at
    // stride-ALIGNED offsets (windowed approximation: alignment mod
    // stride is what makes window contents coincide — the q112 caveat)
    val d1 = span + rand(40)
    val d2 = rand(20) + span + rand(20)
    val d3 = rand(40) + span
    val docs = Seq((1L, d1), (2L, d2), (3L, d3),
      (4L, "tiny"), (5L, rand(100)),
      (6L, rand(10) * 12)) // within-doc repeat: 120 chars, period 10
    val out = Curation.removeDuplicatedSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // every doc surfaces with its true original length
    docs.foreach { case (id, t) => assert(out(id)._1 === t.length.toLong) }
    // doc 1 is the canonical first occurrence everywhere: untouched
    assert(out(1L) === ((100L, 0L, d1)))
    // docs 2/3 lose every fully-covering aligned window of the span;
    // the cleaned text must contain NO 40-char window of the span at
    // any aligned position and must keep the padding
    Seq(2L, 3L).foreach { id =>
      val (_, nRem, cleaned) = out(id)
      assert(nRem >= 40L, s"doc $id removed only $nRem")
      assert(!cleaned.contains(span.substring(10, 50)),
        s"doc $id kept an interior span window")
    }
    assert(out(2L)._3.startsWith(d2.substring(0, 20).take(10)) ||
      out(2L)._2 > 0L) // padding before an unaligned boundary survives
    // short and unique docs pass through byte-identical
    assert(out(4L) === ((4L, 0L, "tiny")))
    assert(out(5L) === ((100L, 0L, docs(4)._2)))
    // within-doc repetition: the periodic doc keeps its head, loses the
    // self-repeated tail windows
    assert(out(6L)._2 >= 40L)
    assert(out(6L)._3.startsWith(docs(5)._2.take(10)))
    // conservation: orig_len = cleaned + removed, always
    out.values.foreach { case (o, n, c) => assert(o === n + c.length) }
  }

  test("removeDuplicatedSpans is partitioning-invariant (keep-first is a global min, not task order)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def rand(n: Int) = Iterator.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val span = rand(50)
    val docs = (1L to 30L).map(i =>
      (i, rand(10 * (i % 3).toInt) + span + rand(30))).toDF("doc_id", "text")
    def run(parts: Int) =
      Curation.removeDuplicatedSpans(docs.repartition(parts), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    assert(run(1) === run(13))
  }
}
