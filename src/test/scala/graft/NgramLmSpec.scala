package graft

import graft.operators.NgramLm
import org.apache.spark.sql.functions._

/** The bigram-LM quality scorer must agree exactly with a transparent
  * single-threaded reference (same add-one math, same Math.log, exact
  * decimal mean), be partitioning-invariant, and actually discriminate
  * natural word order from scrambled text — the property the filter
  * exists for. */
class NgramLmSpec extends SparkSpec {

  private val trusted = Seq(
    "the cat sat on the mat",
    "the cat ate the fish",
    "the dog sat on the rug",
    "a cat and a dog")

  private def trustedDf(partitions: Int) = {
    import spark.implicits._
    trusted.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(partitions)
  }

  /** Reference: identical algorithm, plain Scala, BigDecimal mean. */
  private def refScore(text: String): (Long, Double) = {
    val toks = trusted.flatMap(_.split(" "))
    val uni = toks.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val bi = trusted.flatMap { t =>
      val ws = t.split(" ").toSeq; ws.zip(ws.tail)
    }.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val v = uni.size.toLong
    val ws = text.trim.split(" ").filter(_.nonEmpty).toSeq
    val lps = ws.zip(ws.tail).map { case (a, b) =>
      math.log((bi.getOrElse((a, b), 0L) + 1).toDouble
        / (uni.getOrElse(a, 0L) + v).toDouble)
    }
    val sum = lps.foldLeft(BigDecimal(0)) { (acc, d) =>
      acc + BigDecimal(d).setScale(18, BigDecimal.RoundingMode.HALF_UP)
    }
    (lps.size.toLong, (sum / lps.size).toDouble)
  }

  private def sparkScores(queries: Seq[(Long, String)], partitions: Int) = {
    import spark.implicits._
    val model = NgramLm.fit(trustedDf(partitions), "text")
    NgramLm.score(queries.toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
  }

  test("scores match the single-threaded reference bit-for-bit") {
    val queries = Seq(
      10L -> "the cat sat on the rug",
      11L -> "fish unknown words here",
      12L -> "a dog and a cat")
    val got = sparkScores(queries, 3)
    queries.foreach { case (id, text) =>
      val (nRef, lpRef) = refScore(text)
      val (n, lp) = got(id)
      assert(n === nRef, s"doc $id bigram count")
      assert(math.abs(lp - lpRef) < 1e-15, s"doc $id: $lp vs ref $lpRef")
    }
  }

  test("scoring is partitioning-invariant (exact decimal mean)") {
    val queries = Seq(10L -> "the cat sat on the mat and the dog sat on the rug")
    val a = sparkScores(queries, 1)
    val b = sparkScores(queries, 7)
    assert(a === b)
  }

  test("natural word order outscores the same words scrambled") {
    val natural = "the cat sat on the mat"
    val scrambled = "mat the on sat cat the"
    val got = sparkScores(Seq(1L -> natural, 2L -> scrambled), 2)
    assert(got(1L)._2 > got(2L)._2,
      s"natural ${got(1L)._2} must beat scrambled ${got(2L)._2}")
  }

  test("sub-2-token documents produce no score row; unknown tokens still score") {
    val got = sparkScores(Seq(1L -> "single", 2L -> "", 3L -> "zz qq"), 2)
    assert(!got.contains(1L) && !got.contains(2L))
    // all-unknown bigram: P = 1/(0+V) — finite, defined
    assert(got(3L)._1 === 1L && got(3L)._2 < 0.0)
  }
}
