package graft

import graft.functions.TextFns._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit coverage for the md5-portable text primitives. */
class TextFnsSpec extends SparkSpec {

  private def one(colExpr: org.apache.spark.sql.Column, text: String): Any = {
    import spark.implicits._
    Seq(text).toDF("t").select(colExpr.as("r")).head().get(0)
  }

  test("hash60 equals the md5-hex-prefix integer") {
    // md5("a") = 0cc175b9c0f1b6a831c399e269772661; first 15 hex digits.
    val expected = java.lang.Long.parseLong("0cc175b9c0f1b6a", 16)
    assert(one(hash60(col("t")), "a") === expected)
  }

  test("hash60 is non-negative (60-bit) for arbitrary input") {
    import spark.implicits._
    val mins = (1 to 200).map(i => s"doc $i payload")
      .toDF("t").select(hash60(col("t")).as("h"))
      .agg(min(col("h"))).head().getLong(0)
    assert(mins >= 0L)
  }

  test("wordShingles produces consecutive k-grams, distinct") {
    val r = one(wordShingles(col("t"), 3), "a b c d a b c d")
    assert(r.asInstanceOf[scala.collection.Seq[String]].toSet ===
      Set("a b c", "b c d", "c d a", "d a b"))
  }

  test("wordShingles of a short document is empty, not descending-range garbage") {
    assert(one(wordShingles(col("t"), 3), "a b")
      .asInstanceOf[scala.collection.Seq[_]].isEmpty)
    assert(one(charGrams(col("t"), 8), "short")
      .asInstanceOf[scala.collection.Seq[_]].isEmpty)
  }

  test("minHash: identical shingle sets give identical signatures; signature length is n") {
    import spark.implicits._
    val df = Seq("x y z w v u t s", "x y z w v u t s", "p q r s t u v w")
      .toDF("t").select(minHash(hashedShingles(col("t"), 3), 8).as("sig"))
    val rows = df.collect().map(_.getSeq[Long](0))
    assert(rows(0).length === 8)
    assert(rows(0) === rows(1))
    assert(rows(0) !== rows(2))
  }

  test("jaccard: identical sets 1.0, disjoint sets 0.0") {
    import spark.implicits._
    val df = Seq(("a b c d", "a b c d"), ("a b c d", "x y z w"))
      .toDF("l", "r")
      .select(jaccard(wordShingles(col("l"), 2), wordShingles(col("r"), 2)).as("j"))
    val js = df.collect().map(_.getDouble(0))
    assert(js(0) === 1.0)
    assert(js(1) === 0.0)
  }

  test("simHash: identical token streams have Hamming distance 0; fingerprint fits 32 bits") {
    import spark.implicits._
    val df = Seq("alpha beta gamma delta", "alpha beta gamma delta", "omega psi chi phi")
      .toDF("t").select(simHash(tokens(col("t"))).as("fp"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) === fps(1))
    assert(fps.forall(fp => fp >= 0 && fp < (1L << 32)))
    import org.apache.spark.sql.functions.{bit_count => _}
    val d = Seq((fps(0), fps(2))).toDF("a", "b")
      .select(hamming(col("a"), col("b")).as("d")).head().getInt(0)
    assert(d > 0)
  }

  test("exact dedup collapses duplicate normalized content") {
    import spark.implicits._
    val df = Seq((1L, "Hello World"), (2L, "  hello world  "), (3L, "other"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"), min("doc_id").as("canon"))
    val rows = df.collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set((2L, 1L), (1L, 3L)))
  }
}
