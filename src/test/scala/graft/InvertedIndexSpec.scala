package graft

import graft.operators.InvertedIndex

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b a c"),
    (2L, "b b d"),
    (3L, "a  d "), // double space + trailing: empty tokens must drop
    (4L, "e")
  ).toDF("doc_id", "text")

  test("df counts distinct docs, total_tf counts occurrences, postings sorted") {
    val idx = InvertedIndex.build(docs, "doc_id", "text", postingsCap = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(idx("a") == ((2L, 3L, "1,3"))) // doc1 twice + doc3 once
    assert(idx("b") == ((2L, 3L, "1,2")))
    assert(idx("c") == ((1L, 1L, "1")))
    assert(idx("d") == ((2L, 2L, "2,3")))
    assert(idx("e") == ((1L, 1L, "4")))
    assert(!idx.contains("")) // whitespace artifacts never index
  }

  test("postings cap keeps the FIRST k ids; df/total_tf stay exact") {
    val many = (1L to 10L).map(i => (i, "t")).toDF("doc_id", "text")
    val row = InvertedIndex.build(many, "doc_id", "text", postingsCap = 3)
      .collect().head
    assert(row.getLong(1) == 10L && row.getLong(2) == 10L)
    assert(row.getString(3) == "1,2,3")
  }

  test("cap must be positive") {
    intercept[IllegalArgumentException] {
      InvertedIndex.build(docs, "doc_id", "text", postingsCap = 0)
    }
  }
}
