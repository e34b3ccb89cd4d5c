package graft

import graft.operators.BpeTrainer
import org.apache.spark.sql.functions._

/** The distributed BPE trainer must agree EXACTLY with a transparent
  * single-threaded reference implementation of the published algorithm
  * (Sennrich '16 word-level BPE: freq-weighted pair counts, best pair by
  * (count desc, pair asc), greedy non-overlapping rewrite) — and be
  * partitioning-invariant, since the whole point of the total-order
  * tie-break is that cluster layout cannot change the tokenizer. */
class BpeTrainerSpec extends SparkSpec {

  /** Reference trainer: same algorithm, plain Scala. */
  private def refFit(wordFreq: Map[String, Long], numMerges: Int,
      minFreq: Long): (Seq[(String, String)], Map[String, Long]) = {
    var words = wordFreq.toVector.map { case (w, f) =>
      (w.map(_.toString).toVector, f)
    }
    val merges = Vector.newBuilder[(String, String)]
    var rounds = 0
    var done = false
    while (rounds < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val eligible = counts.filter(_._2 >= minFreq)
      if (eligible.isEmpty) done = true
      else {
        val (a, b) = eligible.toSeq.minBy { case ((x, y), n) => (-n, x, y) }._1
        merges += ((a, b))
        words = words.map { case (syms, f) =>
          val out = syms.foldLeft(Vector.empty[String]) { (acc, s) =>
            if (acc.nonEmpty && acc.last == a && s == b)
              acc.init :+ (a + b)
            else acc :+ s
          }
          (out, f)
        }
        rounds += 1
      }
    }
    val vocab = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (syms, f) =>
      syms.foreach(s => vocab(s) = vocab.getOrElse(s, 0L) + f)
    }
    (merges.result(), vocab.toMap)
  }

  // the classic BPE teaching corpus, as space-separated documents
  private val wordFreq = Map(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  private def docs(partitions: Int) = {
    import spark.implicits._
    // spread each word's repetitions across documents so partitioning
    // actually varies the layout
    wordFreq.toSeq.flatMap { case (w, f) =>
      (0L until f).map(i => (w.hashCode * 1000L + i, w))
    }.toDF("doc_id", "text").repartition(partitions)
  }

  test("fit matches the reference implementation merge-for-merge") {
    val (refMerges, refVocab) = refFit(wordFreq, numMerges = 10, minFreq = 2L)
    val model = BpeTrainer.fit(docs(5), "text", numMerges = 10)
    assert(model.merges === refMerges)
    assert(model.vocab.toMap === refVocab)
    // sanity: the classic corpus learns "est" early (newest+widest = 9)
    assert(model.merges.take(2).map { case (a, b) => a + b }.contains("es")
      || model.merges.map { case (a, b) => a + b }.contains("est"))
  }

  test("fit is partitioning-invariant (the total-order tie-break at work)") {
    val one = BpeTrainer.fit(docs(1), "text", numMerges = 8)
    val many = BpeTrainer.fit(docs(7), "text", numMerges = 8)
    assert(one.merges === many.merges)
    assert(one.vocab === many.vocab)
  }

  test("fit stops early when no pair clears minFreq") {
    val model = BpeTrainer.fit(docs(3), "text", numMerges = 1000)
    val (refMerges, _) = refFit(wordFreq, numMerges = 1000, minFreq = 2L)
    assert(model.merges === refMerges)
    assert(model.merges.length < 1000, "must stop at pair exhaustion")
  }

  test("encode applies merges rank-greedily; training words round-trip") {
    val model = BpeTrainer.fit(docs(3), "text", numMerges = 10)
    import spark.implicits._
    val out = BpeTrainer.encode(
      Seq((1L, "newest low"), (2L, "lowest")).toDF("doc_id", "text"),
      "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    // tokens re-concatenate to the original words (lossless segmentation)
    assert(out(1L).mkString === "newestlow")
    assert(out(2L).mkString === "lowest")
    // the per-word path agrees with the driver-side reference encoder
    val rank = model.mergeRank
    assert(out(2L) === BpeTrainer.encodeWord("lowest", rank).toList)
  }

  test("encode splits by code point: non-BMP symbols never become lone surrogates") {
    // fit splits with Spark's code-point-aware split(w, ""); encodeWord
    // must agree on the base alphabet or supplementary characters (emoji,
    // supplementary CJK) decompose into unmatched surrogate halves
    val face = new String(Character.toChars(0x1F600)) // 😀, outside the BMP
    val base = BpeTrainer.encodeWord(s"a${face}b", Map.empty)
    assert(base === Seq("a", face, "b"))
    assert(base.forall(s => !s.exists(Character.isSurrogate) || s.length == 2))
    // a merge trained over the code-point alphabet applies at encode time
    val merged = BpeTrainer.encodeWord(s"a$face", Map(("a", face) -> 0))
    assert(merged === Seq(s"a$face"))
    // end-to-end: training corpus containing the emoji round-trips
    import spark.implicits._
    val emojiDocs = Seq((1L, s"${face}lo ${face}lo ${face}lo lo"))
      .toDF("doc_id", "text")
    val model = BpeTrainer.fit(emojiDocs, "text", numMerges = 3, minFreq = 2L)
    val out = BpeTrainer.encode(emojiDocs, "doc_id", "text", model)
      .collect().map(r => r.getSeq[String](1).toList).head
    assert(out.mkString === s"${face}lo${face}lo${face}lolo")
  }

  test("fit on the real documents table is deterministic and releases its caches") {
    val emb = graft.core.Lake(spark, SparkSpec.sfDir).documents.limit(100)
    val a = BpeTrainer.fit(emb, "text", numMerges = 5)
    val b = BpeTrainer.fit(emb, "text", numMerges = 5)
    assert(a.merges === b.merges && a.vocab === b.vocab)
    assert(a.merges.length === 5)
  }
}
