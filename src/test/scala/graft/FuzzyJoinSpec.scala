package graft

import graft.operators.FuzzyJoin

/** Deletion-neighborhood edit-distance join: exact agreement with the
  * brute-force Levenshtein definition on every edit class.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: (Long, String)*): Set[(Long, Long, Int)] =
    FuzzyJoin.editDistance1Pairs(rows.toDF("id", "s"), "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("substitution, insertion, deletion, and exact-dup pairs are all found") {
    val got = pairs(
      1L -> "graft", 2L -> "craft",  // substitution -> dist 1
      3L -> "grafts",                // insertion vs 1 -> dist 1
      4L -> "raft",                  // deletion vs 1 and vs 2 -> dist 1
      5L -> "graft")                 // exact dup of 1 -> dist 0
    assert(got == Set(
      (1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 1), (1L, 5L, 0),
      (2L, 4L, 1), (2L, 5L, 1), (3L, 5L, 1), (4L, 5L, 1)))
  }

  test("the transposition false-candidate is verified away (dist 2 != 1)") {
    // "ab" and "ba" SHARE deletion neighborhood entries ("a" and "b")
    // but their Levenshtein distance is 2 — the verify must drop them
    assert(pairs(1L -> "ab", 2L -> "ba").isEmpty)
  }

  test("dist-2 strings never pair; single-char universe pairs completely") {
    assert(pairs(1L -> "abc", 2L -> "xyc").isEmpty)
    // all single-char strings are within one substitution of each other
    assert(pairs(1L -> "a", 2L -> "b", 3L -> "c") ==
      Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("matches brute force on a randomized-ish small universe") {
    val strings = for {
      a <- Seq("a", "b"); b <- Seq("a", "b", ""); c <- Seq("c", "d")
    } yield a + b + c
    val rows = strings.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val brute = (for {
      (i, si) <- rows.map(r => (r._1, r._2)); (j, sj) <- rows.map(r => (r._1, r._2))
      if i < j
      d = levenshteinRef(si, sj) if d <= 1
    } yield (i, j, d)).toSet
    assert(pairs(rows: _*) == brute)
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
