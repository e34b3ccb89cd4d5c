package graft

import graft.operators.ExactSpans
import org.apache.spark.sql.functions._

/** Exact shared-span dedup (q164): the winnowing detection guarantee,
  * exact maximality, and end-to-end equivalence with a brute-force
  * all-pairs enumeration on a randomized corpus with planted spans. */
class ExactSpansSpec extends SparkSpec {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  private val rnd = new scala.util.Random(42)
  private def randText(n: Int): String =
    Iterator.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString

  /** Brute-force truth: enumerate every T-gram match, island per
    * diagonal — the oracle SQL's semantics in 15 lines of Scala. */
  private def brute(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long, Long)] = {
    val T = ExactSpans.T
    (for {
      (ia, ta) <- docs
      (ib, tb) <- docs if ia < ib
      matches = for {
        i <- 0 to ta.length - T if ta.length >= T && tb.length >= T
        j <- 0 to tb.length - T
        if ta.substring(i, i + T) == tb.substring(j, j + T)
      } yield (i - j, i)
      (diag, ms) <- matches.groupBy(_._1)
      run <- {
        val ais = ms.map(_._2).sorted
        ais.foldLeft(List.empty[List[Int]]) {
          case (acc @ (h :: t), a) if a == h.head + 1 => (a :: h) :: t
          case (acc, a) => List(a) :: acc
        }
      }
    } yield {
      val lo = run.min; val hi = run.max
      (ia, ib, (lo + 1).toLong, (lo - diag + 1).toLong, (hi - lo + T).toLong)
    }).toSet
  }

  private def run(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long, Long)] =
    ExactSpans.sharedSpans(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("detection guarantee: a planted span of exactly T chars is found with exact bounds") {
    val shared = randText(ExactSpans.T)
    val a = randText(100) + shared + randText(80)
    val b = randText(37) + shared + randText(150)
    val spans = run(Seq((1L, a), (2L, b)))
    assert(spans.contains((1L, 2L, 101L, 38L, ExactSpans.T.toLong)),
      s"planted T-char span missing: $spans")
  }

  test("below threshold: a T-1-char shared span produces no row") {
    val shared = randText(ExactSpans.T - 1)
    val a = randText(90) + shared + randText(90)
    val b = randText(60) + shared + randText(60)
    assert(run(Seq((1L, a), (2L, b))).isEmpty)
  }

  test("maximality: a long planted span reports once, full length, never fragmented") {
    val shared = randText(173)
    val a = randText(20) + shared + randText(31)
    val b = shared + randText(44)
    val spans = run(Seq((1L, a), (2L, b)))
    assert(spans === Set((1L, 2L, 21L, 1L, 173L)))
  }

  test("equivalence with brute force on a randomized corpus with planted structure") {
    val base = randText(300)
    val docs: Seq[(Long, String)] = Seq(
      1L -> base,
      2L -> base, // exact duplicate: one full-length span
      3L -> (base.substring(0, 120) + randText(200)), // shared prefix
      4L -> (randText(50) + base.substring(100, 220) + randText(50)), // interior
      5L -> randText(300), // unrelated
      6L -> (base.substring(0, 60) + "X" + base.substring(61)), // 1-char edit: two spans
      7L -> randText(30)) // below min length
    val got = run(docs)
    val want = brute(docs)
    assert(got === want, s"missing=${want -- got} extra=${got -- want}")
    assert(want.nonEmpty)
    // the 1-char edit really split the duplicate into two spans vs doc 1
    assert(want.count { case (a, b, _, _, _) => a == 1L && b == 6L } === 2)
  }

  test("hot-span collapse: one span planted in 1,000 docs costs group-LINEAR candidate work") {
    val n = 1000
    val planted = randText(60) // ≥ T, the corpus-wide boilerplate
    val docs = (1 to n).map(i =>
      (i.toLong, randText(50 + i % 7) + planted + randText(50)))
    val df = docs.toDF("doc_id", "text")
    // candidate stage: n−1 edges per in-span fingerprint — NEVER the
    // C(n,2) ≈ 500k pairs the pairwise join would emit for this corpus
    val edges = graft.operators.ExactSpans.candidateEdges(df, "doc_id", "text")
    val nEdges = edges.count()
    assert(nEdges < 20L * n,
      s"star candidate stage must be group-linear, got $nEdges edges")
    assert(nEdges >= (n - 1).toLong, s"every doc must pair with the rep: $nEdges")
    // every non-rep doc reports a verified span COVERING its planted
    // region against the group rep (random padding can extend a match
    // by a char or two — containment, not equality, is the invariant)
    val rows = graft.operators.ExactSpans
      .spanOccurrences(df, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
    val byDoc = rows.groupBy(_._1)
    val textOf = docs.toMap
    (2 to n).foreach { i =>
      val plantStart = textOf(i.toLong).indexOf(planted) + 1 // 1-based
      val covering = byDoc.getOrElse(i.toLong, Array.empty).exists {
        case (_, start, len, repDoc, _) =>
          repDoc == 1L && start <= plantStart && start + len >= plantStart + 60
      }
      assert(covering, s"doc $i: planted span not reported against the rep")
    }
    // output is linear too: ~one row per (doc, maximal span), not pairs
    assert(rows.length < 5 * n, s"output must be occurrence-grouped: ${rows.length}")
  }

  test("spanOccurrences rows are exactly-verified maximal shared substrings") {
    val base = randText(300)
    val docs: Seq[(Long, String)] = Seq(
      1L -> base,
      2L -> base,
      3L -> (base.substring(0, 120) + randText(200)),
      4L -> (randText(50) + base.substring(100, 220) + randText(50)),
      5L -> randText(300),
      6L -> (base.substring(0, 60) + "X" + base.substring(61)))
    val textOf = docs.toMap
    val rows = graft.operators.ExactSpans
      .spanOccurrences(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (d, start, len, rd, rs) =>
      val t = textOf(d); val r = textOf(rd)
      val a = start.toInt - 1; val b = rs.toInt - 1; val l = len.toInt
      assert(l >= ExactSpans.T)
      assert(t.substring(a, a + l) === r.substring(b, b + l),
        s"row ($d,$start,$len,$rd,$rs) is not a shared substring")
      // maximal: extending one char either way breaks equality or a bound
      assert(a == 0 || b == 0 || t.charAt(a - 1) != r.charAt(b - 1))
      assert(a + l == t.length || b + l == r.length ||
        t.charAt(a + l) != r.charAt(b + l))
    }
    // the full duplicate (doc 2 vs rep 1) surfaces as one whole-text row
    assert(rows.exists { case (d, start, len, rd, _) =>
      d == 2L && rd == 1L && start == 1L && len == 300L })
  }

  test("maxDf drops over-frequent fingerprints from the pairwise path") {
    val planted = randText(60)
    val docs = (1 to 30).map(i =>
      (i.toLong, randText(40 + i % 5) + planted + randText(40)))
    val df = docs.toDF("doc_id", "text")
    // cap below the boilerplate's df: the hot span generates no pairs
    val capped = ExactSpans.sharedSpans(df, "doc_id", "text", maxDf = Some(10))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(capped.isEmpty,
      s"df-capped pairwise run must drop the hot span: ${capped.length} rows")
    // uncapped: the exact all-pairs contract reports every pair
    val full = ExactSpans.sharedSpans(df, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(full.map(r => (r._1, r._2)).distinct.length === 30 * 29 / 2)
  }

  test("plan: candidates come from a fingerprint equi-join, never a cartesian corpus stage") {
    val df = ExactSpans.sharedSpans(
      (1L to 40L).map(i => (i, randText(120))).toDF("doc_id", "text"),
      "doc_id", "text")
    val cartesian = graft.plans.AdaptivePlans.collectDeep(df) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(cartesian.isEmpty, s"pairwise stage found: $cartesian")
  }
}
