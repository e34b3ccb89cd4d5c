package graft

import graft.api.Graft
import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

/** Transitive near-dup clustering: min-label fixpoint vs brute-force
  * union-find, determinism, and the pairwise-vs-transitive divergence
  * the facade docs promise. */
class ConnectedComponentsSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chains propagate the min across multiple rounds; components stay separate") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (5L, 6L),
      (13L, 12L), (12L, 11L), (11L, 10L)))
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
  }

  test("matches brute-force union-find on the real q36 near-dup pairs") {
    val pairs = graft.operators.NearDup.minHashLshPairs(
      graft.core.Lake(spark, sfDir).documents, "doc_id", "text",
      fastOverride = Some(false))
    val edges = pairs.select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(edges.nonEmpty)

    // driver-side union-find as the oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(v => v -> find(v)).toMap

    assert(cc(edges) === expected)
  }

  test("result is deterministic across runs") {
    val edges = Seq((9L, 4L), (4L, 7L), (7L, 2L), (50L, 60L), (60L, 55L))
    assert(cc(edges) === cc(edges))
  }

  test("periodic checkpointing (deep iteration) yields identical labels") {
    // each round references `labels` twice (the neighbor join + the
    // improvement join), so WITHOUT lineage truncation the logical plan
    // DOUBLES per round — a diameter-9 chain needs 10 rounds ≈ 2^10
    // plan copies and OOMs the planner before fault tolerance even
    // matters. Checkpointing every 3 rounds bounds the plan and is the
    // only way this fixture completes at all; labels come out exact.
    val chain = (1L to 9L).map(i => (i, i + 1)) :+ ((20L, 21L))
    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set("spark.graft.cc.checkpointInterval", "3")
    try {
      val expected =
        ((1L to 10L).map(_ -> 1L) ++ Seq(20L -> 20L, 21L -> 20L)).toMap
      assert(cc(chain) === expected,
        "checkpointed deep run must reach the exact fixpoint")
    } finally spark.conf.unset("spark.graft.cc.checkpointInterval")
  }

  private def ccAlt(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.runAlternating(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("alternating large-star/small-star matches min-label on the real near-dup pairs") {
    val pairs = graft.operators.NearDup.minHashLshPairs(
      graft.core.Lake(spark, sfDir).documents, "doc_id", "text",
      fastOverride = Some(false))
    val edges = pairs.select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(edges.nonEmpty)
    assert(ccAlt(edges) === cc(edges),
      "both algorithms must reach the same unique fixpoint (min id per component)")
  }

  test("alternating converges on a diameter-99 chain min-label could not plan") {
    // 100 vertices in one path: min-label needs 100 rounds (and its plan
    // doubles per round — hopeless); large-star/small-star halves path
    // lengths, so this converges in O(log n) rounds with per-round
    // lineage truncation keeping the plan flat. Mixed with a separate
    // triangle to prove components stay apart.
    val chain = (1L to 99L).map(i => (i, i + 1))
    val triangle = Seq((500L, 501L), (501L, 502L), (500L, 502L))
    val got = ccAlt(chain ++ triangle)
    val expected = ((1L to 100L).map(_ -> 1L) ++
      Seq(500L, 501L, 502L).map(_ -> 500L)).toMap
    assert(got === expected)
  }

  test("alternating is deterministic and handles duplicate/reversed edges") {
    val edges = Seq((4L, 9L), (9L, 4L), (4L, 9L), (7L, 4L), (60L, 50L))
    val expected = Map(4L -> 4L, 9L -> 4L, 7L -> 4L, 50L -> 50L, 60L -> 50L)
    assert(ccAlt(edges) === expected)
    assert(ccAlt(edges) === ccAlt(edges))
  }

  test("transitive removal keeps ONE survivor where pairwise keeps two") {
    import spark.implicits._
    // the wedge graph: docs 1 and 2 are each near-dups of core doc 3 but
    // not of each other. A shared 60-token core with distinct 4-token
    // tails gives J(1,3) = J(2,3) = 0.935 and J(1,2) = 0.879; threshold
    // 0.9 keeps exactly the two wedge edges. (A core-DOMINATED fixture,
    // deliberately: a disjoint-halves wedge defeats LSH recall here —
    // the derived h1 + i·h2 family lets one dominant shingle decide
    // every slot of the concatenation's signature, so the union doc
    // only ever collides with ONE half. With the shared core dominant,
    // all three signatures agree and verification separates the edges.)
    val core = (0 until 60).map(i => s"core$i").mkString(" ")
    val docs = Seq(
      (1L, s"$core tailA0 tailA1 tailA2 tailA3"),
      (2L, s"$core tailB0 tailB1 tailB2 tailB3"),
      (3L, core)
    ).toDF("doc_id", "text")
    val pairs = Graft.nearDupPairs(docs, "doc_id", "text",
        minHashes = 12, bands = 12, threshold = 0.9)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 3L), (2L, 3L)),
      s"fixture must produce exactly the wedge graph, got $pairs")

    val pairwise = Graft.removeNearDups(docs, "doc_id", "text",
        minHashes = 12, bands = 12, threshold = 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val transitive = Graft.removeNearDupsTransitive(docs, "doc_id", "text",
        minHashes = 12, bands = 12, threshold = 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    assert(pairwise === Set(1L, 2L), "pairwise keeps both wedge tips")
    assert(transitive === Set(1L), "transitive keeps one canonical survivor")
  }
}
