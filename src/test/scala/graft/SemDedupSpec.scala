package graft

import graft.operators.SemDedup
import org.apache.spark.sql.functions._

/** SemDeDup: cluster-scoped cosine dedup — removal is cell-local, the
  * keep rule anchors at the minimum id, and the operator composes with
  * the trained k-means cell assignment. */
class SemDedupSpec extends SparkSpec {

  private def vecs(rows: Seq[(Long, Int, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "label", "embedding")
  }

  test("removes lower-id-anchored near-dups within a cell; other cells untouched") {
    val v = vecs(Seq(
      (1L, 0, Seq(1f, 0f)),      // cell 0 anchor
      (2L, 0, Seq(1f, 0.01f)),   // cell 0, ~identical to v1 -> removed
      (3L, 0, Seq(0f, 1f)),      // cell 0, orthogonal -> kept
      (4L, 1, Seq(1f, 0f))))     // same direction as v1 but cell 1 -> kept
    val out = SemDedup.semanticDedup(v, "vec_id", "embedding", "label", tau = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 3L, 4L))
  }

  test("a duplicate chain keeps exactly its minimum id") {
    // v1~v2, v2~v3 pairwise; all three within tau of each other here, so
    // 2 and 3 both anchor to 1 — one survivor per neighborhood
    val v = vecs(Seq(
      (1L, 0, Seq(1f, 0f)),
      (2L, 0, Seq(0.99f, 0.01f)),
      (3L, 0, Seq(0.98f, 0.02f))))
    val out = SemDedup.semanticDedup(v, "vec_id", "embedding", "label", tau = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(1L))
  }

  test("composes with the trained k-means cell assignment on real embeddings") {
    import graft.api.Graft
    val emb = graft.core.Lake(spark, SparkSpec.sfDir).embeddings
      .select(col("vec_id"), col("embedding")).limit(200)
    val model = Graft.kmeansFit(emb, "vec_id", "embedding", dims = 64, k = 4, iters = 3)
    val celled = Graft.ivfAssign(emb, "embedding", model)
    val out = Graft.semanticDedup(celled, "vec_id", "embedding", "cell", tau = 0.5)
    val n = out.count()
    assert(n > 0 && n <= 200)
    // deterministic: same inputs, same survivors
    val again = Graft.semanticDedup(celled, "vec_id", "embedding", "cell", tau = 0.5)
    assert(out.select("vec_id").collect().map(_.getLong(0)).toSet
      === again.select("vec_id").collect().map(_.getLong(0)).toSet)
  }
}
