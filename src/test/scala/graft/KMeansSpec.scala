package graft

import graft.api.Graft
import graft.operators.KMeans
import org.apache.spark.sql.functions._

/** The trained-IVF path: deterministic Lloyd's descent, exact-recall
  * degradation to brute force at full probe, and model edge cases. */
class KMeansSpec extends SparkSpec {

  private lazy val emb = graft.core.Lake(spark, sfDir).embeddings

  test("fit is bit-reproducible run to run (deterministic init, exact-decimal means)") {
    val m1 = KMeans.fit(emb, "vec_id", "embedding", 64, k = 4, iters = 3)
    val m2 = KMeans.fit(emb, "vec_id", "embedding", 64, k = 4, iters = 3)
    assert(m1.centroids === m2.centroids)
  }

  test("Lloyd iterations never increase the within-cluster SSE") {
    val sses = (0 to 3).map { it =>
      KMeans.sse(emb, "embedding",
        KMeans.fit(emb, "vec_id", "embedding", 64, k = 4, iters = it))
    }
    sses.sliding(2).foreach { case Seq(prev, next) =>
      assert(next <= prev + 1e-9, s"SSE rose across an iteration: $sses")
    }
    // and training actually does something on this data
    assert(sses.last < sses.head)
  }

  test("ivfSearch at nprobe = k is EXACTLY brute-force knn") {
    val model = KMeans.fit(emb, "vec_id", "embedding", 64, k = 4, iters = 2)
    val queries = emb.filter(col("vec_id") < 8)
    val ivf = KMeans.ivfSearch(emb, queries, "vec_id", "embedding",
        model, nprobe = model.k, topK = 5)
      .select("q_id", "n_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = Graft.knn(spark, queries, emb, "vec_id", "embedding", 5)
      .select("q_id", "n_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivf === brute)
  }

  test("ivfSearch at nprobe = 1 returns a subset of the full-probe candidates per query") {
    val model = KMeans.fit(emb, "vec_id", "embedding", 64, k = 4, iters = 2)
    val queries = emb.filter(col("vec_id") < 8)
    // compare CANDIDATE SETS (pre-rank): pruned candidates ⊆ all pairs,
    // per query — the recall dial only ever drops candidates
    def cands(nprobe: Int) =
      KMeans.ivfSearch(emb, queries, "vec_id", "embedding",
          model, nprobe, topK = Int.MaxValue)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = cands(1)
    val full = cands(model.k)
    assert(pruned.subsetOf(full))
    assert(pruned.nonEmpty)
  }

  test("ivfAssign tags every conforming row with a cell in [0, k)") {
    val model = KMeans.fit(emb, "vec_id", "embedding", 64, k = 4, iters = 1)
    val cells = KMeans.ivfAssign(emb, "embedding", model)
      .groupBy(col("cell")).count().collect()
    assert(cells.map(_.getInt(0)).forall(c => c >= 0 && c < 4))
    assert(cells.map(_.getLong(1)).sum === emb.count())
  }

  test("trained cells drive storage partition pruning (the 100 TB probe path)") {
    // the point of ivfAssign at scale: write the corpus partitioned by
    // cell, and a probe that touches nprobe cells prunes the scan to
    // those partition directories — mechanically visible as a partition
    // filter on the read
    val model = KMeans.fit(emb, "vec_id", "embedding", 64, k = 4, iters = 2)
    val path = new java.io.File("target/tmp/spec_ivf/cells").getAbsolutePath
    KMeans.ivfAssign(emb, "embedding", model)
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    val probed = spark.read.parquet(path).filter(col("cell") === 2)
    probed.collect()
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(cell"),
      s"expected the cell filter to prune partitions in:\n$plan")
    // and the pruned read returns exactly that cell's rows
    val direct = KMeans.ivfAssign(emb, "embedding", model)
      .filter(col("cell") === 2).count()
    assert(probed.count() === direct)
  }

  test("empty clusters keep their previous centroid (no respawn, no crash)") {
    import spark.implicits._
    // two tight groups, k=3: one centroid must end up memberless
    val df = Seq(
      (1L, Array(0f, 0f)), (2L, Array(0.1f, 0f)), (3L, Array(0f, 0.1f)),
      (4L, Array(9f, 9f)), (5L, Array(9.1f, 9f))
    ).toDF("vec_id", "embedding")
    val model = KMeans.fit(df, "vec_id", "embedding", 2, k = 3, iters = 4)
    assert(model.k === 3)
    assert(model.centroids.forall(_.length === 2))
    // the model still assigns every row
    val n = KMeans.ivfAssign(df, "embedding", model).count()
    assert(n === 5)
  }

  test("ragged vectors are ignored by fit and assignment, not crashed on") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0f, 0f)), (2L, Array(1f, 1f)),
      (3L, Array(1f, 2f, 3f)), (4L, Array.empty[Float])
    ).toDF("vec_id", "embedding")
    val model = KMeans.fit(df, "vec_id", "embedding", 2, k = 2, iters = 2)
    assert(KMeans.ivfAssign(df, "embedding", model).count() === 2)
  }
}
