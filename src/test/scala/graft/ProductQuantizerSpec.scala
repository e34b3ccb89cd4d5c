package graft

import graft.operators.{KMeans, ProductQuantizer}
import graft.operators.ProductQuantizer.PQModel
import org.apache.spark.sql.functions._

/** Product quantization: exact semantics under a known model (encode /
  * reconstruct / ADC search collapse to exact math when vectors ARE
  * centroid combinations), bit-reproducible training, Lloyd descent per
  * subspace, and the compressed-scan shape. */
class ProductQuantizerSpec extends SparkSpec {

  // a hand-built quantizer: m=2 subspaces of 2 dims, k=2 centroids each
  private val model = PQModel(2, 2, Vector(
    KMeans.Model(Vector(Vector(0.0, 0.0), Vector(10.0, 10.0))),
    KMeans.Model(Vector(Vector(0.0, 5.0), Vector(5.0, 0.0)))))

  // vectors assembled FROM centroid combinations — quantization is
  // lossless on them, so every downstream property is exact
  private def planted = {
    import spark.implicits._
    Seq(
      (1L, Array(0.0f, 0.0f, 0.0f, 5.0f)),   // codes (0, 0)
      (2L, Array(0.0f, 0.0f, 5.0f, 0.0f)),   // codes (0, 1)
      (3L, Array(10.0f, 10.0f, 0.0f, 5.0f)), // codes (1, 0)
      (4L, Array(10.0f, 10.0f, 5.0f, 0.0f))) // codes (1, 1)
      .toDF("vec_id", "embedding")
  }

  test("encode picks the nearest centroid per subspace; reconstruction is exact") {
    val codes = ProductQuantizer.encode(planted, "vec_id", "embedding", model)
    val got = codes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(got === Map(1L -> List(0, 0), 2L -> List(0, 1),
      3L -> List(1, 0), 4L -> List(1, 1)))

    val err = ProductQuantizer.reconstructionError(
      planted, codes, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(err.values.forall(_ === 0.0), s"lossless regime must have zero error: $err")
  }

  test("ADC distances equal exact L2 in the lossless regime; top-k is true knn") {
    val codes = ProductQuantizer.encode(planted, "vec_id", "embedding", model)
    val out = ProductQuantizer.adcSearch(
      codes, planted, "vec_id", "embedding", model, topK = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // exact L2² between planted vectors, computed independently
    val vecs = Map(
      1L -> Seq(0.0, 0.0, 0.0, 5.0), 2L -> Seq(0.0, 0.0, 5.0, 0.0),
      3L -> Seq(10.0, 10.0, 0.0, 5.0), 4L -> Seq(10.0, 10.0, 5.0, 0.0))
    def l2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    out.foreach { case ((q, n), d) =>
      assert(d === l2(vecs(q), vecs(n)), s"ADC distance ($q,$n) must be exact")
    }
    // every query ranks all 3 others
    assert(out.size === 12)
  }

  test("fit is bit-reproducible and every code lands in [0, k)") {
    val emb = Lakehouse.embeddings(spark)
    val a = ProductQuantizer.fit(emb, "vec_id", "embedding", 64, m = 4, k = 4, iters = 2)
    val b = ProductQuantizer.fit(emb, "vec_id", "embedding", 64, m = 4, k = 4, iters = 2)
    assert(a.books === b.books, "fit must be deterministic run to run")

    val codes = ProductQuantizer.encode(emb, "vec_id", "embedding", a)
    val bad = codes.filter(exists(col("codes"),
      c => c < 0 || c >= 4) || size(col("codes")) =!= 4).count()
    assert(bad === 0L)
  }

  test("Lloyd iterations never increase any subspace's SSE") {
    import spark.implicits._
    val emb = Lakehouse.embeddings(spark)
    val pq0 = ProductQuantizer.fit(emb, "vec_id", "embedding", 64, m = 4, k = 4, iters = 0)
    val pq2 = ProductQuantizer.fit(emb, "vec_id", "embedding", 64, m = 4, k = 4, iters = 2)
    (0 until 4).foreach { j =>
      val slice = emb.select(col("vec_id"),
        org.apache.spark.sql.functions.slice(col("embedding"), j * 16 + 1, 16)
          .as("embedding"))
      val s0 = KMeans.sse(slice, "embedding", pq0.books(j))
      val s2 = KMeans.sse(slice, "embedding", pq2.books(j))
      assert(s2 <= s0 + 1e-9, s"subspace $j: SSE rose $s0 -> $s2")
    }
  }

  test("adcSearch plans the compressed-scan shape: broadcast queries, group-limit ranking") {
    val codes = ProductQuantizer.encode(planted, "vec_id", "embedding", model)
    val df = ProductQuantizer.adcSearch(
      codes, planted, "vec_id", "embedding", model, topK = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"the tiny query side must broadcast — the codes scan stays in place:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"per-query top-k must group-limit prune before the rank shuffle:\n$plan")
  }

  test("training compresses: mean distortion beats the 1-centroid codebook") {
    val emb = Lakehouse.embeddings(spark)
    def meanErr(pq: PQModel): Double = {
      val codes = ProductQuantizer.encode(emb, "vec_id", "embedding", pq)
      ProductQuantizer.reconstructionError(emb, codes, "vec_id", "embedding", pq)
        .agg(avg(col("sq_err"))).head().getDouble(0)
    }
    val trained = ProductQuantizer.fit(emb, "vec_id", "embedding", 64, m = 4, k = 8, iters = 3)
    // k=1, 0 iters: every subspace collapses to its init row — the
    // degenerate codebook any trained one must beat on average
    val flat = ProductQuantizer.fit(emb, "vec_id", "embedding", 64, m = 4, k = 1, iters = 1)
    assert(meanErr(trained) < meanErr(flat),
      "an 8-centroid codebook must out-compress a 1-centroid one")
  }
}
