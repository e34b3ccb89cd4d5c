package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed Lloyd's k-means over a float-vector column — the trainer
  * that turns the IVF ANN path (q41's cell-restricted search) from a
  * GIVEN cell assignment into a LEARNED one. The reference ships no
  * vector training at all (sakila-data-lake stops at SQL analytics);
  * this is part of the training-data enhancement surface, built the
  * Spark way:
  *
  *   - centroids are MODEL STATE, not data: k × dims doubles live on the
  *     driver and ship to executors inside the assignment expression —
  *     the per-iteration data pass is one scan + one aggregation whose
  *     shuffle carries k × dims rows (partial aggregation absorbs the
  *     posexplode fan-out map-side, the q71 shape), never the vectors;
  *   - determinism end-to-end: init picks the k lowest portable-hash ids
  *     (a TakeOrdered, not a random sample), distances are strict
  *     left-to-right double folds, means are exact DECIMAL sums divided
  *     by counts (the `Det` money policy applied to coordinates), and
  *     assignment ties break toward the lowest centroid index — so `fit`
  *     is bit-reproducible run to run, partitioning-invariant, and
  *     cheap to re-audit;
  *   - empty clusters keep their previous centroid (no respawn
  *     randomness).
  *
  * At 100 TB the same loop holds: each iteration is one scan of the
  * corpus with a k·dims-sized result, and the trained model then drives
  * `ivfAssign` (cell-partitioned storage) and `ivfSearch` (probe-pruned
  * ANN). The HOF-based distance is interpreted, not codegen'd — fine for
  * training passes; promote to a native Expression (the cosine_sim
  * route) if assignment ever dominates a production scan.
  */
object KMeans {

  /** A trained centroid set: `centroids(j)(d)` = coordinate d of centroid
    * j. Immutable; `fit` returns a fresh one per call. */
  final case class Model(centroids: Vector[Vector[Double]]) {
    def k: Int = centroids.length
    def dims: Int = if (centroids.isEmpty) 0 else centroids.head.length
  }

  private def centLit(c: Vector[Double]): Column = array(c.map(lit): _*)

  /** Squared L2 distance from a float-vector column to one centroid
    * literal: one zip_with + strict left-fold sum (deterministic; floats
    * cast to double before the subtract, mirroring the cosine policy). */
  private def sqDist(vec: Column, c: Vector[Double]): Column =
    aggregate(
      zip_with(vec, centLit(c), (x, cd) => {
        val d = x.cast(DoubleType) - cd
        d * d
      }),
      lit(0.0), (acc, x) => acc + x)

  /** (distance, index) struct per centroid — named_struct, not struct():
    * aliases on computed columns inside array()/array_min get normalized
    * away to col1/col2 under Spark 4's column resolution, so the field
    * names are pinned explicitly. Lexicographic struct order = nearest
    * first, ties → lowest index. */
  private def distStructs(model: Model, vec: Column): Seq[Column] =
    model.centroids.zipWithIndex.map { case (c, j) =>
      call_function("named_struct",
        lit("d"), sqDist(vec, c), lit("j"), lit(j))
    }

  /** Nearest-centroid index for a vector column (ties → lowest index). */
  def assignCell(model: Model, vec: Column): Column =
    array_min(array(distStructs(model, vec): _*)).getField("j")

  /** The `nprobe` nearest centroid indexes for a vector column, nearest
    * first (array_sort on (distance, index) structs). */
  def probeCells(model: Model, vec: Column, nprobe: Int): Column =
    transform(
      slice(array_sort(array(distStructs(model, vec): _*)), 1, nprobe),
      s => s.getField("j"))

  /** Train `k` centroids with `iters` Lloyd iterations. Rows whose vector
    * is not exactly `dims` wide are ignored (the SRP_DIMS guard pattern —
    * a ragged vector has no distance). Requires at least k conforming
    * rows. */
  def fit(df: DataFrame, idCol: String, vecCol: String, dims: Int,
      k: Int, iters: Int): Model = {
    require(k >= 1, s"k must be >= 1: $k")
    require(iters >= 0, s"iters must be >= 0: $iters")
    val clean = df.filter(size(col(vecCol)) === dims)

    // deterministic init: the k lowest (portable hash, id) vectors — a
    // TakeOrdered on the hash, so "k spread-out rows" without randomness
    val init = clean
      .orderBy(TextFns.hash60(col(idCol).cast(StringType)), col(idCol))
      .limit(k)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toVector.map(_.toDouble))
      .toVector
    require(init.length == k,
      s"need at least $k rows with $dims-wide vectors, found ${init.length}")

    var model = Model(init)
    for (_ <- 0 until iters) {
      // one scan: assign → posexplode coords → partial-agg to (cell, pos)
      // exact-decimal sums. The shuffle and the collect are k × dims.
      val stats = clean
        .select(assignCell(model, col(vecCol)).as("cell"),
          posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x").cast(DecimalType(38, 10))).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val byCell = stats.groupBy(_.getInt(0))
      model = Model(model.centroids.zipWithIndex.map { case (old, j) =>
        byCell.get(j) match {
          case Some(rows) =>
            val c = Array.fill(dims)(0.0)
            rows.foreach { r =>
              c(r.getInt(1)) = r.getDecimal(2).doubleValue() / r.getLong(3)
            }
            c.toVector
          case None => old // empty cluster: keep previous centroid
        }
      })
    }
    model
  }

  /** Total within-cluster squared error under `model` — exact DECIMAL
    * sum of per-row min distances, so the value is deterministic and
    * Lloyd's monotone-descent property is assertable in tests. */
  def sse(df: DataFrame, vecCol: String, model: Model): Double = {
    val minD = array_min(array(
      model.centroids.map(c => sqDist(col(vecCol), c)): _*))
    val r = df.filter(size(col(vecCol)) === model.dims)
      .agg(sum(minD.cast(DecimalType(38, 10))))
      .head()
    if (r.isNullAt(0)) 0.0 else r.getDecimal(0).doubleValue()
  }

  /** Tag each row with its IVF cell (the storage-partitioning step: write
    * the corpus partitioned by this column and every probe prunes to
    * nprobe/k of the files). */
  def ivfAssign(df: DataFrame, vecCol: String, model: Model,
      cellCol: String = "cell"): DataFrame =
    df.filter(size(col(vecCol)) === model.dims)
      .withColumn(cellCol, assignCell(model, col(vecCol)))

  /** Probe-pruned cosine top-k: queries search only their `nprobe`
    * nearest cells. Each corpus row lives in exactly ONE cell, so with
    * nprobe = model.k this is EXACTLY brute-force knn (every pair
    * considered once — the recall dial is exact at full probe, spec-
    * asserted), and at nprobe « k the candidate set shrinks to
    * ~nprobe/k of the corpus. The join is an equi-join on the cell key;
    * ranking is a per-query window (partial WindowGroupLimit). */
  def ivfSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, model: Model, nprobe: Int, topK: Int): DataFrame = {
    // a rounded-to-zero nprobe would silently return "no neighbors" for
    // every query rather than erroring — fail at call time instead
    require(nprobe >= 1 && nprobe <= model.k,
      s"nprobe must be in [1, ${model.k}]: $nprobe")
    require(topK >= 1, s"topK must be >= 1: $topK")
    val s = corpus.sparkSession
    graft.engine.GraftFunctions.register(s)
    val n = ivfAssign(corpus, vecCol, model)
      .select(col(idCol).as("n_id"), col(vecCol).as("nv"), col("cell"))
    val q = queries.filter(size(col(vecCol)) === model.dims)
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"),
        explode(probeCells(model, col(vecCol), nprobe)).as("cell"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id"))
    q.join(n, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        call_function("cosine_sim", col("qv"), col("nv")).as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
  }
}
