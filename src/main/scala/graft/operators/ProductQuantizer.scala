package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (Jégou et al., TPAMI 2011) over a float-vector
  * column: split each vector into `m` subvectors, learn a k-centroid
  * codebook per subspace ([[KMeans]] reused as the per-subspace
  * trainer), and store each vector as `m` small code ints — the
  * compression stage between [[graft.queries.VectorOps]]'s int8
  * quantization (4×) and nothing: PQ at m=8, k=256 stores a 64-dim
  * float vector in 8 bytes (32×), which is what makes billion-vector
  * ANN fit in executor memory at all.
  *
  * 100 TB shapes, by stage:
  *   - '''fit''': ONE corpus scan per Lloyd iteration covering ALL
  *     subspaces (per-row assignment against every codebook, posexplode
  *     to (subspace, cell, pos) partial-agg'd exact-DECIMAL sums — the
  *     [[KMeans.fit]] loop with a subspace dimension folded in). The
  *     shuffle and driver collect are m·k·subDim rows — model-sized,
  *     never corpus-sized. m separate KMeans.fit calls would scan the
  *     corpus m·iters times for the same result.
  *   - '''encode''': narrow scan-parallel projection (codes from
  *     broadcast-literal centroids), zero shuffles.
  *   - '''adcSearch''': asymmetric distance — each query precomputes its
  *     m×k distance TABLE once (O(k·dims) driver-free column math), the
  *     probe is a broadcast of the tiny query side against a scan of
  *     the CODES (m ints per row, not dims floats — the whole point:
  *     the 100 TB scan reads the 32×-compressed column), distance is an
  *     m-step table lookup fold, top-k via the per-query rank window
  *     (partial WindowGroupLimit, the q40 shape).
  *
  * Determinism: inherited wholesale from [[KMeans]] — hash-ranked init
  * (the SAME k rows seed every subspace), exact-DECIMAL means,
  * lowest-index tie-breaks — so `fit` is bit-reproducible and
  * partitioning-invariant, and encode/adcSearch are pure functions of
  * the model.
  */
object ProductQuantizer {

  /** A trained product quantizer: `books(j)` is subspace j's codebook
    * over dims [j·subDim, (j+1)·subDim). */
  final case class PQModel(m: Int, subDim: Int, books: Vector[KMeans.Model]) {
    require(books.length == m, s"need $m codebooks, got ${books.length}")
    def k: Int = books.head.k
    def dims: Int = m * subDim
  }

  /** 1-based slice of subspace j from a full-width vector column. */
  private def sub(vec: Column, j: Int, subDim: Int): Column =
    slice(vec, j * subDim + 1, subDim)

  /** Train per-subspace codebooks. `dims` must split evenly into `m`
    * subspaces; rows not exactly `dims` wide are ignored (the ragged
    * guard shared with [[KMeans.fit]]). */
  def fit(df: DataFrame, idCol: String, vecCol: String, dims: Int,
      m: Int, k: Int, iters: Int): PQModel = {
    require(m >= 1, s"m must be >= 1: $m")
    require(dims % m == 0, s"dims ($dims) must split evenly into m ($m) subspaces")
    require(k >= 1, s"k must be >= 1: $k")
    require(iters >= 0, s"iters must be >= 0: $iters")
    val subDim = dims / m
    val clean = df.filter(size(col(vecCol)) === dims)

    // deterministic init, one TakeOrdered for ALL subspaces: the k
    // lowest (portable hash, id) rows seed every codebook with their
    // j-th subvector
    val initRows = clean
      .orderBy(TextFns.hash60(col(idCol).cast(StringType)), col(idCol))
      .limit(k)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toVector.map(_.toDouble))
    require(initRows.length == k,
      s"need at least $k rows with $dims-wide vectors, found ${initRows.length}")
    var books = Vector.tabulate(m) { j =>
      KMeans.Model(initRows.toVector.map(_.slice(j * subDim, (j + 1) * subDim)))
    }

    for (_ <- 0 until iters) {
      // ONE scan: per row, one (subspace, cell, subvector) struct per
      // subspace, exploded then posexploded to coordinate rows; the
      // shuffle carries m·k·subDim partial-agg groups
      val perSub = array((0 until m).map { j =>
        struct(
          lit(j).as("sub"),
          KMeans.assignCell(books(j), sub(col(vecCol), j, subDim)).as("cell"),
          sub(col(vecCol), j, subDim).as("sv"))
      }: _*)
      val stats = clean
        .select(explode(perSub).as("e"))
        .select(col("e.sub").as("sub"), col("e.cell").as("cell"),
          posexplode(col("e.sv")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("cell"), col("pos"))
        .agg(sum(col("x").cast(DecimalType(38, 10))).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val byKey = stats.groupBy(r => (r.getInt(0), r.getInt(1)))
      books = books.zipWithIndex.map { case (book, j) =>
        KMeans.Model(book.centroids.zipWithIndex.map { case (old, c) =>
          byKey.get((j, c)) match {
            case Some(rows) =>
              val cen = Array.fill(subDim)(0.0)
              rows.foreach { r =>
                cen(r.getInt(2)) = r.getDecimal(3).doubleValue() / r.getLong(4)
              }
              cen.toVector
            case None => old // empty cluster: keep previous centroid
          }
        })
      }
    }
    PQModel(m, subDim, books)
  }

  /** Encode each vector as its `m` nearest-centroid codes (`codes`
    * array<int>, values in [0, k)). Narrow projection, zero shuffles. */
  def encode(df: DataFrame, idCol: String, vecCol: String, pq: PQModel): DataFrame =
    df.filter(size(col(vecCol)) === pq.dims)
      .select(col(idCol), array((0 until pq.m).map { j =>
        KMeans.assignCell(pq.books(j), sub(col(vecCol), j, pq.subDim))
          .cast(IntegerType)
      }: _*).as("codes"))

  /** Subspace j's centroids as a literal array<array<double>>. */
  private def bookLit(book: KMeans.Model): Column =
    array(book.centroids.map(c => array(c.map(lit): _*)): _*)

  /** Reconstructed (decoded) vector from a `codes` column: the
    * concatenation of each subspace's selected centroid. */
  def reconstructExpr(codes: Column, pq: PQModel): Column =
    flatten(array((0 until pq.m).map { j =>
      element_at(bookLit(pq.books(j)), element_at(codes, j + 1) + 1)
    }: _*))

  /** Per-row reconstruction report: (id, sq_err) — the squared L2
    * distortion the compression introduced. Join of original vectors
    * with codes on the id, then a narrow fold. */
  def reconstructionError(
      vectors: DataFrame, codes: DataFrame, idCol: String, vecCol: String,
      pq: PQModel): DataFrame =
    vectors.filter(size(col(vecCol)) === pq.dims)
      .join(codes, idCol)
      .select(col(idCol),
        aggregate(
          zip_with(col(vecCol), reconstructExpr(col("codes"), pq), (x, r) => {
            val d = x.cast(DoubleType) - r
            d * d
          }),
          lit(0.0), (acc, x) => acc + x).as("sq_err"))

  /** Asymmetric-distance top-k: for each query (full-precision vector),
    * the `topK` nearest CODES by table-lookup L2 — ascending distance,
    * ties to the lowest neighbor id. The scan side reads only the m-int
    * codes column. */
  def adcSearch(
      codes: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      pq: PQModel, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    // per-query distance tables: dtabs(j)(c) = ||q_sub_j - centroid_jc||²
    val dtabs = array((0 until pq.m).map { j =>
      array(pq.books(j).centroids.map { c =>
        aggregate(
          zip_with(sub(col(vecCol), j, pq.subDim),
            array(c.map(lit): _*), (x, cd) => {
              val d = x.cast(DoubleType) - cd
              d * d
            }),
          lit(0.0), (acc, x) => acc + x)
      }: _*)
    }: _*)
    val q = queries.filter(size(col(vecCol)) === pq.dims)
      .select(col(idCol).as("q_id"), dtabs.as("dtabs"))
    val n = codes.select(col(idCol).as("n_id"), col("codes"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("distance"), col("n_id"))
    n.join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        aggregate(
          zip_with(col("dtabs"), col("codes"),
            (tab, c) => element_at(tab, c + 1)),
          lit(0.0), (acc, x) => acc + x).as("distance"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
  }
}
