package graft.queries

import graft.core.Lake
import graft.engine.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over the `embeddings` table (`Array[Float]`, dim 64):
  * embedding near-dup pairs, brute-force cosine top-k, and an IVF-style
  * cell-restricted ANN variant — all oracle-matched against DuckDB.
  *
  * Determinism: dot products and norms are strict left-to-right double
  * folds with each float cast to double before multiplying — the native
  * [[graft.expressions.CosineSimilarity]] expression on the Spark side and
  * `list_reduce` (a sequential left fold) on the DuckDB side evaluate the
  * identical operation sequence, so IEEE 754 gives bit-identical doubles
  * in both engines with no rounding anywhere.
  *
  * Scale design: the fused codegen'd cosine walks each pair once. The
  * query side of every op is a bounded set — pair cost
  * is O(|queries| × N), not O(N²). q41 is the 100 TB path: candidate
  * generation restricted to the query's coarse cell (here the `label`
  * column standing in for an IVF centroid assignment), i.e. an equi-join
  * that prunes the scan to one cell instead of a full cross product.
  */
object VectorOps {

  private def lake(s: SparkSession, dir: String) = Lake(s, dir)

  /** Native fused cosine (graft.expressions.CosineSimilarity): one
    * codegen'd loop per pair computing dot + both norms — replaces the
    * three-pass zip_with/aggregate HOF chain with identical bit-level
    * semantics (strict left fold, double math, dot / sqrt(na*nb)). */
  private def cos(s: SparkSession, a: Column, b: Column): Column = {
    GraftFunctions.register(s)
    call_function("cosine_sim", a, b)
  }

  private def vectors(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).embeddings.select(col("vec_id"), col("label"), col("embedding"))

  /** DuckDB fragments mirroring dot/norm exactly (same fold order). */
  private val dDot =
    """list_reduce(list_transform(range(len(a.embedding)),
         i -> CAST(a.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE)),
       (x, y) -> x + y)"""
  private val dNorm =
    """list_reduce(list_transform(range(len(embedding)),
         i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)),
       (x, y) -> x + y)"""

  // --------------------------------------------------------------------
  // q39 — embedding-cosine near-duplicate pairs: a decimated query side
  // (vec_id % 10 = 0) against the full table, cosine > 0.4. The pair
  // stage is O(|queries| × N); the full-table near-dup pass at scale goes
  // through q41's cell restriction instead.
  // --------------------------------------------------------------------
  def q39EmbeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val v = vectors(s, dir)
    val a = v.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("d1"), col("embedding").as("e1"))
    val b = v.select(col("vec_id").as("d2"), col("embedding").as("e2"))
    a.join(b, col("d1") < col("d2"))
      .select(col("d1"), col("d2"), cos(s, col("e1"), col("e2")).as("cosine"))
      .filter(col("cosine") > 0.4)
      .orderBy(col("d1"), col("d2"))
  }

  private val q39Oracle =
    s"""WITH v AS (SELECT vec_id, label, embedding, $dNorm AS norm_sq FROM embeddings),
       pairs AS (
         SELECT a.vec_id AS d1, b.vec_id AS d2,
                $dDot / sqrt(a.norm_sq * b.norm_sq) AS cosine
         FROM v a JOIN v b ON a.vec_id % 10 = 0 AND a.vec_id < b.vec_id)
       SELECT d1, d2, cosine FROM pairs WHERE cosine > 0.4 ORDER BY d1, d2"""

  // --------------------------------------------------------------------
  // q40 — brute-force cosine top-k (k=5) for a bounded query set
  // (vec_id < 16): the exact-ANN baseline. Ranking is a window
  // PARTITIONED by query id — parallel per query, never a global sort.
  // --------------------------------------------------------------------
  def q40KnnBruteForce(s: SparkSession, dir: String): DataFrame = {
    val v = vectors(s, dir)
    val q = v.filter(col("vec_id") < 16)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val n = v.select(col("vec_id").as("n_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    q.join(n, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), cos(s, col("qe"), col("ne")).as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .orderBy(col("q_id"), col("rnk"))
  }

  private val q40Oracle =
    s"""WITH v AS (SELECT vec_id, embedding, $dNorm AS norm_sq FROM embeddings),
       pairs AS (
         SELECT a.vec_id AS q_id, b.vec_id AS n_id,
                $dDot / sqrt(a.norm_sq * b.norm_sq) AS cosine
         FROM v a JOIN v b ON a.vec_id < 16 AND a.vec_id <> b.vec_id),
       ranked AS (
         SELECT q_id, n_id, cosine,
                CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INTEGER) AS rnk
         FROM pairs)
       SELECT q_id, n_id, cosine, rnk FROM ranked WHERE rnk <= 5
       ORDER BY q_id, rnk"""

  // --------------------------------------------------------------------
  // q41 — IVF-style ANN (the scale path): neighbors restricted to the
  // query's coarse cell (`label` = centroid assignment), so candidate
  // generation is an equi-join on the cell key — at 100 TB with
  // cell-partitioned storage this prunes to ~1/cells of the data and
  // shuffles nothing but the (small) query set.
  // --------------------------------------------------------------------
  def q41IvfAnn(s: SparkSession, dir: String): DataFrame = {
    val v = vectors(s, dir)
    val q = v.filter(col("vec_id") < 32)
      .select(col("vec_id").as("q_id"), col("label").as("cell"),
        col("embedding").as("qe"))
    val n = v.select(col("vec_id").as("n_id"), col("label").as("n_cell"),
      col("embedding").as("ne"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    q.join(n, col("cell") === col("n_cell") && col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("cell"), col("n_id"),
        cos(s, col("qe"), col("ne")).as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .orderBy(col("q_id"), col("rnk"))
  }

  private val q41Oracle =
    s"""WITH v AS (SELECT vec_id, label, embedding, $dNorm AS norm_sq FROM embeddings),
       pairs AS (
         SELECT a.vec_id AS q_id, a.label AS cell, b.vec_id AS n_id,
                $dDot / sqrt(a.norm_sq * b.norm_sq) AS cosine
         FROM v a JOIN v b ON a.vec_id < 32 AND a.label = b.label AND a.vec_id <> b.vec_id),
       ranked AS (
         SELECT q_id, cell, n_id, cosine,
                CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INTEGER) AS rnk
         FROM pairs)
       SELECT q_id, cell, n_id, cosine, rnk FROM ranked WHERE rnk <= 3
       ORDER BY q_id, rnk"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_embedding_neardup" -> (q39EmbeddingNearDup _),
    "q40_knn_bruteforce" -> (q40KnnBruteForce _),
    "q41_ivf_ann" -> (q41IvfAnn _))

  val oracle: Map[String, String] = Map(
    "q39_embedding_neardup" -> q39Oracle,
    "q40_knn_bruteforce" -> q40Oracle,
    "q41_ivf_ann" -> q41Oracle)
}
