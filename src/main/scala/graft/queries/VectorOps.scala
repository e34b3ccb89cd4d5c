package graft.queries

import graft.core.Lake
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over the `embeddings` table (`Array[Float]`, dim 64):
  * embedding near-dup pairs, brute-force cosine top-k, and an IVF-style
  * cell-restricted ANN variant — all oracle-matched against DuckDB.
  *
  * Determinism: dot products and norms are computed as a strict
  * left-to-right double fold (`aggregate` HOF in Spark ≡ `list_reduce` in
  * DuckDB — both sequential left folds), with each float pair cast to
  * double before multiplying. Identical operand order + IEEE 754 →
  * bit-identical doubles in both engines, no rounding anywhere.
  *
  * Scale design: norms are computed once per vector in a narrow pre-pass
  * (scan-parallel) and carried into the pair stage, so each pair costs one
  * 64-slot fold. The query side of every op is a bounded set — pair cost
  * is O(|queries| × N), not O(N²). q41 is the 100 TB path: candidate
  * generation restricted to the query's coarse cell (here the `label`
  * column standing in for an IVF centroid assignment), i.e. an equi-join
  * that prunes the scan to one cell instead of a full cross product.
  */
object VectorOps {

  private def lake(s: SparkSession, dir: String) = Lake(s, dir)

  /** Strict left-fold double dot product of two float-array columns. */
  private def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0),
      (acc, p) => acc + p)

  /** Embeddings with a precomputed squared norm (narrow pre-pass). */
  private def withNorm(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).embeddings
      .select(col("vec_id"), col("label"), col("embedding"),
        dot(col("embedding"), col("embedding")).as("norm_sq"))

  private def cosine(dotCol: Column, n1: Column, n2: Column): Column =
    dotCol / sqrt(n1 * n2)

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
    val v = withNorm(s, dir)
    val a = v.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("d1"), col("embedding").as("e1"), col("norm_sq").as("n1"))
    val b = v.select(col("vec_id").as("d2"), col("embedding").as("e2"), col("norm_sq").as("n2"))
    a.join(b, col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        cosine(dot(col("e1"), col("e2")), col("n1"), col("n2")).as("cosine"))
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
    val v = withNorm(s, dir)
    val q = v.filter(col("vec_id") < 16)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("norm_sq").as("qn"))
    val n = v.select(col("vec_id").as("n_id"), col("embedding").as("ne"), col("norm_sq").as("nn"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    q.join(n, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        cosine(dot(col("qe"), col("ne")), col("qn"), col("nn")).as("cosine"))
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
    val v = withNorm(s, dir)
    val q = v.filter(col("vec_id") < 32)
      .select(col("vec_id").as("q_id"), col("label").as("cell"),
        col("embedding").as("qe"), col("norm_sq").as("qn"))
    val n = v.select(col("vec_id").as("n_id"), col("label").as("n_cell"),
      col("embedding").as("ne"), col("norm_sq").as("nn"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    q.join(n, col("cell") === col("n_cell") && col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("cell"), col("n_id"),
        cosine(dot(col("qe"), col("ne")), col("qn"), col("nn")).as("cosine"))
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
