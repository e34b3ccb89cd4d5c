package graft.operators

import graft.engine.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic deduplication — the SemDeDup recipe (Abbas et al., 2023,
  * arXiv:2303.09540): embed, cluster, then remove near-duplicates
  * WITHIN each cluster by exact cosine, keeping one representative per
  * duplicate neighborhood. The clustering is what makes embedding-level
  * dedup tractable at corpus scale: the quadratic compare is confined
  * to cells, never the corpus.
  *
  * Pairing: cells come from any coarse assignment — [[KMeans]]
  * centroids ([[graft.api.Graft.kmeansFit]]/`ivfAssign`), a stored
  * label, or an SRP band. This operator takes the assignment as a
  * column, so the same dedup composes with every cell source.
  *
  * Keep rule: a vector is REMOVED iff some same-cell vector with a
  * LOWER id is cosine-`tau`-close — deterministic (no dependence on
  * iteration order), engine-portable (the strict-fold cosine the
  * DuckDB oracle reproduces bit-for-bit), and exactly one survivor
  * per pairwise-duplicate chain anchored at its minimum id.
  *
  * Scale shape: ONE equi-join on the cell key; the per-cell compare is
  * O(c²) by design, bounded by the clustering granularity (SemDeDup
  * sizes k so cells stay ~10³-10⁴ vectors at any corpus size — at
  * 100 TB you raise k, not the cell size). The join ships embeddings
  * only within cells; the survivor set resolves as one broadcast-able
  * anti-join on ids. Cosine is the native codegen'd
  * [[org.apache.spark.sql.graft.CosineSimilarity]] expression.
  */
object SemDedup {

  private def cos(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Survivors of cluster-scoped cosine dedup: `vecs` minus every row
    * whose cell contains a lower-id vector with cosine ≥ `tau`. All
    * input columns pass through. */
  def semanticDedup(
      vecs: DataFrame, idCol: String, embCol: String, cellCol: String,
      tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1]: $tau")
    GraftFunctions.register(vecs.sparkSession)
    val a = vecs.select(
      col(cellCol).as("_sd_cell"), col(idCol).as("_sd_a"), col(embCol).as("_sd_ea"))
    val b = vecs.select(
      col(cellCol).as("_sd_cell"), col(idCol).as("_sd_b"), col(embCol).as("_sd_eb"))
    val removed = a.join(b, "_sd_cell")
      .filter(col("_sd_a") < col("_sd_b"))
      .filter(cos(col("_sd_ea"), col("_sd_eb")) >= tau)
      .select(col("_sd_b").as(idCol))
      .distinct()
    vecs.join(removed, Seq(idCol), "left_anti")
  }
}
