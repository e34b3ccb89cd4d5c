package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DATA-plane scaling probe (the metadata-plane sibling is
  * [[ScaleProbe]]): measures the scaling EXPONENT of the heavy banded
  * joins — MinHash-LSH (q36), prefix-filter exact Jaccard (q37b), the
  * composed prep pipeline (q63), transitive clustering (q77), the
  * perceptual image band join (q155) and the composed media dedup
  * (q159) — by running each query at 1× and N× a synthesized corpus
  * and reporting wall-time ratios as `log(tN/t1) / log(N)`.
  *
  * A banded/blocked join whose candidate generation is sound scales
  * ~linearly in the corpus (exponent ≈ 1, plus sublinear fixed cost
  * that pulls the measured exponent BELOW 1 at these sizes); an
  * exponent drifting past ~1.3 means a quadratic candidate stage is
  * hiding somewhere and must be chased.
  *
  * Corpus synthesis: replica k of the sf-dir documents table carries
  * doc_id + k·10⁸ and a per-replica Caesar-shifted text
  * (`translate` over the letter alphabet, shift = 7k). The shift is
  * length-preserving and keeps WITHIN-replica structure exactly
  * (organic near-dups, the every-7th fixture copies each query plants)
  * while destroying CROSS-replica shingle/grid overlap — so output
  * size grows linearly with the corpus, the shape organic growth has,
  * not quadratically as raw duplication of near-identical rows would.
  * Everything writes under target/tmp (TESTDATA stays read-only).
  *
  * Usage: `sbt "runMain graft.tools.DataScaleProbe [sfDir] [factor]
  * [repeats]"` — defaults /root/testdata/sf0.1, 10×, 3 (per-point
  * median of 3 after one untimed warm-up, the Bench convention).
  */
object DataScaleProbe {

  private val Letters = "abcdefghijklmnopqrstuvwxyz"
  private val ProbeQueries = Seq(
    "q36_minhash_lsh", "q37b_prefix_jaccard", "q63_prep_pipeline",
    "q77_neardup_components", "q155_image_neardup", "q159_media_dedup",
    // round 15: the exact-span winnowing join — the Caesar transform
    // destroys cross-replica 40-char spans, so spans (and candidate
    // pairs) grow linearly with the corpus, the organic shape
    "q164_exact_spans",
    // round 16: the star-collapsed occurrence-grouped form under a
    // WORST-CASE corpus-wide boilerplate — every 10th doc gains an
    // IDENTICAL 120-char tail that survives the Caesar transform
    // (appended after synthesis), so the hot span's df grows with the
    // corpus; group-linear candidate work keeps the exponent ~1 where
    // the pairwise form would go quadratic in df
    "spanGroups_boilerplate",
    // round 16: keep-first span REMOVAL — window-hash groupBy + per-doc
    // position collect + narrow cut; linear by construction, probed to
    // keep it honest
    "q170_span_removal")

  /** The injected corpus-wide boilerplate (fixed: df must be a pure
    * function of corpus size). 120 chars ≥ 3·T. */
  private val Boiler =
    "this work is licensed under the creative commons attribution " +
      "share alike license terms reproduced verbatim in every copy"

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val repeats = if (args.length > 2) args(2).toInt else 3
    // optional 4th arg: comma-separated probe-query subset — the
    // 30×/52× decade runs target the two worst exponents without
    // paying for the whole battery (52× is the transform-family
    // ceiling: 26 Caesar shifts × optional reversal — synth() rejects
    // a larger factor rather than silently reusing a transform and
    // collapsing cross-replica distinctness)
    val only = if (args.length > 3) Some(args(3).split(",").toSet) else None
    val spark = graft.core.SparkSessionFactory.local("graft-data-scale-probe")
    spark.range(1000000).selectExpr("id % 97 AS k", "id AS v")
      .groupBy("k").sum("v").count() // codegen/shuffle warmup
    val root = new java.io.File(
      s"target/tmp/datascale_${java.lang.Long.toHexString(System.nanoTime())}")
    val dir1 = synth(spark, sfDir, 1, s"${root.getAbsolutePath}/x1")
    val dirN = synth(spark, sfDir, factor, s"${root.getAbsolutePath}/x$factor")

    def time(name: String, dir: String): Double = {
      val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame =
        if (name == "spanGroups_boilerplate") { (sp, d) =>
          implicit val is: SparkSession = sp
          graft.operators.ExactSpans.spanOccurrences(
            sp.read.parquet(s"$d/documents.parquet")
              .withColumn("text",
                when(col("doc_id") % 10 === 0, concat(col("text"), lit(Boiler)))
                  .otherwise(col("text"))),
            "doc_id", "text")
        }
        else graft.SparkEntry.queries(name)
      graft.core.CacheScope.scoped { fn(spark, dir).count(); () } // warm-up
      val ts = Seq.fill(repeats) {
        val t0 = System.nanoTime()
        graft.core.CacheScope.scoped { fn(spark, dir).count(); () }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }

    val rows = ProbeQueries.filter(q => only.forall(_.contains(q))).map { q =>
      val t1 = time(q, dir1)
      val tN = time(q, dirN)
      val exp = math.log(tN / t1) / math.log(factor.toDouble)
      System.err.println(f"[datascale] $q%-24s t1=$t1%7.2fs t$factor=$tN%8.2fs " +
        f"ratio=${tN / t1}%6.2f exponent=$exp%5.2f")
      s""""$q":{"t1":$t1,"tN":$tN,"ratio":${tN / t1},"exponent":$exp}"""
    }
    println(s"""{"metric":"data_scale_exponent","factor":$factor,""" +
      s""""sf":"$sfDir","queries":${rows.mkString("{", ",", "}")}}""")
    spark.stop()
  }

  /** Write a k×-replicated documents table under `out`; returns `out`.
    * Replica 0 is the original text byte-for-byte. */
  private def synth(
      spark: SparkSession, sfDir: String, k: Int, out: String): String = {
    require(k <= 52,
      "the transform family has 52 distinct members (26 shifts × reversal)")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val replicas = (0 until k).map { r =>
      val shifted = Letters.drop((7 * r) % 26) + Letters.take((7 * r) % 26)
      // 7k mod 26 repeats past 26 replicas; replicas 26-51 are ALSO
      // REVERSED, so every replica's transform stays distinct and
      // cross-replica shingle/grid overlap stays destroyed at 30×+.
      // Reversal (not case-swap) on purpose: it is length-preserving,
      // preserves within-replica near-dup structure (equal texts stay
      // equal, a one-char edit stays a one-char edit), and — unlike a
      // case-swap — survives the case-NORMALIZING probe queries (q63
      // canonicalizes on md5(lower(trim(text))), under which a
      // case-swapped replica collapses into exact dups of its partner
      // and the corpus stops growing linearly).
      val caesar = translate(col("text"),
        Letters + Letters.toUpperCase, shifted + shifted.toUpperCase)
      docs.select(
        (col("doc_id") + lit(r.toLong * 100000000L)).as("doc_id"),
        (if (r < 26) caesar else reverse(caesar)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    replicas.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    out
  }
}
