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
    "q170_span_removal",
    // round 16: the watermarked stream-stream interval join — BATCH-COUNT
    // scaling, not just data scaling: the synthesized corpus is sliced
    // into 3k time-ordered single-file batches (see synth) and
    // `graft.streaming.maxFilesPerTrigger=1` makes AvailableNow replay
    // one slice per micro-batch, so a k× corpus pays k× the micro-batch
    // machinery (offset log, state-store commit, watermark advance) at
    // CONSTANT rows/batch. Replicas carry disjoint user_id ranges, so
    // join state, matches, and outer emissions all grow linearly — a
    // super-linear exponent would mean per-batch overhead grows with
    // history (state not evicted at the watermark) and must be chased
    "q162_stream_stream_join")

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
    val selected = ProbeQueries.filter(q => only.forall(_.contains(q)))
    val withEvents = selected.contains("q162_stream_stream_join")
    if (withEvents)
      // one slice per micro-batch (readEvents' replay-pacing knob);
      // only the stream-stream probe reads the event feed here
      spark.conf.set("graft.streaming.maxFilesPerTrigger", "1")
    val root = new java.io.File(
      s"target/tmp/datascale_${java.lang.Long.toHexString(System.nanoTime())}")
    val dir1 = synth(spark, sfDir, 1, s"${root.getAbsolutePath}/x1", withEvents)
    val dirN = synth(spark, sfDir, factor, s"${root.getAbsolutePath}/x$factor",
      withEvents)

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

    val rows = selected.map { q =>
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
      spark: SparkSession, sfDir: String, k: Int, out: String,
      withEvents: Boolean = false): String = {
    if (withEvents) synthEvents(spark, sfDir, k, out)
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

  /** Write a k×-replicated event feed under `out` as `3k` TIME-ORDERED
    * single-file slices (`events_000.parquet`, `events_001.parquet`, …)
    * so the file source — oldest-first, paced to one file per trigger by
    * the `graft.streaming.maxFilesPerTrigger` knob — replays it in `3k`
    * micro-batches of CONSTANT size, the shape a live feed's bounded
    * replay has. Replica r shifts user_id and event_id by r·10⁸
    * (disjoint join keys: state, matches, and outer emissions grow
    * linearly) but keeps every timestamp, so slicing the union on ts
    * quantiles interleaves all replicas into each slice and watermarks
    * advance across batches exactly as they would on one k×-rate feed.
    * Explicit ascending mtimes (1 s apart, ending now) pin the source's
    * (timestamp, path) processing order to the slice order. */
  private[graft] def synthEvents(
      spark: SparkSession, sfDir: String, k: Int, out: String): Unit = {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val replicas = (0 until k).map { r =>
      ev.select(
        (col("event_id") + lit(r.toLong * 100000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(r.toLong * 100000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    val all = replicas.reduce(_ unionByName _)
    // order column for quantile slicing: nanos-generation feeds carry a
    // raw long, timestamp generations cast monotonically under the
    // factory's pinned UTC session
    val ord = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts").cast("double")
      case _ => unix_micros(col("ts").cast("timestamp")).cast("double")
    }
    val keyed = all.withColumn("__ord", ord)
    val slices = 3 * k
    val cuts = keyed.stat.approxQuantile(
      "__ord", (1 until slices).map(_.toDouble / slices).toArray, 0.001)
    val bounds = (Double.NegativeInfinity +: cuts.toSeq) :+
      Double.PositiveInfinity
    val outDir = new java.io.File(out); outDir.mkdirs()
    val base = System.currentTimeMillis() - slices * 1000L
    for (i <- 0 until slices) {
      val slice = keyed
        .filter(col("__ord") >= bounds(i) && col("__ord") < bounds(i + 1))
        .drop("__ord")
      val tmp = new java.io.File(outDir, "_evtmp")
      slice.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
      val part = tmp.listFiles().find(f =>
        f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      val dst = new java.io.File(outDir, f"events_$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.setLastModified(base + i * 1000L)
      graft.core.Fs.rmTree(tmp)
    }
  }
}
