package graft

import graft.core.GraftConfig
import graft.tools.Orchestrator

/** Config-driven pipeline run: a fixture YAML supplies per-layer lake
  * roots (local dirs standing in for the deployment's buckets) and the
  * orchestrator lands every layer where the config points — the
  * reference's orchestrator.py + config_template.yaml contract.
  */
class OrchestratorSpec extends SparkSpec {

  test("run() drives the full pipeline from a fixture YAML's bucket roots") {
    val root = new java.io.File("target/tmp/orch_spec").getAbsolutePath
    val yaml =
      s"""s3:
         |  endpoint_url: http://minio:9000
         |  access_key: AK
         |  secret_key: SK
         |  buckets:
         |    bronze: $root/bronze-bucket
         |    silver: $root/silver-bucket
         |    gold: $root/gold-bucket
         |spark:
         |  app_name: graft-orch-spec
         |""".stripMargin
    val cfg = GraftConfig.fromYamlString(yaml)
    assert(cfg.buckets.get.bronzeUri === s"$root/bronze-bucket",
      "absolute paths must pass through un-prefixed")

    val ok = Orchestrator.run(spark, "/root/testdata/sf0.001", Some(cfg))
    assert(ok, "pipeline must report SUCCESS")
    // every layer landed under ITS configured root
    assert(new java.io.File(s"$root/bronze-bucket/orders").isDirectory)
    assert(new java.io.File(s"$root/silver-bucket/orders").isDirectory)
    assert(new java.io.File(s"$root/gold-bucket/customer_summary").isDirectory)
    // and the object-store creds reached the running session's hadoop conf
    assert(spark.sparkContext.hadoopConfiguration
      .get("fs.s3a.endpoint") === "http://minio:9000")
    val gold = spark.read.parquet(s"$root/gold-bucket/customer_summary")
    assert(gold.count() > 0)
    assert(gold.columns.toSet === Set("o_custkey", "n_orders", "total_spent"))
  }

  test("run() without config falls back to a repo-local scratch root") {
    val ok = Orchestrator.run(spark, "/root/testdata/sf0.001", None)
    assert(ok)
    assert(new java.io.File(
      "target/tmp/orchestrator__root_testdata_sf0.001/bronze/orders").isDirectory)
  }
}
