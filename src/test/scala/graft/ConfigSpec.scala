package graft

import graft.core.{GraftConfig, ObjectStoreConfig, SparkSessionFactory}

/** Config loader + object-store session wiring (the surface of the
  * reference's config_template.yaml and its per-script S3A blocks).
  */
class ConfigSpec extends SparkSpec {

  private val template =
    """# Data Lake Configuration
      |
      |mysql:
      |  host: db.internal
      |  port: 3306
      |  database: sakila
      |  user: etl
      |  password: secret  # Change this!
      |
      |kafka:
      |  bootstrap_servers:
      |    - broker1:29092
      |    - broker2:29092
      |  topics:
      |    - sakila.actor
      |    - sakila.film
      |
      |s3:
      |  endpoint_url: http://minio:9000
      |  access_key: AK
      |  secret_key: SK
      |  buckets:
      |    bronze: datalake-bronze
      |    silver: datalake-silver
      |    gold: datalake-gold
      |
      |spark:
      |  master_url: spark://master:7077
      |  app_name: SakilaDataLake
      |""".stripMargin

  test("yaml loader extracts mysql/kafka/s3/buckets/spark sections") {
    val cfg = GraftConfig.fromYamlString(template)
    assert(cfg.mysql.get.jdbcUrl === "jdbc:mysql://db.internal:3306/sakila")
    assert(cfg.mysql.get.password === "secret", "inline comment must be stripped")
    assert(cfg.kafka.get.bootstrap === "broker1:29092,broker2:29092")
    assert(cfg.kafka.get.topics === Seq("sakila.actor", "sakila.film"))
    assert(cfg.objectStore.get ===
      ObjectStoreConfig("http://minio:9000", "AK", "SK"))
    assert(cfg.buckets.get.bronzeUri === "s3a://datalake-bronze")
    assert(cfg.buckets.get.goldUri === "s3a://datalake-gold")
    assert(cfg.sparkMaster === "spark://master:7077")
    assert(cfg.appName === "SakilaDataLake")
  }

  test("quoted scalars carry ' #' and spaces; malformed quoting fails loudly") {
    val cfg = GraftConfig.fromYamlString(
      """mysql:
        |  host: db
        |  database: sakila
        |  user: etl
        |  password: "my #pass"  # quoted: the hash is part of the value
        |""".stripMargin)
    assert(cfg.mysql.get.password === "my #pass",
      "a quoted value containing ' #' must not be truncated")
    val single = GraftConfig.fromYamlString("spark:\n  app_name: 'a b # c'\n")
    assert(single.appName === "a b # c")
    // standard escapes: '' inside single quotes, \" inside double quotes
    val esc1 = GraftConfig.fromYamlString("spark:\n  app_name: 'it''s'\n")
    assert(esc1.appName === "it's")
    val esc2 = GraftConfig.fromYamlString("spark:\n  app_name: \"pa\\\"ss\"\n")
    assert(esc2.appName === "pa\"ss")
    // bucket values with a slash are paths, never s3a-prefixed
    val rel = GraftConfig.fromYamlString(
      "s3:\n  endpoint_url: e\n  access_key: a\n  secret_key: s\n" +
        "  buckets:\n    bronze: data/bronze\n    silver: data/silver\n    gold: data/gold\n")
    assert(rel.buckets.get.bronzeUri === "data/bronze")
    // unterminated quote and trailing junk after the close both throw
    intercept[IllegalArgumentException] {
      GraftConfig.fromYamlString("spark:\n  app_name: \"oops\n")
    }
    intercept[IllegalArgumentException] {
      GraftConfig.fromYamlString("spark:\n  app_name: \"a\" junk\n")
    }
  }

  test("double-quoted escapes translate; unknown escapes fail loudly") {
    // "\n" must decode to a real newline — never the letter n (a
    // password carrying escape sequences must not be silently corrupted)
    val nl = GraftConfig.fromYamlString("spark:\n  app_name: \"a\\nb\"\n")
    assert(nl.appName === "a\nb")
    val tab = GraftConfig.fromYamlString("spark:\n  app_name: \"a\\tb\"\n")
    assert(tab.appName === "a\tb")
    val bs = GraftConfig.fromYamlString("spark:\n  app_name: \"a\\\\nb\"\n")
    assert(bs.appName === "a\\nb", "escaped backslash then literal n")
    // an escape outside the supported set raises instead of guessing
    val e = intercept[IllegalArgumentException] {
      GraftConfig.fromYamlString("spark:\n  app_name: \"a\\xb\"\n")
    }
    assert(e.getMessage.contains("unsupported escape"))
    // single-quoted values stay verbatim — no escape processing at all
    val sq = GraftConfig.fromYamlString("spark:\n  app_name: 'a\\nb'\n")
    assert(sq.appName === "a\\nb")
  }

  test("a config with no deployment sections still loads with local defaults") {
    val cfg = GraftConfig.fromYamlString("processing:\n  bronze:\n    batch_size: 1000\n")
    assert(cfg.mysql.isEmpty && cfg.kafka.isEmpty && cfg.objectStore.isEmpty)
    assert(cfg.sparkMaster === "local[*]")
  }

  test("objectStoreConfs emits the full S3A key set the reference wires") {
    val m = SparkSessionFactory.objectStoreConfs(
      ObjectStoreConfig("http://minio:9000", "AK", "SK"))
    assert(m("fs.s3a.endpoint") === "http://minio:9000")
    assert(m("fs.s3a.access.key") === "AK")
    assert(m("fs.s3a.secret.key") === "SK")
    assert(m("fs.s3a.path.style.access") === "true")
    assert(m("fs.s3a.impl") === "org.apache.hadoop.fs.s3a.S3AFileSystem")
    assert(m("fs.s3a.committer.name") === "directory")
    assert(m("fs.s3a.fast.upload") === "true")
    assert(m("fs.s3a.connection.ssl.enabled") === "false")
  }

  test("applyObjectStore wires a RUNNING session's hadoop conf for s3a:// paths") {
    SparkSessionFactory.applyObjectStore(spark,
      ObjectStoreConfig("http://minio:9000", "AK", "SK"))
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.endpoint") === "http://minio:9000")
    assert(hc.get("fs.s3a.path.style.access") === "true")
  }

  test("fromYaml reads a file on disk") {
    val f = java.io.File.createTempFile("graft_cfg", ".yaml",
      new java.io.File("target/tmp"))
    java.nio.file.Files.writeString(f.toPath, template)
    assert(GraftConfig.fromYaml(f.getAbsolutePath).appName === "SakilaDataLake")
  }
}
