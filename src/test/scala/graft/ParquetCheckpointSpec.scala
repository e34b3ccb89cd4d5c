package graft

import java.nio.file.{Files, Paths}

import graft.medallion.{GraftTable, ParquetCheckpoint, TxLog}
import org.apache.spark.sql.types._

/** Columnar (parquet) commit-log checkpoints: exact round trip of every
  * action through the binary format, distributed-prune equivalence with
  * the driver path (including row-group pushdown conservativeness), the
  * `parquetCheckpoint` protocol gate, and log truncation sweeping up to
  * a parquet artifact. */
class ParquetCheckpointSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("x", DoubleType)))

  private def freshDir(tag: String): java.io.File = {
    val d = new java.io.File(
      s"target/tmp/pqcp_${tag}_${java.util.UUID.randomUUID().toString.take(8)}")
    d.mkdirs(); d
  }

  /** Synthetic table whose v1 checkpoint is PARQUET with `n` adds:
    * file i covers ids [i*100, i*100+99] (same fixture as
    * DistributedPruneSpec), plus one statless file and one string-y
    * payload to exercise every column family. */
  private def synthParquetTable(n: Int): GraftTable = {
    val dir = freshDir("synth")
    val logDir = Paths.get(dir.getAbsolutePath, "_graft_log")
    Files.createDirectories(logDir)
    val sch = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val adds = (0 until n).iterator.map { i =>
      (TxLog.AddFile(
        path = f"part-synth-$i%07d.parquet", rows = 100L, bytes = 4096L,
        stats = Map(
          "id" -> TxLog.ColStats("num",
            (i * 100L).toString, (i * 100L + 99L).toString, Some(0L)),
          "s" -> TxLog.ColStats("str",
            f"k$i%07d", f"k$i%07dzz", Some(0L)))),
        Some(1L))
    } ++ Iterator(
      // a file with NO stats at all: every prune must keep it
      (TxLog.AddFile("part-stateless.parquet", 7L, 128L,
        Map.empty[String, TxLog.ColStats]), None))
    val metaDoc = TxLog.renderMetaLines(
      "checkpoint", 1L, Some(sch.json), Nil, Map.empty, None, None)
      .mkString("\n")
    ParquetCheckpoint.write(
      logDir.resolve(f"${1L}%020d.checkpoint.parquet"), metaDoc, sch, adds)
    new GraftTable(dir.getAbsolutePath)
  }

  test("end-to-end: property flips checkpoints to parquet; snapshot round-trips") {
    val t = new GraftTable(freshDir("e2e").getAbsolutePath)
    t.create(schema)                                             // v1
    t.append(Seq((1L, 0.5), (2L, 1.5)).toDF("id", "x"))          // v2
    t.setProperty(TxLog.CheckpointFormatProp, "parquet")         // v3
    t.append(Seq((3L, 2.5)).toDF("id", "x"))                     // v4
    val before = t.snapshot()
    val cv = t.checkpoint()
    assert(cv === before.version)
    val logDir = Paths.get(t.tablePath, "_graft_log")
    assert(Files.exists(logDir.resolve(f"$cv%020d.checkpoint.parquet")),
      "parquet artifact must exist")
    assert(!Files.exists(logDir.resolve(f"$cv%020d.checkpoint.json")),
      "no json twin in parquet mode")
    // resolution THROUGH the parquet checkpoint reproduces the state
    val after = t.snapshot()
    assert(after.version === before.version)
    assert(after.schemaJson === before.schemaJson)
    assert(after.files.map(a => (a.path, a.rows, a.bytes, a.stats)).toSet ===
      before.files.map(a => (a.path, a.rows, a.bytes, a.stats)).toSet)
    assert(after.addedIn === before.addedIn)
    assert(after.props === before.props)
    // the data still reads, and a post-checkpoint append stacks on top
    assert(t.read(spark).count() === 3L)
    t.append(Seq((4L, 3.5)).toDF("id", "x"))
    assert(t.read(spark).count() === 4L)
  }

  test("synthetic 20k-add parquet checkpoint: distributed == driver prune") {
    val t = synthParquetTable(20000)
    val snap = t.snapshot()
    assert(snap.files.size === 20001)
    assert(snap.addedIn.get("part-synth-0000000.parquet") === Some(1L))
    assert(snap.addedIn.get("part-stateless.parquet") === Some(1L),
      "provenance defaults to the checkpoint version")
    // numeric range: files 5000..5099 plus the statless survivor
    val cons = Seq[(String, Option[Any], Option[Any])](
      ("id", Some(500000L), Some(509999L)))
    val driver = t.prunedSnapshot(cons, -1L)
    assert(driver.files.size === 101)
    val dist = t.prunedSnapshotDistributed(spark, 1L, 1L, cons)
    assert(dist.files.map(_.path).toSet === driver.files.map(_.path).toSet)
    assert(dist.files.map(a => a.path -> a.stats).toMap ===
      driver.files.map(a => a.path -> a.stats).toMap,
      "stats must round-trip exactly through the columnar format")
    // boundary equality: a constraint exactly at a file's min/max keeps
    // it (the one-ulp widened pushdown bounds must never exclude it)
    val edge = Seq[(String, Option[Any], Option[Any])](
      ("id", Some(123499L), Some(123500L))) // max of file 1234, min of 1235
    val edgeDist = t.prunedSnapshotDistributed(spark, 1L, 1L, edge)
    assert(edgeDist.files.map(_.path).toSet ===
      t.prunedSnapshot(edge, -1L).files.map(_.path).toSet)
    assert(edgeDist.files.exists(_.path.contains("1234")) &&
      edgeDist.files.exists(_.path.contains("1235")))
    // string-kind constraint exercises the tmin/tmax family
    val sCons = Seq[(String, Option[Any], Option[Any])](
      ("s", Some("k0005000"), Some("k0005009zz")))
    val sDist = t.prunedSnapshotDistributed(spark, 1L, 1L, sCons)
    assert(sDist.files.map(_.path).toSet ===
      t.prunedSnapshot(sCons, -1L).files.map(_.path).toSet)
    assert(sDist.files.size === 11) // 10 matching + statless
    assert(sDist.files.exists(_.path == "part-stateless.parquet"),
      "a file without stats must always survive pruning")
  }

  test("the coarse prune predicate reaches the parquet scan as PushedFilters") {
    val t = synthParquetTable(5000)
    t.snapshot() // materialize once so the artifact exists
    val sch = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val cpPath = Paths.get(t.tablePath, "_graft_log",
      f"${1L}%020d.checkpoint.parquet").toString
    val ser = Seq[(String, Option[String], Option[String], Option[Any], Option[Any])](
      ("id", Some("500000"), Some("509999"), Some(500000L), Some(509999L)),
      ("s", Some("k0001000"), Some("k0001009zz"), Some("k0001000"), Some("k0001009zz")))
    val df = spark.read.parquet(cpPath)
      .filter(org.apache.spark.sql.functions.col("meta").isNull &&
        TxLog.parquetCoarsePredicate(sch, ser))
    val scans = graft.plans.AdaptivePlans.collectDeep(
      df.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a parquet file scan")
    val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
    // the typed bound columns must arrive as data filters the parquet
    // reader evaluates against row-group statistics — both the numeric
    // (double) and string families, both directions
    assert(pushed.contains("nmin_0") && pushed.contains("nmax_0"),
      s"numeric bounds not pushed: $pushed")
    assert(pushed.contains("tmin_1") && pushed.contains("tmax_1"),
      s"string bounds not pushed: $pushed")
    assert(pushed.contains("LessThanOrEqual") &&
      pushed.contains("GreaterThanOrEqual"), s"range shape missing: $pushed")
    // and the coarse scan is still exact after the executor-side
    // re-filter: the full prune equals the driver prune
    val cons = Seq[(String, Option[Any], Option[Any])](
      ("id", Some(500000L), Some(509999L)))
    assert(t.prunedSnapshotDistributed(spark, 1L, 1L, cons).files.map(_.path).toSet
      === t.prunedSnapshot(cons, -1L).files.map(_.path).toSet)
  }

  test("dv/bloom/hll/sum stats survive the binary round trip exactly") {
    val dir = freshDir("fidelity")
    val logDir = Paths.get(dir.getAbsolutePath, "_graft_log")
    Files.createDirectories(logDir)
    val rich = TxLog.AddFile("part-rich.parquet", 50L, 2048L,
      stats = Map("id" -> TxLog.ColStats("num", "1", "9", Some(3L),
        bloom = Some("QUJDRA=="), hll = Some("SEZMTA=="), sum = Some("45"))),
      dv = Some("ZHZkdg=="), dvRows = 5L)
    val metaDoc = TxLog.renderMetaLines("checkpoint", 1L, Some(schema.json),
      Seq(rich), Map("app" -> 7L), Some(Map("c1" -> "id > 0")),
      Some(Map("k" -> "v"))).mkString("\n")
    ParquetCheckpoint.write(
      logDir.resolve(f"${1L}%020d.checkpoint.parquet"), metaDoc, schema,
      Iterator((rich, Some(1L))))
    val t = new GraftTable(dir.getAbsolutePath)
    val snap = t.snapshot()
    assert(snap.files === Seq(rich), "AddFile (incl. dv + dvRows) is exact")
    assert(snap.txns === Map("app" -> 7L))
    assert(snap.constraints === Map("c1" -> "id > 0"))
    assert(snap.props === Map("k" -> "v"))
    // effectiveRows accounts the DV through the round trip
    assert(snap.files.head.effectiveRows === 45L)
  }

  test("protocol gate: the property commit names parquetCheckpoint") {
    val t = new GraftTable(freshDir("gate").getAbsolutePath)
    t.create(schema)
    val v = t.setProperty(TxLog.CheckpointFormatProp, "parquet")
    val commitJson = new String(Files.readAllBytes(
      Paths.get(t.tablePath, "_graft_log", f"$v%020d.json")), "UTF-8")
    assert(commitJson.contains("\"protocol\"") &&
      commitJson.contains("parquetCheckpoint"),
      s"props commit must gate by feature name:\n$commitJson")
    assert(TxLog.SupportedReaderFeatures.contains("parquetCheckpoint"))
    // and validation rejects junk values
    intercept[IllegalArgumentException](
      t.setProperty(TxLog.CheckpointFormatProp, "orc"))
  }

  test("format migration: json and parquet checkpoints coexist, dispatch per-version") {
    val t = new GraftTable(freshDir("mix").getAbsolutePath)
    t.create(schema)                                              // v1
    t.append(Seq((1L, 0.5)).toDF("id", "x"))                     // v2
    val jsonCv = t.checkpoint()                                   // json @ v2
    assert(Files.exists(Paths.get(t.tablePath, "_graft_log",
      f"$jsonCv%020d.checkpoint.json")))
    t.setProperty(TxLog.CheckpointFormatProp, "parquet")          // v3
    t.append(Seq((2L, 1.5)).toDF("id", "x"))                     // v4
    val pqCv = t.checkpoint()                                     // parquet @ v4
    assert(Files.exists(Paths.get(t.tablePath, "_graft_log",
      f"$pqCv%020d.checkpoint.parquet")))
    // head resolution starts at the NEWEST checkpoint (the parquet one)
    assert(t.snapshot().files.size === 2)
    assert(t.read(spark).count() === 2L)
    // time travel to the json-checkpoint era replays from the json one
    assert(t.snapshot(jsonCv).files.size === 1)
    // flipping BACK to json reverts future checkpoints, old artifacts stay
    t.setProperty(TxLog.CheckpointFormatProp, "json")             // v5
    t.append(Seq((3L, 2.5)).toDF("id", "x"))                     // v6
    val backCv = t.checkpoint()
    assert(Files.exists(Paths.get(t.tablePath, "_graft_log",
      f"$backCv%020d.checkpoint.json")))
    assert(t.snapshot().files.size === 3)
    assert(t.snapshot(pqCv).files.size === 2, "parquet-era travel still works")
  }

  test("distributed prune is exact across schema evolution AFTER a parquet checkpoint") {
    val t = new GraftTable(freshDir("evo").getAbsolutePath)
    val sch3 = StructType(Seq(StructField("a", LongType),
      StructField("b", LongType), StructField("c", LongType)))
    t.create(sch3)
    t.setProperty(TxLog.CheckpointFormatProp, "parquet")
    // one file per append. b's range [1000, 1005] NEVER overlaps the
    // c-constraint [20, 30] below: a coarse term that misreads b's
    // checkpoint bounds as c's (the field-index shift a dropColumn
    // causes when idxOf resolves against the suffix-EVOLVED schema)
    // would silently exclude live files before the exact re-check.
    (0 until 6).foreach { i =>
      t.append(Seq((i.toLong, 1000L + i, i * 10L)).toDF("a", "b", "c")) }
    val cv = t.checkpoint()
    t.dropColumn("a") // c's field index shifts 2 -> 1 in the evolved schema
    t.append(Seq((1006L, 60L)).toDF("b", "c"))
    val target = t.latestVersion()
    val cons = Seq[(String, Option[Any], Option[Any])](
      ("c", Some(20L), Some(30L)))
    val driver = t.prunedSnapshot(cons, target)
    assert(driver.files.size === 2, "files with c in {20,30} survive")
    val dist = t.prunedSnapshotDistributed(spark, cv, target, cons)
    assert(dist.files.map(_.path).toSet === driver.files.map(_.path).toSet,
      "post-drop index shift must not change the distributed survivor set")
    // a constraint on a column ADDED after the checkpoint has no
    // nmin_k/tmin_k in the artifact: the coarse term must skip it
    // (conservative survive, like the name-based JSON path), not fail
    // the scan with a missing-column AnalysisException
    t.addColumns(Seq(StructField("d", LongType)))
    val target2 = t.latestVersion()
    val consD = Seq[(String, Option[Any], Option[Any])](
      ("d", Some(1L), Some(2L)))
    val distD = t.prunedSnapshotDistributed(spark, cv, target2, consD)
    assert(distD.files.map(_.path).toSet ===
      t.prunedSnapshot(consD, target2).files.map(_.path).toSet,
      "constraint on a post-checkpoint column survives conservatively")
    assert(distD.files.size >= 6, "pre-add files have no 'd' stats — all kept")
  }

  test("type widening x parquet checkpoint: coarse/exact layering stays sound") {
    // Pin the invariant the writer's kinds(i)/cs.kind branching implies:
    // a widen BEFORE the checkpoint re-types stats (kinds agree), a
    // widen AFTER the checkpoint leaves the artifact's bound columns
    // typed under the old (still num-kind) schema — either way the
    // distributed prune must equal the driver prune exactly.
    val t = new GraftTable(freshDir("widen").getAbsolutePath)
    t.create(StructType(Seq(
      StructField("id", IntegerType), StructField("pay", IntegerType))))
    t.setProperty(TxLog.CheckpointFormatProp, "parquet")
    t.setProperty(TxLog.TypeWideningProp, "true")
    (0 until 4).foreach(i => t.append(Seq((i * 10, 7)).toDF("id", "pay")))
    t.widenColumn("id", LongType) // BEFORE the checkpoint
    (4 until 8).foreach(i => t.append(Seq((i * 10L, 7)).toDF("id", "pay")))
    val cv = t.checkpoint()
    t.widenColumn("pay", LongType) // AFTER the checkpoint
    t.append(Seq((80L, 7L)).toDF("id", "pay"))
    val target = t.latestVersion()
    for (cons <- Seq(
      Seq[(String, Option[Any], Option[Any])](("id", Some(20L), Some(50L))),
      Seq[(String, Option[Any], Option[Any])](("pay", Some(7L), Some(7L))))) {
      val driver = t.prunedSnapshot(cons, target)
      val dist = t.prunedSnapshotDistributed(spark, cv, target, cons)
      assert(dist.files.map(_.path).toSet === driver.files.map(_.path).toSet,
        s"widen-straddling prune diverged for $cons")
    }
    // the mid-range id prune actually prunes (not vacuously equal)
    assert(t.prunedSnapshot(
      Seq(("id", Some(20L), Some(50L))), target).files.size === 4)
  }

  test("checkpoint.format=auto flips to parquet past the add-count threshold") {
    val t = new GraftTable(freshDir("auto").getAbsolutePath)
    t.create(schema)
    t.setProperty(TxLog.CheckpointFormatProp, "auto")
    t.setProperty(TxLog.CheckpointAutoMinAddsProp, "4")
    // the auto property alone must gate the reader feature: a json-only
    // reader has to fail by NAME before the flip ever happens
    val propCommit = new String(Files.readAllBytes(Paths.get(t.tablePath,
      "_graft_log", f"${2L}%020d.json")), "UTF-8")
    assert(propCommit.contains("parquetCheckpoint"),
      s"auto must gate the parquetCheckpoint feature upfront:\n$propCommit")
    val logDir = Paths.get(t.tablePath, "_graft_log")
    (1 to 2).foreach(i => t.append(Seq((i.toLong, i * 0.5)).toDF("id", "x")))
    val cvSmall = t.checkpoint() // 2 live files < 4 → JSON
    assert(Files.exists(logDir.resolve(f"$cvSmall%020d.checkpoint.json")),
      "below the threshold auto writes JSON")
    (3 to 6).foreach(i => t.append(Seq((i.toLong, i * 0.5)).toDF("id", "x")))
    val cvBig = t.checkpoint() // 6 live files >= 4 → parquet, transparently
    assert(Files.exists(logDir.resolve(f"$cvBig%020d.checkpoint.parquet")),
      "past the threshold auto flips to parquet")
    // both eras resolve; reads stack across the mixed formats
    assert(t.snapshot().files.size === 6)
    assert(t.snapshot(cvSmall).files.size === 2, "json-era travel intact")
    assert(t.read(spark).count() === 6L)
    // truncation sweeps across the format mix: the json checkpoint and
    // its subsumed commits drop, the parquet head keeps resolving
    val dropped = t.truncateLog(retainVersions = 1)
    assert(dropped.contains(f"$cvSmall%020d.checkpoint.json"),
      s"old json checkpoint must sweep: $dropped")
    assert(t.snapshot().files.size === 6)
    // property validation: junk threshold refuses
    intercept[IllegalArgumentException](
      t.setProperty(TxLog.CheckpointAutoMinAddsProp, "many"))
  }

  test("truncateLog sweeps commits subsumed by a parquet checkpoint") {
    val t = new GraftTable(freshDir("trunc").getAbsolutePath)
    t.create(schema)
    t.setProperty(TxLog.CheckpointFormatProp, "parquet")
    (1 to 5).foreach(i => t.append(Seq((i.toLong, i * 0.5)).toDF("id", "x")))
    val head = t.latestVersion()                                  // 7
    t.checkpoint()
    val dropped = t.truncateLog(retainVersions = 1)
    assert(dropped.nonEmpty, "commits at/below the checkpoint must drop")
    // the head still resolves purely from the parquet artifact
    assert(t.latestVersion() === head)
    assert(t.snapshot().files.size === 5)
    assert(t.read(spark).count() === 5L)
  }
}
