package graft

import graft.medallion.GraftTable
import graft.streaming.TableSink
import org.apache.spark.sql.functions._

/** The graft-table streaming source: version-offset tailing, and the
  * full table-to-table pipeline (source table → transform → TableSink)
  * with exactly-once across restarts — both ledgers (streaming
  * checkpoint offsets, destination txn ledger) doing their half. */
class GraftTableSourceSpec extends SparkSpec {

  private def freshRoot() = new java.io.File(
    s"target/tmp/tblsource_${java.util.UUID.randomUUID().toString.take(8)}")

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("id", "payload")
  }

  test("a chained source→sink pipeline lands appends exactly-once across restarts") {
    val root = freshRoot()
    val srcPath = new java.io.File(root, "bronze").getAbsolutePath
    val dstPath = new java.io.File(root, "silver").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath

    val src = new GraftTable(srcPath)
    src.append(df(Seq(1L -> "a", 2L -> "b"))) // v1

    def runPipeline(): Unit = {
      val stream = spark.readStream.format("graft-table")
        .option("path", srcPath).load()
        .withColumn("payload", upper(col("payload")))
      TableSink.start(stream, dstPath, "b2s", ckpt).awaitTermination()
    }

    runPipeline()
    val dst = new GraftTable(dstPath)
    assert(dst.read(spark).select("id", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
      === Map(1L -> "A", 2L -> "B"))

    // new appends on the source; SAME checkpoint + appId on restart:
    // only the new rows flow, tagged with their source commit version
    src.append(df(Seq(3L -> "c"))) // v2
    src.append(df(Seq(4L -> "d"))) // v3
    runPipeline()
    val rows = dst.read(spark)
      .select("id", "payload", "_commit_version").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(rows === Map(
      1L -> (("A", 1L)), 2L -> (("B", 1L)),
      3L -> (("C", 2L)), 4L -> (("D", 3L))))

    // an idle restart (no new source commits) must move nothing
    val versionBefore = dst.snapshot().version
    runPipeline()
    assert(dst.snapshot().version === versionBefore)
    assert(dst.read(spark).count() === 4L)
  }

  test("startingVersion skips history for fresh queries, is ignored once checkpointed") {
    val root = freshRoot()
    val srcPath = new java.io.File(root, "bronze").getAbsolutePath
    val dstPath = new java.io.File(root, "silver").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath

    val src = new GraftTable(srcPath)
    src.append(df(Seq(1L -> "old"))) // v1 — history to skip
    src.append(df(Seq(2L -> "new"))) // v2

    def run(): Unit = TableSink.start(
      spark.readStream.format("graft-table")
        .option("path", srcPath).option("startingVersion", "1").load(),
      dstPath, "sv", ckpt).awaitTermination()

    run()
    val dst = new GraftTable(dstPath)
    assert(dst.read(spark).select("id").collect().map(_.getLong(0)).toSet
      === Set(2L), "history at or before startingVersion must not flow")

    // once checkpointed, offsets rule: the next commit flows regardless
    src.append(df(Seq(3L -> "newer"))) // v3
    run()
    assert(dst.read(spark).select("id").collect().map(_.getLong(0)).toSet
      === Set(2L, 3L))
  }

  test("startingTimestamp resolves the tail start against commit stamps") {
    val root = freshRoot()
    val srcPath = new java.io.File(root, "bronze").getAbsolutePath
    val src = new GraftTable(srcPath)
    src.append(df(Seq(1L -> "old"))) // v1
    // capture the v1 commit's own stamp: starting AT it means
    // "changes since what the table held then" = v2 only
    val v1ts = src.historyFull().find(_._1 == 1L).get._5.get
    Thread.sleep(5)
    src.append(df(Seq(2L -> "new"))) // v2

    def run(tsOpt: String, tag: String): Set[Long] = {
      val dstPath = new java.io.File(root, s"silver_$tag").getAbsolutePath
      TableSink.start(
        spark.readStream.format("graft-table")
          .option("path", srcPath).option("startingTimestamp", tsOpt).load(),
        dstPath, s"st_$tag",
        new java.io.File(root, s"ckpt_$tag").getAbsolutePath)
        .awaitTermination()
      new GraftTable(dstPath).read(spark)
        .select("id").collect().map(_.getLong(0)).toSet
    }
    assert(run(v1ts.toString, "at") === Set(2L),
      "starting at v1's stamp must tail strictly after v1")
    // a pre-history instant means everything
    assert(run((v1ts - 1000000L).toString, "pre") === Set(1L, 2L))
    // both pins together refuse loudly
    val e = intercept[Exception](
      spark.readStream.format("graft-table").option("path", srcPath)
        .option("startingVersion", "1")
        .option("startingTimestamp", v1ts.toString).load())
    assert(e.getMessage.contains("not both"))
  }

  test("batch read via format('graft-table'): snapshot rows, filters pushed to file pruning") {
    import graft.streaming.GraftTableV2
    import org.apache.spark.sql.sources.{And, EqualTo, GreaterThan, IsNotNull, LessThanOrEqual, Or}
    val root = freshRoot()
    val path = new java.io.File(root, "tbl").getAbsolutePath
    val t = new GraftTable(path)
    // three single-file commits with disjoint id ranges
    import spark.implicits._
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "payload").repartition(1))
    t.append(Seq((10L, "c"), (11L, "d")).toDF("id", "payload").repartition(1))
    t.append(Seq((20L, "e")).toDF("id", "payload").repartition(1))

    val df = spark.read.format("graft-table").option("path", path).load()
    // the DSv2 read schema: committed columns + the provenance tag
    assert(df.schema.fieldNames.toSeq === Seq("id", "payload", "_commit_version"))
    assert(df.count() === 5L)
    // residual row filtering stays correct (filters re-applied by Spark)
    assert(df.filter(col("id") >= 10L && col("id") < 20L)
      .select("id").collect().map(_.getLong(0)).toSet === Set(10L, 11L))
    // column pruning path
    assert(df.select("payload").collect().map(_.getString(0)).toSet
      === Set("a", "b", "c", "d", "e"))
    // provenance: each row tagged with the commit that added it
    assert(df.select("id", "_commit_version").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
      === Map(1L -> 1L, 2L -> 1L, 10L -> 2L, 11L -> 2L, 20L -> 3L))
    // ...and _commit_version bounds prune at metadata (an incremental
    // "rows since commit N" read from plain SQL)
    assert(df.filter(col("_commit_version") > 2L)
      .select("id").collect().map(_.getLong(0)).toSet === Set(20L))

    // the pushdown machinery itself: bounds derivation + file pruning
    assert(GraftTableV2.bounds(And(GreaterThan("id", 9L), LessThanOrEqual("id", 11L)))
      === Seq(("id", Some(9L), None), ("id", None, Some(11L))))
    assert(GraftTableV2.bounds(Or(EqualTo("id", 1L), EqualTo("id", 2L))).isEmpty,
      "disjunctions must not prune")
    assert(GraftTableV2.bounds(IsNotNull("id")).isEmpty)
    assert(t.filesForRange("id", Some(10L), Some(11L)) === 1,
      "stats must isolate the middle file for the range")
  }

  test("batch scan is vectorized with filters pushed into the parquet reader") {
    val root = freshRoot()
    val path = new java.io.File(root, "tbl").getAbsolutePath
    val t = new GraftTable(path)
    import spark.implicits._
    t.append((1L to 1000L).map(i => (i, s"p$i")).toDF("id", "payload"))

    val q = spark.read.format("graft-table").option("path", path).load()
      .filter(col("id") >= 100L && col("id") <= 200L)
      .select("id", "payload")
    val plan = q.queryExecution.executedPlan
    val batchScans = plan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(batchScans.nonEmpty, s"expected a DSv2 BatchScanExec, got:\n$plan")
    // no-provenance projection takes the delegated parquet fast path:
    // columnar batches straight into whole-stage codegen
    assert(batchScans.head.supportsColumnar,
      "fast-path scan must hand Spark columnar parquet batches")
    // the pushed filters reach the inner parquet scan (row-group skipping)
    val desc = batchScans.head.scan.description()
    assert(desc.contains("GreaterThanOrEqual(id,100)") && desc.contains("LessThanOrEqual(id,200)"),
      s"data filters must be pushed into the parquet reader, scan was: $desc")
    assert(q.collect().map(_.getLong(0)).toSet === (100L to 200L).toSet)
  }

  test("_commit_version scans stay COLUMNAR (constant vector); a DV stays columnar too — same tags") {
    val root = freshRoot()
    val path = new java.io.File(root, "tbl").getAbsolutePath
    val t = new GraftTable(path)
    import spark.implicits._
    t.append((1L to 100L).map(i => (i, s"p$i")).toDF("id", "payload").coalesce(1))
    t.append((101L to 200L).map(i => (i, s"p$i")).toDF("id", "payload").coalesce(1))
    def q() = spark.read.format("graft-table").option("path", path).load()
      .select(col("id"), col("_commit_version"))
    def supportsColumnar(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.head.supportsColumnar
    // provenance used to force the row path; the constant version
    // vector keeps vectorized parquet decode (the COW rewrite scan's
    // projection shape)
    assert(supportsColumnar(q()),
      "a DV-free _commit_version scan must stay columnar")
    val tags = q().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 100L).foreach(i => assert(tags(i) === 1L))
    (101L to 200L).foreach(i => assert(tags(i) === 2L))
    // round 16: a deletion vector no longer forces uniform row
    // partitions — the DV'd file serves columnar through the
    // SelectedColumnVector remap and the clean sibling keeps its
    // vectorized fast path; tags unchanged
    t.deleteRows(spark, "id = 50")
    assert(supportsColumnar(q()),
      "a DV'd provenance scan must stay columnar (remap + constant tag)")
    val after = q().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!after.contains(50L) && after(51L) === 1L && after(150L) === 2L)
  }

  test("count(*) over the DSv2 read uses the log's exact statistics") {
    val root = freshRoot()
    val path = new java.io.File(root, "tbl").getAbsolutePath
    val t = new GraftTable(path)
    import spark.implicits._
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "payload"))
    val rel = spark.read.format("graft-table").option("path", path).load()
    // SupportsReportStatistics: the optimizer sees exact log totals, so
    // a small graft table is broadcast-eligible without a size scan
    val stats = rel.queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes > 0 && stats.sizeInBytes < 1024 * 1024,
      s"expected log-reported size, got ${stats.sizeInBytes}")
    assert(rel.count() === 2L)
  }

  test("runtime (join) filters prune files before a byte is read — the DPP analogue") {
    import graft.streaming.{GraftScan, GraftTableV2}
    import org.apache.spark.sql.sources.{Filter, In}
    val root = freshRoot()
    val path = new java.io.File(root, "tbl").getAbsolutePath
    val t = new GraftTable(path)
    import spark.implicits._
    // three single-file commits with disjoint id ranges
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "payload").repartition(1))
    t.append(Seq((10L, "c"), (11L, "d")).toDF("id", "payload").repartition(1))
    t.append(Seq((20L, "e")).toDF("id", "payload").repartition(1))

    val fullSchema = GraftTableV2.readSchemaOf(path)
    def scan() = new GraftScan(
      spark, path, fullSchema, fullSchema, Array.empty,
      snapVersion = t.latestVersion(), skipRewrites = false, startingVersion = 0L)

    // a join's build-side key set arrives at runtime as an In-filter:
    // only the files whose stats can contain a member survive
    val unfiltered = scan().toBatch.planInputPartitions().length
    val s2 = scan()
    s2.filter(Array[Filter](In("id", Array(10L, 11L))))
    val filtered = s2.toBatch.planInputPartitions().length
    assert(unfiltered === 3 && filtered === 1,
      s"In(10,11) must isolate the middle file (got $unfiltered -> $filtered)")
    // the scan advertises its filterable columns to the planner
    assert(scan().filterAttributes().map(_.describe()).toSet
      === Set("id", "payload", "_commit_version"))
    // ...and a runtime filter on the PROVENANCE column prunes by commit
    val s3 = scan()
    s3.filter(Array[Filter](In("_commit_version", Array(3L))))
    assert(s3.toBatch.planInputPartitions().length === 1)

    // end to end: a broadcast join over the DSv2 read stays correct
    val dim = Seq((10L, "x"), (11L, "y")).toDF("id", "tag")
    val fact = spark.read.format("graft-table").option("path", path).load()
    val joined = fact.join(broadcast(dim), "id")
      .select("id", "payload", "tag").collect()
    assert(joined.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      === Set((10L, "c", "x"), (11L, "d", "y")))
  }

  test("versionAsOf time travel: past snapshot, then-current schema, streaming refused") {
    val root = freshRoot()
    val path = new java.io.File(root, "tbl").getAbsolutePath
    val t = new GraftTable(path)
    import spark.implicits._
    t.append(df(Seq(1L -> "a")))                                    // v1
    t.append(Seq((2L, "b", 7L)).toDF("id", "payload", "extra"),
      mergeSchema = true, maxRetries = 20)                          // v2: widen
    t.append(Seq((3L, "c", 8L)).toDF("id", "payload", "extra"),
      mergeSchema = true, maxRetries = 20)                          // v3

    def read(v: Long) = spark.read.format("graft-table")
      .option("path", path).option("versionAsOf", v.toString).load()

    // v1: pre-widening schema — no phantom null column
    assert(read(1L).schema.fieldNames.toSeq === Seq("id", "payload", "_commit_version"))
    assert(read(1L).select("id").collect().map(_.getLong(0)).toSet === Set(1L))
    // v2: the widened schema, v1's rows null-backfilled
    val v2 = read(2L).select("id", "extra").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(v2 === Map(1L -> -1L, 2L -> 7L))
    // head unchanged
    assert(spark.read.format("graft-table").option("path", path).load().count() === 3L)
    // a version that never committed fails loudly
    val e = intercept[IllegalArgumentException](read(99L).collect())
    assert(e.getMessage.contains("does not exist"))
    // time travel cannot tail: the table refuses streaming capability
    val stream = intercept[Exception] {
      spark.readStream.format("graft-table")
        .option("path", path).option("versionAsOf", "1").load()
    }
    assert(stream.getMessage.toLowerCase.contains("stream"),
      s"expected a streaming-capability refusal, got: ${stream.getMessage}")
  }

  test("batch read: NaN filters don't crash pruning; a missing table fails loudly") {
    import spark.implicits._
    val root = freshRoot()
    val path = new java.io.File(root, "tbl").getAbsolutePath
    val t = new GraftTable(path)
    t.append(Seq((1L, 1.5), (2L, Double.NaN)).toDF("id", "x"))

    val df = spark.read.format("graft-table").option("path", path).load()
    // a pushed-down NaN bound must be DROPPED from pruning (stats cannot
    // answer it), with Spark's residual filter giving the right rows
    assert(df.filter(col("x").isNaN).count() === 1L)
    assert(df.filter(col("x") >= Double.NegativeInfinity).count() === 2L)
    assert(df.filter(col("x") === 1.5).count() === 1L)

    // a typo'd path is an error, not an empty table. The check fires at
    // scan building (first action) — schema inference stays lenient
    // because the WRITE path probes it before the table exists.
    val e = intercept[Exception] {
      spark.read.format("graft-table")
        .option("path", s"$path-typo").load().collect()
    }
    assert(e.getMessage.contains("no committed table"))
  }

  test("df.write.format('graft-table'): append/overwrite/mergeSchema/SaveMode contracts") {
    import org.apache.spark.sql.SaveMode
    val root = freshRoot()
    val path = new java.io.File(root, "tbl").getAbsolutePath
    import spark.implicits._

    def write(rows: Seq[(Long, String)], mode: SaveMode,
        opts: Map[String, String] = Map.empty) = {
      val w = rows.toDF("id", "payload").write.format("graft-table")
        .option("path", path).mode(mode)
      opts.foldLeft(w) { case (b, (k, v)) => b.option(k, v) }.save()
    }

    write(Seq(1L -> "a"), SaveMode.Append)                  // v1 creates
    write(Seq(2L -> "b"), SaveMode.Append)                  // v2
    val t = new GraftTable(path)
    assert(t.latestVersion() === 2L)
    assert(t.read(spark).select("id").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L))
    // the commits went through the log (provenance proves it)
    val prov = spark.read.format("graft-table").option("path", path).load()
      .select("id", "_commit_version").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prov === Map(1L -> 1L, 2L -> 2L))

    // mergeSchema widening via a write option
    Seq((3L, "c", 9L)).toDF("id", "payload", "extra").write
      .format("graft-table").option("path", path)
      .option("mergeSchema", "true").mode(SaveMode.Append).save()
    assert(t.snapshot().schema.fieldNames.toSeq === Seq("id", "payload", "extra"))

    // SaveMode contracts against an existing table
    intercept[IllegalStateException](write(Seq(9L -> "x"), SaveMode.ErrorIfExists))
    write(Seq(9L -> "x"), SaveMode.Ignore) // no-op
    assert(t.read(spark).count() === 3L)
    // overwrite replaces the table in one CAS commit
    write(Seq(7L -> "z"), SaveMode.Overwrite)
    assert(t.read(spark).select("id").collect().map(_.getLong(0)).toSet === Set(7L))
  }

  test("writeStream.format('graft-table') commits exactly-once through the txn ledger") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val root = freshRoot()
    val path = new java.io.File(root, "tbl").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath

    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "a"), (2L, "b"))
    val q = mem.toDF().toDF("id", "payload")
      .writeStream.format("graft-table")
      .option("path", path).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val t = new GraftTable(path)
    assert(t.read(spark).select("id").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L))
    // replaying the SAME batch id through the ledger is a no-op: the
    // sink's exactly-once contract, directly on the format surface
    val before = t.latestVersion()
    val sink = new graft.streaming.GraftTableProvider().createSink(
      spark.sqlContext, Map("path" -> path, "appId" -> ckpt),
      Seq.empty, org.apache.spark.sql.streaming.OutputMode.Append())
    sink.addBatch(0L, Seq((1L, "dup"), (2L, "dup")).toDF("id", "payload"))
    assert(t.latestVersion() === before, "replayed batch 0 must not commit")
    assert(t.read(spark).count() === 2L)
  }

  test("SQL DDL surface: CREATE TEMPORARY VIEW ... USING `graft-table` serves plain SQL") {
    val root = freshRoot()
    val path = new java.io.File(root, "tbl").getAbsolutePath
    val t = new GraftTable(path)
    t.append(df(Seq(1L -> "a", 2L -> "b")))  // v1
    t.append(df(Seq(3L -> "c")))             // v2
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW graft_sql_tv USING `graft-table` OPTIONS (path '$path')")
    try {
      // plain SQL reads the transactional snapshot through the DSv2 scan,
      // provenance column included
      val rows = spark.sql(
        "SELECT id, payload, _commit_version FROM graft_sql_tv ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(rows.toSeq === Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 2L)))
      // and filters/aggregates push through the same scan machinery
      assert(spark.sql(
        "SELECT count(*) FROM graft_sql_tv WHERE _commit_version = 1")
        .head().getLong(0) === 2L)
    } finally spark.catalog.dropTempView("graft_sql_tv")
  }

  test("a batch read is snapshot-pinned: concurrent commits never tear multi-action reads") {
    val root = freshRoot()
    val path = new java.io.File(root, "tbl").getAbsolutePath
    val t = new GraftTable(path)
    t.append(df(Seq(1L -> "a", 2L -> "b"))) // v1

    val pinned = spark.read.format("graft-table").option("path", path).load()
    assert(pinned.count() === 2L)
    // a commit lands AFTER the relation resolved
    t.append(df(Seq(3L -> "c"))) // v2
    // every further action on the SAME frame reads the SAME snapshot —
    // the count cannot drift mid-query-plan reuse
    assert(pinned.count() === 2L)
    assert(pinned.select("id").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    // ...and equals the programmatic API's read of that version exactly
    val api = t.read(spark, version = 1L)
      .select("id", "payload").collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    val v2f = pinned.select("id", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(api === v2f)
    // a FRESH relation sees the new head
    assert(spark.read.format("graft-table").option("path", path).load().count() === 3L)
  }

  test("COUNT/MIN/MAX push completely into the commit log: zero data bytes scanned") {
    import spark.implicits._
    val root = freshRoot()
    val path = new java.io.File(root, "tbl").getAbsolutePath
    val t = new GraftTable(path)
    t.append(Seq((5L, "m", 1.5), (2L, "a", 2.5)).toDF("id", "name", "x"))  // v1
    t.append(Seq((9L, "z", -0.5)).toDF("id", "name", "x"))                 // v2

    def rel = spark.read.format("graft-table").option("path", path).load()

    val q = rel.agg(
      count(lit(1)).as("n"), min(col("id")).as("mn"), max(col("id")).as("mx"),
      min(col("name")).as("smn"), max(col("x")).as("xmx"),
      max(col("_commit_version")).as("vmx"))
    // the plan is a LOCAL scan of the one metadata row — no file read,
    // no BatchScan, at any table size (string check: AQE wraps the tree
    // in AdaptiveSparkPlanExec, which collect() does not descend into)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchScan"),
      s"metadata aggregate must not plan a data scan:\n$plan")
    assert(plan.contains("metadata-only aggregate") || plan.contains("LocalTableScan"),
      s"expected the pushed LocalScan in:\n$plan")
    val r = q.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
      r.getDouble(4), r.getLong(5)) === ((3L, 2L, 9L, "a", 2.5, 2L)))

    // filters disable the pushdown (rows must actually be read) and the
    // answer stays right
    assert(rel.filter(col("id") > 2L).count() === 2L)

    // a NaN-bearing file writes no stats for x: min/max(x) must fall
    // back to a real scan, never a wrong metadata answer
    t.append(Seq((1L, "q", Double.NaN)).toDF("id", "name", "x"))          // v3
    val nanAgg = rel.agg(max(col("x")).as("xmx"))
    assert(nanAgg.queryExecution.executedPlan.toString.contains("BatchScan"),
      "float/double with a stats-less file must scan")
    assert(nanAgg.head().getDouble(0).isNaN)
    // ...while count(*) and the long column still push from metadata
    assert(!rel.agg(count(lit(1))).queryExecution.executedPlan.toString
      .contains("BatchScan"))
    assert(rel.count() === 4L)
  }

  test("GROUP BY a per-file-constant column answers from the commit log; mixed files fall back") {
    import spark.implicits._
    val root = freshRoot()
    val path = new java.io.File(root, "tbl").getAbsolutePath
    val t = new GraftTable(path)
    // partitioned-ingest layout: each append single-valued on `dt`
    // x is Long, not Double: COUNT over float/double stays scan-bound
    // whenever any file lacks stats (NaN indistinguishable from all-null)
    t.append(Seq(("a", 1L, Some(10L)), ("a", 2L, None)).toDF("dt", "id", "x"))    // v1
    t.append(Seq(("b", 3L, Some(30L))).toDF("dt", "id", "x"))                     // v2
    t.append(Seq(("a", 9L, Some(90L))).toDF("dt", "id", "x"))                     // v3
    t.append(Seq((null.asInstanceOf[String], 7L, Some(70L))).toDF("dt", "id", "x")) // v4: NULL group

    def rel = spark.read.format("graft-table").option("path", path).load()
    val q = rel.groupBy(col("dt")).agg(
      count(lit(1)).as("n"), count(col("x")).as("nx"),
      min(col("id")).as("mn"), max(col("id")).as("mx"),
      max(col("_commit_version")).as("vmx"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchScan"),
      s"grouped metadata aggregate must not plan a data scan:\n$plan")
    val got = q.collect().map(r => Option(r.getString(0)) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === Map(
      Some("a") -> ((3L, 2L, 1L, 9L, 3L)),
      Some("b") -> ((1L, 1L, 3L, 3L, 2L)),
      None -> ((1L, 1L, 7L, 7L, 4L))))

    // COUNT(col) pushes ungrouped too, exact across the null in v1
    val cq = rel.agg(count(col("x")).as("nx"), count(col("dt")).as("nd"))
    assert(!cq.queryExecution.executedPlan.toString.contains("BatchScan"))
    assert(cq.head() === org.apache.spark.sql.Row(4L, 4L))

    // a file that mixes dt values breaks per-file-constancy: same
    // answer, but through a real scan
    t.append(Seq(("a", 11L, Some(1L)), ("b", 12L, None)).toDF("dt", "id", "x")
      .repartition(1))                                                           // v5
    val q2 = rel.groupBy(col("dt")).agg(count(lit(1)).as("n"))
    assert(q2.queryExecution.executedPlan.toString.contains("BatchScan"),
      "mixed-value file must force a data scan")
    assert(q2.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
      === Map(Some("a") -> 4L, Some("b") -> 2L, None -> 1L))
    // ...and grouping by _commit_version still never needs the data
    val q3 = rel.groupBy(col("_commit_version")).agg(count(lit(1)).as("n"))
    assert(!q3.queryExecution.executedPlan.toString.contains("BatchScan"))
    assert(q3.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      === Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 2L))
  }

  test("maxVersionsPerTrigger drains a backlog in capped micro-batches, exactly-once") {
    val root = freshRoot()
    val srcPath = new java.io.File(root, "bronze").getAbsolutePath
    val dstPath = new java.io.File(root, "silver").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    val src = new GraftTable(srcPath)
    (1L to 4L).foreach(i => src.append(df(Seq(i -> s"p$i"))))   // v1..v4 backlog

    val stream = spark.readStream.format("graft-table")
      .option("path", srcPath).option("maxVersionsPerTrigger", "1").load()
    TableSink.start(stream, dstPath, "capped", ckpt).awaitTermination()

    val dst = new GraftTable(dstPath)
    // one sink commit per capped micro-batch: the 4-version backlog
    // landed as 4 batches, not one — and still exactly-once
    assert(dst.latestVersion() === 4L,
      "each source version must arrive in its own micro-batch")
    assert(dst.read(spark).select("id", "_commit_version").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
      === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))

    // a restart with no new input moves nothing
    TableSink.start(
      spark.readStream.format("graft-table")
        .option("path", srcPath).option("maxVersionsPerTrigger", "1").load(),
      dstPath, "capped", ckpt).awaitTermination()
    assert(dst.latestVersion() === 4L)

    // invalid cap fails loudly, never a silent unthrottled run
    intercept[Exception] {
      TableSink.start(
        spark.readStream.format("graft-table")
          .option("path", srcPath).option("maxVersionsPerTrigger", "0").load(),
        dstPath, "bad", new java.io.File(root, "ckpt2").getAbsolutePath)
        .awaitTermination()
    }

    // a huge cap saturates at head instead of overflowing negative
    import graft.streaming.{GraftMicroBatchStream, GraftVersionOffset}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val hugeCap = new GraftMicroBatchStream(
      spark, src, src.snapshot(-1).schema, src.snapshot(-1).schema, Seq.empty,
      skipRewrites = false, startingVersion = 0L,
      maxVersionsPerTrigger = Some(Long.MaxValue))
    assert(hugeCap.latestOffset(GraftVersionOffset(1L), ReadLimit.allAvailable())
      .asInstanceOf[GraftVersionOffset].version === src.latestVersion())
  }

  test("an unfiltered LIMIT plans only enough files to cover it") {
    import graft.streaming.GraftScan
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import spark.implicits._
    val root = freshRoot()
    val path = new java.io.File(root, "tbl").getAbsolutePath
    val t = new GraftTable(path)
    (1 to 5).foreach(i => t.append(
      (1L to 100L).map(j => (i * 1000L + j, s"p$j")).toDF("id", "payload")
        .repartition(1)))                               // 5 files × 100 rows

    def rel = spark.read.format("graft-table").option("path", path).load()
    def graftScan(q: org.apache.spark.sql.DataFrame): GraftScan =
      graft.plans.AdaptivePlans.collectDeep(q) {
        case b: BatchScanExec => b.scan }.head.asInstanceOf[GraftScan]

    val q = rel.limit(250)
    assert(graftScan(q).currentFiles().size === 3,
      "250 rows need ceil(250/100)=3 of the 5 files")
    assert(q.count() === 250L)
    assert(graftScan(rel.limit(1)).currentFiles().size === 1)
    assert(rel.limit(1).collect().length === 1)
    // more than the table holds: every file, every row
    assert(graftScan(rel.limit(10000)).currentFiles().size === 5)
    assert(rel.limit(10000).count() === 500L)
    // a filtered LIMIT must refuse the pushdown: filters are residual,
    // so a row-count truncation could under-produce
    val filtered = rel.filter(col("id") > 3150L).limit(10)
    assert(graftScan(filtered).currentFiles().size === 2,
      "file pruning by the filter, NOT by the limit")
    assert(filtered.count() === 10L)
  }

  test("null-count stats prune files on IS NULL / IS NOT NULL") {
    import graft.streaming.GraftTableV2
    import org.apache.spark.sql.sources.{IsNotNull, IsNull}
    import spark.implicits._
    val root = freshRoot()
    val path = new java.io.File(root, "tbl").getAbsolutePath
    val t = new GraftTable(path)
    t.append(Seq((1L, Some("a")), (2L, Some("b"))).toDF("id", "s"))     // v1: s never null
    t.append(Seq((3L, None), (4L, None)).map(x => (x._1, x._2: Option[String]))
      .toDF("id", "s").repartition(1))                                  // v2: s all null
    t.append(Seq((5L, Some("c")), (6L, None)).toDF("id", "s")
      .repartition(1))                                                  // v3: mixed

    val snap = t.snapshot(-1)
    val schema = snap.schema
    def survivors(f: org.apache.spark.sql.sources.Filter): Int =
      snap.files.count(a => GraftTableV2.fileSurvives(
        t, schema, a, snap.addedIn.getOrElse(a.path, snap.version), f))
    val nFiles = snap.files.size
    val filesOf = snap.files.groupBy(a => snap.addedIn.getOrElse(a.path, snap.version))
    // IS NULL skips the zero-null v1 files; IS NOT NULL skips the
    // all-null v2 file; the mixed v3 file survives both
    assert(survivors(IsNull("s")) === nFiles - filesOf(1L).size,
      "v1's zero-null files must prune")
    assert(survivors(IsNotNull("s")) === nFiles - filesOf(2L).size,
      "v2's all-null file must prune")
    // provenance pseudo-column is never null
    assert(survivors(IsNull("_commit_version")) === 0)
    assert(survivors(IsNotNull("_commit_version")) === nFiles)

    // end-to-end: results are right THROUGH the pruned scans
    def rel = spark.read.format("graft-table").option("path", path).load()
    assert(rel.filter(col("s").isNull).select("id").collect().map(_.getLong(0)).toSet
      === Set(3L, 4L, 6L))
    assert(rel.filter(col("s").isNotNull).select("id").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 5L))

    // schema evolution: files from before a column existed have no
    // stats for it — `new_col IS NOT NULL` must skip ALL of them
    t.append(Seq((7L, Some("d"), 70L)).toDF("id", "s", "extra"),
      mergeSchema = true, maxRetries = 20)                              // v4
    val snap2 = t.snapshot(-1)
    val pre = snap2.files.count(a => !GraftTableV2.fileSurvives(
      t, snap2.schema, a, snap2.addedIn.getOrElse(a.path, snap2.version),
      IsNotNull("extra")))
    assert(pre === nFiles, "every pre-evolution file must prune on IS NOT NULL(extra)")
    assert(rel.filter(col("extra").isNotNull).select("id").collect()
      .map(_.getLong(0)).toSet === Set(7L))
  }

  test("compaction never disturbs a tailing consumer; a rewrite fails it loudly") {
    val root = freshRoot()
    val srcPath = new java.io.File(root, "bronze").getAbsolutePath
    val dstPath = new java.io.File(root, "silver").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath

    val src = new GraftTable(srcPath)
    src.append(df(Seq(1L -> "a"))) // v1
    src.append(df(Seq(2L -> "b"))) // v2

    def runPipeline(): Unit = {
      val stream = spark.readStream.format("graft-table")
        .option("path", srcPath).load()
      TableSink.start(stream, dstPath, "b2s", ckpt).awaitTermination()
    }
    runPipeline()

    src.compact(spark) // v3 — row-neutral
    src.append(df(Seq(3L -> "c"))) // v4
    runPipeline()
    val dst = new GraftTable(dstPath)
    assert(dst.read(spark).select("id").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 3L), "compaction must not re-emit rows 1/2")

    // an upsert on the tailed table poisons appends-only consumption:
    // the stream must FAIL, not silently skip the change
    import spark.implicits._
    src.upsert(Seq((2L, "B!", false, 1L)).toDF("id", "payload", "_deleted", "_seq"),
      "id", "_seq") // v5
    src.append(df(Seq(4L -> "d"))) // v6
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runPipeline()
    }
    assert(e.getMessage.contains("upsert") ||
      Option(e.getCause).exists(_.getMessage.contains("upsert")))
  }

  test("autoCompact sink option pays the small-file debt as it accrues, exactly-once intact") {
    import spark.implicits._
    val root = freshRoot()
    val path = new java.io.File(root, "ac").getAbsolutePath
    val sink = new graft.streaming.GraftTableProvider().createSink(
      spark.sqlContext,
      Map("path" -> path, "appId" -> "ac-app",
        "autoCompact" -> "true", "autoCompactMinFiles" -> "5"),
      Seq.empty, org.apache.spark.sql.streaming.OutputMode.Append())
    // 12 tiny single-row batches; without compaction that is >= 12 files
    (0 until 12).foreach { b =>
      sink.addBatch(b.toLong,
        Seq((b.toLong, s"row$b")).toDF("id", "payload").coalesce(1))
    }
    val t = new GraftTable(path)
    // every row exactly once, regardless of when compacts interleaved
    assert(t.read(spark).select("id").collect().map(_.getLong(0)).toSet ==
      (0L until 12L).toSet)
    val files = t.snapshot().files.size
    assert(files < 7, s"auto-compaction must bound the live file count (got $files)")
    // a replayed batch still no-ops through the ledger (compacts carried the txn map)
    val before = t.latestVersion()
    sink.addBatch(5L, Seq((99L, "dup")).toDF("id", "payload"))
    assert(t.latestVersion() == before, "replayed batch must not commit")
  }
}
