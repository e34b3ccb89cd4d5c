package graft

import graft.medallion.GraftTable
import graft.streaming.GraftCatalog

/** The SQL maintenance surface: CALL graft.system.{optimize, vacuum,
  * restore, clone, checkpoint} — every lifecycle operation of the table
  * format reachable without leaving SQL, each a thin shim over the same
  * transactional primitive the Scala API uses, plus TIMESTAMP AS OF
  * time travel resolved from the commit-time stamps the log now
  * records. */
class GraftProceduresSpec extends SparkSpec {

  private def freshWarehouse(): String =
    new java.io.File(
      s"target/tmp/proc_${java.util.UUID.randomUUID().toString.take(8)}")
      .getAbsolutePath

  private def withCatalog(testBody: (String, String) => Unit): Unit = {
    val wh = freshWarehouse()
    val cat = s"gp${java.util.UUID.randomUUID().toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try testBody(cat, wh)
    finally spark.conf.unset(s"spark.sql.catalog.$cat")
  }

  test("CALL system.optimize compacts many small files into few, row-identical") {
    import spark.implicits._
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v STRING)")
      val t = new GraftTable(s"$wh/db/t")
      (1 to 6).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))
      val before = spark.sql(s"SELECT * FROM $cat.db.t").collect().toSet
      val filesBefore = t.snapshot().files.size
      assert(filesBefore >= 6)
      val row = spark.sql(
        s"CALL $cat.system.optimize(table => 'db.t')").head()
      assert(row.getString(0) === "compact")
      assert(row.getInt(1) === filesBefore)
      assert(row.getInt(2) < filesBefore)
      assert(t.history().head._2 === "compact")
      assert(spark.sql(s"SELECT * FROM $cat.db.t").collect().toSet === before,
        "compact is row-neutral")
    }
  }

  test("CALL system.analyze reports log-derived column stats, zero scans") {
    import spark.implicits._
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.a (id BIGINT, v STRING, d DOUBLE)")
      spark.sql(s"ALTER TABLE $cat.db.a SET TBLPROPERTIES ('ndv.columns' = 'id')")
      spark.sql(s"ALTER TABLE $cat.db.a SET TBLPROPERTIES ('sum.columns' = 'id')")
      val t = new GraftTable(s"$wh/db/a")
      t.append((1L until 501L).map(i =>
        (i, if (i % 5 == 0) null else s"v$i", i / 10.0)).toDF("id", "v", "d"))
      t.append((401L until 901L).map(i =>
        (i, s"w$i", i / 10.0)).toDF("id", "v", "d"))
      val rows = spark.sql(s"CALL $cat.system.analyze(table => 'db.a')")
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            r.getString(3), r.getString(4))).toMap
      // id: sketched — NDV ≈ 900 distinct (401..500 overlap), 0 nulls
      val (idNdv, idNulls, idMin, idMax) = rows("id")
      assert(idNdv.exists(n => math.abs(n - 900L) <= 50L), s"id ndv $idNdv")
      assert(idNulls === Some(0L))
      assert(idMin === "1" && idMax === "900")
      // v: not sketched — NDV null; nulls exact (100 of the first 500)
      val (vNdv, vNulls, _, _) = rows("v")
      assert(vNdv === None && vNulls === Some(100L))
      // d: numeric min/max in the stats domain
      assert(rows("d")._3 === "0.1" && rows("d")._4 === "90.0")
      // id carries the exact log sum; unsummed columns report null
      val sums = spark.sql(s"CALL $cat.system.analyze(table => 'db.a')")
        .collect().map(r => r.getString(0) -> Option(r.getString(5))).toMap
      assert(sums("id") ===
        Some(((1L until 501L).sum + (401L until 901L).sum).toString))
      assert(sums("v") === None)
    }
  }

  test("CALL system.sync_identity re-bases the allocator after a reshape") {
    import spark.implicits._
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.i (id BIGINT, v STRING)")
      spark.sql(s"ALTER TABLE $cat.db.i SET TBLPROPERTIES ('identity.id' = '1')")
      val t = new GraftTable(s"$wh/db/i")
      t.append(Seq("a", "b").toDF("v"))
      t.overwrite(Seq((500L, "x")).toDF("id", "v")) // explicit reshape
      val row = spark.sql(
        s"CALL $cat.system.sync_identity(table => 'db.i', column => 'id')").head()
      assert(row.getString(0) === "id" && row.getLong(1) === 501L)
      t.append(Seq("y").toDF("v"))
      assert(t.read(spark).filter(org.apache.spark.sql.functions.col("v") === "y")
        .head().getLong(0) >= 501L)
      // unknown column refuses loudly
      intercept[Exception] { spark.sql(
        s"CALL $cat.system.sync_identity(table => 'db.i', column => 'v')").collect() }
    }
  }

  test("CALL system.optimize small_only leaves right-sized files untouched") {
    import spark.implicits._
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v STRING)")
      val t = new GraftTable(s"$wh/db/t")
      (1 to 5).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))
      // every test file is tiny, so with a huge threshold all qualify;
      // with target 0 MB none do (threshold 0 bytes) and no commit lands
      val head0 = t.latestVersion()
      val none = spark.sql(
        s"CALL $cat.system.optimize(table => 'db.t', small_only => true," +
          " target_file_mb => 0)").head()
      assert(none.getInt(1) === 0 && t.latestVersion() === head0,
        "no sub-threshold files -> no commit")
      val all = spark.sql(
        s"CALL $cat.system.optimize(table => 'db.t', small_only => true)").head()
      assert(all.getString(0) === "compact-small" && all.getInt(1) === 5)
    }
  }

  test("CALL system.optimize zorder_by clusters and stays row-identical") {
    import spark.implicits._
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.z (x BIGINT, y BIGINT)")
      val t = new GraftTable(s"$wh/db/z")
      t.append((1L to 256L).map(i => (i % 16, i / 16)).toDF("x", "y")
        .repartition(8))
      val before = spark.sql(s"SELECT * FROM $cat.db.z").collect().toSet
      val row = spark.sql(
        s"CALL $cat.system.optimize(table => 'db.z', zorder_by => 'x,y'," +
          " target_files => 4)").head()
      assert(row.getString(0) === "zorder")
      assert(t.history().head._2 === "zorder")
      assert(spark.sql(s"SELECT * FROM $cat.db.z").collect().toSet === before)
    }
  }

  test("CALL system.truncate_log drops pre-checkpoint history, window intact") {
    import spark.implicits._
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.lr (id BIGINT)")
      val t = new GraftTable(s"$wh/db/lr")
      (1 to 12).foreach(i => t.append(Seq(i.toLong).toDF("id")))
      spark.sql(s"CALL $cat.system.checkpoint(table => 'db.lr')")
      t.append(Seq(99L).toDF("id"))
      val head = t.latestVersion()
      val del = spark.sql(
        s"CALL $cat.system.truncate_log(table => 'db.lr', retain_versions => 2)")
        .head()
      assert(del.getInt(0) >= 1, "pre-checkpoint commits must truncate")
      // head + trailing window still read exactly
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.lr").head().getLong(0) === 13L)
      assert(t.snapshot(head - 1).version === head - 1)
      // far-behind resolution is loudly gone
      intercept[Exception](t.snapshot(2L))
    }
  }

  test("CALL system.restore + vacuum + checkpoint round trip in SQL") {
    import spark.implicits._
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.r (id BIGINT)")
      val t = new GraftTable(s"$wh/db/r")
      t.append(Seq(1L, 2L).toDF("id"))   // v2
      val goodV = t.latestVersion()
      t.append(Seq(99L).toDF("id"))      // v3 (the "bad load")
      val res = spark.sql(
        s"CALL $cat.system.restore(table => 'db.r', version => $goodV)").head()
      assert(res.getLong(0) === goodV)
      assert(spark.sql(s"SELECT id FROM $cat.db.r").collect()
        .map(_.getLong(0)).toSet === Set(1L, 2L))
      // checkpoint then vacuum through SQL; the table still reads
      val cp = spark.sql(s"CALL $cat.system.checkpoint(table => 'db.r')").head()
      assert(cp.getLong(0) === t.latestVersion())
      // advance head once more so the bad version leaves the retention
      // window, then vacuum drops its file
      t.append(Seq(3L).toDF("id"))
      val del = spark.sql(
        s"CALL $cat.system.vacuum(table => 'db.r', retain_versions => 1)").head()
      assert(del.getInt(0) >= 1, "the un-restored v3 file is unreachable now")
      assert(spark.sql(s"SELECT id FROM $cat.db.r").collect()
        .map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
    }
  }

  test("CALL system.clone forks a self-contained table") {
    import spark.implicits._
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.src (id BIGINT)")
      val t = new GraftTable(s"$wh/db/src")
      t.append(Seq(1L, 2L, 3L).toDF("id"))
      val row = spark.sql(
        s"CALL $cat.system.clone(source => 'db.src', target => 'db.fork')").head()
      assert(row.getLong(0) === t.latestVersion())
      assert(spark.sql(s"SELECT id FROM $cat.db.fork").collect()
        .map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
      // diverge the fork; the source is untouched
      spark.sql(s"DELETE FROM $cat.db.fork WHERE id <= 2")
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.src").head().getLong(0) === 3L)
    }
  }

  test("optimize where_column scopes the merge; vacuum dry_run deletes nothing") {
    import spark.implicits._
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.w (id BIGINT, v STRING)")
      val t = new GraftTable(s"$wh/db/w")
      // two small files in the low range, two in the high range
      Seq(Seq(1L -> "a"), Seq(2L -> "b"), Seq(100L -> "x"), Seq(200L -> "y"))
        .foreach(rows => t.append(rows.toDF("id", "v").coalesce(1)))
      val row = spark.sql(
        s"CALL $cat.system.optimize(table => 'db.w', where_column => 'id'," +
          " where_upper => '50')").head()
      assert(row.getString(0) === "compact-range")
      assert(row.getInt(1) === 2, s"only the low-range files merge: $row")
      assert(spark.sql(s"SELECT id FROM $cat.db.w").collect()
        .map(_.getLong(0)).toSet === Set(1L, 2L, 100L, 200L))
      // dry-run vacuum reports the two merged-away files, deletes nothing
      val preview = spark.sql(
        s"CALL $cat.system.vacuum(table => 'db.w', retain_versions => 0," +
          " dry_run => true)").head()
      assert(preview.getInt(0) === 2)
      val filesOnDisk = new java.io.File(s"$wh/db/w").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(filesOnDisk === 5, "dry run must not delete (4 small + 1 merged)")
      val real = spark.sql(
        s"CALL $cat.system.vacuum(table => 'db.w', retain_versions => 0)").head()
      assert(real.getInt(0) === 2)
    }
  }

  test("vacuum reports change-file retirements distinctly from data files") {
    import spark.implicits._
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.c (id BIGINT, v STRING)")
      val t = new GraftTable(s"$wh/db/c")
      t.append((0L until 20L).map(i => (i, s"n$i")).toDF("id", "v"))
      t.setProperty("cdf.enabled", "true")
      t.setProperty(graft.medallion.TxLog.VacuumCdcMinAgeProp, "0")
      t.upsert(Seq((3L, "x", 1L, false)).toDF("id", "v", "_seq", "_deleted"),
        "id", "_seq") // stages a change file
      t.append(Seq((100L, "z")).toDF("id", "v")) // pushes it past retention
      val dry = spark.sql(s"CALL $cat.system.vacuum(table => 'db.c'," +
        " retain_versions => 0, dry_run => true)").head()
      assert(dry.getInt(1) >= 1,
        s"feed-horizon audit needs change files in their own column: $dry")
      val real = spark.sql(s"CALL $cat.system.vacuum(table => 'db.c'," +
        " retain_versions => 0)").head()
      assert(real.getInt(1) === dry.getInt(1))
      val leftover = Option(new java.io.File(s"$wh/db/c/_change").listFiles())
        .toSeq.flatten.count(_.getName.endsWith(".parquet"))
      assert(leftover === 0)
    }
  }

  test("restore(timestamp => ...) rolls back to the snapshot held at that instant") {
    import spark.implicits._
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.ts (id BIGINT)")
      val t = new GraftTable(s"$wh/db/ts")
      t.append(Seq(1L, 2L).toDF("id"))
      val goodTs = t.historyFull().find(_._1 == t.latestVersion()).get._5.get
      Thread.sleep(5)
      t.append(Seq(99L).toDF("id")) // the fat-finger commit to undo
      val row = spark.sql(s"CALL $cat.system.restore(table => 'db.ts'," +
        s" timestamp => '$goodTs')").head()
      assert(row.getLong(0) === 2L, s"resolved wrong version: $row")
      assert(spark.sql(s"SELECT id FROM $cat.db.ts").as[Long].collect().toSet
        === Set(1L, 2L))
      // exactly one of version/timestamp
      val e = intercept[Exception](spark.sql(
        s"CALL $cat.system.restore(table => 'db.ts')").collect())
      assert(e.getMessage.contains("exactly one"))
    }
  }

  test("vacuum retain_hours resolves the window against commit timestamps") {
    import spark.implicits._
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.h (id BIGINT)")
      val t = new GraftTable(s"$wh/db/h")
      Seq(Seq(1L), Seq(2L)).foreach(r => t.append(r.toDF("id").coalesce(1)))
      t.compact(spark) // the 2 pre-compact files are head-unreachable
      // a window predating the table's history keeps everything
      val keep = spark.sql(s"CALL $cat.system.vacuum(table => 'db.h'," +
        " retain_hours => 1.0E6)").head()
      assert(keep.getInt(0) === 0 && keep.getInt(1) === 0, s"got $keep")
      // a zero-hour window sweeps everything head cannot reach
      val sweep = spark.sql(s"CALL $cat.system.vacuum(table => 'db.h'," +
        " retain_hours => 0.0)").head()
      assert(sweep.getInt(0) === 2, s"got $sweep")
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.h").head().getLong(0) === 2L)
    }
  }

  test("path-based DSv2 read honors option(timestampAsOf)") {
    import spark.implicits._
    val dir = new java.io.File(
      s"target/tmp/proc_tsopt_${java.util.UUID.randomUUID().toString.take(8)}")
      .getAbsolutePath
    val t = new GraftTable(dir)
    t.append(Seq(1L).toDF("id"))
    val betweenMs = t.historyFull().head._5.get
    Thread.sleep(5)
    t.append(Seq(2L).toDF("id"))
    val asOf = spark.read.format("graft-table").option("path", dir)
      .option("timestampAsOf", betweenMs.toString).load()
    assert(asOf.select("id").collect().map(_.getLong(0)).toSet === Set(1L))
    // literal form, and the disagreement guard
    val lit = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(betweenMs))
    assert(spark.read.format("graft-table").option("path", dir)
      .option("timestampAsOf", lit).load().count() === 1L)
    intercept[Exception](spark.read.format("graft-table").option("path", dir)
      .option("timestampAsOf", betweenMs.toString)
      .option("versionAsOf", t.latestVersion().toString).load().collect())
  }

  test("procedures cannot escape the warehouse") {
    withCatalog { (cat, _) =>
      val e = intercept[Exception](spark.sql(
        s"CALL $cat.system.optimize(table => '../../etc')").collect())
      assert(e.getMessage.contains("illegal identifier segment"))
    }
  }

  test("TIMESTAMP AS OF resolves stamped commits; refuses pre-history") {
    import spark.implicits._
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.tt (id BIGINT)")
      val t = new GraftTable(s"$wh/db/tt")
      t.append(Seq(1L).toDF("id"))
      val between = new java.sql.Timestamp(System.currentTimeMillis())
      Thread.sleep(15)
      t.append(Seq(2L).toDF("id"))

      // exact head time (>= last commit) sees everything
      val nowTs = new java.sql.Timestamp(System.currentTimeMillis())
      assert(spark.sql(
        s"SELECT id FROM $cat.db.tt TIMESTAMP AS OF '$nowTs'").collect()
        .map(_.getLong(0)).toSet === Set(1L, 2L))
      // between the two appends: only the first
      assert(spark.sql(
        s"SELECT id FROM $cat.db.tt TIMESTAMP AS OF '$between'").collect()
        .map(_.getLong(0)).toSet === Set(1L))
      // before v1 existed: loud refusal naming the earliest version
      val e = intercept[Exception](spark.sql(
        s"SELECT * FROM $cat.db.tt TIMESTAMP AS OF '2001-01-01 00:00:00'")
        .collect())
      assert(e.getMessage.contains("VERSION AS OF"))
      // commit_ts surfaces in the history metadata table
      val hist = spark.sql(
        s"SELECT version, commit_ts FROM $cat.db.tt.history").collect()
      assert(hist.forall(r => !r.isNullAt(1)), "every commit is stamped")
    }
  }

  test("CALL system.replace_range: atomic REPLACE WHERE from SQL") {
    import spark.implicits._
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.days (day BIGINT, v STRING)")
      val t = new GraftTable(s"$wh/db/days")
      t.append((1L to 3L).flatMap(d => (1 to 4).map(i => (d, s"d$d-r$i")))
        .toDF("day", "v").repartition(1))
      Seq((2L, "recomputed-1"), (2L, "recomputed-2"))
        .toDF("day", "v").createOrReplaceTempView("day2_fix")
      try {
        val row = spark.sql(
          s"""CALL $cat.system.replace_range(table => 'db.days',
              column => 'day', lower => '2', upper => '2',
              source => 'day2_fix')""").head()
        assert(row.getInt(0) + row.getInt(1) === 1, "one file triaged")
        assert(spark.sql(s"SELECT v FROM $cat.db.days WHERE day = 2").collect()
          .map(_.getString(0)).toSet
          === Set("recomputed-1", "recomputed-2"))
        assert(spark.sql(s"SELECT count(*) FROM $cat.db.days")
          .head().getLong(0) === 10L)
        // out-of-window source refuses, nothing committed
        Seq((9L, "stray")).toDF("day", "v")
          .createOrReplaceTempView("bad_fix")
        val before = t.latestVersion()
        intercept[Exception](spark.sql(
          s"""CALL $cat.system.replace_range(table => 'db.days',
              column => 'day', lower => '2', upper => '2',
              source => 'bad_fix')""").collect())
        assert(t.latestVersion() === before)
      } finally {
        spark.catalog.dropTempView("day2_fix")
        spark.catalog.dropTempView("bad_fix")
      }
    }
  }

  test("CALL system.detail: the whole operational state as one metadata row") {
    import spark.implicits._
    import graft.medallion.TxLog
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.d (id BIGINT, s STRING)")
      val t = new GraftTable(s"$wh/db/d")
      t.append((0L until 40L).map(i => (i, s"v$i")).toDF("id", "s").coalesce(1))
      t.append((40L until 80L).map(i => (i, s"v$i")).toDF("id", "s").coalesce(1))
      t.setProperty(graft.medallion.PartitionSpec.Prop, "bucket(4,id)")
      t.setProperty(TxLog.DeleteModeProp, TxLog.DeleteModeMor)
      t.addConstraint(spark, "nonneg", "id >= 0")
      t.deleteRows(spark, "id = 5 OR id = 77") // two DVs
      t.checkpoint()
      val row = spark.sql(s"CALL $cat.system.detail(table => 'db.d')").head()
      assert(row.getString(0) === "graft")
      assert(row.getString(1).endsWith("/db/d"))
      assert(row.getLong(2) === t.latestVersion())   // version
      assert(row.getLong(3) === 2L)                  // num_files
      assert(row.getLong(4) === 2L)                  // num_dv_files
      assert(row.getLong(5) === 2L)                  // dv_rows
      assert(row.getLong(6) === 78L)                 // num_rows (effective)
      assert(row.getLong(7) > 0L)                    // size_bytes
      assert(row.getString(8) === "bucket(4,id)")    // partition_spec
      val features = row.getString(9).split(",").toSet
      assert(Set("deletionVectors", "checkConstraints", "tableProperties")
        .subsetOf(features), s"features: $features")
      assert(row.getInt(10) === 1)                   // num_constraints
      assert(!row.isNullAt(11) &&
        row.getLong(11) === t.latestVersion())       // checkpoint_version
      assert(!row.isNullAt(12))                      // last_commit_ts
      val props = row.getString(13)
      assert(props.contains("\"delete.mode\":\"merge-on-read\"") &&
        props.contains("\"partition.spec\""), s"properties json: $props")
      // a bare fresh table still answers (nullable slots null)
      spark.sql(s"CREATE TABLE $cat.db.bare (x BIGINT)")
      new GraftTable(s"$wh/db/bare").append(Seq(1L).toDF("x"))
      val bare = spark.sql(s"CALL $cat.system.detail(table => 'db.bare')").head()
      assert(bare.getLong(3) >= 1L && bare.isNullAt(8))
    }
  }
}
