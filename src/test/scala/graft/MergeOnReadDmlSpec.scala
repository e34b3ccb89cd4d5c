package graft

import graft.medallion.{GraftTable, TxLog}
import graft.streaming.GraftCatalog
import org.apache.spark.sql.functions._

/** Merge-on-read UPDATE / MERGE / DELETE (`update.mode` / `merge.mode`
  * / `delete.mode` = `merge-on-read`): SQL row-level DML through the
  * DELTA-based rewrite — matched rows become deletion-vector entries on
  * their source files, post-images append as new files, ONE commit,
  * zero data-file rewrites for DV-eligible files (the Delta DV-backed
  * DML shape; Iceberg v2 position deltas). */
class MergeOnReadDmlSpec extends SparkSpec {
  import spark.implicits._

  private def freshWarehouse(): String =
    new java.io.File(
      s"target/tmp/mor_${java.util.UUID.randomUUID().toString.take(8)}")
      .getAbsolutePath

  private def withCatalog(name: String)(body: String => Unit): Unit = {
    val wh = freshWarehouse()
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    try body(wh)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$name")
      spark.conf.unset(s"spark.sql.catalog.$name.warehouse")
    }
  }

  test("sparse UPDATE commits zero data-file rewrites (DV + post-image append)") {
    withCatalog("mor1") { wh =>
      val t = new GraftTable(s"$wh/db/t")
      // 4 files x 50 rows; a 1-row update must NOT rewrite any of them
      (0 until 4).foreach { f =>
        t.append((0 until 50).map(i =>
          (f * 50L + i, s"v${f * 50 + i}", i.toDouble)).toDF("id", "s", "x")
          .coalesce(1))
      }
      t.setProperty(TxLog.UpdateModeProp, TxLog.DeleteModeMor)
      val before = t.snapshot()
      assert(before.files.size === 4)

      spark.sql("UPDATE mor1.db.t SET s = upper(s), x = x + 0.5 WHERE id = 77")

      val after = t.snapshot()
      // every pre-existing data file is STILL LIVE (one now carries a
      // DV); the only new file is the single post-image append
      val beforePaths = before.files.map(_.path).toSet
      val kept = after.files.filter(a => beforePaths.contains(a.path))
      require(kept.size === 4,
        s"a sparse merge-on-read UPDATE must rewrite zero data files " +
          s"(kept ${kept.size} of 4)")
      assert(kept.count(_.dv.isDefined) === 1, "exactly one file is DV'd")
      assert(kept.filter(_.dv.isDefined).head.dvRows === 1L)
      val fresh = after.files.filterNot(a => beforePaths.contains(a.path))
      assert(fresh.size === 1 && fresh.head.rows === 1L,
        s"one post-image file of one row, got $fresh")

      // read-back: exact
      assert(spark.sql("SELECT s, x FROM mor1.db.t WHERE id = 77").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq === Seq(("V77", 27.5)))
      assert(spark.sql("SELECT count(*) FROM mor1.db.t").head().getLong(0) === 200L)
      assert(spark.sql("SELECT sum(id) FROM mor1.db.t").head().getLong(0) ===
        (0L until 200L).sum)

      // provenance: survivors keep their original commit version, the
      // post-image row minted a fresh one
      val vOf = spark.sql(
        "SELECT id, _commit_version FROM mor1.db.t WHERE id IN (76, 77)")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(vOf(76L) === 2L, "untouched neighbor keeps its append version")
      assert(vOf(77L) === after.version, "the post-image is the DML commit's row")
    }
  }

  test("MERGE INTO merge-on-read: matched -> DV + post-image, not-matched -> insert") {
    withCatalog("mor2") { wh =>
      val t = new GraftTable(s"$wh/db/t")
      t.append(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "s", "x").coalesce(1))
      t.append(Seq((10L, "j", 100.0), (11L, "k", 110.0)).toDF("id", "s", "x").coalesce(1))
      t.setProperty(TxLog.MergeModeProp, TxLog.DeleteModeMor)
      val before = t.snapshot()
      Seq((2L, 99.0), (7L, 70.0)).toDF("mid", "mx").createOrReplaceTempView("mor2_src")
      try {
        spark.sql("""MERGE INTO mor2.db.t AS tgt USING mor2_src AS src
                     ON tgt.id = src.mid
                     WHEN MATCHED THEN UPDATE SET x = src.mx
                     WHEN NOT MATCHED THEN INSERT (id, s, x) VALUES (src.mid, 'new', src.mx)""")
      } finally spark.catalog.dropTempView("mor2_src")
      val after = t.snapshot()
      val beforePaths = before.files.map(_.path).toSet
      require(before.files.forall(a =>
        after.files.exists(_.path == a.path)),
        "merge-on-read MERGE must keep every pre-existing data file live")
      assert(after.files.count(a =>
        beforePaths.contains(a.path) && a.dv.isDefined) === 1,
        "only the matched file carries a DV")
      assert(spark.sql("SELECT id, s, x FROM mor2.db.t ORDER BY id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
        === Seq((1L, "a", 10.0), (2L, "b", 99.0), (7L, "new", 70.0),
          (10L, "j", 100.0), (11L, "k", 110.0)))
    }
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: deletes/updates land as DVs too") {
    withCatalog("morA") { wh =>
      val t = new GraftTable(s"$wh/db/t")
      t.append((0L until 100L).map(i => (i, i * 1.0)).toDF("id", "x").coalesce(1))
      t.setProperty(TxLog.MergeModeProp, TxLog.DeleteModeMor)
      val before = t.snapshot()
      // source covers 0..97 plus a new key: 98/99 are unmatched-by-source
      ((0L until 98L) :+ 200L).toDF("sid").createOrReplaceTempView("morA_src")
      try {
        // a guarded matched-UPDATE, a new-key INSERT, and a
        // NOT-MATCHED-BY-SOURCE DELETE — three legs, one sparse
        // merge-on-read commit (matched-no-action rows untouched)
        spark.sql("""MERGE INTO morA.db.t AS tgt USING morA_src AS src
                     ON tgt.id = src.sid
                     WHEN MATCHED AND src.sid IN (2, 52)
                       THEN UPDATE SET x = tgt.x + 100.0
                     WHEN NOT MATCHED THEN INSERT (id, x) VALUES (src.sid, -1.0)
                     WHEN NOT MATCHED BY SOURCE THEN DELETE""")
      } finally spark.catalog.dropTempView("morA_src")
      val after = t.snapshot()
      assert(before.files.forall(a => after.files.exists(_.path == a.path)),
        "all three MERGE legs must commit without rewriting the data file")
      assert(after.files.exists(a => a.dv.isDefined && a.dvRows === 4L),
        s"2 updates + 2 by-source deletes = one 4-row DV: ${after.files}")
      val got = spark.sql("SELECT id, x FROM morA.db.t ORDER BY id").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got.length === 99) // 100 - 2 deleted + 1 inserted
      assert(got.contains((2L, 102.0)) && got.contains((52L, 152.0)))
      assert(got.contains((200L, -1.0)))
      assert(!got.exists(r => r._1 == 98L || r._1 == 99L))
      assert(got.contains((3L, 3.0)), "matched-no-action rows untouched")
    }
  }

  test("subquery DELETE under delete.mode=merge-on-read vectorizes too") {
    withCatalog("mor3") { wh =>
      val t = new GraftTable(s"$wh/db/t")
      t.append((0L until 100L).map(i => (i, s"d$i")).toDF("id", "s").coalesce(1))
      t.setProperty(TxLog.DeleteModeProp, TxLog.DeleteModeMor)
      Seq(3L, 50L, 98L).toDF("kid").createOrReplaceTempView("mor3_kill")
      try {
        // IN-subquery: not expressible as V1 filters, so it bypasses
        // canDeleteWhere/deleteRows and lands on the row-level path —
        // which under merge-on-read is the delta operation
        spark.sql(
          "DELETE FROM mor3.db.t WHERE id IN (SELECT kid FROM mor3_kill)")
      } finally spark.catalog.dropTempView("mor3_kill")
      val after = t.snapshot()
      assert(after.files.size === 1 && after.files.head.dv.isDefined,
        s"the file must survive with a DV, got ${after.files}")
      assert(after.files.head.dvRows === 3L)
      assert(spark.sql("SELECT count(*) FROM mor3.db.t").head().getLong(0) === 97L)
      assert(spark.sql("SELECT count(*) FROM mor3.db.t WHERE id IN (3, 50, 98)")
        .head().getLong(0) === 0L)
    }
  }

  test("CDF serves exact pre/post images across a merge-on-read UPDATE") {
    withCatalog("mor4") { wh =>
      val t = new GraftTable(s"$wh/db/t")
      t.append((0L until 20L).map(i => (i, i * 1.0)).toDF("id", "x").coalesce(1))
      t.setProperty(TxLog.CdfEnabledProp, "true")
      t.setProperty(TxLog.UpdateModeProp, TxLog.DeleteModeMor)
      val v0 = t.latestVersion()
      spark.sql("UPDATE mor4.db.t SET x = x * 10 WHERE id IN (5, 6)")
      val feed = t.readChangeFeed(spark, sinceVersion = v0)
        .select("id", "x", TxLog.ChangeTypeCol).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
      assert(feed === Set(
        (5L, 5.0, "delete"), (6L, 6.0, "delete"),
        (5L, 50.0, "insert"), (6L, 60.0, "insert")),
        s"feed must be the exact pre/post pairs, got $feed")
      // fold invariant: since-snapshot + feed == head snapshot
      val folded = (0L until 20L).map(i =>
        if (i == 5L || i == 6L) (i, i * 10.0) else (i, i * 1.0)).toSet
      assert(spark.sql("SELECT id, x FROM mor4.db.t").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet === folded)
    }
  }

  test("triage: an over-fraction file rewrites copy-on-write in the same commit") {
    withCatalog("mor5") { wh =>
      val t = new GraftTable(s"$wh/db/t")
      t.append((0L until 100L).map(i => (i, i * 1.0)).toDF("id", "x").coalesce(1))
      t.append((100L until 200L).map(i => (i, i * 1.0)).toDF("id", "x").coalesce(1))
      t.setProperty(TxLog.UpdateModeProp, TxLog.DeleteModeMor)
      val before = t.snapshot()
      // updates 80% of file 1 (over dv.maxFraction=0.5) and 2% of file 2
      spark.sql("UPDATE mor5.db.t SET x = -1.0 WHERE id < 80 OR id IN (150, 151)")
      val after = t.snapshot()
      val beforePaths = before.files.map(_.path).toSet
      // file 1 was rewritten (gone); file 2 survives with a 2-row DV
      val kept = after.files.filter(a => beforePaths.contains(a.path))
      assert(kept.size === 1 && kept.head.dv.isDefined &&
        kept.head.dvRows === 2L,
        s"the lightly-touched file must vectorize, got $kept")
      assert(spark.sql("SELECT count(*) FROM mor5.db.t WHERE x = -1.0")
        .head().getLong(0) === 82L)
      assert(spark.sql("SELECT count(*) FROM mor5.db.t").head().getLong(0) === 200L)
    }
  }

  test("purge launders MOR-update DVs; _file/_pos metadata columns serve reads") {
    withCatalog("mor6") { wh =>
      val t = new GraftTable(s"$wh/db/t")
      t.append((0L until 30L).map(i => (i, s"p$i")).toDF("id", "s").coalesce(1))
      t.setProperty(TxLog.UpdateModeProp, TxLog.DeleteModeMor)
      spark.sql("UPDATE mor6.db.t SET s = 'UP' WHERE id = 7")
      assert(t.snapshot().files.exists(_.dv.isDefined))
      // _file/_pos are selectable metadata columns; the updated row
      // lives in the NEW post-image file at position 0
      val rows = spark.sql(
        "SELECT id, _file, _pos FROM mor6.db.t WHERE id IN (6, 7)")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      assert(rows(6L)._2 === 6L, "survivor keeps its physical position")
      assert(rows(7L)._2 === 0L && rows(7L)._1 != rows(6L)._1,
        "the post-image row sits at position 0 of a new file")
      val (purged, _, _) = t.purgeDeletes(spark)
      assert(purged === 1)
      assert(t.snapshot().files.forall(_.dv.isEmpty))
      assert(spark.sql("SELECT s FROM mor6.db.t WHERE id = 7").head().getString(0) === "UP")
      assert(spark.sql("SELECT count(*) FROM mor6.db.t").head().getLong(0) === 30L)
    }
  }

  test("MOR update on a column-mapped table: renamed predicate + SET columns translate") {
    withCatalog("mor9") { wh =>
      val t = new GraftTable(s"$wh/db/t")
      t.append((0L until 40L).map(i => (i, i * 1.0, s"s$i")).toDF("id", "x", "note")
        .coalesce(1))
      t.renameColumn("x", "score") // mapping ON: physical name stays "x"
      t.setProperty(TxLog.UpdateModeProp, TxLog.DeleteModeMor)
      val before = t.snapshot()
      spark.sql("UPDATE mor9.db.t SET score = score + 100.0, note = 'UP' " +
        "WHERE id IN (3, 17)")
      val after = t.snapshot()
      assert(before.files.forall(a => after.files.exists(_.path == a.path)),
        "zero rewrites through the mapping")
      assert(after.files.count(_.dv.isDefined) === 1)
      assert(spark.sql(
        "SELECT id, score, note FROM mor9.db.t WHERE note = 'UP' ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
        === Seq((3L, 103.0, "UP"), (17L, 117.0, "UP")))
      assert(spark.sql("SELECT count(*) FROM mor9.db.t").head().getLong(0) === 40L)
      // purge launders through the mapping too
      t.purgeDeletes(spark)
      assert(spark.sql("SELECT sum(score) FROM mor9.db.t").head().getDouble(0)
        === (0L until 40L).map(_.toDouble).sum + 200.0)
    }
  }

  test("MOR-update DV lifecycle: checkpoint, clone, restore, tails") {
    withCatalog("mor8") { wh =>
      val t = new GraftTable(s"$wh/db/t")
      t.append((0L until 100L).map(i => (i, i * 1.0)).toDF("id", "x").coalesce(1))
      t.setProperty(TxLog.UpdateModeProp, TxLog.DeleteModeMor)
      val preUpdate = t.latestVersion()
      spark.sql("UPDATE mor8.db.t SET x = -1.0 WHERE id IN (7, 70)")
      assert(t.snapshot().files.exists(_.dv.isDefined))
      // checkpoint carries the update's bitmap AND the post-image file
      t.checkpoint()
      val fresh = new GraftTable(t.tablePath)
      assert(fresh.read(spark).count() === 100L)
      assert(fresh.read(spark).filter(col("x") === -1.0).count() === 2L)
      // clone keeps the DV'd file and the post-images
      val fork = new GraftTable(s"$wh/db/fork")
      t.cloneTo(fork.tablePath)
      assert(fork.read(spark).filter(col("x") === -1.0).count() === 2L)
      assert(fork.appendsSince(spark, 0L).count() === 100L,
        "tailing the clone from 0 applies the carried DVs")
      // restore resurrects the pre-update values BY DESIGN
      t.restore(preUpdate)
      assert(t.read(spark).filter(col("x") === -1.0).count() === 0L)
      assert(t.snapshot().files.forall(_.dv.isEmpty))
      // a tail must refuse to cross the update commit (rows mutated)
      val t2 = new GraftTable(s"$wh/db/t2")
      t2.append((0L until 10L).map(i => (i, i * 1.0)).toDF("id", "x").coalesce(1))
      t2.setProperty(TxLog.UpdateModeProp, TxLog.DeleteModeMor)
      val mark = t2.latestVersion()
      spark.sql("UPDATE mor8.db.t2 SET x = 99.0 WHERE id = 3")
      val ex = intercept[IllegalStateException](
        t2.appendsSince(spark, mark).count())
      assert(ex.getMessage.contains("replace"))
      assert(t2.appendsSince(spark, mark, skipRewrites = true).count() === 0L)
    }
  }

  test("keyed upsert under update.mode=merge-on-read: DV + image append, zero rewrites") {
    withCatalog("morU") { wh =>
      val t = new GraftTable(s"$wh/db/t")
      (0 until 3).foreach(f => t.append(
        (f * 100L until (f + 1) * 100L).map(i => (i, i * 1.0))
          .toDF("id", "x").coalesce(1)))
      t.setProperty(TxLog.CdfEnabledProp, "true")
      t.setProperty(TxLog.UpdateModeProp, TxLog.DeleteModeMor)
      val before = t.snapshot()
      val v0 = t.latestVersion()
      // a CDC batch: two updates, one key-delete, one brand-new key —
      // with a stale older image of key 50 that must LOSE by seq
      val changes = Seq(
        (50L, -1.0, 1L, false), (50L, 555.0, 2L, false),
        (150L, 999.0, 2L, false),
        (250L, 0.0, 2L, true),
        (900L, 9.0, 2L, false))
        .toDF("id", "x", "_seq", "_deleted")
      t.upsert(changes, "id", "_seq")
      val after = t.snapshot()
      assert(before.files.forall(a => after.files.exists(_.path == a.path)),
        "a sparse merge-on-read upsert must rewrite zero data files")
      assert(after.files.count(a =>
        before.files.exists(_.path == a.path) && a.dv.isDefined) === 3,
        "each touched file carries a DV for its matched key")
      assert(t.history().head._2 === "upsert")
      assert(spark.sql("SELECT count(*) FROM morU.db.t").head().getLong(0) === 300L)
      val got = spark.sql(
        "SELECT id, x FROM morU.db.t WHERE id IN (50, 150, 250, 900)")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === Map(50L -> 555.0, 150L -> 999.0, 900L -> 9.0))
      // CDF: pre/post images pair under the recorded merge key
      val feed = t.readChangeFeed(spark, v0, updateImages = true)
        .select("id", "x", TxLog.ChangeTypeCol).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
      assert(feed === Set(
        (50L, 50.0, "update_preimage"), (50L, 555.0, "update_postimage"),
        (150L, 150.0, "update_preimage"), (150L, 999.0, "update_postimage"),
        (250L, 250.0, "delete"),
        (900L, 9.0, "insert")), s"feed: $feed")
      // a second upsert ORs into the same files' bitmaps
      t.upsert(Seq((51L, -5.0, 3L, false)).toDF("id", "x", "_seq", "_deleted"),
        "id", "_seq")
      assert(t.snapshot().files.exists(_.dvRows === 2L))
      assert(spark.sql("SELECT x FROM morU.db.t WHERE id = 51")
        .head().getDouble(0) === -5.0)
      assert(spark.sql("SELECT count(*) FROM morU.db.t").head().getLong(0) === 300L)
    }
  }

  test("MOR upsert triage: a mostly-replaced file rewrites in the same commit") {
    withCatalog("morV") { wh =>
      val t = new GraftTable(s"$wh/db/t")
      t.append((0L until 100L).map(i => (i, i * 1.0)).toDF("id", "x").coalesce(1))
      t.append((100L until 200L).map(i => (i, i * 1.0)).toDF("id", "x").coalesce(1))
      t.setProperty(TxLog.UpdateModeProp, TxLog.DeleteModeMor)
      val before = t.snapshot()
      // replaces 90% of file 1, 1% of file 2
      val changes = ((0L until 90L) :+ 150L)
        .map(i => (i, -1.0, 1L, false)).toDF("id", "x", "_seq", "_deleted")
      t.upsert(changes, "id", "_seq")
      val after = t.snapshot()
      val kept = after.files.filter(a => before.files.exists(_.path == a.path))
      assert(kept.size === 1 && kept.head.dv.isDefined && kept.head.dvRows === 1L,
        s"the lightly-touched file vectorizes, the hot one rewrites: $kept")
      assert(spark.sql("SELECT count(*) FROM morV.db.t WHERE x = -1.0")
        .head().getLong(0) === 91L)
      assert(spark.sql("SELECT count(*) FROM morV.db.t").head().getLong(0) === 200L)
    }
  }

  test("soundness fuzz: a random MOR DML sequence matches an in-memory model") {
    withCatalog("morF") { wh =>
      val rnd = new scala.util.Random(4242) // seeded: green forever or never
      val t = new GraftTable(s"$wh/db/t")
      val model = scala.collection.mutable.Map.empty[Long, Double]
      (0L until 300L).foreach(i => model(i) = i * 1.0)
      t.append(model.toSeq.toDF("id", "x").repartition(3))
      t.setProperty(TxLog.UpdateModeProp, TxLog.DeleteModeMor)
      t.setProperty(TxLog.MergeModeProp, TxLog.DeleteModeMor)
      t.setProperty(TxLog.DeleteModeProp, TxLog.DeleteModeMor)
      def check(tag: String): Unit = {
        val got = spark.sql("SELECT id, x FROM morF.db.t").collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got === model.toMap, s"divergence after $tag")
      }
      (0 until 10).foreach { step =>
        rnd.nextInt(3) match {
          case 0 => // sparse UPDATE by a modulo class
            val m = 17 + rnd.nextInt(40); val r = rnd.nextInt(m)
            val c = rnd.nextInt(1000).toDouble
            spark.sql(s"UPDATE morF.db.t SET x = x + $c WHERE id % $m = $r")
            model.keys.toSeq.filter(_ % m == r).foreach(k => model(k) += c)
          case 1 => // sparse DELETE (modulo: not V1-translatable -> delta)
            val m = 29 + rnd.nextInt(50); val r = rnd.nextInt(m)
            spark.sql(s"DELETE FROM morF.db.t WHERE id % $m = $r AND x < 1e7")
            model.keys.toSeq.filter(k => k % m == r && model(k) < 1e7)
              .foreach(model.remove)
          case _ => // MERGE: bump some, insert a fresh key
            val picks = Seq.fill(3)(rnd.nextLong(1000))
            val fresh = 1000L + step
            (picks :+ fresh).distinct.toDF("sid")
              .createOrReplaceTempView("morF_src")
            try spark.sql(
              s"""MERGE INTO morF.db.t AS tgt USING morF_src AS src
                  ON tgt.id = src.sid
                  WHEN MATCHED THEN UPDATE SET x = tgt.x * 2
                  WHEN NOT MATCHED THEN INSERT (id, x) VALUES (src.sid, ${step}.5)""")
            finally spark.catalog.dropTempView("morF_src")
            (picks :+ fresh).distinct.foreach { k =>
              if (model.contains(k)) model(k) *= 2 else model(k) = step + 0.5
            }
        }
        if (step % 3 == 2) check(s"step $step")
      }
      check("final")
      // the sequence must have actually exercised the DV path
      assert(t.snapshot().files.exists(_.dv.isDefined) ||
        t.history().map(_._2).contains("replace"))
      // purge + compact launder everything; model still agrees
      t.purgeDeletes(spark)
      t.compact(spark, targetFileMB = 128)
      check("post-maintenance")
    }
  }

  test("second MOR update ORs into the existing DV; positions stay exact") {
    withCatalog("mor7") { wh =>
      val t = new GraftTable(s"$wh/db/t")
      t.append((0L until 50L).map(i => (i, i * 1.0)).toDF("id", "x").coalesce(1))
      t.setProperty(TxLog.UpdateModeProp, TxLog.DeleteModeMor)
      spark.sql("UPDATE mor7.db.t SET x = -1.0 WHERE id = 10")
      spark.sql("UPDATE mor7.db.t SET x = -2.0 WHERE id = 20")
      // the original file survives both updates, DVs merged
      val orig = t.snapshot().files.filter(_.path.startsWith("part-"))
        .filter(_.dv.isDefined)
      assert(orig.exists(_.dvRows === 2L),
        s"successive updates must OR into one bitmap: ${t.snapshot().files}")
      // update the ALREADY-updated row (it lives in a post-image file
      // now): positions served for that file must be exact too
      spark.sql("UPDATE mor7.db.t SET x = -3.0 WHERE id = 10")
      assert(spark.sql("SELECT x FROM mor7.db.t WHERE id = 10").head().getDouble(0) === -3.0)
      assert(spark.sql("SELECT x FROM mor7.db.t WHERE id = 20").head().getDouble(0) === -2.0)
      assert(spark.sql("SELECT count(*) FROM mor7.db.t").head().getLong(0) === 50L)
      assert(spark.sql("SELECT sum(CASE WHEN x < 0 THEN 1 ELSE 0 END) FROM mor7.db.t")
        .head().getLong(0) === 2L)
    }
  }
}
