package graft

import graft.medallion.{GraftTable, TxLog}
import graft.streaming.GraftCatalog
import org.apache.spark.sql.functions._

/** Per-file Bloom filters (the `bloom.columns` table property): point
  * lookups on high-cardinality UNCLUSTERED columns prune files min/max
  * stats cannot — when ids are scattered round-robin, every file's
  * [min,max] covers every probe, but a 1 KiB bitset proves absence for
  * ~98% of files. Soundness bar: NO false negatives ever (a present
  * value must always be found); false positives only cost IO. */
class BloomSkippingSpec extends SparkSpec {

  private def freshTable(tag: String): GraftTable = {
    val dir = new java.io.File(
      s"target/tmp/bloom_${tag}_${java.util.UUID.randomUUID().toString.take(8)}")
    new GraftTable(dir.getAbsolutePath)
  }

  /** 8 files of scattered EVEN ids (id = 2k, k ≡ f mod 8, k < 512):
    * every file's min/max range covers nearly the whole 0..1022 span,
    * and every ODD id is absent-but-in-range — the exact shape where
    * min/max stats prune nothing and only a bloom can. */
  private def scattered(t: GraftTable): Unit = {
    import spark.implicits._
    t.append(Seq(0L).toDF("id"))           // v1 establishes the table
    t.setProperty(TxLog.BloomColumnsProp, "id")
    (0 until 8).foreach { f =>
      t.append((0L until 512L).filter(_ % 8 == f).map(_ * 2L)
        .toDF("id").coalesce(1))
    }
  }

  test("point lookups prune scattered files; present values always found") {
    val t = freshTable("points")
    scattered(t)
    // min/max alone admits all 8 scattered files for any mid-range id;
    // the bloom drops the 7 files that provably lack it (allow a false
    // positive or two — never more than half)
    val probes = Seq(10L, 246L, 500L, 1000L).filter(_ % 2 == 0)
    probes.foreach { id =>
      val n = t.filesForRange("id", Some(id), Some(id))
      assert(n >= 1 && n <= 4,
        s"id=$id: expected ~1 file after bloom pruning, got $n")
      // NO false negatives: the value is actually there
      assert(t.readRange(spark, "id", Some(id), Some(id)).count() === 1L)
    }
    // an ABSENT value INSIDE every file's [min,max] (odd id): min/max
    // admits all 8 scattered files, the bloom drops (almost) all
    assert(t.filesForRange("id", Some(501L), Some(501L)) <= 2)
    assert(t.readRange(spark, "id", Some(501L), Some(501L)).count() === 0L)
    // a RANGE still uses min/max only — blooms answer points, not ranges
    assert(t.filesForRange("id", Some(0L), Some(1022L)) >= 8)
  }

  test("exhaustive no-false-negative sweep") {
    val t = freshTable("exhaustive")
    scattered(t)
    // every present id must be admitted by at least one file's bloom —
    // driver-side probes, not 512 spark jobs
    val snap = t.snapshot()
    val present = (0L until 512L).map(_ * 2L)
    val found = present.count { id =>
      snap.files.exists(a =>
        a.stats.get("id").forall(_.overlaps(
          Some(id.toString), Some(id.toString))) &&
          t.bloomAdmits(snap.schema, a, "id", "id", id))
    }
    assert(found === present.size,
      "a bloom must NEVER exclude a present value")
  }

  test("strings bloom too; unsupported types refuse at setProperty") {
    import spark.implicits._
    val t = freshTable("str")
    t.append(Seq(("k0", 0.5)).toDF("key", "score"))
    t.setProperty(TxLog.BloomColumnsProp, "key")
    // every file spans a-* .. z-* so any m-* probe is in-range for ALL
    (1 to 4).foreach(f => t.append(
      Seq((s"a-$f", 1.0), (s"z-$f", 2.0)).toDF("key", "score").coalesce(1)))
    assert(t.filesForRange("key", Some("a-3"), Some("a-3")) <= 2)
    assert(t.readRange(spark, "key", Some("a-3"), Some("a-3")).count() === 1L)
    // absent but inside every file's [min,max]: only the bloom prunes
    assert(t.filesForRange("key", Some("m-x"), Some("m-x")) <= 1)
    // double columns cannot bloom (hash replay is int/long/string only)
    val e = intercept[IllegalArgumentException](
      t.setProperty(TxLog.BloomColumnsProp, "score"))
    assert(e.getMessage.contains("int/long/string"))
    intercept[IllegalArgumentException](
      t.setProperty(TxLog.BloomColumnsProp, "ghost"))
  }

  test("SQL: TBLPROPERTIES turns blooms on; DSv2 point SELECT prunes files") {
    import spark.implicits._
    val wh = new java.io.File(
      s"target/tmp/bloom_sql_${java.util.UUID.randomUUID().toString.take(8)}")
      .getAbsolutePath
    val cat = s"bl${java.util.UUID.randomUUID().toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      spark.sql(s"CREATE TABLE $cat.db.ev (id BIGINT, v STRING)")
      spark.sql(
        s"ALTER TABLE $cat.db.ev SET TBLPROPERTIES ('bloom.columns' = 'id')")
      val t = new GraftTable(s"$wh/db/ev")
      assert(t.properties === Map("bloom.columns" -> "id"))
      (0 until 6).foreach { f =>
        t.append((0L until 600L).filter(_ % 6 == f)
          .map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
      }
      // the DSv2 scan's file pruning consults the blooms (fileSurvives)
      val df = spark.sql(s"SELECT v FROM $cat.db.ev WHERE id = 77")
      assert(df.collect().map(_.getString(0)).toSeq === Seq("v77"))
      val gs = graft.plans.AdaptivePlans.collectDeep(df) {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.head.scan.asInstanceOf[graft.streaming.GraftScan]
      val filesPlanned = gs.currentFiles().length
      assert(filesPlanned <= 2,
        s"bloom should prune the point scan to ~1 file, planned $filesPlanned")
      // absent key: zero rows
      assert(spark.sql(s"SELECT v FROM $cat.db.ev WHERE id = 9999").count() === 0L)
      // properties round-trip into DESCRIBE EXTENDED
      val props = spark.sql(s"DESCRIBE TABLE EXTENDED $cat.db.ev").collect()
        .map(r => r.getString(0) + " " + r.getString(1)).mkString("\n")
      assert(props.contains("bloom.columns"))
      // UNSET turns it off for future writes
      spark.sql(s"ALTER TABLE $cat.db.ev UNSET TBLPROPERTIES ('bloom.columns')")
      assert(new GraftTable(s"$wh/db/ev").properties.isEmpty)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  test("blooms survive checkpoint, clone and restore; compact rebuilds them") {
    import spark.implicits._
    val t = freshTable("lifecycle")
    scattered(t)
    t.checkpoint()
    // resolution now reads checkpoint + suffix; blooms must still prune
    // the absent-but-in-range odd id
    assert(t.filesForRange("id", Some(501L), Some(501L)) <= 2)
    val fork = t.cloneTo(t.tablePath + "_fork")
    assert(fork.properties === Map(TxLog.BloomColumnsProp -> "id"))
    assert(fork.filesForRange("id", Some(501L), Some(501L)) <= 2)
    // compact rewrites into fewer files WITH fresh blooms (the props
    // are live at staging time)
    t.compact(spark, targetFileMB = 1)
    val withBloom = t.snapshot().files.count(_.stats.get("id").exists(_.bloom.isDefined))
    assert(withBloom === t.snapshot().files.size,
      "every compacted file carries a rebuilt bloom")
    assert(t.readRange(spark, "id", Some(246L), Some(246L)).count() === 1L)
  }
}
