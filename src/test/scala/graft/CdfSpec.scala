package graft

import graft.medallion.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CHANGE DATA FEED: every row-mutating commit of a `cdf.enabled` table
  * serves its net row changes through `readChangeFeed` (and the
  * `graft_table_changes` SQL table function), tagged
  * `_change_type` ∈ {insert, delete} and `_commit_version`.
  *
  * The load-bearing invariant, asserted per operation class: for any
  * window, folding the feed into the `since` snapshot reproduces the
  * `until` snapshot EXACTLY (multiset equality). Cost bars: metadata-only
  * drops and truncate must stage ZERO change bytes (`cdcfull` refs), and
  * append/overwrite/restore serve straight from the commit's own
  * add/remove lists. */
class CdfSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String): GraftTable = {
    val dir = new java.io.File(
      s"target/tmp/cdf_${tag}_${java.util.UUID.randomUUID().toString.take(8)}")
    new GraftTable(dir.getAbsolutePath)
  }

  private def enabled(tag: String): GraftTable = {
    val t = freshTable(tag)
    t.append((0L until 100L).map(i => (i, s"n$i", i % 5)).toDF("id", "name", "b")
      .repartition(4))
    t.setProperty("cdf.enabled", "true")
    t
  }

  /** Multiset fold check: since-snapshot ⊎ inserts ∖ deletes == until. */
  private def assertFold(t: GraftTable, since: Long, until: Long): Unit = {
    val cols = t.snapshot(until).schema.fieldNames.toSeq.map(col)
    val feed = t.readChangeFeed(spark, since, until)
    val ins = feed.filter($"_change_type" === "insert").select(cols: _*)
    val del = feed.filter($"_change_type" === "delete").select(cols: _*)
    val folded = t.read(spark, since).select(cols: _*).unionAll(ins).exceptAll(del)
    val target = t.read(spark, until).select(cols: _*)
    assert(folded.exceptAll(target).count() === 0L,
      s"fold($since->$until) has rows the target lacks")
    assert(target.exceptAll(folded).count() === 0L,
      s"target($until) has rows the fold lacks")
  }

  private def commitText(t: GraftTable, v: Long): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t.tablePath, "_graft_log",
        "%020d.json".format(v))), "UTF-8")

  private def changeDir(t: GraftTable) =
    new java.io.File(t.tablePath, "_change")

  private def changeFiles(t: GraftTable): Seq[String] = {
    val d = changeDir(t)
    if (!d.exists()) Nil
    else d.listFiles().map(_.getName).toSeq.filter(_.endsWith(".parquet"))
  }

  test("appends serve as inserts with no change bytes; fold holds") {
    val t = enabled("append")
    t.append(Seq((200L, "x", 1L), (201L, "y", 2L)).toDF("id", "name", "b"))
    val feed = t.readChangeFeed(spark, 2) // since the setProperty commit
    assert(feed.count() === 2L)
    assert(feed.select("_change_type").distinct().as[String].collect().toSeq === Seq("insert"))
    assert(changeFiles(t).isEmpty)
    assertFold(t, 1, t.latestVersion())
  }

  test("upsert: an updated key is one delete + one insert; new keys insert") {
    val t = enabled("upsert")
    val head = t.latestVersion()
    t.upsert(
      Seq((7L, "SEVEN", 99L, 1L, false), (500L, "new", 0L, 1L, false))
        .toDF("id", "name", "b", "_seq", "_deleted"),
      "id", "_seq")
    val v = t.latestVersion()
    val feed = t.readChangeFeed(spark, head, v)
    val byType = feed.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    // key 7: old row deleted + new row inserted; key 500: inserted.
    // Unchanged rows carried through the rewrite MUST cancel out.
    assert(byType === Map("delete" -> 1L, "insert" -> 2L))
    val del = feed.filter($"_change_type" === "delete")
      .select("id", "name").as[(Long, String)].collect().toSeq
    assert(del === Seq((7L, "n7")))
    assertFold(t, head, v)
  }

  test("upsert delete-key emits only deletes; net-zero upsert emits nothing") {
    val t = enabled("upsertdel")
    val head = t.latestVersion()
    t.upsert(Seq((3L, "n3", 3L, 1L, true)).toDF("id", "name", "b", "_seq", "_deleted"),
      "id", "_seq")
    val v1 = t.latestVersion()
    val feed1 = t.readChangeFeed(spark, head, v1)
    assert(feed1.select("_change_type", "id").as[(String, Long)].collect().toSeq
      === Seq(("delete", 3L)))
    // re-writing an identical row is a rewrite with EMPTY net change
    t.upsert(Seq((8L, "n8", 3L, 1L, false)).toDF("id", "name", "b", "_seq", "_deleted"),
      "id", "_seq")
    val v2 = t.latestVersion()
    assert(t.readChangeFeed(spark, v1, v2).count() === 0L)
    assertFold(t, head, v2)
  }

  test("range delete: metadata drops are zero-write cdcfull refs") {
    val t = freshTable("rangedel")
    // one file per bucket so a whole-bucket delete is a pure metadata drop
    (0L until 4L).foreach { bkt =>
      t.append((0L until 50L).map(i => (bkt * 100 + i, bkt)).toDF("id", "bkt")
        .coalesce(1))
    }
    t.setProperty("cdf.enabled", "true")
    val head = t.latestVersion()
    val (dropped, rewritten, v) = t.delete(spark, "bkt", Some(1L), Some(1L))
    assert(dropped === 1 && rewritten === 0)
    // the drop staged NOTHING — the commit references the dropped file itself
    assert(changeFiles(t).isEmpty)
    assert(commitText(t, v).contains("\"cdcfull\""))
    val feed = t.readChangeFeed(spark, head, v)
    assert(feed.count() === 50L)
    assert(feed.select("_change_type").distinct().as[String].collect().toSeq === Seq("delete"))
    assertFold(t, head, v)
  }

  test("range delete: straddling rewrite stages only the net deletes") {
    val t = enabled("straddle")
    val head = t.latestVersion()
    val (_, rewritten, v) = t.delete(spark, "id", Some(10L), Some(19L))
    assert(rewritten > 0)
    val feed = t.readChangeFeed(spark, head, v)
    assert(feed.count() === 10L) // survivors carried through cancel out
    assert(feed.select("id").as[Long].collect().toSet === (10L until 20L).toSet)
    // staged change bytes hold exactly the net rows, not the rewrites
    val stagedRows = spark.read.parquet(
      changeFiles(t).map(n => s"${t.tablePath}/_change/$n"): _*).count()
    assert(stagedRows === 10L)
    assertFold(t, head, v)
  }

  test("merge-on-read deleteRows feeds the matched rows as deletes") {
    val t = enabled("mor")
    val head = t.latestVersion()
    val (dvFiles, _, rows, v) = t.deleteRows(spark, "id % 10 = 0")
    assert(dvFiles > 0 && rows === 10L)
    val feed = t.readChangeFeed(spark, head, v)
    assert(feed.filter($"_change_type" === "delete").count() === 10L)
    assert(feed.count() === 10L)
    assertFold(t, head, v)
    // a second overlapping delete must not re-feed already-dead rows
    val (_, _, rows2, v2) = t.deleteRows(spark, "id % 5 = 0")
    assert(rows2 === 10L) // the %10 rows are already gone
    assert(t.readChangeFeed(spark, v, v2).count() === 10L)
    assertFold(t, head, v2)
  }

  test("truncate is a zero-write all-delete feed") {
    val t = enabled("trunc")
    val head = t.latestVersion()
    val v = t.truncate()
    assert(changeFiles(t).isEmpty)
    val feed = t.readChangeFeed(spark, head, v)
    assert(feed.count() === 100L)
    assert(feed.select("_change_type").distinct().as[String].collect().toSeq === Seq("delete"))
    assertFold(t, head, v)
  }

  test("overwrite and restore serve exactly from the commit lists — even without cdf.enabled") {
    val t = freshTable("overwrite")
    t.append((0L until 20L).map(i => (i, s"a$i")).toDF("id", "name"))
    val v1 = t.latestVersion()
    t.overwrite((10L until 25L).map(i => (i, s"b$i")).toDF("id", "name"))
    val v2 = t.latestVersion()
    val feed = t.readChangeFeed(spark, v1, v2)
    assert(feed.filter($"_change_type" === "delete").count() === 20L)
    assert(feed.filter($"_change_type" === "insert").count() === 15L)
    assertFold(t, v1, v2)
    val v3 = t.restore(v1)
    assertFold(t, v2, v3)
    assertFold(t, v1, v3) // net across overwrite+restore is zero… as a fold
  }

  test("restore that reverts a deletion vector feeds the same-path re-add as delete+insert") {
    val t = enabled("restoredv")
    val preDelete = t.latestVersion()
    val (dvFiles, _, rows, vDel) = t.deleteRows(spark, "id < 10")
    assert(dvFiles > 0 && rows === 10L)
    val vRestore = t.restore(preDelete)
    // the restored version re-adds the SAME paths with their DVs
    // reverted — the feed must net to exactly the resurrected rows
    val feed = t.readChangeFeed(spark, vDel, vRestore)
    val ins = feed.filter($"_change_type" === "insert").select("id")
    val del = feed.filter($"_change_type" === "delete").select("id")
    val net = ins.exceptAll(del).as[Long].collect().toSet
    assert(net === (0L until 10L).toSet,
      "restore must resurrect exactly the DV'd rows through the feed")
    assert(del.exceptAll(ins).count() === 0L)
    assertFold(t, vDel, vRestore)
    assertFold(t, preDelete, vRestore) // full circle nets to zero
  }

  test("row-neutral maintenance feeds nothing; fold crosses it") {
    val t = enabled("neutral")
    val head = t.latestVersion()
    t.append(Seq((300L, "z", 0L)).toDF("id", "name", "b"))
    val (_, _, cv) = t.compact(spark)
    assert(t.readChangeFeed(spark, cv - 1, cv).count() === 0L)
    assertFold(t, head, t.latestVersion())
  }

  test("a rewrite written while the feed was OFF fails the read loudly; remove-only deletes still serve") {
    val t = freshTable("off")
    t.append((0L until 30L).map(i => (i, i % 3)).toDF("id", "bkt").coalesce(1))
    val v1 = t.latestVersion()
    t.upsert(Seq((1L, 9L, 1L, false)).toDF("id", "bkt", "_seq", "_deleted"),
      "id", "_seq")
    val ex = intercept[IllegalStateException](
      t.readChangeFeed(spark, v1).count())
    assert(ex.getMessage.contains("cdf.enabled"))
    // pre-enablement TRUNCATE is remove-only — self-describing, serves fine
    val t2 = freshTable("off2")
    t2.append((0L until 10L).map(i => (i, s"x$i")).toDF("id", "name"))
    val tv1 = t2.latestVersion()
    val tv2 = t2.truncate()
    assert(t2.readChangeFeed(spark, tv1, tv2).count() === 10L)
    assertFold(t2, tv1, tv2)
  }

  test("SQL surface: graft_table_changes table function") {
    graft.engine.GraftFunctions.register(spark)
    val t = enabled("tvf")
    val head = t.latestVersion()
    t.delete(spark, "id", Some(0L), Some(9L))
    val got = spark.sql(
      s"SELECT _change_type, count(*) AS n FROM " +
        s"graft_table_changes('${t.tablePath}', $head) GROUP BY 1")
      .as[(String, Long)].collect().toMap
    assert(got === Map("delete" -> 10L))
    // until-bounded form pins the window
    assert(spark.sql(
      s"SELECT count(*) FROM graft_table_changes('${t.tablePath}', 0, 1)")
      .as[Long].head() === 100L)
  }

  test("graft_table_changes resolves catalog identifiers against the warehouse") {
    graft.engine.GraftFunctions.register(spark)
    val wh = new java.io.File(
      s"target/tmp/cdf_cat_${java.util.UUID.randomUUID().toString.take(8)}")
      .getAbsolutePath
    val cat = s"gcdf${math.abs(wh.hashCode).toString.take(6)}"
    graft.api.Graft.registerCatalog(spark, cat, wh)
    try {
      spark.sql(s"CREATE TABLE $cat.d.t (id BIGINT, v STRING)")
      spark.sql(s"INSERT INTO $cat.d.t VALUES (1, 'a'), (2, 'b')")
      val rows = spark.sql(
        s"SELECT id, _change_type FROM graft_table_changes('$cat.d.t', 0)")
        .as[(Long, String)].collect().toSet
      assert(rows === Set((1L, "insert"), (2L, "insert")))
      // escape attempts and unknown catalogs refuse loudly
      val ex = intercept[Exception](
        spark.sql(s"SELECT * FROM graft_table_changes('$cat..secret', 0)").collect())
      assert(ex.getMessage.contains("illegal identifier segment"))
      val ex2 = intercept[Exception](
        spark.sql("SELECT * FROM graft_table_changes('nosuch.d.t', 0)").collect())
      assert(ex2.getMessage.contains("no catalog named"))
      // a 2-segment 'cat.t' must refuse loudly, not silently resolve to
      // <warehouse>/t with the database level skipped
      val ex3 = intercept[Exception](
        spark.sql(s"SELECT * FROM graft_table_changes('$cat.t', 0)").collect())
      assert(ex3.getMessage.contains("all three segments required"))
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  test("updateImages re-tags an upsert's paired rows; unpaired and keyless commits keep net tags") {
    val t = enabled("img")
    val v0 = t.latestVersion()
    // one upsert: update ids 0..9 (value change), drop ids 90..94,
    // insert brand-new ids 200..204
    val changes =
      ((0L until 10L).map(i => (i, s"upd$i", i % 5, 1L, false)) ++
        (90L until 95L).map(i => (i, s"n$i", i % 5, 1L, true)) ++
        (200L until 205L).map(i => (i, s"new$i", i % 5, 1L, false)))
        .toDF("id", "name", "b", "_seq", "_deleted")
    t.upsert(changes, "id", "_seq")
    // a second, NET-only consumer contract must be unchanged by default
    val net = t.readChangeFeed(spark, v0).groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(net === Map("insert" -> 15L, "delete" -> 15L))
    // with images: the 10 updated keys pair up; drops/new keys keep tags
    val img = t.readChangeFeed(spark, v0, updateImages = true)
    val byTag = img.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byTag === Map("update_preimage" -> 10L, "update_postimage" -> 10L,
      "delete" -> 5L, "insert" -> 5L))
    // the postimage rows carry the NEW values, preimage the OLD
    assert(img.filter($"_change_type" === "update_postimage")
      .select("name").as[String].collect().forall(_.startsWith("upd")))
    assert(img.filter($"_change_type" === "update_preimage")
      .select("name").as[String].collect().forall(_.startsWith("n")))
    // the upsert commit RECORDS its merge key in the log info line
    assert(commitText(t, t.latestVersion()).contains("\"key\":\"id\""))
    // a non-upsert mutation (range delete) has no recorded key: its
    // rows keep net tags even under updateImages
    t.delete(spark, "id", Some(10L), Some(19L))
    val afterDel = t.readChangeFeed(spark, t.latestVersion() - 1,
      updateImages = true)
    assert(afterDel.select("_change_type").distinct()
      .as[String].collect().toSet === Set("delete"))
    // SQL surface: 4th TVF argument
    graft.engine.GraftFunctions.register(spark)
    val sqlTags = spark.sql(
      s"SELECT _change_type, count(*) AS n FROM graft_table_changes(" +
        s"'${t.tablePath}', $v0, ${v0 + 1}, true) GROUP BY 1")
      .as[(String, Long)].collect().toMap
    assert(sqlTags === byTag)
  }

  test("commitTimestamps appends each row's commit wall-clock stamp") {
    val t = enabled("cts")
    val v0 = t.latestVersion()
    t.append((100L until 110L).map(i => (i, s"n$i", i % 5)).toDF("id", "name", "b"))
    t.delete(spark, "id", Some(0L), Some(9L))
    // default schema is UNCHANGED — existing consumers see no new column
    assert(!t.readChangeFeed(spark, v0).columns.contains("_commit_ts"))
    val feed = t.readChangeFeed(spark, v0, commitTimestamps = true)
    assert(feed.columns.takeRight(2).toSeq ===
      Seq("_commit_version", "_commit_ts"))
    // every row's stamp equals ITS commit's history stamp, exactly
    val stamps = t.historyFull().flatMap(h => h._5.map(h._1 -> _)).toMap
    val rows = feed.select("_commit_version", "_commit_ts")
      .distinct().collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    assert(rows.nonEmpty && rows.forall { case (v, ms) => stamps(v) == ms },
      s"feed stamps $rows must match history $stamps")
  }

  test("updateImages skips commits whose recorded key was renamed away") {
    val t = enabled("imgren")
    val v0 = t.latestVersion()
    t.upsert(Seq((3L, "x", 0L, 1L, false)).toDF("id", "name", "b", "_seq", "_deleted"),
      "id", "_seq")
    t.renameColumn("id", "ident")
    // the upsert commit's recorded key 'id' no longer exists under the
    // until-schema — pairing must be skipped (net tags), not mis-join
    val feed = t.readChangeFeed(spark, v0, updateImages = true)
    assert(feed.select("_change_type").distinct()
      .as[String].collect().toSet === Set("insert", "delete"))
    assert(feed.count() === 2L)
  }

  test("vacuum retires change files past retention and keeps the window; behind-window read fails loudly") {
    val t = enabled("vacuum")
    t.delete(spark, "id", Some(10L), Some(19L)) // stages a change file
    val vDel = t.latestVersion()
    assert(changeFiles(t).nonEmpty)
    // push the delete outside a 2-version retention window
    (0 until 3).foreach(i =>
      t.append(Seq((1000L + i, "pad", 0L)).toDF("id", "name", "b")))
    // age guard first: with the default in-flight protection window, a
    // vacuum must NOT sweep seconds-old change files even when they sit
    // outside version retention — they could be a racing writer's
    // just-staged cdc output
    t.vacuum(2)
    assert(changeFiles(t).nonEmpty,
      "default vacuum must retain young change files (in-flight guard)")
    t.setProperty(graft.medallion.TxLog.VacuumCdcMinAgeProp, "0")
    t.vacuum(2)
    assert(changeFiles(t).isEmpty)
    val ex = intercept[IllegalArgumentException](
      t.readChangeFeed(spark, vDel - 1, vDel).count())
    assert(ex.getMessage.contains("retention"))
    // inside the window everything still serves
    assert(t.readChangeFeed(spark, vDel).count() === 3L)
  }
}
