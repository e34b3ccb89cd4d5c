package graft

import graft.medallion.{GraftTable, TxLog}
import graft.streaming.GraftCatalog
import org.apache.spark.sql.functions._

/** Column rename/drop as schema-only commits (Delta-style name mapping):
  * the data files keep their immutable PHYSICAL column names; the
  * logical schema re-points through per-field metadata. At 100 TB the
  * difference is one log commit vs a full-table rewrite. Covers the
  * whole surface: programmatic + SQL ALTER, reads (TxLog + DSv2 +
  * catalog), stats pruning under the mapping, row-level DML on renamed
  * columns, time travel to pre-rename schemas, drop-then-re-add
  * resurrection safety, compaction laundering dropped bytes out. */
class ColumnMappingSpec extends SparkSpec {

  private def freshTable(tag: String): GraftTable = {
    val dir = new java.io.File(
      s"target/tmp/colmap_${tag}_${java.util.UUID.randomUUID().toString.take(8)}")
    new GraftTable(dir.getAbsolutePath)
  }

  private def df3(rows: Seq[(Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("id", "name", "score")
  }

  test("rename is a schema-only commit; reads, appends and pruning follow") {
    val t = freshTable("rename")
    t.append(df3(Seq((1L, "a", 1.5), (2L, "b", 2.5))).coalesce(1))
    val filesBefore = t.snapshot().files.map(_.path).toSet

    t.renameColumn("name", "label")
    assert(t.history().head._2 === "renameColumn")
    assert(t.snapshot().files.map(_.path).toSet === filesBefore,
      "rename rewrites zero data files")
    assert(t.read(spark).columns.toSeq === Seq("id", "label", "score"))
    assert(t.read(spark).select("label").collect().map(_.getString(0)).toSet
      === Set("a", "b"))

    // appends of NEW logical frames land under the OLD physical name
    t.append(df3(Seq((3L, "c", 3.5))).toDF("id", "label", "score").coalesce(1))
    assert(t.read(spark).count() === 3L)
    assert(t.read(spark).filter(col("label") === "c").count() === 1L)

    // stats pruning speaks the logical name, resolves the physical key
    assert(t.filesForRange("id", Some(3L), Some(3L)) === 1,
      "the renamed table still prunes by stats")
    // the new file's stats are keyed by the PHYSICAL name
    val newFile = t.snapshot().files.filterNot(f => filesBefore(f.path)).head
    assert(newFile.stats.contains("name") && !newFile.stats.contains("label"),
      "post-rename files keep writing the immutable physical column")
  }

  test("renameColumn refuses unknown, colliding, and constrained columns") {
    val t = freshTable("refuse")
    t.append(df3(Seq((1L, "a", 1.0))))
    intercept[IllegalArgumentException](t.renameColumn("nope", "x"))
    intercept[IllegalArgumentException](t.renameColumn("name", "SCORE"))
    t.addConstraint(spark, "pos", "score > 0")
    val e = intercept[IllegalArgumentException](t.renameColumn("score", "s2"))
    assert(e.getMessage.contains("pos"))
    t.dropConstraint("pos")
    t.renameColumn("score", "s2")
    assert(t.read(spark).columns.contains("s2"))
  }

  test("drop is schema-only; re-add never resurrects dropped bytes") {
    val t = freshTable("drop")
    t.append(df3(Seq((1L, "secret", 9.0), (2L, "hidden", 8.0))).coalesce(1))
    val filesBefore = t.snapshot().files.map(_.path).toSet

    t.dropColumn("name")
    assert(t.history().head._2 === "dropColumn")
    assert(t.snapshot().files.map(_.path).toSet === filesBefore,
      "drop rewrites zero data files")
    assert(t.read(spark).columns.toSeq === Seq("id", "score"))

    // re-adding the same logical name yields NULLs, not the old bytes
    t.addColumns(Seq(org.apache.spark.sql.types.StructField(
      "name", org.apache.spark.sql.types.StringType, nullable = true)))
    val back = t.read(spark).select("id", "name").collect()
    assert(back.forall(_.isNullAt(1)),
      "dropped data must not resurrect under a re-added name")

    // a full rewrite launders the dead bytes out of the files entirely
    t.compact(spark)
    val physNames = t.snapshot().files.flatMap(_.stats.keys).toSet
    assert(!physNames.contains("name"),
      s"post-compact files carry no trace of the dropped physical column: $physNames")
    // the re-added column has a FRESH physical name
    val f = t.snapshot().schema.fields.find(_.name == "name").get
    assert(TxLog.physicalName(f) !== "name")
  }

  test("dropColumn refuses the last column and constrained columns") {
    import spark.implicits._
    val t = freshTable("droprefuse")
    t.append(Seq(1L, 2L).toDF("id"))
    intercept[IllegalArgumentException](t.dropColumn("id"))
    val t2 = freshTable("droprefuse2")
    t2.append(df3(Seq((1L, "a", 1.0))))
    t2.addConstraint(spark, "pos", "score > 0")
    intercept[IllegalArgumentException](t2.dropColumn("score"))
  }

  test("SQL: ALTER TABLE RENAME/DROP COLUMN + DML on the mapped table") {
    import spark.implicits._
    val wh = new java.io.File(
      s"target/tmp/colmap_sql_${java.util.UUID.randomUUID().toString.take(8)}")
      .getAbsolutePath
    val cat = s"cm${java.util.UUID.randomUUID().toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, payload STRING, score DOUBLE)")
      val t = new GraftTable(s"$wh/db/t")
      t.append(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
        .toDF("id", "payload", "score"))
      val preRenameVersion = t.latestVersion()

      spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN payload TO body")
      assert(spark.sql(s"SELECT body FROM $cat.db.t WHERE id = 2").head()
        .getString(0) === "b")
      // pushed filter on the renamed column still reads correct rows
      assert(spark.sql(s"SELECT id FROM $cat.db.t WHERE body = 'c'").head()
        .getLong(0) === 3L)
      // metadata-only aggregates resolve through the mapping
      assert(spark.sql(s"SELECT count(body), max(body) FROM $cat.db.t").head()
        .toSeq === Seq(3L, "c"))

      // row-level DML against the renamed column
      spark.sql(s"UPDATE $cat.db.t SET body = 'B' WHERE id = 2")
      assert(spark.sql(s"SELECT body FROM $cat.db.t ORDER BY id").collect()
        .map(_.getString(0)).toSeq === Seq("a", "B", "c"))
      spark.sql(s"DELETE FROM $cat.db.t WHERE body = 'a'")
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").head().getLong(0) === 2L)

      // INSERT INTO under the new logical name
      spark.sql(s"INSERT INTO $cat.db.t VALUES (4, 'd', 4.0)")
      assert(spark.sql(s"SELECT body FROM $cat.db.t WHERE id = 4").head()
        .getString(0) === "d")

      // time travel BEFORE the rename sees the old logical name
      val old = spark.sql(
        s"SELECT * FROM $cat.db.t VERSION AS OF $preRenameVersion")
      assert(old.columns.contains("payload") && !old.columns.contains("body"))

      // DROP COLUMN through SQL
      spark.sql(s"ALTER TABLE $cat.db.t DROP COLUMN score")
      assert(!spark.sql(s"SELECT * FROM $cat.db.t").columns.contains("score"))
      assert(spark.sql(s"SELECT id, body FROM $cat.db.t ORDER BY id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
        === Seq((2L, "B"), (3L, "c"), (4L, "d")))
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  test("upsert + range delete + zorder keep working on a mapped table") {
    val t = freshTable("ops")
    t.append(df3(Seq((1L, "a", 1.0), (2L, "b", 2.0))).coalesce(1))
    t.renameColumn("score", "weight")
    // keyed upsert on the (unrenamed) key of a mapped table
    import spark.implicits._
    val changes = Seq((2L, "b2", 2.2, 10L, false), (3L, "c", 3.0, 10L, false))
      .toDF("id", "name", "weight", "_seq", "_deleted")
    t.upsert(changes, "id", "_seq")
    assert(t.read(spark).orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      === Seq((1L, "a", 1.0), (2L, "b2", 2.2), (3L, "c", 3.0)))
    // metadata range delete on the renamed column routes through stats
    t.delete(spark, "weight", Some(2.0), Some(2.5))
    assert(t.read(spark).select("id").collect().map(_.getLong(0)).toSet
      === Set(1L, 3L))
    // zorder rewrite keeps rows and stays readable
    t.optimizeZorder(spark, Seq("id", "weight"), targetFiles = 2)
    assert(t.read(spark).select("id").collect().map(_.getLong(0)).toSet
      === Set(1L, 3L))
    // readRange on the renamed column prunes by the physical stats key
    assert(t.readRange(spark, "weight", Some(2.9), Some(3.1))
      .select("id").collect().map(_.getLong(0)).toSet === Set(3L))
  }

  test("streaming tail with a pinned schema crosses a rename untouched") {
    val t = freshTable("tail")
    t.append(df3(Seq((1L, "a", 1.0))).coalesce(1))
    val pinned = t.snapshot().schema
    t.renameColumn("name", "label")
    t.append(df3(Seq((2L, "b", 2.0))).toDF("id", "label", "score").coalesce(1))
    // a consumer that declared its schema before the rename keeps its
    // OLD logical names and still resolves the same physical bytes
    val tail = t.appendsSince(spark, 0L, readSchema = Some(pinned))
    assert(tail.columns.toSeq === Seq("id", "name", "score", "_commit_version"))
    assert(tail.select("name").collect().map(_.getString(0)).toSet
      === Set("a", "b"))
  }

  test("mergeSchema append refuses new columns on a mapped table") {
    val t = freshTable("merge")
    t.append(df3(Seq((1L, "a", 1.0))))
    t.renameColumn("name", "label")
    import spark.implicits._
    val widened = Seq((2L, "b", 2.0, "x"))
      .toDF("id", "label", "score", "extra")
    val e = intercept[Exception](t.append(widened, mergeSchema = true, 20))
    assert(e.getMessage.contains("addColumns"))
  }

  test("deleteRows (deletion vectors) on a RENAMED predicate column") {
    import spark.implicits._
    val t = freshTable("dvrename")
    (0 until 3).foreach(f =>
      t.append((0L until 90L).filter(_ % 3 == f)
        .map(i => (i, s"n$i", i / 10.0)).toDF("id", "name", "score")
        .coalesce(1)))
    t.renameColumn("id", "ident")
    val before = t.snapshot().files.map(_.path).toSet
    // the MOR delete's condition speaks the NEW logical name; matching,
    // bitmap build and the existing-DV anti-join all translate through
    // the mapping to the immutable physical column
    val (dvFiles, rewrites, rows, _) = t.deleteRows(spark, "ident % 10 = 4")
    assert(dvFiles === 3 && rewrites === 0 && rows === 9L)
    assert(t.snapshot().files.map(_.path).toSet === before)
    assert(t.read(spark).select("ident").as[Long].collect().toSet ===
      (0L until 90L).filterNot(_ % 10 == 4).toSet)
    // second delete on the same mapped table ORs in (anti-join path)
    val (_, _, rows2, _) = t.deleteRows(spark, "ident < 10 AND ident % 10 <> 4")
    assert(rows2 === 9L)
    assert(t.read(spark).count() === 72L)
    // purge launders the DVs under the mapping too
    t.purgeDeletes(spark)
    assert(t.snapshot().files.forall(_.dv.isEmpty))
    assert(t.read(spark).count() === 72L)
  }

  test("Bloom point-lookup pruning survives a RENAME of the bloomed column") {
    import spark.implicits._
    val t = freshTable("bloomrename")
    t.append(Seq((0L, "seed", 0.0)).toDF("id", "name", "score"))
    t.setProperty(TxLog.BloomColumnsProp, "id")
    // scattered EVEN ids round-robin over 8 files: every file's
    // [min,max] covers every probe — only the Bloom bitsets can prune
    (0 until 8).foreach(f =>
      t.append((0L until 512L).filter(_ % 8 == f)
        .map(k => (k * 2L, s"n$k", 0.0)).toDF("id", "name", "score")
        .coalesce(1)))
    t.renameColumn("id", "ident")
    // build side already translated (stats under the physical name);
    // the PROBE side must translate the renamed logical name too
    val n = t.filesForRange("ident", Some(500L), Some(500L))
    assert(n >= 1 && n <= 4,
      s"present-key probe must Bloom-prune after the rename, planned $n")
    assert(t.readRange(spark, "ident", Some(500L), Some(500L)).count() === 1L)
    // an ODD id is absent-but-in-range for every file: bitsets prune
    // what min/max kept — proven on the RENAMED name
    assert(t.filesForRange("ident", Some(501L), Some(501L)) <= 2)
    assert(t.readRange(spark, "ident", Some(501L), Some(501L)).count() === 0L)
  }

  test("CDF read across a RENAME commit attributes changes in the until-schema") {
    import spark.implicits._
    val t = freshTable("cdfrename")
    t.append((0L until 20L).map(i => (i, s"n$i", 0.0))
      .toDF("id", "name", "score"))
    t.setProperty(TxLog.CdfEnabledProp, "true")
    val v0 = t.latestVersion()
    t.upsert(Seq((3L, "x", 9.9, 1L, false))
      .toDF("id", "name", "score", "_seq", "_deleted"), "id", "_seq")
    t.renameColumn("name", "label") // schema-only commit INSIDE the window
    t.upsert(Seq((4L, "y", 8.8, 1L, false))
      .toDF("id", "label", "score", "_seq", "_deleted"), "id", "_seq")
    val feed = t.readChangeFeed(spark, v0)
    // the whole window reads under the UNTIL schema's logical names —
    // including the pre-rename commit's change files
    assert(feed.columns.contains("label") && !feed.columns.contains("name"))
    val byVersion = feed.groupBy("_commit_version").count()
      .as[(Long, Long)].collect().toMap
    assert(byVersion === Map((v0 + 1) -> 2L, (v0 + 3) -> 2L),
      s"rename commit must feed nothing, upserts pair: $byVersion")
    assert(feed.filter($"_change_type" === "insert" && $"id" === 3L)
      .select("label").as[String].head() === "x")
    // updateImages pairs BOTH upserts: the recorded key 'id' survived
    // the rename of a NON-key column
    val img = t.readChangeFeed(spark, v0, updateImages = true)
    assert(img.groupBy("_change_type").count().as[(String, Long)]
      .collect().toMap ===
      Map("update_preimage" -> 2L, "update_postimage" -> 2L))
  }
}
