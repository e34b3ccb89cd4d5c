package graft

import graft.medallion.{GraftTable, TxLog}
import org.apache.spark.sql.functions._

/** CHECK constraints (write-time data-quality enforcement on the table
  * format) and RESTORE (one-commit rollback to a prior version).
  */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String): GraftTable = {
    val dir = new java.io.File(s"target/tmp/constraints_$tag")
    graft.core.Fs.rmTree(dir)
    new GraftTable(dir.getAbsolutePath)
  }

  private def df(rows: (Long, String)*) = rows.toDF("id", "name")

  test("addConstraint validates existing rows; a violating table refuses the add") {
    val t = freshTable("addv")
    t.append(df(1L -> "a", -5L -> "b"))
    val e = intercept[IllegalStateException](
      t.addConstraint(spark, "id_pos", "id > 0"))
    assert(e.getMessage.contains("id_pos"))
    assert(t.constraints.isEmpty, "failed add must not commit")
    // after removing the violator it registers
    t.truncate()
    t.append(df(1L -> "a"))
    t.addConstraint(spark, "id_pos", "id > 0")
    assert(t.constraints == Map("id_pos" -> "id > 0"))
  }

  test("append enforces: a violating batch throws, commits nothing, stages nothing visible") {
    val t = freshTable("enforce")
    t.append(df(1L -> "a"))
    t.addConstraint(spark, "id_pos", "id > 0")
    val before = t.latestVersion()
    val e = intercept[IllegalStateException](t.append(df(2L -> "ok", 0L -> "bad")))
    assert(e.getMessage.contains("id_pos"))
    assert(t.latestVersion() == before, "violating append must not commit")
    assert(t.read(spark).as[(Long, String)].collect().toSet == Set(1L -> "a"))
    // a clean batch still lands
    t.append(df(2L -> "ok"))
    assert(t.read(spark).count() == 2L)
  }

  test("NULL passes (SQL CHECK semantics); duplicate name refused; drop re-allows") {
    val t = freshTable("nullpass")
    t.append(Seq((1L, Some("a"))).toDF("id", "name"))
    t.addConstraint(spark, "name_long", "length(name) >= 1")
    // NULL name evaluates the check to NULL, which PASSES
    t.append(Seq((2L, None: Option[String])).toDF("id", "name"))
    assert(t.read(spark).count() == 2L)
    // empty string evaluates FALSE → violation
    intercept[IllegalStateException](t.append(Seq((3L, Some(""))).toDF("id", "name")))
    intercept[IllegalArgumentException](
      t.addConstraint(spark, "name_long", "length(name) >= 2"))
    intercept[IllegalArgumentException](t.dropConstraint("nope"))
    t.dropConstraint("name_long")
    assert(t.constraints.isEmpty)
    t.append(Seq((3L, Some(""))).toDF("id", "name")) // enforcement gone
    assert(t.read(spark).count() == 3L)
  }

  test("upsert enforces on the WRITTEN rows; a violating change drops its staged files") {
    val t = freshTable("upsert")
    t.append(df(1L -> "a", 2L -> "b"))
    t.addConstraint(spark, "id_small", "id < 100")
    val before = t.latestVersion()
    val bad = Seq((150L, "new", 1L, false)).toDF("id", "name", "_seq", "_deleted")
    intercept[IllegalStateException](t.upsert(bad, "id", "_seq"))
    assert(t.latestVersion() == before)
    val ok = Seq((50L, "new", 1L, false)).toDF("id", "name", "_seq", "_deleted")
    t.upsert(ok, "id", "_seq")
    assert(t.read(spark).count() == 3L)
  }

  test("a mergeSchema batch omitting a constrained column passes (NULL passes)") {
    val t = freshTable("mergecol")
    t.append(df(1L -> "a"))
    t.addConstraint(spark, "name_nonempty", "length(name) >= 1")
    // widen with a new column while OMITTING the constrained one: the
    // staged rows read NULL for name, which passes SQL CHECK semantics
    t.append(Seq((2L, 7.5)).toDF("id", "score"), mergeSchema = true, maxRetries = 20)
    assert(t.read(spark).count() == 2L)
    // the constraint still bites on a present-and-violating value
    intercept[IllegalStateException](
      t.append(Seq((3L, Some(""))).toDF("id", "name"),
        mergeSchema = true, maxRetries = 20))
  }

  test("constraints survive checkpoint resolution and appear to fresh handles") {
    val t = freshTable("ckpt")
    t.append(df(1L -> "a"))
    t.addConstraint(spark, "id_pos", "id > 0")
    t.checkpoint()
    t.append(df(2L -> "b"))
    val fresh = new GraftTable(t.tablePath)
    assert(fresh.constraints == Map("id_pos" -> "id > 0"))
    intercept[IllegalStateException](fresh.append(df(-1L -> "bad")))
  }

  test("restore: one commit returns the table to a prior version's rows and files") {
    val t = freshTable("restore")
    t.append(df(1L -> "a", 2L -> "b"))                      // v1
    val v1 = t.latestVersion()
    t.append(df(3L -> "c"))                                 // v2
    t.upsert(Seq((2L, "B", 1L, false)).toDF("id", "name", "_seq", "_deleted"),
      "id", "_seq")                                         // v3 rewrite
    assert(t.read(spark).as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 2L -> "B", 3L -> "c"))
    val rv = t.restore(v1)
    assert(rv == 4L)
    // head content == v1 content, and time travel to the pre-restore head still works
    assert(t.read(spark).as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 2L -> "b"))
    assert(t.read(spark, 3L).as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 2L -> "B", 3L -> "c"))
    // restoring to the current head is a no-op (no empty commit)
    assert(t.restore(t.latestVersion()) == 4L)
    assert(t.latestVersion() == 4L)
  }

  test("constraints surface as table properties through the SQL catalog") {
    val wh = new java.io.File(
      s"target/tmp/conscat_${java.util.UUID.randomUUID().toString.take(8)}")
      .getAbsolutePath
    spark.conf.set("spark.sql.catalog.ctest",
      classOf[graft.streaming.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ctest.warehouse", wh)
    try {
      spark.sql("CREATE TABLE ctest.db.t (id BIGINT, name STRING)")
      val t = new GraftTable(s"$wh/db/t")
      t.append(df(1L -> "a"))
      t.addConstraint(spark, "id_pos", "id > 0")
      val props = spark.sql("DESCRIBE TABLE EXTENDED ctest.db.t")
        .collect().map(_.toString).mkString("\n")
      assert(props.contains("constraint.id_pos") && props.contains("id > 0"),
        s"DESCRIBE EXTENDED must surface the CHECK constraint:\n$props")
      // SQL management via the standard property channel
      spark.sql(
        "ALTER TABLE ctest.db.t SET TBLPROPERTIES ('constraint.id_small' = 'id < 1000')")
      assert(t.constraints.keySet == Set("id_pos", "id_small"))
      intercept[Exception](t.append(df(5000L -> "too-big")))
      // SET of a constraint the existing data violates is refused
      intercept[Exception](spark.sql(
        "ALTER TABLE ctest.db.t SET TBLPROPERTIES ('constraint.impossible' = 'id > 100')"))
      assert(!t.constraints.contains("impossible"))
      spark.sql("ALTER TABLE ctest.db.t UNSET TBLPROPERTIES ('constraint.id_small')")
      assert(t.constraints.keySet == Set("id_pos"))
      t.append(df(5000L -> "ok-now"))
      // the history metadata table reads the commit log as SQL rows
      val hist = spark.sql(
        "SELECT version, op FROM ctest.db.t.history ORDER BY version")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(hist == Seq((1L, "create"), (2L, "append"), (3L, "addConstraint"),
        (4L, "addConstraint"), (5L, "dropConstraint"), (6L, "append")),
        s"history metadata table mismatch: $hist")
      // and its plan is metadata-only (LocalScan, no file read)
      val histPlan = spark.sql("SELECT * FROM ctest.db.t.history")
        .queryExecution.executedPlan.toString
      assert(histPlan.contains("LocalTableScan") || histPlan.contains("metadata-only"),
        s"history must resolve driver-side from the log:\n$histPlan")
    } finally {
      spark.conf.unset("spark.sql.catalog.ctest")
      spark.conf.unset("spark.sql.catalog.ctest.warehouse")
    }
  }

  test("restore reverts the constraint set with the data") {
    val t = freshTable("restorecons")
    t.append(df(1L -> "a"))                                 // v1: no constraints
    t.addConstraint(spark, "id_pos", "id > 0")              // v2
    t.restore(1L)                                           // v3
    assert(t.constraints.isEmpty,
      "a pre-constraint version must restore WITHOUT the later constraint")
    t.append(df(-1L -> "ok-now"))                           // enforcement gone
    assert(t.read(spark).count() == 2L)
  }

  test("restore is a rewrite for tailing consumers; vacuumed target fails loudly") {
    val t = freshTable("restoretail")
    t.append(df(1L -> "a"))                                 // v1
    t.append(df(2L -> "b"))                                 // v2
    t.upsert(Seq((1L, "A", 1L, false)).toDF("id", "name", "_seq", "_deleted"),
      "id", "_seq")                                         // v3: replaces v1's file
    t.restore(1L)                                           // v4
    // appendsSince across the restore must refuse (rows changed non-append-wise)
    intercept[IllegalStateException](t.appendsSince(spark, 3L))
    // with skipRewrites the consumer knowingly skips it
    assert(t.appendsSince(spark, 3L, skipRewrites = true).count() == 0L)
    // vacuum away history, then a too-old restore target fails BEFORE committing
    t.checkpoint()
    t.vacuum(retainVersions = 0)
    val head = t.latestVersion()
    val e = intercept[IllegalArgumentException](t.restore(3L))
    assert(e.getMessage.contains("vacuum"))
    assert(t.latestVersion() == head, "failed restore must not commit")
  }
}
