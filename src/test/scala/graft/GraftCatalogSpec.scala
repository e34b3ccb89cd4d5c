package graft

import graft.medallion.GraftTable
import graft.streaming.GraftCatalog
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

/** The SQL catalog surface: a graft warehouse as a Spark TableCatalog —
  * CREATE TABLE / SELECT / DELETE FROM / TRUNCATE / SHOW / DROP in
  * plain SQL, with DELETE routed through the transactional range
  * delete and untranslatable predicates refused loudly. */
class GraftCatalogSpec extends SparkSpec {

  private def freshWarehouse(): String = {
    val dir = new java.io.File(
      s"target/tmp/catalog_${java.util.UUID.randomUUID().toString.take(8)}")
    dir.getAbsolutePath
  }

  test("CREATE/SELECT/DELETE/TRUNCATE/SHOW/DROP through plain SQL") {
    import spark.implicits._
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.gtest", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtest.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gtest.db.events (id BIGINT, payload STRING)")
      // an empty created table reads as empty, not as an error
      assert(spark.sql("SELECT * FROM gtest.db.events").count() === 0L)
      // CREATE again fails loudly
      intercept[Exception](
        spark.sql("CREATE TABLE gtest.db.events (id BIGINT, payload STRING)"))

      // writes go through the explicit surfaces; the catalog sees them
      val t = new GraftTable(s"$wh/db/events")
      t.append(Seq((1L, Some("a")), (2L, Some("b")), (5L, Some("e")),
        (9L, Some("i"))).toDF("id", "payload"))
      t.append(Seq((null.asInstanceOf[java.lang.Long], Some("nul")))
        .map(x => (Option(x._1).map(_.toLong), x._2)).toDF("id", "payload"))
      assert(spark.sql("SELECT count(*) FROM gtest.db.events").head().getLong(0) === 5L)

      // DELETE FROM with a translatable range: stats-triaged range delete
      spark.sql("DELETE FROM gtest.db.events WHERE id BETWEEN 2 AND 5")
      assert(spark.sql("SELECT id FROM gtest.db.events WHERE id IS NOT NULL")
        .collect().map(_.getLong(0)).toSet === Set(1L, 9L))
      assert(spark.sql(
        "SELECT count(*) FROM gtest.db.events WHERE id IS NULL")
        .head().getLong(0) === 1L, "null keys survive a range DELETE")
      assert(t.history().head._2 === "delete")

      // a strict inequality cannot be represented exactly: refused
      // loudly, nothing deleted
      intercept[Exception](
        spark.sql("DELETE FROM gtest.db.events WHERE id > 1"))
      assert(spark.sql("SELECT count(*) FROM gtest.db.events").head().getLong(0) === 3L)

      // TRUNCATE is the no-predicate delete: null keys go too
      spark.sql("TRUNCATE TABLE gtest.db.events")
      assert(spark.sql("SELECT count(*) FROM gtest.db.events").head().getLong(0) === 0L)

      // SHOW TABLES lists log-bearing directories only
      assert(spark.sql("SHOW TABLES IN gtest.db").collect()
        .map(_.getString(1)).toSeq === Seq("events"))

      spark.sql("DROP TABLE gtest.db.events")
      intercept[AnalysisException](
        spark.sql("SELECT * FROM gtest.db.events").collect())
      assert(spark.sql("SHOW TABLES IN gtest.db").count() === 0L)

      // path-traversal identifiers never escape the warehouse —
      // listTables validates segments exactly like every other op
      intercept[Exception](spark.sql("SHOW TABLES IN gtest.`..`").collect())
      intercept[Exception](
        spark.sql("SELECT * FROM gtest.`..`.`etc`").collect())
    } finally {
      spark.conf.unset("spark.sql.catalog.gtest")
      spark.conf.unset("spark.sql.catalog.gtest.warehouse")
    }
  }

  test("deleteRange translates exactly or refuses") {
    import graft.streaming.GraftTableV2.deleteRange
    import org.apache.spark.sql.sources._
    // BETWEEN / = / one-sided ranges translate
    assert(deleteRange(Array(GreaterThanOrEqual("id", 2L), LessThanOrEqual("id", 5L)))
      === Some(Some(("id", Some(2L), Some(5L)))))
    assert(deleteRange(Array(And(GreaterThanOrEqual("id", 2L), LessThanOrEqual("id", 5L))))
      === Some(Some(("id", Some(2L), Some(5L)))))
    assert(deleteRange(Array(EqualTo("id", 3L))) === Some(Some(("id", Some(3L), Some(3L)))))
    assert(deleteRange(Array(LessThanOrEqual("ts", "2024-01-01")))
      === Some(Some(("ts", None, Some("2024-01-01")))))
    // no predicate / AlwaysTrue = truncate
    assert(deleteRange(Array.empty) === Some(None))
    assert(deleteRange(Array(new AlwaysTrue)) === Some(None))
    // inexact shapes refuse: strict, OR, IS NULL, two columns,
    // conflicting bounds
    assert(deleteRange(Array(GreaterThan("id", 2L))) === None)
    assert(deleteRange(Array(Or(EqualTo("id", 1L), EqualTo("id", 2L)))) === None)
    assert(deleteRange(Array(IsNull("id"))) === None)
    assert(deleteRange(Array(GreaterThanOrEqual("id", 2L), LessThanOrEqual("x", 5L))) === None)
    assert(deleteRange(Array(GreaterThanOrEqual("id", 2L), GreaterThanOrEqual("id", 4L))) === None)
  }
}
