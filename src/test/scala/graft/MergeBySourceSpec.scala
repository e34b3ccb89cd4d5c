package graft

import graft.medallion.GraftTable
import graft.streaming.GraftCatalog

/** The full three-clause MERGE — including WHEN NOT MATCHED BY SOURCE,
  * the clause that turns MERGE into a complete table sync — through the
  * group-based row-level machinery. NOT-MATCHED-BY-SOURCE forces EVERY
  * group containing target-only rows into the rewrite (no source key to
  * prune by), which Spark's rewrite handles by widening the candidate
  * set; the machinery must still produce exactly one serializable
  * replace commit.
  */
class MergeBySourceSpec extends SparkSpec {
  import spark.implicits._

  test("MERGE with MATCHED / NOT MATCHED / NOT MATCHED BY SOURCE syncs the table") {
    val wh = new java.io.File(
      s"target/tmp/mbys_${java.util.UUID.randomUUID().toString.take(8)}").getAbsolutePath
    spark.conf.set("spark.sql.catalog.mbys", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mbys.warehouse", wh)
    try {
      spark.sql("CREATE TABLE mbys.db.t (id BIGINT, v DOUBLE)")
      val t = new GraftTable(s"$wh/db/t")
      t.append(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "v"))
      Seq((2L, 20.0), (9L, 90.0)).toDF("id", "v").createOrReplaceTempView("mbys_src")
      val preVersion = t.latestVersion()
      spark.sql("""MERGE INTO mbys.db.t AS t USING mbys_src AS s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
        WHEN NOT MATCHED BY SOURCE THEN DELETE""")
      // target becomes exactly the source: 1,3 deleted, 2 updated, 9 inserted
      val got = spark.sql("SELECT id, v FROM mbys.db.t ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == Seq((2L, 20.0), (9L, 90.0)))
      assert(t.latestVersion() == preVersion + 1,
        "the three-clause MERGE must be ONE replace commit")
    } finally {
      spark.conf.unset("spark.sql.catalog.mbys")
      spark.conf.unset("spark.sql.catalog.mbys.warehouse")
    }
  }
}
