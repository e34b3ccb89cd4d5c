package graft

import graft.engine.GraftFunctions
import graft.medallion.{GraftTable, PartitionSpec, TxLog}
import org.apache.spark.sql.functions._

/** Metadata table functions — the Iceberg `t.history`/`t.files` (Delta
  * DESCRIBE HISTORY) observability surface as SQL TVFs. Rows are
  * driver-local and METADATA-sized (per-commit / per-live-file). */
class MetaTablesSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def freshTable(tag: String): (GraftTable, String) = {
    val dir = new java.io.File(
      s"target/tmp/meta_${tag}_${java.util.UUID.randomUUID().toString.take(8)}")
    (new GraftTable(dir.getAbsolutePath), dir.getAbsolutePath)
  }

  test("graft_table_history mirrors historyFull, commit stamps included") {
    val (t, path) = freshTable("hist")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))
    t.upsert(Seq((2L, "B", 10L, false)).toDF("id", "v", "seq", "_deleted"),
      "id", "seq")
    val rows = spark.sql(s"SELECT * FROM graft_table_history('$path') ORDER BY version")
      .collect()
    val expected = t.historyFull().sortBy(_._1)
    assert(rows.length === expected.length)
    rows.zip(expected).foreach { case (r, (v, op, nAdd, nRemove, ts)) =>
      assert(r.getLong(0) === v)
      assert(r.getString(1) === op)
      assert(r.getInt(2) === nAdd)
      assert(r.getInt(3) === nRemove)
      assert(Option(r.getTimestamp(4)).map(_.getTime) === ts)
    }
    assert(rows.map(_.getString(1)).toSeq === Seq("append", "append", "upsert"))
  }

  test("graft_table_files: one row per live file with stats, DV and partition columns") {
    val (t, path) = freshTable("files")
    t.append(Seq((0L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "x"))
      .toDF("id", "ts", "v"))
    t.setProperty(PartitionSpec.Prop, "days(ts)")
    t.append((1L until 101L).map(i =>
      (i, new java.sql.Timestamp(19700L * 86400000L + (i % 4) * 86400000L), s"v$i"))
      .toDF("id", "ts", "v").coalesce(1))
    val df = spark.sql(s"SELECT * FROM graft_table_files('$path')")
    val rows = df.collect()
    val snap = t.snapshot()
    assert(rows.length === snap.files.size)
    assert(rows.map(_.getLong(1)).sum === 101L, "rows column sums to the table")
    assert(rows.forall(_.getLong(3) > 0L), "bytes recorded")
    // the clustered append's files carry the transform tuple; the
    // pre-spec seed file has no partition rendering
    val parts = rows.map(r => Option(r.getString(5)))
    assert(parts.exists(_.isEmpty), "seed file renders no partition")
    assert(parts.flatten.forall(_.startsWith("days(ts)=")),
      s"partition tuples render the transform: ${parts.toSeq}")
    // stats JSON carries per-column min/max, partition keys excluded
    val stats = rows.map(_.getString(6))
    assert(stats.forall(s => s.contains("\"id\":{\"min\":\"") && !s.contains("__p$")))
    // a merge-on-read delete surfaces in dv_rows without a rewrite
    val before = snap.files.map(_.path).toSet
    t.deleteRows(spark, "id % 10 = 3")
    val after = spark.sql(s"SELECT * FROM graft_table_files('$path')").collect()
    assert(after.map(_.getString(0)).toSet === before, "DV delete rewrites nothing")
    assert(after.map(_.getLong(2)).sum === 10L, "dv_rows counts the deleted rows")
    assert(after.map(_.getLong(1)).sum === 91L, "rows column is DV-effective")
  }

  test("graft_table_partitions: one row per live partition tuple with folded counts") {
    import spark.implicits._
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
    val (t, path) = freshTable("parts")
    t.append(Seq((0L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "x"))
      .toDF("id", "ts", "v"))
    t.setProperty(PartitionSpec.Prop, "days(ts)")
    t.setProperty(TxLog.DeleteModeProp, TxLog.DeleteModeMor)
    t.append((1L until 101L).map(i =>
      (i, new java.sql.Timestamp(19700L * 86400000L + (i % 4) * 86400000L), s"v$i"))
      .toDF("id", "ts", "v").coalesce(8))
    t.deleteRows(spark, "id = 5") // one DV'd row in its day
    val rows = spark.sql(
      s"SELECT * FROM graft_table_partitions('$path') ORDER BY partition")
      .collect()
    // 4 day tuples + the null-partition seed bucket
    assert(rows.count(_.isNullAt(0)) === 1, "pre-spec seed folds under null")
    val tuples = rows.filterNot(_.isNullAt(0)).map(_.getString(0))
    assert(tuples.forall(_.startsWith("days(ts)=")) && tuples.length >= 4,
      s"tuples: ${tuples.toSeq}")
    assert(rows.map(_.getLong(2)).sum === 100L, "effective rows fold (DV applied)")
    assert(rows.map(_.getLong(3)).sum === 1L, "dv_rows surface")
    assert(rows.map(_.getInt(1)).sum === t.snapshot().files.size)
    // a spec-less table reports one null-partition row
    val (t2, path2) = freshTable("parts2")
    t2.append(Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a"))
      .toDF("id", "ts", "v"))
    val bare = spark.sql(s"SELECT * FROM graft_table_partitions('$path2')").collect()
    assert(bare.length === 1 && bare.head.isNullAt(0) && bare.head.getLong(2) === 1L)
    } finally prevCoalesce match {
      case Some(v) => spark.conf.set(coalesceKey, v)
      case None => spark.conf.unset(coalesceKey)
    }
  }

  test("identifier resolution and argument validation fail loudly") {
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM graft_table_history('cat.t')").collect() }
    assert(err.getMessage.contains("all three segments required"))
    val err2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_table_files('a/b', 2)").collect() }
    assert(err2.getMessage.contains("exactly 1 argument"))
  }
}
