package graft

import graft.medallion.Medallion
import graft.medallion.Medallion.CleaningRule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Layer-by-layer medallion semantics on synthetic fixtures: envelope
  * round-trip losslessness, cleaning rules (trim/dedup/null-drop),
  * injected-clock audit columns, partitioned layout on disk.
  */
class MedallionSpec extends SparkSpec {

  private val clock = "2026-02-01 00:00:00"
  private def root(tag: String) =
    new java.io.File(s"target/tmp/spec_$tag").getAbsolutePath

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("amount", DoubleType)))

  test("bronze envelope JSON round-trip is lossless for doubles and preserves rows") {
    import spark.implicits._
    val src = Seq(
      (1L, "alpha", 12.34), (2L, "beta", 0.1 + 0.2), (3L, "gamma", 1e-9))
      .toDF("id", "name", "amount")
    val p = Medallion.writeBronze(src, "t", clock, root("roundtrip"))
    val back = Medallion.readBronze(spark, p, schema)
    assert(back.count() === 3)
    val amounts = back.orderBy("id").select("amount").collect().map(_.getDouble(0))
    assert(amounts === Array(12.34, 0.1 + 0.2, 1e-9)) // bit-exact
    assert(back.columns.contains("_op"))
  }

  test("bronze layout is year=/month=/day= partitioned by ingest date") {
    import spark.implicits._
    val p = Medallion.writeBronze(
      Seq((1L, "x", 1.0)).toDF("id", "name", "amount"), "t", clock, root("layout"))
    val part = new java.io.File(s"$p/year=2026/month=2/day=1")
    assert(part.isDirectory, s"missing partition dir under $p")
  }

  test("silver cleaning: trim, dedup by key, null-drop, audit column") {
    import spark.implicits._
    val flat = Seq(
      (Some(1L), Some("  padded  "), Some(10.0)),
      (Some(1L), Some("dup of key 1"), Some(11.0)),
      (None, Some("no key"), Some(12.0)),
      (Some(2L), Some("ok"), None))
      .toDF("id", "name", "amount")
      .withColumn("_op", lit("INSERT"))
    val silver = Medallion.toSilver(flat,
      CleaningRule(Seq("id"), Seq("id", "amount"), trimCols = Seq("name")), clock)
    val rows = silver.orderBy("id").collect()
    // key-1 deduped to one row, null-key and null-amount rows dropped
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("name") === "padded" ||
      rows(0).getAs[String]("name") === "dup of key 1")
    assert(silver.columns.contains("processed_date"))
    assert(rows(0).getAs[java.sql.Date]("processed_date").toString === "2026-02-01")
  }

  test("readBronzeQuarantine splits corrupt lines out instead of poisoning silver") {
    import spark.implicits._
    val src = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "amount")
    val p = Medallion.writeBronze(src, "t", clock, root("quarantine"))
    // inject ingest-realistic corruption next to the good lines:
    // a truncated envelope and a non-JSON junk line
    val part = new java.io.File(s"$p/year=2026/month=2/day=1")
    val bad = new java.io.File(part, "part-corrupt.txt")
    java.nio.file.Files.writeString(bad.toPath,
      """{"table":"t","operation":"INSERT","timest""" + "\n" +
        "not json at all\n")
    val (good, quarantine) = Medallion.readBronzeQuarantine(spark, p, schema)
    assert(good.count() === 2)
    assert(good.orderBy("id").select("id", "name").as[(Long, String)].collect()
      .toSeq === Seq((1L, "a"), (2L, "b")))
    val q = quarantine.orderBy("raw_line").collect().map(_.getString(0))
    assert(q.length === 2)
    assert(q.exists(_.startsWith("""{"table":"t","operation":"INSERT","timest""")))
    assert(q.contains("not json at all"), "raw line must survive for replay")
  }

  test("applyCdc: latest change wins, deletes drop keys, untouched rows survive") {
    import spark.implicits._
    val snapshot = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "amount")
    val changes = Seq(
      (2L, "b2", 21.0, "u", false, 100L),
      (2L, "b3", 22.0, "u", false, 200L),   // later seq wins
      (3L, "c", 30.0, "d", true, 150L),     // delete key 3
      (4L, "d", 40.0, "c", false, 120L))    // insert key 4
      .toDF("id", "name", "amount", "_op", "_deleted", "_seq")
    val next = Medallion.applyCdc(snapshot, changes, "id", "_seq")
      .orderBy("id").collect()
    assert(next.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L))
    assert(next(1).getString(1) === "b3" && next(1).getDouble(2) === 22.0)
    assert(next(2).getString(1) === "d")
  }

  test("applyCdc is idempotent for a replayed batch (at-least-once safety)") {
    import spark.implicits._
    val snapshot = Seq((1L, "a", 10.0)).toDF("id", "name", "amount")
    val changes = Seq((1L, "a2", 11.0, "u", false, 5L))
      .toDF("id", "name", "amount", "_op", "_deleted", "_seq")
    val once = Medallion.applyCdc(snapshot, changes, "id", "_seq")
    val twice = Medallion.applyCdc(once, changes, "id", "_seq")
    assert(once.orderBy("id").collect().toSeq ===
      twice.orderBy("id").collect().toSeq)
  }

  test("applyCdcPartitioned rewrites only touched partitions — untouched files byte-identical") {
    import spark.implicits._
    val table = new java.io.File("target/tmp/spec_cdc_part/t").getAbsolutePath
    // three date partitions on disk
    Seq(
      (1L, "a", 10.0, "2026-01-01"), (2L, "b", 20.0, "2026-01-01"),
      (3L, "c", 30.0, "2026-01-02"), (4L, "d", 40.0, "2026-01-02"),
      (5L, "e", 50.0, "2026-01-03"))
      .toDF("id", "name", "amount", "pd")
      .write.mode("overwrite").partitionBy("pd").parquet(table)

    def fileBytes(dir: String): Map[String, Seq[Byte]] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(dir))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName ->
          java.nio.file.Files.readAllBytes(f.toPath).toSeq)
        .toMap
    }
    val before01 = fileBytes(s"$table/pd=2026-01-01")
    val before03 = fileBytes(s"$table/pd=2026-01-03")
    assert(before01.nonEmpty && before03.nonEmpty)

    // batch touches 2026-01-02 (update + delete) and creates 2026-01-04
    val changes = Seq(
      (3L, "c2", 31.0, "u", false, 100L, "2026-01-02"),
      (4L, "d", 40.0, "d", true, 110L, "2026-01-02"),
      (6L, "f", 60.0, "c", false, 120L, "2026-01-04"))
      .toDF("id", "name", "amount", "_op", "_deleted", "_seq", "pd")
    val touched = Medallion.applyCdcPartitioned(
      spark, table, changes, "id", "_seq", "pd")
    assert(touched === Seq("2026-01-02", "2026-01-04"))

    // untouched partitions: same file names, same bytes — NOT rewritten
    assert(fileBytes(s"$table/pd=2026-01-01") === before01)
    assert(fileBytes(s"$table/pd=2026-01-03") === before03)
    // touched partition reflects the merge; new partition exists
    val after = spark.read.parquet(table)
      .orderBy("id").select("id", "name", "pd").as[(Long, String, String)].collect()
    assert(after.map(_._1).toSeq === Seq(1L, 2L, 3L, 5L, 6L))
    assert(after(2)._2 === "c2")
    assert(after(4)._3 === "2026-01-04")
    // no swap debris
    assert(!new java.io.File(s"$table/_cdc_old_2026-01-02").exists())
    assert(!new java.io.File(s"$table/_cdc_tmp_2026-01-02").exists())
    assert(!new java.io.File(s"$table/_cdc_tmp_2026-01-04").exists())
  }

  test("applyCdcPartitioned recovers a partition parked by a crash between park and promote") {
    import spark.implicits._
    val table = new java.io.File("target/tmp/spec_cdc_crash/t").getAbsolutePath
    rmRf(new java.io.File(table))
    Seq(
      (1L, "a", 10.0, "2026-01-01"), (2L, "b", 20.0, "2026-01-01"),
      (3L, "c", 30.0, "2026-01-02"))
      .toDF("id", "name", "amount", "pd")
      .write.mode("overwrite").partitionBy("pd").parquet(table)

    // simulate the worst crash point of a previous run: the live
    // partition was parked to _cdc_old_ but the temp dir was never
    // promoted (a stale _cdc_tmp_ is also left behind). Without
    // recovery the next run would see "partition missing", fold into an
    // EMPTY snapshot, and silently drop rows 1 and 2.
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$table/pd=2026-01-01"),
      java.nio.file.Paths.get(s"$table/_cdc_old_2026-01-01"))
    new java.io.File(s"$table/_cdc_tmp_2026-01-01").mkdirs()

    val changes = Seq((2L, "b2", 21.0, "u", false, 100L, "2026-01-01"))
      .toDF("id", "name", "amount", "_op", "_deleted", "_seq", "pd")
    Medallion.applyCdcPartitioned(spark, table, changes, "id", "_seq", "pd")

    // the parked rows were promoted back and the batch applied on top
    val after = spark.read.parquet(table)
      .orderBy("id").select("id", "name").as[(Long, String)].collect()
    assert(after.toSeq === Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    // no swap debris
    assert(!new java.io.File(s"$table/_cdc_old_2026-01-01").exists())
    assert(!new java.io.File(s"$table/_cdc_tmp_2026-01-01").exists())
  }

  test("applyCdcPartitioned recovers a parked partition the CURRENT batch does not touch") {
    import spark.implicits._
    val table = new java.io.File("target/tmp/spec_cdc_crash_other/t").getAbsolutePath
    rmRf(new java.io.File(table))
    Seq(
      (1L, "a", 10.0, "2026-01-01"), (2L, "b", 20.0, "2026-01-01"),
      (3L, "c", 30.0, "2026-01-02"))
      .toDF("id", "name", "amount", "pd")
      .write.mode("overwrite").partitionBy("pd").parquet(table)

    // crash parked 2026-01-01; the NEXT batch touches only 2026-01-02 —
    // per-touched-partition recovery would leave rows 1-2 invisible to
    // every reader until some future batch happened to touch 01-01
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$table/pd=2026-01-01"),
      java.nio.file.Paths.get(s"$table/_cdc_old_2026-01-01"))

    val changes = Seq((3L, "c2", 31.0, "u", false, 100L, "2026-01-02"))
      .toDF("id", "name", "amount", "_op", "_deleted", "_seq", "pd")
    Medallion.applyCdcPartitioned(spark, table, changes, "id", "_seq", "pd")

    val after = spark.read.parquet(table)
      .orderBy("id").select("id", "name").as[(Long, String)].collect()
    assert(after.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c2")),
      "the untouched parked partition must be promoted at entry")
    assert(!new java.io.File(s"$table/_cdc_old_2026-01-01").exists())
  }

  private def rmRf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRf))
    f.delete(); ()
  }

  test("compaction shrinks a fragmented table without changing its rows") {
    import spark.implicits._
    import graft.medallion.Maintenance
    val path = new java.io.File("target/tmp/spec_compact/t").getAbsolutePath
    val src = (1L to 5000L).map(i => (i, s"row_$i")).toDF("id", "v")
    src.repartition(40).write.mode("overwrite").parquet(path)
    val checksumBefore = spark.read.parquet(path)
      .agg(sum(col("id"))).head().getLong(0)
    val (before, after) = Maintenance.compactParquet(spark, path, targetFileMB = 128)
    assert(before >= 40 && after < before && after >= 1)
    val compacted = spark.read.parquet(path)
    assert(compacted.count() === 5000L)
    assert(compacted.agg(sum(col("id"))).head().getLong(0) === checksumBefore)
  }

  test("compaction recovers from a crash between the two swap moves") {
    import spark.implicits._
    import graft.medallion.Maintenance
    val path = new java.io.File("target/tmp/spec_compact_crash/t").getAbsolutePath
    (1L to 100L).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(5).write.mode("overwrite").parquet(path)
    // simulate the worst crash point: table moved to __swap_old, tmp
    // never promoted (plus a stale tmp left behind)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(path), java.nio.file.Paths.get(s"${path}__swap_old"))
    new java.io.File(s"${path}__swap_tmp").mkdirs()
    val (before, after) = Maintenance.compactParquet(spark, path)
    assert(before === 5 && after >= 1)
    assert(spark.read.parquet(path).count() === 100L)
    assert(!new java.io.File(s"${path}__swap_old").exists())
    assert(!new java.io.File(s"${path}__swap_tmp").exists())
  }

  test("silver parquet write partitions by processed_date") {
    import spark.implicits._
    val silver = Medallion.toSilver(
      Seq((1L, "a", 1.0)).toDF("id", "name", "amount").withColumn("_op", lit("I")),
      CleaningRule(Seq("id"), Seq("id")), clock)
    val p = Medallion.writeSilver(silver, "t", root("silverpart"))
    assert(new java.io.File(s"$p/processed_date=2026-02-01").isDirectory)
  }
}
