package graft

import java.util.UUID

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.medallion.{GraftTable, TxLog}

/** Footer-served file statistics (round 16 optimization) must be
  * BIT-IDENTICAL to the Spark stats aggregate they replace: every
  * AddFile from a footer-stats append equals the aggregate path's
  * (`spark.graft.footerStats=false`) across the full type/edge matrix,
  * and the parquet writer behaviors the exactness argument rests on
  * (NaN suppression, oversize-drop-not-truncate) are pinned so a
  * parquet upgrade that changes them fails loudly. */
class FooterStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    new java.io.File(s"target/tmp/fstats_${tag}_${UUID.randomUUID().toString.take(8)}")
      .getAbsolutePath

  /** Append `df` under both flag values; return the two tables' add
    * lists (paths normalized away — names embed random batch ids). */
  private def both(df: DataFrame): (Seq[TxLog.AddFile], Seq[TxLog.AddFile]) = {
    def run(flag: Boolean): Seq[TxLog.AddFile] = {
      spark.conf.set("spark.graft.footerStats", flag.toString)
      try {
        val t = new GraftTable(freshDir(if (flag) "on" else "off"))
        t.append(df)
        t.snapshot().files.map(_.copy(path = "", bytes = 0L))
          .sortBy(f => (f.rows, f.stats.toSeq.sortBy(_._1).mkString))
      } finally spark.conf.unset("spark.graft.footerStats")
    }
    (run(true), run(false))
  }

  private def assertIdentical(df: DataFrame, tag: String): Unit = {
    val (on, off) = both(df)
    assert(on === off, s"footer stats diverge from aggregate stats [$tag]")
  }

  test("differential: integral / string / date / decimal / double matrix") {
    assertIdentical(Seq((1L, 7, "abc", 1.5), (-5L, 2, "zz", -2.25))
      .toDF("l", "i", "s", "d"), "plain")
    assertIdentical(
      Seq((1L, Some(3.0)), (2L, None), (3L, Some(-0.0)), (4L, Some(0.0)))
        .toDF("k", "d"), "nulls and signed zero")
    assertIdentical(
      spark.range(0, 1000).select(col("id"),
        (col("id") % 10).cast("int").as("i"),
        concat(lit("v"), col("id")).as("s"),
        (col("id") * 1.25 - 300.0).as("d"))
        .repartition(4), "multi-file")
    assertIdentical(
      Seq(java.sql.Date.valueOf("2020-01-02"), java.sql.Date.valueOf("1969-12-31"))
        .toDF("dt"), "dates incl pre-epoch")
    assertIdentical(
      Seq(BigDecimal("12.30"), BigDecimal("-4.56")).toDF("dec"), "decimal")
    assertIdentical(
      Seq(java.sql.Timestamp.valueOf("2020-01-02 03:04:05.123456"),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.5"))
        .toDF("ts"), "timestamps (INT96 physical: residual fallback)")
    // TIMESTAMP_MICROS (the driver sessions' writer type since round
    // 16): footer-served epoch-ms must match the aggregate's
    // Timestamp.getTime rendering, pre-epoch flooring included
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try assertIdentical(
      Seq(java.sql.Timestamp.valueOf("2020-01-02 03:04:05.123456"),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.000001"),
        java.sql.Timestamp.valueOf("1969-06-01 01:02:03.5"))
        .toDF("ts"), "timestamps (MICROS physical: footer-served)")
    finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
  }

  test("differential: NaN / Infinity doubles drop the entry on both paths") {
    assertIdentical(Seq(1.0, Double.NaN, 2.0).toDF("d"), "NaN")
    assertIdentical(Seq(Double.NaN).toDF("d"), "all NaN")
    assertIdentical(Seq(1.0, Double.PositiveInfinity).toDF("d"), "+Inf")
    assertIdentical(Seq(Double.NegativeInfinity, 4.0).toDF("d"), "-Inf")
    assertIdentical(Seq(1.0f, Float.NaN).toDF("f"), "float NaN")
    // NaN in one of several columns must not poison the others
    val (on, off) = both(Seq((1L, Double.NaN, "a"), (9L, 2.0, "b"))
      .toDF("k", "d", "s").coalesce(1))
    assert(on === off)
    assert(on.head.stats.contains("k") && on.head.stats.contains("s"))
    assert(!on.head.stats.contains("d"), "NaN column must carry no stats")
  }

  test("differential: all-null columns and empty frames") {
    assertIdentical(Seq((1L, Option.empty[String]), (2L, None))
      .toDF("k", "s"), "all-null string")
    assertIdentical(Seq((1L, Option.empty[Double])).toDF("k", "d"), "all-null double")
    // an empty frame stages one schema-only file; neither path adopts it
    val (on, off) = both(Seq.empty[(Long, String)].toDF("k", "s"))
    assert(on.isEmpty && off.isEmpty)
  }

  test("differential: unicode and oversize strings (residual fallback)") {
    assertIdentical(Seq("😀end", "�bmp", "aÄ±ÅŸÄ±k").toDF("s"), "multi-byte")
    // 5000-char values exceed parquet's footer-stats cap: the footer
    // path must fall back to the aggregate and still match it exactly
    assertIdentical(Seq(("k1", "a" * 5000), ("k2", "b" * 5000))
      .toDF("k", "s"), "oversize strings")
    assertIdentical(Seq(("k1", "a" * 1000), ("k2", "b" * 1000))
      .toDF("k", "s"), "1000-char strings")
  }

  test("differential: row tracking base-id assignment unchanged by the footer path") {
    def build(flag: Boolean): Seq[(Long, Option[Long], Option[String])] = {
      spark.conf.set("spark.graft.footerStats", flag.toString)
      try {
        val t = new GraftTable(freshDir("rid"))
        t.append(Seq((-1L, -1L)).toDF("id", "v"))
        t.setProperty("rowTracking", "true")
        t.append(spark.range(0, 500).select(col("id"), (col("id") % 7).as("v"))
          .repartition(3))
        // (rows, baseRowId, id-column min) per file: the base-id spans
        // AND which data landed in which span must both be preserved
        t.snapshot().files
          .map(f => (f.rows, f.baseRowId, f.stats.get("id").map(_.min)))
          .sortBy(_._2.getOrElse(-1L))
      } finally spark.conf.unset("spark.graft.footerStats")
    }
    assert(build(true) === build(false))
  }

  test("differential: bucket-split staging derives transform stats from dirnames") {
    // a bucket spec makes stageData split files by the transform tuple;
    // the footer path then parses each file's __p$ stats from its split
    // dirname (single-valued by the fanout writer) instead of running
    // the aggregate — results must be identical, null sources included
    def build(flag: Boolean): Seq[Map[String, TxLog.ColStats]] = {
      spark.conf.set("spark.graft.footerStats", flag.toString)
      try {
        val t = new GraftTable(freshDir("bkt"))
        t.append(Seq((0L, java.sql.Date.valueOf("2020-01-01"))).toDF("k", "d"))
        t.setProperty(graft.medallion.PartitionSpec.Prop, "bucket(4,k), days(d)")
        t.append(spark.range(0, 400).select(col("id").as("k"),
          when(col("id") % 7 === 0, lit(null))
            .otherwise(date_add(lit(java.sql.Date.valueOf("2021-03-01")),
              (col("id") % 5).cast("int"))).as("d")))
        t.snapshot().files.map(_.stats.filter(_._1.startsWith("__p$")))
          .sortBy(_.toSeq.sortBy(_._1).mkString)
      } finally spark.conf.unset("spark.graft.footerStats")
    }
    val on = build(true); val off = build(false)
    assert(on === off, "dirname-derived transform stats diverge from the aggregate")
    assert(on.exists(_.nonEmpty), "expected __p$ stats on split files")
  }

  test("pinned: parquet suppresses fp min/max on NaN; drops oversize binary stats") {
    // the two writer behaviors the footer path's exactness rests on —
    // if a parquet upgrade changes either, this fails before any silent
    // stats divergence can
    val dir = freshDir("pin")
    Seq(1.0, Double.NaN).toDF("d").coalesce(1).write.parquet(s"$dir/nan")
    Seq("x" * 5000).toDF("s").coalesce(1).write.parquet(s"$dir/big")
    def stats(sub: String) = {
      val f = new java.io.File(s"$dir/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath),
        spark.sessionState.newHadoopConf())
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val c = r.getFooter.getBlocks.get(0).getColumns.get(0)
        val st = c.getStatistics
        (st == null || st.isEmpty, st != null && st.hasNonNullValue)
      } finally r.close()
    }
    val (nanEmpty, nanHasValue) = stats("nan")
    assert(!nanEmpty && !nanHasValue,
      "parquet writer must suppress fp min/max when a NaN was seen")
    val (bigEmpty, bigHasValue) = stats("big")
    assert(bigEmpty || !bigHasValue,
      "parquet writer must DROP (not truncate) oversize binary stats")
  }

  test("cdc staging rowcounts: footer counts equal the old spark count") {
    // cdf-enabled delete stages change files whose `rows` now come from
    // footers; the feed's per-slice counts must match a direct read
    val t = new GraftTable(freshDir("cdc"))
    t.append(spark.range(0, 300).select(col("id"), (col("id") % 3).as("v")))
    t.setProperty(TxLog.CdfEnabledProp, "true")
    t.deleteRows(spark, "id % 5 = 1")
    val feed = t.readChangeFeed(spark, 2)
    val deletes = feed.filter(col("_change_type") === "delete").count()
    assert(deletes === 60L)
  }
}
