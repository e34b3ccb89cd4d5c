package graft

import graft.medallion.GraftTable
import org.apache.spark.sql.functions._
import scala.util.Random

/** Differential fuzz for the round-16 positional scan plane: the DSv2
  * idx read (generated row-index column, SelectedColumnVector remap,
  * byte-range splits, pushed filters) must agree row-for-row with the
  * INDEPENDENT v1 read path (`t.read` — parquet `_metadata.row_index`
  * anti-join against the expanded bitmaps) on the same table, across
  * randomized file counts, delete patterns, filters, and split sizes.
  * Two implementations, two position mechanisms, one answer — the
  * strongest cheap guarantee available for this machinery. Seeded:
  * failures replay exactly. */
class DvColumnarFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def dsv2(t: GraftTable) =
    spark.read.format("graft-table").option("path", t.tablePath).load()
      .drop("_commit_version")

  test("20 randomized trials: idx read == v1 anti-join read under deletes/filters/splits") {
    val rnd = new Random(0xD5C01L)
    for (trial <- 0 until 20) {
      val root = new java.io.File(
        s"target/tmp/dvfuzz_${trial}_${java.util.UUID.randomUUID().toString.take(6)}")
      val t = new GraftTable(new java.io.File(root, "tbl").getAbsolutePath)
      val nFiles = 1 + rnd.nextInt(3)
      val rowsPerFile = 2000 + rnd.nextInt(9000)
      var base = 0L
      (0 until nFiles).foreach { f =>
        val rows = (0 until rowsPerFile).map { i =>
          val id = base + i
          (id, (id * 37) % 1000, s"p$id")
        }
        t.append(rows.toDF("id", "k", "payload").orderBy("id").coalesce(1))
        base += rowsPerFile
      }
      // 1-3 random MOR deletes (modulus patterns and ranges; may DV
      // several files, may match nothing)
      val nDeletes = 1 + rnd.nextInt(3)
      (0 until nDeletes).foreach { _ =>
        val pred = rnd.nextInt(3) match {
          case 0 => s"id % ${7 + rnd.nextInt(13)} = ${rnd.nextInt(5)}"
          case 1 =>
            val lo = rnd.nextLong().abs % base
            s"id >= $lo AND id < ${lo + rnd.nextInt(800)}"
          case _ => s"k = ${rnd.nextInt(1000)}"
        }
        t.deleteRows(spark, pred)
      }
      // random filter (sometimes none), random split size
      val filter = rnd.nextInt(3) match {
        case 0 => None
        case 1 =>
          val lo = rnd.nextLong().abs % base
          Some(col("id") >= lo && col("id") < lo + 1 + rnd.nextInt(6000))
        case _ => Some(col("k") < rnd.nextInt(1000))
      }
      val split = (8 + rnd.nextInt(120)) * 1024
      val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
      try {
        spark.conf.set("spark.sql.files.maxPartitionBytes", split.toString)
        def rows(df: org.apache.spark.sql.DataFrame): Array[String] = {
          val q = filter.fold(df)(df.filter)
          q.select("id", "k", "payload").collect()
            .map(r => s"${r.getLong(0)}|${r.getLong(1)}|${r.getString(2)}")
            .sorted
        }
        val viaIdx = rows(dsv2(t))
        val viaAntiJoin = rows(t.read(spark))
        assert(viaIdx.length === viaAntiJoin.length,
          s"trial $trial (files=$nFiles rows=$rowsPerFile split=$split): " +
            s"row counts diverge ${viaIdx.length} vs ${viaAntiJoin.length}")
        assert(java.util.Arrays.equals(
            viaIdx.asInstanceOf[Array[AnyRef]],
            viaAntiJoin.asInstanceOf[Array[AnyRef]]),
          s"trial $trial: row content diverges")
      } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
      graft.core.Fs.rmTree(root)
    }
  }
}
