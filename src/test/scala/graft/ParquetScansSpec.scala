package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The delegated parquet scan bridge (`ParquetScans`). Round 16 found
  * and fixed a silent pushdown gap: `ParquetScanBuilder.pushDataFilters`
  * is only the TRANSLATION hook — its caller `pushFilters(Seq
  * [Expression])` is what records the result, so calling the hook alone
  * built every delegated scan with `pushedFilters = []`. Rows were
  * always correct (Spark's residual filter owns semantics) but no
  * row-group/page/dictionary skipping ever happened inside a file.
  * These specs pin the fix at the exact level it lives: the scan's own
  * pushed-filter set, and the ROW COUNT actually emitted by the reader
  * over a many-row-group file. */
class ParquetScansSpec extends SparkSpec {

  private def manyGroupFile(): (String, Long) = {
    val dir = s"target/tmp/pqscan_${java.util.UUID.randomUUID().toString.take(8)}"
    // ~4 KB row groups: hundreds of groups in one file, so group-level
    // stats skipping is observable in the emitted row count
    spark.range(0, 100000, 1, 1)
      .select(col("id"), (col("id") * 2).as("v"),
        concat(lit("pad"), col("id")).as("pad"))
      .orderBy("id").coalesce(1).write
      .option("parquet.block.size", "4096").parquet(dir)
    val f = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    (f, 100000L)
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType),
    StructField("pad", StringType)))

  private def emittedRows(
      scan: org.apache.spark.sql.connector.read.Scan): Long = {
    val batch = scan.toBatch
    val factory = batch.createReaderFactory()
    batch.planInputPartitions().map { p =>
      var n = 0L
      if (factory.supportColumnarReads(p)) {
        val r = factory.createColumnarReader(p)
        try while (r.next()) n += r.get().numRows() finally r.close()
      } else {
        val r = factory.createReader(p)
        try while (r.next()) n += 1 finally r.close()
      }
      n
    }.sum
  }

  test("pushed filters are RECORDED on the scan and row groups actually skip") {
    val (file, total) = manyGroupFile()
    val required = StructType(Seq(StructField("id", LongType)))
    val filters: Seq[org.apache.spark.sql.sources.Filter] =
      Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("id", 90000L))
    val scan = org.apache.spark.sql.graft.ParquetScans.scanFor(
      spark, schema, Seq(file), required, filters)
    assert(scan.description().contains("GreaterThanOrEqual(id,90000)"),
      s"the convertible filter must land in pushedFilters, was: " +
        scan.description().take(300))
    val n = emittedRows(scan)
    // the sorted id column gives every row group tight [min,max] stats:
    // the reader must emit only the matching tail plus at most one
    // boundary group — far below the file's total
    assert(n >= 10000L && n < total / 4,
      s"row-group skipping must engage: emitted $n of $total rows")
  }

  test("a filter-free scan still emits every row (positional readers rely on this)") {
    val (file, total) = manyGroupFile()
    val required = StructType(Seq(StructField("id", LongType)))
    val scan = org.apache.spark.sql.graft.ParquetScans.scanFor(
      spark, schema, Seq(file), required, Nil)
    assert(emittedRows(scan) === total)
  }

  test("an unconvertible filter degrades to no pushdown, full rows — never an error") {
    val (file, total) = manyGroupFile()
    val required = StructType(Seq(StructField("id", LongType)))
    // a filter on a column the file doesn't carry (the schema-evolution
    // shape): must drop out of the convertible set, not break the scan
    val scan = org.apache.spark.sql.graft.ParquetScans.scanFor(
      spark, schema, Seq(file), required,
      Seq(org.apache.spark.sql.sources.EqualTo("no_such_column", 1L)))
    assert(emittedRows(scan) === total,
      "an unpushable filter must leave row selection to the residual")
  }
}
