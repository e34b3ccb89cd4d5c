package graft

import graft.streaming.CurationStream
import org.apache.spark.sql.functions._

/** Streaming arrival-time dedup: the index must GROW across batches, so
  * a near-copy of a document accepted two batches ago is dropped even
  * though the two never coexist in one micro-batch. */
class StreamingCurationSpec extends SparkSpec {

  private def doc(prefix: String) =
    (0 until 40).map(i => s"$prefix$i").mkString(" ")

  /** The plain at-least-once parquet sink the non-transactional entry
    * point uses — what the direct-processBatch tests always exercised. */
  private def parquetSink(outDir: String): (org.apache.spark.sql.DataFrame, Long) => Unit =
    (novel, _) => novel.write.mode("append").parquet(outDir)

  test("cross-batch near-dups drop against the growing index; novel docs pass") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val root = new java.io.File(
      s"target/tmp/curation_${java.util.UUID.randomUUID().toString.take(8)}")
    val indexDir = new java.io.File(root, "index").getAbsolutePath
    val outDir = new java.io.File(root, "curated").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath

    val ms = MemoryStream[(Long, String)]
    val stream = ms.toDF().toDF("doc_id", "text")

    def runBatch(rows: (Long, String)*): Unit = {
      ms.addData(rows: _*)
      val q = CurationStream.dedupedIngest(
        stream, "doc_id", "text", indexDir, outDir, ckpt)
      q.awaitTermination()
    }

    // batch 1: two distinct docs + an in-batch exact copy of doc 1
    runBatch(1L -> doc("alpha"), 2L -> doc("beta"), 3L -> doc("alpha"))
    // batch 2: near-copy of doc 1 (drop via the STORED index — doc 1 is
    // not in this batch), one novel doc
    runBatch(4L -> doc("alpha"), 5L -> doc("gamma"))
    // batch 3: copy of batch-2's novel doc (proves the index grew in
    // batch 2), one novel doc
    runBatch(6L -> doc("gamma"), 7L -> doc("delta"))

    val curated = spark.read.parquet(outDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(curated === Set(1L, 2L, 5L, 7L),
      "exactly the first arrival of each distinct text survives")

    val index = spark.read.parquet(indexDir)
    assert(index.count() === 4, "one signature group per accepted doc")
    assert(index.select("family").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("md5"))
  }

  test("crash artifacts recover: stale swap temp is cleared, a parked index is promoted") {
    import spark.implicits._
    val root = new java.io.File(
      s"target/tmp/curation_${java.util.UUID.randomUUID().toString.take(8)}")
    val indexDir = new java.io.File(root, "index").getAbsolutePath
    val outDir = new java.io.File(root, "curated").getAbsolutePath

    // seed the index via one direct batch
    CurationStream.processBatch(
      Seq(1L -> doc("alpha")).toDF("doc_id", "text"), 0L,
      "doc_id", "text", indexDir, parquetSink(outDir), 12, 4, 0.9)
    val before = spark.read.parquet(indexDir).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

    // crash artifact 1: a stale swap temp next to a live index — junk
    // from an interrupted write; must be cleared, live index still used
    val staleTmp = new java.io.File(s"${indexDir}__swap_tmp")
    staleTmp.mkdirs()
    CurationStream.processBatch(
      Seq(2L -> doc("beta")).toDF("doc_id", "text"), 1L,
      "doc_id", "text", indexDir, parquetSink(outDir), 12, 4, 0.9)
    assert(!staleTmp.exists(), "stale swap temp must be cleared")
    val after = spark.read.parquet(indexDir).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(after.keySet === Set("1", "2"))
    assert(after("1") === before("1"), "seeded signature survives the fold")

    // crash artifact 2: the WORST crash point — live index parked to
    // __swap_old, promotion never happened. The next batch must promote
    // it back and keep deduplicating against it (doc 3 = copy of doc 1)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(indexDir),
      java.nio.file.Paths.get(s"${indexDir}__swap_old"))
    CurationStream.processBatch(
      Seq(3L -> doc("alpha"), 4L -> doc("gamma")).toDF("doc_id", "text"), 2L,
      "doc_id", "text", indexDir, parquetSink(outDir), 12, 4, 0.9)
    val recovered = spark.read.parquet(indexDir).collect()
      .map(r => r.getString(0)).toSet
    assert(recovered === Set("1", "2", "4"),
      "parked index promoted: doc 3 deduped against it, doc 4 accepted")
    val curated = spark.read.parquet(outDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(curated === Set(1L, 2L, 4L))
  }

  test("shingle-less documents dedup exactly instead of bypassing the index") {
    import spark.implicits._
    val root = new java.io.File(
      s"target/tmp/curation_${java.util.UUID.randomUUID().toString.take(8)}")
    val indexDir = new java.io.File(root, "index").getAbsolutePath
    val outDir = new java.io.File(root, "curated").getAbsolutePath

    // two-token docs produce NO 3-shingles; the whole-text-hash fallback
    // must still catch the exact repeat in a later batch — and distinct
    // short docs must still pass
    CurationStream.processBatch(
      Seq(1L -> "hello world").toDF("doc_id", "text"), 0L,
      "doc_id", "text", indexDir, parquetSink(outDir), 12, 4, 0.9)
    CurationStream.processBatch(
      Seq(2L -> "hello world", 3L -> "different words").toDF("doc_id", "text"), 1L,
      "doc_id", "text", indexDir, parquetSink(outDir), 12, 4, 0.9)
    val curated = spark.read.parquet(outDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(curated === Set(1L, 3L),
      "the exact short-doc repeat drops; the distinct short doc passes")
  }

  test("exactly-once ingest: a crash-replayed batch converges instead of duplicating") {
    import spark.implicits._
    val root = new java.io.File(
      s"target/tmp/curation_${java.util.UUID.randomUUID().toString.take(8)}")
    val indexDir = new java.io.File(root, "index").getAbsolutePath
    val tablePath = new java.io.File(root, "curated_tbl").getAbsolutePath

    val table = new graft.medallion.GraftTable(tablePath)
    val sink = graft.streaming.TableSink.writerFor(table, "cur-q")
    def run(batchId: Long, rows: (Long, String)*): Unit =
      CurationStream.processBatch(
        rows.toDF("doc_id", "text"), batchId,
        "doc_id", "text", indexDir, sink, 12, 4, 0.9)

    run(0L, 1L -> doc("alpha"), 2L -> doc("beta"))
    run(1L, 3L -> doc("alpha"), 4L -> doc("gamma")) // 3 drops vs index

    val indexBefore = spark.read.parquet(indexDir).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val versionBefore = table.snapshot().version

    // crash-replay of batch 1 (same id, same rows — what a restarted
    // query re-delivers): the curated append must no-op via the txn
    // ledger, and the re-run index fold must be a fixpoint
    run(1L, 3L -> doc("alpha"), 4L -> doc("gamma"))

    assert(table.snapshot().version === versionBefore,
      "the replayed curated append must not commit")
    assert(table.read(spark).select("doc_id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 2L, 4L))
    val indexAfter = spark.read.parquet(indexDir).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(indexAfter === indexBefore, "index re-fold is a fixpoint")

    // and the LIVE streaming entry point over the same table: novel doc
    // accepted, near-copy of an old doc dropped against the index. A
    // FRESH checkpoint restarts batch ids at 0, so it needs a fresh
    // appId — reusing "cur-q" here would suppress batch 0 as ≤ the old
    // ledger mark (the appId-follows-checkpoint contract)
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[(Long, String)]
    ms.addData(5L -> doc("beta"), 6L -> doc("delta"))
    CurationStream.dedupedIngestExactlyOnce(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      indexDir, tablePath, new java.io.File(root, "ckpt").getAbsolutePath,
      appId = "cur-q-2").awaitTermination()
    assert(table.read(spark).select("doc_id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 2L, 4L, 6L))
  }
}
