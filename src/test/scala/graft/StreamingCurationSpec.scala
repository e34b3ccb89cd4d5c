package graft

import graft.streaming.CurationStream
import org.apache.spark.sql.functions._

/** Streaming arrival-time dedup: the index must GROW across batches, so
  * a near-copy of a document accepted two batches ago is dropped even
  * though the two never coexist in one micro-batch. */
class StreamingCurationSpec extends SparkSpec {

  private def doc(prefix: String) =
    (0 until 40).map(i => s"$prefix$i").mkString(" ")

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

  test("a crash between output append and index swap leaves the old index readable") {
    import spark.implicits._
    val root = new java.io.File(
      s"target/tmp/curation_${java.util.UUID.randomUUID().toString.take(8)}")
    val indexDir = new java.io.File(root, "index").getAbsolutePath
    val outDir = new java.io.File(root, "curated").getAbsolutePath

    // seed the index via one direct batch
    CurationStream.processBatch(
      Seq(1L -> doc("alpha")).toDF("doc_id", "text"), 0L,
      "doc_id", "text", indexDir, outDir, 12, 4, 0.9)
    val before = spark.read.parquet(indexDir).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

    // leave a stale swap dir behind (the crash artifact) — the next
    // batch must still read the live index and succeed
    val stale = new java.io.File(new java.io.File(indexDir).getParentFile,
      "_index_swap_99")
    stale.mkdirs()

    CurationStream.processBatch(
      Seq(2L -> doc("beta")).toDF("doc_id", "text"), 1L,
      "doc_id", "text", indexDir, outDir, 12, 4, 0.9)
    val after = spark.read.parquet(indexDir).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(after.keySet === Set("1", "2"))
    assert(after("1") === before("1"), "seeded signature survives the fold")
  }
}
