package graft.streaming

import graft.api.Graft
import graft.core.CacheScope
import graft.operators.NearDup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Arrival-time streaming curation: each micro-batch of documents is
  * near-dup-checked against the STORED MinHash index, survivors are
  * appended to the curated output, and the survivors' signatures fold
  * into the index — so every batch dedups against EVERYTHING already
  * accepted, at O(|batch| + |index|) per batch with no corpus rescan.
  * This is the streaming composition of the three incremental-index
  * operators (`Graft.minHashIndex` / `mergeMinHashIndexes` /
  * `nearDupsAgainstIndex`): the continuous-ingestion twin of the batch
  * `removeNearDups` pass, the shape a 100 TB corpus keeps itself deduped
  * with as new crawls arrive.
  *
  * Within one batch, survivors are ALSO deduped against each other
  * (pairwise exact-Jaccard ≥ `threshold`) before they join the corpus —
  * otherwise two near-identical documents arriving together would both
  * pass the index check.
  *
  * The index swap is write-to-temp + directory rename (the
  * `Maintenance.compactParquet` protocol): the merged index materializes
  * fully into a `_`-prefixed temp dir BEFORE the live dir is replaced,
  * so a crash mid-batch leaves the previous index intact (the batch
  * replays — appends are then the at-least-once caveat, same as every
  * non-transactional parquet sink; a table format makes both atomic,
  * see README "Table-format gap").
  */
object CurationStream {

  /** Start the deduped ingestion of a STREAMING `docs` frame. Bounded
    * sources (AvailableNow) run to completion with `awaitTermination`;
    * unbounded sources process per micro-batch. Returns the running
    * query. */
  def dedupedIngest(
      docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, outDir: String, checkpointDir: String,
      slots: Int = 12, bands: Int = 4, threshold: Double = 0.9): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, indexDir, outDir,
          slots, bands, threshold)
      }
      .start()

  /** One micro-batch: index-check → within-batch dedup → append output →
    * fold survivors into the index. Package-visible for direct testing. */
  private[graft] def processBatch(
      batch: DataFrame, batchId: Long, idCol: String, textCol: String,
      indexDir: String, outDir: String,
      slots: Int, bands: Int, threshold: Double): Unit = CacheScope.scoped {
    val spark = batch.sparkSession
    val b = CacheScope.cached(batch)
    val stored =
      if (new java.io.File(indexDir).exists())
        Some(CacheScope.cached(spark.read.parquet(indexDir)))
      else None

    // 1. drop documents whose signature agrees >= threshold with any
    //    stored group (threshold here is SIGNATURE agreement — the
    //    MinHash estimate of Jaccard; the within-batch pass below uses
    //    exact Jaccard on the same scale)
    val afterIndex = stored match {
      case Some(idx) =>
        val hits = NearDup.nearDupsAgainstIndex(b, idCol, textCol, idx,
          slots = slots, bands = bands, threshold = threshold)
          .select(col(idCol)).distinct()
        b.join(hits, Seq(idCol), "left_anti")
      case None => b
    }

    // 2. within-batch near-dups: keep the lowest id of each colliding
    //    pair (two near-copies arriving in one batch both pass step 1)
    val novel = CacheScope.cached(Graft.removeNearDups(
      afterIndex, idCol, textCol,
      minHashes = slots, bands = bands, threshold = threshold))

    // 3. curated append (at-least-once on crash-replay; see scaladoc)
    novel.write.mode("append").parquet(outDir)

    // 4. fold the survivors' per-doc signatures into the index, then
    //    swap atomically: materialize to temp FIRST (the merged plan
    //    lazily reads the live index — overwriting in place would read
    //    what it deletes), then rename over the old dir
    val batchIdx = Graft.minHashIndex(
      novel.withColumn("_gid", col(idCol).cast("string")), "_gid", textCol,
      slots)
    val merged = stored match {
      case Some(idx) => Graft.mergeMinHashIndexes(idx, batchIdx)
      case None => batchIdx
    }
    val live = new java.io.File(indexDir)
    val tmp = new java.io.File(live.getParentFile, s"_${live.getName}_swap_$batchId")
    merged.write.mode("overwrite").parquet(tmp.getAbsolutePath)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(live)
    require(tmp.renameTo(live),
      s"index swap rename failed: $tmp -> $live")
  }
}
