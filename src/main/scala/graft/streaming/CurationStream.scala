package graft.streaming

import graft.api.Graft
import graft.core.CacheScope
import graft.functions.TextFns
import graft.medallion.Maintenance
import graft.operators.NearDup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Arrival-time streaming curation: each micro-batch of documents is
  * near-dup-checked against the STORED MinHash index, survivors are
  * appended to the curated output, and the survivors' signatures fold
  * into the index — so every batch dedups against EVERYTHING already
  * accepted, at O(|batch| + |index|) per batch with no corpus rescan.
  * This is the streaming composition of the incremental-index operators
  * (`Graft.minHashIndex` / `mergeMinHashIndexes` /
  * `nearDupsAgainstIndex`): the continuous-ingestion twin of the batch
  * `removeNearDups` pass, the shape a 100 TB corpus keeps itself deduped
  * with as new crawls arrive.
  *
  * Design points:
  *   - signatures are computed ONCE per batch and threaded through all
  *     three passes (index check, within-batch dedup, index fold) — the
  *     md5 shingling pass is the dominant per-document cost, and a
  *     compose-the-public-operators version would pay it three times;
  *   - both dedup passes use the same criterion, MinHash signature
  *     agreement ≥ `threshold` (the unbiased Jaccard estimate), so a
  *     pair dedups identically whether the two docs arrive together or
  *     batches apart;
  *   - documents too short to shingle (fewer than 3 tokens, or
  *     null/empty text) fall back to the whole-trimmed-text hash as a
  *     singleton shingle set: they deduplicate EXACTLY instead of
  *     silently bypassing every pass;
  *   - the index swap goes through [[Maintenance.atomicReplaceDir]] —
  *     the merged index materializes fully to a temp dir while the live
  *     one (which the merge plan lazily reads) is intact, then the
  *     park-and-atomic-move protocol promotes it; a crash at any point
  *     leaves a recoverable index (the next batch's recovery step
  *     promotes a parked dir and clears stale temps). The curated
  *     APPEND is then the at-least-once caveat on crash-replay, same as
  *     every non-transactional parquet sink — [[dedupedIngestExactlyOnce]]
  *     removes it by committing the curated output through a
  *     [[graft.medallion.GraftTable]] txn ledger.
  */
object CurationStream {

  /** Start the deduped ingestion of a STREAMING `docs` frame. The
    * default trigger drains what is currently available and terminates
    * (`awaitTermination` completes — the replay/backfill shape); pass
    * e.g. `Trigger.ProcessingTime(...)` for a long-running continuous
    * ingest. Returns the running query. */
  def dedupedIngest(
      docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, outDir: String, checkpointDir: String,
      slots: Int = 12, bands: Int = 4, threshold: Double = 0.9,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // fail at call time, not wrapped inside the first micro-batch's
    // StreamingQueryException
    require(slots % bands == 0, s"bands ($bands) must divide slots ($slots)")
    require(!docs.columns.contains(SigCol),
      s"input already has a '$SigCol' column — rename it; the ingest " +
        "threads its signatures through that name")
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, indexDir,
          (novel, _) => novel.write.mode("append").parquet(outDir),
          slots, bands, threshold)
      }
      .start()
  }

  /** [[dedupedIngest]] with the curated output going through a
    * [[graft.medallion.GraftTable]] instead of a plain parquet append —
    * which upgrades the one at-least-once seam to exactly-once: a
    * crash-replayed micro-batch's curated append no-ops via the table's
    * txn ledger ([[TableSink]]), and the index fold it then re-runs is
    * idempotent by construction (min-of-mins re-merge of the same
    * signatures is a fixpoint), so the replay converges to the exact
    * pre-crash target state whatever the crash point. Batch order is
    * deliberate — curated commit BEFORE index fold: the replay after a
    * crash between them skips the commit and redoes only the fold.
    *
    * `appId` names this query's ledger in the table log: stable across
    * restarts, unique per logical query. */
  def dedupedIngestExactlyOnce(
      docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, tablePath: String, checkpointDir: String,
      appId: String = "graft-curation",
      slots: Int = 12, bands: Int = 4, threshold: Double = 0.9,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(slots % bands == 0, s"bands ($bands) must divide slots ($slots)")
    require(!docs.columns.contains(SigCol),
      s"input already has a '$SigCol' column — rename it; the ingest " +
        "threads its signatures through that name")
    val table = new graft.medallion.GraftTable(tablePath)
    val sink = TableSink.writerFor(table, appId)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, indexDir, sink,
          slots, bands, threshold)
      }
      .start()
  }

  /** The internal signature column threaded through the batch passes —
    * reserved: input frames must not carry a column of this name. */
  private val SigCol = "_graft_sig"

  /** One micro-batch: index-check → within-batch dedup → append output →
    * fold survivors into the index. Package-visible for direct testing. */
  private[graft] def processBatch(
      batch: DataFrame, batchId: Long, idCol: String, textCol: String,
      indexDir: String, curatedSink: (DataFrame, Long) => Unit,
      slots: Int, bands: Int, threshold: Double): Unit = CacheScope.scoped {
    require(slots % bands == 0, s"bands ($bands) must divide slots ($slots)")
    require(!batch.columns.contains(SigCol),
      s"input already has a '$SigCol' column — rename it")
    val rows = slots / bands
    val spark = batch.sparkSession
    val fast = TextFns.fastHash(spark)
    val fam = if (fast) "xxhash64" else "md5"

    // ONE signature pass. Shingle-less docs (< 3 tokens, null/empty
    // text) get the whole-trimmed-text hash as their singleton shingle
    // set — exact dedup instead of a silent bypass. An at-least-once
    // source can redeliver the same id WITHIN one batch (equal ids
    // never collide in the a.id < b.id pair join, and duplicate
    // group_keys would violate the index merge's unique-key contract),
    // so ids dedup first; identical redeliveries carry identical
    // payloads, making the kept-row choice immaterial.
    def h60(c: org.apache.spark.sql.Column) =
      if (fast) TextFns.xxhash60(c) else TextFns.hash60(c)
    val text = coalesce(col(textCol).cast("string"), lit(""))
    val hs = TextFns.hashedShingles(text, 3, fast)
    val hsSafe = when(size(hs) === 0, array(h60(trim(text)))).otherwise(hs)
    val b = CacheScope.cached(
      batch.dropDuplicates(Seq(idCol))
        .withColumn(SigCol, TextFns.minHash(hsSafe, slots, fast)))

    // BEFORE the existence check: a crash between the previous batch's
    // two swap moves leaves the index parked at __swap_old — promote it
    // now, or this batch would read "no index yet" and bury it
    Maintenance.recoverSwap(indexDir)
    // ONE cached read of the index, feeding both the guarded check view
    // and the step-4 merge — a second full index scan per batch is real
    // money at corpus-scale index sizes
    val storedRaw =
      if (new java.io.File(indexDir).exists())
        Some(CacheScope.cached(spark.read.parquet(indexDir)))
      else None
    val stored = storedRaw.map(raw =>
      CacheScope.cached(NearDup.guardedIndexSigs(raw, fam, slots)))

    // 1. drop documents agreeing >= threshold with any stored group.
    //    Cached: the anti-joined frame feeds the pair join (twice via
    //    bandedKeys), both verify branches, and the final left-anti —
    //    five consumers, and exchange reuse is not guaranteed.
    val afterIndex = CacheScope.cached(stored match {
      case Some(isig) =>
        val bsig = b.select(col(idCol).as("b_id"), col(SigCol).as("bsig"))
        val hits = NearDup.bandedKeys(bsig, "b_id", "bsig", bands, rows, fast)
          .join(NearDup.bandedKeys(isig, "group_key", "isig", bands, rows, fast),
            Seq("band", "bkey"))
          .select(col("b_id"), col("group_key")).distinct()
          .join(bsig, "b_id")
          .join(isig, "group_key")
          .filter(NearDup.sigAgreement(col("bsig"), col("isig"), slots)
            >= threshold)
          .select(col("b_id").as(idCol)).distinct()
        b.join(hits, Seq(idCol), "left_anti")
      case None => b
    })

    // 2. within-batch: same banded join + agreement criterion against
    //    the batch itself; the lower id of each colliding pair survives
    val s2 = afterIndex.select(col(idCol).as("d_id"), col(SigCol).as("dsig"))
    val bb = NearDup.bandedKeys(s2, "d_id", "dsig", bands, rows, fast)
    val dropIds = bb.as("a")
      .join(bb.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.d_id") < col("b.d_id"))
      .select(col("a.d_id").as("d1"), col("b.d_id").as("d2")).distinct()
      .join(s2.select(col("d_id").as("d1"), col("dsig").as("sig1")), "d1")
      .join(s2.select(col("d_id").as("d2"), col("dsig").as("sig2")), "d2")
      .filter(NearDup.sigAgreement(col("sig1"), col("sig2"), slots)
        >= threshold)
      .select(col("d2").as(idCol)).distinct()
    val novel = CacheScope.cached(
      afterIndex.join(dropIds, Seq(idCol), "left_anti"))

    // 3. curated append — plain parquet append (at-least-once on
    //    crash-replay) or the table's idempotent txn append
    //    (exactly-once), per the caller's sink
    curatedSink(novel.drop(SigCol), batchId)

    // 4. fold the survivors' per-doc signatures into the index (ids are
    //    unique after the batch dedup, so a plain select honors the
    //    merge's unique-group_key contract) and swap crash-safely (temp
    //    materializes while the live dir, which the cached merge input
    //    came from, is still intact)
    val batchIdx = novel.select(
      col(idCol).cast("string").as("group_key"),
      col(SigCol).as("sig"),
      lit(fam).as("family"))
    val merged = storedRaw match {
      case Some(raw) => Graft.mergeMinHashIndexes(raw, batchIdx)
      case None => batchIdx
    }
    Maintenance.atomicReplaceDir(indexDir) { tmp =>
      merged.write.mode("overwrite").parquet(tmp)
    }
  }
}
