package graft.medallion

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Lake maintenance: small-file compaction and the shared
  * park-and-atomic-move directory swap protocol.
  *
  * The reference's consumer flushes one JSON file per 100 buffered
  * records per table (kafka_to_bronze.py:38,85-87) — at 100 TB that is
  * hundreds of millions of tiny objects, and scan-task scheduling
  * overhead dominates the actual read. Compaction rewrites a table
  * directory into ~`targetFileMB` files: read at normal parallelism,
  * re-range into ceil(bytes/target) output partitions, write to a
  * sibling temp dir, swap.
  *
  * The swap relies on LOCAL-FILESYSTEM rename semantics: each `Files.move`
  * is atomic, but the two moves together are not one transaction, so a
  * crash between them is recovered on the NEXT run (a parked
  * `__swap_old` with no live table dir is promoted back before
  * writing; stale `__swap_tmp`/`__swap_old` leftovers are
  * cleared). Object stores have no atomic rename at all — there this
  * operator must be replaced by a table format's transactional rewrite
  * (Delta/Iceberg `OPTIMIZE`; no such jar ships in this container — see
  * README "Table-format gap").
  */
object Maintenance {

  private def rm(f: java.io.File): Unit = graft.core.Fs.rmTree(f)

  /** Replace the directory at `livePath` with whatever `write` produces,
    * crash-safely on a local filesystem — THE swap protocol, shared by
    * [[compactParquet]] and the streaming index fold
    * (`CurationStream`):
    *
    *   1. recover: live missing + `__swap_old` parked → a previous run
    *      crashed between its two moves; promote old back (nothing was
    *      lost). Stale `__swap_tmp`/`__swap_old` next to a live dir are
    *      junk from an interrupted run — removed.
    *   2. `write(tmpPath)` materializes the replacement FULLY while the
    *      live dir is still intact (so a lazy plan reading the live dir
    *      is safe).
    *   3. park live → `__swap_old` (atomic), promote tmp → live
    *      (atomic; on failure the park rolls back so the live path
    *      never stays empty), drop old.
    *
    * A first-time call (no live dir yet) just promotes tmp. */
  /** Sibling marker path for `livePath` + `suffix`, built through File
    * so a trailing slash on livePath cannot make the marker a CHILD of
    * the live dir (which would break every move). */
  private def marker(livePath: String, suffix: String): String = {
    val live = new java.io.File(livePath)
    new java.io.File(live.getParentFile, live.getName + suffix).getPath
  }

  def atomicReplaceDir(livePath: String)(write: String => Unit): Unit = {
    val live = new java.io.File(livePath).getPath
    val tmp = marker(livePath, "__swap_tmp")
    val old = marker(livePath, "__swap_old")
    recoverAndClean(livePath)

    write(tmp)

    if (Files.exists(Paths.get(live))) {
      Files.move(Paths.get(live), Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
      try
        Files.move(Paths.get(tmp), Paths.get(live), StandardCopyOption.ATOMIC_MOVE)
      catch {
        case e: Throwable =>
          Files.move(Paths.get(old), Paths.get(live), StandardCopyOption.ATOMIC_MOVE)
          throw e
      }
      rm(new java.io.File(old))
    } else
      Files.move(Paths.get(tmp), Paths.get(live), StandardCopyOption.ATOMIC_MOVE)
  }

  /** Step 1 of the protocol, callable on its own: promote a parked
    * `__swap_old` when the live dir is missing (crash between the two
    * moves), then clear stale temp/old leftovers. Callers that CHECK
    * the live dir's existence before eventually swapping (the streaming
    * index fold) must run this FIRST — otherwise a parked dir reads as
    * "no index yet" and the swap at the end of the batch would bury it. */
  def recoverSwap(livePath: String): Unit = recoverAndClean(livePath)

  private def recoverAndClean(livePath: String): Unit = {
    val live = new java.io.File(livePath).getPath
    // current marker names plus the legacy pre-unification ones
    // (__compact_*) — a crash artifact from an older build must still
    // be recovered, not silently abandoned
    for (suffix <- Seq("__swap", "__compact")) {
      val old = marker(livePath, s"${suffix}_old")
      if (!Files.exists(Paths.get(live)) && Files.exists(Paths.get(old)))
        Files.move(Paths.get(old), Paths.get(live), StandardCopyOption.ATOMIC_MOVE)
      rm(new java.io.File(marker(livePath, s"${suffix}_tmp")))
      rm(new java.io.File(old))
    }
  }

  /** Compact a parquet directory. Returns (filesBefore, filesAfter). */
  def compactParquet(
      spark: SparkSession, path: String, targetFileMB: Int = 128): (Int, Int) = {
    def parquetFiles(p: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f)
        else Nil
      walk(new java.io.File(p))
    }

    // run recovery FIRST so `before` counts the recovered live dir, then
    // size the rewrite and swap through the shared protocol
    recoverAndClean(path)
    val before = parquetFiles(path)
    val bytes = before.map(_.length()).sum
    val outParts = math.max(1, math.ceil(bytes.toDouble / (targetFileMB * 1024.0 * 1024.0)).toInt)

    atomicReplaceDir(path) { tmp =>
      spark.read.parquet(path)
        .repartition(outParts)
        .write.mode("overwrite").parquet(tmp)
    }
    (before.size, parquetFiles(path).size)
  }
}
