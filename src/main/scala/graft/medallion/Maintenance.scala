package graft.medallion

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Lake maintenance: small-file compaction.
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
  * `__compact_old` with no live table dir is promoted back before
  * compacting; stale `__compact_tmp`/`__compact_old` leftovers are
  * cleared). Object stores have no atomic rename at all — there this
  * operator must be replaced by a table format's transactional rewrite
  * (Delta/Iceberg `OPTIMIZE`; no such jar ships in this container — see
  * README "Table-format gap").
  */
object Maintenance {

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
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }

    val tmp = s"${path}__compact_tmp"
    val old = s"${path}__compact_old"

    // Recover from a previous crashed run before doing anything else:
    // - table dir missing but __compact_old parked → the crash happened
    //   between the two moves; promote old back (no data was lost).
    // - stale __compact_tmp / __compact_old with a live table dir → junk
    //   from an interrupted run; remove so ATOMIC_MOVE targets are free.
    if (!Files.exists(Paths.get(path)) && Files.exists(Paths.get(old)))
      Files.move(Paths.get(old), Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
    rm(new java.io.File(tmp))
    rm(new java.io.File(old))

    val before = parquetFiles(path)
    val bytes = before.map(_.length()).sum
    val outParts = math.max(1, math.ceil(bytes.toDouble / (targetFileMB * 1024.0 * 1024.0)).toInt)

    spark.read.parquet(path)
      .repartition(outParts)
      .write.mode("overwrite").parquet(tmp)

    // swap: move old out of the way, promote tmp, drop old. If the second
    // move fails, roll the first back so the table path never stays empty.
    Files.move(Paths.get(path), Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
    try
      Files.move(Paths.get(tmp), Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: Throwable =>
        Files.move(Paths.get(old), Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
        throw e
    }
    rm(new java.io.File(old))
    (before.size, parquetFiles(path).size)
  }
}
