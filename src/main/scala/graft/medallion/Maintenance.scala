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
  * sibling temp dir, atomically swap.
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
    val before = parquetFiles(path)
    val bytes = before.map(_.length()).sum
    val outParts = math.max(1, math.ceil(bytes.toDouble / (targetFileMB * 1024.0 * 1024.0)).toInt)

    val tmp = s"${path}__compact_tmp"
    spark.read.parquet(path)
      .repartition(outParts)
      .write.mode("overwrite").parquet(tmp)

    // swap: move old out of the way, promote tmp, drop old
    val old = s"${path}__compact_old"
    Files.move(Paths.get(path), Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(old))
    (before.size, parquetFiles(path).size)
  }
}
