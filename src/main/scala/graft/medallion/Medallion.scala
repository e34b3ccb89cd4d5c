package graft.medallion

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Medallion-architecture layers: bronze (raw CDC-envelope JSON lines,
  * ingest-date partitioned) → silver (cleaned, typed, deduped parquet) →
  * gold (aggregated parquet).
  *
  * Mirrors the reference's layer semantics — envelope format
  * `{table, operation, timestamp, data:{…row…}}` (mysql_to_kafka.py:68-73),
  * Hive-style `year=/month=/day=` bronze partitions (kafka_to_bronze.py:51),
  * silver cleaning = flatten + cast + dedup + null-drop
  * (bronze_to_silver.py:73-120), `processed_date`-partitioned silver
  * (bronze_to_silver.py:125), unpartitioned gold (silver_to_gold.py:184-194)
  * — re-expressed as declarative DataFrame transforms.
  *
  * Determinism: the wall clock is injected (`clock` parameter) instead of
  * `current_timestamp()` (SURVEY §7.4 hard part 3), so every layer is
  * byte-reproducible and oracle-checkable.
  *
  * Scale notes: bronze partitions by INGEST date (one partition per run,
  * like the reference's consumer) — record-date partitioning would fan a
  * single load into thousands of tiny partitions. Writers use
  * `maxRecordsPerFile` to bound file size; silver dedup is the only wide
  * stage (hash shuffle on the primary key).
  */
object Medallion {

  /** Wrap rows in the bronze CDC envelope. `clock` = ingest timestamp
    * (ISO string), injected for determinism. */
  def toEnvelope(df: DataFrame, table: String, clock: String): DataFrame =
    df.select(
      to_json(struct(
        lit(table).as("table"),
        lit("INSERT").as("operation"),
        lit(clock).as("timestamp"),
        struct(df.columns.map(col): _*).as("data"))).as("value"))

  /** Bronze write: JSON lines under year=/month=/day= of the ingest date.
    * `root` is a lake root (layer subdir appended); deployments with
    * per-layer buckets use [[writeBronzeTo]] with the layer URI. */
  def writeBronze(df: DataFrame, table: String, clock: String, root: String): String =
    writeBronzeTo(df, table, clock, s"$root/bronze")

  /** Bronze write into an explicit layer directory/bucket URI. */
  def writeBronzeTo(df: DataFrame, table: String, clock: String, layerDir: String): String = {
    val path = s"$layerDir/$table"
    val d = to_date(lit(clock))
    toEnvelope(df, table, clock)
      .withColumn("year", year(d)).withColumn("month", month(d))
      .withColumn("day", dayofmonth(d))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 1000000)
      .partitionBy("year", "month", "day")
      .text(path)
    path
  }

  /** Envelope schema for a given payload schema (explicit — never inferred
    * in production paths; SURVEY §1.2). */
  def envelopeSchema(dataSchema: StructType): StructType =
    StructType(Seq(
      StructField("table", StringType),
      StructField("operation", StringType),
      StructField("timestamp", StringType),
      StructField("data", dataSchema)))

  /** Bronze read: parse the envelope with an explicit schema and flatten
    * `data.*`, keeping the operation column (P1). */
  def readBronze(spark: SparkSession, path: String, dataSchema: StructType): DataFrame =
    spark.read.text(path)
      .select(from_json(col("value"), envelopeSchema(dataSchema)).as("env"))
      .select(col("env.operation").as("_op"), col("env.data.*"))

  /** Bronze read with corrupt-line quarantine: at ingest scale some
    * lines are malformed (truncated flush, partial object write, junk
    * from a producer bug). `from_json` parses those to NULL; silently
    * flattening them poisons silver with all-null rows, and silently
    * dropping them hides data loss. This splits the read: `good` rows
    * flattened as usual, `quarantine` rows carrying the RAW line for
    * inspection/replay (write it to a `_quarantine/` sibling and alert
    * on count > 0). The parsed frame is cached (CacheScope-registered —
    * release after both writes) so materializing both outputs costs one
    * scan + parse and both splits see the SAME files, even if the
    * directory changes between the two actions. */
  def readBronzeQuarantine(
      spark: SparkSession, path: String,
      dataSchema: StructType): (DataFrame, DataFrame) = {
    val raw = graft.core.CacheScope.cached(spark.read.text(path)
      .select(col("value"),
        from_json(col("value"), envelopeSchema(dataSchema)).as("env")))
    val ok = col("env").isNotNull && col("env.data").isNotNull
    val good = raw.filter(ok)
      .select(col("env.operation").as("_op"), col("env.data.*"))
    val quarantine = raw.filter(!ok).select(col("value").as("raw_line"))
    (good, quarantine)
  }

  /** Declarative silver cleaning rule (bronze_to_silver.py:73-120). */
  final case class CleaningRule(
      dedupKeys: Seq[String],
      requiredCols: Seq[String],
      casts: Map[String, DataType] = Map.empty,
      trimCols: Seq[String] = Seq.empty)

  /** Deterministic dedup-by-key: for each key, keep the row that sorts
    * FIRST by the remaining columns. `dropDuplicates(keys)` plans as a
    * first() aggregate whose winner depends on shuffle arrival order —
    * two runs over identical bronze could emit different silver bytes,
    * which breaks this layer's byte-reproducibility contract. Same
    * shuffle shape (one hash exchange on the keys), total winner. */
  def dedupDeterministic(df: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rest = df.columns.filterNot(keys.contains)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(struct(rest.map(col): _*))
    df.withColumn("_dd_rn", row_number().over(w))
      .filter(col("_dd_rn") === 1).drop("_dd_rn")
  }

  /** Apply a cleaning rule: cast → trim → dedup-by-key → null-drop, plus
    * the `processed_date` audit column from the injected clock. */
  def toSilver(flatBronze: DataFrame, rule: CleaningRule, clock: String): DataFrame = {
    val casted = rule.casts.foldLeft(flatBronze.drop("_op")) {
      case (d, (c, t)) => d.withColumn(c, col(c).cast(t))
    }
    val trimmed = rule.trimCols.foldLeft(casted) {
      case (d, c) => d.withColumn(c, trim(col(c)))
    }
    dedupDeterministic(trimmed, rule.dedupKeys)
      .na.drop("any", rule.requiredCols)
      .withColumn("processed_date", to_date(lit(clock)))
  }

  /** Silver write: parquet partitioned by processed_date (K3). */
  def writeSilver(df: DataFrame, table: String, root: String): String =
    writeSilverTo(df, table, s"$root/silver")

  /** Silver write into an explicit layer directory/bucket URI. */
  def writeSilverTo(df: DataFrame, table: String, layerDir: String): String = {
    val path = s"$layerDir/$table"
    df.write.mode("overwrite").partitionBy("processed_date").parquet(path)
    path
  }

  /** Gold write: unpartitioned parquet (K4). */
  def writeGold(df: DataFrame, table: String, root: String): String =
    writeGoldTo(df, table, s"$root/gold")

  /** Gold write into an explicit layer directory/bucket URI. */
  def writeGoldTo(df: DataFrame, table: String, layerDir: String): String = {
    val path = s"$layerDir/$table"
    df.write.mode("overwrite").parquet(path)
    path
  }

  /** CDC apply (T6) — the Delta-MERGE equivalent as a pure DataFrame
    * operator (no table format in this environment): fold a batch of
    * parsed change rows into the current snapshot.
    *
    * `changes` carries `_deleted: boolean` (from
    * [[graft.sources.Sources.parseDebezium]]) plus a monotonic `seqCol`
    * (e.g. Debezium `ts_ms`); latest change per key wins, a winning
    * delete drops the key, untouched snapshot keys pass through.
    *
    * Scale shape: one shuffle of the (small) change batch for the
    * per-key window, then a key-aligned anti-join against the snapshot —
    * broadcastable when the batch is small, never a snapshot rewrite of
    * more than the touched partitions when layered over partitioned
    * storage.
    */
  def applyCdc(
      snapshot: DataFrame, changes: DataFrame,
      key: String, seqCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tie-break beyond seqCol: Debezium ts_ms is millisecond-granular, so
    // same-key same-sequence changes are realistic, and a bare seq order
    // would pick a shuffle-order-dependent winner — the full-row struct
    // makes the choice total and run-stable (replay-idempotence depends
    // on it)
    val rest = changes.columns.filterNot(c => c == key || c == seqCol)
    val latest = changes
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(key))
          .orderBy(col(seqCol).desc, struct(rest.map(col): _*).desc)))
      .filter(col("_rn") === 1)
      .drop("_rn")
    // null-safe delete test: an unknown/null _deleted must not silently
    // drop the key (the anti-join removes it; only a definite true skips
    // the re-insert)
    val upserts = latest.filter(!coalesce(col("_deleted"), lit(false)))
      .drop("_deleted", "_op", seqCol)
    snapshot
      .join(latest.select(col(key)), Seq(key), "left_anti")
      .unionByName(upserts)
  }

  /** Partition-scoped CDC apply over a `partitionCol=value`-partitioned
    * parquet snapshot ON DISK: rewrite ONLY the partitions the change
    * batch touches; every other partition's files are left alone —
    * byte-identical, not re-written (asserted in MedallionSpec). This is
    * the behavior a table format's MERGE with partition pruning gives
    * you (see README "Table-format gap"): at 100 TB a daily CDC batch
    * touches a handful of date partitions, and rewriting just those is
    * the difference between minutes and a full-table rewrite.
    *
    * Requirements: `changes` carries `partitionCol` (a row's partition
    * is part of its identity here — a key that MOVES partitions must
    * arrive as a delete in the old partition plus an upsert in the new
    * one, which is how partition-pruned MERGE works in every table
    * format). A change for a not-yet-existing partition creates it.
    *
    * Each touched partition is rewritten to a sibling temp dir and
    * swapped in with the same atomic-rename + rollback + crash-recovery
    * discipline as [[Maintenance.compactParquet]]: a run killed between
    * park and promote leaves the live rows parked in `_cdc_old_…`, and
    * the next call promotes them back BEFORE probing existence, so the
    * batch folds into the restored snapshot instead of an empty one
    * (local-FS rename semantics; a table format's transactional commit
    * replaces this on object stores).
    *
    * '''Single-writer contract''': like every rename-swap protocol in
    * this file, the table must have ONE CDC writer at a time — the
    * entry-time sweep that un-parks crashed partitions cannot tell a
    * crash artifact from a CONCURRENT batch mid-swap, and two writers
    * racing the same partition were never safe under directory renames
    * to begin with. Concurrent upserts belong on [[GraftTable.upsert]],
    * whose commit protocol detects the race instead of assuming it away.
    *
    * Returns the touched partition values (driver-side partition LIST —
    * cardinality = partitions in the batch, never data rows).
    */
  def applyCdcPartitioned(
      spark: SparkSession, tablePath: String, changes: DataFrame,
      key: String, seqCol: String, partitionCol: String): Seq[String] = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val rawTouched = changes.select(col(partitionCol)).distinct().collect().map(_.get(0))
    // a null partition value has no directory identity — surface it as
    // the data error it is rather than NPE-ing or inventing a partition
    require(!rawTouched.contains(null),
      s"applyCdcPartitioned: change batch has rows with NULL $partitionCol")
    // keep the ORIGINAL typed values for the filter (ANSI Spark rejects
    // cross-type compares like string = int); strings only name paths
    val touchedRaw = rawTouched.sortBy(_.toString).toSeq
    // table-WIDE crash recovery at entry, not per-touched-partition: a
    // run killed between park and promote leaves `_cdc_old_<p>` with no
    // live dir, and if the NEXT batch doesn't touch p the partition
    // would stay invisible to every reader indefinitely — silent data
    // loss gated on which partitions future batches happen to touch.
    // Promote ANY parked partition whose live dir is missing.
    Option(new java.io.File(tablePath).listFiles()).foreach(_.foreach { f =>
      val n = f.getName
      if (n.startsWith("_cdc_old_")) {
        val live = Paths.get(s"$tablePath/$partitionCol=${n.stripPrefix("_cdc_old_")}")
        if (!Files.exists(live))
          Files.move(f.toPath, live, StandardCopyOption.ATOMIC_MOVE)
      }
    })
    // independent partitions overlap (guide §2.6): each rewrite is a
    // small job whose tail would otherwise leave the cluster idle, and
    // the partitions are disjoint by construction (directory-scoped
    // rename protocol, per-partition filters). 2–3 jobs in flight fill
    // the tail without fighting for executors; failures propagate.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(3, math.max(1, touchedRaw.size)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val work = touchedRaw.map { raw => scala.concurrent.Future {
      val pv = raw.toString
      // Spark escapes special characters in partition directory names
      // (space, ':', '/', …); probe and write the SAME escaped path or a
      // timestamp-valued partition silently forks into two directories
      val escaped = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(pv)
      val partPath = s"$tablePath/$partitionCol=$escaped"
      // underscore-prefixed siblings: Spark's file index ignores `_`
      // paths, so a concurrent reader of the table root never sees the
      // in-flight rewrite as a conflicting partition directory
      val tmp = s"$tablePath/_cdc_tmp_$escaped"
      val old = s"$tablePath/_cdc_old_$escaped"
      // crash recovery BEFORE the existence probe (same discipline as
      // Maintenance.recoverSwap): a hard kill between park and promote
      // leaves the live rows parked in `_cdc_old_`, and probing
      // existence without promoting them back would fold this batch
      // into an EMPTY snapshot — silently dropping every prior row of
      // the partition. Promote the parked dir when live is missing;
      // then clear stale tmp/old leftovers (junk from any interrupted
      // run — after promote, `old` is a superseded copy, and the batch
      // re-apply is safe because applyCdc is replay-idempotent).
      if (!Files.exists(Paths.get(partPath)) && Files.exists(Paths.get(old)))
        Files.move(Paths.get(old), Paths.get(partPath), StandardCopyOption.ATOMIC_MOVE)
      graft.core.Fs.rmTree(new java.io.File(tmp))
      graft.core.Fs.rmTree(new java.io.File(old))
      val chg = changes.filter(col(partitionCol) === lit(raw)).drop(partitionCol)
      val exists = Files.exists(Paths.get(partPath))
      // a missing partition folds the batch into an empty snapshot with
      // the change payload's schema (meta columns stripped)
      val snap =
        if (exists) spark.read.parquet(partPath)
        else chg.drop("_deleted", "_op", seqCol).limit(0)
      val next = applyCdc(snap, chg, key, seqCol)
      next.write.mode("overwrite").parquet(tmp)
      if (exists)
        Files.move(Paths.get(partPath), Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
      try Files.move(Paths.get(tmp), Paths.get(partPath), StandardCopyOption.ATOMIC_MOVE)
      catch {
        case e: Throwable =>
          if (exists)
            Files.move(Paths.get(old), Paths.get(partPath), StandardCopyOption.ATOMIC_MOVE)
          throw e
      }
      if (exists) graft.core.Fs.rmTree(new java.io.File(old))
    } }
    try {
      import scala.concurrent.duration.Duration
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(work), Duration.Inf)
    } finally pool.shutdown()
    touchedRaw.map(_.toString)
  }
}
