package graft.streaming

import graft.medallion.GraftTable
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StructType}

/** Structured Streaming SOURCE over a [[graft.medallion.GraftTable]]:
  * `spark.readStream.format("graft-table").option("path", t).load()`
  * tails a table's append commits as micro-batches — the read half of
  * the table-to-table pipeline whose write half is [[TableSink]].
  * Chained, the two give exactly-once bronze→silver→gold stages over
  * the same transactional tables batch jobs read (the Delta streaming
  * pattern).
  *
  * Offsets ARE table versions: `getOffset` is the newest committed
  * version (one bounded log listing — no data I/O), `getBatch(a, b)`
  * returns exactly the rows appended in versions `(a, b]` via
  * [[GraftTable.appendsSince]], each tagged `_commit_version`. Because
  * the commit log is immutable and ordered, a restarted query replays
  * IDENTICAL batches from its checkpointed offsets — deterministic
  * replay is what the end-to-end exactly-once contract stands on.
  *
  * Rewrite commits (upsert/overwrite) in a tailed range fail the batch
  * by default (appendsSince's contract — a silent skip would hand the
  * consumer a stream missing real changes); `skipRewrites=true` opts
  * out. Compactions are row-neutral and always skipped: OPTIMIZE never
  * disturbs a tailing consumer.
  *
  * 100 TB shape: per micro-batch the driver reads O(commits in range)
  * small log files; data moves only through the returned scan of the
  * new files at full executor parallelism. The source never lists data
  * directories.
  */
final class GraftTableSource(
    spark: SparkSession, tablePath: String, skipRewrites: Boolean,
    startingVersion: Long = 0L)
    extends Source {

  private val table = new GraftTable(tablePath)

  override val schema: StructType = GraftTableSource.schemaOf(tablePath)

  // the declared schema minus the version tag, PINNED at source creation:
  // every getBatch reads with it, so a mergeSchema widening of the table
  // mid-stream cannot change batch shape under the running plan (the new
  // column appears after a query restart re-resolves the schema)
  private val baseSchema = StructType(
    schema.fields.filterNot(_.name == "_commit_version"))

  override def getOffset: Option[Offset] = {
    val v = table.latestVersion()
    if (v <= startingVersion) None else Some(LongOffset(v))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    // a fresh query (no checkpointed offset) starts AFTER
    // startingVersion — the Delta startingVersion semantics: history
    // before it is catch-up a consumer explicitly skips
    val from = start.map(GraftTableSource.version).getOrElse(startingVersion)
    val until = GraftTableSource.version(end)
    // re-wrapped isStreaming=true (the v1 getBatch contract); the scan
    // itself stays the lazy parquet read of exactly the range's files
    org.apache.spark.sql.graft.StreamingFrames.asStreaming(
      table.appendsSince(spark, from, skipRewrites, untilVersion = until,
        readSchema = Some(baseSchema)))
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftTableSource[$tablePath]"
}

/** `format("graft-table")` provider (registered via
  * META-INF/services/org.apache.spark.sql.sources.DataSourceRegister).
  * Options: `path` (required), `skipRewrites` (default false),
  * `startingVersion` (default 0 — tail everything; a fresh query skips
  * commits ≤ this version, checkpointed queries ignore it). */
final class GraftTableSourceProvider
    extends StreamSourceProvider with RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-table source requires .option(\"path\", <table root>)"))

  /** Batch read: `spark.read.format("graft-table").option("path", t)
    * .load()` — snapshot resolution + stats-based file pruning from
    * pushed-down filters ([[GraftTableRelation]]). */
  override def createRelation(
      sqlContext: SQLContext, parameters: Map[String, String]): BaseRelation =
    new GraftTableRelation(sqlContext, path(parameters))

  // a user-declared .schema(...) is REJECTED, not echoed: the source
  // always binds the table's committed schema, and silently resolving
  // the plan against a different user schema while getBatch emits
  // table-schema rows would misbind columns by ordinal
  private def rejectUserSchema(schema: Option[StructType]): Unit =
    require(schema.isEmpty,
      "graft-table source derives its schema from the table's commit log; " +
        "remove .schema(...) — a user-declared schema cannot rebind the " +
        "committed table schema")

  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    rejectUserSchema(schema)
    ("graft-table", GraftTableSource.schemaOf(path(parameters)))
  }

  override def createSource(
      sqlContext: SQLContext, metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source = {
    rejectUserSchema(schema)
    new GraftTableSource(
      sqlContext.sparkSession, path(parameters),
      parameters.get("skipRewrites").exists(_.toBoolean),
      parameters.get("startingVersion").map(_.toLong).getOrElse(0L))
  }
}

object GraftTableSource {

  /** The streamed schema: the table's committed schema plus the
    * `_commit_version` tag appendsSince emits. The table must already
    * have at least one commit — a schema-less tail has nothing sound to
    * bind the query plan to. */
  private[streaming] def schemaOf(tablePath: String): StructType = {
    val t = new GraftTable(tablePath)
    require(t.latestVersion() > 0L,
      s"graft-table source: no committed table at $tablePath — create it " +
        "(one append) before starting the stream, or the plan has no schema")
    t.snapshot().schema.add("_commit_version", LongType, nullable = false)
  }

  /** Offset → table version. Handles both live [[LongOffset]]s and the
    * serialized JSON form replayed from a restarted query's checkpoint
    * (every v1 offset round-trips through its `json()`). */
  private[streaming] def version(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong
  }
}
