package graft.streaming

import graft.medallion.GraftTable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Batch-read relation behind `spark.read.format("graft-table")`:
  * resolves the snapshot from the commit log (never a directory
  * listing), PRUNES FILES from pushed-down filters via the log's
  * per-column min/max stats ([[GraftTable.readPruned]]), projects only
  * the required columns, and leaves row-level filtering to Spark —
  * every filter is reported unhandled, because stats prune at FILE
  * granularity and claiming row semantics from them would be wrong.
  *
  * 100 TB shape: the pushdown turns a point-ish query over a huge table
  * into a scan of the handful of overlapping files — the same skipping
  * [[GraftTable.readRange]] gives programmatic callers, now reachable
  * from plain `spark.read` / SQL. Column pruning reaches the parquet
  * reader through the projected select.
  */
final class GraftTableRelation(
    override val sqlContext: SQLContext, tablePath: String)
    extends BaseRelation with PrunedFilteredScan {

  private val table = new GraftTable(tablePath)
  require(table.latestVersion() > 0L,
    s"graft-table: no committed table at $tablePath — a typo'd path must " +
      "fail loudly, not read as an empty table (same contract as the " +
      "streaming source)")

  // snapshot PINNED at relation creation: every action on the resolved
  // DataFrame reads the same version — concurrent commits cannot tear
  // multi-action reads or fail a projection against a moved schema
  private val snap = table.snapshot()

  override val schema: StructType = snap.schema

  // stats prune files, not rows: Spark must re-apply every filter
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val df = table.readPruned(
      sqlContext.sparkSession, filters.toSeq.flatMap(GraftTableRelation.bounds),
      version = snap.version)
    // empty requiredColumns (COUNT(*)-style) must project ZERO columns —
    // returning the full frame would read every column just to count
    df.select(requiredColumns.map(col).toSeq: _*).rdd
  }
}

object GraftTableRelation {

  /** Per-column [lo, hi] bounds derivable from a pushed filter — only
    * shapes the inclusive stats domain can serve conservatively.
    * `IsNull`/`In`/`Or`/string prefixes etc. simply don't prune. */
  private[graft] def bounds(f: Filter): Seq[(String, Option[Any], Option[Any])] =
    f match {
      case EqualTo(a, v) => Seq((a, Some(v), Some(v)))
      case GreaterThan(a, v) => Seq((a, Some(v), None))
      case GreaterThanOrEqual(a, v) => Seq((a, Some(v), None))
      case LessThan(a, v) => Seq((a, None, Some(v)))
      case LessThanOrEqual(a, v) => Seq((a, None, Some(v)))
      case And(l, r) => bounds(l) ++ bounds(r)
      case _ => Seq.empty
    }
}
