package graft.streaming

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.medallion.GraftTable
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A Spark `TableCatalog` over a directory of graft tables — the piece
  * that makes the table format a first-class SQL citizen:
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.streaming.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /data/graft
  *
  *   CREATE TABLE graft.db.events (id BIGINT, payload STRING)
  *   CREATE TABLE graft.db.ev2 (id BIGINT, ts TIMESTAMP)
  *     PARTITIONED BY (days(ts), bucket(8, id))        -- hidden partitioning
  *     TBLPROPERTIES ('cdf.enabled' = 'true')          -- atomic with the spec
  *   CREATE TABLE graft.db.big AS SELECT ...           -- CTAS
  *   INSERT INTO graft.db.events SELECT ...            -- append commit
  *   INSERT OVERWRITE graft.db.events SELECT ...       -- CAS overwrite
  *   UPDATE graft.db.events SET payload = ... WHERE …  -- copy-on-write, or
  *                           -- DV + image append under update.mode=merge-on-read
  *   MERGE INTO graft.db.events USING src ON … WHEN …  -- incl. NOT MATCHED BY
  *                           -- SOURCE; merge-on-read under merge.mode
  *   ALTER TABLE graft.db.events ALTER COLUMN id TYPE BIGINT -- type widening
  *   ALTER TABLE graft.db.events ADD COLUMNS (src STRING)
  *   ALTER TABLE graft.db.events RENAME COLUMN src TO origin  -- schema-only
  *   ALTER TABLE graft.db.events DROP COLUMN origin           -- schema-only
  *   SELECT * FROM graft.db.events WHERE id > 5        -- DSv2 scan
  *   SELECT *, _commit_version FROM graft.db.events    -- provenance
  *   SELECT * FROM graft.db.events VERSION AS OF 3     -- time travel
  *   SELECT * FROM graft.db.events TIMESTAMP AS OF '2026-08-14 12:00:00'
  *   DELETE FROM graft.db.events WHERE id <= 100       -- metadata when
  *   DELETE FROM graft.db.events WHERE id != 7         -- exact, else COW
  *   TRUNCATE TABLE graft.db.events
  *   DROP TABLE graft.db.events
  *   CALL graft.system.optimize(table => 'db.events')  -- maintenance
  *   CALL graft.system.vacuum(table => 'db.events', retain_versions => 2)
  *   CALL graft.system.restore(table => 'db.events', version => 3)
  *   CALL graft.system.clone(source => 'db.events', target => 'db.fork')
  *   CALL graft.system.checkpoint(table => 'db.events')
  *   CALL graft.system.detail(table => 'db.events')    -- DESCRIBE DETAIL
  *   CALL graft.system.replace_range(table => 'db.events',
  *        column => 'day', source => 'fix_view',
  *        lower => '2026-08-01', upper => '2026-08-01') -- atomic backfill
  *   SELECT * FROM graft_table_partitions('/path')     -- partitions TVF
  *   -- co-bucketed tables join with ZERO exchanges under
  *   -- spark.sql.sources.v2.bucketing.enabled (storage-partitioned joins)
  * }}}
  *
  * Identifiers map to directories under the warehouse
  * (`warehouse/ns…/name`); a table exists iff its commit log has a
  * version. Everything resolves through [[GraftCatalogTable]]: the same
  * snapshot pinning, pushdown, and metadata aggregates as the
  * path-based API, plus DSv2 writes (the V1Write bridge into the
  * optimistic commit protocol) and `_commit_version` as a metadata
  * column — requested by name, invisible to `SELECT *` and to INSERT
  * resolution.
  *
  * No driver-side state beyond the warehouse path: every operation
  * re-resolves the log, so concurrent sessions see each other's
  * commits through the same put-if-absent protocol as everything else.
  */
final class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  /** The V2 function registry: `bucket`, `days`, `hours` — what lets
    * Spark resolve a scan-reported `KeyGroupedPartitioning` (sole
    * bucket or the composite `days(ts), bucket(n, id)` fact layout)
    * and plan STORAGE-PARTITIONED JOINS between co-partitioned graft
    * tables with zero shuffle exchanges (under
    * `spark.sql.sources.v2.bucketing.enabled`). */
  private val v2Functions
      : Map[String, org.apache.spark.sql.connector.catalog.functions.UnboundFunction] =
    Map(
      "bucket" -> org.apache.spark.sql.graft.GraftBucketFunction,
      "days" -> org.apache.spark.sql.graft.GraftDaysFunction,
      "hours" -> org.apache.spark.sql.graft.GraftHoursFunction)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty)
      v2Functions.keys.toArray.sorted.map(Identifier.of(Array.empty, _))
    else Array.empty

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.namespace().isEmpty)
      v2Functions.getOrElse(ident.name().toLowerCase(java.util.Locale.ROOT),
        throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchFunctionException(ident))
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  /** Warehouse-relative path from identifier segments; every segment —
    * namespace and name alike — is validated, so no identifier can
    * escape the warehouse root (`..`, absolute paths, hidden dirs). */
  private def resolveUnder(segments: Seq[String]): java.nio.file.Path =
    segments.foldLeft(Paths.get(warehouse)) { (p, part) =>
      require(!part.contains("/") && !part.startsWith("."),
        s"catalog $catalogName: illegal identifier segment '$part'")
      p.resolve(part)
    }

  private def dirOf(ident: Identifier): String =
    resolveUnder(ident.namespace().toSeq :+ ident.name()).toString

  private def exists(ident: Identifier): Boolean =
    new GraftTable(dirOf(ident)).latestVersion() > 0L

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val base = resolveUnder(namespace.toSeq)
    if (!Files.isDirectory(base)) Array.empty
    else {
      val stream = Files.list(base)
      try stream.iterator().asScala
        .filter(p => Files.isDirectory(p.resolve(graft.medallion.TxLog.LogDir)))
        .map(p => Identifier.of(namespace, p.getFileName.toString))
        .toArray
      finally stream.close()
    }
  }

  override def loadTable(ident: Identifier): Table = {
    if (!exists(ident)) {
      // metadata table: `SELECT * FROM cat.db.t.history` parses as
      // namespace [db, t] + name "history" — when the NAMESPACE path is
      // itself a committed table, serve its commit history (the
      // DESCRIBE HISTORY surface, Iceberg's metadata-table shape). A
      // real table named "history" shadows this (checked first above).
      if (ident.name() == "history" && ident.namespace().nonEmpty) {
        val base = Identifier.of(
          ident.namespace().dropRight(1), ident.namespace().last)
        if (exists(base)) return new GraftHistoryTable(dirOf(base))
      }
      throw new NoSuchTableException(ident)
    }
    val path = dirOf(ident)
    // ONE snapshot resolution supplies both schema and pinned version —
    // a commit landing between two separate reads could otherwise tear
    // them apart (new files read under the old schema)
    val snap = new GraftTable(path).snapshot(-1L)
    new GraftCatalogTable(path, snap.schema, resolvedVersion = Some(snap.version))
  }

  /** SQL time travel: `SELECT … FROM t VERSION AS OF n` resolves the
    * table at commit `n` — pure log resolution against the immutable
    * snapshot, including its THEN-current schema, read-only by
    * capability. Works within the vacuum retention window, like every
    * log-structured format. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!exists(ident)) throw new NoSuchTableException(ident)
    val v =
      try version.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft catalog: VERSION AS OF takes the commit version number, got '$version'")
      }
    val path = dirOf(ident)
    val snap = new GraftTable(path).snapshot(v) // validates v committed
    new GraftCatalogTable(
      path, snap.schema, timeTravelTo = Some(v),
      resolvedVersion = Some(snap.version))
  }

  /** `TIMESTAMP AS OF t`: every commit records its wall-clock time in
    * the log itself (an info-line field — file mtimes don't survive
    * copies, the log entry does), so this resolves timestamp → greatest
    * stamped version with commit-time ≤ t (monotonized in version
    * order, Delta's rule) and delegates to the VERSION AS OF path.
    * Spark hands the timestamp in MICROseconds since epoch. Timestamps
    * before the earliest stamped commit refuse loudly with the earliest
    * (version, time) so the caller can rephrase as VERSION AS OF. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!exists(ident)) throw new NoSuchTableException(ident)
    val v = new GraftTable(dirOf(ident))
      .versionAtTimestamp(Math.floorDiv(timestamp, 1000L))
    loadTable(ident, v.toString)
  }

  /** `PARTITIONED BY (days(ts), bucket(16, id), …)` → the table's
    * `partition.spec` (hidden partitioning — derived per-file stats,
    * not directory layout; see [[graft.medallion.PartitionSpec]]). */
  private def specOf(t: Transform): String = {
    val refs = t.references().flatMap(_.fieldNames())
    require(refs.length == 1,
      s"graft catalog: partition transform $t must reference exactly one column")
    val c = refs.head
    val lits = t.arguments().collect {
      case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
        l.value().toString
    }
    t.name().toLowerCase(java.util.Locale.ROOT) match {
      case "identity" => s"id($c)"
      case "bucket" =>
        require(lits.length == 1, s"graft catalog: bucket needs a count: $t")
        s"bucket(${lits.head},$c)"
      case "truncate" | "trunc" =>
        require(lits.length == 1, s"graft catalog: truncate needs a width: $t")
        s"trunc(${lits.head},$c)"
      case "days" => s"days($c)"
      case "hours" => s"hours($c)"
      case "months" => s"months($c)"
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported partition transform '$other' — " +
          "supported: identity, bucket(n, c), truncate(w, c), days, " +
          "hours, months (the PartitionSpec transform matrix)")
    }
  }

  override def createTable(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    if (exists(ident)) throw new TableAlreadyExistsException((ident.namespace().toSeq :+ ident.name()).toSeq)
    val t = new GraftTable(dirOf(ident))
    t.create(schema)
    // user TBLPROPERTIES commit atomically with the PARTITIONED BY
    // spec in ONE props commit (Spark-reserved catalog keys excluded);
    // validation failures leave an empty created table, nothing else
    val userProps = properties.asScala.toMap.filterNot { case (k, _) =>
      GraftCatalog.ReservedTableProps(k) || k.startsWith("option.") }
    require(partitions.isEmpty ||
        !userProps.contains(graft.medallion.PartitionSpec.Prop),
      "graft catalog: pass PARTITIONED BY or the partition.spec " +
        "property, not both")
    val specProp =
      if (partitions.isEmpty) Map.empty[String, String]
      else Map(graft.medallion.PartitionSpec.Prop ->
        partitions.map(specOf).mkString(", "))
    val all = specProp ++ userProps
    if (all.nonEmpty) t.setProperties(all)
    loadTable(ident)
  }

  /** `ALTER TABLE … ADD COLUMNS (…)`: one schema-only commit through
    * the transaction log (see [[GraftTable.addColumns]] — nullable
    * trailing columns, existing rows null-backfill, zero data files
    * rewritten). Renames and drops commit as name-mapping metadata
    * (see below); retypes are refused loudly (they would corrupt
    * readers of the immutable files).
    *
    * ATOMICITY CONTRACT: each change class commits separately —
    * constraint.* property changes first (one log commit each), then
    * the column changes (one commit). A statement mixing several
    * change classes is therefore NOT atomic: a mid-statement failure
    * (e.g. a CHECK that existing rows violate) leaves the earlier
    * commits applied. Single-purpose ALTER TABLE statements — the
    * overwhelmingly common shape — are fully transactional; issue one
    * statement per change when all-or-nothing matters. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!exists(ident)) throw new NoSuchTableException(ident)
    // constraint management rides the standard DSv2 property channel
    // (no CHECK-constraint TableChange exists in Spark 4.1):
    //   ALTER TABLE t SET TBLPROPERTIES ('constraint.<name>' = '<expr>')
    //   ALTER TABLE t UNSET TBLPROPERTIES ('constraint.<name>')
    // SET validates all existing rows (one scan) and commits CAS-style;
    // UNSET drops. Mirrors how DESCRIBE EXTENDED surfaces them.
    val (propChanges, colChanges) = changes.partition {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => true
      case _ => false
    }
    // plain properties batch into ONE validated commit (an
    // `ALTER TABLE … SET TBLPROPERTIES('a'='1','b'='2')` is atomic);
    // constraints keep their own validating commits
    val plainSets = propChanges.collect {
      case p: TableChange.SetProperty
          if !p.property.startsWith("constraint.") => p.property -> p.value
    }.toMap
    propChanges.foreach {
      case p: TableChange.SetProperty if p.property.startsWith("constraint.") =>
        new GraftTable(dirOf(ident)).addConstraint(
          org.apache.spark.sql.SparkSession.active,
          p.property.stripPrefix("constraint."), p.value)
      case p: TableChange.RemoveProperty if p.property.startsWith("constraint.") =>
        new GraftTable(dirOf(ident)).dropConstraint(
          p.property.stripPrefix("constraint."))
      case p: TableChange.RemoveProperty =>
        new GraftTable(dirOf(ident)).unsetProperty(p.property)
      case _ => ()
    }
    if (plainSets.nonEmpty)
      new GraftTable(dirOf(ident)).setProperties(plainSets)
    if (colChanges.isEmpty) return loadTable(ident)
    // RENAME / DROP COLUMN are schema-only commits via column mapping
    // (the data files keep their physical names; see TxLog.renameColumn)
    val (mappingChanges, addChanges) = colChanges.partition {
      case _: TableChange.RenameColumn | _: TableChange.DeleteColumn |
           _: TableChange.UpdateColumnType => true
      case _ => false
    }
    mappingChanges.foreach {
      // ALTER TABLE t ALTER COLUMN c TYPE <wider> — metadata-only type
      // widening (opt-in via 'type.widening'; see TxLog.widenColumn)
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames.length == 1,
          s"graft catalog: nested column '${u.fieldNames.mkString(".")}' " +
            "is not supported")
        new GraftTable(dirOf(ident)).widenColumn(u.fieldNames()(0), u.newDataType())
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          s"graft catalog: nested column '${r.fieldNames.mkString(".")}' " +
            "is not supported")
        new GraftTable(dirOf(ident)).renameColumn(r.fieldNames()(0), r.newName())
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          s"graft catalog: nested column '${d.fieldNames.mkString(".")}' " +
            "is not supported")
        new GraftTable(dirOf(ident)).dropColumn(d.fieldNames()(0))
      case _ => ()
    }
    if (addChanges.isEmpty) return loadTable(ident)
    val cols = addChanges.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          s"graft catalog: nested column '${a.fieldNames.mkString(".")}' " +
            "is not supported — add a top-level column")
        require(a.position() == null,
          "graft catalog: column position is not supported — new columns append")
        require(a.defaultValue() == null,
          "graft catalog: DEFAULT values are not supported — new columns backfill null")
        require(a.isNullable,
          s"graft catalog: new column '${a.fieldNames()(0)}' must be nullable " +
            "— existing rows have no value to backfill")
        StructField(a.fieldNames()(0), a.dataType, nullable = true)
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER TABLE change $other — only " +
          "ADD COLUMNS, RENAME COLUMN, DROP COLUMN (schema-only commits) " +
          "and constraint.* TBLPROPERTIES are transactional on this format")
    }
    new GraftTable(dirOf(ident)).addColumns(cols)
    loadTable(ident)
  }

  // ------------------------------------------------------------------
  // maintenance procedures: CALL graft.system.optimize('db.t') etc.
  // Table-name arguments resolve through the SAME validated segment
  // walk as identifiers — a procedure cannot reach outside the
  // warehouse any more than a SELECT can.
  // ------------------------------------------------------------------
  private def dirOfName(raw: String): String =
    resolveUnder(raw.split('.').toSeq).toString

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(ident, dirOfName)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(GraftProcedures.Namespace)) GraftProcedures.list()
    else Array.empty

  override def dropTable(ident: Identifier): Boolean =
    if (!exists(ident)) false
    else { graft.core.Fs.rmTree(new java.io.File(dirOf(ident))); true }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: RENAME is not supported — table paths are " +
        "identity (relocate by moving the directory, the log is relative)")
}

object GraftCatalog {
  /** Catalog-plumbing keys Spark injects into `CREATE TABLE`
    * properties — never table state (the `TableCatalog.PROP_*` set). */
  private[streaming] val ReservedTableProps: Set[String] = Set(
    TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION,
    TableCatalog.PROP_COMMENT, TableCatalog.PROP_OWNER,
    TableCatalog.PROP_EXTERNAL, TableCatalog.PROP_IS_MANAGED_LOCATION)
}

/** The `t.history` metadata table: the commit log as SQL rows (version,
  * op, files added/removed), newest first — DESCRIBE HISTORY without
  * leaving SQL. Driver-resolved from the log alone ([[GraftMetadataScan]]
  * LocalScan): no data file is ever opened, O(commits) at any table
  * size. */
final class GraftHistoryTable(tablePath: String)
    extends Table with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.connector.catalog.TableCapability
  import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType, TimestampType}
  import org.apache.spark.unsafe.types.UTF8String

  private val historySchema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("n_added_files", IntegerType, nullable = false),
    StructField("n_removed_files", IntegerType, nullable = false),
    // wall-clock commit time; null for commits from pre-ts logs
    StructField("commit_ts", TimestampType, nullable = true)))

  override def name(): String = s"graft-table`$tablePath`.history"
  override def schema(): StructType = historySchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val t = new GraftTable(tablePath)
    val rows = t.historyFull().map { case (v, op, a, r, ts) =>
      InternalRow(v, UTF8String.fromString(op), a, r,
        // TimestampType is epoch MICROS internally
        ts.map(ms => (ms * 1000L): java.lang.Long).orNull) }
    new ScanBuilder {
      override def build(): Scan =
        GraftMetadataScan(tablePath, t.latestVersion(), historySchema, rows)
    }
  }
}
