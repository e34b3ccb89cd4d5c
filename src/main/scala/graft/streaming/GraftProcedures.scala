package graft.streaming

import scala.jdk.CollectionConverters._

import graft.medallion.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The SQL face of table maintenance — DSv2 procedures under the
  * catalog's `system` namespace, so the SQL-only persona (the reference's
  * `query_datalake.py` / `fast_query.py` users never leave SQL) can run
  * every lifecycle operation the Scala API has:
  *
  * {{{
  *   CALL graft.system.optimize(table => 'db.t')                  -- compact
  *   CALL graft.system.optimize(table => 'db.t', small_only => true)
  *   CALL graft.system.optimize(table => 'db.t', zorder_by => 'a,b')
  *   CALL graft.system.optimize(table => 'db.t',                  -- OPTIMIZE ... WHERE
  *        where_column => 'dt', where_lower => '2026-08-01')
  *   CALL graft.system.vacuum(table => 'db.t', retain_versions => 2)
  *   CALL graft.system.vacuum(table => 'db.t', dry_run => true)   -- audit only
  *   CALL graft.system.restore(table => 'db.t', version => 3)
  *   CALL graft.system.clone(source => 'db.t', target => 'db.t2')
  *   CALL graft.system.checkpoint(table => 'db.t')
  * }}}
  *
  * Each procedure is one call into the SAME transactional primitive the
  * programmatic API uses ([[GraftTable]] compact/compactSmall/
  * optimizeZorder/vacuum/restore/cloneTo/checkpoint — no parallel code
  * path to drift) and returns its outcome as rows through a driver-local
  * scan: metadata-sized output, no data files opened to report it.
  *
  * Reference anchor: the reference exposes NO maintenance surface at all
  * (`query_datalake.py:139-146` can only SELECT); this is the Delta/
  * Iceberg `CALL` shape (Iceberg's `system.rewrite_data_files`,
  * `expire_snapshots`) adapted to the graft log's operations.
  */
object GraftProcedures {

  /** All procedures live in the `system` namespace, Iceberg-style. */
  val Namespace: Array[String] = Array("system")

  def list(): Array[Identifier] =
    names.map(n => Identifier.of(Namespace, n)).toArray

  private val names =
    Seq("optimize", "vacuum", "restore", "clone", "checkpoint", "analyze",
      "sync_identity", "detail", "replace_range", "truncate_log")

  def load(ident: Identifier, dirOfTable: String => String): UnboundProcedure = {
    require(ident.namespace().sameElements(Namespace),
      s"graft catalog: no procedure namespace '${ident.namespace().mkString(".")}'" +
        " — procedures live under `system`")
    ident.name().toLowerCase match {
      case "optimize"   => optimize(dirOfTable)
      case "vacuum"     => vacuum(dirOfTable)
      case "restore"    => restore(dirOfTable)
      case "clone"      => cloneProc(dirOfTable)
      case "checkpoint" => checkpoint(dirOfTable)
      case "analyze"    => analyze(dirOfTable)
      case "sync_identity" => syncIdentity(dirOfTable)
      case "detail"     => detail(dirOfTable)
      case "replace_range" => replaceRange(dirOfTable)
      case "truncate_log" => truncateLogProc(dirOfTable)
      case other => throw new UnsupportedOperationException(
        s"graft catalog: no procedure system.$other — available: " +
          names.mkString(", "))
    }
  }

  // ------------------------------------------------------------------
  // plumbing
  // ------------------------------------------------------------------

  private def param(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def paramD(name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** One bound procedure: `parameters` in declaration order, `call`
    * receives them as an InternalRow in that same order. */
  private def bound(
      procName: String, procParams: Seq[ProcedureParameter],
      out: StructType)(
      run: InternalRow => Seq[InternalRow]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft table maintenance: $procName"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = s"graft table maintenance: $procName"
          override def parameters(): Array[ProcedureParameter] = procParams.toArray
          // every maintenance op commits (or deletes files) — never
          // eligible for re-execution by the engine
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val rows = run(input)
            Iterator[Scan](GraftMetadataScan(procName, -1L, out, rows))
              .asJava
          }
        }
    }

  private def spark: SparkSession = SparkSession.active

  /** `db.t` → warehouse directory, via the owning catalog's resolver
    * (same `..`-proof segment validation as table identifiers). */
  private def tableDir(dirOfTable: String => String, raw: UTF8String): GraftTable = {
    val s = Option(raw).map(_.toString).getOrElse(
      throw new IllegalArgumentException("procedure needs a table name"))
    val t = new GraftTable(dirOfTable(s))
    require(t.latestVersion() > 0L,
      s"graft catalog: no committed table '$s'")
    t
  }

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  // ------------------------------------------------------------------
  // the procedures
  // ------------------------------------------------------------------

  private val detailOut = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("location", StringType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("num_files", LongType, nullable = false),
    StructField("num_dv_files", LongType, nullable = false),
    StructField("dv_rows", LongType, nullable = false),
    StructField("num_rows", LongType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("partition_spec", StringType, nullable = true),
    StructField("reader_features", StringType, nullable = true),
    StructField("num_constraints", IntegerType, nullable = false),
    StructField("checkpoint_version", LongType, nullable = true),
    StructField("last_commit_ts", TimestampType, nullable = true),
    StructField("properties", StringType, nullable = false)))

  /** DESCRIBE DETAIL (the Delta shape): the table's whole operational
    * state as ONE metadata row — resolved version, live file/DV/row/
    * byte counts, the partition spec, the protocol reader features the
    * CURRENT state requires, constraint count, the newest checkpoint,
    * the head commit's wall-clock stamp, and every table property as
    * sorted JSON. Zero data files opened; closes the operator-persona
    * loop over pieces graft_table_files/history/analyze each surface
    * separately. */
  private def detail(dirOfTable: String => String): UnboundProcedure =
    bound("detail", Seq(param("table", StringType)), detailOut) { in =>
      val t = tableDir(dirOfTable, in.getUTF8String(0))
      val snap = t.snapshot()
      val dvd = snap.files.filter(_.dv.isDefined)
      val features = graft.medallion.TxLog.requiredFeatures(
        "snapshot", Some(snap.schemaJson), snap.files,
        if (snap.constraints.nonEmpty) Some(snap.constraints) else None,
        if (snap.props.nonEmpty) Some(snap.props) else None, Nil, Nil)
      val propsJson = {
        import org.json4s._
        org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(JObject(
            snap.props.toList.sortBy(_._1).map {
              case (k, v) => k -> (JString(v): JValue) })))
      }
      val headTs = t.historyFull().headOption.flatMap(_._5)
      Seq(InternalRow(
        utf8("graft"),
        utf8(t.tablePath),
        snap.version,
        snap.files.size.toLong,
        dvd.size.toLong,
        dvd.map(_.dvRows).sum,
        snap.files.map(_.effectiveRows).sum,
        snap.files.map(_.bytes).sum,
        snap.props.get(graft.medallion.PartitionSpec.Prop).map(utf8).orNull,
        if (features.isEmpty) null else utf8(features.mkString(",")),
        snap.constraints.size,
        t.lastCheckpointVersion().map(Long.box).orNull,
        headTs.map(ms => Long.box(ms * 1000L)).orNull,
        utf8(propsJson)))
    }

  private val replaceRangeOut = StructType(Seq(
    StructField("files_dropped", IntegerType, nullable = false),
    StructField("files_rewritten", IntegerType, nullable = false),
    StructField("version", LongType, nullable = false)))

  /** Atomic REPLACE WHERE from SQL (Delta's `replaceWhere` shape):
    * `CALL cat.system.replace_range(table => 'db.t', column => 'day',
    * lower => '2026-08-01', upper => '2026-08-01', source => 'v')` —
    * swaps the range's content for the rows of the named view/table in
    * ONE commit ([[GraftTable.overwriteRange]]); out-of-window source
    * rows refuse with nothing committed. */
  private def replaceRange(dirOf: String => String): UnboundProcedure =
    bound("replace_range", Seq(
      param("table", StringType),
      param("column", StringType),
      param("source", StringType), // required args precede optionals
      paramD("lower", StringType, "CAST(NULL AS STRING)"),
      paramD("upper", StringType, "CAST(NULL AS STRING)")), replaceRangeOut) { in =>
      val t = tableDir(dirOf, in.getUTF8String(0))
      val c = in.getUTF8String(1).toString
      val src = Option(in.getUTF8String(2)).map(_.toString).getOrElse(
        throw new IllegalArgumentException(
          "replace_range needs a source view/table name"))
      def bnd(i: Int): Option[Any] =
        if (in.isNullAt(i)) None
        else Some(typedBound(t, c, in.getUTF8String(i).toString))
      val (dropped, rewritten, v) =
        t.overwriteRange(spark, spark.table(src), c, bnd(3), bnd(4))
      Seq(InternalRow(dropped, rewritten, v))
    }

  private val analyzeOut = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("distinct_count", LongType, nullable = true),
    StructField("null_count", LongType, nullable = true),
    StructField("min", StringType, nullable = true),
    StructField("max", StringType, nullable = true),
    StructField("sum", StringType, nullable = true)))

  /** ANALYZE: per-column statistics straight from the LOG — distinct
    * count from the merged per-file HLL sketches (`ndv.columns`; null
    * when coverage is partial — a partial union would under-count),
    * exact null counts, and the live min/max in the stats comparison
    * domain. Zero data scanned at any table size; the SQL persona's
    * view of what the CBO reads. */
  private def analyze(dirOfTable: String => String): UnboundProcedure =
    bound("analyze", Seq(param("table", StringType)), analyzeOut) { in =>
      val t = tableDir(dirOfTable, in.getUTF8String(0))
      val snap = t.snapshot()
      snap.schema.fields.toSeq.map { f =>
        val phys = graft.medallion.TxLog.physicalOf(snap.schema, f.name)
        val entries = snap.files.flatMap(_.stats.get(phys))
        val ndv = t.approxCountDistinct(f.name, snap.version)
        val absent = snap.files.filter(_.stats.get(phys).isEmpty)
        // absence ⇒ all-null only for always-stats-able types (see
        // TxLog.absenceMeansAllNull) — else the count is unknown
        val nulls =
          if (!entries.forall(_.nulls.isDefined) ||
              (absent.nonEmpty &&
                !graft.medallion.TxLog.absenceMeansAllNull(f.dataType))) None
          else Some(entries.flatMap(_.nulls).sum + absent.map(_.rows).sum)
        def pick(worst: Boolean): Option[String] =
          if (entries.isEmpty) None
          else if (entries.head.kind == "num") {
            val vs = entries.map(e =>
              BigDecimal(if (worst) e.max else e.min))
            Some((if (worst) vs.max else vs.min).bigDecimal.toPlainString)
          } else {
            // UTF-8 byte order — the order the stats were written in
            val ord = Ordering.fromLessThan[String](
              graft.medallion.TxLog.utf8Cmp(_, _) < 0)
            val vs = entries.map(e => if (worst) e.max else e.min)
            Some(if (worst) vs.max(ord) else vs.min(ord))
          }
        // exact log sum only when EVERY value-bearing file carries it
        val sumStr =
          if (entries.isEmpty || entries.exists(_.sum.isEmpty)) None
          else Some(entries.flatMap(_.sum).map(BigInt(_)).sum.toString)
        InternalRow(utf8(f.name),
          ndv.map(Long.box).orNull,
          nulls.map(Long.box).orNull,
          pick(worst = false).map(utf8).orNull,
          pick(worst = true).map(utf8).orNull,
          sumStr.map(utf8).orNull)
      }
    }

  private val syncIdentityOut = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("next", LongType, nullable = false)))

  /** SYNC IDENTITY (Delta's `ALTER TABLE ... SYNC IDENTITY`): re-base an
    * identity column's `next` above the live maximum — needed after an
    * overwrite that brought explicit values. Zero-scan: the maximum
    * comes from per-file min/max stats. */
  private def syncIdentity(dirOfTable: String => String): UnboundProcedure =
    bound("sync_identity",
      Seq(param("table", StringType), param("column", StringType)),
      syncIdentityOut) { in =>
      val t = tableDir(dirOfTable, in.getUTF8String(0))
      val c = Option(in.getUTF8String(1)).map(_.toString).getOrElse(
        throw new IllegalArgumentException("sync_identity needs a column"))
      Seq(InternalRow(utf8(c), t.syncIdentity(c)))
    }

  private val optimizeOut = StructType(Seq(
    StructField("operation", StringType, nullable = false),
    StructField("files_in", IntegerType, nullable = false),
    StructField("files_out", IntegerType, nullable = false),
    StructField("version", LongType, nullable = false)))

  /** Parse a SQL-string bound into the typed value the stats domain of
    * `column` compares in (the [[graft.medallion.GraftTable.compactRange]]
    * contract): numerics as exact decimals, dates/timestamps as their
    * epoch forms (timestamps accept epoch millis or a UTC
    * `yyyy-MM-dd HH:mm:ss[.SSS]` literal), strings as-is. */
  private def typedBound(t: GraftTable, column: String, s: String): Any = {
    import org.apache.spark.sql.types._
    val dt = t.snapshot().schema.fields.find(_.name == column)
      .getOrElse(throw new IllegalArgumentException(
        s"optimize: no column '$column' to range on")).dataType
    dt match {
      case _: NumericType => new java.math.BigDecimal(s.trim)
      case StringType => s
      case DateType => java.time.LocalDate.parse(s.trim)
      case TimestampType =>
        if (s.trim.forall(c => c.isDigit || c == '-'))
          java.time.Instant.ofEpochMilli(s.trim.toLong)
        else java.time.LocalDateTime.parse(s.trim.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC)
      case other => throw new IllegalArgumentException(
        s"optimize: cannot range on ${other.simpleString} column '$column'")
    }
  }

  /** OPTIMIZE: full compact by default; `small_only => true` merges just
    * the sub-target files (the auto-compaction primitive — at 100 TB
    * this is the only shape anyone runs on a schedule); `zorder_by =>
    * 'a,b'` rewrites Z-order-clustered; `where_column` (+ optional
    * `where_lower`/`where_upper`) scopes the small-file merge to the
    * stats range — the `OPTIMIZE ... WHERE` shape for the
    * recent-ingest key/date band. Precedence: zorder, then range,
    * then small_only, then full. */
  private def optimize(dirOf: String => String): UnboundProcedure =
    bound("optimize", Seq(
      param("table", StringType),
      paramD("zorder_by", StringType, "CAST(NULL AS STRING)"),
      paramD("target_file_mb", IntegerType, "128"),
      paramD("target_files", IntegerType, "16"),
      paramD("small_only", BooleanType, "false"),
      paramD("where_column", StringType, "CAST(NULL AS STRING)"),
      paramD("where_lower", StringType, "CAST(NULL AS STRING)"),
      paramD("where_upper", StringType, "CAST(NULL AS STRING)"),
      paramD("purge_deletes", BooleanType, "false"),
      paramD("layout", StringType, "'zorder'")), optimizeOut) { in =>
      val t = tableDir(dirOf, in.getUTF8String(0))
      val zorderBy = if (in.isNullAt(1)) None else Some(in.getUTF8String(1).toString)
      val targetMB = if (in.isNullAt(2)) 128 else in.getInt(2)
      val targetFiles = if (in.isNullAt(3)) 16 else in.getInt(3)
      val smallOnly = !in.isNullAt(4) && in.getBoolean(4)
      val whereCol = if (in.isNullAt(5)) None else Some(in.getUTF8String(5).toString)
      val purge = !in.isNullAt(8) && in.getBoolean(8)
      def bnd(i: Int): Option[Any] = whereCol.flatMap(c =>
        if (in.isNullAt(i)) None
        else Some(typedBound(t, c, in.getUTF8String(i).toString)))
      val (op, (nIn, nOut, v)) = (zorderBy, whereCol) match {
        case _ if purge =>
          // REORG ... APPLY (PURGE): materialize every deletion vector
          ("purge-deletes", t.purgeDeletes(spark))
        case (Some(cols), _) =>
          val cs = cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq
          require(cs.nonEmpty, "optimize: zorder_by needs at least one column")
          val layout =
            if (in.isNullAt(9)) "zorder" else in.getUTF8String(9).toString
          (layout, t.optimizeZorder(spark, cs, targetFiles, layout))
        case (None, Some(c)) =>
          ("compact-range", t.compactRange(spark, c, bnd(6), bnd(7), targetMB))
        case (None, None) if smallOnly =>
          ("compact-small", t.compactSmall(spark, targetMB))
        case (None, None) =>
          ("compact", t.compact(spark, targetMB))
      }
      Seq(InternalRow(utf8(op), nIn, nOut, v))
    }

  private val vacuumOut = StructType(Seq(
    StructField("files_deleted", IntegerType, nullable = false),
    StructField("change_files_deleted", IntegerType, nullable = false),
    StructField("retained_from_version", LongType, nullable = false)))

  /** `dry_run => true` audits the blast radius: same reachability walk,
    * nothing deleted (Delta's `VACUUM ... DRY RUN`). Change-data-feed
    * files report in their own column — retiring them shortens the FEED
    * horizon (`readChangeFeed` windows), not time travel, so an
    * operator auditing CDC consumers needs the split. `retain_hours`
    * resolves the window against commit wall-clock stamps (Delta's
    * `RETAIN n HOURS`) and takes precedence over `retain_versions`. */
  private def vacuum(dirOf: String => String): UnboundProcedure =
    bound("vacuum", Seq(
      param("table", StringType),
      paramD("retain_versions", IntegerType, "2"),
      paramD("dry_run", BooleanType, "false"),
      paramD("retain_hours", DoubleType, "CAST(NULL AS DOUBLE)")), vacuumOut) { in =>
      val t = tableDir(dirOf, in.getUTF8String(0))
      val dry = !in.isNullAt(2) && in.getBoolean(2)
      val (deleted, retain) =
        if (!in.isNullAt(3)) t.vacuumRetainMillis(
          (in.getDouble(3) * 3600000.0).toLong, dryRun = dry)
        else {
          val r = if (in.isNullAt(1)) 2 else in.getInt(1)
          (t.vacuum(r, dryRun = dry), r)
        }
      val (change, data) = deleted.partition(
        _.startsWith(graft.medallion.TxLog.ChangeDir + "/"))
      Seq(InternalRow(data.size, change.size,
        math.max(1L, t.latestVersion() - retain + 1)))
    }

  private val restoreOut = StructType(Seq(
    StructField("restored_to_version", LongType, nullable = false),
    StructField("committed_version", LongType, nullable = false)))

  /** `timestamp` restores to the snapshot the table held at that
    * instant (UTC `yyyy-MM-dd HH:mm:ss[.SSS]` or epoch millis),
    * resolved via the same commit stamps as `TIMESTAMP AS OF` — the
    * Delta `RESTORE ... TO TIMESTAMP AS OF` shape. Exactly one of
    * `version`/`timestamp` is required. */
  private def restore(dirOf: String => String): UnboundProcedure =
    bound("restore", Seq(
      param("table", StringType),
      paramD("version", LongType, "CAST(NULL AS BIGINT)"),
      paramD("timestamp", StringType, "CAST(NULL AS STRING)")), restoreOut) { in =>
      val t = tableDir(dirOf, in.getUTF8String(0))
      require(in.isNullAt(1) != in.isNullAt(2),
        "restore: pass exactly one of version / timestamp")
      val target =
        if (!in.isNullAt(1)) in.getLong(1)
        else {
          val s = in.getUTF8String(2).toString
          val millis =
            if (s.forall(c => c.isDigit || c == '-')) s.toLong
            else java.time.LocalDateTime.parse(s.trim.replace(' ', 'T'))
              .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          t.versionAtTimestamp(millis)
        }
      val v = t.restore(target)
      Seq(InternalRow(target, v))
    }

  private val cloneOut = StructType(Seq(
    StructField("source_version", LongType, nullable = false),
    StructField("files_linked", IntegerType, nullable = false)))

  private def cloneProc(dirOf: String => String): UnboundProcedure =
    bound("clone", Seq(
      param("source", StringType),
      param("target", StringType),
      paramD("version", LongType, "CAST(-1 AS BIGINT)")), cloneOut) { in =>
      val t = tableDir(dirOf, in.getUTF8String(0))
      require(!in.isNullAt(1), "clone: target is required")
      val destDir = dirOf(in.getUTF8String(1).toString)
      val version = if (in.isNullAt(2)) -1L else in.getLong(2)
      val snapV = if (version >= 0) version else t.latestVersion()
      val dest = t.cloneTo(destDir, version)
      Seq(InternalRow(snapV, dest.snapshot().files.size))
    }

  private val checkpointOut = StructType(Seq(
    StructField("checkpointed_version", LongType, nullable = false)))

  private def checkpoint(dirOf: String => String): UnboundProcedure =
    bound("checkpoint", Seq(param("table", StringType)), checkpointOut) { in =>
      val t = tableDir(dirOf, in.getUTF8String(0))
      Seq(InternalRow(t.checkpoint()))
    }

  private val truncateLogOut = StructType(Seq(
    StructField("log_files_deleted", IntegerType, nullable = false),
    StructField("effective_retain_versions", IntegerType, nullable = false)))

  /** `CALL system.truncate_log(table, retain_versions)` — drop commit
    * history no resolution inside the trailing window can need (see
    * [[graft.medallion.GraftTable.truncateLog]]); the auto path is the
    * `log.retention.versions` table property riding the checkpoint
    * cadence. `effective_retain_versions` reports the retention
    * actually applied — larger than the request when the per-handle
    * vacuum floor clamped it. */
  private def truncateLogProc(dirOf: String => String): UnboundProcedure =
    bound("truncate_log",
      Seq(param("table", StringType), paramD("retain_versions", IntegerType, "100")),
      truncateLogOut) { in =>
      val t = tableDir(dirOf, in.getUTF8String(0))
      val (victims, eff) = t.truncateLogDetailed(in.getInt(1))
      Seq(InternalRow(victims.size, eff))
    }
}
