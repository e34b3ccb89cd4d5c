package graft.medallion

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.types._

/** Per-file column statistics served from PARQUET FOOTERS instead of a
  * second full-read Spark job (guide §1.2/§6: writing a file and then
  * re-reading every byte of it to learn its min/max doubles the write
  * path's IO; the footer already carries exact row counts and, for most
  * types, exact column bounds). One footer read is O(KB) driver-side
  * work per file versus a full decode of the staged bytes per commit.
  *
  * EXACTNESS CONTRACT — a column is served from the footer only when the
  * result is bit-identical to what the Spark stats aggregate
  * ([[GraftTable.adoptStaged]]) would have produced; anything uncertain
  * falls back to the aggregate (the `residual` set):
  *
  *   - row counts: always exact (block metadata).
  *   - integral / date / decimal: footer min/max/null_count are exact.
  *   - strings: exact while parquet-mr RECORDS them — this parquet
  *     version DROPS binary stats past its 4 KB footer cap rather than
  *     truncating (pinned by FooterStatsSpec), so present ⇒ exact; a
  *     size-dropped chunk routes the column to the aggregate. The
  *     unsigned byte order parquet uses equals Spark's UTF8String
  *     min/max order.
  *   - float/double: parquet-mr SUPPRESSES min/max on any chunk that saw
  *     a NaN (`hasNonNullValue` stays false while `null_count` < rows —
  *     pinned by FooterStatsSpec), so values present ⇒ no NaN ⇒ exact;
  *     a suppressed chunk yields NO stats entry, exactly what the
  *     aggregate's NaN policy produces. ±Infinity is visible in the
  *     footer and drops the entry like the aggregate's isFiniteStat.
  *   - timestamps: INT64 MICROS/MILLIS annotations are exact (epoch-ms
  *     conversion mirrors statsLiteral); INT96 has no usable ordering —
  *     residual.
  *   - an all-null file column yields NO entry on both paths.
  */
private[medallion] object FooterStats {

  /** One staged file's footer-derived stats: exact `rows`, `entries`
    * for columns fully decided by the footer (absence of a stats-column
    * key here AND in `residual` means "decided: no stats entry" — the
    * all-null / NaN outcome), and `residual` columns that need the
    * Spark aggregate. */
  final case class FileFooter(
      rows: Long,
      entries: Map[String, TxLog.ColStats],
      residual: Set[String])

  /** Read one staged parquet file's footer and decide every stats
    * column. `sCols` are the schema's stats-able fields (the caller's
    * [[GraftTable.statsColumns]] selection). */
  def read(conf: Configuration, file: java.nio.file.Path,
      sCols: Seq[StructField]): FileFooter = {
    val in = HadoopInputFile.fromPath(new Path(file.toString), conf)
    val reader = ParquetFileReader.open(in)
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val byName = sCols.map(f => f.name -> f).toMap
      // (column name) -> per-chunk (stats, chunkRows, primitiveType)
      val chunks = blocks.flatMap { b =>
        b.getColumns.asScala.flatMap { c =>
          val name = c.getPath.toDotString
          if (byName.contains(name))
            Some((name, (c.getStatistics, b.getRowCount, c.getPrimitiveType)))
          else None
        }
      }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val entries = Map.newBuilder[String, TxLog.ColStats]
      val residual = Set.newBuilder[String]
      sCols.foreach { f =>
        chunks.get(f.name) match {
          case None =>
            // column absent from the file (schema evolution reads fill
            // it with nulls): no entry on either path when the file is
            // truly missing it — but only the aggregate can see through
            // this for sure, so stay conservative
            residual += f.name
          case Some(cs) => decide(f, cs, rows) match {
            case Decided(Some(st)) => entries += f.name -> st
            case Decided(None)     => () // decided: no stats entry
            case Undecidable       => residual += f.name
          }
        }
      }
      FileFooter(rows, entries.result(), residual.result())
    } finally reader.close()
  }

  private sealed trait Outcome
  private final case class Decided(stats: Option[TxLog.ColStats]) extends Outcome
  private case object Undecidable extends Outcome

  private val FpTypes: Set[DataType] = Set(FloatType, DoubleType)

  /** Longest string (in UTF-8 BYTES) accepted from a footer: parquet-mr
    * drops binary stats past 4096 bytes instead of truncating (spec-
    * pinned); staying well under the cap also guards against a
    * deployment that configures `parquet.statistics.truncate.length`. */
  private val MaxBinaryStat = 4000

  private def decide(
      f: StructField,
      cs: Seq[(Statistics[_], Long, PrimitiveType)],
      fileRows: Long): Outcome = {
    // physical/logical type must be the one Spark's writer produces for
    // this schema field — anything else is not ours to interpret
    if (!cs.forall { case (_, _, pt) => physMatches(f.dataType, pt) })
      return Undecidable
    var nulls = 0L
    var poisonedFp = false
    val valued = Seq.newBuilder[Statistics[_]]
    cs.foreach { case (st, chunkRows, _) =>
      if (st == null || st.isEmpty || !st.isNumNullsSet) return Undecidable
      nulls += st.getNumNulls
      if (st.hasNonNullValue) valued += st
      else if (st.getNumNulls < chunkRows) {
        // values exist but min/max were suppressed: the writer's NaN
        // policy for float/double — the aggregate would surface NaN and
        // drop the entry; for any other type this is unexpected
        if (FpTypes.contains(f.dataType)) poisonedFp = true
        else return Undecidable
      }
    }
    if (poisonedFp) return Decided(None)
    val vs = valued.result()
    if (vs.isEmpty) return Decided(None) // all-null column
    // fold with parquet's own type-correct comparator
    val merged = vs.head.copy().asInstanceOf[Statistics[Nothing]]
    vs.tail.foreach(s => merged.mergeStatistics(s.asInstanceOf[Statistics[Nothing]]))
    val mn = convert(f.dataType, merged.genericGetMin)
    val mx = convert(f.dataType, merged.genericGetMax)
    (mn, mx) match {
      case (Some(a), Some(b)) =>
        if (!TxLog.isFiniteStat(a) || !TxLog.isFiniteStat(b)) Decided(None)
        else Decided(Some(TxLog.ColStats(
          TxLog.statsKind(f.dataType),
          TxLog.statsLiteral(a), TxLog.statsLiteral(b), Some(nulls))))
      case _ => Undecidable
    }
  }

  private def physMatches(dt: DataType, pt: PrimitiveType): Boolean = {
    val n = pt.getPrimitiveTypeName
    val ann = pt.getLogicalTypeAnnotation
    dt match {
      case ByteType | ShortType | IntegerType => n == PrimitiveTypeName.INT32 &&
        (ann == null || ann.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation])
      case LongType => n == PrimitiveTypeName.INT64 &&
        (ann == null || ann.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation])
      case FloatType => n == PrimitiveTypeName.FLOAT
      case DoubleType => n == PrimitiveTypeName.DOUBLE
      case StringType => n == PrimitiveTypeName.BINARY &&
        ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
      case DateType => n == PrimitiveTypeName.INT32 &&
        ann.isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation]
      case TimestampType => n == PrimitiveTypeName.INT64 && (ann match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          // MICROS only: convert() divides by 1000 — a MILLIS file
          // (never Spark-written for TimestampType) must stay residual
          t.isAdjustedToUTC && t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS
        case _ => false
      })
      case d: DecimalType => (ann match {
        case a: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
          a.getScale == d.scale
        case _ => false
      }) && (n == PrimitiveTypeName.INT32 || n == PrimitiveTypeName.INT64 ||
        n == PrimitiveTypeName.BINARY ||
        n == PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY)
      case _ => false
    }
  }

  /** Footer value → the JVM value the Spark aggregate's collect() would
    * have returned, so [[TxLog.statsLiteral]] renders identically.
    * None = value not interpretable (e.g. an over-long string). */
  private def convert(dt: DataType, v: Any): Option[Any] = (dt, v) match {
    case (_, null) => None
    case (ByteType | ShortType | IntegerType, i: java.lang.Integer) => Some(i)
    case (LongType, l: java.lang.Long) => Some(l)
    case (FloatType, f: java.lang.Float) => Some(f)
    case (DoubleType, d: java.lang.Double) => Some(d)
    case (StringType, b: Binary) =>
      val bytes = b.getBytes
      if (bytes.length > MaxBinaryStat) None
      else Some(new String(bytes, StandardCharsets.UTF_8))
    case (DateType, i: java.lang.Integer) =>
      // statsLiteral(java.sql.Date) renders epoch days; hand it the
      // LocalDate form directly (same branch, same digits)
      Some(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (TimestampType, l: java.lang.Long) =>
      // MICROS (Spark's writer unit): statsLiteral renders epoch millis
      // exactly as java.sql.Timestamp.getTime — floor division
      Some(java.time.Instant.ofEpochMilli(Math.floorDiv(l.longValue(), 1000L)))
    case (d: DecimalType, x) => x match {
      case i: java.lang.Integer =>
        Some(java.math.BigDecimal.valueOf(i.longValue(), d.scale))
      case l: java.lang.Long =>
        Some(java.math.BigDecimal.valueOf(l.longValue(), d.scale))
      case b: Binary =>
        Some(new java.math.BigDecimal(
          new java.math.BigInteger(b.getBytes), d.scale))
      case _ => None
    }
    case _ => None
  }

  /** Exact row count of one parquet file from its footer — the
    * always-safe subset of [[read]] for callers that only need counts
    * (CDC change staging). */
  def rowCount(conf: Configuration, file: java.nio.file.Path): Long = {
    val in = HadoopInputFile.fromPath(new Path(file.toString), conf)
    val reader = ParquetFileReader.open(in)
    try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    finally reader.close()
  }
}
