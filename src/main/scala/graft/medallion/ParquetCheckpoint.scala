package graft.medallion

import java.nio.file.{Files, Path}
import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{BINARY, DOUBLE, INT64}
import org.apache.spark.sql.types.StructType
import org.json4s.jackson.JsonMethods

/** COLUMNAR commit-log checkpoints (the Delta parquet-checkpoint move,
  * opt-in via the `checkpoint.format=parquet` table property): one
  * parquet file per checkpoint instead of JSON lines, so that at the
  * 10⁶–10⁷-add scale a 100 TB table carries,
  *
  *   - the DISTRIBUTED planning prune becomes a real parquet scan:
  *     row-group min/max skipping on typed per-column stat bounds
  *     (predicate pushdown) plus column projection, instead of
  *     whole-line JSON parsing of every add — executors touch only the
  *     row groups whose stat ranges can overlap the scan's bounds;
  *   - the driver full-resolution path decodes a compact binary format
  *     (~4–5× smaller than the JSON) through the same plain-JVM
  *     parquet-hadoop readers Spark itself uses (no SparkSession
  *     needed — `snapshot()` keeps working from any process).
  *
  * Layout: row 0 is a META row (`path` = "", `meta` = the checkpoint's
  * meta document — the exact info/protocol/schema/constraints/props/txn
  * JSON lines the JSON checkpoint would carry, rendered by the ONE
  * rendering path). Every other row is one add: `path`/`rows`/`bytes`,
  * the exact stats JSON (byte-identical round trip of every
  * min/max/nulls/bloom/hll/sum), optional `dv`/`dvn`/`v` (deletion
  * vector, provenance). Additionally, for schema field i, typed
  * PUSHDOWN bounds: `nmin_i`/`nmax_i` (DOUBLE, numeric-kind columns,
  * conservatively widened one ulp so decimal→double rounding can never
  * exclude a true survivor) and `tmin_i`/`tmax_i` (UTF8, string-kind
  * columns — parquet's unsigned-byte UTF8 ordering matches
  * [[TxLog.utf8Cmp]]). The pushdown columns are an OPTIMIZATION only:
  * the exact shared predicate ([[TxLog.ColStats.overlaps]] +
  * [[PartitionSpec.admits]]) re-runs executor-side on every row the
  * coarse scan admits, so correctness never depends on them.
  *
  * Readers that predate this format fail LOUDLY by name: the property
  * commit (and every later checkpoint meta) carries the
  * `parquetCheckpoint` reader feature through the protocol gate.
  */
private[graft] object ParquetCheckpoint {

  /** Hadoop conf for LOCAL parquet IO: raw local FS (no .crc sidecars
    * in the log directory). */
  private def conf(): Configuration = {
    val c = new Configuration(false)
    c.set("fs.file.impl", classOf[org.apache.hadoop.fs.RawLocalFileSystem].getName)
    c.setBoolean("parquet.avro.add-list-element-records", false)
    c
  }

  /** The checkpoint's parquet message type for a table schema: fixed
    * columns + per-field typed pushdown bounds (see object doc). */
  private[medallion] def messageType(schema: StructType): MessageType = {
    val string = LogicalTypeAnnotation.stringType()
    val b = Types.buildMessage()
    b.required(BINARY).as(string).named("path")
    b.optional(BINARY).as(string).named("meta")
    b.optional(INT64).named("rows")
    b.optional(INT64).named("bytes")
    b.optional(BINARY).as(string).named("stats")
    b.optional(BINARY).as(string).named("dv")
    b.optional(INT64).named("dvn")
    b.optional(INT64).named("v")
    b.optional(INT64).named("rid")
    b.optional(org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.BOOLEAN).named("ridm")
    schema.fields.indices.foreach { i =>
      b.optional(DOUBLE).named(s"nmin_$i")
      b.optional(DOUBLE).named(s"nmax_$i")
      b.optional(BINARY).as(string).named(s"tmin_$i")
      b.optional(BINARY).as(string).named(s"tmax_$i")
    }
    b.named("graft_checkpoint")
  }

  /** Decimal string → double, widened DOWN one ulp: stored nmin must
    * be ≤ the true minimum whatever the rounding direction. */
  private[medallion] def loDouble(s: String): Double =
    try Math.nextDown(BigDecimal(s).toDouble)
    catch { case _: NumberFormatException => Double.NegativeInfinity }

  /** Decimal string → double, widened UP one ulp (≥ the true max). */
  private[medallion] def hiDouble(s: String): Double =
    try Math.nextUp(BigDecimal(s).toDouble)
    catch { case _: NumberFormatException => Double.PositiveInfinity }

  /** Write a checkpoint: meta row + one row per add, streamed through
    * the parquet writer (row-group at a time — a 10⁷-add checkpoint
    * never materializes on the heap). Put-if-absent publish via the
    * same atomic hard-link as the JSON path. Returns true if this
    * writer won the name. */
  def write(
      target: Path, metaDoc: String, schema: StructType,
      adds: Iterator[(TxLog.AddFile, Option[Long])]): Boolean = {
    val c = conf()
    val mt = messageType(schema)
    GroupWriteSupport.setSchema(mt, c)
    val fields = schema.fields
    val physOf = fields.indices.map(i => TxLog.physicalOf(schema, fields(i).name))
    val kinds = fields.indices.map(i => TxLog.statsKind(fields(i).dataType))
    val tmp = target.getParent.resolve(s".tmp-${UUID.randomUUID()}.parquet")
    val factory = new SimpleGroupFactory(mt)
    val w = ExampleParquetWriter.builder(
      HadoopOutputFile.fromPath(new HPath(tmp.toUri), c))
      .withConf(c)
      .withType(mt)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try {
      try {
        val meta = factory.newGroup()
        meta.append("path", "")
        meta.append("meta", metaDoc)
        w.write(meta)
        adds.foreach { case (a, vOpt) =>
          val g = factory.newGroup()
          g.append("path", a.path)
          g.append("rows", a.rows)
          g.append("bytes", a.bytes)
          g.append("stats",
            JsonMethods.compact(JsonMethods.render(TxLog.statsToJson(a.stats))))
          a.dv.foreach(g.append("dv", _))
          if (a.dv.isDefined) g.append("dvn", a.dvRows)
          vOpt.foreach(g.append("v", _))
          a.baseRowId.foreach(g.append("rid", _))
          if (a.ridMaterialized) g.append("ridm", true)
          var i = 0
          while (i < physOf.length) {
            a.stats.get(physOf(i)).foreach { cs =>
              if (kinds(i) == "num" && cs.kind == "num") {
                g.append(s"nmin_$i", loDouble(cs.min))
                g.append(s"nmax_$i", hiDouble(cs.max))
              } else {
                g.append(s"tmin_$i", cs.min)
                g.append(s"tmax_$i", cs.max)
              }
            }
            i += 1
          }
          w.write(g)
        }
      } finally w.close()
      try { Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally { Files.deleteIfExists(tmp); () }
  }

  private def str(g: Group, f: String): Option[String] =
    if (g.getFieldRepetitionCount(f) > 0) Some(g.getString(f, 0)) else None
  private def lng(g: Group, f: String): Option[Long] =
    if (g.getFieldRepetitionCount(f) > 0) Some(g.getLong(f, 0)) else None

  /** Full driver-side read: the whole checkpoint back as a [[TxLog.Commit]]
    * — meta document parsed by the shared commit parser, adds
    * reconstructed from their exact stats JSON. Plain JVM (no Spark). */
  def readCommit(path: Path): TxLog.Commit = {
    val r = ParquetReader.builder(new GroupReadSupport(), new HPath(path.toUri))
      .withConf(conf()).build()
    val adds = mutable.ArrayBuffer.empty[TxLog.AddFile]
    val addVersions = mutable.Map.empty[String, Long]
    var metaDoc: String = null
    try {
      var g = r.read()
      while (g != null) {
        val p = g.getString("path", 0)
        if (p.isEmpty && str(g, "meta").isDefined) metaDoc = g.getString("meta", 0)
        else {
          val stats = TxLog.parseStats(JsonMethods.parse(g.getString("stats", 0)))
          val a = TxLog.AddFile(p,
            lng(g, "rows").getOrElse(0L), lng(g, "bytes").getOrElse(0L),
            stats, str(g, "dv"), lng(g, "dvn").getOrElse(0L),
            // pre-tracking checkpoints lack the columns entirely —
            // getFieldRepetitionCount throws on an unknown field name
            if (g.getType.containsField("rid")) lng(g, "rid") else None,
            g.getType.containsField("ridm") &&
              g.getFieldRepetitionCount("ridm") > 0 &&
              g.getBoolean("ridm", 0))
          adds += a
          lng(g, "v").foreach(addVersions += p -> _)
        }
        g = r.read()
      }
    } finally r.close()
    require(metaDoc != null, s"parquet checkpoint $path has no meta row")
    TxLog.parseCommit(metaDoc)
      .copy(adds = adds.toSeq, addVersions = addVersions.toMap)
  }

  /** Projected read of ONLY the meta document (two small columns — the
    * driver's half of the distributed prune never touches add rows). */
  def readMetaDoc(path: Path): String = {
    val c = conf()
    val projection = Types.buildMessage()
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("path")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("meta")
      .named("graft_checkpoint")
    c.set(ReadSupport.PARQUET_READ_SCHEMA, projection.toString)
    val r = ParquetReader.builder(new GroupReadSupport(), new HPath(path.toUri))
      .withConf(c).build()
    try {
      var g = r.read()
      while (g != null) {
        if (g.getString("path", 0).isEmpty && str(g, "meta").isDefined)
          return g.getString("meta", 0)
        g = r.read()
      }
    } finally r.close()
    throw new IllegalStateException(s"parquet checkpoint $path has no meta row")
  }
}
