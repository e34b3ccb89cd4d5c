package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.CosineSimilarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension entry point: injects graft's native expressions into
  * a session at build time.
  *
  * Usage: `SparkSession.builder().config("spark.sql.extensions",
  * "graft.engine.GraftExtensions")` — after which `cosine_sim(a, b)` is a
  * first-class SQL/DataFrame function with whole-stage codegen. For
  * sessions built elsewhere, [[GraftFunctions.register]] attaches the
  * same functions after the fact.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo("graft", null, name, usage, ""),
          builder))
    }
    // config-gated count(DISTINCT) → HLL sketch rewrite (off by default)
    ext.injectOptimizerRule(session =>
      org.apache.spark.sql.graft.ApproxDistinctRewrite.forSession(session))
    // SQL surface for the table format's CHANGE DATA FEED (the Delta
    // `table_changes` TVF shape): resolves at analysis time to the
    // feed's logical plan — O(changes in range) scans, not O(table)
    ext.injectTableFunction(
      (FunctionIdentifier("graft_table_changes"),
        new ExpressionInfo("graft", null, "graft_table_changes",
          "graft_table_changes(path, since[, until[, update_images]]) - " +
            "every row change of the graft table at `path` in versions " +
            "(since, until], tagged _change_type ('insert'|'delete'; " +
            "updates are the pair, or 'update_preimage'/" +
            "'update_postimage' with update_images=true) and " +
            "_commit_version", ""),
        GraftTableChanges.plan _))
    // metadata tables (the Iceberg `t.history`/`t.files` and Delta
    // DESCRIBE HISTORY shape): driver-local, metadata-sized rows —
    // commit-count and live-file-count respectively, never data-sized
    ext.injectTableFunction(
      (FunctionIdentifier("graft_table_history"),
        new ExpressionInfo("graft", null, "graft_table_history",
          "graft_table_history(path) - one row per commit of the graft " +
            "table at `path`: version, operation, n_add, n_remove, " +
            "commit_ts", ""),
        GraftMetaTables.historyPlan _))
    ext.injectTableFunction(
      (FunctionIdentifier("graft_table_files"),
        new ExpressionInfo("graft", null, "graft_table_files",
          "graft_table_files(path) - one row per LIVE data file of the " +
            "graft table at `path`: path, rows, dv_rows, bytes, " +
            "added_in, partition, stats", ""),
        GraftMetaTables.filesPlan _))
    ext.injectTableFunction(
      (FunctionIdentifier("graft_table_partitions"),
        new ExpressionInfo("graft", null, "graft_table_partitions",
          "graft_table_partitions(path) - one row per live partition " +
            "tuple of the graft table at `path`: partition, n_files, " +
            "rows, dv_rows, bytes", ""),
        GraftMetaTables.partitionsPlan _))
  }
}

/** Builder behind the `graft_table_changes` table function: argument
  * literals → [[graft.medallion.GraftTable.readChangeFeed]]'s plan. */
object GraftTableChanges {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  def plan(es: Seq[Expression]): LogicalPlan = {
    require(es.length >= 2 && es.length <= 4,
      "graft_table_changes(path, since[, until[, update_images]]) takes " +
        s"2 to 4 arguments, got ${es.length}")
    def literal(e: Expression, what: String): Any = e match {
      case Literal(v, _) => v
      case other => throw new IllegalArgumentException(
        s"graft_table_changes: $what must be a literal, got ${other.sql}")
    }
    def asLong(v: Any, what: String): Long = v match {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"graft_table_changes: $what must be an integer version, got $other")
    }
    val raw = String.valueOf(literal(es.head, "path"))
    val since = asLong(literal(es(1), "since"), "since")
    val until =
      if (es.length >= 3) asLong(literal(es(2), "until"), "until") else -1L
    val updateImages = es.length == 4 && (literal(es(3), "update_images") match {
      case b: java.lang.Boolean => b.booleanValue()
      case other => throw new IllegalArgumentException(
        s"graft_table_changes: update_images must be a boolean, got $other")
    })
    new graft.medallion.GraftTable(resolve(raw))
      .readChangeFeed(SparkSession.active, since, until, updateImages)
      .queryExecution.analyzed
  }

  private def resolve(raw: String): String =
    GraftMetaTables.resolvePath("graft_table_changes", raw)
}

/** Builders behind the metadata table functions — the Iceberg
  * `t.history`/`t.files` (and Delta `DESCRIBE HISTORY`) observability
  * surface as plain SQL TVFs. Both materialize driver-local rows that
  * are METADATA-sized by construction (one per commit / one per live
  * file — the same bound as the procedure outputs), never data-sized. */
object GraftMetaTables {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def pathArg(es: Seq[Expression], fn: String): String = {
    require(es.length == 1, s"$fn(path) takes exactly 1 argument, got ${es.length}")
    es.head match {
      case Literal(v, _) => resolvePath(fn, String.valueOf(v))
      case other => throw new IllegalArgumentException(
        s"$fn: path must be a literal, got ${other.sql}")
    }
  }

  /** One row per commit: (version, operation, n_add, n_remove,
    * commit_ts) — commit_ts null on pre-stamp logs. */
  def historyPlan(es: Seq[Expression]): LogicalPlan = {
    val t = new graft.medallion.GraftTable(pathArg(es, "graft_table_history"))
    val spark = SparkSession.active
    val rows = t.historyFull().map { case (v, op, nAdd, nRemove, ts) =>
      Row(v, op, nAdd, nRemove,
        ts.map(ms => new java.sql.Timestamp(ms)).orNull)
    }
    val schema = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("n_add", IntegerType, nullable = false),
      StructField("n_remove", IntegerType, nullable = false),
      StructField("commit_ts", TimestampType, nullable = true)))
    spark.createDataFrame(javaRows(rows), schema).queryExecution.analyzed
  }

  /** One row per LIVE file: (path, rows, dv_rows, bytes, added_in,
    * partition, stats) — `partition` renders the file's transform
    * tuple (`days(ts)=19701, bucket(8,id)=*` — `*` marks a straddling
    * range), `stats` a compact sorted per-column min/max/nulls JSON
    * (bloom bitsets and partition keys excluded — bitsets are opaque
    * bytes, the tuple has its own column). */
  def filesPlan(es: Seq[Expression]): LogicalPlan = {
    val t = new graft.medallion.GraftTable(pathArg(es, "graft_table_files"))
    val spark = SparkSession.active
    val snap = t.snapshot()
    val rows = snap.files.sortBy(_.path).map { a =>
      val sig = graft.medallion.PartitionSpec.tupleSignature(a)
      val partition =
        if (sig.isEmpty) null
        else sig.toSeq.sortBy(_._1).map { case (k, v) =>
          s"${k.stripPrefix(graft.medallion.PartitionSpec.Prefix)}=${v.getOrElse("*")}"
        }.mkString(", ")
      // json4s render (as the commit serializer) — min/max/column names
      // may carry quotes/backslashes/control chars; raw interpolation
      // would emit invalid JSON
      val stats = {
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        JsonMethods.compact(JsonMethods.render(JObject(
          a.stats.toSeq
            .filterNot(_._1.startsWith(graft.medallion.PartitionSpec.Prefix))
            .sortBy(_._1).map { case (c, cs) =>
              c -> (JObject(List(
                "min" -> (JString(cs.min): JValue),
                "max" -> (JString(cs.max): JValue)) ++
                cs.nulls.map(n => "nulls" -> (JLong(n): JValue)).toList): JValue)
            }.toList)))
      }
      Row(a.path, a.effectiveRows, a.dvRows, a.bytes,
        snap.addedIn.getOrElse(a.path, snap.version), partition, stats)
    }
    val schema = StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("dv_rows", LongType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("added_in", LongType, nullable = false),
      StructField("partition", StringType, nullable = true),
      StructField("stats", StringType, nullable = false)))
    spark.createDataFrame(javaRows(rows), schema).queryExecution.analyzed
  }

  /** One row per LIVE partition TUPLE (the Iceberg `partitions`
    * metadata table): the transform tuple rendered as in
    * [[filesPlan]]'s `partition` column, with file/row/DV/byte counts
    * folded across its files. Files straddling a transform (or
    * predating the spec) group under the `*`-marked tuple; a spec-less
    * table reports ONE null-partition row. Driver-local and
    * file-count-sized — never opens data. */
  def partitionsPlan(es: Seq[Expression]): LogicalPlan = {
    val t = new graft.medallion.GraftTable(pathArg(es, "graft_table_partitions"))
    val spark = SparkSession.active
    val snap = t.snapshot()
    def tupleOf(a: graft.medallion.TxLog.AddFile): String = {
      val sig = graft.medallion.PartitionSpec.tupleSignature(a)
      if (sig.isEmpty) null
      else sig.toSeq.sortBy(_._1).map { case (k, v) =>
        s"${k.stripPrefix(graft.medallion.PartitionSpec.Prefix)}=${v.getOrElse("*")}"
      }.mkString(", ")
    }
    val rows = snap.files.groupBy(tupleOf).toSeq
      .sortBy { case (k, _) => Option(k).getOrElse("") }
      .map { case (tuple, fs) =>
        Row(tuple, fs.size, fs.map(_.effectiveRows).sum,
          fs.map(_.dvRows).sum, fs.map(_.bytes).sum)
      }
    val schema = StructType(Seq(
      StructField("partition", StringType, nullable = true),
      StructField("n_files", IntegerType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("dv_rows", LongType, nullable = false),
      StructField("bytes", LongType, nullable = false)))
    spark.createDataFrame(javaRows(rows), schema).queryExecution.analyzed
  }

  private def javaRows(s: Seq[Row]): java.util.List[Row] = {
    val l = new java.util.ArrayList[Row](s.length)
    s.foreach(l.add)
    l
  }

  /** A TVF's first argument: a filesystem path (anything containing
    * '/'), or a registered graft-catalog identifier `cat.db.t` resolved
    * against that catalog's warehouse — the same segment validation as
    * the catalog's own identifier walk (no `..`/absolute/hidden
    * escapes). A 2-segment 'cat.t' fails loudly rather than silently
    * resolving to <warehouse>/t. */
  private[engine] def resolvePath(fn: String, raw: String): String = {
    if (raw.contains("/")) return raw
    val parts = raw.split('.')
    require(parts.length >= 3,
      s"$fn: '$raw' is neither a path (no '/') nor a " +
        "catalog identifier (cat.db.table — all three segments required)")
    val wh = SparkSession.active.conf
      .getOption(s"spark.sql.catalog.${parts.head}.warehouse")
      .getOrElse(throw new IllegalArgumentException(
        s"$fn: no catalog named '${parts.head}' is " +
          s"registered (spark.sql.catalog.${parts.head}.warehouse unset)"))
    parts.tail.foldLeft(java.nio.file.Paths.get(wh)) { (p, part) =>
      require(part.nonEmpty && !part.contains("/") && !part.startsWith("."),
        s"$fn: illegal identifier segment '$part'")
      p.resolve(part)
    }.toString
  }
}

object GraftFunctions {

  /** (name, usage, builder) for every native graft function. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two float vectors",
      (es: Seq[Expression]) => {
        // arity-checked here: an unguarded es(1) would surface a wrong
        // argument count as IndexOutOfBoundsException from inside
        // analysis instead of a readable error
        if (es.length != 2) throw new IllegalArgumentException(
          s"cosine_sim requires exactly 2 arguments, got ${es.length}")
        CosineSimilarity(es.head, es(1))
      }),
    ("nfc_normalize",
      "nfc_normalize(s) - Unicode NFC canonical composition of a string",
      (es: Seq[Expression]) => {
        if (es.length != 1) throw new IllegalArgumentException(
          s"nfc_normalize requires exactly 1 argument, got ${es.length}")
        org.apache.spark.sql.graft.NfcNormalize(es.head)
      }),
    ("ln_fp",
      "ln_fp(n) - fixed-point ln of a positive integer, scaled by 1e15",
      (es: Seq[Expression]) => {
        if (es.length != 1) throw new IllegalArgumentException(
          s"ln_fp requires exactly 1 argument, got ${es.length}")
        org.apache.spark.sql.graft.LnFp(es.head)
      }),
    ("exp_fp",
      "exp_fp(x) - fixed-point exp of a 1e15-scaled argument, scaled by 1e15",
      (es: Seq[Expression]) => {
        if (es.length != 1) throw new IllegalArgumentException(
          s"exp_fp requires exactly 1 argument, got ${es.length}")
        org.apache.spark.sql.graft.ExpFp(es.head)
      }),
    ("hilbert_index",
      "hilbert_index(bits, c0, c1, ...) - Hilbert-curve index of scaled coordinates",
      (es: Seq[Expression]) => {
        if (es.length < 2) throw new IllegalArgumentException(
          s"hilbert_index requires bits + at least 1 coordinate, got ${es.length}")
        org.apache.spark.sql.graft.HilbertIndex(es)
      }))

  /** Idempotent post-hoc registration on a running session. */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, usage, builder) =>
      org.apache.spark.sql.graft.FunctionInjector.register(spark, name, usage, builder)
    }
    org.apache.spark.sql.graft.FunctionInjector.registerTable(
      spark, "graft_table_changes",
      "graft_table_changes(path, since[, until]) - change data feed",
      GraftTableChanges.plan _)
    org.apache.spark.sql.graft.FunctionInjector.registerTable(
      spark, "graft_table_history",
      "graft_table_history(path) - one row per commit",
      GraftMetaTables.historyPlan _)
    org.apache.spark.sql.graft.FunctionInjector.registerTable(
      spark, "graft_table_files",
      "graft_table_files(path) - one row per live data file",
      GraftMetaTables.filesPlan _)
    org.apache.spark.sql.graft.FunctionInjector.registerTable(
      spark, "graft_table_partitions",
      "graft_table_partitions(path) - one row per live partition tuple",
      GraftMetaTables.partitionsPlan _)
  }
}
