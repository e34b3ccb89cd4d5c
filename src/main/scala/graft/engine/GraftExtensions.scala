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

  /** First argument: a filesystem path (anything containing '/'), or a
    * registered graft-catalog identifier `cat.db.t` resolved against
    * that catalog's warehouse — the same segment validation as the
    * catalog's own identifier walk (no `..`/absolute/hidden escapes). */
  private def resolve(raw: String): String = {
    if (raw.contains("/")) return raw
    val parts = raw.split('.')
    // exactly-3 minimum: a 2-segment 'cat.t' would silently resolve to
    // <warehouse>/t, skipping the database level — a typo'd identifier
    // must fail loudly instead of probing a nonexistent path
    require(parts.length >= 3,
      s"graft_table_changes: '$raw' is neither a path (no '/') nor a " +
        "catalog identifier (cat.db.table — all three segments required)")
    val wh = SparkSession.active.conf
      .getOption(s"spark.sql.catalog.${parts.head}.warehouse")
      .getOrElse(throw new IllegalArgumentException(
        s"graft_table_changes: no catalog named '${parts.head}' is " +
          s"registered (spark.sql.catalog.${parts.head}.warehouse unset)"))
    parts.tail.foldLeft(java.nio.file.Paths.get(wh)) { (p, part) =>
      require(part.nonEmpty && !part.contains("/") && !part.startsWith("."),
        s"graft_table_changes: illegal identifier segment '$part'")
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
  }
}
