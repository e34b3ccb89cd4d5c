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
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, usage, builder) =>
      org.apache.spark.sql.graft.FunctionInjector.register(spark, name, usage, builder)
    }
}
