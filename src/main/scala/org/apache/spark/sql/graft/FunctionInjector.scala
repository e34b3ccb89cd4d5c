package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-scope function registration for an ALREADY-RUNNING session.
  *
  * `SparkSession.sessionState` is `private[sql]`, so this one-file shim
  * lives in the `org.apache.spark.sql` package tree — the standard escape
  * hatch for libraries that must register native expressions on sessions
  * they did not build (when building the session yourself, prefer
  * `spark.sql.extensions` = [[graft.engine.GraftExtensions]]).
  */
object FunctionInjector {

  /** Idempotently register a native expression builder under `name`. */
  def register(
      spark: SparkSession,
      name: String,
      usage: String,
      builder: Seq[Expression] => Expression): Unit = {
    val id = FunctionIdentifier(name)
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(id)) {
      registry.registerFunction(
        id, new ExpressionInfo("graft", null, name, usage, ""), builder)
    }
  }

  /** Idempotently register a TABLE function (`SELECT * FROM name(...)`)
    * — the post-hoc twin of `SparkSessionExtensions.injectTableFunction`. */
  def registerTable(
      spark: SparkSession,
      name: String,
      usage: String,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit = {
    val id = FunctionIdentifier(name)
    val registry = spark.sessionState.tableFunctionRegistry
    if (!registry.functionExists(id)) {
      registry.registerFunction(
        id, new ExpressionInfo("graft", null, name, usage, ""), builder)
    }
  }
}
