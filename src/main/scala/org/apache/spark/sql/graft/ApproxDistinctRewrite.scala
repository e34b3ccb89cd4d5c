// In the org.apache.spark.sql package tree: the rule pattern-matches
// catalyst aggregate internals that are private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Config-gated optimizer rule: rewrite exact `count(DISTINCT x)` to the
  * HyperLogLog++ sketch (`approx_count_distinct`).
  *
  * Exact distinct counting is the classic 100 TB cliff — Catalyst plans
  * it as an Expand + two aggregate phases, doubling shuffle volume per
  * distinct column. When a pipeline tolerates ~2% error (monitoring,
  * trend dashboards — most of the reference's gold metrics), flipping
  * `spark.graft.approxDistinct=true` converts every count-distinct in
  * every query to a single-pass mergeable sketch without touching query
  * code. Default off: correctness gates (DuckDB oracle compare) run
  * exact.
  *
  * Injected via `graft.engine.GraftExtensions` (injectOptimizerRule).
  */
case class ApproxDistinctRewrite(enabled: () => Boolean) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled()) plan
    else plan.transform {
      case agg @ Aggregate(_, _, _, _) =>
        agg.transformExpressions {
          case ae @ AggregateExpression(
                Count(children), Complete, /* isDistinct = */ true, filter, _)
              if children.nonEmpty && children.forall(_.isInstanceOf[AttributeReference]) =>
            // multi-arg count(distinct a, b) approximated on a single
            // child only when unary — leave n-ary exact. The FILTER
            // clause (count(DISTINCT x) FILTER (WHERE p)) must ride
            // along or the rewrite silently drops the predicate.
            if (children.size == 1)
              ae.copy(
                aggregateFunction = HyperLogLogPlusPlus(children.head),
                isDistinct = false,
                filter = filter)
            else ae
        }
    }
}

object ApproxDistinctRewrite {
  val ConfKey = "spark.graft.approxDistinct"

  /** Build with the session-conf toggle. */
  def forSession(session: org.apache.spark.sql.SparkSession): ApproxDistinctRewrite =
    ApproxDistinctRewrite(() =>
      session.conf.getOption(ConfKey).exists(_.equalsIgnoreCase("true")))
}
