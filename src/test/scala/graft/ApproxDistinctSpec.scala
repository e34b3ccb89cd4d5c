package graft

import graft.core.Lake
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ApproxDistinctRewrite

/** The config-gated count(DISTINCT) → HLL rewrite: off by default (exact
  * plans for the oracle gate), on-demand sketching for scale.
  *
  * The shared spec session is NOT built with GraftExtensions, so this
  * suite applies the rule through a dedicated session cloned with the
  * extension loaded.
  */
class ApproxDistinctSpec extends SparkSpec {

  private lazy val extSession = {
    val s = spark.newSession()
    // newSession() shares extensions from the original builder, which did
    // not load GraftExtensions — inject the rule directly instead
    s.experimental.extraOptimizations ++= Seq(ApproxDistinctRewrite.forSession(s))
    s
  }

  test("disabled: plans keep exact count(DISTINCT) (expand/two-phase)") {
    extSession.conf.set(ApproxDistinctRewrite.ConfKey, "false")
    val df = Lake(extSession, sfDir).lineitem
      .groupBy(col("l_returnflag")).agg(countDistinct(col("l_suppkey")).as("n"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("count(distinct"), s"expected exact distinct in:\n$plan")
    assert(!plan.contains("approx_count_distinct"))
  }

  test("count(DISTINCT x) FILTER (WHERE p) keeps its predicate through the rewrite") {
    // The production injection point (GraftExtensions.injectOptimizerRule)
    // runs during operator optimization, BEFORE RewriteDistinctAggregates
    // expands filtered distinct aggregates — so the rule CAN see
    // count(DISTINCT x) FILTER (WHERE p) with its filter intact. Apply the
    // rule by hand to the analyzed plan to pin that the filter rides along.
    Lake(extSession, sfDir).lineitem.createOrReplaceTempView("li_adf")
    // predicate keyed to the distinct column itself, so the filtered
    // cardinality is guaranteed to differ from the unfiltered one —
    // a dropped FILTER clause cannot pass by coincidence
    val q =
      """SELECT count(DISTINCT l_suppkey) FILTER (WHERE l_suppkey <= 3) AS n
        |FROM li_adf""".stripMargin
    val analyzed = extSession.sql(q).queryExecution.analyzed
    val rewritten = ApproxDistinctRewrite(() => true)(analyzed)
    val planStr = rewritten.toString
    assert(planStr.contains("approx_count_distinct"), s"rewrite missing in:\n$planStr")
    assert(planStr.toLowerCase.contains("filter"), s"FILTER clause lost in:\n$planStr")
    val approx = org.apache.spark.sql.graft.TestPlanExec
      .run(extSession, rewritten).collect()(0).getLong(0)
    val exact = extSession.sql(q).collect()(0).getLong(0)
    val unfiltered = extSession.sql(
      "SELECT count(DISTINCT l_suppkey) AS n FROM li_adf").collect()(0).getLong(0)
    assert(exact < unfiltered,
      s"test premise: filter must actually reduce the count ($exact vs $unfiltered)")
    // HLL is exact at single-digit cardinality: the sketch must count
    // the FILTERED set, not the full one
    assert(approx == exact, s"approx=$approx exact-filtered=$exact")
  }

  test("enabled: count(DISTINCT) rewrites to the HLL sketch, within 5% of exact") {
    extSession.conf.set(ApproxDistinctRewrite.ConfKey, "true")
    try {
      val df = Lake(extSession, sfDir).lineitem
        .groupBy(col("l_returnflag")).agg(countDistinct(col("l_suppkey")).as("n"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"), s"rewrite missing in:\n$plan")
      val approx = df.orderBy("l_returnflag").collect().map(_.getLong(1))
      extSession.conf.set(ApproxDistinctRewrite.ConfKey, "false")
      val exact = Lake(extSession, sfDir).lineitem
        .groupBy(col("l_returnflag")).agg(countDistinct(col("l_suppkey")).as("n"))
        .orderBy("l_returnflag").collect().map(_.getLong(1))
      approx.zip(exact).foreach { case (a, e) =>
        assert(math.abs(a - e).toDouble / e < 0.05, s"approx=$a exact=$e")
      }
    } finally extSession.conf.set(ApproxDistinctRewrite.ConfKey, "false")
  }
}
