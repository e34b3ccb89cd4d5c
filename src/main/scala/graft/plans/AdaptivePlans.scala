package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}

/** SOUND physical-plan inspection under AQE.
  *
  * The naive idiom `df.queryExecution.executedPlan.collect { case s:
  * ShuffleExchangeExec => s }` is VACUOUS when adaptive execution is on
  * (the default): the executed plan is an [[AdaptiveSparkPlanExec]],
  * which implements `LeafExecNode` — `TreeNode.collect` never descends
  * into it, so the match returns empty for ANY query and a `=== 0`
  * assertion can never fail. The same trap repeats one level down:
  * materialized stages appear as [[QueryStageExec]] nodes, which are
  * ALSO leaves wrapping the real subtree in a `plan` field.
  *
  * [[collectDeep]] descends through all three opaque boundaries
  * (adaptive root → final plan, query stage → wrapped plan, reused
  * exchange → original) plus subquery plans, so a zero-count assertion
  * routed through here means what it says. Every such assertion should
  * still pair with a NEGATIVE CONTROL (a plan known to shuffle must
  * count ≥ 1) proving the checker can see an exchange at all — see
  * StoragePartitionedJoinSpec.
  */
object AdaptivePlans {

  /** The truest available adaptive plan WITHOUT side effects: the
    * final plan when the query has run, the initial (EnsureRequirements-
    * applied) plan when it has not — calling `finalPhysicalPlan` on an
    * unrun query EXECUTES it, the same trap [[collectDeep]] documents.
    * Specs that need the true runtime plan must run an action first.
    * Non-adaptive plans pass through. */
  def finalPlan(df: DataFrame): SparkPlan = df.queryExecution.executedPlan match {
    case a: AdaptiveSparkPlanExec =>
      if (a.isFinalPlan) a.finalPhysicalPlan else a.initialPlan
    case p => p
  }

  /** `TreeNode.collect` that additionally descends into adaptive
    * roots, query stages, reused exchanges, executed-command results,
    * and subqueries — the boundaries plain `collect` treats as leaves.
    * [[org.apache.spark.sql.execution.CommandResultExec]] matters for
    * DML: `spark.sql("MERGE INTO …")` executes eagerly and hands back
    * a leaf holding the command's REAL physical plan — the post-AQE
    * plan that actually ran, which is what a zero-exchange assertion
    * on a MERGE/UPDATE/DELETE should inspect (not EXPLAIN text). */
  def collectDeep[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val kids: Seq[SparkPlan] = p match {
      // An adaptive root that already ran exposes its true final plan
      // for free. One that has NOT run yet is inspected through its
      // INITIAL plan (EnsureRequirements already applied, so every
      // planned exchange is visible) — `finalPhysicalPlan` on an unrun
      // query MATERIALIZES every stage, i.e. a plan assertion inside a
      // query body silently EXECUTED the whole subtree once before the
      // real action ran it again (measured: +40% wall on q157).
      // In-query zero-exchange assertions stay sound on the initial
      // plan: AQE re-plans only at exchange boundaries, so a plan with
      // no exchange on the guarded key cannot grow one at runtime.
      case a: AdaptiveSparkPlanExec =>
        Seq(if (a.isFinalPlan) a.finalPhysicalPlan else a.initialPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case c: org.apache.spark.sql.execution.CommandResultExec =>
        Seq(c.commandPhysicalPlan)
      case other => other.children
    }
    pf.lift(p).toSeq ++ (kids ++ p.subqueries).flatMap(collectDeep(_)(pf))
  }

  /** Strip stage/reuse/adaptive AND codegen wrappers off a node — for
    * "is this join input REALLY a Sort?" questions where the
    * interesting node hides behind `InputAdapter(WholeStageCodegen(…))`
    * (codegen regions split exactly at exchange/sort boundaries). */
  @scala.annotation.tailrec
  def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => unwrap(a.finalPhysicalPlan)
    case q: QueryStageExec => unwrap(q.plan)
    case r: ReusedExchangeExec => unwrap(r.child)
    case w: org.apache.spark.sql.execution.WholeStageCodegenExec => unwrap(w.child)
    case i: org.apache.spark.sql.execution.InputAdapter => unwrap(i.child)
    case other => other
  }

  /** Plan-level variant of [[shufflesOn]] — for executed DML commands
    * reached through [[collectDeep]] rather than a DataFrame. */
  def shufflesOn(p: SparkPlan, keySubstring: String): Seq[ShuffleExchangeLike] =
    collectDeep(p) { case s: ShuffleExchangeLike => s }
      .filter(_.outputPartitioning.toString.contains(keySubstring))

  /** Plan-level variant of [[localSortsOn]]. */
  def localSortsOn(p: SparkPlan, keySubstring: String)
      : Seq[org.apache.spark.sql.execution.SortExec] =
    collectDeep(p) {
      case s: org.apache.spark.sql.execution.SortExec
          if !s.global &&
            s.sortOrder.exists(_.references.exists(_.name.contains(keySubstring)))
        => s
    }

  /** How many sort-merge-join INPUTS are Sorts — 0 means every SMJ in
    * the plan consumed a scan-reported ordering; a freshly-planned
    * unsorted SMJ contributes 2. */
  def smjInputSorts(p: SparkPlan): Int =
    collectDeep(p) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        Seq(j.left, j.right).count(c =>
          unwrap(c).isInstanceOf[org.apache.spark.sql.execution.SortExec])
    }.sum

  /** STRICT sibling of [[finalPlan]]: the plan AQE actually executed,
    * REQUIRING that an action already ran — throws on an unrun
    * adaptive query instead of silently handing back the weaker
    * initial plan. Absence-of-exchange guards are sound on the initial
    * plan (AQE only re-plans at exchange boundaries, so it cannot GROW
    * one); presence/count-style assertions — exchange reuse, broadcast
    * demotion, AQE coalesce — are NOT: they must opt into this variant
    * so a forgotten action fails loudly rather than checking a plan
    * AQE may still rewrite. */
  def finalizedPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec =>
        require(a.isFinalPlan,
          "finalizedPlan: adaptive query has not run — execute an action " +
            "first (count/collect), or use finalPlan for absence-only guards")
        a.finalPhysicalPlan
      case p => p
    }

  /** [[collectDeep]] over [[finalizedPlan]] — for count/shape
    * assertions that need the true post-AQE runtime plan. */
  def collectDeepFinalized[T](df: DataFrame)(
      pf: PartialFunction[SparkPlan, T]): Seq[T] =
    collectDeep(finalizedPlan(df))(pf)

  /** [[collectDeep]] over a DataFrame's final plan. */
  def collectDeep[T](df: DataFrame)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    collectDeep(finalPlan(df))(pf)

  /** Every shuffle exchange anywhere in the final plan. */
  def shuffleExchanges(df: DataFrame): Seq[ShuffleExchangeLike] =
    collectDeep(finalPlan(df)) { case s: ShuffleExchangeLike => s }

  def shuffleCount(df: DataFrame): Int = shuffleExchanges(df).size

  /** Shuffle exchanges whose partitioning mentions `keySubstring` —
    * the "did a scan side get re-partitioned on the join key?" probe. */
  def shufflesOn(df: DataFrame, keySubstring: String): Seq[ShuffleExchangeLike] =
    shuffleExchanges(df).filter(_.outputPartitioning.toString.contains(keySubstring))

  def broadcastCount(df: DataFrame): Int =
    collectDeep(finalPlan(df)) { case b: BroadcastExchangeLike => b }.size

  /** LOCAL (per-partition) sorts whose order mentions `keySubstring` —
    * the "did the sort-merge join have to sort a scan side?" probe. A
    * presentation ORDER BY is a GLOBAL sort and deliberately excluded:
    * what a write-ordered scan eliminates is the join/window's local
    * sort, not the query's final ordering. */
  def localSortsOn(df: DataFrame, keySubstring: String)
      : Seq[org.apache.spark.sql.execution.SortExec] =
    collectDeep(finalPlan(df)) {
      case s: org.apache.spark.sql.execution.SortExec
          if !s.global &&
            s.sortOrder.exists(_.references.exists(_.name.contains(keySubstring)))
        => s
    }
}
