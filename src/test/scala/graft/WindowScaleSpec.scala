package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The scale-partitioned window variant (q161) against the reference's
  * unpartitioned semantics: where partitioning does not change meaning
  * — ranking within a key — the partitioned rank must equal the global
  * revenue order RESTRICTED to that key, rank for rank. Plus the plan
  * evidence: the partitioned window hash-exchanges on the key, while
  * the reference's `Window.orderBy` shape really does plant the
  * SinglePartition exchange the q161 guard forbids (negative control —
  * proof the guard can see one at all).
  */
class WindowScaleSpec extends SparkSpec {

  test("partitioned rank == global order restricted per key, rank for rank") {
    val q = graft.queries.RelationalMore.q161WindowPartitioned(spark, sfDir)
      .collect()
    assert(q.nonEmpty)
    // global order: revenue DESC, partkey — the reference's W1 ordering
    val global = q.sortBy(r => (-r.getDouble(2), r.getLong(1)))
    // restricted to one brand, the global sequence must BE the
    // brand_rank sequence (1, 2, 3, … in that order)
    global.groupBy(_.getString(0)).foreach { case (brand, rows) =>
      val ranks = rows.map(_.getInt(3)).toSeq
      assert(ranks == (1 to rows.length), s"brand $brand: $ranks")
    }
    // lag ties out: within a brand, gap = previous revenue - revenue
    q.groupBy(_.getString(0)).foreach { case (brand, rows) =>
      val byRank = rows.sortBy(_.getInt(3))
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getDouble(4) == a.getDouble(2) - b.getDouble(2),
            s"brand $brand rank ${b.getInt(3)}: gap mismatch")
        case _ =>
      }
      assert(byRank.head.isNullAt(4), s"brand $brand rank 1 has no prior")
    }
  }

  test("the q161 plan guard does not EXECUTE the query at build time") {
    // finalPhysicalPlan on an unrun adaptive plan materializes every
    // stage; the guard must inspect without running (the round-14
    // AdaptivePlans contract) — after building the DataFrame (guard
    // included), the adaptive root must still be un-finalized
    val q = graft.queries.RelationalMore.q161WindowPartitioned(spark, sfDir)
    q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        assert(!a.isFinalPlan,
          "building q161 must not execute it — the plan guard ran the query")
      case _ => // non-adaptive plan: nothing to materialize, also fine
    }
  }

  test("negative control: the unpartitioned reference window DOES single-funnel") {
    val l = graft.core.Lake(spark, sfDir)
    val rev = l.lineitem.groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity")).as("qty"))
      .withColumn("r", row_number().over(
        Window.orderBy(col("qty").desc, col("l_partkey"))))
    val single = graft.plans.AdaptivePlans.collectDeep(rev) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
        if e.outputPartitioning ==
          org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
    }
    assert(single.nonEmpty,
      "the guard must be able to SEE a SinglePartition exchange")
  }
}
