package graft

import graft.functions.TopKAgg
import org.apache.spark.sql.functions._

/** Space-Saving heavy hitters: exact when capacity covers the key space,
  * and honoring the published error/coverage guarantees when it doesn't —
  * across real partitioned execution (partial sketches merged per
  * partition), not just single-threaded folds. */
class TopKAggSpec extends SparkSpec {

  // Zipf-ish multiset: token i appears (50 - i)^2 times, i in [0, 30)
  private def corpus: Seq[String] =
    (0 until 30).flatMap(i => Seq.fill((50 - i) * (50 - i))(f"tok$i%02d"))

  private def trueCounts: Map[String, Long] =
    corpus.groupBy(identity).map { case (t, g) => t -> g.size.toLong }

  private def sketch(capacity: Int, partitions: Int): Seq[(String, Long, Long)] = {
    import spark.implicits._
    val hh = udaf(new TopKAgg(capacity))
    corpus.toDF("token").repartition(partitions)
      .agg(hh(col("token")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token"), col("e.count"), col("e.err"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
  }

  test("capacity >= distinct keys: exact counts, zero error, any partitioning") {
    for (parts <- Seq(1, 7)) {
      val out = sketch(capacity = 64, partitions = parts)
      assert(out.map(t => t._1 -> t._2).toMap === trueCounts,
        s"parts=$parts: exact-mode counts must equal the true multiset")
      assert(out.forall(_._3 === 0L), s"parts=$parts: exact mode has err=0")
    }
  }

  test("capacity < distinct keys: bounds hold and heavy hitters are covered") {
    val n = corpus.size.toLong
    val cap = 12
    val out = sketch(capacity = cap, partitions = 7)
    assert(out.size <= cap)
    out.foreach { case (t, c, e) =>
      val truth = trueCounts.getOrElse(t, 0L)
      assert(truth <= c, s"$t: count $c must upper-bound true $truth")
      assert(c - e <= truth, s"$t: count-err ${c - e} must lower-bound true $truth")
    }
    // coverage: every key with true frequency > n/cap must be reported
    val mustHave = trueCounts.filter(_._2 > n / cap).keySet
    val reported = out.map(_._1).toSet
    assert(mustHave.subsetOf(reported),
      s"missing guaranteed heavy hitters: ${mustHave -- reported}")
  }

  test("the plan partial-aggregates: one sketch per partition crosses the exchange") {
    import spark.implicits._
    val hh = udaf(new TopKAgg(8))
    val plan = corpus.toDF("token").repartition(7)
      .agg(hh(col("token")).as("hh"))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate partial+final — the map-side sketch is what
    // bounds the shuffle at O(partitions·k)
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
  }
}
