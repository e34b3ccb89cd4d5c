package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the transitive-closure step that turns near-dup PAIRS into dedup
  * CLUSTERS. `Graft.removeNearDups` documents the gap this closes: a
  * component like {1,2,3} with edges (1,3),(2,3) keeps BOTH 1 and 2
  * under pairwise drop-the-higher-id (2 never collides with a lower id),
  * while the transitive variant keeps exactly one canonical survivor per
  * component.
  *
  * Algorithm: every vertex starts labeled with its own id; each round
  * takes the min of its label and its neighbors' labels; fixpoint = each
  * vertex holds its component's minimum id. The fixpoint is unique, so
  * the result is deterministic regardless of partitioning or join order.
  * Rounds needed = the largest component's diameter PLUS a confirming
  * zero-change round (so set `maxIters` ≥ diameter + 1) — for near-dup
  * clusters (threshold ≥ 0.5 makes them near-cliques) that is 2–4; the
  * `maxIters` guard fails LOUDLY rather than returning a half-converged
  * labeling. For adversarial long-chain graphs at extreme scale, the
  * literature's large-star/small-star alternation (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC '14) converges
  * in O(log n) rounds with the same per-round join shape — the upgrade
  * path if diameters ever grow past tens.
  *
  * Each round is one equi-join + one partial-aggregated groupBy (shuffle
  * keyed by vertex id). Every frontier is a [[graft.core.CacheScope]]
  * cache (the per-round `changed` count materializes it), so execution
  * reads each round from memory while the action-runner's scope releases
  * everything afterwards — and a released frame is still recomputable
  * from lineage, the repo's no-leak contract.
  *
  * Deep iteration grows the lineage chain one join+agg per round; on a
  * cluster, executor loss late in a long run would then recompute the
  * whole chain (and the planner itself slows on a many-round plan). Set
  * `spark.graft.cc.checkpointInterval` to N > 0 to truncate lineage
  * with a reliable `checkpoint` every N rounds (requires
  * `SparkContext.setCheckpointDir` pointing at job-surviving storage).
  * Off by default — near-dup components converge in 2–4 rounds, where a
  * checkpoint's extra materialization costs more than it insures.
  */
object ConnectedComponents {

  /** Component labels for every vertex of the (undirected) edge list:
    * returns (`id`, `component`) where `component` = min vertex id
    * reachable from `id`. Vertices with no edges don't appear — callers
    * union isolated vertices back in as their own singletons if needed. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 30): DataFrame = {
    import graft.core.CacheScope
    // 0 = off; N > 0 = reliable-checkpoint the frontier every N rounds
    // (see the object doc — driver fault tolerance for deep iteration)
    val ckptEvery = edges.sparkSession.conf
      .get("spark.graft.cc.checkpointInterval", "0").toInt
    // symmetric neighbor list, computed once and reused every round. A
    // single-scan explode, not union(select, select): a union of two
    // projections over the same plan EXECUTES the upstream (here:
    // possibly a whole LSH pair pipeline) once per branch. No distinct():
    // duplicate edges cannot change a min aggregate, so the dedup
    // shuffle would buy nothing.
    val sym = CacheScope.cached(
      edges.select(explode(array(
        call_function("named_struct",
          lit("a"), col(srcCol), lit("b"), col(dstCol)),
        call_function("named_struct",
          lit("a"), col(dstCol), lit("b"), col(srcCol)))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b")))
    var labels = CacheScope.cached(
      sym.select(col("a").as("id")).distinct()
        .withColumn("component", col("id")))
    // the frame whose PLAN holds the cache — unpersist must target it,
    // not a projection layered on top (that would be a silent no-op)
    var cachedLabels = labels
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      // min over neighbors' labels; every vertex has >= 1 neighbor in the
      // symmetric list, so the join is inner
      val nbrMin = sym
        .join(labels.select(col("id").as("b"), col("component").as("nbr_label")), "b")
        .groupBy(col("a"))
        .agg(min(col("nbr_label")).as("nbr_min"))
        .withColumnRenamed("a", "id")
      // the per-row improvement flag rides the frame so ONE action both
      // materializes the round's cache and counts the changes — a
      // separate next-vs-labels comparison join would double the jobs
      val next = CacheScope.cached(labels
        .join(nbrMin, "id")
        .select(col("id"),
          least(col("component"), col("nbr_min")).as("component"),
          (col("nbr_min") < col("component")).as("_changed")))
      val changed = next.filter(col("_changed")).count()
      // the previous round's labels are fully superseded once `next` is
      // materialized: release its blocks NOW instead of letting up to
      // maxIters copies of the label set pin executor storage until the
      // enclosing scope exits (lineage keeps it recomputable, so an
      // early release is correctness-neutral — the CacheScope contract)
      cachedLabels.unpersist(blocking = false)
      converged = changed == 0
      it += 1
      if (ckptEvery > 0 && it % ckptEvery == 0 && !converged) {
        // truncate lineage: `next` is cached, so the checkpoint job
        // re-reads memory, not the round chain; after it the cache is
        // superseded by the checkpoint files and released immediately
        val cp = next.drop("_changed").checkpoint()
        next.unpersist(blocking = false)
        labels = cp
        cachedLabels = cp // unpersist on a checkpointed frame is a no-op
      } else {
        labels = next.drop("_changed")
        cachedLabels = next
      }
    }
    require(converged,
      s"connected components did not converge within $maxIters rounds — " +
        "the largest component's diameter exceeds maxIters - 1 (the last " +
        "round must observe zero changes); raise maxIters or switch to " +
        "large-star/small-star")
    labels
  }
}
