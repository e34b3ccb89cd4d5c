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
  * labeling. For adversarial long-chain graphs at extreme scale, use
  * [[runAlternating]] — the literature's large-star/small-star
  * alternation (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC '14) — which converges in O(log n) rounds with the
  * same per-round join shape.
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
    // flatten(f): rewrap a CACHED frame as a LogicalRDD. Round k's
    // labels otherwise reference round k-1's plan TWICE (the join side
    // and the neighbor side), so the Catalyst tree DOUBLES per round —
    // and every later action re-analyzes the exponential tree. Measured
    // on q159's rep graph: ~4 s of pure driver-side planning per
    // downstream action, cache hits notwithstanding. The RDD handle
    // keeps executor-side lineage (block loss recomputes through the
    // round chain), so this cuts only the LOGICAL plan, unlike
    // localCheckpoint which also forfeits fault tolerance.
    def flatten(df: DataFrame): DataFrame =
      df.sparkSession.createDataFrame(df.rdd, df.schema)
    val sym = CacheScope.cached(flatten(
      edges.select(explode(array(
        call_function("named_struct",
          lit("a"), col(srcCol), lit("b"), col(dstCol)),
        call_function("named_struct",
          lit("a"), col(dstCol), lit("b"), col(srcCol)))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))))
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
        // plan-flattened (see above): the cached `next` serves the RDD,
        // the next round and every downstream consumer see a LogicalRDD
        labels = flatten(next.drop("_changed"))
        cachedLabels = next
      }
    }
    require(converged,
      s"connected components did not converge within $maxIters rounds — " +
        "the largest component's diameter exceeds maxIters - 1 (the last " +
        "round must observe zero changes); raise maxIters or switch to " +
        "runAlternating (large-star/small-star)")
    labels
  }

  /** Large-star operation on a canonical (a > b) edge set: around every
    * vertex u, connect each STRICTLY LARGER neighbor to the minimum of
    * u's closed neighborhood. Stars are fixpoints; long paths halve. */
  private def largeStar(e: DataFrame): DataFrame = {
    // single-scan symmetrize (explode, not union-of-selects — a union
    // executes the upstream once per branch)
    val sym = e.select(explode(array(
      call_function("named_struct", lit("u"), col("a"), lit("v"), col("b")),
      call_function("named_struct", lit("u"), col("b"), lit("v"), col("a")))).as("x"))
      .select(col("x.u").as("u"), col("x.v").as("v"))
    val mins = sym.groupBy(col("u"))
      .agg(least(min(col("v")), col("u")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      // v > u ≥ m, so (v, m) is already in canonical big-small order
      .select(col("v").as("a"), col("m").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Small-star operation on a canonical (a > b) edge set: around every
    * vertex a, connect each (smaller) neighbor AND a itself to the
    * minimum neighbor. Stars are fixpoints; shallow trees flatten. */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy(col("a")).agg(min(col("b")).as("m"))
    e.join(mins, "a")
      .select(explode(array(
        call_function("named_struct", lit("x"), col("b"), lit("y"), col("m")),
        call_function("named_struct", lit("x"), col("a"), lit("y"), col("m")))).as("p"))
      // b ≥ m and a > b ≥ m: canonical order preserved; the b = m case
      // (the min neighbor pointing at itself) drops as a self-loop
      .select(col("p.x").as("a"), col("p.y").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Connected components by alternating large-star/small-star (Kiveris
    * et al., SoCC '14): same (`id`, `component` = min reachable id)
    * output as [[run]], but convergence takes O(log n) rounds regardless
    * of component DIAMETER — min-label propagation needs diameter-many
    * rounds, which for a million-vertex chain is a million rounds; this
    * needs ~20. Use it when the pair graph's shape is unknown or
    * adversarial (generic graph inputs, chain-like duplicate families);
    * [[run]] stays the cheaper choice for near-dup clusters, whose
    * near-clique components converge in 2–4 rounds.
    *
    * State per round is a canonical big→small edge set; each half-round
    * is one groupBy + one equi-join keyed by vertex id (the exact
    * shuffle shape of [[run]]), and the fixpoint — a star forest rooted
    * at each component's minimum — is unique, so the result is
    * deterministic. Every round's frontier is lineage-truncated: the
    * edge set is rewritten (not just relabeled) each round, so the plan
    * would otherwise QUADRUPLE per round; `localCheckpoint` by default,
    * or a reliable `checkpoint` every `spark.graft.cc.checkpointInterval`
    * rounds when that is set (cluster fault tolerance — localCheckpoint
    * blocks die with their executor). Like [[run]], NOT lazy: the loop
    * runs jobs at call time. Vertices with no edges don't appear. */
  def runAlternating(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 30): DataFrame = {
    val ckptEvery = edges.sparkSession.conf
      .get("spark.graft.cc.checkpointInterval", "0").toInt
    def truncate(df: DataFrame, round: Int): DataFrame =
      if (ckptEvery > 0 && round % ckptEvery == 0) df.checkpoint()
      else df.localCheckpoint()

    var cur = truncate(
      edges.select(
        greatest(col(srcCol), col(dstCol)).as("a"),
        least(col(srcCol), col(dstCol)).as("b"))
        .filter(col("a") =!= col("b") && col("b").isNotNull)
        .distinct(), 0)
    var curCount = cur.count()
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val next = truncate(smallStar(largeStar(cur)), it + 1)
      val nextCount = next.count()
      // deterministic set functions: output == input means every later
      // round repeats it — the fixpoint. Both sides are distinct, so
      // equal counts + empty one-way difference prove set equality.
      converged = nextCount == curCount && next.except(cur).isEmpty
      val prev = cur
      cur = next; curCount = nextCount
      if (!converged) prev.unpersist(blocking = false)
      it += 1
    }
    require(converged,
      s"alternating connected components did not converge within $maxIters " +
        "rounds — expected O(log n); raise maxIters")
    // the fixpoint theorem says `cur` is a star forest rooted at minima;
    // assert the invariants loudly rather than trusting them (cheap:
    // edge-count-sized jobs, run once)
    require(cur.groupBy(col("a")).count().filter(col("count") > 1).isEmpty,
      "internal error: converged state has a vertex with two parents")
    require(cur.select(col("a")).join(cur.select(col("b").as("a")),
      Seq("a"), "left_semi").isEmpty,
      "internal error: converged state has a two-level chain")
    cur.select(col("a").as("id"), col("b").as("component"))
      .unionByName(
        cur.select(col("b").as("id")).distinct()
          .withColumn("component", col("id")))
  }
}
