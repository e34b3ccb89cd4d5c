package graft

import graft.queries.{Relational, TextOps}

/** Physical-plan shape assertions: the plans we designed for 100 TB are
  * the plans Catalyst actually produces at any scale.
  */
class PlanChecksSpec extends SparkSpec {

  /** Final physical plan — collect() first so AQE materializes the final
    * plan (codegen spans and reused exchanges only appear then). */
  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q09: filter predicates reach the parquet scan as PushedFilters") {
    val p = plan(Relational.q09FilterIn(spark, sfDir))
    assert(p.contains("PushedFilters"))
    // plan strings truncate long filter lists — match the stable prefix
    assert(p.contains("GreaterThan(c_acctbal"),
      s"acctbal pushdown missing in:\n$p")
  }

  test("q03: per-part aggregate joins broadcast, not shuffle-merge") {
    val p = plan(Relational.q03PartPerformance(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$p")
  }

  test("q19: dimension joins are broadcast") {
    val p = plan(Relational.q19MultiJoin(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q08: ORDER BY + LIMIT plans TakeOrderedAndProject, no global sort") {
    val p = plan(Relational.q08TopK(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator in:\n$p")
  }

  test("q01: aggregation is two-phase (partial before the exchange)") {
    val p = plan(Relational.q01AggBasic(spark, sfDir))
    assert(p.contains("partial_"), s"expected partial aggregation in:\n$p")
  }

  test("q10: narrow projection stays in one whole-stage codegen span, no exchange") {
    val p = plan(Relational.q10ScalarString(spark, sfDir))
    assert(!p.contains("Exchange hashpartitioning"),
      s"narrow projection should not shuffle:\n$p")
    // codegen spans render as "*(n)" in compact plan strings
    assert(p.contains("*("), s"expected a whole-stage codegen span in:\n$p")
  }

  test("q40: rank-limit window plans partial+final WindowGroupLimit (per-partition heap prune)") {
    val p = plan(graft.queries.VectorOps.q40KnnBruteForce(spark, sfDir))
    assert(p.contains("WindowGroupLimit"), s"expected group-limit pruning in:\n$p")
    assert(p.contains("Partial") && p.contains("Final"),
      s"expected two-phase group limit in:\n$p")
  }

  test("q135: per-source cap plans WindowGroupLimit; totals broadcast onto survivors") {
    val p = plan(graft.queries.TextOps.q135SourceCap(spark, sfDir))
    // the k-per-source filter must prune BEFORE the exchange — a
    // mega-source's rows must not all cross the shuffle
    assert(p.contains("WindowGroupLimit"), s"expected group-limit prune in:\n$p")
    assert(p.contains("Partial") && p.contains("Final"),
      s"expected two-phase group limit in:\n$p")
    // the (source, count) totals side is source-cardinality-sized —
    // it must broadcast, never sort-merge
    assert(p.contains("BroadcastHashJoin"),
      s"expected the totals join to broadcast in:\n$p")
  }

  test("q61: correlated scalar subquery is decorrelated into an aggregate join") {
    val p = plan(graft.queries.RelationalMore.q61CorrelatedSubquery(spark, sfDir))
    // no surviving per-row subquery: Catalyst rewrites to agg + outer join
    assert(!p.contains("ScalarSubquery"), s"subquery survived decorrelation:\n$p")
    assert(p.contains("HashAggregate") &&
      (p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")),
      s"expected aggregate + join decorrelation in:\n$p")
  }

  test("q38/q38b: SimHash pair stage is a banded equi-join, never nested-loop") {
    for (df <- Seq(TextOps.q38SimHash(spark, sfDir),
                   TextOps.q38bSimHashScale(spark, sfDir))) {
      val p = plan(df)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"nested-loop pair generation survived banding:\n$p")
    }
  }

  test("q85: quantization is a narrow scan-parallel transform — no hash exchange") {
    val p = plan(graft.queries.VectorOps.q85QuantizeInt8(spark, sfDir))
    assert(!p.contains("Exchange hashpartitioning"),
      s"per-row quantization must not shuffle (only the output sort ranges):\n$p")
  }

  test("q83: batch-vs-index candidate stage is a banded equi-join, never nested-loop") {
    val p = plan(TextOps.q83IndexNearDup(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"batch × index degenerated to a nested loop:\n$p")
  }

  test("q37: candidate self-join carries no shingle arrays (keys+sizes only)") {
    val p = plan(TextOps.q37NgramJaccard(spark, sfDir))
    // the first (candidate) joins shuffle only ints; the hs arrays appear
    // exclusively in the post-prune fetch joins keyed by doc_id
    val candidateJoins = p.linesIterator.filter(l =>
      l.contains("Join") && (l.contains("k1") || l.contains("k2"))).toSeq
    assert(candidateJoins.nonEmpty, s"bucket join missing in:\n$p")
    assert(!candidateJoins.exists(_.contains("sh1")),
      s"shingle arrays rode the candidate join:\n$p")
  }

  test("q69: mergeable sketch aggregates partial then final (ObjectHashAggregate)") {
    val p = plan(TextOps.q69GroupedMinhashIndex(spark, sfDir))
    // the whole point of the mergeable MinHash Aggregator at scale: a
    // map-side partial per partition, ONE exchange keyed by group, a
    // final merge — never raw signatures shuffled per document
    val aggLines = p.linesIterator.filter(_.contains("ObjectHashAggregate")).toSeq
    assert(aggLines.exists(_.contains("partial_")),
      s"expected a partial (map-side) sketch aggregate in:\n$p")
    assert(aggLines.size >= 2, s"expected partial+final aggregate pair in:\n$p")
  }

  test("q70/q71: per-stratum top-k plans partial+final WindowGroupLimit") {
    for (df <- Seq(graft.queries.TrainingOps.q70StratifiedSample(spark, sfDir),
                   graft.queries.TrainingOps.q71VocabTopK(spark, sfDir))) {
      val p = plan(df)
      // each partition pre-prunes to its local k before the stratum
      // shuffle — quota selection never globally sorts a stratum
      assert(p.contains("WindowGroupLimit"), s"expected group-limit prune in:\n$p")
      assert(p.contains("Partial") && p.contains("Final"),
        s"expected two-phase group limit in:\n$p")
    }
  }

  test("q71: token counting aggregates partially before the shuffle (vocab-sized exchange)") {
    val p = plan(graft.queries.TrainingOps.q71VocabTopK(spark, sfDir))
    assert(p.contains("partial_count"),
      s"explode fan-out must be absorbed map-side:\n$p")
  }

  test("q72: the benchmark probe side joins broadcast — the corpus is never shuffled in full") {
    val p = plan(graft.queries.TrainingOps.q72Contamination(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast probe join in:\n$p")
  }

  test("q73: SRP-LSH pair stage is a banded equi-join; embeddings stay out of it") {
    val p = plan(graft.queries.VectorOps.q73SrpLshPairs(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"nested-loop pair generation survived banding:\n$p")
    // the banded self-join shuffles (vec_id, sig, band, bval) only; the
    // 64-float arrays are fetched by id after the collision prune
    val bandJoins = p.linesIterator.filter(l =>
      l.contains("Join") && l.contains("bval")).toSeq
    assert(bandJoins.nonEmpty, s"banded join missing in:\n$p")
    assert(!bandJoins.exists(_.contains("embedding")),
      s"embedding arrays rode the candidate join:\n$p")
  }

  test("q75: sequence packing shuffles once (the stratum window), nothing else") {
    val p = plan(graft.queries.TrainingOps.q75SequencePacking(spark, sfDir))
    // one exchange for the per-stratum window partitioning + the final
    // presentation sort's rangepartitioning — a second hash exchange
    // would mean the running sum re-shuffled what the window already
    // partitioned
    // the executed-plan string repeats the tree under "== Initial Plan =="
    // when AQE is on — count only the final plan's exchanges
    val finalPlan = p.split("== Initial Plan ==").head
    val hashExchanges = finalPlan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning")).size
    assert(hashExchanges == 1,
      s"expected exactly one hash exchange (the stratum window), got $hashExchanges in:\n$p")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      s"expected a window operator in:\n$p")
  }

  test("q76: corpus mixing is shuffle-free (narrow explode + filter)") {
    // the mix must compose with downstream packing without adding its own
    // exchange — drop q76's presentation ORDER BY (display-only) and
    // assert the operator itself plans zero exchanges
    val mixed = graft.operators.Curation.mixCorpus(
      graft.core.Lake(spark, sfDir).documents, "doc_id", "source",
      Map("src0" -> 2.5, "src1" -> 0.25))
    val p = plan(mixed)
    assert(!p.contains("Exchange"),
      s"weighted mixing must stay narrow, found an exchange in:\n$p")
    assert(p.contains("Generate explode"), s"expected the epoch explode in:\n$p")
  }

  test("q78/q80: chained windows + aggregate reuse ONE entity-keyed exchange") {
    // q78's two running windows and its per-user aggregate all key on
    // user_id; q80's RANGE window keys on o_custkey — Catalyst must
    // reuse that partitioning rather than re-shuffling per operator.
    // (q78's tiny final stage-histogram exchange — 4 distinct keys,
    // map-side pre-aggregated — is excluded: the entity-keyed shuffle
    // is the one that carries data.)
    for ((df, key) <- Seq(
        graft.queries.PipelineOps.q78Funnel(spark, sfDir) -> "user_id",
        graft.queries.RelationalExt.q80TimeRangeWindow(spark, sfDir) -> "o_custkey")) {
      val finalPlan = plan(df).split("== Initial Plan ==").head
      val keyed = finalPlan.linesIterator
        .filter(l => l.contains("Exchange hashpartitioning") && l.contains(key)).size
      assert(keyed == 1,
        s"expected one $key-keyed exchange, got $keyed in:\n$finalPlan")
    }
  }

  test("q31: column pruning reaches the scan (only text/lang read)") {
    val p = plan(TextOps.q31TokenStats(spark, sfDir))
    assert(p.contains("ReadSchema"))
    assert(!p.contains("doc_id,"), s"doc_id should be pruned from scan:\n$p")
  }

  test("q93: the whole hard-filter suite is one shuffle-free scan-parallel projection") {
    val p = plan(graft.queries.TrainingOps.q93GopherFilters(spark, sfDir))
    // the output sort is the query's total ORDER BY; the FILTER COMPUTE
    // itself must not hash-exchange (the fold replaces the explode +
    // gaps-and-islands window form, which would shuffle the corpus twice)
    assert(!p.contains("Exchange hashpartitioning"),
      s"gopher filters must not shuffle:\n$p")
  }

  test("q94: boilerplate marking is a hash equi-join on the segment key — no nested loop") {
    val p = plan(graft.queries.TrainingOps.q94BoilerplateRemoval(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"segment membership must be an equi-join:\n$p")
  }

  test("q97: the heavy-hitter sketch partial-aggregates (O(partitions*k) exchange)") {
    val p = plan(graft.queries.TrainingOps.q97HeavyHitters(spark, sfDir))
    assert(p.contains("ObjectHashAggregate"),
      s"expected sketch partial+final aggregation in:\n$p")
  }

  test("q37b: prefix-filtered candidate stage is an equi-join, never a nested loop") {
    val p = plan(TextOps.q37bPrefixJaccard(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"prefix-filter candidates must equi-join on the shingle key:\n$p")
  }

  test("q95: the native nfc_normalize stays inside whole-stage codegen, no shuffle before the sort") {
    val p = plan(graft.queries.TrainingOps.q95NfcNormalize(spark, sfDir))
    assert(!p.contains("Exchange hashpartitioning"),
      s"normalization is a narrow projection:\n$p")
    assert(p.contains("*("), s"expected a codegen span:\n$p")
  }

  test("q101: split assignment is shuffle-free (pure hash arithmetic)") {
    val p = plan(graft.queries.TrainingOps.q101TrainValTest(spark, sfDir))
    assert(!p.contains("Exchange hashpartitioning"),
      s"split membership must not shuffle:\n$p")
  }

  test("q102: the curation report never joins — one scan, one source-keyed aggregate") {
    val p = plan(graft.queries.TrainingOps.q102CurationReport(spark, sfDir))
    assert(!p.contains("Join"),
      s"bow must be computed inline and carried, not joined back:\n$p")
    assert(p.contains("partial_"), s"expected partial aggregation in:\n$p")
  }

  test("q98: keep-best dedup is one uniform-key exchange with map-side partial max_by") {
    val p = plan(graft.queries.TrainingOps.q98DedupKeepBest(spark, sfDir))
    assert(p.contains("partial_"), s"expected partial aggregation in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"keep-best dedup must not join at all:\n$p")
  }

  test("q115: posting cap prunes per-term rows BEFORE collection (WindowGroupLimit)") {
    val p = plan(TextOps.q115InvertedIndex(spark, sfDir))
    assert(p.contains("WindowGroupLimit"),
      s"rank cap must plan as a group limit, not a full window:\n$p")
    assert(p.contains("partial_"),
      s"(term,doc) counts must partial-aggregate map-side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"branch join must stay a term equi-join:\n$p")
  }

  test("q121: first-occurrence paragraph dedup prunes via WindowGroupLimit, no pairwise stage") {
    val p = plan(TextOps.q121ParagraphDedup(spark, sfDir))
    assert(p.contains("WindowGroupLimit"),
      s"rn=1 must plan as a group limit (hot segments collapse pre-exchange):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"dedup must never go pairwise:\n$p")
  }

  test("q123: fuzzy candidates come from an equi-join, never a nested loop") {
    val p = plan(TextOps.q123FuzzyPairs(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"deletion-neighborhood join must stay an equi-join:\n$p")
  }

  test("q126: IVF-PQ — the float vectors never enter the candidate join") {
    val df = graft.queries.VectorOps.q126IvfPq(spark, sfDir)
    df.collect()
    // the candidate (n_id) side of the cell join must carry codes only:
    // walk the optimized plan to the join and check its right output —
    // this is THE property that shrinks the 10⁹-vector shuffle 32×
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty, "expected the cell-restricted candidate join")
    val cellJoin = joins.head // outermost join = q × candidates
    val floatSide = cellJoin.right.output.filter(a => a.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    })
    assert(floatSide.isEmpty,
      s"float vectors crossed the candidate join: ${cellJoin.right.output}")
  }

  test("q132: BM25 — corpus scalars broadcast, top-k via TakeOrderedAndProject, no global window") {
    val df = graft.queries.TextOps.q132Bm25(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the one-row stats side must ride a broadcast, never a shuffle join
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"stats row not broadcast:\n$plan")
    // the top-10 is per-partition heaps, not a single-partition sort of
    // every matching document
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject for the top-k:\n$plan")
  }

  test("q137: DSIR scoring joins NOTHING — the model is a broadcast-free literal") {
    val p = plan(graft.queries.TrainingOps.q137Dsir(spark, sfDir))
    // the 4096-weight model travels as a plan literal, so the scoring
    // pass is stateless: no join of any kind, and selection is
    // per-partition top-k heaps, not a single-partition global sort
    assert(!p.contains("Join"), s"model must be a literal, not a join side:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must plan as TakeOrderedAndProject:\n$p")
  }

  test("q138: classifier fit+score share one cached featurization, no join") {
    val p = plan(graft.queries.TrainingOps.q138QualityClassifier(spark, sfDir))
    assert(!p.contains("Join"), s"weights must be literal:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      s"the scoring pass must reuse the cached featurization:\n$p")
    assert(p.contains("partial_count"),
      s"the keep-rate aggregate must partial-aggregate map-side:\n$p")
  }

  test("q116: quantile profile reuses ONE lang-keyed exchange for windows + aggregate") {
    // AQE plan strings append an "Initial Plan" section — count the FINAL plan only
    val p = plan(graft.queries.RelationalMore.q116QuantileProfile(spark, sfDir))
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"windows and aggregate share the lang partitioning (got $exchanges):\n$p")
    assert(!p.contains("Join"), s"rank selection never joins:\n$p")
  }

  test("q117: grouping sets plan one Expand + two-phase aggregate") {
    val p = plan(graft.queries.RelationalMore.q117GroupingSets(spark, sfDir))
    assert(p.contains("Expand"), s"expected Expand for grouping sets:\n$p")
    assert(p.contains("partial_"), s"expected partial aggregation in:\n$p")
  }

  test("hilbert_index: a codegen'd scalar inside one whole-stage span, no shuffle") {
    import org.apache.spark.sql.functions._
    graft.engine.GraftFunctions.register(spark)
    val df = spark.range(0, 10000)
      .select(call_function("hilbert_index",
        lit(12), col("id") % 4096, (col("id") * 7) % 4096).as("h"))
      .filter(col("h") >= 0)
    val p = plan(df)
    assert(p.contains("*("), s"expected a whole-stage codegen span:\n$p")
    assert(!p.contains("Exchange"), s"a scalar projection must not shuffle:\n$p")
    // eval ≡ codegen: the same inputs through the interpreted path
    val viaPlan = df.collect().map(_.getLong(0))
    val viaEval = (0L until 10000L).map { i =>
      org.apache.spark.sql.graft.HilbertCurve.index(
        Array(i % 4096, (i * 7) % 4096), 12)
    }
    assert(viaPlan.toSeq === viaEval)
  }
}
