package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Queries run in sorted
  * name order after a warmup action, so first-query JVM/codegen warmup
  * is not attributed to an arbitrary query.
  *
  * SPARK_GRAFT_REPEATS=N (default 1) times each query N times and
  * reports the per-query MEDIAN — single runs at sf0.1 swing ±25% on
  * identical code (r3→r4 evidence), so round-over-round comparisons
  * should use N≥3 when they need to resolve deltas under ~2×. When
  * N>1 an extra UNTIMED warm-up execution runs first and is excluded
  * from the median: a round-8 targeted re-measure showed full-suite
  * medians inflating 2-5× on untouched code purely from per-query
  * cold paths (q63 7.8→2.8 s, q64 3.6→1.2 s at 5 warm repeats), so a
  * medians artifact without warm-up accuses code that didn't change.
  * N=1 (the driver's per-round bench) stays warm-up-free for
  * comparability with earlier rounds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SparkSessionFactory.local("graft-bench")
    // opt-in fast-hash benchmarking (NOT for oracle runs — see TextFns)
    if (sys.env.get("SPARK_GRAFT_FASTHASH").exists(_.toBoolean))
      spark.conf.set("spark.graft.fastHash", "true")
    // warm the session: codegen + shuffle machinery, AND the parquet/
    // Hadoop-FS stack — a range-only warmup leaves the alphabetically
    // first query paying the filesystem cold start
    spark.range(1000000).selectExpr("id % 97 AS k", "id AS v")
      .groupBy("k").sum("v").count()
    // best-effort: a missing warmup file must not abort the bench — the
    // per-query try/catch below is the failure-isolation contract, and
    // an SF dir without region.parquet should still time every query
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup read skipped: ${e.getMessage}")
    }
    val repeats = math.max(1,
      sys.env.get("SPARK_GRAFT_REPEATS").flatMap(_.toIntOption).getOrElse(1))
    // local-iteration filter: comma-separated EXACT query names; unset =
    // all. Exact match, not prefix — "q3" selects nothing, not q30-q38b.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      // one untimed per-query warm-up under REPEATS>1 (see Scaladoc)
      if (repeats > 1) graft.core.CacheScope.scoped {
        try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () }
      }
      val times = Seq.fill(repeats) {
        val t0 = System.nanoTime()
        // scoped: this query's registered caches release right after its
        // action, so blocks never accumulate across queries (the round-2
        // tail regression)
        val ok = graft.core.CacheScope.scoped {
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        }
        // a failed query reports -1, never its abort time — an abort
        // masquerading as a timing would read as a huge speedup in the
        // round-over-round trend
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val t =
        if (times.exists(_ < 0)) -1.0
        else {
          val s = times.sorted
          if (s.length % 2 == 1) s(s.length / 2)
          else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
        }
      (name, t)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.filter(_._2 >= 0).map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
