package graft.core

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

/** Lifecycle registry for query-internal caches.
  *
  * Operators that reference an intermediate frame more than once in one
  * plan (shingle sets consumed by a signature pass and two verification
  * joins, fingerprints consumed by both sides of a banded self-join) must
  * `cache()` it — but a bare `.cache()` in a query body leaks: the query
  * returns a LAZY DataFrame, the caller runs the action, and nobody is
  * left holding the cached frame to unpersist it. In a long-lived session
  * (Bench, Cli, a notebook) those blocks accumulate across queries and
  * the executor storage/GC pressure taxes every query that runs later —
  * measured in round 2 as a uniform 2-4× slowdown of the whole tail of
  * the bench suite.
  *
  * The contract: query bodies register caches via [[cached]] instead of
  * calling `.cache()` directly, and whoever runs the ACTION calls
  * [[releaseAll]] once the results are materialized (Bench after each
  * query's count, Verify after each parquet dump, library users via
  * `Graft.releaseCaches()`). Unpersisting is correctness-neutral by
  * construction — Spark recomputes from lineage if a released frame is
  * ever re-used — so a late or concurrent release can only cost time,
  * never results.
  */
object CacheScope {

  private val live = new ConcurrentLinkedQueue[DataFrame]()

  /** Cache `df` and register it for the next [[releaseAll]]. */
  def cached(df: DataFrame): DataFrame = {
    df.cache()
    live.add(df)
    df
  }

  /** Unpersist every registered cache (non-blocking — block eviction
    * proceeds in the background while the next query starts). */
  def releaseAll(): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = live.poll()
    }
  }

  /** Number of registered, not-yet-released caches (test visibility). */
  def liveCount: Int = live.size()
}
