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
  private val scopeLocal = new ThreadLocal[java.util.ArrayDeque[DataFrame]]()

  /** Cache `df` and register it — into the current thread's [[scoped]]
    * block if one is active (released when that block ends), else into
    * the global registry (released by [[releaseAll]]). */
  def cached(df: DataFrame): DataFrame = {
    df.cache()
    val scope = scopeLocal.get()
    if (scope != null) scope.add(df) else live.add(df)
    df
  }

  /** Run one query's plan build + action with its own cache scope:
    * caches registered on THIS thread inside `body` are released as the
    * block exits. This is what lets concurrent action-runners (Verify's
    * 4-way pool) release each query's caches promptly without evicting
    * a sibling query's still-needed frames — a global releaseAll from
    * one worker would release everyone's. */
  def scoped[A](body: => A): A = {
    val prev = scopeLocal.get()
    val mine = new java.util.ArrayDeque[DataFrame]()
    scopeLocal.set(mine)
    try body
    finally {
      scopeLocal.set(prev)
      mine.forEach(_.unpersist(blocking = false))
    }
  }

  /** Unpersist every globally-registered cache (non-blocking — block
    * eviction proceeds in the background while the next query starts). */
  def releaseAll(): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = live.poll()
    }
  }

  /** Number of globally-registered, not-yet-released caches. */
  def liveCount: Int = live.size()
}
