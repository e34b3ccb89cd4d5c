package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Queries run in sorted
  * name order after a warmup action, so first-query JVM/codegen warmup
  * is not attributed to an arbitrary query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SparkSessionFactory.local("graft-bench")
    // opt-in fast-hash benchmarking (NOT for oracle runs — see TextFns)
    if (sys.env.get("SPARK_GRAFT_FASTHASH").exists(_.toBoolean))
      spark.conf.set("spark.graft.fastHash", "true")
    // warm the session: codegen, shuffle machinery, parquet reader
    spark.range(1000000).selectExpr("id % 97 AS k", "id AS v")
      .groupBy("k").sum("v").count()
    // local-iteration filter: comma-separated EXACT query names; unset =
    // all. Exact match, not prefix — "q3" selects nothing, not q30-q38b.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      // scoped: this query's registered caches release right after its
      // action, so blocks never accumulate across queries (the round-2
      // tail regression)
      graft.core.CacheScope.scoped {
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
