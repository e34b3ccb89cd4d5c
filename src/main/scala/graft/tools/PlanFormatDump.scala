package graft.tools

import graft.SparkEntry

/** Dev tool: write each named query's `explain("formatted")` output to
  * `<outDir>/<query>_<tag>.txt` — the judge-checkable plan artifacts
  * for the optimization rounds (plans/rNN). Executes the query first so
  * AQE-final plan details and runtime metrics exist, then captures the
  * FORMATTED explain of the returned frame.
  *
  * Usage: runMain graft.tools.PlanFormatDump <outDir> <tag> [sfDir] q...
  */
object PlanFormatDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanFormatDump <outDir> <tag> [sfDir] q...")
    val outDir = new java.io.File(args(0))
    outDir.mkdirs()
    val tag = args(1)
    val (dir, names) =
      if (args(2).startsWith("/")) (args(2), args.drop(3))
      else ("/root/testdata/sf0.01", args.drop(2))
    val spark = graft.core.SparkSessionFactory.local("graft-plandump", defaultCpus = 8)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      graft.core.CacheScope.scoped {
        val df = SparkEntry.queries(name)(spark, dir)
        df.count()
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val f = new java.io.File(outDir, s"${name}_$tag.txt")
        val w = new java.io.PrintWriter(f, "UTF-8")
        try w.write(txt) finally w.close()
        println(s"wrote ${f.getPath} (${txt.length} chars)")
      }
    }
    spark.stop()
  }
}
