package graft

/** Executability smoke over the ENTIRE query inventory at sf0.001: every
  * SparkEntry query must build and run (correctness is the driver's
  * DuckDB gate; this catches runtime regressions inside `sbt test`).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("every SparkEntry query runs at sf0.001 and oracle coverage is complete") {
    val missingOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missingOracle.isEmpty, s"queries without oracle: $missingOracle")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sfDir).count(); None }
      catch { case e: Exception => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("the flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
