package graft.tools

import graft.core.Lake
import graft.engine.GraftFunctions
import org.apache.spark.sql.SparkSession

import scala.io.StdIn

/** SQL query CLI over the lake — the reference's query_datalake.py surface
  * (C2-C6): `tables | describe <t> | samples | interactive | <raw SQL>`.
  *
  * Unlike the reference, catalog load registers views lazily with NO eager
  * per-table count() (query_datalake.py:51,66,81 runs one full-scan job
  * per table before the first query — a full-lake scan at 100 TB).
  *
  * Usage: sbt "runMain graft.tools.Cli [sfDir] <command|SQL...>"
  */
object Cli {

  def main(args: Array[String]): Unit = {
    val (dir, rest) =
      if (args.nonEmpty && args.head.startsWith("/")) (args.head, args.tail)
      else ("/root/testdata/sf0.001", args)
    val spark = graft.core.SparkSessionFactory.local("graft-cli")
    GraftFunctions.register(spark)
    val lake = Lake(spark, dir)
    lake.registerViews()

    rest.toList match {
      case Nil | ("interactive" :: _) => interactive(spark, lake)
      case "tables" :: _              => tables(spark, lake)
      case "samples" :: _             => samples(spark)
      case "describe" :: t :: _       => describe(spark, lake, t)
      case sql                        => run(spark, sql.mkString(" "))
    }
    spark.stop()
  }

  private def tables(spark: SparkSession, lake: Lake): Unit = {
    println(s"Registered tables (${lake.tableNames.size}):")
    spark.catalog.listTables().collect()
      .foreach(t => println(s"  ${t.name}"))
  }

  private def describe(spark: SparkSession, lake: Lake, t: String): Unit =
    // a typo'd table name must not kill the shell (raw SQL already
    // catches; this path reads the file directly)
    try {
      val df = lake.table(t)
      println(s"== $t ==")
      println(df.schema.treeString)
      println(s"rows: ${df.count()}")
      df.show(5, truncate = false)
    } catch {
      case e: Exception =>
        println(s"describe failed for '$t': ${e.getMessage.linesIterator.next()}")
        println(s"known tables: ${lake.tableNames.mkString(", ")}")
    }

  /** Canonical smoke queries across operator families (the reference's
    * `samples` command, query_datalake.py:148-229). */
  private val sampleSql = Seq(
    "top revenue parts" ->
      """SELECT l_partkey, CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM lineitem GROUP BY l_partkey ORDER BY revenue DESC LIMIT 10""",
    "orders per segment" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer JOIN orders
         ON c_custkey = o_custkey GROUP BY 1 ORDER BY n DESC""",
    "events per type" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY 1 ORDER BY 1",
    "docs per lang" ->
      "SELECT lang, count(*) AS n, avg(n_chars) AS avg_chars FROM documents GROUP BY 1 ORDER BY 1",
    "vector self-similarity" ->
      """SELECT vec_id, cosine_sim(embedding, embedding) AS self_cos
         FROM embeddings ORDER BY vec_id LIMIT 5""")

  private def samples(spark: SparkSession): Unit =
    sampleSql.foreach { case (label, sql) =>
      println(s"\n-- $label")
      run(spark, sql)
    }

  private def run(spark: SparkSession, sql: String): Unit =
    try {
      val t0 = System.nanoTime()
      val df = spark.sql(sql)
      df.show(100, truncate = false)
      println(f"(${(System.nanoTime() - t0) / 1e9}%.2f s)")
    } catch {
      case e: Exception => println(s"query failed: ${e.getMessage}")
    }

  private def interactive(spark: SparkSession, lake: Lake): Unit = {
    println("graft SQL shell — commands: tables, describe <t>, exit")
    var live = true
    while (live) {
      print("sql> ")
      Console.flush()
      Option(StdIn.readLine()).map(_.trim) match {
        case None | Some("exit") | Some("quit") => live = false
        case Some("")                           => ()
        case Some("tables")                     => tables(spark, lake)
        case Some(c) if c.startsWith("describe ") =>
          describe(spark, lake, c.stripPrefix("describe ").trim)
        case Some(sql)                          => run(spark, sql)
      }
    }
  }
}
