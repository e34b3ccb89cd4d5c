package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for inspecting testdata behavior under Spark. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.SparkSessionFactory.local("graft-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    try {
      val ev = spark.read.parquet(s"$dir/events.parquet")
      ev.printSchema()
      ev.show(3, truncate = false)
    } catch { case e: Throwable => println(s"EVENTS FAIL: ${e.getMessage.take(500)}") }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.show(4, truncate = 120)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.printSchema()
    emb.show(2, truncate = 80)
    spark.stop()
  }
}
