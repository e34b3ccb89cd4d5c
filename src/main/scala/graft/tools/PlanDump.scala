package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: print AQE-final physical plans for selected queries. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val spark = graft.core.SparkSessionFactory.local("graft-plandump", defaultCpus = 8)
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      graft.core.CacheScope.scoped {
        val df = SparkEntry.queries(name)(spark, dir)
        df.collect()
        println(s"\n================ $name ================")
        println(df.queryExecution.executedPlan.toString.take(4000))
      }
    }
    spark.stop()
  }
}
