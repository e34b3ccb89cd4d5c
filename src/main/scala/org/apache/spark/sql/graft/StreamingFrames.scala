// Lives in the org.apache.spark.sql package tree because
// internalCreateDataFrame is private[sql] — the standard escape hatch
// for third-party v1 streaming sources, whose getBatch contract demands
// an isStreaming=true DataFrame that only internal constructors produce.
package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.SparkSession

object StreamingFrames {

  /** Re-wrap a (lazy) batch DataFrame as a streaming one: same physical
    * plan via `queryExecution.toRdd`, `isStreaming = true` so
    * MicroBatchExecution accepts it as a getBatch result. Nothing
    * executes here — the RDD stays unevaluated until the sink's action. */
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
