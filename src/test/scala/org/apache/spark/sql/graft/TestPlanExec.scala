// Test-only bridge into private[sql] plan execution, used to run a
// logical plan after applying an optimizer rule by hand.
package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}

object TestPlanExec {
  /** Execute a logical plan directly (Dataset.ofRows is private[sql]). */
  def run(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
