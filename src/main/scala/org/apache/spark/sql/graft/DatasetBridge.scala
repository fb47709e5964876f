package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` Dataset.ofRows — wraps an analyzed
  * LogicalPlan (e.g. the target/source sub-plans of a MERGE command) back
  * into a DataFrame WITHOUT re-analysis, so attribute exprIds survive and
  * expressions lifted from the command (conditions, assignments) still
  * bind. Same bridge pattern as [[ColumnBridge]]. */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
