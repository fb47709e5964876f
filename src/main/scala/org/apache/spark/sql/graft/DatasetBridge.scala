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

  /** The RESOLVED output attributes of a DataFrame's analyzed plan — for
    * rebinding expressions lifted from one plan (e.g. a MERGE command's
    * target relation) onto another frame with the same schema (e.g. the
    * engine's lineage-bearing read) by exprId substitution. */
  def output(df: DataFrame): Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed.output
}
