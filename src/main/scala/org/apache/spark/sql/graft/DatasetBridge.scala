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

  /** A parquet DataFrame over an explicit [[org.apache.spark.sql.execution.datasources.FileIndex]]
    * — what `spark.read.schema(schema).parquet(paths…)` builds, except the
    * file index is the caller's (e.g. a [[GraftFileIndex]] whose
    * `listFiles` applies manifest-level file skipping to the data filters
    * Catalyst pushes down at planning). `HadoopFsRelation`/`LogicalRelation`
    * are `private[sql]`, hence here. */
  def parquetFrame(spark: SparkSession,
      index: org.apache.spark.sql.execution.datasources.FileIndex,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rel = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      location = index,
      partitionSchema = new org.apache.spark.sql.types.StructType(),
      // asNullable matches DataFrameReader.schema(...): parquet files may
      // legitimately hold nulls regardless of the declared nullability
      dataSchema = schema.asNullable,
      bucketSpec = None,
      fileFormat =
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
      options = Map.empty)(cs)
    ofRows(spark,
      org.apache.spark.sql.execution.datasources.LogicalRelation(rel))
  }

  /** The ANALYZED logical plan of a DataFrame — `queryExecution` is on the
    * classic Dataset only in Spark 4. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed

  /** The RESOLVED output attributes of a DataFrame's analyzed plan — for
    * rebinding expressions lifted from one plan (e.g. a MERGE command's
    * target relation) onto another frame with the same schema (e.g. the
    * engine's lineage-bearing read) by exprId substitution. */
  def output(df: DataFrame): Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed.output
}
