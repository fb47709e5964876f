package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.sources.Filter

/** Bridge to Spark's own Catalyst-predicate → `sources.Filter` pushdown
  * translation (`protected[sql]`) — used by the filter-parity spec to
  * round-trip exactly the conversion the DSv2 planner performs before
  * filters reach a ScanBuilder. Same bridge pattern as [[ColumnBridge]]. */
object FilterBridge {
  def translate(e: Expression): Option[Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)
}
