package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing: merge overlapping or touching `[start, end]`
  * intervals per key into maximal disjoint spans — availability windows,
  * maintenance periods, validity ranges. The interval-domain complement of
  * [[Sessionize]] (which clusters POINTS by gap; this unions SPANS by
  * overlap).
  *
  * Single pass, one key shuffle: sort intervals by (start, end, tie)
  * within the key, carry the running maximum end with a window, open a new
  * group whenever a start exceeds every prior end (`start > cummax(end)`
  * over the preceding frame — touching intervals, `start == prior end`,
  * merge), then a running sum of the open flags numbers the groups and one
  * groupBy collapses each to (min start, max end, count). No interval
  * self-join, no quadratic overlap check. */
object Intervals {

  /** Per-key maximal merged spans of `[startCol, endCol]` (both inclusive,
    * any orderable type): (key..., span_start, span_end, n_merged),
    * `span_seq` numbering each key's spans in time order. Null-bounded and
    * inverted (end < start) intervals are dropped; zero-length ones
    * participate normally. */
  def coalesce(df: DataFrame, keyCols: Seq[String], startCol: String,
      endCol: String, tieCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*)
      .orderBy(col(startCol), col(endCol), col(tieCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val grouped = df
      .where(col(startCol).isNotNull && col(endCol).isNotNull)
      .where(col(endCol) >= col(startCol))
      .withColumn("__new", when(prevMax.isNull ||
        col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("__grp", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    grouped.groupBy(keys :+ col("__grp"): _*)
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_merged"))
      .withColumnRenamed("__grp", "span_seq")
  }
}
