package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history build — the standard
  * warehouse pattern (Kimball) for turning an append-only change/event
  * log into validity intervals: one row per (key, attribute-state) run
  * with [valid_from, valid_to) bounds and a current-row flag, so joins
  * "as of time T" become a range predicate.
  *
  * Consecutive observations with UNCHANGED tracked attributes collapse
  * into one interval (run-length compression with a null-safe struct
  * compare), so re-ingesting an unchanged snapshot does not spawn
  * spurious versions.
  *
  * Scale: both windows (run-collapse lag, interval lead) share one
  * partitioning on the key — a single shuffle, no driver state, and the
  * per-key partition is the natural SCD grain. Pass a `tieCol` (unique
  * event id) so equal timestamps order deterministically.
  */
object Scd {

  /** Build the Type-2 history.
    *
    * @param attrCols tracked attributes: a change in ANY starts a new
    *                 interval
    * @return key + attr columns + (valid_from, valid_to, is_current);
    *         valid_to is null on each key's current row
    */
  def scd2(log: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "need at least one key and one tracked attribute")
    val order = Seq(col(tsCol), col(tieCol))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val attrs = struct(attrCols.map(col): _*)
    val changed = log
      .withColumn("__prev", lag(attrs, 1).over(w))
      .where(col("__prev").isNull || !(col("__prev") <=> attrs))
      .drop("__prev")
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ attrCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** Point-in-time lookup against a [[scd2]] history: the attribute
    * state of every key as of `asOf` (keys with no interval covering
    * `asOf` are absent). */
  def asOf(history: DataFrame, asOf: Column): DataFrame =
    history.where(col("valid_from") <= asOf &&
      (col("valid_to").isNull || col("valid_to") > asOf))
      .drop("is_current")
}
