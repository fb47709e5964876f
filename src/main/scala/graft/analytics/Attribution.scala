package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-touch attribution with a lookback bound: each conversion event is
  * credited to the most recent touch event of the same key at or before
  * it, unless the touch is older than `lookbackSec` — the classic
  * click→purchase credit assignment, and the tolerance-bounded variant of
  * [[graft.operators.AsOfJoin]].
  *
  * Same single-shuffle composition as the as-of join: both event roles
  * ride ONE key-partitioned window ordered by `(ts, role, tie)` (touches
  * sort before conversions at equal timestamps, so a same-instant touch
  * matches), and `last(_, ignoreNulls)` carries the latest touch forward.
  * No range join, no per-key collect — linear in the event count at any
  * scale. The tie column makes the carry deterministic even when several
  * touches share (key, ts), which plain as-of requires the caller to
  * pre-deduplicate. Gap is computed on whole-second epoch floors
  * (timestamp→long cast), engine-portable. */
object Attribution {

  /** For each `convType` event: `keyCol..., tieCol, conv_ts, attributed`
    * (tie id of the credited `touchType` event, null if none in window),
    * `gap_sec` (null iff unattributed). */
  def lastTouch(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      typeCol: String, touchType: String, convType: String,
      lookbackSec: Long): DataFrame = {
    require(lookbackSec > 0, s"lookbackSec must be positive, got $lookbackSec")
    val e = df.where(col(typeCol).isin(touchType, convType))
      .select(col(keyCol), col(tsCol).as("__ts"), col(tieCol).as("__tie"),
        (col(typeCol) === touchType).as("__is_touch"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), when(col("__is_touch"), 0).otherwise(1),
        col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = e
      .withColumn("__touch_id",
        last(when(col("__is_touch"), col("__tie")), ignoreNulls = true).over(w))
      .withColumn("__touch_ts",
        last(when(col("__is_touch"), col("__ts")), ignoreNulls = true).over(w))
      .where(!col("__is_touch"))
    val gap = col("__ts").cast("long") - col("__touch_ts").cast("long")
    val inWindow = col("__touch_ts").isNotNull && gap <= lookbackSec
    carried.select(col(keyCol), col("__tie").as(tieCol),
      col("__ts").as("conv_ts"),
      when(inWindow, col("__touch_id")).as("attributed"),
      when(inWindow, gap).as("gap_sec"))
  }
}
