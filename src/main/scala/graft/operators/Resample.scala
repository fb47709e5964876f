package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series resampling with gap fill — the densification step every
  * monitoring/trend pipeline needs before window math: aggregate events
  * into fixed buckets AND emit a row for every (group, bucket) in the
  * observed span, so downstream moving averages / anomaly deltas see an
  * unbroken grid instead of silently skipping empty buckets.
  *
  * Scale posture: the aggregation is one groupBy shuffle on
  * (group, bucket). The grid is built from a ONE-ROW global span
  * aggregate broadcast against the distinct group set, then
  * `explode(sequence(lo, hi, step))` — groups × buckets rows generated
  * executor-side, never collected. The final left join shuffles on the
  * same (group, bucket) key as the aggregation. Bucket span is bounded
  * by wall-clock time (buckets, unlike rows, don't grow with corpus
  * size), so the grid side stays small relative to the data at any SF.
  */
object Resample {

  /** Gap-filled per-group bucket aggregation.
    *
    * @param unit   date_trunc unit and step: "minute", "hour", "day", or
    *               "week"
    * @return (grp, bucket, n, total) — `n` = 0 and `total` = 0.0 on
    *         gap rows; total is an exact decimal sum surfaced as double
    */
  def gapFill(df: DataFrame, grpCol: String, tsCol: String,
      valueCol: String, unit: String = "hour"): DataFrame = {
    require(Set("minute", "hour", "day", "week").contains(unit),
      s"unsupported unit: $unit")
    val bucket = date_trunc(unit, col(tsCol))
    val actual = df
      .groupBy(col(grpCol).as("grp"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(28,6)")).cast("double").as("total"))
    val span = df.agg(date_trunc(unit, min(col(tsCol))).as("lo"),
      date_trunc(unit, max(col(tsCol))).as("hi"))
    val grid = df.select(col(grpCol).as("grp")).distinct()
      .crossJoin(broadcast(span)) // one-row scalar frame
      .select(col("grp"),
        explode(sequence(col("lo"), col("hi"),
          expr(s"interval 1 $unit"))).as("bucket"))
    grid.join(actual, Seq("grp", "bucket"), "left")
      .select(col("grp"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total"), lit(0.0)).as("total"))
  }

  /** Trailing moving aggregate over a gap-filled grid: for each (grp,
    * bucket) the sum/mean of `total` across the last `window` buckets
    * (current included). Run on [[gapFill]] output — on a dense grid
    * "`window` rows back" IS "`window` buckets back"; on raw sparse
    * aggregates it silently is not, which is exactly why the
    * densification step exists.
    *
    * Determinism: the windowed sum goes through decimal (window sum
    * order is engine-internal — DuckDB slides a segment tree, Spark
    * scans the frame — so double accumulation diverges in ulps; decimal
    * is order-exact), then ONE double division by the frame row count.
    *
    * Scale: one window shuffle on grp — same key as [[gapFill]]'s final
    * join, so AQE coalesces them into adjacent stages; frame is
    * row-bounded (`window` rows), state O(window) per partition. */
  def movingAvg(filled: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"window >= 1: $window")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("bucket")
      .rowsBetween(-(window - 1), 0)
    filled.select(col("grp"), col("bucket"), col("n"), col("total"),
      (sum(col("total").cast("decimal(28,6)")).over(w).cast("double") /
        count(lit(1)).over(w)).as("mavg"))
  }
}
