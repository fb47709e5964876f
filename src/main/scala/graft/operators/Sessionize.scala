package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time gap sessionization over a bounded event table — the batch
  * counterpart of [[graft.streaming.Streaming.sessionize]] (which closes
  * sessions on processing-time timeouts). A new session starts when the
  * gap to the previous event of the same key exceeds `gapMicros`.
  *
  * Plan shape: ONE shuffle by key; the lag window, the running
  * session-number sum, and the final per-session aggregation all share
  * the key partitioning (the two windows share one sort). Deterministic:
  * events are totally ordered per key by (ts, tieCol).
  */
object Sessionize {

  /** Rows annotated with a per-key `session_no` (1-based). */
  def assignSessions(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__prev", lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_micros(col(tsCol)) - col("__prev") > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_no",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("__prev", "__new")
  }

  /** One row per (key, session): event count, start/end, exact-decimal
    * value sum surfaced as double (oracle-stable). */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, gapMicros: Long): DataFrame =
    assignSessions(events, keyCol, tsCol, tieCol, gapMicros)
      .groupBy(col(keyCol), col("session_no"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        sum(col(valueCol).cast(DecimalType(28, 6))).cast("double")
          .as("total_value"))
}
