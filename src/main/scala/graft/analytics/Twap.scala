package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-weighted average (TWAP-style): each observation holds its value
  * until the NEXT observation of the same key, so the average weights each
  * value by its holding duration — the standard correction for
  * irregularly-sampled metrics (a sensor that reports hourly must not
  * drown one that reports every second).
  *
  * Exactness: `value` is micro-quantized per row (`round(v·10⁶)` BIGINT)
  * BEFORE multiplying by the integer duration, so the weighted mass
  * `Σ v_micro·dur` is a pure integer sum — order-independent, no float
  * accumulation across the group, bit-identical on any engine. The output
  * is the (numerator, denominator) integer pair; callers divide. One
  * shuffle: the `lead` window and the final groupBy share the key. */
object Twap {

  /** Per-key `(n_obs, twap_num = Σ v_micro·dur_sec, twap_den = Σ dur_sec)`
    * over observations ordered by `(tsCol, tieCol)`. The last observation
    * of a key has no successor → zero duration (it contributes no mass);
    * keys with a single observation report zero mass rather than vanish. */
  def timeWeighted(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, valCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(tsCol), col(tieCol))
    val nextTs = lead(col(tsCol), 1).over(w)
    // whole-second durations via timestamp→long casts (floor): identical
    // on every engine, where fractional-second epoch doubles are not
    val dur = when(nextTs.isNull, lit(0L)).otherwise(
      nextTs.cast("long") - col(tsCol).cast("long"))
    df.withColumn("__vm", round(col(valCol).cast("double") * lit(1e6)).cast("long"))
      .withColumn("__dur", dur)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_obs"),
        sum(col("__vm") * col("__dur")).as("twap_num"),
        sum(col("__dur")).as("twap_den"))
  }
}
