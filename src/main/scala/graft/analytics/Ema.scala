package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exponential moving average with a DYADIC smoothing factor — the
  * final-state EMA per key, computed as a closed-form weighted sum instead
  * of the sequential recurrence (which no engine can parallelize).
  *
  * `ema_N = Σ_{j≥2} α(1-α)^{N-j} x_j + (1-α)^{N-1} x_1` — one window for
  * (rank, count) and one groupBy, both on the key: a single shuffle.
  *
  * Exactness trick: with `1-α = 2^-m` every weight is a power of two, so
  * `x·α·(1-α)^k` is an exact binary scaling of `x·α` — no pow(), no
  * accumulated float error, and bit-identical on every IEEE-754 engine.
  * Weights below 2^-60 are exactly zero (they micro-quantize to 0 anyway),
  * keeping the shift in range. Each term is then micro-quantized to a
  * BIGINT and summed exactly — the summation ORDER (the classic
  * distributed-float trap) cannot change the result. The price is the
  * dyadic α restriction (1/2, 3/4, 7/8, ...); arbitrary α would reintroduce
  * pow(), whose libm implementations differ across engines. */
object Ema {

  /** Per-key final EMA over `valCol` in `(tsCol, tieCol)` order, α = 1-2^-m.
    * Output: key columns, `n_events`, `ema_micro` (EMA · 10^6, BIGINT). */
  def dyadicEmaFinal(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, valCol: String, m: Int = 1): DataFrame = {
    require(m >= 1 && m <= 30, s"m in [1,30], got $m")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(tsCol), col(tieCol))
    val wAll = Window.partitionBy(keys: _*)
    // α and 1-α are both exactly representable doubles
    val alpha = 1.0 - 1.0 / (1L << m).toDouble
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
    val k = (col("__n") - col("__rn")) * m
    // first observation seeds the EMA with weight (1-α)^(N-1), i.e. no α
    val scaled = when(col("__rn") === 1, col(valCol).cast("double"))
      .otherwise(lit(alpha) * col(valCol).cast("double"))
    // 2^-k scaling via an exact integer shift (SQL shiftleft — the Scala
    // wrapper only takes a literal shift); k > 60 underflows to the same 0
    // the micro-quantization would produce
    val pow2k =
      expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(__k AS INT)) AS DOUBLE)")
    val term = when(col("__k") > 60, lit(0L)).otherwise(
      round(scaled / pow2k * lit(1e6)).cast("long"))
    ranked.withColumn("__k", k)
      .withColumn("__tm", term)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_events"), sum(col("__tm")).as("ema_micro"))
  }
}
