package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group outlier statistics: median and MAD (median absolute
  * deviation), the estimators a mean/stddev anomaly check cannot safely
  * replace — one corrupt 10⁹ reading drags a mean-based z-score past any
  * threshold, while the median/MAD pair has a 50% breakdown point.
  *
  * Exactness: values enter as QUARTER-micro integers (`round(v·10⁶)·4`):
  * the median (midpoint of two multiples of 4) is then an exact EVEN
  * integer, deviations from it are even, and the MAD (midpoint of two
  * evens) is again an exact integer — so both statistics cast to BIGINT
  * without any fractional part for any engine to round differently, and
  * the outlier test `dev·10⁴ > 44478·mad` (= dev > 3·1.4826·mad, the
  * normal-consistent 3σ-equivalent) compares exactly-represented
  * integral doubles: no engine can disagree on a boundary value.
  *
  * Shape: two grouped exact-percentile passes (median, then MAD of
  * deviations) with the per-group statistics broadcast back — the
  * group-count frame is tiny by construction (it IS the report's row
  * count), so neither join shuffles the data side more than the groupBy
  * already did. */
object Robust {

  /** Per-group (n, med_qm, mad_qm, n_outliers) over `valCol`, where `_qm`
    * values are in quarter-micro units (value·4·10⁶) and an outlier deviates
    * from the median by more than 3·1.4826·MAD. Null values are
    * excluded. */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valCol: String)
      : DataFrame = {
    val keys = groupCols.map(col)
    val base = df.where(col(valCol).isNotNull)
      .withColumn("__qm",
        round(col(valCol).cast("double") * lit(1e6)).cast("long") * lit(4L))
    val med = base.groupBy(keys: _*)
      .agg(expr("percentile(__qm, 0.5)").as("__med"))
    val dev = base.join(broadcast(med), groupCols)
      .withColumn("__dev", abs(col("__qm") - col("__med")))
    val mad = dev.groupBy(keys: _*)
      .agg(expr("percentile(__dev, 0.5)").as("__mad"))
    dev.join(broadcast(mad), groupCols)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        first(col("__med")).cast("long").as("med_qm"),
        first(col("__mad")).cast("long").as("mad_qm"),
        sum(when(col("__dev") * lit(10000.0) > lit(44478.0) * col("__mad"),
          1L).otherwise(0L)).as("n_outliers"))
  }
}
