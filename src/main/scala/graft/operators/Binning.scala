package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equal-frequency (quantile) binning: each row gets one of `k` bins by its
  * GLOBAL rank in a sort order, bin sizes differing by at most one row —
  * the discretization step of feature pipelines (score deciles, price
  * quantiles, curriculum difficulty tiers).
  *
  * Distribution: the global rank rides [[GlobalOrder.rankWithPrefixSum]]
  * (range partition + per-partition offsets), NOT `ntile()` over an
  * unpartitioned window — Spark plans the latter onto a single task, the
  * canonical 100 TB killer. The bin formula `(rank-1)*k div n` is integer
  * arithmetic (engine-portable, no float rounding at bin boundaries) and
  * distributes the remainder evenly across bins; it is deliberately NOT
  * ntile's all-big-buckets-first layout, which cannot be assembled from
  * rank without a second global pass. */
object Binning {

  /** Adds `binCol` (0-based, `[0, k)`) by global `sortCols` order. Include
    * a tie-break column in `sortCols` for a reproducible assignment of
    * equal keys. `n` (total row count) rides the rank computation's
    * already-collected per-partition totals — no separate count scan. */
  def equalFrequency(df: DataFrame, sortCols: Seq[Column], k: Int,
      binCol: String = "bin"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    GlobalOrder.rankWithTotal(df, sortCols, "__gf_rank", "__gf_n")
      .withColumn(binCol,
        expr(s"((__gf_rank - 1) * $k) div __gf_n"))
      .drop("__gf_rank", "__gf_n")
  }

  /** Per-bin summary of `valueCol` over the equal-frequency binning —
    * the k-row report (count, min, max) a profiler emits. */
  def binStats(df: DataFrame, valueCol: String, tieBreak: Seq[Column],
      k: Int): DataFrame = {
    // project to the sort columns before ranking: rankWithPrefixSum
    // checkpoints its range-sorted input, so unused columns would be
    // shuffled AND materialized (guide §2.3 "project before the exchange").
    // tieBreak expressions are ALIASED to stable names first (r22,
    // ADVICE): an unaliased expression column (col("a")+1) could not
    // re-resolve against the projected frame, and a tieBreak repeating
    // valueCol would create a duplicate column name.
    val ties = tieBreak.zipWithIndex.map { case (c, i) => c.as(s"__tb$i") }
    val tieRefs = tieBreak.indices.map(i => col(s"__tb$i"))
    equalFrequency(df.select(col(valueCol) +: ties: _*),
      col(valueCol) +: tieRefs, k)
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))
  }
}
