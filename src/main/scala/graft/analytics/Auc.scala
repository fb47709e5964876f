package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.GlobalOrder

/** Exact distributed ROC-AUC via the Mann-Whitney rank-sum identity —
  * the quality-classifier evaluation step of a curation pipeline, computed
  * without materializing the n_pos × n_neg pair space and without a
  * single-task global sort.
  *
  * `AUC = (#{(p,n): s_p > s_n} + ½·#{s_p = s_n}) / (n_pos·n_neg)`. Group
  * rows by DISTINCT score (one shuffle; output is bounded by the distinct
  * score count, not the row count), then a distributed prefix sum of
  * negative counts in ascending score order ([[GlobalOrder]] — range
  * partition + per-partition offsets, never a global window) gives, per
  * score s, the negatives strictly below s. Then
  * `2U = Σ_s n_pos(s)·(2·negBelow(s) + n_neg(s))` — every term an integer,
  * so the result is EXACT and summation-order-free: no float comparison
  * subtleties survive into the output. The caller divides `u2` by
  * `2·n_pos·n_neg` for the AUC value; emitting the integer triple keeps
  * the operator engine-portable (bit-identical on any SQL engine). */
object Auc {

  /** One row: `u2` (= 2·U), `n_pos`, `n_neg` for scores of `scoreCol`
    * against boolean `labelCol` (true = positive). Null scores/labels are
    * excluded (a null score has no rank; a null label is unjudgeable). */
  def aucCounts(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val perScore = df
      .where(scoreCol.isNotNull && labelCol.isNotNull)
      .select(scoreCol.as("s"), labelCol.cast("boolean").as("y"))
      .groupBy("s")
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("np"),
        sum(when(col("y"), 0L).otherwise(1L)).as("nn"))
    val cum = GlobalOrder.rankWithPrefixSum(perScore, Seq(col("s")),
      rankCol = "__r", sumOf = Some((col("nn"), "__cum_nn")))
    cum.agg(
      sum(col("np") * (lit(2) * (col("__cum_nn") - col("nn")) + col("nn")))
        .cast("long").as("u2"),
      sum(col("np")).cast("long").as("n_pos"),
      sum(col("nn")).cast("long").as("n_neg"))
  }

  /** Calibration / reliability table: rows are ranked by `scoreCol` into
    * `k` equal-frequency bins ([[graft.operators.Binning]] — distributed
    * global rank, no single-task window) and each bin reports its size,
    * positive count, and micro-quantized score mass (`Σ round(s·10⁶)`,
    * BIGINT — exact, order-free). Predicted-vs-actual per decile is then
    * `score_micro/n/1e6` vs `n_pos/n` — computed by the caller so the
    * operator output stays integer-exact. */
  def calibrationBins(df: DataFrame, scoreCol: Column, labelCol: Column,
      tieBreak: Seq[Column], k: Int): DataFrame = {
    val cols = scoreCol.cast("double").as("s") +:
      labelCol.cast("boolean").as("y") +:
      tieBreak.zipWithIndex.map { case (c, i) => c.as(s"__tb$i") }
    val base = df.where(scoreCol.isNotNull && labelCol.isNotNull)
      .select(cols: _*)
    val tbCols = tieBreak.indices.map(i => col(s"__tb$i"))
    graft.operators.Binning.equalFrequency(base, col("s") +: tbCols, k)
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum(round(col("s") * lit(1e6)).cast("long")).as("score_micro"))
  }
}
