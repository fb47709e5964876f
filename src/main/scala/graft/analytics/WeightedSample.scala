package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling WITHOUT replacement
  * (Efraimidis–Spirakis A-Res): each row gets key `-ln(u)/w` from a
  * reproducible per-row uniform `u`, and the k SMALLEST keys are the
  * sample — exactly the distribution of sequential weighted draws, but
  * embarrassingly parallel and single-pass.
  *
  * Reproducibility: `u` derives from `md5(seed ":" id)` (first 13 hex
  * chars → 52-bit integer → (v+½)/2⁵² ∈ (0,1), exactly representable and
  * never 0), the same engine-portable convention as the epoch shuffle and
  * the md5 split — the sample is a pure function of (seed, id, weight),
  * identical at any parallelism and re-derivable by any engine. Keys are
  * pico-quantized (`round(key·10¹²)` BIGINT) with an id tie-break, so the
  * selection boundary is integer-compared rather than float-compared.
  * Selection is `orderBy(key).limit(k)` — Spark's TakeOrderedAndProject:
  * each partition keeps its local top-k heap and only k·partitions rows
  * ever move, no global sort. */
object WeightedSample {

  /** The k-row sample: original columns + `key_pico`. Rows with null,
    * zero, or negative weight are excluded (they have no draw
    * probability). */
  def sampleWithoutReplacement(df: DataFrame, idCol: Column, weightCol: Column,
      k: Int, seed: Long = 0L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (conv(substring(md5(concat_ws(":", lit(seed.toString),
      idCol.cast("string"))), 1, 13), 16, 10).cast("double") + lit(0.5)) /
      lit(4503599627370496.0) // 2^52
    val key = -log(u) / weightCol.cast("double")
    df.where(weightCol.isNotNull && weightCol.cast("double") > 0)
      .withColumn("key_pico", round(key * lit(1e12)).cast("long"))
      .orderBy(col("key_pico"), idCol)
      .limit(k)
  }

  /** Per-GROUP weighted sampling without replacement: `k` rows from each
    * group, same A-Res keys, selected with a group-partitioned window
    * rank — the balanced-corpus sampler ("k docs per source, weighted by
    * quality") where the global variant would let one group swallow the
    * budget. One shuffle on the group key; groups smaller than k return
    * whole. */
  def sampleByGroup(df: DataFrame, groupCols: Seq[Column], idCol: Column,
      weightCol: Column, k: Int, seed: Long = 0L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (conv(substring(md5(concat_ws(":", lit(seed.toString),
      idCol.cast("string"))), 1, 13), 16, 10).cast("double") + lit(0.5)) /
      lit(4503599627370496.0)
    val key = -log(u) / weightCol.cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols: _*)
      .orderBy(col("key_pico"), idCol)
    df.where(weightCol.isNotNull && weightCol.cast("double") > 0)
      .withColumn("key_pico", round(key * lit(1e12)).cast("long"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }
}
