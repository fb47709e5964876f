package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: update a per-key (count, micro-sum)
  * state table from a CDC delta batch WITHOUT touching the base data — the
  * pattern that keeps a 100 TB rollup fresh for the cost of the day's
  * changes. Counts and micro-quantized sums are the self-maintainable
  * aggregate pair (inserts add, deletes subtract; an update is a
  * delete+insert); min/max are deliberately out of scope (they are not
  * maintainable under deletes without the base).
  *
  * Cost model: the delta aggregates shuffle only the BATCH (map-side
  * combine first), then one key-partitioned full-outer merge against the
  * state — at scale the state table is bucketed by key so the merge
  * co-locates without a state-side shuffle (see [[graft.io.Bucketing]]).
  * Keys whose maintained count reaches zero leave the state, so the
  * result is indistinguishable from a full recompute — that equivalence
  * is the correctness gate. */
object IncrementalAgg {

  /** Aggregate a bare key→(n, sum_micro) state from scratch (the bootstrap
    * and the recompute-equivalence oracle). */
  def countSumState(df: DataFrame, keyCols: Seq[String], valCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(round(col(valCol).cast("double") * lit(1e6)).cast("long"))
          .as("sum_micro"))

  /** Apply a delta batch (`opCol` ∈ 'I' insert / 'D' delete) to `state`.
    * Deleting a row absent from the state is the caller's contract
    * violation — it surfaces as a negative count rather than silently
    * vanishing, so reconciliation jobs can detect it. */
  def maintain(state: DataFrame, delta: DataFrame, keyCols: Seq[String],
      valCol: String, opCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val sign = when(col(opCol) === "I", 1L)
      .when(col(opCol) === "D", -1L)
      // an unknown op must fail the job, not silently null the key's delta
      .otherwise(raise_error(concat(lit(s"unknown $opCol: "), col(opCol))).cast("long"))
    val d = delta
      .withColumn("__sign", sign)
      .withColumn("__vm", round(col(valCol).cast("double") * lit(1e6)).cast("long"))
      .groupBy(keys: _*)
      .agg(sum(col("__sign")).as("__dn"),
        sum(col("__sign") * col("__vm")).as("__dsum"))
    state.join(d, keyCols, "full_outer")
      .select(keys :+
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n") :+
        (coalesce(col("sum_micro"), lit(0L)) + coalesce(col("__dsum"), lit(0L)))
          .as("sum_micro"): _*)
      .where(col("n") =!= 0)
  }
}
