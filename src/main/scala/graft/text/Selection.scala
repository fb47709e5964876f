package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.GlobalOrder

/** Corpus-level example selection for a training run: deterministic epoch
  * shuffling and quality-first token-budget packing. Both are global-order
  * problems solved with [[GlobalOrder.rankWithPrefixSum]] — no single-task
  * window anywhere, so they run at corpus scale.
  */
object Selection {

  /** Deterministic, engine-portable global epoch shuffle: every doc gets a
    * `shuffle_rank` from ordering by `md5(seed ":" id)` (tie-broken by id).
    * Different seeds give independent permutations; the SAME seed gives the
    * same permutation on any engine and any parallelism — md5 is
    * bit-identical everywhere (the xxhash64 used on hot paths has no
    * cross-engine twin), which is what makes a training run's example
    * order reproducible outside this library too. */
  def epochShuffle(df: DataFrame, idCol: String, seed: Long,
      numPartitions: Int = 0): DataFrame = {
    val key = md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string")))
    GlobalOrder.rankWithPrefixSum(
      df.withColumn("__shuffle_key", key),
      sortCols = Seq(col("__shuffle_key"), col(idCol)),
      rankCol = "shuffle_rank",
      numPartitions = numPartitions)
      .drop("__shuffle_key")
  }

  /** Quality-first token-budget selection: keep the best-scoring docs whose
    * INCLUSIVE cumulative token count still fits `budgetTokens` — the
    * "fill a 10B-token budget with the best documents" step of corpus
    * assembly. Greedy by (scoreCol desc, idCol) with an exact distributed
    * prefix sum; ties broken by id so the kept set is deterministic at any
    * parallelism. Result keeps the input columns + `sel_rank` +
    * `cum_tokens`. */
  def tokenBudgetSelect(df: DataFrame, idCol: String, tokensCol: String,
      scoreCol: String, budgetTokens: Long,
      numPartitions: Int = 0): DataFrame = {
    GlobalOrder.rankWithPrefixSum(df,
      sortCols = Seq(col(scoreCol).desc, col(idCol)),
      rankCol = "sel_rank",
      sumOf = Some((col(tokensCol), "cum_tokens")),
      numPartitions = numPartitions)
      .where(col("cum_tokens") <= budgetTokens)
  }
}
