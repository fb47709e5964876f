package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.GlobalOrder

/** Vocabulary coverage curve: how many distinct tokens (ranked by corpus
  * frequency) it takes to cover X% of all token occurrences — the
  * head/tail analysis behind tokenizer-vocabulary sizing and
  * rare-token-truncation decisions for a training corpus.
  *
  * Shape: explode → one groupBy(token) shuffle (output bounded by the
  * vocabulary, not the corpus), then a DISTRIBUTED inclusive prefix sum of
  * occurrence counts in (count desc, token) order via [[GlobalOrder]] —
  * range partition + per-partition offsets, never the single-task global
  * window. All quantities are integers; the coverage test
  * `cum·100 ≥ pct·total` is integer arithmetic, so thresholds land on
  * exactly the same token on every engine. */
object Coverage {

  /** For each percentage in `pcts` (integer percents, e.g. 50/90/99):
    * `pct`, `n_tokens` (smallest frequency-rank prefix whose occurrence
    * mass reaches pct% of the corpus), `covered_occurrences` (that
    * prefix's mass). Whitespace tokenization per
    * [[TextAnalysis.tokens]]; token ties broken lexicographically. */
  def coverageThresholds(docs: DataFrame, textCol: String,
      pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percents must be in [1,100], got $pcts")
    val counts = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("occ"))
    // the prefix-sum pass also yields the corpus-total occurrence mass as
    // a free literal (its per-partition totals are already on the driver)
    // — no separate agg(sum).collect() scan; a token-less corpus gives an
    // empty vocabulary frame and therefore an empty (correctly-typed)
    // result with no special case
    val ranked = GlobalOrder.rankWithPrefixSum(counts,
      Seq(col("occ").desc, col("token")),
      rankCol = "__rank", sumOf = Some((col("occ"), "__cum")),
      totalCol = "__total")
    val pctDf = docs.sparkSession.createDataFrame(
      pcts.map(p => Tuple1(p))).toDF("pct")
    // per pct: min rank whose cumulative mass reaches pct% — the join is
    // broadcast (pcts is a literal handful) so this is one scan of the
    // vocabulary frame, not one per threshold
    ranked.crossJoin(broadcast(pctDf))
      .where(col("__cum") * lit(100L) >= col("pct") * col("__total"))
      .groupBy("pct")
      .agg(min(col("__rank")).as("n_tokens"),
        min_by(col("__cum"), col("__rank")).as("covered_occurrences"))
  }
}
