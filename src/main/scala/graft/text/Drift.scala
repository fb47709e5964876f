package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between corpus slices — the mixture
  * monitor of a training pipeline: how far has each source/snapshot/
  * shard drifted from the corpus-wide token distribution? High KL flags
  * a source whose content stopped matching the mixture design (spam
  * influx, scraper breakage, template takeover).
  *
  * KL(P_slice ‖ P_global) = Σ_w p_s(w) · ln(p_s(w)/p_g(w)), summed over
  * the slice's own tokens (p_s(w) > 0, and p_g(w) > 0 because the
  * global distribution contains every slice). Non-negative by Gibbs'
  * inequality; 0 iff the slice matches the global mix exactly.
  *
  * Scale: one (slice, token) count shuffle; the global token counts
  * aggregate FROM those slice counts (no second corpus pass); totals
  * are one aggregated row. Per-token terms are micro-quantized
  * ([[LanguageModel]] rule) before the exact integer per-slice sum, so
  * results carry no float-summation-order freedom.
  */
object Drift {

  /** (slice, n_tokens, n_distinct, kl_micro): per-slice token count,
    * distinct-token count, and quantized KL divergence from the global
    * token distribution. */
  def tokenKlDivergence(df: DataFrame, sliceCol: String,
      textCol: String): DataFrame = {
    val st = df.select(col(sliceCol).as("slice"),
      explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
    val sc = st.groupBy("slice", "w").agg(count(lit(1)).as("c_sw"))
      .localCheckpoint(eager = false) // feeds global counts + slice totals
    val g = sc.groupBy("w").agg(sum("c_sw").as("c_gw"))
    val stot = sc.groupBy("slice").agg(sum("c_sw").as("c_s"))
    val gtot = stot.agg(sum("c_s").as("c_g"))
    val ps = col("c_sw").cast("double") / col("c_s").cast("double")
    val pg = col("c_gw").cast("double") / col("c_g").cast("double")
    sc.join(g, "w")
      .join(stot, "slice")
      .crossJoin(broadcast(gtot)) // one-row scalar frame
      .withColumn("term_micro",
        floor(ps * log(ps / pg) * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy("slice")
      .agg(sum("c_sw").as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum("term_micro").as("kl_micro"))
  }
}
