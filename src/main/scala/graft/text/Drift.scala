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
    val st = graft.operators.Spread.wideScan(df, weight = 48L)
      .select(col(sliceCol).as("slice"),
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

  /** Per-candidate-doc n-gram NOVELTY against a reference corpus:
    * (doc_id, n_grams, novel, novelty_ppm) where `n_grams` counts the
    * doc's DISTINCT n-grams, `novel` those absent from the reference
    * corpus's distinct n-gram set, and novelty_ppm = novel·10⁶ div
    * n_grams (integer — engine-exact). The "how much NEW content does
    * this batch add" curation signal: near-duplicates of reference
    * content score ~0, genuinely novel text ~10⁶ — the incremental-
    * admission complement to [[graft.text.NearDup]] (which finds
    * pairwise duplicates; this measures aggregate content overlap
    * without any pair join).
    *
    * Scale posture: both sides reduce to DISTINCT gram sets before the
    * join, so each gram appears at most once per side — the equi-join is
    * 1:≤1 per (doc, gram) with NO possibility of a hot-key blowup, and
    * partial aggregation collapses the per-doc counts map-side. The
    * reference set never materializes anywhere; it streams through the
    * shuffle keyed by gram. Docs with fewer than n tokens carry no grams
    * and are absent (same in the SQL twin). */
  def ngramNovelty(candidates: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val cand = graft.operators.Spread.wideScan(candidates, weight = 48L)
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.ngrams(col(textCol), n)).as("g"))
      .distinct()
    val ref = graft.operators.Spread.wideScan(reference, weight = 48L)
      .select(explode(TextAnalysis.ngrams(col(textCol), n)).as("g"))
      .distinct()
      .withColumn("__seen", lit(1))
    cand.join(ref, Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("novel"))
      .withColumn("novelty_ppm", expr("novel * 1000000 div n_grams"))
  }
}
