package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-mixture planning and sampling — the "data mixing" step of a
  * training pipeline: given per-source token masses and a target budget,
  * compute the per-source sampling fraction that rebalances the corpus,
  * then draw the sample.
  *
  * Planning is exact arithmetic over per-source token totals (one groupBy
  * shuffle + a broadcast of the 1-row corpus total) — deterministic and
  * oracle-checkable. Sampling is seeded Bernoulli per source
  * (`sampleBy`), deterministic per (seed, partitioning) like every other
  * sampler in [[graft.analytics.Sampling]].
  */
object Mixture {

  /** Per-source plan: (source, n_docs, tokens, share, fraction).
    * `fraction` = min(1, targetTokens · weight(source) / tokens(source)) —
    * the Bernoulli rate that hits the requested token budget in
    * expectation. Weights default to uniform over the observed sources;
    * missing weights mean "exclude" (fraction 0). */
  def plan(df: DataFrame, sourceCol: String, tokensCol: String,
      targetTokens: Long, weights: Map[String, Double] = Map.empty): DataFrame = {
    val perSource = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).as("tokens"))
    // the corpus-wide source count is only needed for uniform weighting
    val withShare =
      if (weights.isEmpty) {
        val nSources = perSource.select(count(lit(1)).as("__n"))
        perSource.crossJoin(broadcast(nSources))
          .withColumn("share", lit(1.0) / col("__n"))
      } else {
        val pairs = weights.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
        perSource.withColumn("share",
          coalesce(element_at(map(pairs: _*), col("source")), lit(0.0)))
      }
    withShare
      .withColumn("fraction",
        // guard BEFORE dividing: a zero-weight source is excluded even when
        // its token total is NULL/0 (least() would skip a NULL division
        // result and leak the source at 1.0). A NULL total means UNKNOWN
        // token mass — excluded (unknown is not budget-free); a true zero
        // total under a positive weight is included whole (its docs
        // genuinely cost nothing). ANSI division never runs on guarded rows.
        when(col("share") <= 0 || col("tokens").isNull, lit(0.0))
          .when(col("tokens") === 0, lit(1.0))
          .otherwise(least(lit(1.0),
            lit(targetTokens.toDouble) * col("share") / col("tokens"))))
      .select("source", "n_docs", "tokens", "share", "fraction")
  }

  /** Draw the planned sample: seeded Bernoulli per source at the plan's
    * fraction. Collects only the (small) per-source fraction map. */
  def sample(df: DataFrame, sourceCol: String, tokensCol: String,
      targetTokens: Long, weights: Map[String, Double] = Map.empty,
      seed: Long = 42L): DataFrame = {
    val fractions = plan(df, sourceCol, tokensCol, targetTokens, weights)
      .select("source", "fraction").collect()
      .map(r => r.get(0) -> r.getDouble(1)).toMap
    df.stat.sampleBy(sourceCol, fractions, seed)
  }
}
