package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-derived unigram language-model scoring — the CCNet/KenLM-style
  * quality proxy for training-data curation: documents whose tokens are
  * improbable under the corpus's own unigram distribution (gibberish,
  * wrong language, OCR noise) score low and can be filtered or bucketed
  * by perplexity band.
  *
  * Shape, and why it scales: one token explode feeds BOTH the vocabulary
  * aggregation and the scoring join, keyed identically (token), so the
  * exchange is reused. The vocabulary side is one row per distinct token —
  * joining it back fans nothing out; a hot token ("the") skews only probe
  * partitions, which AQE skew-split handles. The corpus total rides in as
  * a broadcast single row (same pattern as [[Mixture]]). Per-token
  * log-probabilities are quantized to integer micro-units
  * (floor(x·1e6 + 0.5) — pure IEEE mul/add/floor) and summed as DECIMAL,
  * so partial-aggregation order never changes the result at any
  * parallelism.
  */
object LanguageModel {

  /** Per-document average unigram log-probability under the corpus's own
    * unigram distribution: (doc_id, n_tokens, avg_logprob), one row per
    * doc with at least one token. avg_logprob = Σ floor(ln(cnt/total)·1e6
    * + 0.5) / (n_tokens·1e6) — micro-unit-exact, so bit-identical across
    * engines and cluster sizes. More negative = less probable. */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
    val counts = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("__total"))
    val lp = counts.crossJoin(broadcast(total))
      .select(col("token"),
        floor(log(col("cnt").cast("double") / col("__total").cast("double"))
          * lit(1000000.0) + lit(0.5)).cast(DecimalType(18, 0)).as("__lpq"))
    tok.join(lp, "token")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("__lpq")).cast("double") / (count(lit(1)) * lit(1000000.0)))
          .as("avg_logprob"))
  }
}
