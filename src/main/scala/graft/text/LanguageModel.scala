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
    val tok = graft.operators.Spread.wideScan(docs, weight = 48L)
      .select(col(idCol).as("doc_id"),
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

  /** Per-document average BIGRAM log-probability with add-one (Laplace)
    * smoothing: `p(w_i | w_{i-1}) = (c(w_{i-1}w_i)+1) / (c_prefix(w_{i-1})
    * + V)` where `c_prefix` counts the prefix followed by anything and `V`
    * is the corpus vocabulary — the next-order LM quality signal after
    * [[unigramLogProb]]: repetitive or word-salad text that unigram
    * statistics cannot separate (right words, wrong order) scores low.
    *
    * Same exactness discipline: per-bigram log-probs micro-quantize
    * (`floor(x·1e6 + 0.5)`) and sum as DECIMAL, order-free. Shape: one
    * posexplode; bigrams via `lead` over the (doc, pos) window — one
    * shuffle by doc_id, reused by the final per-doc aggregation; bigram
    * counts and prefix counts shuffle the distinct-bigram frame only; V
    * broadcasts as a single row. Docs with fewer than two tokens have no
    * bigrams and drop out. */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = graft.operators.Spread.wideScan(
        docs.where(length(trim(col(textCol))) > 0), weight = 48L)
      .select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "w")))
    val big = tok
      .withColumn("nxt",
        lead(col("w"), 1).over(Window.partitionBy("doc_id").orderBy("pos")))
      .where(col("nxt").isNotNull)
      .select("doc_id", "w", "nxt")
    val bc = big.groupBy("w", "nxt").agg(count(lit(1)).as("c2"))
    val pc = bc.groupBy("w").agg(sum(col("c2")).as("cp"))
    val vocab = tok.agg(countDistinct(col("w")).as("__v"))
    val lp = bc.join(pc, "w").crossJoin(broadcast(vocab))
      .select(col("w"), col("nxt"),
        floor(log((col("c2") + lit(1)).cast("double") /
            (col("cp") + col("__v")).cast("double"))
          * lit(1000000.0) + lit(0.5)).cast(DecimalType(18, 0)).as("__lpq"))
    big.join(lp, Seq("w", "nxt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("__lpq")).cast("double") / (count(lit(1)) * lit(1000000.0)))
          .as("avg_logprob"))
  }
}
