package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation mining via pointwise mutual information over adjacent
  * token pairs (Church & Hanks, "Word Association Norms, Mutual
  * Information, and Lexicography", 1990) — the phrase detector of a
  * corpus pipeline: find "new york"-style bigrams whose co-occurrence
  * far exceeds chance, for tokenizer vocab building and boilerplate
  * fingerprinting.
  *
  * PMI(w1, w2) = ln( (c12/T2) / ((c1/T1)·(c2/T1)) ) with c12 the bigram
  * count over T2 total bigrams and c1, c2 unigram counts over T1 total
  * tokens. A minimum bigram count keeps the classic low-frequency PMI
  * explosion out of the result.
  *
  * Scale: bigram and unigram counts are each one explode + groupBy;
  * the unigram side joins back by token (broadcastable at vocab scale —
  * vocab grows ~log of corpus); corpus totals are one aggregated row.
  * PMI is quantized to integer micro-units ([[LanguageModel]] rule) so
  * results are engine-exact.
  */
object Collocations {

  /** Bigrams with count >= minCount and their PMI:
    * (w1, w2, c12, pmi_micro), pmi_micro = floor(PMI·1e6 + 0.5). */
  def pmiBigrams(df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5L): DataFrame = {
    // NOT spread: A/B'd slower (cheap count-aggs; the exchange outweighs
    // the parallelism — OPTIMIZATION_r21.md)
    val toks = df.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
    val uni = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false) // reused for both bigram endpoints
    val bic = df.select(
      explode(TextAnalysis.ngrams(col(textCol), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
      .localCheckpoint(eager = false) // reused: total mass + frequent set
    val bi = bic
      .where(col("c12") >= minCount)
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
      .where(length(col("w1")) > 0 && length(col("w2")) > 0)
    val totals = uni.agg(sum("c").as("t1"))
      .crossJoin(bic.agg(sum("c12").as("t2")))
    bi
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(totals))
      .withColumn("pmi_micro",
        floor(log(
          (col("c12").cast("double") / col("t2").cast("double")) /
            ((col("c1").cast("double") / col("t1").cast("double")) *
              (col("c2").cast("double") / col("t1").cast("double"))))
          * lit(1e6) + lit(0.5)).cast("long"))
      .select("w1", "w2", "c12", "pmi_micro")
  }
}
