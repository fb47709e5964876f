package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: assign documents to fixed-token-budget
  * sequences (the "sample packing" step that turns a curated corpus into
  * model-ready training rows).
  *
  * Strategy: contiguous fill — documents are taken in deterministic
  * (groupCol, orderCol) order and the running token total is cut into
  * budget-sized bins: seq_no = floor((cumsum - tokens) / budget), i.e. a
  * document starts a new sequence when the budget would overflow ON
  * AVERAGE over the stream. This is the window-expressible packing
  * (cumsum + integer division, one shuffle per group); true first-fit
  * bin packing is inherently sequential and packs only marginally tighter
  * on natural-language length distributions.
  *
  * Overlong documents (tokens > budget) deterministically occupy the bins
  * their span covers; downstream chunking splits them (the document is
  * flagged via `oversize`).
  *
  * Scale: ONE window shuffle keyed by `groupCol` (sources pack in
  * parallel); everything else is narrow arithmetic. The within-group sort
  * is the same sort the window needs — no extra exchange.
  */
object SequencePacking {

  /** Per-document packing assignment: (groupCol, orderCol columns..., tokens,
    * seq_no, oversize). `tokensCol` must be a precomputed token count (use
    * [[TextAnalysis.tokenCount]] or [[TextAnalysis.bpeTokenCount]]). */
  def assign(df: DataFrame, groupCol: String, orderCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("seq_no",
        ((col("__cum") - col(tokensCol)) / budget).cast("long"))
      .withColumn("oversize", col(tokensCol) > budget)
      .drop("__cum")
  }

  /** Packed-sequence summary: one row per (group, seq_no) with document and
    * token totals — the shape a training loader consumes. */
  def pack(df: DataFrame, groupCol: String, orderCol: String,
      tokensCol: String, budget: Long): DataFrame =
    assign(df, groupCol, orderCol, tokensCol, budget)
      .groupBy(col(groupCol), col("seq_no"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("seq_tokens"),
        max(col("oversize")).as("has_oversize"))
}
