package graft.text

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-weighted document similarity — the frequency-aware cousin of
  * [[NearDup.jaccardPairs]] (which scores set overlap only). Two variants
  * share one inverted-index join shape:
  *
  *  - [[tfCosinePairs]] — cosine over raw term-frequency vectors. All
  *    aggregation is INTEGER (Σ tf², Σ tf_a·tf_b), so partial-aggregation
  *    order cannot perturb the result: deterministic at any parallelism and
  *    exactly reproducible by the DuckDB oracle.
  *  - [[tfidfPairs]] — classic TF-IDF weighting (log-smoothed IDF). Floating
  *    point by nature; covered by ScalaTest, not an exact SQL oracle.
  *
  * Scale shape (both): explode to (doc, token, tf) — one shuffle to count
  * tf, then a window doc-frequency count keyed by token, which is ALSO the
  * pair-join key, so the windowed subtree feeds both self-join sides with
  * no extra exchange (the same plan discipline as jaccardPairs). The
  * `maxTokenFreq` cap bounds the quadratic per-token join cost (a token in
  * F docs costs F²/2 rows) and doubles as crude stopword suppression —
  * exactly the tokens carrying no similarity signal. Singleton tokens
  * (df = 1) can never pair and are pruned from the join spine.
  */
object TokenSimilarity {

  /** (doc_id, tok, tf, dfreq): per-doc term frequencies with corpus doc
    * frequency attached (dfreq counts (doc, tok) rows, which are unique).
    * Tokenization is [[TextAnalysis.tokens]] — the single source of parity
    * with the DuckDB oracle's `tokensSql`. */
  def termFrequencies(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.operators.Spread.wideScan(df, weight = 48L)
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .withColumn("dfreq", count(lit(1)).over(Window.partitionBy("tok")))

  /** Shared inverted-index cosine core: cap → norms → df≥2 spine →
    * self-join on token → Σ products / (√ssa·√ssb) ≥ threshold. `kept`
    * must carry (doc_id, tok, dfreq, <weightCol>). */
  private def weightedCosinePairs(kept: DataFrame, weightCol: String,
      threshold: Double): DataFrame = {
    val w = col(weightCol)
    val sizes = kept.groupBy("doc_id").agg(sum(w * w).as("ss"))
    val spine = kept.where(col("dfreq") >= 2).select(col("doc_id"), col("tok"), w)
    spine.alias("a")
      .join(spine.alias("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(sum(col(s"a.$weightCol") * col(s"b.$weightCol")).as("num"))
      .join(sizes.select(col("doc_id").as("id_a"), col("ss").as("ssa")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("ss").as("ssb")), "id_b")
      .withColumn("sim",
        col("num").cast("double") / (sqrt(col("ssa")) * sqrt(col("ssb"))))
      .where(col("sim") >= threshold)
      .select("id_a", "id_b", "num", "sim")
  }

  private def capped(df: DataFrame, idCol: String, textCol: String,
      maxTokenFreq: Int): DataFrame =
    termFrequencies(df, idCol, textCol)
      .where(lit(maxTokenFreq <= 0) || col("dfreq") <= maxTokenFreq)

  /** Pairs (id_a, id_b, num, sim) with raw-TF cosine ≥ threshold, id_a <
    * id_b. sim = Σ_t tf_a·tf_b / (√(Σ tf_a²)·√(Σ tf_b²)) over tokens with
    * doc-frequency ≤ maxTokenFreq. Numerator and both norm sums are exact
    * integer aggregates; the only floating-point steps are the final two
    * sqrts and one division — bit-identical in any engine. */
  def tfCosinePairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxTokenFreq: Int = 100): DataFrame =
    weightedCosinePairs(capped(df, idCol, textCol, maxTokenFreq), "tf", threshold)

  /** Pairs (id_a, id_b, sim) with TF-IDF cosine ≥ threshold, id_a < id_b.
    * w(t, d) = tf · (ln((N+1)/(df_t+1)) + 1) — the smooth-IDF convention, so
    * a token in every doc still gets weight tf (never zero/negative).
    *
    * `quantizeScale > 0` quantizes each weight to integer "micro-units"
    * (`floor(w·10^scale + 0.5)` carried as DECIMAL) so every aggregate
    * (Σ w², Σ w_a·w_b) is exact and order-independent — the dsum convention
    * that makes the result reproducible at any parallelism. The scale
    * factor cancels in the cosine ratio. floor(x·10^s + 0.5) is chosen over
    * `round(x, s)` deliberately: it is pure IEEE multiply/add/floor, the
    * same ops in any engine, whereas round() implementations differ
    * (BigDecimal-on-decimal-repr vs scaled-multiply) and can disagree on
    * boundary values. Residual cross-engine risk, stated honestly: the
    * floor input still contains each engine's own `ln`, so a weight
    * landing within 1 ulp of a quantization boundary could floor
    * differently — deterministic for a fixed corpus and vanishingly rare
    * (the 1e-6 grid absorbs ulp noise everywhere else), but not
    * impossible. 0 = raw double weights (fastest, spec-tested only). */
  def tfidfPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxTokenFreq: Int = 0,
      quantizeScale: Int = 0): DataFrame = {
    val n = df.count()
    val idf = log((lit(n) + 1).cast("double") / (col("dfreq") + 1)) + 1
    val base = capped(df, idCol, textCol, maxTokenFreq)
    val kept =
      if (quantizeScale > 0) base.withColumn("w",
        floor(col("tf") * idf * lit(math.pow(10, quantizeScale)) + lit(0.5))
          .cast(org.apache.spark.sql.types.DecimalType(18, 0)))
      else base.withColumn("w", col("tf") * idf)
    weightedCosinePairs(kept, "w", threshold).drop("num")
  }
}
