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

  /** md5-derived deterministic uniform in [0,1): fold the first 8 hex
    * digits of md5(seed ":" id) into 2^20 buckets (a power of two, so the
    * 32-bit fold has ZERO modulo bias) and scale. 20 fractional bits are
    * exactly representable in a double, so the value — and any comparison
    * against it — is bit-identical in every engine. */
  def uniform01(id: org.apache.spark.sql.Column, seed: Long): org.apache.spark.sql.Column =
    graft.operators.HashSplit.bucket(
      concat_ws(":", lit(seed.toString), id.cast("string")), 1 << 20)
      .cast("double") / lit((1 << 20).toDouble)

  /** Deterministic importance sampling: keep a row iff `uniform01(id) <
    * prob`, where `prob` is any per-row acceptance probability expression
    * (e.g. a quality score sharpened by a temperature). Unlike
    * `df.sample`/`rand(seed)` — which are seeded PER PARTITION and change
    * with the physical layout — the decision depends only on (seed, id),
    * so the same sample comes out on any engine at any parallelism, and a
    * re-run admits exactly the same rows. */
  def importanceSample(df: DataFrame, idCol: String,
      prob: org.apache.spark.sql.Column, seed: Long): DataFrame =
    df.where(uniform01(col(idCol), seed) < prob)

  /** PPS (probability-proportional-to-size) SYSTEMATIC sampling: select
    * ~`k` rows with inclusion probability proportional to an integral
    * `sizeCol` (token counts, bytes) — the survey-sampling standard for
    * "pick k docs so token mass is represented proportionally", the
    * size-aware complement of [[importanceSample]]'s independent coin
    * flips (systematic selection has zero variance in the selected
    * total). Deterministic and engine-portable by construction: rows are
    * ordered by `(md5(seed:id), id)` — a deterministic permutation, so
    * the systematic stride has no periodicity bias and no engine-specific
    * RNG — then a row is kept iff one of the k equally-spaced thresholds
    * `m·T/k` lands in its cumulative-size interval, tested in INTEGER
    * arithmetic (`floor(k·cum/T)` increments across the row), so every
    * engine agrees bit-for-bit — no pow/ln whose libm rounding could
    * flip a boundary. Selects exactly k rows when every size < T/k; a
    * row spanning several thresholds is selected once, so the count can
    * drop below k only under extreme size skew. Zero sizes are valid
    * (zero mass ⇒ never selected); NEGATIVE sizes fail loudly in-pass.
    * Requires `k·T < 2^63` (at 2e13 corpus tokens that allows k up to
    * ~4·10⁵; beyond that, widen to DECIMAL). Result keeps the input
    * columns + inclusive `cum_size`; empty input yields no rows. */
  def ppsSystematicSample(df: DataFrame, idCol: String, sizeCol: String,
      k: Int, seed: Long, numPartitions: Int = 0): DataFrame = {
    require(k > 0, "k must be positive")
    // withColumn REPLACES same-named columns — refuse inputs that would
    // collide with the helper names or the output column instead of
    // silently clobbering user data
    Seq("__pps_key", "__pps_rank", "__pps_total", "cum_size").foreach { r =>
      require(!df.columns.contains(r), s"input already has a '$r' column")
    }
    // a NEGATIVE size makes the cumulative sum non-monotonic and the
    // threshold test meaningless — fail loudly inside the same pass
    // (zero sizes are fine: zero mass ⇒ zero inclusion probability)
    val checkedSize = when(col(sizeCol) < 0, raise_error(concat(
        lit(s"ppsSystematicSample: negative $sizeCol: "),
        col(sizeCol).cast("string"))))
      .otherwise(col(sizeCol))
    val key = md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string")))
    GlobalOrder.rankWithPrefixSum(
      df.withColumn("__pps_key", key),
      sortCols = Seq(col("__pps_key"), col(idCol)),
      rankCol = "__pps_rank",
      sumOf = Some((checkedSize, "cum_size")),
      numPartitions = numPartitions,
      totalCol = "__pps_total")
      .where(expr(s"(cum_size * $k) div __pps_total") >
        expr(s"((cum_size - CAST($sizeCol AS BIGINT)) * $k) div __pps_total"))
      .drop("__pps_key", "__pps_rank", "__pps_total")
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
