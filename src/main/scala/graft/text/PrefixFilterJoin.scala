package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity join via prefix filtering (AllPairs / PPJoin
  * family: Bayardo et al., "Scaling Up All Pairs Similarity Search",
  * WWW'07; Xiao et al., "Efficient Similarity Joins for Near Duplicate
  * Detection", WWW'08).
  *
  * [[NearDup.jaccardPairs]] bounds its candidate self-join with a
  * doc-frequency CAP — dropping stop-shingles is an approximation (pairs
  * held together only by hot shingles are missed). Prefix filtering is
  * the EXACT alternative at the same cost class: order every doc's
  * shingles by a global rare-first total order and index only the first
  * `|d| - ceil(t*|d|) + 1` of them. Any pair with Jaccard >= t MUST
  * share a prefix token (pigeonhole over the required overlap
  * `ceil(t/(1+t)*(na+nb))`), so joining prefixes loses nothing — and
  * because prefixes hold each doc's RAREST shingles, hot shingles never
  * reach the join unless a doc consists almost entirely of them.
  *
  * Exactness guard: the prefix length and the size filter are computed
  * with a 1e-9 slack (`ceil(0.8 * 5)` is 5 in IEEE doubles, not 4 —
  * an unguarded ceil SHORTENS the prefix and silently drops true
  * pairs). Slack only ever lengthens the prefix / widens the size
  * window, so it can add candidates, never lose them; the exact verify
  * step removes any extras.
  *
  * Plan shape (the 100 TB posture):
  *   - doc-frequency and per-doc rank are two window passes (one
  *     shuffle by `s`, one by `doc_id`), no driver state;
  *   - the candidate join's input is the prefix table only — for
  *     t = 0.8 about 20% of each doc's shingles, and the globally
  *     rarest ones, so bucket sizes on the join key stay small without
  *     any lossy cap;
  *   - a size filter (`t*max <= min`) prunes length-incompatible pairs
  *     inside the join condition;
  *   - verification recomputes shingle ARRAYS for candidate docs only
  *     (semi-join first, then one `array_intersect` per pair — the
  *     [[MinHashLSH.nearDuplicates]] shape), so the corpus-wide
  *     exploded table is never joined against itself.
  */
object PrefixFilterJoin {

  private val Eps = 1e-9

  /** Exact pairwise n-gram Jaccard >= threshold, prefix-filtered.
    * Result: (id_a, id_b, inter, na, nb, jaccard), id_a < id_b —
    * identical to an uncapped [[NearDup.jaccardPairs]] / the all-pairs
    * SQL, at prefix-join cost. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold in (0,1]: $threshold")
    val sh = NearDup.shingleTable(df, idCol, textCol, n)
    val cands = candidatePairs(sh, threshold).localCheckpoint(eager = false)
    NearDup.verifyPairs(df, idCol, textCol, n, cands, threshold)
  }

  /** Candidate pairs from a per-doc-distinct `(doc_id, s)` shingle
    * table: a provable SUPERSET of all pairs with Jaccard >= threshold
    * (prefix-filter completeness), typically a tiny multiple of the true
    * pair count. Result: (id_a, id_b), id_a < id_b, distinct. */
  def candidatePairs(shingleDf: DataFrame, threshold: Double): DataFrame = {
    // global rare-first total order: (doc frequency, shingle text) — every
    // shingle gets one rank, so per-doc prefixes are mutually consistent.
    // Every exchange here (by s, by doc_id, by s again for the join) is
    // one the next window/join requires; pinning them keeps the CPU-bound
    // stages at full width (guide §2.4; OPTIMIZATION_r21.md)
    val byS = graft.operators.Spread.byKey(shingleDf, col("s"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("s")))
    val ranked = graft.operators.Spread.byKey(byS, col("doc_id"))
      .withColumn("p", row_number()
        .over(Window.partitionBy("doc_id").orderBy(col("df"), col("s"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
    val prefixLen =
      col("n") - ceil(lit(threshold) * col("n") - lit(Eps)) + lit(1)
    // df >= 2: a singleton shingle can never match another prefix — in a
    // large corpus most shingles are singletons, so this removes the
    // bulk of the join input without touching completeness (a shared
    // prefix token has df >= 2 by definition)
    val prefix = graft.operators.Spread.byKey(
      ranked.where(col("p") <= prefixLen && col("df") >= 2)
        .select("doc_id", "s", "n", "p"), col("s"))
    // PPJoin POSITIONAL filter (Xiao et al. WWW'08, r22): a matching
    // token at ranks (p_a, p_b) bounds the pair's overlap by
    // 1 + min(n_a − p_a, n_b − p_b) — shared tokens after this one occupy
    // strictly later ranks on BOTH sides. For a true pair the bound holds
    // at its globally-minimal shared token (which the size filter forces
    // into both prefixes), so requiring bound >= minOverlap on SOME join
    // row loses nothing; rows where only late prefix tokens match are
    // pruned before the verify. minOverlap = ceil(t/(1+t)·(n_a+n_b))
    // with the file's downward slack (a too-small bound only admits
    // extra candidates for the exact verify to drop).
    val minOverlap = ceil(
      lit(threshold / (1.0 + threshold)) * (col("a.n") + col("b.n")) - lit(Eps))
    prefix.alias("a")
      .join(prefix.alias("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n") >= lit(threshold) * col("b.n") - lit(Eps) &&
          col("b.n") >= lit(threshold) * col("a.n") - lit(Eps) &&
          lit(1) + least(col("a.n") - col("a.p"), col("b.n") - col("b.p"))
            >= minOverlap)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** DIRECTED set-containment join: pairs `(a, b)` with
    * `|A∩B| >= threshold·|A|` — "a is (mostly) contained in b", the
    * asymmetric relation Jaccard misses: a paragraph quoted inside a much
    * longer document scores near-zero Jaccard but containment ≈ 1. The
    * subset-dedup primitive for nested/quoted/expanded-document removal.
    *
    * Prefix filtering is one-sided here: only the CONTAINED side may skip
    * tokens (at most `|A| - ceil(t·|A|)` of them, pigeonhole), so side a
    * indexes its `|A| - ceil(t·|A|) + 1` rarest shingles and side b must
    * index all of its shingles. Rare-first ordering still keeps every
    * join key's a-side bucket small, bounding each key's candidate
    * product; `df >= 2` prunes both sides (a df=1 shingle cannot appear
    * in two docs). A size filter `|B| >= t·|A|` rides the join condition.
    * Verification recomputes arrays for candidate docs only and applies
    * the EXACT predicate `inter >= t·|A|` (no division — the same float
    * expression any SQL engine evaluates identically).
    *
    * Result: (id_a, id_b, inter, na, nb, containment), id_a ≠ id_b, both
    * directions reported independently. */
  /** Candidate stage of [[containmentPairs]], exposed so scale rehearsals
    * can measure the candidate count (the quantity whose growth must stay
    * sub-quadratic) without paying the exact-verify stage. Superset of
    * the true result by prefix-filter completeness. */
  def containmentCandidates(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = NearDup.shingleTable(df, idCol, textCol, n)
    // pinned exchanges, same rationale as [[candidatePairs]]
    val byS = graft.operators.Spread.byKey(sh, col("s"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("s")))
    val ranked = graft.operators.Spread.byKey(byS, col("doc_id"))
      .withColumn("p", row_number()
        .over(Window.partitionBy("doc_id").orderBy(col("df"), col("s"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
    val aPrefixLen =
      col("n") - ceil(lit(threshold) * col("n") - lit(Eps)) + lit(1)
    val aPref = graft.operators.Spread.byKey(
      ranked.where(col("p") <= aPrefixLen && col("df") >= 2)
        .select(col("doc_id").as("id_a"), col("s"), col("n").as("na"),
          col("p").as("pa")),
      col("s"))
    val bAll = graft.operators.Spread.byKey(
      ranked.where(col("df") >= 2)
        .select(col("doc_id").as("id_b"), col("s"), col("n").as("nb"),
          col("p").as("pb")),
      col("s"))
    // one-sided positional filter (see [[candidatePairs]]): required
    // overlap is ceil(t·n_a); the bound holds at the pair's
    // globally-minimal shared token, which must lie in a's prefix
    aPref.join(bAll, Seq("s"))
      .where(col("id_a") =!= col("id_b") &&
        col("nb") >= lit(threshold) * col("na") - lit(Eps) &&
        lit(1) + least(col("na") - col("pa"), col("nb") - col("pb")) >=
          ceil(lit(threshold) * col("na") - lit(Eps)))
      .select("id_a", "id_b").distinct()
  }

  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.9): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold in (0,1]: $threshold")
    val cands = containmentCandidates(df, idCol, textCol, n, threshold)
      .localCheckpoint(eager = false)
    val candIds = cands
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .distinct()
    // pinned-exchange verify, same shape as [[NearDup.verifyPairs]]
    val arrs = graft.operators.Spread.byKey(
        df.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
          .join(candIds, "doc_id"), col("doc_id"))
      .select(col("doc_id"), TextAnalysis.shingles(col("__text"), n).as("sh"))
      .withColumn("nn", size(col("sh")).cast("long"))
    val withA = graft.operators.Spread.byKey(cands, col("id_a"))
      .join(arrs.select(col("doc_id").as("id_a"), col("sh").as("sa"),
        col("nn").as("na")), "id_a")
    graft.operators.Spread.byKey(withA, col("id_b"))
      .join(arrs.select(col("doc_id").as("id_b"), col("sh").as("sb"),
        col("nn").as("nb")), "id_b")
      .withColumn("inter",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .where(col("inter").cast("double") >=
        lit(threshold) * col("na").cast("double"))
      .withColumn("containment",
        col("inter").cast("double") / col("na"))
      .select("id_a", "id_b", "inter", "na", "nb", "containment")
  }
}
