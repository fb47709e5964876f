package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Packaged training-data curation funnel: language gate → quality gate →
  * exact dedup → near-dup clustering → keep-one-per-component. Each stage
  * is one of the library's oracle-checked operators; this just wires the
  * standard order with a config. Every stage is a filter over the input
  * (no row is ever duplicated back in), so counts are monotone.
  */
object Curation {

  case class Config(
      languages: Set[String] = Set("en"),
      minQuality: Double = 0.3,
      jaccardThreshold: Double = 0.8,
      shingleN: Int = 3,
      maxShingleFreq: Int = 100)

  case class FunnelStats(input: Long, afterLanguage: Long, afterQuality: Long,
      afterExactDedup: Long, afterNearDedup: Long)

  /** Run the funnel; returns the curated frame and per-stage counts.
    * The near-dup component stage is inherently eager (its fixpoint
    * iteration runs at call time); `withStats = true` additionally costs
    * one counting action per stage, each re-scanning the narrow filter
    * chain above it — pass `withStats = false` to skip those.
    *
    * Checkpoint lifetime: the returned frame references two checkpoints
    * (the exact stage below, the CC labels inside) that live until context
    * stop. A long-lived process that calls the funnel repeatedly should
    * release them once the result is materialized —
    * [[NearDup.releaseResultCheckpoints]] (the curate verb does). */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config(), withStats: Boolean = true)
      : (DataFrame, Option[FunnelStats]) = {
    val text = col(textCol)
    // langId + qualityScore are heavy per-row expressions evaluated right
    // above the (unsplittable one-row-group) scan — spread it so they
    // parallelize (conditional no-op on wide input)
    val wide = graft.operators.Spread.wideScan(docs, weight = 48L)
    val lang = wide.where(
      TextAnalysis.langId(text).isInCollection(cfg.languages.toSeq))
    val quality = lang.where(TextAnalysis.qualityScore(text) >= cfg.minQuality)
    // the filter chain above `exact` (marker-count langId + quality score +
    // md5 + keep-min window) is expensive per evaluation and has THREE
    // downstream consumers (pair spine ×2 via sizes, anti-join left side) —
    // checkpointing it once measured ~15% faster end-to-end (Prof A/B,
    // interleaved; the opposite trade from the cheap-scan hot paths where
    // a persist loses to recompute). Reliable checkpoint when a dir is
    // configured, executor-local otherwise (NearDup.ckpt).
    // the by-fingerprint exchange is pinned so the keep-min window — and,
    // transitively, the checkpoint every downstream stage reads — keeps
    // full width instead of AQE-coalescing to one partition
    val exact = NearDup.ckpt(graft.operators.Spread.byKeyWeighted(
        quality.withColumn("__fp", TextAnalysis.fingerprint(text)),
        48L, col("__fp"))
      .withColumn("__keep", min(col(idCol)).over(Window.partitionBy("__fp")))
      .where(col(idCol) === col("__keep"))
      .drop("__fp", "__keep"))
    val pairs = NearDup.jaccardPairs(exact, idCol, textCol,
      cfg.shingleN, cfg.jaccardThreshold, cfg.maxShingleFreq)
    val nonReps = NearDup.duplicateComponents(pairs)
      .where(col("doc_id") =!= col("component"))
      .select(col("doc_id").as(idCol))
    val curated = exact.join(nonReps, Seq(idCol), "left_anti")
    val stats =
      if (!withStats) None
      else Some(FunnelStats(docs.count(), lang.count(), quality.count(),
        exact.count(), curated.count()))
    (curated, stats)
  }

  /** Incremental near-dup admission for a growing corpus: a new doc is
    * admitted iff it is NOT near-duplicate-connected to any already-kept
    * doc, and is the lowest-id member of its all-new duplicate component
    * (so each batch admits exactly one representative per new group).
    * Kept docs are never modified.
    *
    * Shape: one pair computation over kept ∪ batch (the candidate join is
    * what dominates; at corpus scale persist the kept side's shingle or
    * signature table instead of recomputing — the operator takes
    * DataFrames so a materialized kept table slots straight in), then the
    * same connected-components pass the batch funnel uses. Components
    * containing a kept doc reject all their new members; all-new
    * components keep their min id, which IS the component label. */
  /** Near-dup cluster members ranked best-first within their cluster:
    * (doc_id, component, score, rnk), rnk 1 = the cluster's representative.
    * `score` is an arbitrary expression over the doc's columns (typically
    * `TextAnalysis.qualityScore(col(textCol))`), evaluated only AFTER the
    * join down to clustered docs — the expensive scoring never runs over
    * the unclustered majority of the corpus. Ties break to the lowest id.
    * Shared by gate q92 and the `dedup-best` CLI verb so the two cannot
    * drift apart. */
  def rankedClusterMembers(docs: DataFrame, idCol: String, textCol: String,
      score: org.apache.spark.sql.Column, n: Int = 3, threshold: Double = 0.8,
      maxShingleFreq: Int = 100): DataFrame = {
    val pairs = NearDup.jaccardPairs(docs, idCol, textCol, n, threshold,
      maxShingleFreq)
    val comps = NearDup.duplicateComponents(pairs)
    val members = comps
      .join(docs.withColumnRenamed(idCol, "doc_id"), "doc_id")
      .withColumn("__score", score)
    val w = Window.partitionBy(col("component"))
      .orderBy(desc("__score"), col("doc_id"))
    members.withColumn("rnk", row_number().over(w))
      .select(col("doc_id"), col("component"), col("__score").as("score"),
        col("rnk"))
  }

  def admitIncremental(kept: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, cfg: Config = Config()): DataFrame =
    admitIncrementalFromShingles(kept.select(col(idCol)),
      NearDup.shingleTable(kept, idCol, textCol, cfg.shingleN),
      batch, idCol, textCol, cfg)

  /** [[admitIncremental]] with the kept side supplied as a MATERIALIZED
    * shingle table — the production shape for a growing corpus: shingle the
    * kept docs once (e.g. a parquet table updated per admitted batch) and
    * pay only the batch's shingling per call, instead of re-evaluating the
    * shingle expression over the whole corpus every time. `keptIds` is one
    * `idCol` column; `keptShingles` is `(doc_id, s)` as produced by
    * [[NearDup.shingleTable]]. Output is identical to [[admitIncremental]]
    * on the same corpus (AdmissionSpec asserts equality). */
  def admitIncrementalFromShingles(keptIds0: DataFrame, keptShingles: DataFrame,
      batch: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    // a re-offered id IS the kept doc — exclude before graph construction
    // (identical ids can never form a pair under the a<b join)
    val fresh = batch.join(keptIds0.select(col(idCol)), Seq(idCol), "left_anti")
    val sh = keptShingles.select(col("doc_id"), col("s"))
      .unionByName(NearDup.shingleTable(fresh, idCol, textCol, cfg.shingleN))
    val pairs = NearDup.jaccardPairsFromShingles(sh,
      cfg.jaccardThreshold, cfg.maxShingleFreq)
    val comps = NearDup.duplicateComponents(pairs)
    val keptIds = keptIds0.select(col(idCol).as("doc_id"))
    val blocked = comps.join(keptIds, "doc_id")
      .select(col("component")).distinct()
    val newComps = comps.join(keptIds, Seq("doc_id"), "left_anti")
    val rejected = newComps.join(blocked, "component").select("doc_id")
      .unionByName(newComps.join(blocked, Seq("component"), "left_anti")
        .where(col("doc_id") =!= col("component")).select("doc_id"))
      .withColumnRenamed("doc_id", idCol)
    fresh.join(rejected, Seq(idCol), "left_anti")
  }
}
