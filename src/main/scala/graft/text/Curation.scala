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
    * The counts cost one action per stage — pass `withStats = false` to
    * build the plan lazily with no actions at all. */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config(), withStats: Boolean = true)
      : (DataFrame, Option[FunnelStats]) = {
    val text = col(textCol)
    val lang = docs.where(
      TextAnalysis.langId(text).isInCollection(cfg.languages.toSeq))
    val quality = lang.where(TextAnalysis.qualityScore(text) >= cfg.minQuality)
    val exact = quality
      .withColumn("__fp", TextAnalysis.fingerprint(text))
      .withColumn("__keep", min(col(idCol)).over(Window.partitionBy("__fp")))
      .where(col(idCol) === col("__keep"))
      .drop("__fp", "__keep")
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
}
