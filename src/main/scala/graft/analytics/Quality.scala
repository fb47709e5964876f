package graft.analytics

import java.nio.file.Files

import graft.Lakehouse
import graft.core.Jsons

case class QualityScore(
    table: String,
    score: Double,
    completeness: Double,
    uniqueness: Double,
    freshness: Double,
    ruleCompliance: Double,
    recommendations: List[String],
    timestampMs: Long)

case class Anomaly(table: String, kind: String, severity: String, message: String)

/** Quality scoring + anomaly detection (reference quality.py).
  *
  * Weighted score (quality.py:28-159): completeness .30 (non-null cell
  * ratio) + uniqueness .25 (mean distinct ratio) + freshness .20 (piecewise
  * age decay, quality.py:83-88) + rule_compliance .25. History capped at 50.
  */
class Quality(lh: Lakehouse) {
  private def historyPath = lh.metaDir.resolve("quality_history.json")
  val MaxHistory = 50

  def history(table: String): List[QualityScore] =
    (if (Files.exists(historyPath))
       Jsons.readFile[Map[String, List[QualityScore]]](historyPath)
     else Map.empty[String, List[QualityScore]]).getOrElse(table, Nil)

  private def record(q: QualityScore): Unit = synchronized {
    val all = if (Files.exists(historyPath))
      Jsons.readFile[Map[String, List[QualityScore]]](historyPath)
    else Map.empty[String, List[QualityScore]]
    val updated = (all.getOrElse(q.table, Nil) :+ q).takeRight(MaxHistory)
    Jsons.writeFile(historyPath, all + (q.table -> updated))
  }

  /** Piecewise freshness decay by age (quality.py:83-88). */
  def freshnessScore(ageHours: Double): Double =
    if (ageHours <= 24) 1.0
    else if (ageHours <= 24 * 7) 0.8
    else if (ageHours <= 24 * 30) 0.5
    else 0.2

  def computeScore(table: String): QualityScore = {
    val profile = new Profile(lh)
    // statsNoCache: scoring must not refresh the cached baseline, or the
    // next detectAnomalies run would compare the table against itself and
    // mask any row-count/null-rate shift that happened in between
    val stats = profile.statsNoCache(table)
    val tbl = lh.catalog.loadTable(table)
    val nCols = tbl.schema.fields.length
    val rows = stats.rowCount

    val completeness =
      if (rows == 0 || nCols == 0) 1.0
      else 1.0 - stats.columnNullCounts.values.sum.toDouble / (rows * nCols)

    val p = profile.profileDf(tbl.read(), table)
    val uniqueness =
      if (rows == 0 || nCols == 0) 1.0
      else p.columns.map(_.distinctCount.toDouble / math.max(rows, 1)).sum / nCols

    val ageHours = (System.currentTimeMillis() - stats.lastModifiedMs) / 3600000.0
    val freshness = freshnessScore(ageHours)

    val rules = lh.validation.listRules(Some(table))
    val ruleCompliance =
      if (rules.isEmpty || rows == 0) 1.0
      else {
        val failures = lh.validation.validate(table, tbl.read(), None)
        val failedRows = failures.map(_.failedRows).sum.toDouble
        math.max(0.0, 1.0 - failedRows / (rules.size.toLong * rows))
      }

    val score = 0.30 * completeness + 0.25 * uniqueness +
      0.20 * freshness + 0.25 * ruleCompliance

    val recs = List(
      if (completeness < 0.9) Some(f"completeness ${completeness * 100}%.1f%% — add not_null rules or backfill") else None,
      if (uniqueness < 0.3) Some("low column uniqueness — consider dedup or key review") else None,
      if (freshness < 0.8) Some(f"table is ${ageHours}%.0f hours old — refresh or schedule pipeline") else None,
      if (ruleCompliance < 1.0) Some("validation failures present — inspect rules") else None
    ).flatten

    val q = QualityScore(table, score, completeness, uniqueness, freshness,
      ruleCompliance, recs, System.currentTimeMillis())
    record(q)
    q
  }

  /** Anomalies vs previously-cached stats (quality.py:162-273): row-count
    * Δ>50% (critical >90%), null-rate Δ>10pts (critical >30). */
  def detectAnomalies(table: String): List[Anomaly] = {
    val profile = new Profile(lh)
    val prev = profile.cachedStats(table)
    prev match {
      case None => Nil
      case Some(old) =>
        val tbl = lh.catalog.loadTable(table)
        val rows = tbl.currentSnapshot.map(_.totalRows).getOrElse(0L)
        val rowAnoms =
          if (old.rowCount == 0) Nil
          else {
            val delta = math.abs(rows - old.rowCount).toDouble / old.rowCount
            if (delta > 0.9)
              List(Anomaly(table, "row_count", "critical",
                s"row count changed ${old.rowCount} → $rows (${(delta * 100).round}%)"))
            else if (delta > 0.5)
              List(Anomaly(table, "row_count", "warning",
                s"row count changed ${old.rowCount} → $rows (${(delta * 100).round}%)"))
            else Nil
          }
        val nullAnoms =
          if (rows == 0 || old.rowCount == 0) Nil
          else {
            // read-only: must not clobber the cached baseline being compared
            val cur = profile.statsNoCache(table).columnNullCounts
            old.columnNullCounts.toList.flatMap { case (c, oldNulls) =>
              val oldRate = oldNulls.toDouble / old.rowCount * 100
              val newRate = cur.getOrElse(c, 0L).toDouble / rows * 100
              val d = math.abs(newRate - oldRate)
              if (d > 30) Some(Anomaly(table, "null_rate", "critical",
                f"$c null rate $oldRate%.1f%% → $newRate%.1f%%"))
              else if (d > 10) Some(Anomaly(table, "null_rate", "warning",
                f"$c null rate $oldRate%.1f%% → $newRate%.1f%%"))
              else None
            }
          }
        rowAnoms ++ nullAnoms
    }
  }

  /** All-tables quality report with average score (quality.py:276-328). */
  def report(): Map[String, Any] = {
    val tables = lh.catalog.listTables("*")
    val scores = tables.map(t => t -> computeScore(t))
    val avg = if (scores.isEmpty) 1.0 else scores.map(_._2.score).sum / scores.size
    Map("tables" -> scores.toMap, "average_score" -> avg)
  }
}
