package graft.governance

import graft.Lakehouse

case class PartitionSuggestion(table: String, column: String, distinct: Long,
    rows: Long, benefit: Double)

case class MaterializationSuggestion(sql: String, occurrences: Int,
    avgDurationSec: Double)

case class CostEstimate(sql: String, estimatedRows: Long, complexity: String)

/** Advisor-only optimizer (reference optimizer.py:49-317 — it rewrites
  * nothing; real plan optimization is Catalyst's job). Mines the query
  * history for slow/repeated queries, suggests partition columns
  * (filtered columns with 2–1000 distinct values, benefit by distinct/rows
  * ratio — optimizer.py:183-186) and materialization candidates, and gives
  * a coarse cost estimate (filter ⇒ ×0.3 scan rows, optimizer.py:296-297).
  */
class Advisor(lh: Lakehouse) {

  private val TableRe = """(?i)\b(?:FROM|JOIN)\s+([\w.]+)""".r
  private val FilterColRe = """(?i)\bWHERE\b.*?(\w+)\s*(?:=|!=|<|>|<=|>=|IN\b|LIKE\b|IS\s+NULL)""".r

  def tablesIn(sql: String): Seq[String] =
    TableRe.findAllMatchIn(sql).map(_.group(1)).toSeq.distinct

  def filterColumnsIn(sql: String): Seq[String] =
    FilterColRe.findAllMatchIn(sql).map(_.group(1)).toSeq.distinct

  /** Slow queries: above the p90 duration of history (optimizer.py p90). */
  def slowQueries(): List[(String, Double)] = {
    val h = lh.savedQueries.history()
    if (h.size < 2) return Nil
    val durations = h.map(_.durationSec).sorted
    val p90 = durations((durations.size * 9 / 10).min(durations.size - 1))
    h.filter(_.durationSec >= p90).map(e => (e.sql, e.durationSec))
      .sortBy(-_._2)
  }

  /** Repeated queries by normalized SQL. */
  def repeatedQueries(minCount: Int = 2): List[(String, Int)] = {
    lh.savedQueries.history()
      .groupBy(e => lh.queryCache.normalize(e.sql))
      .collect { case (_, es) if es.size >= minCount => (es.head.sql, es.size) }
      .toList.sortBy(-_._2)
  }

  /** Partition suggestions for a table: frequently-filtered columns with
    * 2–1000 distinct values; benefit = rows/distinct selectivity ratio. */
  def suggestPartitions(table: String): List[PartitionSuggestion] = {
    val filteredCols = lh.savedQueries.history().flatMap(e => filterColumnsIn(e.sql))
      .groupBy(identity).view.mapValues(_.size).toMap
    val profile = lh.profile.profileTable(table)
    profile.columns
      .filter(c => filteredCols.contains(c.name))
      .filter(c => c.distinctCount >= 2 && c.distinctCount <= 1000)
      .map(c => PartitionSuggestion(table, c.name, c.distinctCount,
        profile.rowCount,
        1.0 - c.distinctCount.toDouble / math.max(profile.rowCount, 1)))
      .sortBy(-_.benefit)
  }

  /** Materialization candidates: repeated aggregate/join queries. */
  def suggestMaterializations(): List[MaterializationSuggestion] = {
    val hist = lh.savedQueries.history()
    repeatedQueries().filter { case (sql, _) =>
      val up = sql.toUpperCase
      up.contains("GROUP BY") || up.contains("JOIN")
    }.map { case (sql, n) =>
      val norm = lh.queryCache.normalize(sql)
      val durations = hist
        .filter(e => lh.queryCache.normalize(e.sql) == norm).map(_.durationSec)
      MaterializationSuggestion(sql, n,
        if (durations.isEmpty) 0 else durations.sum / durations.size)
    }
  }

  /** Coarse cost estimate (optimizer.py:270-317): base = sum of scanned
    * table rows, ×0.3 when filtered; complexity by join/group/subquery. */
  def estimateCost(sql: String): CostEstimate = {
    val tables = tablesIn(sql)
    val base = tables.map { t =>
      val ident = if (t.contains(".")) t else s"default.$t"
      if (lh.catalog.tableExists(ident))
        lh.catalog.loadTable(ident).currentSnapshot.map(_.totalRows).getOrElse(0L)
      else 0L
    }.sum
    val up = sql.toUpperCase
    val filtered = if (up.contains("WHERE")) (base * 0.3).toLong else base
    val joins = "JOIN".r.findAllIn(up).size
    val complexity =
      if (joins >= 2 || up.contains("OVER (") || sql.count(_ == '(') > 4) "complex"
      else if (joins == 1 || up.contains("GROUP BY")) "moderate"
      else "simple"
    CostEstimate(sql, filtered, complexity)
  }
}
