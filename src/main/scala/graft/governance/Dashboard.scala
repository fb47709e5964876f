package graft.governance

import graft.Lakehouse

case class DashboardTable(
    name: String,
    rows: Long,
    sizeBytes: Long,
    sizeDisplay: String,
    dataFiles: Int,
    health: String)

case class DashboardReport(
    storagePath: String,
    namespaces: List[String],
    totalTables: Int,
    totalSizeBytes: Long,
    totalSizeDisplay: String,
    tables: List[DashboardTable],
    recentActivity: List[AuditEntry],
    savedQueriesCount: Int,
    historyEntriesCount: Int)

/** Lakehouse-wide status rollup (reference dashboard.py:35-148): per-table
  * rows/size/files with a health indicator derived from file counts, orphan
  * files and stats staleness, plus recent audit activity and query-store
  * counts. Uses cached stats when fresh (stats cache, dashboard.py:80-90)
  * and falls back to snapshot metadata — never a full scan unless the table
  * has no stats and no snapshot metadata at all.
  */
class Dashboard(lh: Lakehouse) {

  /** Human-readable size (dashboard.py:9-18). */
  def formatSize(bytes: Long): String =
    if (bytes < 1024L) s"$bytes B"
    else if (bytes < 1024L * 1024) f"${bytes / 1024.0}%.1f KB"
    else if (bytes < 1024L * 1024 * 1024) f"${bytes / (1024.0 * 1024)}%.1f MB"
    else f"${bytes / (1024.0 * 1024 * 1024)}%.1f GB"

  /** Health precedence Stale > Orphans > Compact > Good
    * (dashboard.py:21-32). */
  def tableHealth(dataFiles: Int, orphanFiles: Int, isStale: Boolean): String =
    if (isStale) "Stale"
    else if (orphanFiles > 0) "Orphans"
    else if (dataFiles >= 10) "Compact"
    else "Good"

  def tableEntry(name: String): DashboardTable = {
    val tbl = lh.catalog.loadTable(name)
    val stale = lh.profile.isStatsStale(name)
    // cached stats only when FRESH; stale or absent falls back to snapshot
    // metadata (still no scan — row count comes from file metadata, an
    // improvement over the reference's to_arrow() fallback,
    // dashboard.py:110-116, which reads the whole table)
    val cached = lh.profile.cachedStats(name).filter(_ => !stale)
    val snap = tbl.currentSnapshot
    val dataFiles = cached.map(_.fileCount.toInt)
      .getOrElse(snap.map(_.files.size).getOrElse(0))
    val sizeBytes = cached.map(_.totalBytes)
      .getOrElse(snap.map(_.totalBytes).getOrElse(0L))
    val rows = cached.map(_.rowCount)
      .getOrElse(snap.map(_.totalRows).getOrElse(0L))
    val orphans = tbl.orphanFiles(delete = false).size
    DashboardTable(name, rows, sizeBytes, formatSize(sizeBytes), dataFiles,
      tableHealth(dataFiles, orphans, stale))
  }

  /** The full rollup (dashboard.py:35-148 get_dashboard). */
  def report(): DashboardReport = {
    val tables = lh.catalog.listTables("*").map(tableEntry)
    val total = tables.map(_.sizeBytes).sum
    DashboardReport(
      storagePath = lh.warehouseDir,
      namespaces = lh.catalog.listNamespaces(),
      totalTables = tables.size,
      totalSizeBytes = total,
      totalSizeDisplay = formatSize(total),
      tables = tables,
      recentActivity = lh.audit.entries().takeRight(5).reverse,
      savedQueriesCount = lh.savedQueries.list().size,
      historyEntriesCount = lh.savedQueries.history().size)
  }
}
