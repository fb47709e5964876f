package graft.orchestration

import java.nio.file.Files

import graft.Lakehouse
import graft.core.Jsons

case class MaintenancePolicy(
    table: String,
    compactFileThreshold: Int = 10,
    snapshotRetain: Int = 5,
    orphanCleanup: Boolean = true,
    // merge-on-read debt cap: reads pay ONE anti-join per live eq-delete
    // entry (and per position-delete file set), so an entry chain that
    // only ever grows would slowly poison every read plan. Compaction
    // absorbs all MoR deletes (overwrite from a deletes-applied read).
    eqDeleteEntryThreshold: Int = 5)

case class MaintenanceAction(table: String, action: String, detail: String)

/** Per-table maintenance policies: compact when file count ≥ threshold,
  * expire snapshots beyond retain, orphan cleanup (reference
  * maintenance.py:42-297). */
class Maintenance(lh: Lakehouse) {
  private def path = lh.metaDir.resolve("maintenance.json")

  private def load(): Map[String, MaintenancePolicy] =
    if (Files.exists(path)) Jsons.readFile[Map[String, MaintenancePolicy]](path)
    else Map.empty

  def setPolicy(p: MaintenancePolicy): Unit = synchronized {
    Jsons.writeFile(path, load() + (p.table -> p))
  }

  def policy(table: String): MaintenancePolicy =
    load().getOrElse(table, MaintenancePolicy(table))

  /** Drop a table's maintenance policy (falls back to defaults). */
  def removePolicy(table: String): Boolean = synchronized {
    val m = load()
    if (!m.contains(table)) false
    else { Jsons.writeFile(path, m - table); true }
  }

  /** Evaluate (and unless dryRun, execute) maintenance for one table. */
  def maintainTable(table: String, dryRun: Boolean = false): List[MaintenanceAction] = {
    val p = policy(table)
    val tbl = lh.catalog.loadTable(table)
    var actions = List.empty[MaintenanceAction]
    val files = tbl.currentSnapshot.map(_.files.size).getOrElse(0)
    val eqEntries = tbl.currentSnapshot.map(_.eqDeleteFiles.size).getOrElse(0)
    if (files >= p.compactFileThreshold) {
      if (!dryRun) tbl.compact(targetFiles = 1)
      actions :+= MaintenanceAction(table, "compact", s"$files files")
    } else if (eqEntries >= p.eqDeleteEntryThreshold) {
      // long eq-delete chain: compact to fold the anti-join chain back to
      // zero even when the file count alone wouldn't trigger
      if (!dryRun) tbl.compact(targetFiles = math.max(files, 1))
      actions :+= MaintenanceAction(table, "compact",
        s"$eqEntries eq-delete entries")
    }
    val snaps = tbl.snapshots.size
    if (snaps > p.snapshotRetain) {
      val expired = if (dryRun) Nil else tbl.expireSnapshots(retainLast = Some(p.snapshotRetain))
      actions :+= MaintenanceAction(table, "expire_snapshots",
        if (dryRun) s"$snaps snapshots > ${p.snapshotRetain}" else s"expired ${expired.size}")
    }
    if (p.orphanCleanup) {
      val orphans = tbl.orphanFiles(delete = !dryRun)
      if (orphans.nonEmpty)
        actions :+= MaintenanceAction(table, "orphan_cleanup", s"${orphans.size} files")
    }
    if (!dryRun && actions.nonEmpty)
      lh.audit.log(table, "maintenance", Map("actions" -> actions.map(_.action).mkString(",")))
    actions
  }

  /** All-tables loop (maintenance.py run_maintenance). */
  def runAll(dryRun: Boolean = false): List[MaintenanceAction] =
    lh.catalog.listTables("*").flatMap(maintainTable(_, dryRun))
}

case class RetentionPolicy(table: String, maxAgeHours: Option[Double] = None,
    maxSnapshots: Option[Int] = None, minKeep: Int = 1)

/** Snapshot retention policies (reference retention.py:33-259). */
class Retention(lh: Lakehouse) {
  private def path = lh.metaDir.resolve("retention.json")

  private def load(): Map[String, RetentionPolicy] =
    if (Files.exists(path)) Jsons.readFile[Map[String, RetentionPolicy]](path)
    else Map.empty

  def setPolicy(p: RetentionPolicy): Unit = synchronized {
    require(p.minKeep >= 1, "minKeep must be >= 1")
    Jsons.writeFile(path, load() + (p.table -> p))
  }

  def policy(table: String): Option[RetentionPolicy] = load().get(table)

  /** Drop a table's retention policy (reference retention remove). */
  def removePolicy(table: String): Boolean = synchronized {
    val m = load()
    if (!m.contains(table)) false
    else { Jsons.writeFile(path, m - table); true }
  }

  /** Follow a [[graft.core.Catalog.renameTable]]. */
  private[graft] def renameTable(from: String, to: String): Unit =
    synchronized {
      import graft.core.Catalog.{canonicalIdent, rekeyStore}
      val t = canonicalIdent(to)
      Jsons.writeFile(path,
        rekeyStore(load(), from, to)(_.copy(table = t)))
    }

  /** Dry-run returns would-expire ids; otherwise expires them
    * (retention.py:228-231 delegates to retain_last semantics). */
  def evaluate(table: String, dryRun: Boolean = true): List[Long] = {
    val p = policy(table).getOrElse(return Nil)
    val tbl = lh.catalog.loadTable(table)
    val snaps = tbl.snapshots
    if (snaps.isEmpty) return Nil
    val now = System.currentTimeMillis()
    val byAge = p.maxAgeHours.map(h => snaps.filter(s =>
      (now - s.timestampMs) / 3600000.0 > h).map(_.id).toSet).getOrElse(Set.empty)
    val byCount = p.maxSnapshots.filter(snaps.size > _)
      .map(n => snaps.sortBy(-_.id).drop(n).map(_.id).toSet).getOrElse(Set.empty)
    val protectedIds = snaps.sortBy(-_.id).take(math.max(p.minKeep, 1)).map(_.id).toSet
    val toExpire = (byAge ++ byCount -- protectedIds - snaps.last.id).toList.sorted
    if (!dryRun && toExpire.nonEmpty) {
      val retain = snaps.size - toExpire.size
      tbl.expireSnapshots(retainLast = Some(retain))
      lh.audit.log(table, "retention", Map("expired" -> toExpire.size.toString))
    }
    toExpire
  }
}

case class RefreshStep(kind: String, name: String, depth: Int, status: String)

/** Downstream refresh cascade over the lineage DAG (reference
  * auto_refresh.py): invalidate caches → refresh matviews → rerun pipelines,
  * ordered by lineage depth, depth-capped. History capped at 100. */
case class AutoRefreshConfig(enabled: Boolean = true, cascadeDepth: Int = 3,
    refreshMatviews: Boolean = true, rerunPipelines: Boolean = true,
    invalidateCaches: Boolean = true)

class AutoRefresh(lh: Lakehouse) {
  val MaxHistory = 100
  private def histPath = lh.metaDir.resolve("auto_refresh_history.json")
  private def cfgPath = lh.metaDir.resolve("auto_refresh_config.json")

  private def loadCfg(): Map[String, AutoRefreshConfig] =
    if (java.nio.file.Files.exists(cfgPath))
      Jsons.readFile[Map[String, AutoRefreshConfig]](cfgPath)
    else Map.empty

  /** Per-table cascade config (reference auto_refresh.py set_auto_refresh). */
  def setConfig(table: String, cfg: AutoRefreshConfig): Unit = synchronized {
    Jsons.writeFile(cfgPath, loadCfg() + (table -> cfg))
  }

  def config(table: String): AutoRefreshConfig =
    loadCfg().getOrElse(table, AutoRefreshConfig())

  /** Plan filtered by the table's cascade config: disabled → empty plan;
    * step kinds and depth follow the config. */
  def configuredPlan(table: String): List[RefreshStep] = {
    val cfg = config(table)
    if (!cfg.enabled) Nil
    else plan(table, cfg.cascadeDepth).filter(s => s.kind match {
      case "cache_invalidate" => cfg.invalidateCaches
      case "refresh_matview" => cfg.refreshMatviews
      case "run_pipeline" => cfg.rerunPipelines
    })
  }

  def plan(table: String, maxDepth: Int = 3): List[RefreshStep] = {
    val downstream = lh.lineage.downstream(table, maxDepth).toList.sortBy(_._2)
    val cacheSteps = List(RefreshStep("cache_invalidate", table, 0, "planned"))
    val mvByBacking = lh.matviews.list().map(m => m.backingTable -> m.name).toMap
    // pipelines indexed by the table each step actually targets
    val pipelineByTarget: Map[String, String] = (for {
      p <- lh.pipelines.list()
      s <- p.steps
      tt <- s.targetTable
    } yield (if (tt.contains(".")) tt else s"default.$tt") -> p.name).toMap
    val downstreamSteps = downstream.flatMap { case (t, d) =>
      mvByBacking.get(t).map(mv => RefreshStep("refresh_matview", mv, d, "planned"))
        .orElse(pipelineByTarget.get(t)
          .map(p => RefreshStep("run_pipeline", p, d, "planned")))
    }
    // one step per (kind, name): keep the shallowest occurrence
    val deduped = downstreamSteps.groupBy(s => (s.kind, s.name)).values
      .map(_.minBy(_.depth)).toList.sortBy(_.depth)
    cacheSteps ++ deduped
  }

  /** Execute the plan best-effort (auto_refresh.py trigger). */
  def trigger(table: String, maxDepth: Int = 3): List[RefreshStep] = {
    val steps = plan(table, maxDepth).map { s =>
      try {
        s.kind match {
          case "cache_invalidate" => lh.queryCache.invalidateTable(s.name)
          case "refresh_matview" => lh.matviews.refresh(s.name)
          case "run_pipeline" => lh.pipelines.run(s.name)
        }
        s.copy(status = "ok")
      } catch { case e: Exception => s.copy(status = s"failed: ${e.getMessage}") }
    }
    synchronized {
      val h = history() :+ steps
      Jsons.writeFile(histPath, h.takeRight(MaxHistory))
    }
    steps
  }

  def history(): List[List[RefreshStep]] =
    if (Files.exists(histPath)) Jsons.readFile[List[List[RefreshStep]]](histPath)
    else Nil
}
