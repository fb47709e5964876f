package graft

import java.nio.file.Path

import org.apache.spark.sql.SparkSession

import graft.core.Catalog
import graft.governance.{AuditLog, ValidationStore}

/** Facade tying the catalog to its metadata side-stores — the equivalent of
  * the reference's `~/.lakehouse/` layout (warehouse + one JSON store per
  * governance module, e.g. reference validation.py:23-38). All stores live
  * under `<warehouse>/_meta/`.
  */
class Lakehouse(val spark: SparkSession, val warehouseDir: String) {
  val catalog: Catalog = Catalog.open(spark, warehouseDir)

  def metaDir: Path = catalog.warehouse.resolve("_meta")

  val audit = new AuditLog(metaDir.resolve("audit.jsonl"))
  val validation = new ValidationStore(metaDir.resolve("validation.json"))

  lazy val dml = new graft.dml.Dml(this)
  lazy val cdc = new graft.analytics.Cdc(this)
  lazy val incremental = new graft.analytics.Incremental(this)
  lazy val profile = new graft.analytics.Profile(this)
  lazy val sampling = new graft.analytics.Sampling(this)
  lazy val dedup = new graft.analytics.Dedup(this)
  lazy val quality = new graft.analytics.Quality(this)
  lazy val engine = new graft.engine.QueryEngine(this)
  lazy val views = new graft.orchestration.Views(this)
  lazy val matviews = new graft.orchestration.MatViews(this)
  lazy val pipelines = new graft.orchestration.Pipelines(this)
  lazy val lineage = new graft.orchestration.Lineage(this)
  lazy val savedQueries = new graft.orchestration.SavedQueries(this)
  lazy val queryCache = new graft.orchestration.QueryCache(this)
  lazy val maintenance = new graft.orchestration.Maintenance(this)
  lazy val retention = new graft.orchestration.Retention(this)
  lazy val autoRefresh = new graft.orchestration.AutoRefresh(this)
  lazy val masking = new graft.governance.Masking(this)
  lazy val sla = new graft.governance.Sla(this)
  lazy val contracts = new graft.governance.Contracts(this)
  lazy val tagging = new graft.governance.Tagging(this)
  lazy val catalogMetadata = new graft.governance.CatalogMetadata(this)
  lazy val notifications = new graft.governance.Notifications(this)
  lazy val cloning = new graft.governance.Cloning(this)
  lazy val advisor = new graft.governance.Advisor(this)
  lazy val dashboard = new graft.governance.Dashboard(this)
  lazy val importExport = new graft.io.ImportExport(this)
  lazy val backup = new graft.io.Backup(this)
  lazy val formats = new graft.io.FormatResolver(this)

  /** `ALTER TABLE … RENAME TO` across the whole lakehouse: the catalog's
    * metadata move ([[graft.core.Catalog.renameTable]] — pins first, dir
    * move as the commit point) plus every ident-keyed governance and
    * orchestration store. Forward-looking state follows (contracts + their
    * registry/compliance, SLA policies, retention, validation rules,
    * lineage edges, clone records, tags/descriptions/bookmarks, column
    * metadata, notification handlers); HISTORICAL records (the audit log,
    * notification history) keep the names that were true when written. */
  def renameTable(oldIdent: String, newIdent: String): Unit = {
    // resolve the effective target ONCE (an unqualified target keeps the
    // source namespace — same rule as Catalog.renameTable) so the store
    // followers re-key onto the ident the catalog actually moved to
    val (ons, _) = Catalog.parseIdent(oldIdent)
    val target =
      if (newIdent.contains(".")) newIdent else s"$ons.$newIdent"
    val from = Catalog.canonicalIdent(oldIdent)
    val to = Catalog.canonicalIdent(target)
    // per-rename intent FILE (not one shared map): every write/remove is
    // a single atomic file op, so concurrent renames of different tables
    // (CLI + MCP server against one warehouse) can never lose or
    // resurrect each other's evidence through a read-modify-write race
    val intentPath = metaDir.resolve("rename-intents")
      .resolve(java.net.URLEncoder.encode(from, "UTF-8") + ".json")
    def intentMatches: Boolean =
      java.nio.file.Files.exists(intentPath) && (
        try graft.core.Jsons
          .readFile[graft.core.RenameIntent](intentPath).toIdent == to
        catch { case _: Exception => false })
    // RESUME contract: if the catalog move already committed (old gone,
    // target live) — e.g. a crash between the move and the store
    // followers — re-running the same rename skips the move and
    // re-applies only the (idempotent) store re-keys. POSITIVE EVIDENCE
    // of that prior move is required: either the catalog's in-dir
    // rename marker (crash mid-fixups) or this facade's own pending
    // intent (crash between catalog completion and the followers).
    // Without it, a mistyped old name against a live target would
    // "succeed" and re-key governance stores onto an unrelated table.
    val moveDone =
      !catalog.tableExists(oldIdent) && catalog.tableExists(target)
    val (nns, nt) = Catalog.parseIdent(target)
    val markerPath =
      catalog.tableDir(nns, nt).resolve(Catalog.RenameMarkerFile)
    def markerExists = java.nio.file.Files.exists(markerPath)
    // content match (this exact from->to) is only the KEEP criterion in
    // the failure path below; the gate and the dispatch key on marker
    // EXISTENCE, so mismatched (typo'd source against a mid-rename
    // target) and corrupt markers forward into Catalog.renameTable's own
    // loud, precise refusals instead of a misleading generic one here
    def markerMatches: Boolean = markerExists && (
      try {
        val p = graft.core.Jsons.readFile[graft.core.RenamePending](
          markerPath)
        p.fromIdent == from && p.toIdent == to
      } catch { case _: Exception => false })
    // refuse a certainly-failing rename BEFORE touching the intent file:
    // writing first and cleaning up in a catch would clobber a PENDING
    // intent for the same source with a different (valid) target
    require(catalog.tableExists(oldIdent) || moveDone,
      s"no such table: $from")
    if (moveDone)
      require(markerExists || intentMatches,
        s"refusing to resume a rename $from -> $to: the target exists " +
          "but neither a rename marker nor a pending rename intent " +
          "records that move — check the source table name")
    // intent lands BEFORE the catalog move so a crash at any later point
    // leaves evidence; cleared only after every follower re-keyed
    graft.core.Jsons.writeFile(intentPath,
      graft.core.RenameIntent(from, to))
    if (!moveDone || markerExists) {
      // fresh rename, or a resume that must first complete the catalog's
      // own crashed fixups (Catalog.renameTable's marker-driven path —
      // which also owns the mismatch/corrupt-marker refusals)
      try { catalog.renameTable(oldIdent, target); () }
      catch { case e: Throwable =>
        // a REFUSED/FAILED catalog step must not leave evidence that
        // would later legitimize "resuming" a rename that never
        // committed (once the old table is dropped, a stale intent would
        // re-key governance stores onto the unrelated target). Keep the
        // intent when OUR move demonstrably landed and is still
        // mid-fixups (its content-matching marker rides the moved dir) —
        // the catalog cannot throw an Exception after that marker clears
        // (post-clear pin release is best-effort by contract) — and on
        // FATAL errors (VM death mid-anything), where preserving resume
        // evidence is exactly what the restart needs.
        if (scala.util.control.NonFatal(e) && !markerMatches)
          java.nio.file.Files.deleteIfExists(intentPath)
        throw e
      }
    }
    contracts.renameTable(oldIdent, target)
    sla.renameTable(oldIdent, target)
    retention.renameTable(oldIdent, target)
    validation.renameTable(oldIdent, target)
    lineage.renameTable(oldIdent, target)
    cloning.renameTable(oldIdent, target)
    tagging.renameTable(oldIdent, target)
    catalogMetadata.renameTable(oldIdent, target)
    notifications.renameTable(oldIdent, target)
    audit.log(Catalog.canonicalIdent(target), "rename_table",
      Map("from" -> Catalog.canonicalIdent(oldIdent),
        "resumed" -> moveDone.toString))
    // every follower landed — retire this rename's own intent file
    java.nio.file.Files.deleteIfExists(intentPath)
    ()
  }
}

object Lakehouse {
  def open(spark: SparkSession, warehouseDir: String): Lakehouse =
    new Lakehouse(spark, warehouseDir)
}
