package graft.core

import org.apache.spark.sql.types.StructField

/** Schema-evolution inspection: history, field-id-based diff, migration
  * generation, and compatibility checking (reference
  * schema_evolution.py:30-390). All comparisons are by stable field-id —
  * a rename keeps its id, so it is reported as a rename, never as
  * drop+add (schema_evolution.py:122-172).
  */
object SchemaEvolution {

  case class ColumnRef(fieldId: Long, name: String, typeName: String,
      required: Boolean)
  case class RenamedColumn(fieldId: Long, oldName: String, newName: String)
  case class TypeChange(fieldId: Long, name: String, oldType: String,
      newType: String)

  case class SchemaDiff(table: String, fromSchemaId: Int, toSchemaId: Int,
      addedColumns: List[ColumnRef], droppedColumns: List[ColumnRef],
      renamedColumns: List[RenamedColumn], typeChanges: List[TypeChange]) {
    def isEmpty: Boolean = addedColumns.isEmpty && droppedColumns.isEmpty &&
      renamedColumns.isEmpty && typeChanges.isEmpty
    /** Human summary, mirrored from schema_evolution.py:175-190. */
    def summary: String = {
      val parts = List(
        if (addedColumns.nonEmpty)
          Some(s"added ${addedColumns.map(_.name).mkString(", ")}") else None,
        if (droppedColumns.nonEmpty)
          Some(s"dropped ${droppedColumns.map(_.name).mkString(", ")}") else None,
        if (renamedColumns.nonEmpty)
          Some("renamed " + renamedColumns.map(c => s"${c.oldName}→${c.newName}")
            .mkString(", ")) else None,
        if (typeChanges.nonEmpty)
          Some("type changed " + typeChanges.map(c =>
            s"${c.name}: ${c.oldType}→${c.newType}").mkString(", ")) else None,
      ).flatten
      if (parts.isEmpty) "no changes" else parts.mkString("; ")
    }
  }

  case class HistoryEntry(schemaId: Int, snapshotId: Option[Long],
      timestampMs: Option[Long], fields: List[ColumnRef],
      isSchemaChange: Boolean, changeSummary: Option[String])

  case class MigrationStep(operation: String, columnName: String,
      columnType: Option[String] = None, newName: Option[String] = None)

  /** A proposed change for [[compatibility]]: op is add_column |
    * drop_column | rename_column. */
  case class ProposedChange(op: String, column: String,
      typeName: Option[String] = None, newName: Option[String] = None)

  case class CompatibilityReport(table: String, compatible: Boolean,
      warnings: List[String], breakingChanges: List[String]) {
    def message: String =
      s"Schema changes are ${if (compatible) "compatible" else "NOT compatible"} " +
        s"(${breakingChanges.size} breaking, ${warnings.size} warnings)"
  }

  private def cols(sv: SchemaVersion): List[ColumnRef] =
    sv.struct.fields.toList.map { f =>
      ColumnRef(TableMeta.fieldId(f).getOrElse(-1L), f.name,
        f.dataType.typeName, required = !f.nullable)
    }

  /** Field-id diff of two schema versions (schema_evolution.py:122-172). */
  def computeDiff(table: String, from: SchemaVersion, to: SchemaVersion): SchemaDiff = {
    val old = cols(from).map(c => c.fieldId -> c).toMap
    val neu = cols(to).map(c => c.fieldId -> c).toMap
    val added = (neu.keySet -- old.keySet).toList.sorted.map(neu)
    val dropped = (old.keySet -- neu.keySet).toList.sorted.map(old)
    val common = (old.keySet & neu.keySet).toList.sorted
    val renamed = common.flatMap { id =>
      if (old(id).name != neu(id).name)
        Some(RenamedColumn(id, old(id).name, neu(id).name)) else None
    }
    val typeChanges = common.flatMap { id =>
      if (old(id).typeName != neu(id).typeName)
        Some(TypeChange(id, neu(id).name, old(id).typeName, neu(id).typeName))
      else None
    }
    SchemaDiff(table, from.id, to.id, added, dropped, renamed, typeChanges)
  }

  /** Schema history across snapshots: one entry per distinct schema
    * version in snapshot order, each with the first snapshot that used it
    * and a change summary vs the previous version
    * (schema_evolution.py:30-120). A table with no snapshots yet yields
    * its current schema with no snapshot/timestamp. */
  def history(tbl: IceTable): List[HistoryEntry] = {
    val meta = tbl.meta
    val byId = meta.schemas.map(s => s.id -> s).toMap
    val snaps = tbl.snapshots.sortBy(_.timestampMs)
    val entries = snaps.foldLeft(List.empty[HistoryEntry]) { (acc, snap) =>
      byId.get(snap.schemaId) match {
        case Some(sv) if !acc.exists(_.schemaId == sv.id) =>
          val changeSummary = acc.lastOption.flatMap(prev =>
            byId.get(prev.schemaId).map(p =>
              computeDiff(meta.ident, p, sv).summary))
          acc :+ HistoryEntry(sv.id, Some(snap.id), Some(snap.timestampMs),
            cols(sv), isSchemaChange = acc.nonEmpty, changeSummary)
        case _ => acc
      }
    }
    if (entries.nonEmpty) entries
    else byId.get(meta.currentSchemaId).map(sv =>
      HistoryEntry(sv.id, None, None, cols(sv), isSchemaChange = false, None)).toList
  }

  /** Diff between the schemas of two snapshots; with no refs given,
    * compares the last two distinct schema versions in snapshot order
    * (schema_evolution.py:193-268; the reference ignores a single-sided
    * ref — here it resolves: from-only diffs against the current schema,
    * to-only against the version preceding `to`). Snapshot refs resolve
    * like time travel (id first, then ISO timestamp). */
  def diff(tbl: IceTable, fromSnapshot: Option[String] = None,
      toSnapshot: Option[String] = None): SchemaDiff = {
    val meta = tbl.meta
    val byId = meta.schemas.map(s => s.id -> s).toMap
    lazy val seen = tbl.snapshots.sortBy(_.timestampMs)
      .map(_.schemaId).foldLeft(List.empty[Int]) { (acc, sid) =>
        if (acc.lastOption.contains(sid)) acc else acc :+ sid
      }
    val (fromId, toId) = (fromSnapshot, toSnapshot) match {
      case (Some(f), Some(t)) =>
        (tbl.resolveRef(f).schemaId, tbl.resolveRef(t).schemaId)
      case (Some(f), None) =>
        (tbl.resolveRef(f).schemaId, meta.currentSchemaId)
      case (None, Some(t)) =>
        val toSid = tbl.resolveRef(t).schemaId
        val before = seen.takeWhile(_ != toSid)
        (before.lastOption.getOrElse(toSid), toSid)
      case (None, None) =>
        if (seen.size < 2) (meta.currentSchemaId, meta.currentSchemaId)
        else (seen(seen.size - 2), seen.last)
    }
    if (fromId == toId)
      SchemaDiff(meta.ident, fromId, toId, Nil, Nil, Nil, Nil)
    else computeDiff(meta.ident, byId(fromId), byId(toId))
  }

  /** alter_table steps that carry `from` to `to`
    * (schema_evolution.py:269-313). */
  def migration(tbl: IceTable, fromSnapshot: Option[String] = None,
      toSnapshot: Option[String] = None): List[MigrationStep] = {
    val d = diff(tbl, fromSnapshot, toSnapshot)
    d.addedColumns.map(c =>
      MigrationStep("add_column", c.name, columnType = Some(c.typeName))) ++
      d.droppedColumns.map(c => MigrationStep("drop_column", c.name)) ++
      d.renamedColumns.map(c =>
        MigrationStep("rename_column", c.oldName, newName = Some(c.newName)))
  }

  /** Backward-compatibility review of proposed changes
    * (schema_evolution.py:314-390): dropping a required column is
    * breaking; drops/renames of existing columns warn; adds of existing
    * names warn. */
  def compatibility(tbl: IceTable, changes: List[ProposedChange])
      : CompatibilityReport = {
    val existing: Map[String, StructField] =
      tbl.schema.fields.map(f => f.name -> f).toMap
    val results = changes.map { ch =>
      ch.op match {
        case "drop_column" => existing.get(ch.column) match {
          case Some(f) if !f.nullable =>
            Right(s"Dropping required column '${ch.column}' is a breaking change")
          case Some(_) =>
            Left(s"Dropping optional column '${ch.column}' — downstream consumers may depend on it")
          case None => Left(s"Column '${ch.column}' does not exist")
        }
        case "rename_column" =>
          if (existing.contains(ch.column))
            Left(s"Renaming '${ch.column}' to '${ch.newName.getOrElse("")}' may break downstream consumers")
          else Left(s"Column '${ch.column}' does not exist")
        case "add_column" =>
          if (existing.contains(ch.column))
            Left(s"Column '${ch.column}' already exists")
          else Left(s"ok: add '${ch.column}'")
        case other => Left(s"Unknown operation: $other")
      }
    }
    val warnings = results.collect { case Left(w) if !w.startsWith("ok:") => w }
    val breaking = results.collect { case Right(b) => b }
    CompatibilityReport(tbl.meta.ident, breaking.isEmpty, warnings, breaking)
  }
}
