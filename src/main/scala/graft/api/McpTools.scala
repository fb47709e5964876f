package graft.api

import org.apache.spark.sql.DataFrame
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.Lakehouse
import graft.core.SchemaEvolution
import graft.dml.BatchOp
import graft.governance.{Contract, MaskingPolicy, NotificationHandler, SlaPolicy, ValidationRule}
import graft.orchestration.{AutoRefreshConfig, MaintenancePolicy, PipelineStep, RetentionPolicy}

/** One MCP tool: name + description + JSON-Schema input + handler.
  * Handlers return the tool's text payload; they throw on bad input and
  * the server wraps the message into an isError result
  * (reference server.py:2353-2360). */
case class ToolDef(name: String, description: String, inputSchema: JObject,
    handler: (Lakehouse, JObject) => String)

/** The tool registry: 155 tools mirroring the reference MCP server 1:1
  * (server.py:49-2350; names, argument names and semantics follow the
  * reference) plus the `graft_`-prefixed beyond-reference training-data
  * tools. Each handler is a thin dispatch into the same engine modules the
  * CLI uses, so both surfaces stay behavior-identical. */
object McpTools {
  private implicit val formats: Formats = DefaultFormats

  // ---- JSON-Schema builders ----------------------------------------------

  private def S(desc: String): JValue =
    JObject("type" -> JString("string"), "description" -> JString(desc))
  private def I(desc: String): JValue =
    JObject("type" -> JString("integer"), "description" -> JString(desc))
  private def N(desc: String): JValue =
    JObject("type" -> JString("number"), "description" -> JString(desc))
  private def B(desc: String): JValue =
    JObject("type" -> JString("boolean"), "description" -> JString(desc))
  private def A(desc: String): JValue =
    JObject("type" -> JString("array"), "description" -> JString(desc))
  private def O(desc: String): JValue =
    JObject("type" -> JString("object"), "description" -> JString(desc))
  private def sch(required: List[String], props: (String, JValue)*): JObject =
    JObject("type" -> JString("object"),
      "properties" -> JObject(props.toList),
      "required" -> JArray(required.map(JString(_))))

  // ---- argument extractors ------------------------------------------------

  private def str(a: JObject, k: String): String = strOpt(a, k).getOrElse(
    throw new IllegalArgumentException(s"'$k' parameter is required"))
  private def strOpt(a: JObject, k: String): Option[String] =
    (a \ k) match {
      case JString(s) => Some(s)
      case JInt(i) => Some(i.toString)
      case JLong(l) => Some(l.toString)
      case _ => None
    }
  private def intOpt(a: JObject, k: String): Option[Int] = (a \ k).extractOpt[Int]
  private def longOpt(a: JObject, k: String): Option[Long] = (a \ k).extractOpt[Long]
  private def dblOpt(a: JObject, k: String): Option[Double] = (a \ k).extractOpt[Double]
  private def boolOpt(a: JObject, k: String): Option[Boolean] = (a \ k).extractOpt[Boolean]
  private def seqStr(a: JObject, k: String): Seq[String] = (a \ k) match {
    case JArray(xs) => xs.flatMap(_.extractOpt[String])
    case JString(s) => s.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    case _ => Nil
  }
  private def rowsOf(a: JObject, k: String): Seq[Map[String, Any]] =
    (a \ k).values match {
      case l: List[_] => l.map(_.asInstanceOf[Map[String, Any]])
      case m: Map[_, _] => Seq(m.asInstanceOf[Map[String, Any]])
      case _ => throw new IllegalArgumentException(s"'$k' must be rows")
    }
  private def rowOf(a: JObject, k: String): Map[String, Any] =
    (a \ k).values match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => throw new IllegalArgumentException(s"'$k' must be an object")
    }
  private def maxRows(a: JObject): Int = intOpt(a, "max_rows").getOrElse(1000)

  // ---- rendering ----------------------------------------------------------

  private def jval(v: Any): JValue = v match {
    case null => JNull
    case j: JValue => j
    case s: String => JString(s)
    case i: Int => JInt(BigInt(i))
    case l: Long => JLong(l)
    case bi: BigInt => JInt(bi)
    case d: Double => JDouble(d)
    case f: Float => JDouble(f.toDouble)
    case b: Boolean => JBool(b)
    case o: Option[_] => o.map(jval).getOrElse(JNull)
    case m: Map[_, _] => JObject(m.toList.map { case (k, x) => k.toString -> jval(x) })
    case (x, y) => JArray(List(jval(x), jval(y)))
    case (x, y, z) => JArray(List(jval(x), jval(y), jval(z)))
    case s: Iterable[_] => JArray(s.toList.map(jval))
    case s: Array[_] => JArray(s.toList.map(jval))
    case p: Product => Extraction.decompose(p)
    case other => JString(String.valueOf(other))
  }
  private def render(v: Any): String =
    JsonMethods.pretty(JsonMethods.render(jval(v)))
  private def df(d: DataFrame, n: Int): String = {
    val rows = d.limit(n).toJSON.collect()
    if (rows.isEmpty) "(no rows)" else rows.mkString("\n")
  }

  // ---- query + catalog (server.py query/list_tables/describe/...) --------

  private val queryTools = List(
    ToolDef("query",
      "Execute a SQL query against the lakehouse. Supports time travel via as_of + table_name.",
      sch(List("sql"), "sql" -> S("SQL query to execute"),
        "max_rows" -> I("Maximum rows to return (default 1000)"),
        "as_of" -> S("ISO timestamp or snapshot ID for time travel"),
        "table_name" -> S("Table for time travel (required with as_of)")),
      (lh, a) => strOpt(a, "as_of") match {
        case Some(ref) => df(lh.engine.executeAsOf(str(a, "table_name"),
          str(a, "sql"), ref, maxRows(a)), maxRows(a))
        case None => df(lh.engine.execute(str(a, "sql"), maxRows(a)), maxRows(a))
      }),
    ToolDef("query_vortex",
      "Execute a SQL query reading the table's configured storage profile (vortex label = zstd parquet profile; no JVM Vortex exists — documented divergence).",
      sch(List("sql"), "sql" -> S("SQL query"), "max_rows" -> I("Row cap")),
      (lh, a) => df(lh.engine.execute(str(a, "sql"), maxRows(a)), maxRows(a))),
    ToolDef("list_snapshots",
      "List snapshots for a table: ids, timestamps, operations, row counts.",
      sch(List("table_name"), "table_name" -> S("Table name")),
      (lh, a) => lh.catalog.loadTable(str(a, "table_name")).snapshots.map(s =>
        s"${s.id}\t${java.time.Instant.ofEpochMilli(s.timestampMs)}\t${s.operation}" +
          s"\trows=${s.totalRows}\tfiles=${s.files.size}").mkString("\n")),
    ToolDef("snapshot_diff",
      "Rows added/removed between two snapshots of a table.",
      sch(List("table_name"), "table_name" -> S("Table name"),
        "from_snapshot" -> S("Older snapshot id or ISO timestamp"),
        "to_snapshot" -> S("Newer snapshot id (default current)")),
      (lh, a) => {
        val (added, removed) = lh.cdc.snapshotDiff(str(a, "table_name"),
          strOpt(a, "from_snapshot"), strOpt(a, "to_snapshot"))
        s"added:\n${df(added, 100)}\nremoved:\n${df(removed, 100)}"
      }),
    ToolDef("list_tables", "List tables, optionally per namespace.",
      sch(Nil, "namespace" -> S("Namespace (default all)")),
      (lh, a) => lh.catalog.listTables(strOpt(a, "namespace").getOrElse("*"))
        .mkString("\n")),
    ToolDef("describe_table", "Schema with field ids, partition spec, snapshot count.",
      sch(List("table_name"), "table_name" -> S("Table name")),
      (lh, a) => {
        val tbl = lh.catalog.loadTable(str(a, "table_name"))
        val fields = tbl.schema.fields.map(f =>
          s"${f.name}\t${f.dataType.typeName}\tid=${graft.core.TableMeta.fieldId(f).getOrElse(-1L)}")
        (fields :+ s"partitions: ${tbl.meta.partitionSpec.mkString(", ")}" :+
          s"snapshots: ${tbl.snapshots.size}").mkString("\n")
      }),
    ToolDef("refresh", "Re-register catalog tables as Spark views.",
      sch(Nil), (lh, _) => { lh.engine.refresh(); "Table data refreshed successfully." }),
    ToolDef("create_table",
      "Create a table from typed columns, optionally partitioned.",
      sch(List("table_name", "columns"), "table_name" -> S("Table name"),
        "columns" -> A("Array of {name, type}"),
        "partition_by" -> A("Partition transform specs")),
      (lh, a) => {
        val cols = rowsOf(a, "columns").map(m =>
          (m("name").toString, m("type").toString))
        lh.catalog.createTable(str(a, "table_name"), cols,
          seqStr(a, "partition_by"), Map.empty)
        s"created ${str(a, "table_name")}"
      }),
    ToolDef("get_partitions", "Partition values present in the table.",
      sch(List("table_name"), "table_name" -> S("Table name")),
      (lh, a) => lh.catalog.loadTable(str(a, "table_name"))
        .partitionStats.keys.toList.sorted.mkString("\n")),
    ToolDef("get_partition_stats", "Files/rows/bytes per partition.",
      sch(List("table_name"), "table_name" -> S("Table name")),
      (lh, a) => lh.catalog.loadTable(str(a, "table_name"))
        .partitionStats.toList.sortBy(_._1).map { case (p, (f, r, b)) =>
          s"$p\tfiles=$f\trows=$r\tbytes=$b" }.mkString("\n")),
    ToolDef("list_namespaces", "List namespaces.", sch(Nil),
      (lh, _) => lh.catalog.listNamespaces().mkString("\n")),
    ToolDef("create_namespace", "Create a namespace.",
      sch(List("namespace"), "namespace" -> S("Namespace"),
        "properties" -> O("Namespace properties")),
      (lh, a) => {
        lh.catalog.createNamespace(str(a, "namespace"),
          (a \ "properties").extractOpt[Map[String, String]].getOrElse(Map.empty))
        s"created namespace ${str(a, "namespace")}"
      }),
    ToolDef("drop_namespace", "Drop an empty namespace.",
      sch(List("namespace"), "namespace" -> S("Namespace")),
      (lh, a) => { lh.catalog.dropNamespace(str(a, "namespace")); "dropped" }),
    ToolDef("get_namespace_properties", "Properties of a namespace.",
      sch(List("namespace"), "namespace" -> S("Namespace")),
      (lh, a) => render(lh.catalog.namespaceProperties(str(a, "namespace")))),
    ToolDef("set_table_property", "Set a table property.",
      sch(List("table_name", "key", "value"), "table_name" -> S("Table"),
        "key" -> S("Property key"), "value" -> S("Property value")),
      (lh, a) => {
        lh.catalog.loadTable(str(a, "table_name"))
          .setProperty(str(a, "key"), str(a, "value"))
        "property set"
      }),
  )

  // ---- dml + snapshots ----------------------------------------------------

  private val dmlTools = List(
    ToolDef("insert", "Insert rows (validated + coerced to the table schema).",
      sch(List("table_name", "rows"), "table_name" -> S("Table"),
        "rows" -> A("Array of row objects")),
      (lh, a) => s"inserted ${lh.dml.insertRows(str(a, "table_name"), rowsOf(a, "rows"))}"),
    ToolDef("update", "Update rows matching a SQL filter.",
      sch(List("table_name", "filter", "set"), "table_name" -> S("Table"),
        "filter" -> S("SQL boolean filter"), "set" -> O("column -> new value")),
      (lh, a) => s"updated ${lh.dml.update(str(a, "table_name"),
        str(a, "filter"), rowOf(a, "set"))}"),
    ToolDef("delete", "Delete rows matching a SQL filter.",
      sch(List("table_name", "filter"), "table_name" -> S("Table"),
        "filter" -> S("SQL boolean filter")),
      (lh, a) => s"deleted ${lh.dml.delete(str(a, "table_name"), str(a, "filter"))}"),
    ToolDef("upsert", "Upsert rows by key columns.",
      sch(List("table_name", "rows", "key_columns"), "table_name" -> S("Table"),
        "rows" -> A("Array of row objects"), "key_columns" -> A("Match keys")),
      (lh, a) => {
        val r = lh.dml.upsertRows(str(a, "table_name"), rowsOf(a, "rows"),
          seqStr(a, "key_columns"))
        s"inserted=${r.inserted} updated=${r.updated}"
      }),
    ToolDef("batch", "Execute a batch of DML ops, stop-on-failure.",
      sch(List("operations"), "operations" -> A("Array of {op, table, rows?, filter?, set?, keys?}")),
      (lh, a) => {
        val ops = rowsOf(a, "operations").map(m => BatchOp(
          m("op").toString, m("table").toString,
          m.get("rows").map(_.asInstanceOf[List[Map[String, Any]]].toSeq).getOrElse(Nil),
          m.getOrElse("filter", "").toString,
          m.get("set").map(_.asInstanceOf[Map[String, Any]]).getOrElse(Map.empty),
          m.get("keys").map(_.asInstanceOf[List[String]].toSeq).getOrElse(Nil)))
        lh.dml.executeBatch(ops).map(r =>
          s"${r.op} ${r.table}: ${r.status} count=${r.count} ${r.message}")
          .mkString("\n")
      }),
    ToolDef("alter_table",
      "Schema evolution: add_column, drop_column or rename_column.",
      sch(List("table_name", "operation"), "table_name" -> S("Table"),
        "operation" -> S("add_column | drop_column | rename_column"),
        "column" -> S("Column name"), "type" -> S("Type for add_column"),
        "new_name" -> S("New name for rename_column")),
      (lh, a) => {
        val tbl = lh.catalog.loadTable(str(a, "table_name"))
        str(a, "operation") match {
          case "add_column" =>
            tbl.addColumn(str(a, "column"), str(a, "type"))
            s"added ${str(a, "column")}"
          case "drop_column" =>
            tbl.dropColumn(str(a, "column")); s"dropped ${str(a, "column")}"
          case "rename_column" =>
            tbl.renameColumn(str(a, "column"), str(a, "new_name"))
            s"renamed ${str(a, "column")} -> ${str(a, "new_name")}"
          case other => throw new IllegalArgumentException(s"unknown operation: $other")
        }
      }),
    ToolDef("rollback", "Roll back a table to a snapshot (new snapshot, zero-copy).",
      sch(List("table_name", "snapshot"), "table_name" -> S("Table"),
        "snapshot" -> S("Snapshot id or ISO timestamp")),
      (lh, a) => s"rolled back to snapshot ${lh.catalog
        .loadTable(str(a, "table_name")).rollbackTo(str(a, "snapshot")).id}"),
    ToolDef("expire_snapshots", "Expire old snapshots (never the current one).",
      sch(List("table_name"), "table_name" -> S("Table"),
        "older_than" -> S("ISO timestamp or duration like 30d/24h/5m"),
        "retain_last" -> I("Always keep the N most recent")),
      (lh, a) => s"expired ${lh.catalog.loadTable(str(a, "table_name"))
        .expireSnapshots(strOpt(a, "older_than"), intOpt(a, "retain_last"))
        .mkString(", ")}"),
  )

  // ---- io + formats -------------------------------------------------------

  private val ioTools = List(
    ToolDef("import_file", "Import csv/tsv/json/ndjson/parquet into a table.",
      sch(List("path", "table_name"), "path" -> S("Source file"),
        "table_name" -> S("Target table"),
        "if_exists" -> S("fail | append | replace (default fail)")),
      (lh, a) => s"imported ${lh.importExport.importFile(str(a, "path"),
        str(a, "table_name"), strOpt(a, "if_exists").getOrElse("fail"))}"),
    ToolDef("export_table", "Export a table to csv/json/parquet with filter/columns/limit.",
      sch(List("table_name", "path"), "table_name" -> S("Table"),
        "path" -> S("Target path"), "format" -> S("csv | json | parquet"),
        "where" -> S("SQL filter"), "columns" -> A("Columns to keep"),
        "limit" -> I("Row cap")),
      (lh, a) => s"exported ${lh.importExport.exportTable(str(a, "table_name"),
        str(a, "path"), strOpt(a, "format").getOrElse("csv"), strOpt(a, "where"),
        seqStr(a, "columns"), intOpt(a, "limit"))}"),
    ToolDef("backup_table", "Backup a table to a tar.gz with sha256 manifest.",
      sch(List("table_name"), "table_name" -> S("Table"),
        "target_path" -> S("Archive path (default warehouse backups dir)")),
      (lh, a) => {
        val table = str(a, "table_name")
        val target = strOpt(a, "target_path").getOrElse(
          lh.backup.backupsDir.resolve(
            s"${table.replace('.', '_')}-${System.currentTimeMillis()}.tar.gz").toString)
        s"backed up to $target, sha256=${lh.backup.backupTable(table, target).sha256}"
      }),
    ToolDef("restore_table", "Restore a backup archive into a table.",
      sch(List("archive_path", "table_name"), "archive_path" -> S("tar.gz path"),
        "table_name" -> S("Target table"), "overwrite" -> B("Allow overwrite")),
      (lh, a) => s"restored ${lh.backup.restoreTable(str(a, "archive_path"),
        str(a, "table_name"), boolOpt(a, "overwrite").getOrElse(false))} rows"),
    ToolDef("list_backups", "List backup archives with manifests.",
      sch(Nil, "backup_dir" -> S("Directory (default warehouse backups dir)")),
      (lh, a) => {
        val bs = lh.backup.listBackups(strOpt(a, "backup_dir"))
        if (bs.isEmpty) "No backups found."
        else bs.map { case (f, m, sz) =>
          s"$f\ttable=${m.map(_.table).getOrElse("?")}\trows=${m.map(_.rowCount).getOrElse(-1L)}\tbytes=$sz"
        }.mkString("\n")
      }),
    ToolDef("verify_backup", "Re-hash a backup archive against its manifest.",
      sch(List("archive_path"), "archive_path" -> S("tar.gz path")),
      (lh, a) => if (lh.backup.verifyBackup(str(a, "archive_path"))) "OK" else "CORRUPT"),
    ToolDef("convert_format", "Convert a table's storage profile and rewrite its data.",
      sch(List("table_name", "format"), "table_name" -> S("Table"),
        "format" -> S("parquet | vortex (zstd parquet profile)")),
      (lh, a) => s"converted, rewrote ${lh.formats.convertTable(
        str(a, "table_name"), str(a, "format"))} rows"),
    ToolDef("get_format_config", "Resolved storage format for a table.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => lh.formats.resolve(str(a, "table_name"))),
    ToolDef("set_format_config", "Set global or per-table default format.",
      sch(List("format"), "format" -> S("parquet | vortex"),
        "table_name" -> S("Table (omit for global)")),
      (lh, a) => {
        strOpt(a, "table_name") match {
          case Some(t) => lh.formats.setTableFormat(t, str(a, "format"))
          case None => lh.formats.setGlobalFormat(str(a, "format"))
        }
        "format set"
      }),
  )

  // ---- profiling + stats + schema evolution ------------------------------

  private val statsTools = List(
    ToolDef("profile_table", "Single-pass column profile: nulls, distincts, min/max/mean, top values.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => render(lh.profile.profileTable(str(a, "table_name")))),
    ToolDef("get_table_stats", "Cached stats + staleness for a table.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => {
        val t = str(a, "table_name")
        val s = lh.profile.cachedStats(t).getOrElse(lh.profile.computeStats(t))
        render(s) + s"\nstale: ${lh.profile.isStatsStale(t)}"
      }),
    ToolDef("refresh_table_stats", "Recompute and cache stats for a table.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => render(lh.profile.computeStats(str(a, "table_name")))),
    ToolDef("get_all_stats", "All cached table stats.",
      sch(Nil), (lh, _) => {
        val all = lh.profile.allCachedStats()
        if (all.isEmpty) "No cached stats. Use refresh_table_stats to compute."
        else all.toList.sortBy(_._1).map { case (t, s) =>
          s"$t: ${s.rowCount} rows, ${s.fileCount} files, ${s.totalBytes} bytes, ${s.snapshotCount} snapshots"
        }.mkString("\n")
      }),
    ToolDef("schema_history", "Distinct schema versions in snapshot order with change summaries.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => render(SchemaEvolution.history(
        lh.catalog.loadTable(str(a, "table_name"))))),
    ToolDef("schema_diff", "Field-id schema diff between two snapshots (default last two versions).",
      sch(List("table_name"), "table_name" -> S("Table"),
        "from_snapshot" -> S("Older snapshot id/timestamp"),
        "to_snapshot" -> S("Newer snapshot id/timestamp")),
      (lh, a) => {
        val d = SchemaEvolution.diff(lh.catalog.loadTable(str(a, "table_name")),
          strOpt(a, "from_snapshot"), strOpt(a, "to_snapshot"))
        render(d) + s"\nsummary: ${d.summary}"
      }),
    ToolDef("schema_migration", "alter_table steps carrying one schema version to another.",
      sch(List("table_name"), "table_name" -> S("Table"),
        "from_snapshot" -> S("Older snapshot"), "to_snapshot" -> S("Newer snapshot")),
      (lh, a) => render(SchemaEvolution.migration(
        lh.catalog.loadTable(str(a, "table_name")),
        strOpt(a, "from_snapshot"), strOpt(a, "to_snapshot")))),
    ToolDef("schema_compatibility", "Check proposed changes for breaking impact.",
      sch(List("table_name", "changes"), "table_name" -> S("Table"),
        "changes" -> A("Array of {op, column, type?, new_name?}")),
      (lh, a) => {
        val changes = rowsOf(a, "changes").map(m => SchemaEvolution.ProposedChange(
          m("op").toString, m("column").toString,
          m.get("type").map(_.toString), m.get("new_name").map(_.toString)))
        val r = SchemaEvolution.compatibility(
          lh.catalog.loadTable(str(a, "table_name")), changes.toList)
        render(r) + s"\n${r.message}"
      }),
  )

  // ---- saved queries + cache + advisor -----------------------------------

  private val queryMgmtTools = List(
    ToolDef("save_query", "Save a named query.",
      sch(List("name", "sql"), "name" -> S("Query name"), "sql" -> S("SQL"),
        "description" -> S("Description")),
      (lh, a) => { lh.savedQueries.save(str(a, "name"), str(a, "sql"),
        strOpt(a, "description").getOrElse("")); "saved" }),
    ToolDef("list_saved_queries", "List saved queries.", sch(Nil),
      (lh, _) => lh.savedQueries.list().map(q => s"${q.name}: ${q.sql}").mkString("\n")),
    ToolDef("run_saved_query", "Run a saved query.",
      sch(List("name"), "name" -> S("Query name"), "max_rows" -> I("Row cap")),
      (lh, a) => df(lh.savedQueries.runSaved(str(a, "name"), maxRows(a)), maxRows(a))),
    ToolDef("delete_saved_query", "Delete a saved query.",
      sch(List("name"), "name" -> S("Query name")),
      (lh, a) => { lh.savedQueries.drop(str(a, "name")); "deleted" }),
    ToolDef("get_query_history", "Recent query history (sql, rows, duration).",
      sch(Nil, "limit" -> I("Max entries (default 100)")),
      (lh, a) => lh.savedQueries.history()
        .takeRight(intOpt(a, "limit").getOrElse(100))
        .map(h => f"${h.sql}\trows=${h.rows}\t${h.durationSec}%.3fs").mkString("\n")),
    ToolDef("clear_query_history", "Clear the query history.", sch(Nil),
      (lh, _) => s"cleared ${lh.savedQueries.clearHistory()} entries"),
    ToolDef("get_cache_stats", "Query-cache hits/misses/entries.", sch(Nil),
      (lh, _) => { val s = lh.queryCache.stats
        s"hits=${s.hits} misses=${s.misses} entries=${s.entries}" }),
    ToolDef("list_cached_queries", "Cached queries, most recently used first.",
      sch(Nil), (lh, _) => lh.queryCache.entries()
        .map(e => s"${e.key.take(12)}  rows=${e.rows.size}  ${e.sql}").mkString("\n")),
    ToolDef("invalidate_cache", "Invalidate cache entries for a table, or all.",
      sch(Nil, "table_name" -> S("Table (omit for all)")),
      (lh, a) => strOpt(a, "table_name") match {
        case Some(t) => s"invalidated ${lh.queryCache.invalidateTable(t)} entries"
        case None => { lh.queryCache.invalidateAll(); "cache cleared" }
      }),
    ToolDef("set_cache_policy", "Per-table cache policy: enable/disable + TTL.",
      sch(List("table_name"), "table_name" -> S("Table"),
        "enabled" -> B("Cache enabled (default true)"),
        "ttl_seconds" -> I("Custom TTL")),
      (lh, a) => render(lh.queryCache.setPolicy(str(a, "table_name"),
        boolOpt(a, "enabled").getOrElse(true),
        longOpt(a, "ttl_seconds")))),
    ToolDef("analyze_query_patterns", "Slow and repeated queries from history.",
      sch(Nil), (lh, _) => {
        val slow = lh.advisor.slowQueries().map { case (s, d) => f"  $d%.3fs $s" }
        val rep = lh.advisor.repeatedQueries().map { case (s, n) => s"  ${n}x $s" }
        (List("slow queries:") ++ slow ++ List("repeated queries:") ++ rep).mkString("\n")
      }),
    ToolDef("suggest_optimizations", "Partition + materialization suggestions for a table.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => {
        val parts = lh.advisor.suggestPartitions(str(a, "table_name"))
          .map(s => f"partition ${s.column}: distinct=${s.distinct} benefit=${s.benefit}%.3f")
        val mats = lh.advisor.suggestMaterializations()
          .map(s => s"materialize: ${s.sql} (count=${s.occurrences})")
        (parts ++ mats).mkString("\n")
      }),
    ToolDef("optimization_report", "Full advisor report over all tables.",
      sch(Nil), (lh, _) => {
        val parts = lh.catalog.listTables("*").flatMap(t =>
          lh.advisor.suggestPartitions(t).map(s =>
            f"  $t.${s.column}: benefit=${s.benefit}%.3f"))
        val mats = lh.advisor.suggestMaterializations()
          .map(s => s"  ${s.sql} (count=${s.occurrences})")
        (List("partition suggestions:") ++ parts ++
          List("materialization suggestions:") ++ mats).mkString("\n")
      }),
    ToolDef("estimate_query_cost", "Row estimate + complexity for a SQL query.",
      sch(List("sql"), "sql" -> S("SQL")),
      (lh, a) => render(lh.advisor.estimateCost(str(a, "sql")))),
  )

  // ---- validation + audit + retention + masking + watermarks + sla -------

  private val governanceTools = List(
    ToolDef("add_validation_rule", "Add a write-time validation rule.",
      sch(List("rule_id", "table_name", "rule_type"),
        "rule_id" -> S("Rule id"), "table_name" -> S("Table"),
        "rule_type" -> S("not_null | unique | range | regex | referential"),
        "columns" -> A("Columns the rule covers"),
        "params" -> O("Rule parameters")),
      (lh, a) => {
        lh.validation.addRule(ValidationRule(str(a, "rule_id"),
          str(a, "table_name"), str(a, "rule_type"),
          seqStr(a, "columns").toList,
          (a \ "params").extractOpt[Map[String, String]].getOrElse(Map.empty)))
        "rule added"
      }),
    ToolDef("list_validation_rules", "List validation rules.",
      sch(Nil, "table_name" -> S("Filter by table")),
      (lh, a) => lh.validation.listRules(strOpt(a, "table_name"))
        .map(_.toString).mkString("\n")),
    ToolDef("remove_validation_rule", "Remove a validation rule by id.",
      sch(List("rule_id"), "rule_id" -> S("Rule id")),
      (lh, a) => { lh.validation.dropRule(str(a, "rule_id")); "removed" }),
    ToolDef("validate_data", "Validate a table's current data against its rules.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => {
        val d = lh.catalog.loadTable(str(a, "table_name")).read()
        val issues = lh.validation.validate(str(a, "table_name"), d, Some(d))
        if (issues.isEmpty) "OK" else issues.mkString("\n")
      }),
    ToolDef("get_audit_log", "Recent audit entries.",
      sch(Nil, "table_name" -> S("Filter by table"),
        "operation" -> S("Filter by operation"), "limit" -> I("Max entries")),
      (lh, a) => lh.audit.entries(strOpt(a, "table_name"), strOpt(a, "operation"))
        .takeRight(intOpt(a, "limit").getOrElse(100))
        .map(e => s"${java.time.Instant.ofEpochMilli(e.timestampMs)}\t${e.table}\t" +
          s"${e.operation}\t${e.details}").mkString("\n")),
    ToolDef("clear_audit_log", "Clear audit entries older than a cutoff.",
      sch(List("older_than"), "older_than" -> S("ISO timestamp or 30d/24h/5m")),
      (lh, a) => s"removed ${lh.audit.clearOlderThan(str(a, "older_than"))} entries"),
    ToolDef("set_retention_policy", "Set snapshot retention for a table.",
      sch(List("table_name"), "table_name" -> S("Table"),
        "max_snapshot_age_hours" -> N("Expire snapshots older than this"),
        "max_snapshot_count" -> I("Keep at most this many"),
        "min_snapshots_to_keep" -> I("Never drop below this (default 1)")),
      (lh, a) => {
        lh.retention.setPolicy(RetentionPolicy(str(a, "table_name"),
          dblOpt(a, "max_snapshot_age_hours"), intOpt(a, "max_snapshot_count"),
          intOpt(a, "min_snapshots_to_keep").getOrElse(1)))
        "policy set"
      }),
    ToolDef("list_retention_policies", "All retention policies.", sch(Nil),
      (lh, _) => lh.catalog.listTables("*").flatMap(t =>
        lh.retention.policy(t).map(p => s"$t: maxAgeHours=${p.maxAgeHours
          .getOrElse("-")} maxSnapshots=${p.maxSnapshots.getOrElse("-")} minKeep=${p.minKeep}"))
        .mkString("\n")),
    ToolDef("evaluate_retention", "Evaluate (or apply) a table's retention policy.",
      sch(List("table_name"), "table_name" -> S("Table"),
        "dry_run" -> B("Only report (default true)")),
      (lh, a) => s"would expire: ${lh.retention.evaluate(str(a, "table_name"),
        boolOpt(a, "dry_run").getOrElse(true)).mkString(", ")}"),
    ToolDef("add_masking_policy", "Mask a column in query results.",
      sch(List("column", "strategy"), "column" -> S("Column name"),
        "strategy" -> S("redact | hash | partial | nullify | tokenize"),
        "params" -> O("Strategy parameters")),
      (lh, a) => {
        lh.masking.setPolicy(MaskingPolicy(str(a, "column"), str(a, "strategy"),
          (a \ "params").extractOpt[Map[String, String]].getOrElse(Map.empty)))
        "policy set"
      }),
    ToolDef("list_masking_policies", "List masking policies.", sch(Nil),
      (lh, _) => lh.masking.policies().toList.sortBy(_._1)
        .map { case (c, p) => s"$c: ${p.strategy}" }.mkString("\n")),
    ToolDef("remove_masking_policy", "Remove a masking policy.",
      sch(List("column"), "column" -> S("Column name")),
      (lh, a) => { lh.masking.dropPolicy(str(a, "column")); "removed" }),
    ToolDef("query_with_masking", "Execute SQL with masking policies applied.",
      sch(List("sql"), "sql" -> S("SQL"), "max_rows" -> I("Row cap")),
      (lh, a) => df(lh.masking.apply(
        lh.engine.execute(str(a, "sql"), maxRows(a))), maxRows(a))),
    ToolDef("get_watermark", "Watermark for a (pipeline, table).",
      sch(List("pipeline", "table_name"), "pipeline" -> S("Pipeline"),
        "table_name" -> S("Table")),
      (lh, a) => lh.incremental.watermark(str(a, "pipeline"), str(a, "table_name"))
        .map(w => s"snapshot=${w.snapshotId} rows=${w.rows}")
        .getOrElse("no watermark")),
    ToolDef("list_watermarks", "All watermarks by pipeline.", sch(Nil),
      (lh, _) => render(lh.incremental.listWatermarks())),
    ToolDef("reset_watermark", "Clear a pipeline's watermarks.",
      sch(List("pipeline"), "pipeline" -> S("Pipeline")),
      (lh, a) => { lh.incremental.clearWatermarks(str(a, "pipeline")); "reset" }),
    ToolDef("run_pipeline_incremental", "Run a pipeline over new-since-watermark data.",
      sch(List("name"), "name" -> S("Pipeline name")),
      (lh, a) => lh.pipelines.run(str(a, "name"), incremental = true)
        .map(r => s"step ${r.step}: ${r.status} rows=${r.rows} ${r.message}")
        .mkString("\n")),
    ToolDef("set_sla", "Set SLA thresholds for a table.",
      sch(List("table_name"), "table_name" -> S("Table"),
        "max_staleness_hours" -> N("Freshness bound"),
        "min_quality_score" -> N("Quality bound"),
        "min_row_count" -> I("Row-count bound"),
        "max_null_percent" -> N("Null-ratio bound")),
      (lh, a) => {
        lh.sla.setPolicy(SlaPolicy(str(a, "table_name"),
          dblOpt(a, "max_staleness_hours"), dblOpt(a, "min_quality_score"),
          longOpt(a, "min_row_count"), dblOpt(a, "max_null_percent")))
        "sla set"
      }),
    ToolDef("list_slas", "All SLA policies.", sch(Nil),
      (lh, _) => lh.sla.policies().map(_.toString).mkString("\n")),
    ToolDef("check_sla", "Check a table against its SLA (warns at 90%).",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => {
        val vs = lh.sla.check(str(a, "table_name"))
        if (vs.isEmpty) "OK"
        else vs.map(v => s"[${v.level}] ${v.check}: ${v.message}").mkString("\n")
      }),
  )

  // ---- dedup + sampling + quality + cdc ----------------------------------

  private val analyticsTools = List(
    ToolDef("find_duplicates", "Duplicate key groups ordered by count.",
      sch(List("table_name", "key_columns"), "table_name" -> S("Table"),
        "key_columns" -> A("Duplicate-key columns"), "limit" -> I("Max groups")),
      (lh, a) => df(lh.dedup.findDuplicates(
        lh.catalog.loadTable(str(a, "table_name")).read(),
        seqStr(a, "key_columns"), intOpt(a, "limit").getOrElse(100)), 1000)),
    ToolDef("dedup_summary", "Total vs unique vs duplicate row counts.",
      sch(List("table_name", "key_columns"), "table_name" -> S("Table"),
        "key_columns" -> A("Key columns")),
      (lh, a) => render(lh.dedup.dedupSummary(
        lh.catalog.loadTable(str(a, "table_name")).read(), seqStr(a, "key_columns")))),
    ToolDef("remove_duplicates", "Remove duplicate-keyed rows keeping first/last.",
      sch(List("table_name", "key_columns"), "table_name" -> S("Table"),
        "key_columns" -> A("Key columns"), "keep" -> S("first | last")),
      (lh, a) => s"removed ${lh.dedup.removeDuplicates(str(a, "table_name"),
        seqStr(a, "key_columns"), strOpt(a, "keep").getOrElse("first"))}"),
    ToolDef("dedup_report", "Uniqueness ratios, suggested keys, estimated savings.",
      sch(List("table_name", "key_columns"), "table_name" -> S("Table"),
        "key_columns" -> A("Key columns")),
      (lh, a) => render(lh.dedup.dedupReport(str(a, "table_name"),
        seqStr(a, "key_columns")))),
    ToolDef("random_sample", "Seeded Bernoulli row sample.",
      sch(List("table_name", "fraction"), "table_name" -> S("Table"),
        "fraction" -> N("Sample fraction"), "seed" -> I("Seed (default 42)"),
        "limit" -> I("Row cap on returned sample")),
      (lh, a) => df(lh.sampling.randomSample(
        lh.catalog.loadTable(str(a, "table_name")).read(),
        dblOpt(a, "fraction").getOrElse(0.1),
        longOpt(a, "seed").getOrElse(42L)), intOpt(a, "limit").getOrElse(1000))),
    ToolDef("stratified_sample", "Per-stratum sample with a >=1-row guarantee.",
      sch(List("table_name", "column", "fraction"), "table_name" -> S("Table"),
        "column" -> S("Stratum column"), "fraction" -> N("Per-stratum fraction"),
        "seed" -> I("Seed (default 42)")),
      (lh, a) => df(lh.sampling.stratifiedSample(
        lh.catalog.loadTable(str(a, "table_name")).read(), str(a, "column"),
        dblOpt(a, "fraction").getOrElse(0.1),
        longOpt(a, "seed").getOrElse(42L)), 1000)),
    ToolDef("sample_to_table", "Materialize a sample into a table.",
      sch(List("source_table", "target_table", "fraction"),
        "source_table" -> S("Source"), "target_table" -> S("Target"),
        "fraction" -> N("Fraction"), "seed" -> I("Seed (default 42)")),
      (lh, a) => s"sampled ${lh.sampling.sampleToTable(str(a, "source_table"),
        str(a, "target_table"), dblOpt(a, "fraction").getOrElse(0.1),
        longOpt(a, "seed").getOrElse(42L))} rows"),
    ToolDef("get_sample_stats", "Compare mean/std/min/max of numeric columns, full vs sample.",
      sch(List("table_name", "sample_table"), "table_name" -> S("Full table"),
        "sample_table" -> S("Sample table")),
      (lh, a) => {
        val stats = lh.sampling.sampleStats(
          lh.catalog.loadTable(str(a, "table_name")).read(),
          lh.catalog.loadTable(str(a, "sample_table")).read())
        stats.toList.sortBy { case ((c, m), _) => (c, m) }
          .map { case ((c, m), (f, s)) => f"$c.$m: full=$f%.4f sample=$s%.4f" }
          .mkString("\n")
      }),
    ToolDef("quality_score", "Weighted quality score + recommendations.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => render(lh.quality.computeScore(str(a, "table_name")))),
    ToolDef("detect_anomalies", "Row-count, null-rate and freshness anomalies.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => {
        val as = lh.quality.detectAnomalies(str(a, "table_name"))
        if (as.isEmpty) "no anomalies"
        else as.map(x => s"[${x.severity}] ${x.kind}: ${x.message}").mkString("\n")
      }),
    ToolDef("quality_report", "Warehouse-wide quality rollup.",
      sch(Nil), (lh, _) => render(lh.quality.report())),
    ToolDef("get_table_changes", "Row-level changes between snapshots (insert/delete/update).",
      sch(List("table_name"), "table_name" -> S("Table"),
        "from_snapshot" -> S("Older snapshot"), "to_snapshot" -> S("Newer snapshot"),
        "key_columns" -> A("Key columns for update detection")),
      (lh, a) => df(lh.cdc.getChanges(str(a, "table_name"),
        strOpt(a, "from_snapshot"), strOpt(a, "to_snapshot"),
        seqStr(a, "key_columns")), 1000)),
    ToolDef("get_change_log", "Per-snapshot-transition change summaries.",
      sch(List("table_name"), "table_name" -> S("Table"),
        "key_columns" -> A("Key columns"), "limit" -> I("Max transitions")),
      (lh, a) => lh.cdc.changeLog(str(a, "table_name"), seqStr(a, "key_columns"),
        intOpt(a, "limit").getOrElse(10))
        .map { case (f, t, s) => s"$f -> $t: $s" }.mkString("\n")),
    ToolDef("get_change_summary", "Counts by change type between two snapshots.",
      sch(List("table_name"), "table_name" -> S("Table"),
        "from_snapshot" -> S("Older snapshot"), "to_snapshot" -> S("Newer snapshot"),
        "key_columns" -> A("Key columns")),
      (lh, a) => render(lh.cdc.changeSummary(str(a, "table_name"),
        strOpt(a, "from_snapshot"), strOpt(a, "to_snapshot"),
        seqStr(a, "key_columns")))),
    ToolDef("export_changes", "Export change rows to a file.",
      sch(List("table_name", "path"), "table_name" -> S("Table"),
        "path" -> S("Target path"), "format" -> S("json | csv | parquet"),
        "from_snapshot" -> S("Older snapshot"), "to_snapshot" -> S("Newer snapshot"),
        "key_columns" -> A("Key columns")),
      (lh, a) => {
        lh.cdc.exportChanges(lh.cdc.getChanges(str(a, "table_name"),
          strOpt(a, "from_snapshot"), strOpt(a, "to_snapshot"),
          seqStr(a, "key_columns")), str(a, "path"),
          strOpt(a, "format").getOrElse("json"))
        s"exported to ${str(a, "path")}"
      }),
  )

  // ---- maintenance + refresh + dashboard ---------------------------------

  private val maintenanceTools = List(
    ToolDef("compact_table", "Compact a table's data files.",
      sch(List("table_name"), "table_name" -> S("Table"),
        "target_files" -> I("Target file count (default 1)")),
      (lh, a) => {
        val s = lh.catalog.loadTable(str(a, "table_name"))
          .compact(intOpt(a, "target_files").getOrElse(1))
        s"compacted to ${s.files.size} files (snapshot ${s.id})"
      }),
    ToolDef("cleanup_orphans", "Delete (or list) orphaned data files.",
      sch(List("table_name"), "table_name" -> S("Table"),
        "dry_run" -> B("Only list (default false)")),
      (lh, a) => {
        val dry = boolOpt(a, "dry_run").getOrElse(false)
        val orphans = lh.catalog.loadTable(str(a, "table_name"))
          .orphanFiles(delete = !dry)
        s"${orphans.size} orphan files" + (if (dry) " (dry run)" else " removed")
      }),
    ToolDef("maintenance_status", "Files/bytes/snapshots/orphans for a table.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => {
        val tbl = lh.catalog.loadTable(str(a, "table_name"))
        val snap = tbl.currentSnapshot
        s"data_files=${snap.map(_.files.size).getOrElse(0)} " +
          s"total_bytes=${snap.map(_.totalBytes).getOrElse(0L)} " +
          s"snapshots=${tbl.snapshots.size} " +
          s"orphan_files=${tbl.orphanFiles(delete = false).size}"
      }),
    ToolDef("set_maintenance_policy", "Per-table auto-maintenance thresholds.",
      sch(List("table_name"), "table_name" -> S("Table"),
        "auto_compact_threshold" -> I("Compact at this many files (default 10)"),
        "auto_expire_retain_last" -> I("Snapshots to retain (default 5)"),
        "orphan_cleanup" -> B("Clean orphans (default true)")),
      (lh, a) => {
        lh.maintenance.setPolicy(MaintenancePolicy(str(a, "table_name"),
          intOpt(a, "auto_compact_threshold").getOrElse(10),
          intOpt(a, "auto_expire_retain_last").getOrElse(5),
          boolOpt(a, "orphan_cleanup").getOrElse(true)))
        "policy set"
      }),
    ToolDef("run_maintenance", "Run maintenance for one table or all.",
      sch(Nil, "table_name" -> S("Table (omit for all)"),
        "dry_run" -> B("Only plan (default false)")),
      (lh, a) => {
        val dry = boolOpt(a, "dry_run").getOrElse(false)
        val actions = strOpt(a, "table_name") match {
          case Some(t) => lh.maintenance.maintainTable(t, dry)
          case None => lh.maintenance.runAll(dry)
        }
        if (actions.isEmpty) "nothing to do"
        else actions.map(x => s"${x.table}: ${x.action} (${x.detail})").mkString("\n")
      }),
    ToolDef("check_maintenance", "Dry-run maintenance plan for a table.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => {
        val actions = lh.maintenance.maintainTable(str(a, "table_name"), dryRun = true)
        if (actions.isEmpty) "nothing to do"
        else actions.map(x => s"${x.action}: ${x.detail}").mkString("\n")
      }),
    ToolDef("set_auto_refresh", "Configure the downstream refresh cascade for a table.",
      sch(List("table_name"), "table_name" -> S("Table"),
        "enabled" -> B("Cascade enabled (default true)"),
        "cascade_depth" -> I("Lineage depth (default 3)"),
        "refresh_matviews" -> B("Refresh matviews (default true)"),
        "rerun_pipelines" -> B("Rerun pipelines (default true)"),
        "invalidate_caches" -> B("Invalidate caches (default true)")),
      (lh, a) => {
        lh.autoRefresh.setConfig(str(a, "table_name"), AutoRefreshConfig(
          boolOpt(a, "enabled").getOrElse(true),
          intOpt(a, "cascade_depth").getOrElse(3),
          boolOpt(a, "refresh_matviews").getOrElse(true),
          boolOpt(a, "rerun_pipelines").getOrElse(true),
          boolOpt(a, "invalidate_caches").getOrElse(true)))
        "auto-refresh configured"
      }),
    ToolDef("get_refresh_plan", "Planned cascade steps for a table (config-aware).",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => {
        val steps = lh.autoRefresh.configuredPlan(str(a, "table_name"))
        if (steps.isEmpty) "no steps (disabled or no downstream)"
        else steps.map(s => s"${s.kind} ${s.name} (depth ${s.depth})").mkString("\n")
      }),
    ToolDef("trigger_refresh", "Execute the refresh cascade for a table.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => lh.autoRefresh.trigger(str(a, "table_name"))
        .map(s => s"${s.kind} ${s.name}: ${s.status}").mkString("\n")),
    ToolDef("get_refresh_history", "Past refresh cascades.",
      sch(Nil), (lh, _) => lh.autoRefresh.history().takeRight(20).zipWithIndex
        .map { case (steps, i) =>
          s"run $i:\n" + steps.map(s => s"  ${s.kind} ${s.name}: ${s.status}").mkString("\n")
        }.mkString("\n")),
    ToolDef("dashboard", "Warehouse health rollup: sizes, health, activity.",
      sch(Nil), (lh, _) => {
        val r = lh.dashboard.report()
        (List(
          s"warehouse: ${r.storagePath}",
          s"namespaces: ${r.namespaces.mkString(", ")}",
          s"tables: ${r.totalTables} total ${r.totalSizeDisplay}") ++
          r.tables.map(t =>
            s"  ${t.name}\trows=${t.rows}\t${t.sizeDisplay}\tfiles=${t.dataFiles}\t${t.health}") ++
          List(s"saved queries: ${r.savedQueriesCount}, history: ${r.historyEntriesCount}") ++
          r.recentActivity.map(e => s"  recent: ${e.operation} ${e.table}"))
          .mkString("\n")
      }),
  )

  // ---- views + pipelines + lineage + joins -------------------------------

  private val orchestrationTools = List(
    ToolDef("create_view", "Register a logical view.",
      sch(List("name", "sql"), "name" -> S("View name"), "sql" -> S("SQL")),
      (lh, a) => { lh.views.create(str(a, "name"), str(a, "sql")); "view created" }),
    ToolDef("list_views", "List logical views.", sch(Nil),
      (lh, _) => lh.views.list().map(v => s"${v.name}: ${v.sql}").mkString("\n")),
    ToolDef("query_view", "Query a logical view.",
      sch(List("name"), "name" -> S("View name"), "max_rows" -> I("Row cap")),
      (lh, a) => df(lh.views.query(str(a, "name"), maxRows(a)), maxRows(a))),
    ToolDef("drop_view", "Drop a logical view.",
      sch(List("name"), "name" -> S("View name")),
      (lh, a) => { lh.views.drop(str(a, "name")); "dropped" }),
    ToolDef("create_materialized_view", "Materialize a query into a backing table.",
      sch(List("name", "sql"), "name" -> S("Matview name"), "sql" -> S("SQL")),
      (lh, a) => s"materialized ${lh.matviews.create(str(a, "name"),
        str(a, "sql")).rowCount} rows"),
    ToolDef("list_materialized_views", "List materialized views with freshness.",
      sch(Nil), (lh, _) => lh.matviews.list().map(m =>
        s"${m.name} -> ${m.backingTable} rows=${m.rowCount} " +
          (if (lh.matviews.isStale(m.name)) "STALE" else "FRESH")).mkString("\n")),
    ToolDef("query_materialized_view", "Read a materialized view.",
      sch(List("name"), "name" -> S("Matview name"), "max_rows" -> I("Row cap")),
      (lh, a) => df(lh.matviews.read(str(a, "name")), maxRows(a))),
    ToolDef("refresh_materialized_view", "Recompute a materialized view.",
      sch(List("name"), "name" -> S("Matview name")),
      (lh, a) => s"refreshed ${lh.matviews.refresh(str(a, "name")).rowCount} rows"),
    ToolDef("drop_materialized_view", "Drop a materialized view and its backing table.",
      sch(List("name"), "name" -> S("Matview name")),
      (lh, a) => { lh.matviews.drop(str(a, "name")); "dropped" }),
    ToolDef("create_pipeline", "Define a multi-step SQL pipeline.",
      sch(List("name", "steps"), "name" -> S("Pipeline name"),
        "steps" -> A("Array of {sql, target_table?, mode?}"),
        "description" -> S("Description")),
      (lh, a) => {
        val steps = rowsOf(a, "steps").map(m => PipelineStep(m("sql").toString,
          m.get("target_table").map(_.toString),
          m.getOrElse("mode", "overwrite").toString))
        lh.pipelines.create(str(a, "name"), steps,
          strOpt(a, "description").getOrElse(""))
        "pipeline created"
      }),
    ToolDef("list_pipelines", "List pipelines with last-run status.", sch(Nil),
      (lh, _) => lh.pipelines.list().map(p =>
        s"${p.name}: ${p.steps.size} steps, last=${p.lastRunStatus}").mkString("\n")),
    ToolDef("run_pipeline", "Run a pipeline (stop on failure).",
      sch(List("name"), "name" -> S("Pipeline name"),
        "dry_run" -> B("Validate without executing")),
      (lh, a) =>
        (if (boolOpt(a, "dry_run").getOrElse(false)) lh.pipelines.dryRun(str(a, "name"))
        else lh.pipelines.run(str(a, "name")))
          .map(r => s"step ${r.step}: ${r.status} rows=${r.rows} ${r.message}")
          .mkString("\n")),
    ToolDef("drop_pipeline", "Delete a pipeline.",
      sch(List("name"), "name" -> S("Pipeline name")),
      (lh, a) => { lh.pipelines.drop(str(a, "name")); "dropped" }),
    ToolDef("record_lineage", "Record a lineage edge (sources -> target).",
      sch(List("target", "operation"), "target" -> S("Target table"),
        "operation" -> S("Operation"), "sources" -> A("Source tables")),
      (lh, a) => { lh.lineage.record(seqStr(a, "sources"), str(a, "target"),
        str(a, "operation")); "recorded" }),
    ToolDef("get_lineage", "Upstream + downstream tables by depth.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => {
        val t = str(a, "table_name")
        val up = lh.lineage.upstream(t).toList.sortBy(_._2)
          .map { case (x, d) => s"  $d: $x" }
        val down = lh.lineage.downstream(t).toList.sortBy(_._2)
          .map { case (x, d) => s"  $d: $x" }
        (List("upstream:") ++ up ++ List("downstream:") ++ down).mkString("\n")
      }),
    ToolDef("lineage_graph", "All lineage edges.", sch(Nil),
      (lh, _) => lh.lineage.edges().map(e =>
        s"${e.sources.mkString("+")} -> ${e.target} (${e.operation})").mkString("\n")),
    ToolDef("execute_join", "Execute a federated join query (namespace-qualified).",
      sch(List("sql"), "sql" -> S("Join SQL"), "max_rows" -> I("Row cap (default 10000)")),
      (lh, a) => df(lh.engine.executeJoin(str(a, "sql"),
        intOpt(a, "max_rows").getOrElse(10000)), intOpt(a, "max_rows").getOrElse(10000))),
    ToolDef("join_to_table", "Run a join query and materialize the result as a table.",
      sch(List("sql", "target_table"), "sql" -> S("Join SQL"),
        "target_table" -> S("Target table")),
      (lh, a) => {
        // maxRows=0: no limit node — a limit(Int.MaxValue) sentinel would
        // funnel the whole result through one partition before the write
        val result = lh.engine.executeJoin(str(a, "sql"), 0)
        val target = str(a, "target_table")
        if (!lh.catalog.tableExists(target))
          lh.catalog.createTable(target, result.schema, Nil, Map.empty)
        val snap = lh.catalog.loadTable(target).overwrite(result)
        s"wrote ${snap.totalRows} rows to $target"
      }),
    ToolDef("suggest_joins", "Suggest joins from matching column names/types.",
      sch(Nil), (lh, _) => lh.engine.suggestJoins()
        .map { case (x, y, c, sql) => s"$x JOIN $y ON $c\n  $sql" }.mkString("\n")),
  )

  // ---- metadata: tags, glossary, clones, notifications -------------------

  private val metadataTools = List(
    ToolDef("tag_table", "Add a tag to a table.",
      sch(List("table_name", "tag"), "table_name" -> S("Table"), "tag" -> S("Tag")),
      (lh, a) => { lh.tagging.addTag(str(a, "table_name"), str(a, "tag")); "tagged" }),
    ToolDef("search_by_tag", "Tables matching a tag.",
      sch(List("tag"), "tag" -> S("Tag")),
      (lh, a) => lh.tagging.search(str(a, "tag")).mkString("\n")),
    ToolDef("set_table_description", "Set a table description.",
      sch(List("table_name", "description"), "table_name" -> S("Table"),
        "description" -> S("Description")),
      (lh, a) => { lh.tagging.setDescription(str(a, "table_name"),
        str(a, "description")); "description set" }),
    ToolDef("bookmark_table", "Bookmark (or unbookmark) a table.",
      sch(List("table_name"), "table_name" -> S("Table"),
        "remove" -> B("Remove instead (default false)")),
      (lh, a) => {
        if (boolOpt(a, "remove").getOrElse(false)) {
          lh.tagging.unbookmark(str(a, "table_name")); "unbookmarked"
        } else { lh.tagging.bookmark(str(a, "table_name")); "bookmarked" }
      }),
    ToolDef("search_tables", "Search tables by name, tag or description.",
      sch(List("query"), "query" -> S("Search string")),
      (lh, a) => lh.tagging.search(str(a, "query")).mkString("\n")),
    ToolDef("set_column_description", "Describe a column.",
      sch(List("table_name", "column", "description"), "table_name" -> S("Table"),
        "column" -> S("Column"), "description" -> S("Description")),
      (lh, a) => { lh.catalogMetadata.setColumnDescription(str(a, "table_name"),
        str(a, "column"), str(a, "description")); "description set" }),
    ToolDef("classify_column", "Classify a column (e.g. pii, sensitive).",
      sch(List("table_name", "column", "classification"),
        "table_name" -> S("Table"), "column" -> S("Column"),
        "classification" -> S("Classification label")),
      (lh, a) => { lh.catalogMetadata.classify(str(a, "table_name"),
        str(a, "column"), str(a, "classification")); "classified" }),
    ToolDef("get_enriched_schema", "Schema with descriptions + classifications.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => lh.catalogMetadata.enrichedSchema(str(a, "table_name"))
        .map(m => s"${m("name")}\t${m("type")}\t${m("classification")}\t${m("description")}")
        .mkString("\n")),
    ToolDef("search_glossary", "Search glossary terms (empty query lists all).",
      sch(Nil, "query" -> S("Search string")),
      (lh, a) => lh.catalogMetadata.glossarySearch(strOpt(a, "query").getOrElse(""))
        .map(t => s"${t.term}: ${t.definition}").mkString("\n")),
    ToolDef("register_notification", "Register an event handler for a table.",
      sch(List("table_name", "event", "kind", "target"),
        "table_name" -> S("Table or *"),
        "event" -> S("write | schema_change | sla_violation | maintenance | contract_violation | all"),
        "kind" -> S("log | shell | webhook"), "target" -> S("Handler target")),
      (lh, a) => {
        val h = NotificationHandler(str(a, "table_name"), str(a, "event"),
          str(a, "kind"), str(a, "target"))
        lh.notifications.addHandler(h)
        s"registered, handler_id=${lh.notifications.handlerId(h)}"
      }),
    ToolDef("list_notifications", "Handlers for a table (or all).",
      sch(Nil, "table_name" -> S("Table (omit for all)")),
      (lh, a) => {
        val hs = strOpt(a, "table_name") match {
          case Some(t) => lh.notifications.handlers(t)
          case None => lh.notifications.allHandlers()
        }
        hs.map(h => s"${lh.notifications.handlerId(h)}  ${h.table} ${h.event} -> ${h.kind}:${h.target}")
          .mkString("\n")
      }),
    ToolDef("remove_notification", "Remove a handler by id.",
      sch(List("handler_id"), "handler_id" -> S("Handler id")),
      (lh, a) => if (lh.notifications.removeHandler(str(a, "handler_id")))
        "removed" else "no such handler"),
    ToolDef("get_notification_history", "Recent fired notifications.",
      sch(Nil, "limit" -> I("Max entries")),
      (lh, a) => lh.notifications.history()
        .takeRight(intOpt(a, "limit").getOrElse(100))
        .map(r => s"${r.table} ${r.event}: ${r.message}").mkString("\n")),
    ToolDef("clone_table", "Zero-copy clone of a table (optionally as-of).",
      sch(List("table_name", "clone_name"), "table_name" -> S("Original"),
        "clone_name" -> S("Clone name"), "as_of" -> S("Snapshot id/timestamp"),
        "zero_copy" -> B("True zero-copy (reference files by path, " +
          "GC-safe pin on the source); default copies like the reference")),
      (lh, a) => { lh.cloning.clone(str(a, "table_name"), str(a, "clone_name"),
        strOpt(a, "as_of"), boolOpt(a, "zero_copy").getOrElse(false))
        s"cloned ${str(a, "table_name")} -> ${str(a, "clone_name")}" }),
    ToolDef("list_clones", "List clones.", sch(Nil),
      (lh, _) => lh.cloning.list().map(c => s"${c.cloneName} <- ${c.original}")
        .mkString("\n")),
    ToolDef("promote_clone", "Promote a clone to an independent table.",
      sch(List("clone_name"), "clone_name" -> S("Clone name"),
        "require_source_unchanged" -> B("Fast-forward publish: refuse if " +
          "the source advanced past the clone's fork snapshot (race-free); " +
          "default overwrites like the reference")),
      (lh, a) => { lh.cloning.promote(str(a, "clone_name"),
        boolOpt(a, "require_source_unchanged").getOrElse(false)); "promoted" }),
    ToolDef("discard_clone", "Discard a clone.",
      sch(List("clone_name"), "clone_name" -> S("Clone name")),
      (lh, a) => { lh.cloning.discard(str(a, "clone_name")); "discarded" }),
  )

  // ---- contracts ----------------------------------------------------------

  private def contractOf(a: JObject, k: String): Contract =
    (a \ k) match {
      case o: JObject => o.extract[Contract]
      case _ => throw new IllegalArgumentException(s"'$k' must be a contract object")
    }

  private val contractTools = List(
    ToolDef("create_contract", "Create a data contract for a table.",
      sch(List("contract"), "contract" -> O("Contract {table, columns, constraints, ...}")),
      (lh, a) => { val c = lh.contracts.create(contractOf(a, "contract"))
        s"created contract for ${c.table} v${c.version}" }),
    ToolDef("get_contract", "Get a table's contract.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => render(lh.contracts.get(str(a, "table_name")))),
    ToolDef("list_contracts", "List all contracts.", sch(Nil),
      (lh, _) => lh.contracts.list().map(c =>
        s"${c.table} v${c.version}: ${c.constraints.size} constraints").mkString("\n")),
    ToolDef("get_contract_summary", "Contract terms vs current table state.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => render(lh.contracts.summary(str(a, "table_name")))),
    ToolDef("get_contract_history", "Version history of a contract.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => lh.contracts.history(str(a, "table_name")).map(c =>
        s"v${c.version}: ${c.constraints.size} constraints").mkString("\n")),
    ToolDef("diff_contract_versions", "Diff two contract versions.",
      sch(List("table_name", "v1", "v2"), "table_name" -> S("Table"),
        "v1" -> I("Older version"), "v2" -> I("Newer version")),
      (lh, a) => render(lh.contracts.diffVersions(str(a, "table_name"),
        intOpt(a, "v1").orElse(strOpt(a, "v1").map(_.toInt)).getOrElse(
          throw new IllegalArgumentException("'v1' parameter is required")),
        intOpt(a, "v2").orElse(strOpt(a, "v2").map(_.toInt)).getOrElse(
          throw new IllegalArgumentException("'v2' parameter is required"))))),
    ToolDef("monitor_contract", "Run compliance checks and record the score.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => render(lh.contracts.monitor(str(a, "table_name")))),
    ToolDef("get_compliance_score", "Latest compliance score (runs checks if none).",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => {
        val t = str(a, "table_name")
        val r = lh.contracts.complianceHistory(t).lastOption
          .getOrElse(lh.contracts.monitor(t))
        f"score=${r.score}%.3f schema=${r.schemaScore}%.2f constraints=${r.constraintScore}%.2f " +
          f"quality=${r.qualityScore}%.2f freshness=${r.freshnessScore}%.2f"
      }),
    ToolDef("generate_contract", "Generate + save a contract from the live profile.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => {
        val c = lh.contracts.create(
          lh.contracts.generateFromProfile(str(a, "table_name")))
        s"generated v${c.version}: ${c.columns.size} columns, ${c.constraints.size} constraints"
      }),
    ToolDef("preview_contract", "Draft a contract without saving.",
      sch(List("table_name"), "table_name" -> S("Table"),
        "strict" -> B("Tighter generation (default false)")),
      (lh, a) => render(lh.contracts.preview(str(a, "table_name"),
        boolOpt(a, "strict").getOrElse(false)))),
    ToolDef("get_contract_dashboard", "All contracts with coverage + compliance.",
      sch(Nil), (lh, _) => {
        val cs = lh.contracts.list()
        val cov = lh.contracts.coverage()
        (List(s"contracts: ${cs.size}", s"coverage: ${render(cov)}") ++
          cs.map { c =>
            val last = lh.contracts.complianceHistory(c.table).lastOption
              .map(r => f"${r.score}%.3f").getOrElse("-")
            s"${c.table} v${c.version} compliance=$last"
          }).mkString("\n")
      }),
    ToolDef("get_contract_health", "Health card: contract + recent compliance + registry.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => render(lh.contracts.health(str(a, "table_name")))),
    ToolDef("dry_run_contract", "Test a proposed contract against live data without saving.",
      sch(List("table_name", "contract"), "table_name" -> S("Table"),
        "contract" -> O("Candidate contract")),
      (lh, a) => {
        val checks = lh.contracts.dryRun(str(a, "table_name"), contractOf(a, "contract"))
        checks.map(c => s"${if (c.passed) "PASS" else "FAIL"} ${c.kind} ${c.subject}: ${c.message}")
          .mkString("\n")
      }),
    ToolDef("dry_run_migration", "Simulate migrating to a new contract version.",
      sch(List("table_name", "to_contract"), "table_name" -> S("Table"),
        "to_contract" -> O("Candidate contract")),
      (lh, a) => render(lh.contracts.dryRunMigration(str(a, "table_name"),
        contractOf(a, "to_contract")))),
    ToolDef("add_contract_consumer", "Register a consumer (or producer) of a contract.",
      sch(List("table_name", "name"), "table_name" -> S("Table"),
        "name" -> S("Consumer name"), "role" -> S("consumer | producer (default consumer)")),
      (lh, a) => {
        if (strOpt(a, "role").contains("producer"))
          lh.contracts.registerProducer(str(a, "table_name"), str(a, "name"))
        else lh.contracts.registerConsumer(str(a, "table_name"), str(a, "name"))
        "registered"
      }),
    ToolDef("get_contract_coverage", "Which tables have contracts.",
      sch(Nil), (lh, _) => render(lh.contracts.coverage())),
    ToolDef("validate_contract", "Run schema + constraint checks for a table's contract.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => {
        val t = str(a, "table_name")
        (lh.contracts.validateSchema(t) ++ lh.contracts.validateConstraints(t))
          .map(c => s"${if (c.passed) "PASS" else "FAIL"} ${c.kind} ${c.subject}: ${c.message}")
          .mkString("\n")
      }),
    ToolDef("validate_data_against_contract", "Validate a batch of rows before writing.",
      sch(List("table_name", "rows"), "table_name" -> S("Table"),
        "rows" -> A("Rows to validate")),
      (lh, a) => {
        val t = str(a, "table_name")
        val failures = lh.contracts.validateRows(t,
          lh.dml.rowsToDf(t, rowsOf(a, "rows")))
        if (failures.isEmpty) "OK"
        else failures.map(c => s"FAIL ${c.subject}: ${c.message}").mkString("\n")
      }),
    ToolDef("get_contract_violations", "Current failed checks for a table's contract.",
      sch(List("table_name"), "table_name" -> S("Table")),
      (lh, a) => {
        val vs = lh.contracts.violations(str(a, "table_name"))
        if (vs.isEmpty) "no violations"
        else vs.map(c => s"${c.kind} ${c.subject}: ${c.message}").mkString("\n")
      }),
  )

  // ---- training-data tools (beyond-reference) -----------------------------

  /** Materialize `df` into `target` (created if absent), releasing any
    * near-dup checkpoints the plan carries so a long-lived server doesn't
    * accumulate one checkpoint set per call. */
  private def writeTable(lh: Lakehouse, target: String, df: DataFrame): Long = {
    if (!lh.catalog.tableExists(target))
      lh.catalog.createTable(target, df.schema, Nil, Map.empty)
    val snap = lh.catalog.loadTable(target).overwrite(df)
    graft.text.NearDup.releaseResultCheckpoints(df)
    snap.totalRows
  }

  private def idCol(a: JObject): String = strOpt(a, "id_col").getOrElse("doc_id")
  private def textCol(a: JObject): String = strOpt(a, "text_col").getOrElse("text")

  /** BEYOND-REFERENCE: the training-data curation operators (SURVEY §2.16)
    * exposed over MCP, so an agent driving this server can run the same
    * dedup / decontamination / packing pipeline the CLI's training verbs
    * offer. Every name carries the `graft_` prefix — the reference's 155
    * tools above stay mirrored 1:1 and un-collided (McpServerSpec asserts
    * the partition). */
  private val trainingTools = List(
    ToolDef("graft_curate",
      "Training-data curation funnel (language -> quality -> exact dedup -> near-dup); writes the curated corpus and reports per-stage counts.",
      sch(List("table_name", "target_table"),
        "table_name" -> S("Source documents table"),
        "target_table" -> S("Curated output table"),
        "languages" -> S("Comma-separated language allowlist (default en)"),
        "min_quality" -> N("Quality-score gate (default 0.3)"),
        "jaccard_threshold" -> N("Near-dup Jaccard threshold (default 0.8)"),
        "id_col" -> S("Id column (default doc_id)"),
        "text_col" -> S("Text column (default text)")),
      (lh, a) => {
        val cfg = graft.text.Curation.Config(
          languages = strOpt(a, "languages").getOrElse("en")
            .split(',').filter(_.nonEmpty).toSet,
          minQuality = dblOpt(a, "min_quality").getOrElse(0.3),
          jaccardThreshold = dblOpt(a, "jaccard_threshold").getOrElse(0.8))
        val (curated, stats) = graft.text.Curation.funnel(
          lh.catalog.loadTable(str(a, "table_name")).read(),
          idCol(a), textCol(a), cfg)
        val rows = writeTable(lh, str(a, "target_table"), curated)
        val st = stats.get
        s"curated $rows rows into ${str(a, "target_table")} " +
          s"(input=${st.input}, after language=${st.afterLanguage}, " +
          s"quality=${st.afterQuality}, exact dedup=${st.afterExactDedup}, " +
          s"near dedup=${st.afterNearDedup})"
      }),
    ToolDef("graft_dedup_best",
      "Near-dup dedup keeping each cluster's HIGHEST-quality doc (not min-id); writes the deduped corpus.",
      sch(List("table_name", "target_table"),
        "table_name" -> S("Source documents table"),
        "target_table" -> S("Deduped output table"),
        "threshold" -> N("Jaccard threshold (default 0.8)"),
        "id_col" -> S("Id column (default doc_id)"),
        "text_col" -> S("Text column (default text)")),
      (lh, a) => {
        val id = idCol(a); val text = textCol(a)
        val docs = lh.catalog.loadTable(str(a, "table_name")).read()
        // same pipeline as gate q92 / the dedup-best CLI verb (shared
        // helper, cannot drift)
        val ranked = graft.text.Curation.rankedClusterMembers(docs, id, text,
          graft.text.TextAnalysis.qualityScore(
            org.apache.spark.sql.functions.col(text)),
          threshold = dblOpt(a, "threshold").getOrElse(0.8))
        val losers = ranked.where(org.apache.spark.sql.functions.col("rnk") > 1)
          .select(org.apache.spark.sql.functions.col("doc_id").as(id))
        val kept = docs.join(losers, Seq(id), "left_anti")
        val rows = writeTable(lh, str(a, "target_table"), kept)
        graft.text.NearDup.releaseResultCheckpoints(ranked)
        s"kept $rows best-per-cluster docs into ${str(a, "target_table")}"
      }),
    ToolDef("graft_scrub_spans",
      "Remove cross-document repeated k-token spans (exact-substring dedup) and write the scrubbed corpus.",
      sch(List("table_name", "target_table"),
        "table_name" -> S("Source documents table"),
        "target_table" -> S("Scrubbed output table"),
        "span_tokens" -> I("Span length in tokens (default 20)"),
        "min_docs" -> I("Cross-doc threshold (default 2)"),
        "id_col" -> S("Id column (default doc_id)"),
        "text_col" -> S("Text column (default text)")),
      (lh, a) => {
        val scrubbed = graft.text.SpanDedup.removeRepeatedSpans(
          lh.catalog.loadTable(str(a, "table_name")).read(),
          idCol(a), textCol(a),
          intOpt(a, "span_tokens").getOrElse(20),
          intOpt(a, "min_docs").getOrElse(2))
        val rows = writeTable(lh, str(a, "target_table"), scrubbed)
        s"scrubbed repeated spans from $rows docs into ${str(a, "target_table")}"
      }),
    ToolDef("graft_decontaminate",
      "Cross-corpus contamination report: eval/test docs sharing >= threshold n-gram Jaccard with any training doc.",
      sch(List("train_table", "eval_table"),
        "train_table" -> S("Training corpus table"),
        "eval_table" -> S("Eval/test corpus table"),
        "ngram" -> I("Shingle size (default 3)"),
        "jaccard_threshold" -> N("Jaccard threshold (default 0.8)"),
        "id_col" -> S("Id column (default doc_id)"),
        "text_col" -> S("Text column (default text)")),
      (lh, a) => {
        val pairs = graft.text.NearDup.crossJaccardPairs(
          lh.catalog.loadTable(str(a, "train_table")).read(),
          lh.catalog.loadTable(str(a, "eval_table")).read(),
          idCol(a), textCol(a),
          n = intOpt(a, "ngram").getOrElse(3),
          threshold = dblOpt(a, "jaccard_threshold").getOrElse(0.8),
          maxShingleFreq = 100)
        // ONE action for both numbers — the cross-corpus shingle join is
        // the expensive part and must not run once per count
        val fs = org.apache.spark.sql.functions
        val r = pairs.agg(
          fs.countDistinct(fs.col("id_b")).as("docs"),
          fs.count(fs.lit(1)).as("pairs")).head()
        s"${r.getLong(0)} contaminated eval docs (${r.getLong(1)} contaminated pairs)"
      }),
    ToolDef("graft_split_assign",
      "Deterministic md5-hash train/val/test split assignment (engine-portable, leakage-safe when keyed on a group column); writes table + split column.",
      sch(List("table_name", "target_table"),
        "table_name" -> S("Source table"),
        "target_table" -> S("Output table with a 'split' column"),
        "key" -> S("Hash key column (default doc_id)"),
        "fractions" -> S("name:fraction,... (default train:0.8,val:0.1,test:0.1)")),
      (lh, a) => {
        val fracs = strOpt(a, "fractions")
          .getOrElse("train:0.8,val:0.1,test:0.1")
          .split(',').toSeq.map { kv =>
            kv.split(':') match {
              case Array(n, f) if f.toDoubleOption.isDefined => n -> f.toDouble
              case _ => throw new IllegalArgumentException(
                s"bad fractions entry '$kv': expected name:fraction,...")
            }
          }
        val df2 = lh.catalog.loadTable(str(a, "table_name")).read()
          .withColumn("split", graft.operators.HashSplit.assign(
            org.apache.spark.sql.functions.col(
              strOpt(a, "key").getOrElse("doc_id")), fracs))
        val rows = writeTable(lh, str(a, "target_table"), df2)
        s"assigned $rows rows into splits ${fracs.map(_._1).mkString("/")}"
      }),
    ToolDef("graft_quantize",
      "int8-quantize an embedding column (adds q: array<int> and q_scale: double; 4x smaller, integer-exact cosine); writes the quantized table.",
      sch(List("table_name", "target_table"),
        "table_name" -> S("Source table with an embedding column"),
        "target_table" -> S("Quantized output table"),
        "vec_col" -> S("Embedding column (default embedding)")),
      (lh, a) => {
        val q = graft.vector.Quantize.quantize(
          lh.catalog.loadTable(str(a, "table_name")).read(),
          strOpt(a, "vec_col").getOrElse("embedding"))
        val rows = writeTable(lh, str(a, "target_table"), q)
        s"quantized $rows rows into ${str(a, "target_table")}"
      }),
    ToolDef("graft_dedup_exact_pairs",
      "exact near-duplicate pairs via prefix-filtered Jaccard join (no frequency-cap approximation); writes (id_a, id_b, inter, na, nb, jaccard).",
      sch(List("table_name", "target_table"),
        "table_name" -> S("Document table"),
        "target_table" -> S("Output pair table"),
        "id_col" -> S("Id column (default doc_id)"),
        "text_col" -> S("Text column (default text)"),
        "threshold" -> S("Jaccard threshold (default 0.8)")),
      (lh, a) => {
        val pairs = graft.text.PrefixFilterJoin.jaccardPairs(
          lh.catalog.loadTable(str(a, "table_name")).read(),
          strOpt(a, "id_col").getOrElse("doc_id"),
          strOpt(a, "text_col").getOrElse("text"),
          threshold = strOpt(a, "threshold").map(_.toDouble).getOrElse(0.8))
        val rows = writeTable(lh, str(a, "target_table"), pairs)
        s"found $rows exact near-dup pairs into ${str(a, "target_table")}"
      }),
    ToolDef("graft_pagerank",
      "weighted PageRank over an edge table (src, dst, weight); writes (node, rank) summing to 1.",
      sch(List("table_name", "target_table"),
        "table_name" -> S("Edge table"),
        "target_table" -> S("Output rank table"),
        "src_col" -> S("Source column (default src)"),
        "dst_col" -> S("Destination column (default dst)"),
        "weight_col" -> S("Weight column (default w)"),
        "iters" -> S("Power iterations (default 3)")),
      (lh, a) => {
        val ranks = graft.operators.PageRank.ranks(
          lh.catalog.loadTable(str(a, "table_name")).read(),
          strOpt(a, "src_col").getOrElse("src"),
          strOpt(a, "dst_col").getOrElse("dst"),
          strOpt(a, "weight_col").getOrElse("w"),
          iters = strOpt(a, "iters").map(_.toInt).getOrElse(3))
        val rows = writeTable(lh, str(a, "target_table"), ranks)
        s"ranked $rows nodes into ${str(a, "target_table")}"
      }),
    ToolDef("graft_weighted_sample",
      "Deterministic weighted sampling without replacement (Efraimidis-Spirakis, md5-keyed); writes the k-row sample.",
      sch(List("table_name", "target_table", "weight_col", "k"),
        "table_name" -> S("Source table"),
        "target_table" -> S("Sample output table"),
        "weight_col" -> S("Positive weight column"),
        "k" -> I("Sample size"),
        "id_col" -> S("Id column (default doc_id)"),
        "seed" -> I("Seed (default 0)")),
      (lh, a) => {
        val sample = graft.analytics.WeightedSample.sampleWithoutReplacement(
          lh.catalog.loadTable(str(a, "table_name")).read(),
          org.apache.spark.sql.functions.col(idCol(a)),
          org.apache.spark.sql.functions.col(str(a, "weight_col")),
          k = str(a, "k").toInt,
          seed = strOpt(a, "seed").map(_.toLong).getOrElse(0L))
        val rows = writeTable(lh, str(a, "target_table"), sample)
        s"sampled $rows rows into ${str(a, "target_table")}"
      }),
    ToolDef("graft_kmv_distinct",
      "Deterministic KMV distinct-count sketch of a column (k smallest md5 hashes); returns fill, kth hash, and the integer estimate.",
      sch(List("table_name", "column"),
        "table_name" -> S("Source table"),
        "column" -> S("Column to estimate distinct values of"),
        "k" -> I("Sketch size (default 256)")),
      (lh, a) => {
        val r = graft.analytics.Kmv.distinctEstimate(
          lh.catalog.loadTable(str(a, "table_name")).read(),
          org.apache.spark.sql.functions.col(str(a, "column")),
          k = strOpt(a, "k").map(_.toInt).getOrElse(256)).collect()(0)
        s"kmv(${str(a, "column")}): est=${r.getLong(2)} " +
          s"(fill=${r.getLong(0)}, kth_hash=${r.getLong(1)})"
      }),
    ToolDef("graft_vocab_coverage",
      "Vocabulary coverage thresholds: distinct tokens needed to cover each given percent of token occurrences.",
      sch(List("table_name"),
        "table_name" -> S("Document table"),
        "text_col" -> S("Text column (default text)"),
        "percents" -> S("Comma-separated integer percents (default 50,90,99)")),
      (lh, a) => {
        val pcts = strOpt(a, "percents").getOrElse("50,90,99")
          .split(',').filter(_.nonEmpty).map(_.trim.toInt).toSeq
        val rows = graft.text.Coverage.coverageThresholds(
          lh.catalog.loadTable(str(a, "table_name")).read(), textCol(a), pcts)
          .orderBy("pct").collect()
        rows.map(r => s"${r.getInt(0)}%: ${r.getLong(1)} tokens " +
          s"(${r.getLong(2)} occurrences)").mkString("; ")
      }),
    ToolDef("graft_delete_keys",
      "Merge-on-read EQUALITY delete: drop all rows matching the key table's values without rewriting or even scanning data files; later appends of the same keys survive.",
      sch(List("table_name", "keys_table", "cols"),
        "table_name" -> S("Target table"),
        "keys_table" -> S("Table holding the key values to delete"),
        "cols" -> S("Comma-separated key columns")),
      (lh, a) => {
        val cols = str(a, "cols").split(',').map(_.trim)
          .filter(_.nonEmpty).toSeq
        val matched = lh.catalog.loadTable(str(a, "table_name"))
          .deleteKeysMor(cols,
            lh.catalog.loadTable(str(a, "keys_table")).read())
        s"equality-deleted $matched rows from ${str(a, "table_name")} " +
          "(no data files rewritten)"
      }),
    ToolDef("graft_rename_table",
      "Rename a table (metadata move — no data files copied): reads, time travel, tags, MoR delete state, clone pins and every ident-keyed governance store follow the new name.",
      sch(List("table_name", "new_name"),
        "table_name" -> S("Current table identifier (ns.table)"),
        "new_name" -> S("New identifier (ns.table)")),
      (lh, a) => {
        lh.renameTable(str(a, "table_name"), str(a, "new_name"))
        s"renamed ${str(a, "table_name")} -> ${str(a, "new_name")}"
      }),
    ToolDef("graft_last_touch",
      "Last-touch attribution: credit each conversion to the most recent touch of the same key within the lookback; writes the attribution table.",
      sch(List("table_name", "target_table", "key_col", "ts_col", "tie_col",
          "type_col", "touch_type", "conv_type"),
        "table_name" -> S("Event table"),
        "target_table" -> S("Attribution output table"),
        "key_col" -> S("Entity key column"),
        "ts_col" -> S("Event-time column"),
        "tie_col" -> S("Unique tie-break id column"),
        "type_col" -> S("Event-type column"),
        "touch_type" -> S("Type credited (e.g. click)"),
        "conv_type" -> S("Type converted (e.g. purchase)"),
        "lookback_sec" -> I("Attribution window seconds (default 604800)")),
      (lh, a) => {
        val out = graft.analytics.Attribution.lastTouch(
          lh.catalog.loadTable(str(a, "table_name")).read(),
          str(a, "key_col"), str(a, "ts_col"), str(a, "tie_col"),
          str(a, "type_col"), str(a, "touch_type"), str(a, "conv_type"),
          strOpt(a, "lookback_sec").map(_.toLong).getOrElse(604800L))
        val rows = writeTable(lh, str(a, "target_table"), out)
        s"attributed $rows conversions into ${str(a, "target_table")}"
      }),
    ToolDef("graft_token_entropy",
      "Per-document Shannon entropy of the token distribution in micro-nats (information-density quality signal; ~0 for repeated-token spam); returns the lowest-entropy documents.",
      sch(List("table_name"),
        "table_name" -> S("Document table"),
        "id_col" -> S("Id column (default doc_id)"),
        "text_col" -> S("Text column (default text)"),
        "limit" -> I("Rows returned, lowest entropy first (default 20)")),
      (lh, a) => {
        val rows = graft.text.TextAnalysis.tokenEntropy(
          lh.catalog.loadTable(str(a, "table_name")).read(), idCol(a),
          textCol(a))
          .orderBy("entropy_micro")
          .limit(strOpt(a, "limit").map(_.toInt).getOrElse(20)).collect()
        rows.map(r => s"doc ${r.getLong(0)}: entropy=${r.getLong(4) / 1e6} " +
          s"(${r.getLong(1)} tokens, ${r.getLong(2)} distinct)").mkString("; ")
      }),
    ToolDef("graft_cms_freq",
      "Count-Min sketch frequency estimates (bounded depth x width grid, md5 row hashes — deterministic): estimates for the column's top-N exact values; est >= exact always.",
      sch(List("table_name", "column"),
        "table_name" -> S("Source table"),
        "column" -> S("Column to sketch"),
        "depth" -> I("Grid rows (default 4)"),
        "width" -> I("Grid columns (default 512)"),
        "top" -> I("Probe the top-N values (default 20)")),
      (lh, a) => {
        val c = org.apache.spark.sql.functions.col(str(a, "column"))
        val depth = strOpt(a, "depth").map(_.toInt).getOrElse(4)
        val width = strOpt(a, "width").map(_.toInt).getOrElse(512)
        val df = lh.catalog.loadTable(str(a, "table_name")).read()
        val sk = graft.analytics.Cms.sketch(df, c, depth, width)
        val probes = df.select(c).where(c.isNotNull)
          .groupBy(str(a, "column"))
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("exact_c"))
          .orderBy(org.apache.spark.sql.functions.desc("exact_c"), c)
          .limit(strOpt(a, "top").map(_.toInt).getOrElse(20))
        graft.analytics.Cms.estimates(sk, probes, str(a, "column"),
            depth, width)
          .orderBy(org.apache.spark.sql.functions.desc("est"),
            org.apache.spark.sql.functions.col("key"))
          .collect().map(r => s"${r.get(0)}: est=${r.getLong(1)}")
          .mkString("; ")
      }),
    ToolDef("graft_hybrid_search",
      "Hybrid retrieval: BM25 lexical ranks fused with embedding-cosine ranks by Reciprocal Rank Fusion (integer 1e9 div (60+rank) scores).",
      sch(List("docs_table", "emb_table", "query"),
        "docs_table" -> S("Document table"),
        "emb_table" -> S("Embedding table"),
        "query" -> S("Comma-separated query terms"),
        "query_vec_id" -> I("Query vector id (default 1)"),
        "pool" -> I("Per-ranker candidate pool (default 50)"),
        "top" -> I("Fused results returned (default 20)")),
      (lh, a) => {
        val terms = str(a, "query").split(',').map(_.trim)
          .filter(_.nonEmpty).toSeq
        graft.text.Search.hybridRrf(
          lh.catalog.loadTable(str(a, "docs_table")).read(),
          lh.catalog.loadTable(str(a, "emb_table")).read(),
          "doc_id", "text", "vec_id", "embedding", terms,
          strOpt(a, "query_vec_id").map(_.toLong).getOrElse(1L),
          poolK = strOpt(a, "pool").map(_.toInt).getOrElse(50),
          topN = strOpt(a, "top").map(_.toInt).getOrElse(20))
          .collect().map(r => s"doc ${r.getLong(0)}: rrf=${r.getLong(3)}")
          .mkString("; ")
      }),
    ToolDef("graft_kfold",
      "Deterministic md5-keyed k-fold cross-validation assignment; returns per-fold row counts.",
      sch(List("table_name"),
        "table_name" -> S("Source table"),
        "id_col" -> S("Key column (default doc_id)"),
        "k" -> I("Fold count (default 5)"),
        "seed" -> I("Seed (default 0)")),
      (lh, a) => {
        val fold = graft.operators.HashSplit.kFold(
          org.apache.spark.sql.functions.col(idCol(a)),
          strOpt(a, "k").map(_.toInt).getOrElse(5),
          strOpt(a, "seed").map(_.toLong).getOrElse(0L)).as("fold")
        lh.catalog.loadTable(str(a, "table_name")).read().select(fold)
          .groupBy("fold")
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"))
          .orderBy("fold").collect()
          // null id keys map to a null fold (kFold contract)
          .map(r => s"fold ${if (r.isNullAt(0)) "null" else r.getLong(0)}: " +
            s"${r.getLong(1)} rows")
          .mkString("; ")
      }),
    ToolDef("graft_rrf_batch",
      "Batched hybrid retrieval: Q queries fused in ONE corpus pass (shared postings/df builds, rank windows partitioned by query id). Queries as 'qid:terms:vecid' triples separated by ';' with comma-separated terms.",
      sch(List("docs_table", "emb_table", "queries"),
        "docs_table" -> S("Document table"),
        "emb_table" -> S("Embedding table"),
        "queries" -> S("Batch spec, e.g. '1:hash,join:1;2:scan,filter:2'"),
        "pool" -> I("Per-ranker candidate pool (default 50)"),
        "top" -> I("Fused results per query (default 20)")),
      (lh, a) => {
        val qs = str(a, "queries").split(';').map(_.trim).filter(_.nonEmpty)
          .map { spec =>
            val Array(qid, terms, vid) = spec.split(':')
            (qid.trim.toLong,
              terms.split(',').map(_.trim).filter(_.nonEmpty).toSeq,
              vid.trim.toLong)
          }.toSeq
        graft.text.Search.hybridRrfBatch(
          lh.catalog.loadTable(str(a, "docs_table")).read(),
          lh.catalog.loadTable(str(a, "emb_table")).read(),
          "doc_id", "text", "vec_id", "embedding", qs,
          poolK = strOpt(a, "pool").map(_.toInt).getOrElse(50),
          topN = strOpt(a, "top").map(_.toInt).getOrElse(20))
          .orderBy(org.apache.spark.sql.functions.col("query_id"),
            org.apache.spark.sql.functions.desc("rrf_nano"),
            org.apache.spark.sql.functions.col("doc_id"))
          .collect()
          .map(r => s"q${r.getLong(0)} doc ${r.getLong(1)}: " +
            s"rrf=${r.getLong(4)}")
          .mkString("; ")
      }),
    ToolDef("graft_window_heavy_hitters",
      "Per-window heavy hitters via a Count-Min sketch (bounded depth x width grid per window; integer ceil(n/denom) share screen). Batch twin of the streaming windowedCmsStream path.",
      sch(List("table_name", "ts_col", "key_col"),
        "table_name" -> S("Source table"),
        "ts_col" -> S("Event-time column"),
        "key_col" -> S("Key column to screen"),
        "window" -> S("Window length (default '1 hour')"),
        "denom" -> I("Share denominator: keep keys with count >= ceil(n/denom) (default 8)"),
        "limit" -> I("Max rows printed (default 50)")),
      (lh, a) => {
        import org.apache.spark.sql.functions._
        val df = lh.catalog.loadTable(str(a, "table_name")).read()
        val tsc = str(a, "ts_col"); val keyc = str(a, "key_col")
        val win = strOpt(a, "window").getOrElse("1 hour")
        val sketch = df.where(col(keyc).isNotNull)
          .select(col(tsc), posexplode(array((0 until 4).map(j =>
            graft.analytics.Cms.bucket(col(keyc), j, 512)): _*))
            .as(Seq("j", "bucket")))
          .groupBy(window(col(tsc), win), col("j"), col("bucket"))
          .agg(count(lit(1)).as("cnt"))
        graft.analytics.Cms.windowedHeavyHitters(sketch,
            df.select(col(keyc)), keyc,
            denom = strOpt(a, "denom").map(_.toInt).getOrElse(8))
          .orderBy(desc("est"), col("key"))
          .limit(strOpt(a, "limit").map(_.toInt).getOrElse(50))
          .collect()
          .map(r => s"${r.getStruct(0).getTimestamp(0)} key=${r.get(1)}: " +
            s"est=${r.getLong(3)}/${r.getLong(2)}")
          .mkString("; ")
      }),
    ToolDef("graft_novelty",
      "Per-doc n-gram novelty of a candidate table against a reference corpus (distinct-gram equi-join, integer ppm) — the 'how much NEW content does this batch add' admission signal.",
      sch(List("cand_table", "ref_table"),
        "cand_table" -> S("Candidate document table"),
        "ref_table" -> S("Reference corpus table"),
        "n" -> I("Gram size (default 3)"),
        "limit" -> I("Max rows returned (default 20)")),
      (lh, a) => {
        import org.apache.spark.sql.functions._
        graft.text.Drift.ngramNovelty(
          lh.catalog.loadTable(str(a, "cand_table")).read(),
          lh.catalog.loadTable(str(a, "ref_table")).read(),
          "doc_id", "text", n = strOpt(a, "n").map(_.toInt).getOrElse(3))
          .orderBy(desc("novelty_ppm"), col("doc_id"))
          .limit(strOpt(a, "limit").map(_.toInt).getOrElse(20))
          .collect()
          .map(r => s"doc ${r.getLong(0)}: ${r.getLong(3)} ppm " +
            s"(${r.getLong(2)}/${r.getLong(1)})")
          .mkString("; ")
      }),
    ToolDef("graft_ann_recall",
      "ANN index quality: per-query recall@k of IVF cluster probing vs the exact brute-force top-k over an embedding table.",
      sch(List("emb_table"),
        "emb_table" -> S("Embedding table (vec_id, embedding)"),
        "k" -> I("Top-k depth (default 10)"),
        "queries" -> I("Query ids 0..N used as the query set (default 10)"),
        "clusters" -> I("IVF cluster count (default 8)"),
        "probes" -> I("Clusters probed per query (default 2)"),
        "dims" -> I("Embedding dims (default 64)")),
      (lh, a) => {
        import org.apache.spark.sql.functions._
        val e = lh.catalog.loadTable(str(a, "emb_table")).read()
        val k = strOpt(a, "k").map(_.toInt).getOrElse(10)
        val queries = e.where(col("vec_id") <=
            strOpt(a, "queries").map(_.toLong).getOrElse(10L))
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val corpus = e.select(col("vec_id").as("nid"), col("embedding").as("ne"))
        val centroids = graft.vector.KMeansIvf.train(e, "vec_id", "embedding",
          k = strOpt(a, "clusters").map(_.toInt).getOrElse(8),
          dims = strOpt(a, "dims").map(_.toInt).getOrElse(64), iters = 3)
        val exact = graft.vector.VectorOps.bruteForceTopK(queries, corpus, k)
          .select("qid", "nid")
        val approx = graft.vector.KMeansIvf.topK(queries, corpus, k,
            centroids, probes = strOpt(a, "probes").map(_.toInt).getOrElse(2))
          .select(col("qid"), col("nid"), lit(1).as("__hit"))
        exact.join(approx, Seq("qid", "nid"), "left")
          .groupBy("qid")
          .agg(count(lit(1)).as("k_exact"),
            sum(when(col("__hit").isNotNull, 1L).otherwise(0L)).as("n_hit"))
          .orderBy("qid")
          .collect()
          .map(r => s"q${r.getLong(0)}: ${r.getLong(2)}/${r.getLong(1)}")
          .mkString("; ")
      }),
    ToolDef("graft_compact_small",
      "PARTIAL compaction: rewrite only the data files at or below max_bytes into target_files files; larger files are carried forward untouched — fixes the small-files problem at O(small files) cost instead of full compaction's O(table) rewrite. Position-delete bookkeeping stays exact; aborts if a concurrent commit overtakes the rewrite.",
      sch(List("table", "max_bytes"),
        "table" -> S("Table identifier (namespace.table)"),
        "max_bytes" -> I("Rewrite files at or below this size in bytes"),
        "target_files" -> I("Output file count for the rewritten set (default 1)")),
      (lh, a) => {
        val s = lh.catalog.loadTable(str(a, "table")).compactSmall(
          str(a, "max_bytes").toLong,
          strOpt(a, "target_files").map(_.toInt).getOrElse(1))
        s"snapshot ${s.id}: ${s.summary.getOrElse("compacted-files", "0")} " +
          s"small files rewritten, ${s.summary.getOrElse("kept-files", "?")} kept"
      }),
    ToolDef("graft_changelog",
      "Commit-replay changelog: per-commit insert/delete record counts over a snapshot-id range (appends replay manifest-level from added files; rewrites via snapshot diffs). Omit from_snapshot to replay from the beginning; omit to_snapshot for the current head.",
      sch(List("table"),
        "table" -> S("Table identifier (namespace.table)"),
        "from_snapshot" -> I("Exclusive lower snapshot id (omit = beginning)"),
        "to_snapshot" -> I("Inclusive upper snapshot id (omit = head)")),
      (lh, a) => {
        val tbl = lh.catalog.loadTable(str(a, "table"))
        strOpt(a, "to_snapshot").map(_.toLong)
          .orElse(tbl.currentSnapshot.map(_.id)) match {
          case None => "empty table"
          case Some(to) =>
            val rows = graft.streaming.Changelog
              .changesBetween(tbl, strOpt(a, "from_snapshot").map(_.toLong), to)
              .groupBy(graft.streaming.Changelog.CommitIdCol,
                graft.streaming.Changelog.ChangeTypeCol)
              .count()
              .orderBy(graft.streaming.Changelog.CommitIdCol,
                graft.streaming.Changelog.ChangeTypeCol)
              .collect()
            if (rows.isEmpty) "no changes in range"
            else rows.map(r => s"commit ${r.getLong(0)}: ${r.getString(1)} " +
              s"${r.getLong(2)} rows").mkString("\n")
        }
      }),
    ToolDef("graft_wap_publish",
      "Write-audit-publish: atomically publish (or with action=discard, drop) a staged commit created by stage_append. Until publish the staged rows are invisible to every reader; publish is a zero-copy fast-forward append that commutes with concurrent appends. action=list shows staged commits.",
      sch(List("table", "action"),
        "table" -> S("Table identifier (namespace.table)"),
        "action" -> S("publish | discard | list"),
        "wap_id" -> S("Staged commit id (required for publish/discard)")),
      (lh, a) => {
        val tbl = lh.catalog.loadTable(str(a, "table"))
        str(a, "action") match {
          case "publish" =>
            val s = tbl.publishWap(str(a, "wap_id"))
            s"published wap '${str(a, "wap_id")}' as snapshot ${s.id}"
          case "discard" =>
            tbl.discardWap(str(a, "wap_id")); s"discarded '${str(a, "wap_id")}'"
          case "list" =>
            val staged = tbl.stagedCommits
            if (staged.isEmpty) "no staged commits"
            else staged.map(sc => s"${sc.wapId}: ${sc.rows} rows").mkString("\n")
          case other => throw new IllegalArgumentException(s"bad action: $other")
        }
      }),
    ToolDef("graft_compact_deletes",
      "DELETE-FILE compaction: fold all accumulated equality-delete entries and position-delete files into ONE freshly-written position-delete file, touching no data file — restores the merge-on-read plan to a single anti-join after many streaming delete commits. Aborts if a concurrent commit lands mid-fold.",
      sch(List("table"),
        "table" -> S("Table identifier (namespace.table)")),
      (lh, a) => lh.catalog.loadTable(str(a, "table")).compactDeletes() match {
        case Some(s) =>
          s"snapshot ${s.id}: ${s.summary.getOrElse("compacted-delete-files", "?")} " +
            s"delete files/entries folded into ${s.deleteFiles.size} " +
            s"(${s.summary.getOrElse("folded-delete-rows", "?")} dead rows)"
        case None => "nothing to fold"
      }),
    ToolDef("graft_tag_snapshot",
      "Create, list or delete named snapshot tags. A tagged snapshot is pinned: expire_snapshots never drops it, and the tag name works anywhere a time-travel ref does (query-asof, rollback). Tag the snapshot a model trained on to keep that exact table state reproducible.",
      sch(List("table", "action"),
        "table" -> S("Table identifier (namespace.table)"),
        "action" -> S("'create' | 'list' | 'delete'"),
        "name" -> S("Tag name (required for create/delete; must not look like a snapshot id or timestamp)"),
        "ref" -> S("Snapshot ref to tag (create only; default: current snapshot)")),
      (lh, a) => {
        val t = lh.catalog.loadTable(str(a, "table"))
        str(a, "action") match {
          case "create" =>
            val id = t.tagSnapshot(str(a, "name"), strOpt(a, "ref"))
            s"tagged snapshot $id as '${str(a, "name")}'"
          case "list" =>
            if (t.tags.isEmpty) "no tags"
            else t.tags.toSeq.sortBy(_._1)
              .map { case (n, id) => s"$n -> $id" }.mkString("; ")
          case "delete" =>
            t.removeTag(str(a, "name")); s"deleted tag '${str(a, "name")}'"
          case other => s"unknown action: $other"
        }
      }),
    ToolDef("graft_evolve_partition_spec",
      "Partition-spec EVOLUTION (metadata-only): future writes use the new spec; existing files keep their old layout and are never rewritten — reads prune each file by the spec era it was written under. Use compact to migrate old files when desired.",
      sch(List("table", "spec"),
        "table" -> S("Table identifier (namespace.table)"),
        "spec" -> S("New partition spec, ';'-separated transforms, e.g. 'day(ts);bucket(16,user_id)'; empty string un-partitions")),
      (lh, a) => {
        val parts = str(a, "spec").split(';').map(_.trim)
          .filter(_.nonEmpty).toSeq
        val m = lh.catalog.loadTable(str(a, "table"))
          .updatePartitionSpec(parts)
        s"partition spec -> [${m.partitionSpec.mkString(", ")}], " +
          s"${m.previousPartitionSpecs.size} previous era(s) retained for pruning"
      }),
  )

  /** Reference-mirrored tools only (155, 1:1 with server.py). */
  val referenceTools: List[ToolDef] = queryTools ++ dmlTools ++ ioTools ++
    statsTools ++ queryMgmtTools ++ governanceTools ++ analyticsTools ++
    maintenanceTools ++ orchestrationTools ++ metadataTools ++ contractTools

  val all: List[ToolDef] = referenceTools ++ trainingTools

  val byName: Map[String, ToolDef] = {
    val m = all.map(t => t.name -> t).toMap
    require(m.size == all.size, "duplicate tool names")
    m
  }
}
