package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{array, col, count, desc, lit, posexplode, sum, when, window}
import org.json4s.jackson.JsonMethods

import graft.{Fixtures, Lakehouse}
import graft.core.TableMeta
import graft.dml.BatchOp
import graft.governance.{Contract, MaskingPolicy, NotificationHandler, SlaPolicy, ValidationRule}
import graft.orchestration.{MaintenancePolicy, PipelineStep, RetentionPolicy}

/** CLI mirroring the reference's verb surface (reference cli.py, ~170 Click
  * commands over the same modules). One process per invocation, local
  * SparkSession, warehouse from `--warehouse` or `GRAFT_WAREHOUSE`
  * (default `~/.graft/warehouse` — the analogue of `~/.lakehouse`).
  *
  * Usage: `graft.api.Cli <command> [args...]`; run with no args for help.
  */
object Cli {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { println(help); return }
    val (flags, pos) = parseFlags(args.toList)
    val warehouse = flags.getOrElse("warehouse",
      sys.env.getOrElse("GRAFT_WAREHOUSE",
        sys.props("user.home") + "/.graft/warehouse"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lh = Lakehouse.open(spark, warehouse)
    try run(lh, pos, flags)
    catch {
      case e: Exception =>
        System.err.println(s"error: ${e.getMessage}")
        sys.exit(1)
    } finally spark.stop()
  }

  private[api] def run(lh: Lakehouse, pos: List[String],
      flags: Map[String, String]): Unit = {
    def maxRows = flags.getOrElse("max-rows", "100").toInt
    def keys = flags.getOrElse("keys", "").split(',').filter(_.nonEmpty).toSeq
    def show(df: DataFrame): Unit = df.show(maxRows, truncate = false)

    pos match {
      // ---- catalog --------------------------------------------------------
      case List("init") => println(s"warehouse ready at ${lh.warehouseDir}")
      case List("serve") =>
        // reference cli.py serve: run the MCP protocol loop on stdio
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(System.in))
        McpServer.serve(lh, () => Option(in.readLine()), println(_))
      case List("join", sql) =>
        // reference cli.py join: federated join SQL, optionally --into a table
        flags.get("into") match {
          case Some(target) =>
            // maxRows=0: no limit node — limit(Int.MaxValue) would funnel
            // the whole result through one partition before the write
            val result = lh.engine.executeJoin(sql, 0)
            if (!lh.catalog.tableExists(target))
              lh.catalog.createTable(target, result.schema, Nil, Map.empty)
            val snap = lh.catalog.loadTable(target).overwrite(result)
            println(s"wrote ${snap.totalRows} rows to $target")
          case None => show(lh.engine.executeJoin(sql, maxRows))
        }
      case List("namespaces") => lh.catalog.listNamespaces().foreach(println)
      case List("namespace-create", ns) => lh.catalog.createNamespace(ns)
      case List("namespace-drop", ns) => lh.catalog.dropNamespace(ns)
      case List("tables") => lh.catalog.listTables("*").foreach(println)
      case List("tables", ns) => lh.catalog.listTables(ns).foreach(println)
      case List("create-table", ident, cols) =>
        val parsed = cols.split(',').map { c =>
          val Array(n, t) = c.split(':'); (n, t)
        }.toSeq
        val parts = flags.get("partition").toSeq
        lh.catalog.createTable(ident, parsed, parts, Map.empty)
        println(s"created $ident")
      case List("describe", ident) =>
        val tbl = lh.catalog.loadTable(ident)
        tbl.schema.fields.foreach(f => println(
          s"${f.name}\t${f.dataType.typeName}\tid=${TableMeta.fieldId(f).getOrElse(-1)}"))
        println(s"partitions: ${tbl.meta.partitionSpec.mkString(", ")}")
        println(s"snapshots: ${tbl.snapshots.size}")
      case List("drop-table", ident) => lh.catalog.dropTable(ident)
      case List("set-property", ident, k, v) =>
        lh.catalog.loadTable(ident).setProperty(k, v)
      case List("properties", ident) =>
        lh.catalog.loadTable(ident).meta.properties.foreach { case (k, v) =>
          println(s"$k=$v") }
      case List("create-samples") =>
        Fixtures.createSampleTables(lh); Fixtures.insertSampleData(lh)
        println("sample tables created")

      // ---- query ----------------------------------------------------------
      case List("query", sql) => show(lh.engine.execute(sql, maxRows))
      case List("query-asof", table, sql, ref) =>
        show(lh.engine.executeAsOf(table, sql, ref, maxRows))
      case List("suggest-joins") =>
        lh.engine.suggestJoins().foreach { case (a, b, c, sql) =>
          println(s"$a JOIN $b ON $c\n  $sql") }

      // ---- dml ------------------------------------------------------------
      case List("insert", table, rowsJson) =>
        println(s"inserted ${lh.dml.insertRows(table, parseRows(rowsJson))}")
      case List("update", table, filter, setJson) =>
        println(s"updated ${lh.dml.update(table, filter, parseRow(setJson))}")
      case List("delete", table, filter) =>
        println(s"deleted ${lh.dml.delete(table, filter)}")
      case List("upsert", table, rowsJson) =>
        val r = lh.dml.upsertRows(table, parseRows(rowsJson), keys)
        println(s"inserted=${r.inserted} updated=${r.updated}")

      // ---- snapshots ------------------------------------------------------
      case List("snapshots", table) =>
        lh.catalog.loadTable(table).snapshots.foreach(s => println(
          s"${s.id}\t${java.time.Instant.ofEpochMilli(s.timestampMs)}\t" +
            s"${s.operation}\trows=${s.totalRows}\tfiles=${s.files.size}"))
      case List("rollback", table, ref) =>
        println(s"rolled back to snapshot ${lh.catalog.loadTable(table).rollbackTo(ref).id}")
      case List("expire", table) =>
        val expired = lh.catalog.loadTable(table).expireSnapshots(
          flags.get("older-than"), flags.get("retain-last").map(_.toInt))
        println(s"expired ${expired.mkString(", ")}")
      case List("tag-create", table, name) =>
        val id = lh.catalog.loadTable(table).tagSnapshot(name, flags.get("ref"))
        println(s"tagged snapshot $id as '$name'")
      case List("tag-list", table) =>
        lh.catalog.loadTable(table).tags.toSeq.sortBy(_._1)
          .foreach { case (n, id) => println(s"$n\t$id") }
      case List("tag-delete", table, name) =>
        lh.catalog.loadTable(table).removeTag(name)
        println(s"deleted tag '$name'")

      // ---- io -------------------------------------------------------------
      case List("changelog", table) =>
        // per-commit insert/delete record counts over a snapshot range
        val tbl = lh.catalog.loadTable(table)
        flags.get("to").map(_.toLong)
          .orElse(tbl.currentSnapshot.map(_.id)) match {
          case None => println("empty table")
          case Some(to) =>
            graft.streaming.Changelog
              .changesBetween(tbl, flags.get("from").map(_.toLong), to)
              .groupBy(graft.streaming.Changelog.CommitIdCol,
                graft.streaming.Changelog.ChangeTypeCol)
              .count()
              .orderBy(graft.streaming.Changelog.CommitIdCol,
                graft.streaming.Changelog.ChangeTypeCol)
              .collect()
              .foreach(r => println(s"commit ${r.getLong(0)}: " +
                s"${r.getString(1)} ${r.getLong(2)} rows"))
        }
      // ---- write-audit-publish (staged commits) --------------------------
      case List("wap-stage", table, file) =>
        val sc = lh.catalog.loadTable(table).stageAppend(
          lh.importExport.readFile(file, flags.get("format")),
          flags.getOrElse("wap-id",
            s"wap-${System.currentTimeMillis()}"))
        println(s"staged ${sc.rows} rows (${sc.files} files) as " +
          s"wap id '${sc.wapId}' — invisible until wap-publish")
      case List("wap-list", table) =>
        val staged = lh.catalog.loadTable(table).stagedCommits
        if (staged.isEmpty) println("no staged commits")
        else staged.foreach(sc =>
          println(s"${sc.wapId}: ${sc.rows} rows, ${sc.files} files, " +
            s"staged ${java.time.Instant.ofEpochMilli(sc.createdMs)}"))
      case List("wap-publish", table, wapId) =>
        val s = lh.catalog.loadTable(table).publishWap(wapId)
        println(s"published wap '$wapId' as snapshot ${s.id} " +
          s"(${s.summary.getOrElse("added-rows", "?")} rows)")
      case List("wap-discard", table, wapId) =>
        lh.catalog.loadTable(table).discardWap(wapId)
        println(s"discarded staged wap '$wapId'")
      case List("import", file, table) =>
        println(s"imported ${lh.importExport.importFile(file, table,
          flags.getOrElse("if-exists", "fail"))}")
      case List("export", table, path) =>
        println(s"exported ${lh.importExport.exportTable(table, path,
          flags.getOrElse("format", "csv"), flags.get("where"),
          flags.getOrElse("columns", "").split(',').filter(_.nonEmpty).toSeq,
          flags.get("limit").map(_.toInt))}")
      case List("backup", table, target) =>
        println(s"backed up, sha256=${lh.backup.backupTable(table, target).sha256}")
      case List("restore", tarGz, table) =>
        println(s"restored ${lh.backup.restoreTable(tarGz, table,
          flags.contains("overwrite"))}")
      case List("verify-backup", tarGz) =>
        println(if (lh.backup.verifyBackup(tarGz)) "OK" else "CORRUPT")
      case List("backup-ns", ns, dir) =>
        // reference `backup create-ns`: one archive per table in the namespace
        lh.catalog.listTables(ns).foreach { t =>
          val target = java.nio.file.Paths.get(dir,
            s"${t.replace('.', '_')}.tar.gz").toString
          val m = lh.backup.backupTable(t, target)
          println(s"$t -> $target (rows=${m.rowCount})")
        }

      // ---- analytics ------------------------------------------------------
      case List("profile", table) =>
        val p = lh.profile.profileTable(table)
        println(s"rows=${p.rowCount}")
        p.columns.foreach(c => println(
          s"${c.name}\tnulls=${c.nullCount}\tdistinct=${c.distinctCount}" +
            c.mean.map(m => f"\tmean=$m%.3f").getOrElse("") +
            c.min.map(m => s"\tmin=$m").getOrElse("") +
            c.max.map(m => s"\tmax=$m").getOrElse("")))
      case List("stats", table) =>
        val s = lh.profile.computeStats(table)
        println(s"rows=${s.rowCount} files=${s.fileCount} bytes=${s.totalBytes} " +
          s"snapshots=${s.snapshotCount} stale=${lh.profile.isStatsStale(table)}")
      case List("dedup-find", table) =>
        show(lh.dedup.findDuplicates(lh.catalog.loadTable(table).read(), keys))
      case List("dedup-remove", table) =>
        println(s"removed ${lh.dedup.removeDuplicates(table, keys,
          flags.getOrElse("keep", "first"))}")
      case List("sample", table, fraction) =>
        show(lh.sampling.randomSample(lh.catalog.loadTable(table).read(),
          fraction.toDouble, flags.getOrElse("seed", "42").toLong))
      case List("quality", table) =>
        val q = lh.quality.computeScore(table)
        println(f"score=${q.score}%.3f completeness=${q.completeness}%.3f " +
          f"uniqueness=${q.uniqueness}%.3f freshness=${q.freshness}%.3f " +
          f"rules=${q.ruleCompliance}%.3f")
        q.recommendations.foreach(r => println(s"  - $r"))
      case List("anomalies", table) =>
        lh.quality.detectAnomalies(table).foreach(a =>
          println(s"[${a.severity}] ${a.kind}: ${a.message}"))

      // ---- cdc / incremental ---------------------------------------------
      case List("changes", table) =>
        show(lh.cdc.getChanges(table, flags.get("from"), flags.get("to"), keys))
      case List("change-log", table) =>
        lh.cdc.changeLog(table, keys).foreach { case (f, t, s) =>
          println(s"$f -> $t: $s") }
      case List("incremental", pipeline, table) =>
        val b = lh.incremental.getIncrementalData(pipeline, table)
        println(s"full=${b.isFull} from=${b.fromSnapshot} to=${b.toSnapshot} " +
          s"rows=${b.data.count()}")

      // ---- orchestration --------------------------------------------------
      case List("view-create", name, sql) => lh.views.create(name, sql)
      case List("views") => lh.views.list().foreach(v => println(s"${v.name}: ${v.sql}"))
      case List("view-query", name) => show(lh.views.query(name, maxRows))
      case List("matview-create", name, sql) =>
        println(s"materialized ${lh.matviews.create(name, sql).rowCount} rows")
      case List("matview-refresh", name) =>
        println(s"refreshed ${lh.matviews.refresh(name).rowCount} rows")
      case List("matview-fresh", name) =>
        println(if (lh.matviews.isStale(name)) "STALE" else "FRESH")
      case List("pipeline-create", name, stepsJson) =>
        val steps = JsonMethods.parse(stepsJson).values.asInstanceOf[List[Map[String, Any]]]
          .map(m => PipelineStep(m("sql").toString,
            m.get("target_table").map(_.toString),
            m.getOrElse("mode", "overwrite").toString))
        lh.pipelines.create(name, steps)
      case List("pipeline-run", name) =>
        lh.pipelines.run(name, flags.contains("incremental")).foreach(r =>
          println(s"step ${r.step}: ${r.status} rows=${r.rows} ${r.message}"))
      case List("pipeline-dry-run", name) =>
        lh.pipelines.dryRun(name).foreach(r =>
          println(s"step ${r.step}: ${r.status} ${r.message}"))
      case List("pipelines") => lh.pipelines.list().foreach(p =>
        println(s"${p.name}: ${p.steps.size} steps, last=${p.lastRunStatus}"))
      case List("lineage", table) =>
        println("upstream:")
        lh.lineage.upstream(table).foreach { case (t, d) => println(s"  $d: $t") }
        println("downstream:")
        lh.lineage.downstream(table).foreach { case (t, d) => println(s"  $d: $t") }
      case List("maintain") =>
        lh.maintenance.runAll(flags.contains("dry-run")).foreach(a =>
          println(s"${a.table}: ${a.action} (${a.detail})"))
      case List("retention-set", table) =>
        lh.retention.setPolicy(RetentionPolicy(table,
          flags.get("max-age-hours").map(_.toDouble),
          flags.get("max-snapshots").map(_.toInt),
          flags.getOrElse("min-keep", "1").toInt))
      case List("retention-remove", table) =>
        println(if (lh.retention.removePolicy(table)) "removed"
        else s"no retention policy for $table")
      case List("maintain-remove", table) =>
        println(if (lh.maintenance.removePolicy(table)) "removed"
        else s"no maintenance policy for $table")
      case List("auto-refresh", table) =>
        lh.autoRefresh.trigger(table).foreach(s =>
          println(s"${s.kind} ${s.name}: ${s.status}"))

      // ---- governance -----------------------------------------------------
      case List("rule-add", id, table, ruleType) =>
        lh.validation.addRule(ValidationRule(id, table, ruleType,
          keys.toList, parseRow(flags.getOrElse("params", "{}"))
            .map { case (k, v) => k -> String.valueOf(v) }))
      case List("rules") => lh.validation.listRules().foreach(println)
      case List("rule-drop", id) => lh.validation.dropRule(id)
      case List("mask-set", column, strategy) =>
        lh.masking.setPolicy(MaskingPolicy(column, strategy,
          parseRow(flags.getOrElse("params", "{}"))
            .map { case (k, v) => k -> String.valueOf(v) }))
      case List("mask-query", sql) =>
        show(lh.masking.apply(lh.engine.execute(sql, maxRows)))
      case List("contract-generate", table) =>
        val c = lh.contracts.generateFromProfile(table)
        println(s"${c.columns.size} columns, ${c.constraints.size} constraints")
        lh.contracts.create(c)
      case List("contract-monitor", table) =>
        val r = lh.contracts.monitor(table)
        println(f"score=${r.score}%.3f schema=${r.schemaScore}%.2f " +
          f"constraints=${r.constraintScore}%.2f")
        r.checks.filterNot(_.passed).foreach(c =>
          println(s"  FAIL ${c.kind} ${c.subject}: ${c.message}"))
      case List("sla-set", table) =>
        lh.sla.setPolicy(SlaPolicy(table,
          flags.get("max-staleness-hours").map(_.toDouble),
          flags.get("min-quality").map(_.toDouble),
          flags.get("min-rows").map(_.toLong),
          flags.get("max-null-pct").map(_.toDouble)))
      case List("sla-check", table) =>
        val vs = lh.sla.check(table)
        if (vs.isEmpty) println("OK")
        else vs.foreach(v => println(s"[${v.level}] ${v.check}: ${v.message}"))
      case List("tag", table, tag) => lh.tagging.addTag(table, tag)
      case List("search", q) => lh.tagging.search(q).foreach(println)
      case List("classify", table, column, cls) =>
        lh.catalogMetadata.classify(table, column, cls)
      case List("schema-enriched", table) =>
        lh.catalogMetadata.enrichedSchema(table).foreach(m => println(
          s"${m("name")}\t${m("type")}\t${m("classification")}\t${m("description")}"))
      case List("notify-add", table, event, kind, target) =>
        lh.notifications.addHandler(NotificationHandler(table, event, kind, target))
      case List("audit") => lh.audit.entries().takeRight(maxRows).foreach(e =>
        println(s"${java.time.Instant.ofEpochMilli(e.timestampMs)}\t${e.table}\t" +
          s"${e.operation}\t${e.details}"))
      case List("clone", original, target) =>
        lh.cloning.clone(original, target, flags.get("as-of"),
          zeroCopy = flags.contains("zero-copy"))
        println(s"cloned $original -> $target" +
          (if (flags.contains("zero-copy")) " (zero-copy)" else ""))
      case List("clone-promote", name) => lh.cloning.promote(name,
        requireSourceUnchanged = flags.contains("require-unchanged"))
      case List("rename-table", from, to) =>
        lh.renameTable(from, to)
        println(s"renamed $from -> $to")
      case List("advisor-partitions", table) =>
        lh.advisor.suggestPartitions(table).foreach(s =>
          println(f"${s.column}: distinct=${s.distinct} benefit=${s.benefit}%.3f"))
      case List("advisor-cost", sql) =>
        val c = lh.advisor.estimateCost(sql)
        println(s"rows≈${c.estimatedRows} complexity=${c.complexity}")

      // ---- schema evolution (cli.py alter group) --------------------------
      case List("alter-add-column", ident, name, typeName) =>
        lh.catalog.loadTable(ident).addColumn(name, typeName)
        println(s"added $name:$typeName")
      case List("alter-drop-column", ident, name) =>
        lh.catalog.loadTable(ident).dropColumn(name)
        println(s"dropped $name")
      case List("alter-rename-column", ident, from, to) =>
        lh.catalog.loadTable(ident).renameColumn(from, to)
        println(s"renamed $from -> $to")
      case List("alter-partition-spec", ident, spec) =>
        // partition EVOLUTION: metadata-only, old files keep their layout
        val parts = spec.split(';').map(_.trim).filter(_.nonEmpty).toSeq
        val m = lh.catalog.loadTable(ident).updatePartitionSpec(parts)
        println(s"partition spec -> ${m.partitionSpec.mkString(", ")} " +
          s"(previous eras: ${m.previousPartitionSpecs.size})")
      case List("alter-get-property", ident, k) =>
        println(lh.catalog.loadTable(ident).meta.properties.getOrElse(k, ""))
      case List("alter-remove-property", ident, k) =>
        lh.catalog.loadTable(ident).removeProperty(k)

      // ---- table maintenance (cli.py compact/cleanup/maintenance-status) --
      case List("compact", table) =>
        val clusterBy = flags.get("cluster-by").toSeq
          .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
        val s = lh.catalog.loadTable(table)
          .compact(flags.getOrElse("target-files", "1").toInt, clusterBy)
        println(s"compacted to ${s.files.size} files (snapshot ${s.id})" +
          (if (clusterBy.nonEmpty) s", clustered by ${clusterBy.mkString(",")}"
           else ""))
      case List("compact-small", table, maxBytes) =>
        // partial compaction: rewrite only files <= maxBytes
        val s = lh.catalog.loadTable(table).compactSmall(maxBytes.toLong,
          flags.getOrElse("target-files", "1").toInt)
        println(s"snapshot ${s.id}: " +
          s"${s.summary.getOrElse("compacted-files", "0")} small files " +
          s"rewritten, ${s.summary.getOrElse("kept-files", "?")} kept")
      case List("compact-deletes", table) =>
        // fold all eq-delete entries + position-delete files into ONE
        // position-delete file; data files untouched
        lh.catalog.loadTable(table).compactDeletes() match {
          case Some(s) => println(s"snapshot ${s.id}: " +
            s"${s.summary.getOrElse("compacted-delete-files", "?")} delete " +
            s"files/entries folded into ${s.deleteFiles.size} " +
            s"(${s.summary.getOrElse("folded-delete-rows", "?")} dead rows)")
          case None => println("nothing to fold")
        }
      case List("cleanup", table) =>
        val orphans = lh.catalog.loadTable(table)
          .orphanFiles(delete = !flags.contains("dry-run"))
        println(s"${orphans.size} orphan files" +
          (if (flags.contains("dry-run")) " (dry run)" else " removed"))
      case List("maintenance-status", table) =>
        val tbl = lh.catalog.loadTable(table)
        val snap = tbl.currentSnapshot
        println(s"data_files=${snap.map(_.files.size).getOrElse(0)} " +
          s"total_bytes=${snap.map(_.totalBytes).getOrElse(0L)} " +
          s"snapshots=${tbl.snapshots.size} " +
          s"orphan_files=${tbl.orphanFiles(delete = false).size}")
      case List("maintain-set", table) =>
        lh.maintenance.setPolicy(MaintenancePolicy(table,
          flags.getOrElse("compact-threshold", "10").toInt,
          flags.getOrElse("retain", "5").toInt,
          !flags.contains("no-orphan-cleanup")))
      case List("maintain-show", table) =>
        val p = lh.maintenance.policy(table)
        println(s"compact_threshold=${p.compactFileThreshold} " +
          s"retain=${p.snapshotRetain} orphan_cleanup=${p.orphanCleanup}")
      case List("maintain-table", table) =>
        lh.maintenance.maintainTable(table, flags.contains("dry-run")).foreach(a =>
          println(s"${a.action}: ${a.detail}"))
      case List("retention-show", table) =>
        lh.retention.policy(table) match {
          case Some(p) => println(s"max_age_hours=${p.maxAgeHours.getOrElse("-")} " +
            s"max_snapshots=${p.maxSnapshots.getOrElse("-")} min_keep=${p.minKeep}")
          case None => println("no policy")
        }
      case List("retention-check", table) =>
        println(s"would expire: ${lh.retention.evaluate(table, dryRun = true).mkString(", ")}")
      case List("retention-run", table) =>
        println(s"expired: ${lh.retention.evaluate(table, dryRun = false).mkString(", ")}")

      // ---- partitions -----------------------------------------------------
      case List("partitions", table) =>
        lh.catalog.loadTable(table).partitionStats.keys.toList.sorted.foreach(println)
      case List("partition-stats", table) =>
        lh.catalog.loadTable(table).partitionStats.toList.sortBy(_._1).foreach {
          case (p, (files, rows, bytes)) =>
            println(s"$p\tfiles=$files\trows=$rows\tbytes=$bytes") }

      // ---- dashboard ------------------------------------------------------
      case List("dashboard") =>
        val r = lh.dashboard.report()
        println(s"warehouse: ${r.storagePath}")
        println(s"namespaces: ${r.namespaces.mkString(", ")}")
        println(s"tables: ${r.totalTables} total ${r.totalSizeDisplay}")
        r.tables.foreach(t => println(
          s"  ${t.name}\trows=${t.rows}\t${t.sizeDisplay}\tfiles=${t.dataFiles}\t${t.health}"))
        println(s"saved queries: ${r.savedQueriesCount}, history: ${r.historyEntriesCount}")
        r.recentActivity.foreach(e => println(s"  recent: ${e.operation} ${e.table}"))

      // ---- snapshot diff / batch ------------------------------------------
      case List("diff", table) =>
        val (added, removed) = lh.cdc.snapshotDiff(table, flags.get("from"), flags.get("to"))
        println("added:"); show(added)
        println("removed:"); show(removed)
      case List("batch", opsJson) =>
        val ops = JsonMethods.parse(opsJson).values.asInstanceOf[List[Map[String, Any]]]
          .map(m => BatchOp(m("op").toString, m("table").toString,
            m.get("rows").map(_.asInstanceOf[List[Map[String, Any]]].toSeq).getOrElse(Nil),
            m.getOrElse("filter", "").toString,
            m.get("set").map(_.asInstanceOf[Map[String, Any]]).getOrElse(Map.empty),
            m.get("keys").map(_.asInstanceOf[List[String]].toSeq).getOrElse(Nil)))
        lh.dml.executeBatch(ops).foreach(r =>
          println(s"${r.op} ${r.table}: ${r.status} count=${r.count} ${r.message}"))

      // ---- saved queries + history (cli.py query-save et al.) -------------
      case List("query-save", name, sql) =>
        lh.savedQueries.save(name, sql, flags.getOrElse("description", ""))
      case List("query-list") => lh.savedQueries.list().foreach(q =>
        println(s"${q.name}: ${q.sql}"))
      case List("query-run", name) => show(lh.savedQueries.runSaved(name, maxRows))
      case List("query-delete", name) => lh.savedQueries.drop(name)
      case List("query-history") =>
        lh.savedQueries.history().takeRight(maxRows).foreach(h =>
          println(f"${h.sql}\trows=${h.rows}\t${h.durationSec}%.3fs"))

      // ---- query cache ----------------------------------------------------
      case List("cache-query", sql) =>
        val (rows, hit) = lh.queryCache.execute(sql, maxRows)
        println(if (hit) "(cache hit)" else "(cache miss)")
        rows.foreach(println)
      case List("cache-stats") =>
        val s = lh.queryCache.stats
        println(s"hits=${s.hits} misses=${s.misses} entries=${s.entries}")
      case List("cache-clear") => lh.queryCache.invalidateAll()

      // ---- cdc extras -----------------------------------------------------
      case List("change-summary", table) =>
        lh.cdc.changeSummary(table, flags.get("from"), flags.get("to"), keys)
          .foreach { case (k, v) => println(s"$k=$v") }
      case List("change-export", table, path) =>
        lh.cdc.exportChanges(
          lh.cdc.getChanges(table, flags.get("from"), flags.get("to"), keys),
          path, flags.getOrElse("format", "json"))
        println(s"exported to $path")

      // ---- watermarks (cli.py watermark group) ----------------------------
      case List("watermark-set", pipeline, table, snapshotId) =>
        lh.incremental.setWatermark(pipeline, table, graft.analytics.Watermark(
          snapshotId.toLong, System.currentTimeMillis(), 0L))
      case List("watermark-show", pipeline, table) =>
        lh.incremental.watermark(pipeline, table) match {
          case Some(w) => println(s"snapshot=${w.snapshotId} rows=${w.rows}")
          case None => println("no watermark")
        }
      case List("watermark-reset", pipeline) =>
        lh.incremental.clearWatermarks(pipeline)

      // ---- views / matviews / pipelines extras ----------------------------
      case List("view-drop", name) => lh.views.drop(name)
      case List("view-show", name) =>
        val v = lh.views.get(name); println(s"${v.name}: ${v.sql}")
      case List("matview-list") => lh.matviews.list().foreach(m =>
        println(s"${m.name} -> ${m.backingTable} rows=${m.rowCount}"))
      case List("matview-drop", name) => lh.matviews.drop(name)
      case List("matview-query", name) => show(lh.matviews.read(name).limit(maxRows))
      case List("pipeline-drop", name) => lh.pipelines.drop(name)
      case List("pipeline-show", name) =>
        val p = lh.pipelines.get(name)
        println(s"${p.name} (${p.description}) last=${p.lastRunStatus}")
        p.steps.zipWithIndex.foreach { case (s, i) =>
          println(s"  $i: ${s.sql} -> ${s.targetTable.getOrElse("-")} [${s.mode}]") }

      // ---- lineage extras -------------------------------------------------
      case List("lineage-add", target, operation) =>
        lh.lineage.record(flags.getOrElse("sources", "").split(',')
          .filter(_.nonEmpty).toSeq, target, operation)
      case List("lineage-impact", table) =>
        lh.lineage.impact(table).toList.sortBy(_._1).foreach { case (d, ts) =>
          println(s"$d: ${ts.mkString(", ")}") }
      case List("lineage-remove", table) =>
        println(s"removed ${lh.lineage.removeEdges(table)} edges")
      case List("lineage-graph") => lh.lineage.edges().foreach(e =>
        println(s"${e.sources.mkString("+")} -> ${e.target} (${e.operation})"))

      // ---- masking extras -------------------------------------------------
      case List("mask-list") => lh.masking.policies().toList.sortBy(_._1)
        .foreach { case (c, p) => println(s"$c: ${p.strategy}") }
      case List("mask-remove", column) => lh.masking.dropPolicy(column)
      case List("mask-preview", table) =>
        lh.masking.preview(lh.catalog.loadTable(table).read()).foreach {
          case (before, after) => println(s"$before -> $after") }

      // ---- contracts extras (cli.py contract group) -----------------------
      case List("contract-list") => lh.contracts.list().foreach(c =>
        println(s"${c.table} v${c.version}: ${c.constraints.size} constraints"))
      case List("contract-show", table) =>
        val c = lh.contracts.get(table)
        println(s"${c.table} v${c.version}")
        c.constraints.foreach(k => println(s"  ${k.kind} ${k.column} ${k.params}"))
      case List("contract-history", table) =>
        lh.contracts.history(table).foreach(c =>
          println(s"v${c.version}: ${c.constraints.size} constraints"))
      case List("contract-validate", table) =>
        (lh.contracts.validateSchema(table) ++ lh.contracts.validateConstraints(table))
          .foreach(c => println(s"${if (c.passed) "PASS" else "FAIL"} " +
            s"${c.kind} ${c.subject}: ${c.message}"))
      case List("contract-compliance", table) =>
        lh.contracts.complianceHistory(table).foreach(r =>
          println(f"${java.time.Instant.ofEpochMilli(r.timestampMs)}\t${r.score}%.3f"))
      case List("contract-trends", table) =>
        lh.contracts.trend(table).foreach { case (ts, s) =>
          println(f"${java.time.Instant.ofEpochMilli(ts)}\t$s%.3f") }
      case List("contract-add-consumer", table, name) =>
        lh.contracts.registerConsumer(table, name)
      case List("contract-add-producer", table, name) =>
        lh.contracts.registerProducer(table, name)
      case List("contract-registry") =>
        lh.contracts.registry().toList.sortBy(_._1).foreach { case (t, m) =>
          println(s"$t: consumers=${m.getOrElse("consumers", Nil).mkString(",")} " +
            s"producers=${m.getOrElse("producers", Nil).mkString(",")}") }
      case List("contract-coverage") =>
        lh.contracts.coverage().toList.sortBy(_._1).foreach { case (k, v) =>
          println(s"$k=$v") }
      case List("contract-drop", table) => lh.contracts.drop(table)
      // contract documents from JSON files (reference contract
      // create/update/apply/dry-run take a JSON contract path)
      case List("contract-create", file) =>
        val c = lh.contracts.create(readContract(file))
        println(s"created ${c.table} v${c.version}")
      case List("contract-update", file) =>
        val c = lh.contracts.update(readContract(file))
        println(s"updated ${c.table} v${c.version}")
      case List("contract-apply", file) =>
        val c = lh.contracts.applyContract(readContract(file))
        println(s"applied ${c.table} v${c.version}")
      case List("contract-check-data", table, file) =>
        // validate incoming rows (JSON file) BEFORE writing them;
        // validateRows returns only the violations. Resolve the contract
        // first: a missing/misspelled table must error, not print OK.
        lh.contracts.get(table)
        val issues = lh.contracts.validateRows(table, lh.spark.read.json(file))
        if (issues.isEmpty) println("OK")
        else issues.foreach(c =>
          println(s"FAIL ${c.kind} ${c.subject}: ${c.message}"))
      case List("contract-dry-run", table, file) =>
        lh.contracts.dryRun(table, readContract(file).copy(table = table))
          .foreach(c => println(s"${if (c.passed) "PASS" else "FAIL"} " +
            s"${c.kind} ${c.subject}: ${c.message}"))
      case List("contract-dry-run-migration", table, file) =>
        lh.contracts.dryRunMigration(table, readContract(file).copy(table = table))
          .toList.sortBy(_._1).foreach { case (k, v) => println(s"$k=$v") }
      case List("contract-deprecate", table) =>
        val c = lh.contracts.deprecate(table)
        println(s"${c.table} v${c.version}: ${c.status}")
      case List("contract-status", table) =>
        val c = lh.contracts.get(table)
        println(s"${c.table} v${c.version}: ${c.status} " +
          s"(created ${java.time.Instant.ofEpochMilli(c.createdMs)})")
      case List("contract-consumers", table) =>
        // the registry stores keys exactly as registered (raw), so look up
        // the name as given — qualifying here would miss raw-keyed entries
        val reg = lh.contracts.registry().getOrElse(table, Map.empty)
        println(s"consumers=${reg.getOrElse("consumers", Nil).mkString(",")} " +
          s"producers=${reg.getOrElse("producers", Nil).mkString(",")}")
      case List("contract-dashboard") =>
        val cs = lh.contracts.list()
        println(s"contracts: ${cs.size}")
        lh.contracts.coverage().toList.sortBy(_._1).foreach { case (k, v) =>
          println(s"  $k=$v") }
        cs.foreach { c =>
          val hist = lh.contracts.complianceHistory(c.table)
          val last = hist.lastOption.map(r => f"${r.score}%.3f").getOrElse("-")
          println(s"  ${c.table} v${c.version} compliance=$last")
        }

      // ---- sla extras -----------------------------------------------------
      case List("sla-list") => lh.sla.policies().foreach(p => println(p.table))
      case List("sla-show", table) => println(lh.sla.policy(table)
        .map(_.toString).getOrElse("no policy"))
      case List("sla-remove", table) => lh.sla.dropPolicy(table)
      case List("sla-history", table) =>
        lh.sla.history(table).foreach(r =>
          println(s"${java.time.Instant.ofEpochMilli(r.timestampMs)}\tissues=${r.issues}"))

      // ---- glossary / catalog metadata extras -----------------------------
      case List("glossary-add", term, definition) =>
        lh.catalogMetadata.addGlossaryTerm(graft.governance.GlossaryTerm(term, definition,
          flags.getOrElse("aliases", "").split(',').filter(_.nonEmpty).toList))
      case List("glossary-list") => lh.catalogMetadata.glossarySearch("")
        .foreach(t => println(s"${t.term}: ${t.definition}"))
      case List("glossary-remove", term) =>
        println(if (lh.catalogMetadata.removeGlossaryTerm(term)) "removed"
        else s"no glossary term: $term")
      case List("glossary-search", q) => lh.catalogMetadata.glossarySearch(q)
        .foreach(t => println(s"${t.term}: ${t.definition}"))
      case List("classifications", table) =>
        lh.catalogMetadata.classifications(table).toList.sortBy(_._1)
          .foreach { case (c, cls) => println(s"$c\t$cls") }
      case List("column-describe", table, column, desc) =>
        lh.catalogMetadata.setColumnDescription(table, column, desc)
      case List("column-descriptions", table) =>
        lh.catalogMetadata.columnDescriptions(table).toList.sortBy(_._1)
          .foreach { case (c, d) => println(s"$c\t$d") }

      // ---- tagging / bookmarks extras -------------------------------------
      case List("tag-show", table) => lh.tagging.tags(table).foreach(println)
      case List("tag-remove", table, tag) => lh.tagging.removeTag(table, tag)
      case List("describe-set", table, desc) => lh.tagging.setDescription(table, desc)
      case List("bookmark", table) => lh.tagging.bookmark(table)
      case List("unbookmark", table) => lh.tagging.unbookmark(table)
      case List("bookmarks") => lh.tagging.bookmarks().foreach(println)

      // ---- notifications extras -------------------------------------------
      case List("notify-list", table) => lh.notifications.handlers(table)
        .foreach(h => println(s"${h.event} -> ${h.kind}:${h.target}"))
      case List("notify-history") => lh.notifications.history().takeRight(maxRows)
        .foreach(r => println(s"${r.table} ${r.event}: ${r.message}"))
      case List("notify-test", table, event, message) =>
        lh.notifications.fireEvent(table, event, message).foreach(r =>
          println(s"fired ${r.event} -> ${r.handler}"))

      // ---- clones extras --------------------------------------------------
      case List("clone-discard", name) => lh.cloning.discard(name)
      case List("clone-list") => lh.cloning.list().foreach(c =>
        println(s"${c.cloneName} <- ${c.original}"))

      // ---- quality / dedup extras -----------------------------------------
      case List("quality-report") =>
        lh.quality.report().toList.sortBy(_._1).foreach { case (k, v) =>
          println(s"$k=$v") }
      case List("quality-history", table) =>
        lh.quality.history(table).foreach(q => println(f"${q.score}%.3f"))
      case List("dedup-summary", table) =>
        lh.dedup.dedupSummary(lh.catalog.loadTable(table).read(), keys)
          .toList.sortBy(_._1).foreach { case (k, v) => println(s"$k=$v") }
      case List("dedup-report", table) =>
        lh.dedup.dedupReport(table, keys).toList.sortBy(_._1)
          .foreach { case (k, v) => println(s"$k=$v") }

      // ---- sampling extras ------------------------------------------------
      case List("sample-stratified", table, stratCol, fraction) =>
        show(lh.sampling.stratifiedSample(lh.catalog.loadTable(table).read(),
          stratCol, fraction.toDouble, flags.getOrElse("seed", "42").toLong))
      case List("sample-systematic", table, everyN) =>
        show(lh.sampling.systematicSample(lh.catalog.loadTable(table).read(),
          everyN.toInt))
      case List("sample-to-table", source, target, fraction) =>
        println(s"sampled ${lh.sampling.sampleToTable(source, target,
          fraction.toDouble, flags.getOrElse("seed", "42").toLong)} rows")

      // ---- advisor extras (cli.py optimize group) -------------------------
      case List("advisor-materializations") =>
        lh.advisor.suggestMaterializations().foreach(s =>
          println(s"${s.sql} (count=${s.occurrences})"))
      case List("advisor-patterns") =>
        println("slow queries:")
        lh.advisor.slowQueries().foreach { case (sql, sec) =>
          println(f"  $sec%.3fs $sql") }
        println("repeated queries:")
        lh.advisor.repeatedQueries().foreach { case (sql, n) =>
          println(s"  ${n}x $sql") }
      case List("advisor-report") =>
        println(s"partition suggestions:")
        lh.catalog.listTables("*").foreach { t =>
          lh.advisor.suggestPartitions(t).foreach(s =>
            println(f"  $t.${s.column}: benefit=${s.benefit}%.3f")) }
        println("materialization suggestions:")
        lh.advisor.suggestMaterializations().foreach(s =>
          println(s"  ${s.sql} (count=${s.occurrences})"))

      // ---- format config (cli.py config group + convert) ------------------
      case List("format-set", fmt) => lh.formats.setGlobalFormat(fmt)
      case List("format-set-table", table, fmt) => lh.formats.setTableFormat(table, fmt)
      case List("format-show", table) => println(lh.formats.resolve(table))
      case List("convert-format", table, fmt) =>
        println(s"converted, rewrote ${lh.formats.convertTable(table, fmt)} rows")
      // file-level conversions + standalone-file query (reference cli.py
      // convert / convert-table / query-vortex; "vortex" maps to the zstd
      // parquet profile — the documented FormatResolver divergence)
      case List("convert", src, dst) =>
        val fmt = flags.getOrElse("to", "vortex")
        lh.spark.read.parquet(src).write.mode("overwrite")
          .options(lh.formats.writerOptions(fmt)).parquet(dst)
        println(s"converted $src -> $dst ($fmt profile)")
      case List("convert-table", table, dst) =>
        val df = lh.catalog.loadTable(table).read()
        val out = if (flags.contains("compact")) df.coalesce(1) else df
        out.write.mode("overwrite")
          .options(lh.formats.writerOptions("vortex")).parquet(dst)
        println(s"exported $table -> $dst (vortex profile)")
      case List("query-vortex", file, sql) =>
        lh.spark.read.parquet(file)
          .createOrReplaceTempView(flags.getOrElse("table-name", "data"))
        show(lh.spark.sql(sql).limit(maxRows))
      case List("benchmark") =>
        // reference cli.py benchmark: parquet-vs-vortex write/read timings
        // at a few row counts (micro-bench, setup-dominated — same caveat
        // the reference documents in docs/benchmarks.md)
        val rowCounts = flags.getOrElse("rows", "1000,10000")
          .split(',').map(_.trim.toInt)
        val tmp = java.nio.file.Files.createTempDirectory("graft-bench-")
        try {
          println("rows\tformat\twrite_ms\tread_ms\tbytes")
          rowCounts.foreach { n =>
            Seq("parquet" -> Map.empty[String, String],
              "vortex" -> lh.formats.writerOptions("vortex")).foreach {
              case (fmt, opts) =>
                val df = lh.spark.range(n).selectExpr("id",
                  "cast(id % 100 as double) / 7 as v", "concat('row-', id) as s")
                val p = tmp.resolve(s"$fmt-$n").toString
                val t0 = System.nanoTime()
                df.write.mode("overwrite").options(opts).parquet(p)
                val wMs = (System.nanoTime() - t0) / 1e6
                val t1 = System.nanoTime()
                lh.spark.read.parquet(p).count()
                val rMs = (System.nanoTime() - t1) / 1e6
                val walk = java.nio.file.Files.walk(tmp.resolve(s"$fmt-$n"))
                val bytes =
                  try walk.filter(f => f.toString.endsWith(".parquet"))
                    .mapToLong(java.nio.file.Files.size(_)).sum()
                  finally walk.close()
                println(f"$n\t$fmt\t$wMs%.1f\t$rMs%.1f\t$bytes")
            }
          }
        } finally {
          // cleanup must survive a failed timing loop too
          val cleanup = java.nio.file.Files.walk(tmp)
          try cleanup.sorted(java.util.Comparator.reverseOrder())
            .forEach(f => java.nio.file.Files.deleteIfExists(f))
          finally cleanup.close()
        }

      // ---- schema evolution inspection (schema_evolution.py) --------------
      case List("schema-history", table) =>
        graft.core.SchemaEvolution.history(lh.catalog.loadTable(table)).foreach(e =>
          println(s"schema ${e.schemaId} (snapshot ${e.snapshotId.getOrElse("-")}): " +
            e.fields.map(_.name).mkString(", ") +
            e.changeSummary.map(s => s" — $s").getOrElse("")))
      case List("schema-diff", table) =>
        val d = graft.core.SchemaEvolution.diff(lh.catalog.loadTable(table),
          flags.get("from"), flags.get("to"))
        println(s"schema ${d.fromSchemaId} -> ${d.toSchemaId}: ${d.summary}")
      case List("schema-migration", table) =>
        graft.core.SchemaEvolution.migration(lh.catalog.loadTable(table),
          flags.get("from"), flags.get("to")).foreach(s => println(
          s"${s.operation} ${s.columnName}" +
            s.columnType.map(t => s" (type: $t)").getOrElse("") +
            s.newName.map(n => s" -> $n").getOrElse("")))
      case List("schema-compat", table, op, column) =>
        val r = graft.core.SchemaEvolution.compatibility(lh.catalog.loadTable(table),
          List(graft.core.SchemaEvolution.ProposedChange(op, column,
            flags.get("type"), flags.get("new-name"))))
        println(r.message)
        (r.breakingChanges ++ r.warnings).foreach(m => println(s"  $m"))

      // ---- backups list / stats-all / watermarks / cache policy -----------
      case List("backups") =>
        val bs = lh.backup.listBackups(flags.get("dir"))
        if (bs.isEmpty) println("no backups")
        else bs.foreach { case (f, m, sz) => println(
          s"$f\ttable=${m.map(_.table).getOrElse("?")}\t" +
            s"rows=${m.map(_.rowCount).getOrElse(-1L)}\tbytes=$sz") }
      case List("stats-all") =>
        lh.profile.allCachedStats().toList.sortBy(_._1).foreach { case (t, s) =>
          println(s"$t: rows=${s.rowCount} files=${s.fileCount} " +
            s"bytes=${s.totalBytes} snapshots=${s.snapshotCount}") }
      case List("watermarks") =>
        lh.incremental.listWatermarks().toList.sortBy(_._1).foreach {
          case (p, ts) => ts.toList.sortBy(_._1).foreach { case (t, w) =>
            println(s"$p/$t: snapshot=${w.snapshotId} rows=${w.rows}") } }
      case List("cache-policy", table) =>
        val p = lh.queryCache.setPolicy(table,
          !flags.contains("disable"), flags.get("ttl-seconds").map(_.toLong))
        println(s"enabled=${p.enabled} ttlMs=${p.ttlMs.getOrElse("-")}")
      case List("cache-entries") =>
        lh.queryCache.entries().foreach(e =>
          println(s"${e.key.take(12)}  rows=${e.rows.size}  ${e.sql}"))
      case List("query-history-clear") =>
        println(s"cleared ${lh.savedQueries.clearHistory()} entries")

      // ---- auto-refresh config / sample stats -----------------------------
      case List("auto-refresh-set", table) =>
        lh.autoRefresh.setConfig(table, graft.orchestration.AutoRefreshConfig(
          !flags.contains("disable"),
          flags.getOrElse("depth", "3").toInt,
          !flags.contains("no-matviews"),
          !flags.contains("no-pipelines"),
          !flags.contains("no-caches")))
      case List("auto-refresh-plan", table) =>
        lh.autoRefresh.configuredPlan(table).foreach(s =>
          println(s"${s.kind} ${s.name} (depth ${s.depth})"))
      case List("auto-refresh-history") =>
        lh.autoRefresh.history().takeRight(maxRows).zipWithIndex.foreach {
          case (steps, i) => steps.foreach(s =>
            println(s"run $i: ${s.kind} ${s.name}: ${s.status}")) }
      case List("sample-stats", table, sampleTable) =>
        lh.sampling.sampleStats(lh.catalog.loadTable(table).read(),
          lh.catalog.loadTable(sampleTable).read())
          .toList.sortBy { case ((c, m), _) => (c, m) }
          .foreach { case ((c, m), (f, s)) =>
            println(f"$c.$m: full=$f%.4f sample=$s%.4f") }

      // ---- contract extras: summary/preview/health/diff/dry-run -----------
      case List("contract-summary", table) =>
        lh.contracts.summary(table).toList.sortBy(_._1).foreach {
          case (k, v) => println(s"$k=$v") }
      case List("contract-preview", table) =>
        val c = lh.contracts.preview(table, flags.contains("strict"))
        println(s"${c.columns.size} columns, ${c.constraints.size} constraints (not saved)")
        c.constraints.foreach(k => println(s"  ${k.kind} ${k.column} ${k.params}"))
      case List("contract-health", table) =>
        lh.contracts.health(table).toList.sortBy(_._1).foreach {
          case (k, v) => println(s"$k=$v") }
      case List("contract-diff", table, v1, v2) =>
        lh.contracts.diffVersions(table, v1.toInt, v2.toInt).toList.sortBy(_._1)
          .foreach { case (k, v) => println(s"$k=$v") }
      case List("contract-violations", table) =>
        val vs = lh.contracts.violations(table)
        if (vs.isEmpty) println("no violations")
        else vs.foreach(c => println(s"${c.kind} ${c.subject}: ${c.message}"))
      case List("notify-remove", handlerId) =>
        println(if (lh.notifications.removeHandler(handlerId)) "removed"
        else "no such handler")

      // ---- training-data curation -----------------------------------------
      case List("curate", table, target) =>
        val src = lh.catalog.loadTable(table)
        val cfg = graft.text.Curation.Config(
          languages = flags.getOrElse("languages", "en")
            .split(',').filter(_.nonEmpty).toSet,
          minQuality = flags.getOrElse("min-quality", "0.3").toDouble,
          jaccardThreshold = flags.getOrElse("jaccard", "0.8").toDouble,
          maxShingleFreq = flags.getOrElse("max-shingle-freq", "100").toInt)
        val (curated, stats) = graft.text.Curation.funnel(
          src.read(), flags.getOrElse("id-col", "doc_id"),
          flags.getOrElse("text-col", "text"), cfg)
        if (!lh.catalog.tableExists(target))
          lh.catalog.createTable(target, curated.schema, Nil, Map.empty)
        lh.catalog.loadTable(target).overwrite(curated)
        // the result is materialized into the target table — release the
        // funnel's internal checkpoints (exact stage + CC labels) so a
        // long-lived process doesn't accumulate one set per curate call
        graft.text.NearDup.releaseResultCheckpoints(curated)
        stats.foreach(st => println(
          s"curated ${st.input} -> lang ${st.afterLanguage} -> " +
            s"quality ${st.afterQuality} -> exact ${st.afterExactDedup} -> " +
            s"final ${st.afterNearDedup} rows into $target"))

      case List("curate-admit", keptTable, batchTable) =>
        val kept = lh.catalog.loadTable(keptTable)
        val cfg = graft.text.Curation.Config(
          jaccardThreshold = flags.getOrElse("jaccard", "0.8").toDouble,
          maxShingleFreq = flags.getOrElse("max-shingle-freq", "100").toInt)
        val admitted = graft.text.Curation.admitIncremental(kept.read(),
          lh.catalog.loadTable(batchTable).read(),
          flags.getOrElse("id-col", "doc_id"),
          flags.getOrElse("text-col", "text"), cfg)
        val before = kept.currentSnapshot.map(_.totalRows).getOrElse(0L)
        val snap = kept.append(admitted)
        // count from the snapshot delta: the admission pipeline ran once
        // inside append, no second evaluation. The result is materialized
        // into the kept table — release the admission's CC-labels
        // checkpoint so a long-lived serve process doesn't accumulate one
        // per admitted batch
        graft.text.NearDup.releaseResultCheckpoints(admitted)
        println(s"admitted ${snap.totalRows - before} docs into $keptTable " +
          s"(snapshot ${snap.id})")

      case List("pack-sequences", table) =>
        val id = flags.getOrElse("order-col", "doc_id")
        val group = flags.getOrElse("group-col", "source")
        val text = flags.getOrElse("text-col", "text")
        val budget = flags.getOrElse("budget", "512").toLong
        val df = lh.catalog.loadTable(table).read()
          .withColumn("__tokens", graft.text.TextAnalysis.tokenCount(col(text)))
        val packed = graft.text.SequencePacking.pack(
          df, group, id, "__tokens", budget)
        packed.orderBy(col(group), col("seq_no"))
          .limit(flags.getOrElse("limit", "100").toInt).collect()
          .foreach(r => println(s"${r.get(0)} seq ${r.get(1)}: " +
            s"docs=${r.get(2)} tokens=${r.get(3)} oversize=${r.get(4)}"))

      case List("scrub-spans", table, target) =>
        val id = flags.getOrElse("id-col", "doc_id")
        val text = flags.getOrElse("text-col", "text")
        val k = flags.getOrElse("span-tokens", "20").toInt
        val minDocs = flags.getOrElse("min-docs", "2").toInt
        val scrubbed = graft.text.SpanDedup.removeRepeatedSpans(
          lh.catalog.loadTable(table).read(), id, text, k, minDocs)
        if (!lh.catalog.tableExists(target))
          lh.catalog.createTable(target, scrubbed.schema, Nil, Map.empty)
        val snap = lh.catalog.loadTable(target).overwrite(scrubbed)
        println(s"scrubbed $k-token repeated spans from ${snap.totalRows} " +
          s"docs into $target")

      case List("score-lm", table, target) =>
        val id = flags.getOrElse("id-col", "doc_id")
        val text = flags.getOrElse("text-col", "text")
        val scored = graft.text.LanguageModel.unigramLogProb(
          lh.catalog.loadTable(table).read(), id, text)
        if (!lh.catalog.tableExists(target))
          lh.catalog.createTable(target, scored.schema, Nil, Map.empty)
        val snap = lh.catalog.loadTable(target).overwrite(scored)
        println(s"scored ${snap.totalRows} docs into $target")

      case List("bucketize", table, name, path) =>
        val keys = flags.getOrElse("keys", "").split(',').filter(_.nonEmpty)
        if (keys.isEmpty)
          throw new IllegalArgumentException("bucketize requires --keys k1,k2")
        val n = flags.getOrElse("buckets", "32").toInt
        graft.io.Bucketing.writeBucketed(
          lh.catalog.loadTable(table).read(), name, path, keys.toSeq, n)
        println(s"bucketed $table by ${keys.mkString(",")} x$n into $name " +
          s"($path)")

      case List("funnel", table) =>
        val user = flags.getOrElse("user-col", "user_id")
        val ts = flags.getOrElse("ts-col", "ts")
        val ty = flags.getOrElse("type-col", "event_type")
        val steps = flags.getOrElse("steps", "").split(',').filter(_.nonEmpty)
        if (steps.isEmpty)
          throw new IllegalArgumentException("funnel requires --steps a,b,c")
        graft.analytics.Funnel.funnelSummary(
          lh.catalog.loadTable(table).read(), user, ts, ty, steps.toSeq)
          .orderBy("step_no").collect().foreach(r =>
            println(s"step ${r.get(0)} (${r.get(1)}): ${r.get(2)} users"))

      case List("cohort", table) =>
        val user = flags.getOrElse("user-col", "user_id")
        val ts = flags.getOrElse("ts-col", "ts")
        val limit = flags.getOrElse("limit", "100").toInt
        graft.analytics.Funnel.cohortRetention(
          lh.catalog.loadTable(table).read(), user, ts)
          .orderBy("cohort_day", "day_offset").limit(limit)
          .collect().foreach(r =>
            println(s"${r.get(0)} +${r.get(1)}d: ${r.get(2)} users"))

      case List("transitions", table) =>
        val user = flags.getOrElse("user-col", "user_id")
        val ts = flags.getOrElse("ts-col", "ts")
        val ty = flags.getOrElse("type-col", "event_type")
        val tie = flags.getOrElse("tie-col", "event_id")
        graft.analytics.Funnel.transitions(
          lh.catalog.loadTable(table).read(), user, ts, ty, tie)
          .orderBy(org.apache.spark.sql.functions.desc("n"),
            col("prev_type"), col("next_type"))
          .limit(flags.getOrElse("limit", "100").toInt)
          .collect().foreach(r =>
            println(s"${r.get(0)} -> ${r.get(1)}: ${r.get(2)}"))

      case List("histogram", table, column) =>
        val width = flags.getOrElse("bin-width", "10").toDouble
        val origin = flags.getOrElse("origin", "0").toDouble
        graft.analytics.Profile.histogram(
          lh.catalog.loadTable(table).read(), column, width, origin)
          .orderBy("bin").limit(flags.getOrElse("limit", "200").toInt)
          .collect().foreach(r => println(
            f"[${r.getDouble(3)}%.2f, ${r.getDouble(3) + width}%.2f): " +
              s"${r.get(1)} rows"))

      case List("zorder", table, target) =>
        val cols2 = flags.getOrElse("cols", "").split(',').filter(_.nonEmpty)
        if (cols2.length != 2)
          throw new IllegalArgumentException("zorder requires --cols x,y")
        val parts = flags.getOrElse("partitions", "32").toInt
        val clustered = graft.operators.ZOrder.clusterByZ(
          lh.catalog.loadTable(table).read(), cols2(0), cols2(1), parts)
        if (!lh.catalog.tableExists(target))
          lh.catalog.createTable(target, clustered.schema, Nil, Map.empty)
        val snap = lh.catalog.loadTable(target).overwrite(clustered)
        println(s"z-ordered ${snap.totalRows} rows of $table by " +
          s"(${cols2(0)}, ${cols2(1)}) into $target ($parts partitions)")

      case List("bloom-join", fact, dim) =>
        val fk = flags.getOrElse("fact-key", "")
        val dk = flags.getOrElse("dim-key", fk)
        if (fk.isEmpty)
          throw new IllegalArgumentException(
            "bloom-join requires --fact-key (and --dim-key if it differs)")
        val joined = graft.operators.BloomPrune.prunedJoin(
          lh.catalog.loadTable(fact).read(), fk,
          lh.catalog.loadTable(dim).read(), dk)
        println(s"bloom-pruned join $fact x $dim on $fk=$dk: " +
          s"${joined.count()} rows")

      case List("split-assign", table, target) =>
        val key = flags.getOrElse("key", "doc_id")
        val fracs = flags.getOrElse("fractions", "train:0.8,val:0.1,test:0.1")
          .split(',').toSeq.map { kv =>
            kv.split(':') match {
              case Array(n, f) if f.toDoubleOption.isDefined => n -> f.toDouble
              case _ => throw new IllegalArgumentException(
                s"bad --fractions entry '$kv': expected name:fraction,...")
            }
          }
        val df = lh.catalog.loadTable(table).read()
          .withColumn("split", graft.operators.HashSplit.assign(col(key), fracs))
        if (!lh.catalog.tableExists(target))
          lh.catalog.createTable(target, df.schema, Nil, Map.empty)
        val snap = lh.catalog.loadTable(target).overwrite(df)
        println(s"assigned ${snap.totalRows} rows of $table into splits " +
          s"${fracs.map(_._1).mkString("/")} (keyed on $key) -> $target")

      case List("diversity", table) =>
        val group = flags.getOrElse("group-col", "source")
        val text = flags.getOrElse("text-col", "text")
        val n = flags.getOrElse("ngram", "3").toInt
        graft.text.TextAnalysis.ngramDiversity(
          lh.catalog.loadTable(table).read(), group, text, n)
          .orderBy(group).collect().foreach(r => println(
            f"${r.get(0)}: grams=${r.get(1)} distinct=${r.get(2)} " +
              f"diversity=${r.getDouble(3)}%.4f"))

      case List("dedup-best", table, target) =>
        val id = flags.getOrElse("id-col", "doc_id")
        val text = flags.getOrElse("text-col", "text")
        val thr = flags.getOrElse("threshold", "0.8").toDouble
        val maxFreq = flags.getOrElse("max-shingle-freq", "100").toInt
        val docs = lh.catalog.loadTable(table).read()
        // same pipeline as gate q92 (shared helper, cannot drift): drop
        // every clustered doc except its best-quality representative
        val ranked = graft.text.Curation.rankedClusterMembers(docs, id, text,
          graft.text.TextAnalysis.qualityScore(col(text)),
          threshold = thr, maxShingleFreq = maxFreq)
        val losers = ranked.where(col("rnk") > 1).select(col("doc_id").as(id))
        val kept = docs.join(losers, Seq(id), "left_anti")
        if (!lh.catalog.tableExists(target))
          lh.catalog.createTable(target, kept.schema, Nil, Map.empty)
        val snap = lh.catalog.loadTable(target).overwrite(kept)
        graft.text.NearDup.releaseResultCheckpoints(ranked)
        println(s"kept ${snap.totalRows} docs (best-per-cluster) into $target")

      case List("approx-profile", table) =>
        val df = lh.catalog.loadTable(table).read()
        graft.analytics.Profile.approxDistinct(df)
          .orderBy("column_name").collect().foreach(r =>
            println(s"${r.getString(0)}: ~${r.getLong(1)} distinct"))

      case List("chunk", table, target) =>
        val id = flags.getOrElse("id-col", "doc_id")
        val text = flags.getOrElse("text-col", "text")
        val sz = flags.getOrElse("size", "512").toInt
        // default stride derives from size so --size alone always composes
        val stride = flags.get("stride").map(_.toInt)
          .getOrElse(math.max(sz / 2, 1))
        val chunks = graft.text.Chunking.chunk(
          lh.catalog.loadTable(table).read(), id, text,
          chunkSize = sz, stride = stride)
        if (!lh.catalog.tableExists(target))
          lh.catalog.createTable(target, chunks.schema, Nil, Map.empty)
        val snap = lh.catalog.loadTable(target).overwrite(chunks)
        println(s"wrote ${snap.totalRows} chunks into $target")

      case List("mixture-plan", table, targetTokens) =>
        val text = flags.getOrElse("text-col", "text")
        val group = flags.getOrElse("group-col", "source")
        val weights = flags.get("weights").map(_.split(',').map { kv =>
          kv.split(':') match {
            case Array(k, v) if v.toDoubleOption.isDefined => k -> v.toDouble
            case _ => throw new IllegalArgumentException(
              s"bad --weights entry '$kv': expected source:fraction,source:fraction")
          }
        }.toMap).getOrElse(Map.empty[String, Double])
        val df = lh.catalog.loadTable(table).read()
          .withColumn("__tokens", graft.text.TextAnalysis.tokenCount(col(text)))
        graft.text.Mixture.plan(df, group, "__tokens",
          targetTokens.toLong, weights)
          .orderBy("source").collect().foreach(r => println(
            f"${r.get(0)}: docs=${r.get(1)} tokens=${r.get(2)} " +
              f"share=${r.getDouble(3)}%.4f fraction=${r.getDouble(4)}%.4f"))

      case List("pii-report", table) =>
        val id = flags.getOrElse("id-col", "doc_id")
        val text = flags.getOrElse("text-col", "text")
        val rep = graft.text.Redaction.report(
          lh.catalog.loadTable(table).read(), id, text)
        val kinds = graft.text.Redaction.patterns.map(_._1)
        val totals = rep.select(kinds.map(k =>
          org.apache.spark.sql.functions.sum(col(s"n_$k")).as(k)): _*).head()
        kinds.zipWithIndex.foreach { case (k, i) =>
          println(s"$k: ${if (totals.isNullAt(i)) 0L else totals.getLong(i)}") }

      case List("redact", table, target) =>
        val text = flags.getOrElse("text-col", "text")
        val src = lh.catalog.loadTable(table)
        val redacted = src.read().withColumn(text,
          graft.text.Redaction.redact(col(text)))
        if (!lh.catalog.tableExists(target))
          lh.catalog.createTable(target, redacted.schema, Nil, Map.empty)
        val snap = lh.catalog.loadTable(target).overwrite(redacted)
        println(s"redacted ${snap.totalRows} rows into $target")

      case List("decontaminate", trainTable, evalTable) =>
        val a = lh.catalog.loadTable(trainTable).read()
        val b = lh.catalog.loadTable(evalTable).read()
        val id = flags.getOrElse("id-col", "doc_id")
        val text = flags.getOrElse("text-col", "text")
        val pairs = graft.text.NearDup.crossJaccardPairs(a, b, id, text,
          n = flags.getOrElse("ngram", "3").toInt,
          threshold = flags.getOrElse("jaccard", "0.8").toDouble,
          maxShingleFreq = flags.getOrElse("max-shingle-freq", "100").toInt)
        if (flags.contains("remove")) {
          val contaminated = pairs.select(col("id_b").as(id)).distinct()
          val tbl = lh.catalog.loadTable(evalTable)
          val clean = b.join(contaminated, Seq(id), "left_anti")
          val before = tbl.currentSnapshot.map(_.totalRows).getOrElse(0L)
          val snap = tbl.overwrite(clean)
          println(s"removed ${before - snap.totalRows} contaminated docs " +
            s"from $evalTable (snapshot ${snap.id})")
        } else {
          pairs.orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
            .limit(flags.getOrElse("limit", "100").toInt).collect()
            .foreach(r => println(f"train ${r.get(0)} ~ eval ${r.get(1)}: " +
              f"jaccard ${r.getAs[Double]("jaccard")}%.4f"))
        }

      case List("similar-docs", table) =>
        val df = lh.catalog.loadTable(table).read()
        val id = flags.getOrElse("id-col", "doc_id")
        val text = flags.getOrElse("text-col", "text")
        val threshold = flags.getOrElse("threshold", "0.8").toDouble
        val cap = flags.getOrElse("max-token-freq", "100").toInt
        val pairs =
          if (flags.contains("tfidf"))
            graft.text.TokenSimilarity.tfidfPairs(df, id, text, threshold, cap)
          else graft.text.TokenSimilarity.tfCosinePairs(df, id, text, threshold, cap)
            .select("id_a", "id_b", "sim")
        pairs.orderBy(col("sim").desc, col("id_a"), col("id_b"))
          .limit(flags.getOrElse("limit", "100").toInt).collect()
          .foreach(r => println(f"${r.get(0)} ~ ${r.get(1)}: ${r.getDouble(2)}%.4f"))

      case List("quantize", table, target) =>
        val vecCol = flags.getOrElse("vec-col", "embedding")
        val q = graft.vector.Quantize.quantize(
          lh.catalog.loadTable(table).read(), vecCol)
        if (!lh.catalog.tableExists(target))
          lh.catalog.createTable(target, q.schema, Nil, Map.empty)
        val snap = lh.catalog.loadTable(target).overwrite(q)
        println(s"int8-quantized $vecCol of ${snap.totalRows} rows into " +
          s"$target (q + q_scale columns; 4x smaller, integer-exact cosine)")

      case List("dedup-exact-pairs", table) =>
        val df = lh.catalog.loadTable(table).read()
        val pairs = graft.text.PrefixFilterJoin.jaccardPairs(df,
          flags.getOrElse("id-col", "doc_id"),
          flags.getOrElse("text-col", "text"),
          n = flags.getOrElse("ngram", "3").toInt,
          threshold = flags.getOrElse("threshold", "0.8").toDouble)
        pairs.orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
          .limit(flags.getOrElse("limit", "100").toInt).collect()
          .foreach(r => println(f"${r.get(0)} ~ ${r.get(1)}: " +
            f"jaccard ${r.getAs[Double]("jaccard")}%.4f " +
            f"(inter ${r.getAs[Long]("inter")})"))

      case List("pagerank", table) =>
        val df = lh.catalog.loadTable(table).read()
        val src = flags.getOrElse("src-col", "src")
        val dst = flags.getOrElse("dst-col", "dst")
        val w = flags.getOrElse("weight-col", "w")
        val ranks = graft.operators.PageRank.ranks(df, src, dst, w,
          iters = flags.getOrElse("iters", "3").toInt,
          damping = flags.getOrElse("damping", "0.85").toDouble)
        ranks.orderBy(col("rank").desc)
          .limit(flags.getOrElse("limit", "20").toInt).collect()
          .foreach(r => println(f"${r.get(0)}: ${r.getDouble(1)}%.6f"))

      case List("triangles", table) =>
        val df = lh.catalog.loadTable(table).read()
        val counts = graft.operators.Triangles.triangleCounts(df,
          flags.getOrElse("u-col", "u"), flags.getOrElse("v-col", "v"))
        counts.orderBy(col("n_triangles").desc, col("node"))
          .limit(flags.getOrElse("limit", "20").toInt).collect()
          .foreach(r => println(s"${r.get(0)}: ${r.getLong(1)} triangles"))

      case List("gap-fill", table) =>
        val df = lh.catalog.loadTable(table).read()
        val filled = graft.operators.Resample.gapFill(df,
          flags.getOrElse("group-col", "event_type"),
          flags.getOrElse("ts-col", "ts"),
          flags.getOrElse("value-col", "value"),
          flags.getOrElse("unit", "hour"))
        val out = flags.get("moving-avg") match {
          case Some(wdw) => graft.operators.Resample.movingAvg(filled, wdw.toInt)
          case None => filled
        }
        out.orderBy(col("grp"), col("bucket"))
          .limit(flags.getOrElse("limit", "50").toInt).collect()
          .foreach(r => println(r.mkString(" | ")))

      case List("delete-keys", table, keysTable) =>
        val cols = flags.getOrElse("cols", "id").split(',').toSeq
        val matched = lh.catalog.loadTable(table).deleteKeysMor(cols,
          lh.catalog.loadTable(keysTable).read())
        println(s"equality-deleted $matched rows from $table " +
          s"(keys from $keysTable on ${cols.mkString(",")}; no data files rewritten)")

      case List("event-paths", table) =>
        graft.analytics.Paths.topPaths(lh.catalog.loadTable(table).read(),
          flags.getOrElse("key-col", "user_id"),
          flags.getOrElse("ts-col", "ts"),
          flags.getOrElse("tie-col", "event_id"),
          flags.getOrElse("type-col", "event_type"),
          k = flags.getOrElse("k", "25").toInt,
          maxLen = flags.getOrElse("max-len", "50").toInt)
          .collect()
          .foreach(r => println(s"${r.getLong(1)}x ${r.getString(0)}"))

      case List("mad-outliers", table, valueCol) =>
        graft.analytics.Robust.madOutliers(
          lh.catalog.loadTable(table).read(),
          flags.getOrElse("group-col", "event_type").split(',').toSeq,
          valueCol)
          .collect().foreach { r =>
            val g = r.get(0); val n = r.getLong(1)
            println(f"$g: n=$n median=${r.getLong(2) / 4e6}%.3f " +
              f"mad=${r.getLong(3) / 4e6}%.3f outliers=${r.getLong(4)}")
          }

      case List("skew-report", table, keyCol) =>
        val r = graft.operators.SkewReport.keySkew(
          lh.catalog.loadTable(table).read(), col(keyCol),
          partitions = flags.getOrElse("partitions", "32").toInt)
          .collect()(0)
        println(s"keys=${r.getLong(0)} rows=${r.getLong(1)} " +
          s"max=${r.getLong(2)} p99=${r.getDouble(3)} " +
          s"top=${r.getString(4)} salt=${r.getLong(5)}")

      case List("weighted-sample", table, target) =>
        val sample = graft.analytics.WeightedSample.sampleWithoutReplacement(
          lh.catalog.loadTable(table).read(),
          col(flags.getOrElse("id-col", "doc_id")),
          col(flags.getOrElse("weight-col", "n_chars")),
          k = flags.getOrElse("k", "1000").toInt,
          seed = flags.getOrElse("seed", "0").toLong)
        if (!lh.catalog.tableExists(target))
          lh.catalog.createTable(target, sample.schema, Nil, Map.empty)
        val snap = lh.catalog.loadTable(target).overwrite(sample)
        println(s"sampled ${snap.totalRows} rows into $target " +
          s"(weighted without replacement, deterministic)")

      case List("kmv-distinct", table, column) =>
        val r = graft.analytics.Kmv.distinctEstimate(
          lh.catalog.loadTable(table).read(), col(column),
          k = flags.getOrElse("k", "256").toInt).collect()(0)
        println(s"kmv($column): est=${r.getLong(2)} " +
          s"(fill=${r.getLong(0)}, kth_hash=${r.getLong(1)})")

      case List("vocab-coverage", table) =>
        graft.text.Coverage.coverageThresholds(
          lh.catalog.loadTable(table).read(),
          flags.getOrElse("text-col", "text"),
          flags.getOrElse("percents", "50,90,99").split(',')
            .filter(_.nonEmpty).map(_.trim.toInt).toSeq)
          .orderBy("pct").collect()
          .foreach(r => println(s"${r.getInt(0)}%: ${r.getLong(1)} tokens " +
            s"(${r.getLong(2)} occurrences)"))

      case List("attribute", table, target) =>
        val out = graft.analytics.Attribution.lastTouch(
          lh.catalog.loadTable(table).read(),
          flags.getOrElse("key-col", "user_id"),
          flags.getOrElse("ts-col", "ts"),
          flags.getOrElse("tie-col", "event_id"),
          flags.getOrElse("type-col", "event_type"),
          flags.getOrElse("touch", "click"),
          flags.getOrElse("conv", "purchase"),
          flags.getOrElse("lookback-sec", "604800").toLong)
        if (!lh.catalog.tableExists(target))
          lh.catalog.createTable(target, out.schema, Nil, Map.empty)
        val snap = lh.catalog.loadTable(target).overwrite(out)
        println(s"attributed ${snap.totalRows} conversions into $target")

      case List("scd2", table, target) =>
        val df = lh.catalog.loadTable(table).read()
        val keys = flags.getOrElse("keys", "user_id").split(',').toSeq
        val attrs = flags.getOrElse("attrs", "event_type").split(',').toSeq
        val h = graft.analytics.Scd.scd2(df, keys,
          flags.getOrElse("ts-col", "ts"),
          flags.getOrElse("tie-col", "event_id"), attrs)
        if (!lh.catalog.tableExists(target))
          lh.catalog.createTable(target, h.schema, Nil, Map.empty)
        val snap = lh.catalog.loadTable(target).overwrite(h)
        println(s"built SCD2 history: ${snap.totalRows} intervals into $target")

      case List("completeness", table) =>
        graft.analytics.Profile.columnCompleteness(
          lh.catalog.loadTable(table).read()).collect()
          .foreach(r => println(f"${r.getString(0)}: rows=${r.getLong(1)} " +
            f"nulls=${r.getLong(2)} distinct=${r.getLong(3)} " +
            f"completeness=${r.getDouble(4)}%.4f"))

      case List("classify-changes", oldTable, newTable) =>
        val o = lh.catalog.loadTable(oldTable).read()
        val n = lh.catalog.loadTable(newTable).read()
        val cols = o.columns.toSeq
        val keys = flags.get("keys").map(_.split(',').toSeq)
          .getOrElse(cols.take(1))
        // order before limiting: which rows survive the cap must be
        // deterministic (matching the other verbs), not whatever partition
        // order the union happens to produce. Keys first so an update's
        // BEFORE/AFTER rows stay adjacent — type-first would let the cap
        // cut between the two halves of one update. Within a key, an
        // explicit rank puts BEFORE ahead of AFTER (alphabetical order
        // would reverse the natural before→after event order).
        val typeRank = when(col("change_type") === "UPDATE_BEFORE", lit(0))
          .when(col("change_type") === "UPDATE_AFTER", lit(1))
          .otherwise(lit(2))
        val ch = graft.analytics.Cdc.classifyChanges(o, n, keys, cols)
          .orderBy(keys.map(col) :+ typeRank :+ col("change_type"): _*)
          .limit(flags.getOrElse("limit", "1000").toInt)
        ch.collect().foreach { r =>
          val changed = r.getSeq[String](r.fieldIndex("changed_columns"))
          val vals = cols.map(c => s"$c=${r.getAs[Any](c)}").mkString(", ")
          println(s"${r.getAs[String]("change_type")}: $vals" +
            (if (changed.nonEmpty) s" [changed: ${changed.mkString(",")}]" else ""))
        }

      case List("entropy", table) =>
        val out = graft.text.TextAnalysis.tokenEntropy(
          lh.catalog.loadTable(table).read(),
          flags.getOrElse("id-col", "doc_id"),
          flags.getOrElse("text-col", "text"))
          .orderBy("entropy_micro")
          .limit(flags.getOrElse("limit", "20").toInt)
        out.collect().foreach(r => println(s"doc ${r.getLong(0)}: " +
          s"entropy=${r.getLong(4) / 1e6} (${r.getLong(1)} tokens, " +
          s"${r.getLong(2)} distinct)"))

      case List("cms-freq", table, column) =>
        val df = lh.catalog.loadTable(table).read()
        val depth = flags.getOrElse("depth", "4").toInt
        val width = flags.getOrElse("width", "512").toInt
        val sk = graft.analytics.Cms.sketch(df, col(column), depth, width)
        val probes = df.select(col(column)).where(col(column).isNotNull)
          .groupBy(column).agg(count(lit(1)).as("exact_c"))
          .orderBy(desc("exact_c"), col(column))
          .limit(flags.getOrElse("top", "20").toInt)
        graft.analytics.Cms.estimates(sk, probes, column, depth, width)
          .orderBy(desc("est"), col("key")).collect()
          .foreach(r => println(s"${r.get(0)}: est=${r.getLong(1)}"))

      case List("hybrid-search", docsTable, embTable) =>
        val terms = flags.getOrElse("query", "hash,join,spark")
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val out = graft.text.Search.hybridRrf(
          lh.catalog.loadTable(docsTable).read(),
          lh.catalog.loadTable(embTable).read(),
          flags.getOrElse("id-col", "doc_id"),
          flags.getOrElse("text-col", "text"),
          flags.getOrElse("vec-id-col", "vec_id"),
          flags.getOrElse("vec-col", "embedding"),
          terms, flags.getOrElse("query-vec", "1").toLong,
          poolK = flags.getOrElse("pool", "50").toInt,
          topN = flags.getOrElse("top", "20").toInt)
        out.collect().foreach(r => println(s"doc ${r.getLong(0)}: " +
          s"rrf=${r.getLong(3)} bm25_rank=${Option(r.get(1)).getOrElse("-")} " +
          s"vec_rank=${Option(r.get(2)).getOrElse("-")}"))

      case List("rrf-batch", docsTable, embTable) =>
        // batch spec: 'qid:terms:vecid' triples separated by ';',
        // terms comma-separated — e.g. '1:hash,join:1;2:scan,filter:2'
        val qs = flags.getOrElse("queries", "1:hash,join,spark:1")
          .split(';').map(_.trim).filter(_.nonEmpty).map { spec =>
            val Array(qid, terms, vid) = spec.split(':')
            (qid.trim.toLong,
              terms.split(',').map(_.trim).filter(_.nonEmpty).toSeq,
              vid.trim.toLong)
          }.toSeq
        val out = graft.text.Search.hybridRrfBatch(
          lh.catalog.loadTable(docsTable).read(),
          lh.catalog.loadTable(embTable).read(),
          flags.getOrElse("id-col", "doc_id"),
          flags.getOrElse("text-col", "text"),
          flags.getOrElse("vec-id-col", "vec_id"),
          flags.getOrElse("vec-col", "embedding"), qs,
          poolK = flags.getOrElse("pool", "50").toInt,
          topN = flags.getOrElse("top", "20").toInt)
        out.orderBy(col("query_id"), desc("rrf_nano"), col("doc_id"))
          .collect().foreach(r => println(s"q${r.getLong(0)} " +
            s"doc ${r.getLong(1)}: rrf=${r.getLong(4)} " +
            s"bm25_rank=${Option(r.get(2)).getOrElse("-")} " +
            s"vec_rank=${Option(r.get(3)).getOrElse("-")}"))

      case List("window-heavy-hitters", table, tsCol, keyCol) =>
        val df = lh.catalog.loadTable(table).read()
        val win = flags.getOrElse("window", "1 hour")
        val sketch = df.where(col(keyCol).isNotNull)
          .select(col(tsCol), posexplode(array((0 until 4).map(j =>
            graft.analytics.Cms.bucket(col(keyCol), j, 512)): _*))
            .as(Seq("j", "bucket")))
          .groupBy(window(col(tsCol), win), col("j"), col("bucket"))
          .agg(count(lit(1)).as("cnt"))
        graft.analytics.Cms.windowedHeavyHitters(sketch,
            df.select(col(keyCol)), keyCol,
            denom = flags.getOrElse("denom", "8").toInt)
          .orderBy(desc("est"), col("key"))
          .limit(flags.getOrElse("limit", "50").toInt)
          .collect().foreach(r =>
            println(s"${r.getStruct(0).getTimestamp(0)} key=${r.get(1)}: " +
              s"est=${r.getLong(3)} of ${r.getLong(2)}"))

      case List("novelty", candTable, refTable) =>
        val out = graft.text.Drift.ngramNovelty(
          lh.catalog.loadTable(candTable).read(),
          lh.catalog.loadTable(refTable).read(),
          flags.getOrElse("id-col", "doc_id"),
          flags.getOrElse("text-col", "text"),
          n = flags.getOrElse("n", "3").toInt)
          .orderBy(desc("novelty_ppm"), col("doc_id"))
          .limit(flags.getOrElse("limit", "20").toInt)
        out.collect().foreach(r => println(s"doc ${r.getLong(0)}: " +
          s"novelty=${r.getLong(3) / 10000.0}% " +
          s"(${r.getLong(2)}/${r.getLong(1)} grams unseen)"))

      case List("ann-recall", embTable) =>
        val e = lh.catalog.loadTable(embTable).read()
        val idc = flags.getOrElse("id-col", "vec_id")
        val vc = flags.getOrElse("vec-col", "embedding")
        val k = flags.getOrElse("k", "10").toInt
        val nq = flags.getOrElse("queries", "10").toLong
        val queries = e.where(col(idc) <= nq)
          .select(col(idc).as("qid"), col(vc).as("qe"))
        val corpus = e.select(col(idc).as("nid"), col(vc).as("ne"))
        val centroids = graft.vector.KMeansIvf.train(e, idc, vc,
          k = flags.getOrElse("clusters", "8").toInt,
          dims = flags.getOrElse("dims", "64").toInt, iters = 3)
        val exact = graft.vector.VectorOps.bruteForceTopK(queries, corpus, k)
          .select("qid", "nid")
        val approx = graft.vector.KMeansIvf.topK(queries, corpus, k,
            centroids, probes = flags.getOrElse("probes", "2").toInt)
          .select(col("qid"), col("nid"), lit(1).as("__hit"))
        exact.join(approx, Seq("qid", "nid"), "left")
          .groupBy("qid")
          .agg(count(lit(1)).as("k_exact"),
            sum(when(col("__hit").isNotNull, 1L).otherwise(0L)).as("n_hit"))
          .orderBy("qid")
          .collect().foreach(r => println(s"query ${r.getLong(0)}: " +
            s"recall@$k = ${r.getLong(2)}/${r.getLong(1)}"))

      case List("kfold", table) =>
        val fold = graft.operators.HashSplit.kFold(
          col(flags.getOrElse("id-col", "doc_id")),
          flags.getOrElse("k", "5").toInt,
          flags.getOrElse("seed", "0").toLong).as("fold")
        lh.catalog.loadTable(table).read().select(fold)
          .groupBy("fold").agg(count(lit(1)).as("n")).orderBy("fold")
          .collect()
          // null id keys map to a null fold (kFold contract) — don't getLong it
          .foreach(r => println(s"fold ${if (r.isNullAt(0)) "null"
            else r.getLong(0)}: ${r.getLong(1)} rows"))

      // ---- validation extras ----------------------------------------------
      case List("validate-check", table) =>
        val df = lh.catalog.loadTable(table).read()
        val issues = lh.validation.validate(table, df, Some(df))
        if (issues.isEmpty) println("OK") else issues.foreach(println)

      // ---- audit extras ---------------------------------------------------
      case List("audit-clear", olderThan) =>
        println(s"removed ${lh.audit.clearOlderThan(olderThan)} entries")

      case other =>
        throw new IllegalArgumentException(
          s"unknown command: ${other.mkString(" ")}\n$help")
    }
  }

  /** Flags that never take a value — without this list, `--remove train`
    * would swallow `train` as the flag's value and break the verb match
    * when a boolean flag precedes a positional argument. */
  private val BoolFlags = Set("compact", "disable", "dry-run", "incremental",
    "no-caches", "no-matviews", "no-orphan-cleanup", "no-pipelines",
    "overwrite", "remove", "require-unchanged", "strict", "tfidf",
    "zero-copy")

  private[api] def parseFlags(args: List[String]): (Map[String, String], List[String]) = {
    var flags = Map.empty[String, String]
    var pos = List.empty[String]
    var rest = args
    while (rest.nonEmpty) {
      rest match {
        case f :: t if f.startsWith("--") && BoolFlags.contains(f.drop(2)) =>
          flags += f.drop(2) -> "true"; rest = t
        case f :: v :: t if f.startsWith("--") && !v.startsWith("--") =>
          flags += f.drop(2) -> v; rest = t
        case f :: t if f.startsWith("--") => flags += f.drop(2) -> "true"; rest = t
        case p :: t => pos :+= p; rest = t
        case Nil => rest = Nil // unreachable: loop guard ensures nonEmpty
      }
    }
    (flags, pos)
  }

  private def parseRow(json: String): Map[String, Any] =
    JsonMethods.parse(json).values.asInstanceOf[Map[String, Any]]

  private def readContract(file: String): Contract =
    graft.core.Jsons.readFile[Contract](java.nio.file.Paths.get(file))

  private def parseRows(json: String): Seq[Map[String, Any]] =
    JsonMethods.parse(json).values match {
      case l: List[_] => l.map(_.asInstanceOf[Map[String, Any]])
      case m: Map[_, _] => Seq(m.asInstanceOf[Map[String, Any]])
      case other => throw new IllegalArgumentException(s"bad rows JSON: $other")
    }

  private val help =
    """graft — Spark-native lakehouse CLI
      |
      |catalog: init namespaces namespace-create namespace-drop tables
      |         create-table describe drop-table set-property properties create-samples
      |schema:  alter-add-column alter-drop-column alter-rename-column
      |         alter-partition-spec
      |         alter-get-property alter-remove-property schema-history
      |         schema-diff schema-migration schema-compat
      |query:   query query-asof join suggest-joins query-save query-list
      |         query-run query-delete query-history query-history-clear
      |         cache-query cache-stats cache-clear cache-policy cache-entries
      |         stats-all query-vortex serve
      |dml:     insert update delete upsert batch (--keys a,b)
      |history: snapshots rollback expire diff tag-create tag-list tag-delete (--older-than 30d --retain-last N)
      |io:      import export backup backup-ns restore verify-backup backups
      |         format-set format-set-table format-show convert-format
      |         convert convert-table benchmark
      |curate:  curate curate-admit (--languages en --min-quality 0.3 --jaccard 0.8)
      |         decontaminate (--jaccard 0.8 --remove) pii-report redact
      |         pack-sequences (--budget 512 --group-col source)
      |         mixture-plan <table> <target-tokens> (--weights web:0.5,code:0.5)
      |         chunk <table> <target> (--size 512 --stride 256)
      |         scrub-spans <table> <target> (--span-tokens 20 --min-docs 2)
      |         score-lm <table> <target>
      |         bucketize <table> <name> <path> (--keys k1,k2 --buckets 32)
      |         zorder <table> <target> (--cols x,y --partitions 32)
      |         bloom-join <fact> <dim> (--fact-key k --dim-key k)
      |         split-assign <table> <target> (--key doc_id
      |           --fractions train:0.8,val:0.1,test:0.1)
      |         diversity <table> (--group-col source --ngram 3)
      |         dedup-best <table> <target> (--threshold 0.8)
      |         dedup-exact-pairs <table> (--threshold 0.8 --ngram 3)
      |         quantize <table> <target> (--vec-col embedding)
      |         approx-profile <table>
      |         pagerank <table> (--src-col src --dst-col dst --iters 3)
      |         triangles <table> (--u-col u --v-col v)
      |         gap-fill <table> (--group-col event_type --unit hour
      |           --moving-avg 3)
      |         delete-keys <table> <keys-table> (--cols id)
      |         event-paths <table> (--k 25 --max-len 50)
      |         mad-outliers <table> <value-col> (--group-col event_type)
      |         skew-report <table> <key-col> (--partitions 32)
      |         weighted-sample <table> <target> (--weight-col n_chars --k 1000)
      |         kmv-distinct <table> <column> (--k 256)
      |         vocab-coverage <table> (--percents 50,90,99)
      |         attribute <table> <target> (--touch click --conv purchase
      |           --lookback-sec 604800)
      |         entropy <table> (--id-col doc_id --text-col text --limit 20)
      |         cms-freq <table> <column> (--depth 4 --width 512 --top 20)
      |         hybrid-search <docs-table> <emb-table> (--query hash,join
      |           --query-vec 1 --pool 50 --top 20)
      |         rrf-batch <docs-table> <emb-table>
      |           (--queries '1:hash,join:1;2:scan,filter:2' --pool 50 --top 20)
      |         window-heavy-hitters <table> <ts-col> <key-col>
      |           (--window '1 hour' --denom 8 --limit 50)
      |         novelty <cand-table> <ref-table> (--n 3 --limit 20)
      |         ann-recall <emb-table> (--k 10 --queries 10 --clusters 8
      |           --probes 2 --dims 64)
      |         kfold <table> (--k 5 --seed 0 --id-col doc_id)
      |analyze: profile stats dedup-find dedup-remove dedup-summary dedup-report
      |         sample sample-stratified sample-systematic sample-to-table
      |         quality quality-report quality-history anomalies completeness
      |         similar-docs (--threshold 0.8 --max-token-freq 100 --tfidf)
      |         funnel <table> (--steps signup,view,purchase)
      |         cohort <table> transitions <table> (--user-col --ts-col)
      |         histogram <table> <column> (--bin-width 10 --origin 0)
      |cdc:     changes change-log change-summary change-export incremental
      |         classify-changes (--keys a,b)
      |         scd2 <table> <target> (--keys user_id --attrs event_type
      |           --ts-col ts --tie-col event_id)
      |         watermark-set watermark-show watermark-reset watermarks
      |orchestrate: view-create views view-query view-drop view-show
      |         matview-create matview-refresh matview-fresh matview-list
      |         matview-drop matview-query pipeline-create pipeline-run
      |         pipeline-dry-run pipeline-drop pipeline-show pipelines
      |         lineage lineage-add lineage-remove lineage-impact lineage-graph
      |         maintain maintain-set maintain-show maintain-table maintain-remove
      |         maintenance-status compact (--target-files 8 --cluster-by x,y) compact-small
      |         cleanup partitions partition-stats
      |         retention-set retention-show retention-check retention-run
      |         retention-remove
      |         auto-refresh auto-refresh-set auto-refresh-plan
      |         auto-refresh-history sample-stats dashboard
      |govern:  rule-add rules rule-drop validate-check mask-set mask-query
      |         mask-list mask-remove mask-preview contract-generate
      |         contract-create contract-update contract-apply contract-check-data
      |         contract-dry-run contract-dry-run-migration contract-deprecate
      |         contract-status contract-consumers
      |         contract-monitor contract-list contract-show contract-history
      |         contract-validate contract-compliance contract-trends
      |         contract-add-consumer contract-add-producer contract-registry
      |         contract-coverage contract-drop contract-dashboard
      |         contract-summary contract-preview contract-health
      |         contract-diff contract-violations notify-remove
      |         sla-set sla-check sla-list sla-show sla-remove sla-history
      |         tag tag-show tag-remove search describe-set bookmark unbookmark
      |         bookmarks classify classifications column-describe
      |         column-descriptions schema-enriched glossary-add glossary-list
      |         glossary-search glossary-remove notify-add notify-list
      |         notify-history notify-test
      |         audit audit-clear clone clone-promote clone-discard clone-list
      |         rename-table
      |         advisor-partitions advisor-cost advisor-materializations
      |         advisor-patterns advisor-report
      |
      |Global flags: --warehouse DIR --max-rows N""".stripMargin
}
