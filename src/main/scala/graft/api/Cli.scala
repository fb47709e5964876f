package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s.jackson.JsonMethods

import graft.{Fixtures, Lakehouse}
import graft.core.TableMeta
import graft.dml.BatchOp
import graft.governance.{MaskingPolicy, NotificationHandler, SlaPolicy, ValidationRule}
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

      // ---- io -------------------------------------------------------------
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
        lh.cloning.clone(original, target, flags.get("as-of"))
        println(s"cloned $original -> $target")
      case List("clone-promote", name) => lh.cloning.promote(name)
      case List("advisor-partitions", table) =>
        lh.advisor.suggestPartitions(table).foreach(s =>
          println(f"${s.column}: distinct=${s.distinct} benefit=${s.benefit}%.3f"))
      case List("advisor-cost", sql) =>
        val c = lh.advisor.estimateCost(sql)
        println(s"rows≈${c.estimatedRows} complexity=${c.complexity}")

      case other =>
        throw new IllegalArgumentException(
          s"unknown command: ${other.mkString(" ")}\n$help")
    }
  }

  private def parseFlags(args: List[String]): (Map[String, String], List[String]) = {
    var flags = Map.empty[String, String]
    var pos = List.empty[String]
    var rest = args
    while (rest.nonEmpty) {
      rest match {
        case f :: v :: t if f.startsWith("--") && !v.startsWith("--") =>
          flags += f.drop(2) -> v; rest = t
        case f :: t if f.startsWith("--") => flags += f.drop(2) -> "true"; rest = t
        case p :: t => pos :+= p; rest = t
      }
    }
    (flags, pos)
  }

  private def parseRow(json: String): Map[String, Any] =
    JsonMethods.parse(json).values.asInstanceOf[Map[String, Any]]

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
      |query:   query query-asof suggest-joins
      |dml:     insert update delete upsert (--keys a,b)
      |history: snapshots rollback expire (--older-than 30d --retain-last N)
      |io:      import export backup restore verify-backup
      |analyze: profile stats dedup-find dedup-remove sample quality anomalies
      |cdc:     changes change-log incremental
      |orchestrate: view-create views view-query matview-create matview-refresh
      |         matview-fresh pipeline-create pipeline-run pipeline-dry-run
      |         pipelines lineage maintain retention-set auto-refresh
      |govern:  rule-add rules rule-drop mask-set mask-query contract-generate
      |         contract-monitor sla-set sla-check tag search classify
      |         schema-enriched notify-add audit clone clone-promote
      |         advisor-partitions advisor-cost
      |
      |Global flags: --warehouse DIR --max-rows N""".stripMargin
}
