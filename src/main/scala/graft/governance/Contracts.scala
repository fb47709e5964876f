package graft.governance

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Lakehouse
import graft.core.Jsons

case class ContractColumn(name: String, dataType: String, nullable: Boolean)

/** Constraint kinds mirror the reference (contracts.py:465-503):
  * not_null | range (min/max) | enum (values) | regex (pattern). */
case class ContractConstraint(column: String, kind: String,
    params: Map[String, String] = Map.empty, values: List[String] = Nil)

case class Contract(
    table: String,
    version: Int,
    columns: List[ContractColumn],
    constraints: List[ContractConstraint],
    owner: String = "",
    description: String = "",
    createdMs: Long = 0,
    status: String = "active")

case class ContractCheck(kind: String, // schema | constraint
    subject: String, passed: Boolean, message: String, failedRows: Long = 0)

case class ComplianceReport(table: String, version: Int, score: Double,
    schemaScore: Double, constraintScore: Double, qualityScore: Double,
    freshnessScore: Double, checks: List[ContractCheck], timestampMs: Long)

/** Data contracts (reference contracts.py — its largest module, 1,380 LoC):
  * CRUD + versioning with history snapshots, schema + constraint validation
  * against live data via DataFrame counts, weighted compliance score
  * (schema .3, constraints .3, quality .2, freshness .2 — contracts.py:830),
  * consumer/producer registry, coverage report, and auto-generation from a
  * profile (nullability, ±10% numeric range buffer, enum when ≤20 distinct —
  * contracts.py:987-1081). */
class Contracts(lh: Lakehouse) {
  val MaxHistory = 50
  private def path = lh.metaDir.resolve("contracts.json")
  private def histPath = lh.metaDir.resolve("contracts_history.json")
  private def regPath = lh.metaDir.resolve("contracts_registry.json")
  private def compPath = lh.metaDir.resolve("contracts_compliance.json")

  private def load(): Map[String, Contract] =
    if (Files.exists(path)) Jsons.readFile[Map[String, Contract]](path) else Map.empty

  private def loadHist(): Map[String, List[Contract]] =
    if (Files.exists(histPath)) Jsons.readFile[Map[String, List[Contract]]](histPath)
    else Map.empty

  def create(c: Contract): Contract = synchronized {
    require(!load().contains(c.table), s"contract exists for ${c.table}")
    val v = c.copy(version = 1, createdMs = System.currentTimeMillis())
    Jsons.writeFile(path, load() + (c.table -> v))
    v
  }

  /** Update bumps the version and snapshots the old one into history
    * (contracts.py:142-146). */
  def update(c: Contract): Contract = synchronized {
    val old = get(c.table)
    val v = c.copy(version = old.version + 1, createdMs = System.currentTimeMillis())
    Jsons.writeFile(path, load() + (c.table -> v))
    val h = loadHist()
    Jsons.writeFile(histPath,
      h + (c.table -> (h.getOrElse(c.table, Nil) :+ old).takeRight(MaxHistory)))
    v
  }

  def get(table: String): Contract =
    load().getOrElse(table, throw new IllegalArgumentException(s"no contract for $table"))

  def list(): List[Contract] = load().values.toList.sortBy(_.table)

  def history(table: String): List[Contract] = loadHist().getOrElse(table, Nil)

  def drop(table: String): Unit = synchronized {
    require(load().contains(table), s"no contract for $table")
    Jsons.writeFile(path, load() - table)
  }

  /** Follow a [[graft.core.Catalog.renameTable]]: re-key the live
    * contract, its version history, the consumer/producer registry and
    * the compliance history (keys may be short or ns-qualified — both
    * forms follow). */
  private[graft] def renameTable(from: String, to: String): Unit =
    synchronized {
      import graft.core.Catalog.{canonicalIdent, rekeyStore}
      val t = canonicalIdent(to)
      Jsons.writeFile(path,
        rekeyStore(load(), from, to)(_.copy(table = t)))
      Jsons.writeFile(histPath,
        rekeyStore(loadHist(), from, to)(_.map(_.copy(table = t))))
      Jsons.writeFile(regPath, rekeyStore(registry(), from, to)(identity))
      Jsons.writeFile(compPath,
        rekeyStore(complianceHistoryAll(), from, to)(
          _.map(_.copy(table = t))))
    }

  /** Create-or-update from a full contract document (reference cli.py
    * contract apply): new tables get v1, existing ones a version bump with
    * the old contract snapshotted into history. */
  def applyContract(c: Contract): Contract = synchronized {
    if (load().contains(c.table)) update(c) else create(c)
  }

  /** Lifecycle transition to `deprecated` (reference cli.py contract
    * deprecate/status): in-place status flip, no version bump — the terms
    * did not change, only their standing. */
  def deprecate(table: String): Contract = synchronized {
    val v = get(table).copy(status = "deprecated")
    Jsons.writeFile(path, load() + (table -> v))
    v
  }

  // ---- validation ---------------------------------------------------------

  /** Schema check: every contract column present with the right type;
    * nullability violations found by counting (contracts.py:465-503). */
  def validateSchema(table: String): List[ContractCheck] = {
    val c = get(table)
    val actual = lh.catalog.loadTable(table).schema
    c.columns.map { cc =>
      actual.fields.find(_.name == cc.name) match {
        case None =>
          ContractCheck("schema", cc.name, passed = false, "column missing")
        case Some(f) =>
          val expected = graft.core.TableMeta.parseTypeName(cc.dataType)
          if (f.dataType != expected)
            ContractCheck("schema", cc.name, passed = false,
              s"type ${f.dataType.typeName} != ${cc.dataType}")
          else ContractCheck("schema", cc.name, passed = true, "")
      }
    }
  }

  def validateConstraints(table: String, dfOpt: Option[DataFrame] = None)
      : List[ContractCheck] = {
    val c = get(table)
    val df = dfOpt.getOrElse(lh.catalog.loadTable(table).read())
    val present = df.columns.toSet
    c.constraints.map { con =>
      if (!present.contains(con.column))
        ContractCheck("constraint", s"${con.kind}(${con.column})", passed = false,
          "column missing")
      else {
        val col0 = col(con.column)
        val failing = con.kind match {
          case "not_null" => df.where(col0.isNull).count()
          case "range" =>
            var cond = lit(false)
            con.params.get("min").foreach(m => cond = cond || (col0 < m.toDouble))
            con.params.get("max").foreach(m => cond = cond || (col0 > m.toDouble))
            df.where(col0.isNotNull && cond).count()
          case "enum" =>
            df.where(col0.isNotNull && !col0.cast("string").isInCollection(con.values)).count()
          case "regex" =>
            df.where(col0.isNotNull && !col0.cast("string").rlike(con.params("pattern"))).count()
          case other => throw new IllegalArgumentException(s"unknown constraint: $other")
        }
        ContractCheck("constraint", s"${con.kind}(${con.column})",
          passed = failing == 0, if (failing == 0) "" else s"$failing failing rows", failing)
      }
    }
  }

  /** Pre-write row validation against the contract (contracts.py:342-425). */
  def validateRows(table: String, incoming: DataFrame): List[ContractCheck] =
    if (!load().contains(table)) Nil
    else validateConstraints(table, Some(incoming)).filterNot(_.passed)

  // ---- compliance ---------------------------------------------------------

  /** Weighted compliance: schema .3, constraints .3, quality .2,
    * freshness .2 (contracts.py:830). History capped. */
  def monitor(table: String): ComplianceReport = {
    val c = get(table)
    val schemaChecks = validateSchema(table)
    val constraintChecks = validateConstraints(table)
    val schemaScore =
      if (schemaChecks.isEmpty) 1.0
      else schemaChecks.count(_.passed).toDouble / schemaChecks.size
    val constraintScore =
      if (constraintChecks.isEmpty) 1.0
      else constraintChecks.count(_.passed).toDouble / constraintChecks.size
    val q = lh.quality.computeScore(table)
    val score = 0.3 * schemaScore + 0.3 * constraintScore +
      0.2 * q.score + 0.2 * q.freshness
    val report = ComplianceReport(table, c.version, score, schemaScore,
      constraintScore, q.score, q.freshness,
      schemaChecks ++ constraintChecks, System.currentTimeMillis())
    synchronized {
      val all = complianceHistoryAll()
      Jsons.writeFile(compPath,
        all + (table -> (all.getOrElse(table, Nil) :+ report).takeRight(MaxHistory)))
    }
    if (score < 1.0)
      lh.notifications.fireEvent(table, "contract_violation",
        f"compliance score $score%.3f")
    report
  }

  private def complianceHistoryAll(): Map[String, List[ComplianceReport]] =
    if (Files.exists(compPath)) Jsons.readFile[Map[String, List[ComplianceReport]]](compPath)
    else Map.empty

  def complianceHistory(table: String): List[ComplianceReport] =
    complianceHistoryAll().getOrElse(table, Nil)

  /** Compliance trend: (timestamp, score) series for dashboards. */
  def trend(table: String): List[(Long, Double)] =
    complianceHistory(table).map(r => (r.timestampMs, r.score))

  // ---- registry + coverage -----------------------------------------------

  def registerConsumer(table: String, name: String): Unit = registryAdd(table, "consumers", name)
  def registerProducer(table: String, name: String): Unit = registryAdd(table, "producers", name)

  private def registryAdd(table: String, kind: String, name: String): Unit =
    synchronized {
      val all = registry()
      val forTable = all.getOrElse(table, Map("consumers" -> Nil, "producers" -> Nil))
      val updated = forTable + (kind -> (forTable.getOrElse(kind, Nil) :+ name).distinct)
      Jsons.writeFile(regPath, all + (table -> updated))
    }

  def registry(): Map[String, Map[String, List[String]]] =
    if (Files.exists(regPath)) Jsons.readFile[Map[String, Map[String, List[String]]]](regPath)
    else Map.empty

  /** Coverage: which catalog tables have contracts (contracts.py coverage). */
  def coverage(): Map[String, Any] = {
    val tables = lh.catalog.listTables("*")
    val covered = tables.filter(load().contains)
    Map("total" -> tables.size, "covered" -> covered.size,
      "uncovered" -> tables.filterNot(load().contains),
      "ratio" -> (if (tables.isEmpty) 1.0 else covered.size.toDouble / tables.size))
  }

  // ---- summaries, health, diffs, dry runs (contracts.py:183-1456) --------

  /** Contract terms vs current table state (contracts.py:183-240). */
  def summary(table: String): Map[String, Any] = {
    val c = get(table)
    val tbl = lh.catalog.loadTable(table)
    val schemaChecks = validateSchema(table)
    Map(
      "table" -> table, "version" -> c.version,
      "columns" -> c.columns.size, "constraints" -> c.constraints.size,
      "table_rows" -> tbl.currentSnapshot.map(_.totalRows).getOrElse(0L),
      "schema_ok" -> schemaChecks.forall(_.passed),
      "schema_failures" -> schemaChecks.filterNot(_.passed).map(_.subject),
      "consumers" -> registry().getOrElse(table, Map.empty)
        .getOrElse("consumers", Nil),
      "producers" -> registry().getOrElse(table, Map.empty)
        .getOrElse("producers", Nil),
      "last_score" -> complianceHistory(table).lastOption.map(_.score))
  }

  /** Single-table health card: contract + recent compliance + registry
    * (contracts.py:1382-1456). */
  def health(table: String): Map[String, Any] = {
    if (!load().contains(table))
      return Map("table" -> table, "has_contract" -> false)
    val c = get(table)
    val hist = complianceHistory(table)
    val reg = registry().getOrElse(table, Map.empty)
    Map(
      "table" -> table, "has_contract" -> true, "version" -> c.version,
      "compliance_score" -> hist.lastOption.map(_.score),
      "last_check_passed" -> hist.lastOption.map(_.score == 1.0),
      "last_check_at" -> hist.lastOption.map(_.timestampMs),
      "last_violation_count" ->
        hist.lastOption.map(_.checks.count(!_.passed)).getOrElse(0),
      "recent_checks" -> hist.takeRight(5).reverse.map(r =>
        Map("score" -> r.score, "at" -> r.timestampMs)),
      "consumer_count" -> reg.getOrElse("consumers", Nil).size,
      "consumers" -> reg.getOrElse("consumers", Nil),
      "producers" -> reg.getOrElse("producers", Nil))
  }

  /** Diff two contract versions: added/removed/changed columns and
    * constraints (contracts.py:551-640). Version numbers resolve against
    * history + current. */
  def diffVersions(table: String, v1: Int, v2: Int): Map[String, Any] = {
    val all = (history(table) :+ get(table)).map(c => c.version -> c).toMap
    val a = all.getOrElse(v1, throw new IllegalArgumentException(s"no version $v1"))
    val b = all.getOrElse(v2, throw new IllegalArgumentException(s"no version $v2"))
    val aCols = a.columns.map(c => c.name -> c).toMap
    val bCols = b.columns.map(c => c.name -> c).toMap
    val changed = (aCols.keySet & bCols.keySet).toList.sorted
      .filter(n => aCols(n) != bCols(n))
      .map(n => s"$n: ${aCols(n).dataType}→${bCols(n).dataType}")
    def conKey(c: ContractConstraint) = s"${c.kind}(${c.column})"
    Map(
      "table" -> table, "v1" -> v1, "v2" -> v2,
      "added_columns" -> (bCols.keySet -- aCols.keySet).toList.sorted,
      "removed_columns" -> (aCols.keySet -- bCols.keySet).toList.sorted,
      "changed_columns" -> changed,
      "added_constraints" ->
        (b.constraints.map(conKey).toSet -- a.constraints.map(conKey)).toList.sorted,
      "removed_constraints" ->
        (a.constraints.map(conKey).toSet -- b.constraints.map(conKey)).toList.sorted)
  }

  /** Test a proposed contract against live data without saving
    * (contracts.py:1102-1156): runs the same schema + constraint checks
    * monitor() would, but for the candidate contract. */
  def dryRun(table: String, candidate: Contract): List[ContractCheck] = {
    val actual = lh.catalog.loadTable(table).schema
    val schemaChecks = candidate.columns.map { cc =>
      actual.fields.find(_.name == cc.name) match {
        case None => ContractCheck("schema", cc.name, passed = false, "column missing")
        case Some(f) =>
          val expected = graft.core.TableMeta.parseTypeName(cc.dataType)
          if (f.dataType != expected)
            ContractCheck("schema", cc.name, passed = false,
              s"type ${f.dataType.typeName} != ${cc.dataType}")
          else ContractCheck("schema", cc.name, passed = true, "")
      }
    }
    val df = lh.catalog.loadTable(table).read()
    // constraint checks evaluate the candidate, not the stored contract
    val present = df.columns.toSet
    val conChecks = candidate.constraints.map { con =>
      if (!present.contains(con.column))
        ContractCheck("constraint", s"${con.kind}(${con.column})", passed = false,
          "column missing")
      else {
        val col0 = col(con.column)
        val failing = con.kind match {
          case "not_null" => df.where(col0.isNull).count()
          case "range" =>
            var cond = lit(false)
            con.params.get("min").foreach(m => cond = cond || (col0 < m.toDouble))
            con.params.get("max").foreach(m => cond = cond || (col0 > m.toDouble))
            df.where(col0.isNotNull && cond).count()
          case "enum" =>
            df.where(col0.isNotNull && !col0.cast("string").isInCollection(con.values)).count()
          case "regex" =>
            df.where(col0.isNotNull && !col0.cast("string").rlike(con.params("pattern"))).count()
          case other => throw new IllegalArgumentException(s"unknown constraint: $other")
        }
        ContractCheck("constraint", s"${con.kind}(${con.column})",
          passed = failing == 0, if (failing == 0) "" else s"$failing failing rows", failing)
      }
    }
    schemaChecks ++ conChecks
  }

  /** Simulate migrating to a new contract (contracts.py:1158-1230):
    * diff vs current + dry-run validation of the candidate. */
  def dryRunMigration(table: String, to: Contract): Map[String, Any] = {
    val cur = get(table)
    val checks = dryRun(table, to)
    val failed = checks.filterNot(_.passed)
    Map(
      "table" -> table,
      "from_version" -> cur.version, "to_version" -> (cur.version + 1),
      "column_delta" -> (to.columns.size - cur.columns.size),
      "constraint_delta" -> (to.constraints.size - cur.constraints.size),
      "checks" -> checks.size, "failing" -> failed.size,
      "failing_subjects" -> failed.map(_.subject),
      "safe" -> failed.isEmpty)
  }

  /** Current violations = failed schema/constraint checks
    * (contracts.py:428-460). */
  def violations(table: String): List[ContractCheck] =
    (validateSchema(table) ++ validateConstraints(table)).filterNot(_.passed)

  /** Draft contract without saving (contracts.py:1002-1100). `strict`
    * tightens generation: exact ranges (no ±10% buffer) and not_null when
    * the observed null ratio is under 1%. */
  def preview(table: String, strict: Boolean = false): Contract = {
    val c = generateFromProfile(table)
    if (!strict) c
    else {
      val profile = lh.profile.profileTable(table)
      val tightened = c.constraints.map { con =>
        if (con.kind == "range") {
          val p = profile.columns.find(_.name == con.column).get
          con.copy(params = Map(
            "min" -> p.min.map(_.toDouble.toString).getOrElse(con.params("min")),
            "max" -> p.max.map(_.toDouble.toString).getOrElse(con.params("max"))))
        } else con
      }
      val extraNotNull = profile.columns.filter { p =>
        p.nullCount > 0 && profile.rowCount > 0 &&
          p.nullCount.toDouble / profile.rowCount < 0.01 &&
          !tightened.exists(k => k.kind == "not_null" && k.column == p.name)
      }.map(p => ContractConstraint(p.name, "not_null"))
      c.copy(constraints = tightened ++ extraNotNull)
    }
  }

  // ---- auto-generation (contracts.py:987-1081) ---------------------------

  /** Generate a contract from the live profile: observed nullability,
    * ±10% numeric range buffer, enum constraint when ≤20 distinct values. */
  def generateFromProfile(table: String): Contract = {
    val profile = lh.profile.profileTable(table)
    val schema = lh.catalog.loadTable(table).schema
    val columns = schema.fields.map { f =>
      val p = profile.columns.find(_.name == f.name).get
      ContractColumn(f.name, f.dataType.typeName, nullable = p.nullCount > 0)
    }.toList
    val constraints = profile.columns.flatMap { p =>
      val notNull = if (p.nullCount == 0 && profile.rowCount > 0)
        Some(ContractConstraint(p.name, "not_null")) else None
      val range = (p.min, p.max) match {
        case (Some(mn), Some(mx)) if p.mean.isDefined => // numeric only
          val lo = mn.toDouble; val hi = mx.toDouble
          val buffer = (hi - lo).abs * 0.1
          Some(ContractConstraint(p.name, "range", Map(
            "min" -> (lo - buffer).toString, "max" -> (hi + buffer).toString)))
        case _ => None
      }
      // enum when ≤20 distinct values (contracts.py:1042) — collected from
      // the table, since the profile only carries top-10
      val enum0 = if (p.dataType == "string" && p.distinctCount <= 20 &&
          p.distinctCount > 0)
        Some(ContractConstraint(p.name, "enum",
          values = lh.catalog.loadTable(table).read()
            .select(org.apache.spark.sql.functions.col(p.name))
            .where(org.apache.spark.sql.functions.col(p.name).isNotNull)
            .distinct().collect().map(_.get(0).toString).toList.sorted))
      else None
      Seq(notNull, range, enum0).flatten
    }
    Contract(table, 0, columns, constraints,
      description = s"auto-generated from profile of $table")
  }
}
