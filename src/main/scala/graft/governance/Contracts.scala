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
    createdMs: Long = 0)

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
