package graft.governance

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Jsons

/** A validation rule (reference validation.py:41-300). `ruleType` ∈
  * not_null | unique | range | regex | expression.
  *  - not_null: columns must be non-null
  *  - unique: multi-column key unique among incoming AND vs existing rows
  *  - range: params min/max on a numeric column
  *  - regex: params pattern on a string column
  *  - expression: SQL predicate every row must satisfy
  */
case class ValidationRule(
    id: String,
    table: String,
    ruleType: String,
    columns: List[String],
    params: Map[String, String] = Map.empty)

case class ValidationFailure(ruleId: String, ruleType: String, message: String,
    failedRows: Long)

class ValidationException(val failures: Seq[ValidationFailure])
  extends RuntimeException(
    s"validation failed: ${failures.map(f => s"${f.ruleId}(${f.ruleType}): ${f.message}").mkString("; ")}")

/** Rule CRUD in a JSON store + enforcement used by the DML write path
  * (enforced inside insert/update/upsert, catalog.py:603-620). Checks run as
  * DataFrame counts — distributed, never collecting candidate rows.
  */
class ValidationStore(path: Path) {
  private def load(): List[ValidationRule] =
    if (Files.exists(path)) Jsons.readFile[List[ValidationRule]](path) else Nil

  private def save(rs: List[ValidationRule]): Unit = Jsons.writeFile(path, rs)

  def addRule(rule: ValidationRule): Unit = synchronized {
    require(Set("not_null", "unique", "range", "regex", "expression")(rule.ruleType),
      s"unknown rule type: ${rule.ruleType}")
    require(!load().exists(_.id == rule.id), s"rule exists: ${rule.id}")
    save(load() :+ rule)
  }

  def listRules(table: Option[String] = None): List[ValidationRule] =
    load().filter(r => table.forall(_ == r.table))

  def dropRule(id: String): Unit = synchronized {
    val rs = load()
    require(rs.exists(_.id == id), s"no such rule: $id")
    save(rs.filterNot(_.id == id))
  }

  /** Follow a [[graft.core.Catalog.renameTable]]: rules gate writes, so
    * a stale table key would silently stop enforcing after a rename. */
  private[graft] def renameTable(from: String, to: String): Unit =
    synchronized {
      import graft.core.Catalog.canonicalIdent
      val f = canonicalIdent(from)
      val t = canonicalIdent(to)
      save(load().map(r =>
        if (canonicalIdent(r.table) == f) r.copy(table = t) else r))
    }

  /** Validate candidate rows (plus uniqueness vs existing). Returns failures;
    * empty = valid. */
  def validate(table: String, candidate: DataFrame,
      existing: Option[DataFrame]): Seq[ValidationFailure] =
    listRules(Some(table)).flatMap { r =>
      checkRule(r, candidate, existing)
    }

  /** Throw [[ValidationException]] on any failure (write-path contract). */
  def enforce(table: String, candidate: DataFrame, existing: Option[DataFrame]): Unit = {
    val fs = validate(table, candidate, existing)
    if (fs.nonEmpty) throw new ValidationException(fs)
  }

  private def checkRule(r: ValidationRule, df: DataFrame,
      existing: Option[DataFrame]): Option[ValidationFailure] = r.ruleType match {
    case "not_null" =>
      val cond = r.columns.map(c => col(c).isNull).reduce(_ || _)
      fail(r, df.where(cond).count(), s"null in ${r.columns.mkString(",")}")
    case "unique" =>
      val keys = r.columns.map(col)
      val dupIncoming = df.groupBy(keys: _*).count().where(col("count") > 1).count()
      val dupVsExisting = existing match {
        case Some(e) => df.join(e.select(r.columns.map(col): _*), r.columns, "left_semi").count()
        case None => 0L
      }
      fail(r, dupIncoming + dupVsExisting,
        s"duplicate key ${r.columns.mkString(",")} (incoming dups: $dupIncoming, vs existing: $dupVsExisting)")
    case "range" =>
      val c = col(r.columns.head)
      var cond = lit(false)
      r.params.get("min").foreach(m => cond = cond || (c < lit(m.toDouble)))
      r.params.get("max").foreach(m => cond = cond || (c > lit(m.toDouble)))
      fail(r, df.where(c.isNotNull && cond).count(),
        s"${r.columns.head} outside [${r.params.getOrElse("min", "-inf")}, ${r.params.getOrElse("max", "inf")}]")
    case "regex" =>
      val c = col(r.columns.head)
      fail(r, df.where(c.isNotNull && !c.rlike(r.params("pattern"))).count(),
        s"${r.columns.head} !~ ${r.params("pattern")}")
    case "expression" =>
      fail(r, df.where(!expr(r.params("sql"))).count(),
        s"rows violating ${r.params("sql")}")
  }

  private def fail(r: ValidationRule, n: Long, msg: String): Option[ValidationFailure] =
    if (n > 0) Some(ValidationFailure(r.id, r.ruleType, msg, n)) else None
}
