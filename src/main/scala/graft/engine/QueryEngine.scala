package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation

import graft.Lakehouse

/** SQL entry point over catalog tables (reference query.py / joins.py).
  *
  * Differences from the reference, by design: table registration is LAZY
  * temp views over the current snapshot's files (the reference eagerly
  * materializes every table to Arrow before each query, query.py:68 —
  * defeating predicate pushdown); Catalyst then prunes/pushes down into the
  * parquet scans.
  */
class QueryEngine(lh: Lakehouse) {
  import lh.spark

  /** Register all tables under short + `ns__table` names (query.py:52-75,
    * joins.py:13-41). Cheap — no materialization. */
  def refresh(): Unit = lh.catalog.registerViews()

  /** Rewrite `ns.table` → `ns__table` for known tables (joins.py:44-55 does
    * a blind string replace; this version is token-aware: whole identifiers
    * only, and text inside single-quoted SQL literals is left untouched). */
  def rewriteNamespaces(sql: String): String = {
    val idents = lh.catalog.listTables("*")
    if (idents.isEmpty) return sql
    // split into literal and non-literal segments; rewrite only the latter
    val parts = sql.split("'", -1)
    parts.zipWithIndex.map { case (seg, i) =>
      if (i % 2 == 1) seg // inside a quoted literal
      else idents.foldLeft(seg) { (s, ident) =>
        s.replaceAll("\\b" + java.util.regex.Pattern.quote(ident) + "\\b(?!\\w)",
          ident.replace(".", "__"))
      }
    }.mkString("'")
  }

  /** Naive bare-SELECT auto-LIMIT parity (query.py:162-164): applied only
    * when the SQL has no LIMIT substring, as the reference does. */
  def needsLimit(sql: String): Boolean = !sql.toUpperCase.contains("LIMIT")

  /** `maxRows <= 0` disables the auto-LIMIT entirely — the path for
    * materializing a full result to a table. A `limit(Int.MaxValue)`
    * sentinel would NOT be free: GlobalLimit shuffles every row to a
    * single partition, so "unlimited" must mean no limit node at all. */
  def execute(sql: String, maxRows: Int = 1000): DataFrame = {
    refresh()
    val df = spark.sql(rewriteNamespaces(sql))
    recordLineage(sql)
    if (maxRows > 0 && needsLimit(sql)) df.limit(maxRows) else df
  }

  /** Time-travel query: registers ONLY the named table, resolved at the
    * given snapshot-id/timestamp (query.py:169-197). */
  def executeAsOf(table: String, sql: String, asOf: String,
      maxRows: Int = 1000): DataFrame = {
    val (_, short) = graft.core.Catalog.parseIdent(table)
    lh.catalog.loadTable(table).readAsOf(asOf).createOrReplaceTempView(short)
    val df = spark.sql(sql)
    if (needsLimit(sql)) df.limit(maxRows) else df
  }

  /** Federated multi-table join query (joins.py:58-93). */
  def executeJoin(sql: String, maxRows: Int = 10000): DataFrame =
    execute(sql, maxRows)

  /** Tables referenced by a SQL string, from the PARSED plan's unresolved
    * relations — not the reference's substring matching (matviews.py:35-51),
    * which false-positives on column names. */
  def referencedTables(sql: String): Seq[String] = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    plan.collect {
      case r: UnresolvedRelation => r.multipartIdentifier.mkString(".")
    }.distinct.map(n => n.replace("__", "."))
  }

  /** Dry-run validation: parse, then analyze against registered views
    * (pipelines.py:159-167 uses EXPLAIN). Throws on invalid SQL. */
  def validateSql(sql: String): Unit = {
    refresh()
    spark.sql(rewriteNamespaces(sql)).queryExecution.analyzed
  }

  private def recordLineage(sql: String): Unit = ()

  /** Equi-join candidates from matching column names across tables, with a
    * ready-to-run join SQL template (reference suggest_joins,
    * joins.py:191-237). Pure metadata walk — no data touched. */
  def suggestJoins(): Seq[(String, String, String, String)] = {
    val tables = lh.catalog.listTables("*")
    val schemas = tables.map(t => t -> lh.catalog.loadTable(t).schema.fieldNames.toSet)
    for {
      (ta, ca) <- schemas
      (tb, cb) <- schemas if ta < tb
      shared <- (ca intersect cb).toSeq.sorted
    } yield (ta, tb, shared,
      s"SELECT * FROM ${ta.replace(".", "__")} a JOIN ${tb.replace(".", "__")} b" +
        s" ON a.$shared = b.$shared")
  }
}
