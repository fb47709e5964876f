package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.Lakehouse

/** File import/export (reference catalog.py:1436-1817).
  *
  * Import: CSV/TSV/JSON-array/NDJSON with format auto-detect by extension
  * (catalog.py:1472-1489), `ifExists` ∈ fail|append|replace, and append-mode
  * column reordering/casting/null-filling (catalog.py:1549-1581 — handled by
  * IceTable's align-on-commit). Export: CSV/JSON/NDJSON/Parquet with
  * where/columns/limit pushdown (catalog.py:1752-1772).
  */
class ImportExport(lh: Lakehouse) {
  import lh.spark

  def detectFormat(path: String): String = {
    val p = path.toLowerCase
    if (p.endsWith(".csv")) "csv"
    else if (p.endsWith(".tsv")) "tsv"
    else if (p.endsWith(".jsonl") || p.endsWith(".ndjson")) "ndjson"
    else if (p.endsWith(".json")) "json"
    else if (p.endsWith(".parquet")) "parquet"
    else if (p.endsWith(".orc")) "orc"
    else throw new IllegalArgumentException(s"cannot detect format of $path")
  }

  def readFile(path: String, format: Option[String] = None): DataFrame =
    format.getOrElse(detectFormat(path)) match {
      case "csv" => spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      case "tsv" => spark.read.option("header", "true").option("inferSchema", "true")
        .option("sep", "\t").csv(path)
      case "ndjson" => spark.read.json(path)
      // a bare JSON array needs multiLine (catalog.py JSON-array handling)
      case "json" => spark.read.option("multiLine", "true").json(path)
      case "parquet" => spark.read.parquet(path)
      // columnar interchange beyond the reference's surface: Spark ships a
      // native vectorized ORC reader/writer (no extra dependency), and ORC
      // round-trips the full type lattice losslessly (gate q146)
      case "orc" => spark.read.orc(path)
      case other => throw new IllegalArgumentException(s"unknown format: $other")
    }

  /** Import a file into a table. Returns imported row count. */
  def importFile(path: String, table: String, ifExists: String = "fail",
      format: Option[String] = None): Long = {
    val df = readFile(path, format)
    val exists = lh.catalog.tableExists(table)
    (exists, ifExists) match {
      case (true, "fail") =>
        throw new IllegalArgumentException(s"table exists: $table (ifExists=fail)")
      case (true, "append") =>
        lh.catalog.loadTable(table).append(df).summary("added-rows").toLong
      case (true, "replace") =>
        lh.catalog.loadTable(table).overwrite(df).summary("added-rows").toLong
      case (false, _) =>
        val tbl = lh.catalog.createTable(table, df.schema, Nil, Map.empty)
        tbl.append(df).summary("added-rows").toLong
      case (_, other) =>
        throw new IllegalArgumentException(s"bad ifExists: $other")
    }
  }

  /** Export with optional where/columns/limit applied BEFORE the scan plan
    * executes — Catalyst pushes the filter and pruning into parquet, unlike
    * the reference's post-materialization slicing. */
  def exportTable(table: String, path: String, format: String = "csv",
      where: Option[String] = None, columns: Seq[String] = Nil,
      limit: Option[Int] = None): Long = {
    // a --where export goes through the manifest pruner: files whose
    // commit-time column bounds exclude the predicate are never opened
    // (result identical — prunedRead re-applies the filter exactly)
    var df = where match {
      case Some(w) => lh.catalog.loadTable(table).prunedRead(expr(w))
      case None => lh.catalog.loadTable(table).read()
    }
    if (columns.nonEmpty) df = df.select(columns.map(col): _*)
    limit.foreach(n => df = df.limit(n))
    val rows = df.count()
    format match {
      case "csv" => df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
      case "json" | "ndjson" => df.write.mode(SaveMode.Overwrite).json(path)
      case "parquet" => df.write.mode(SaveMode.Overwrite).parquet(path)
      case "orc" => df.write.mode(SaveMode.Overwrite).orc(path)
      case other => throw new IllegalArgumentException(s"unknown format: $other")
    }
    lh.audit.log(table, "export", Map("path" -> path, "format" -> format))
    rows
  }
}
