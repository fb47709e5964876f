package graft.engine

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL stored procedures (`CALL cat.system.<proc>(…)`, Spark 4 DSv2
  * `ProcedureCatalog`): the engine's table-maintenance operations on the
  * native SQL surface, Iceberg's Spark-procedures UX. Every procedure is
  * a thin binding onto the SAME engine entry point the API/CLI/MCP
  * surfaces call — `IceTable.rollbackTo` / `expireSnapshots` /
  * `compact` / `compactSmall` / `compactDeletes` / `tagSnapshot` /
  * `removeTag` / `publishWap` — so SQL maintenance can never drift from
  * the engine's commit protocol (CAS, tag pinning, concurrency aborts
  * all included for free).
  *
  * Results come back as one driver-local row ([[LocalScan]]), like
  * Iceberg's procedures: `CALL g.system.compact('default.t', 4)` →
  * `(snapshot_id, rewritten_files)`. */
object GraftProcedures {

  val Namespace: Array[String] = Array("system")

  def names: Seq[String] = Seq("rollback_to_snapshot", "expire_snapshots",
    "compact", "compact_small", "compact_deletes", "tag_snapshot",
    "remove_tag", "publish_wap", "remove_orphans")

  def load(lh: => graft.Lakehouse, ident: Identifier): UnboundProcedure = {
    require(ident.namespace.sameElements(Namespace),
      s"procedures live in the 'system' namespace, got ${ident.namespace.mkString(".")}")
    val name = ident.name
    require(names.contains(name), s"unknown procedure: $name (have ${names.mkString(", ")})")

    def p(n: String, dt: DataType) = ProcedureParameter.in(n, dt).build()
    def pd(n: String, dt: DataType, d: String) =
      ProcedureParameter.in(n, dt).defaultValue(d).build()
    def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString
    def tbl(r: InternalRow): graft.core.IceTable =
      lh.catalog.loadTable(str(r, 0))

    name match {
      case "rollback_to_snapshot" => proc(name,
        "roll the table back to a snapshot id / tag / timestamp (new zero-copy snapshot)",
        Array(p("table", StringType), p("ref", StringType)),
        StructType(Seq(StructField("current_snapshot_id", LongType))),
        r => row(tbl(r).rollbackTo(str(r, 1)).id))
      case "expire_snapshots" => proc(name,
        "drop old snapshots (tagged ones are pinned); returns the expired ids",
        Array(p("table", StringType),
          pd("older_than", StringType, "NULL"),
          pd("retain_last", IntegerType, "NULL")),
        StructType(Seq(StructField("expired_count", LongType),
          StructField("expired_ids", StringType))),
        { r =>
          val older = if (r.isNullAt(1)) None else Some(str(r, 1))
          val retain = if (r.isNullAt(2)) None else Some(r.getInt(2))
          val ids = tbl(r).expireSnapshots(older, retain)
          row(ids.size.toLong, UTF8String.fromString(ids.mkString(",")))
        })
      case "compact" => proc(name,
        "full compaction into target_files files, optionally clustered",
        Array(p("table", StringType),
          pd("target_files", IntegerType, "1"),
          pd("cluster_by", StringType, "''")),
        StructType(Seq(StructField("snapshot_id", LongType),
          StructField("files", IntegerType))),
        { r =>
          val cluster = str(r, 2) match {
            case "" => Nil
            case s => s.split(',').map(_.trim).filter(_.nonEmpty).toSeq
          }
          val s = tbl(r).compact(r.getInt(1), cluster)
          row(s.id, s.files.size)
        })
      case "compact_small" => proc(name,
        "partial compaction: rewrite only files at or below max_bytes",
        Array(p("table", StringType), p("max_bytes", LongType),
          pd("target_files", IntegerType, "1")),
        StructType(Seq(StructField("snapshot_id", LongType),
          StructField("rewritten_files", StringType),
          StructField("kept_files", StringType))),
        { r =>
          val s = tbl(r).compactSmall(r.getLong(1), r.getInt(2))
          row(s.id,
            UTF8String.fromString(s.summary.getOrElse("compacted-files", "0")),
            UTF8String.fromString(s.summary.getOrElse("kept-files", "?")))
        })
      case "compact_deletes" => proc(name,
        "fold all delete state into one position-delete set; no data file touched",
        Array(p("table", StringType)),
        StructType(Seq(StructField("folded", BooleanType),
          StructField("snapshot_id", LongType))),
        r => tbl(r).compactDeletes() match {
          case Some(s) => row(true, s.id)
          case None => row(false, -1L)
        })
      case "tag_snapshot" => proc(name,
        "pin a named tag to a snapshot (default: the current head)",
        Array(p("table", StringType), p("name", StringType),
          pd("ref", StringType, "NULL")),
        StructType(Seq(StructField("snapshot_id", LongType))),
        { r =>
          val ref = if (r.isNullAt(2)) None else Some(str(r, 2))
          row(tbl(r).tagSnapshot(str(r, 1), ref))
        })
      case "remove_tag" => proc(name,
        "remove a named tag (the snapshot becomes expirable again)",
        Array(p("table", StringType), p("name", StringType)),
        StructType(Seq(StructField("removed", BooleanType))),
        { r => tbl(r).removeTag(str(r, 1)); row(true) })
      case "publish_wap" => proc(name,
        "publish a staged write-audit-publish commit as a real snapshot",
        Array(p("table", StringType), p("wap_id", StringType)),
        StructType(Seq(StructField("snapshot_id", LongType))),
        r => row(tbl(r).publishWap(str(r, 1)).id))
      case "remove_orphans" => proc(name,
        "delete files referenced by no retained snapshot (dry_run lists)",
        Array(p("table", StringType), pd("dry_run", BooleanType, "false")),
        StructType(Seq(StructField("orphan_count", LongType),
          StructField("deleted", BooleanType))),
        { r =>
          val dry = !r.isNullAt(1) && r.getBoolean(1)
          val orphans = tbl(r).orphanFiles(delete = !dry)
          row(orphans.size.toLong, !dry)
        })
    }
  }

  private def row(vs: Any*): InternalRow = new GenericInternalRow(vs.toArray)

  /** One-row driver-local result, the Iceberg-procedure shape. */
  private def proc(procName: String, desc: String,
      params: Array[ProcedureParameter], out: StructType,
      body: InternalRow => InternalRow): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = desc
          override def parameters(): Array[ProcedureParameter] = params
          // every procedure COMMITS (or mutates tags) — never re-runnable
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): JIterator[Scan] = {
            val result = body(input)
            val scan: Scan = new LocalScan {
              override def rows(): Array[InternalRow] = Array(result)
              override def readSchema(): StructType = out
            }
            java.util.Collections.singletonList(scan).iterator()
          }
        }
    }
}
