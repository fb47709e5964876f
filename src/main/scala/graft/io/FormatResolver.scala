package graft.io

import java.nio.file.Files

import graft.Lakehouse
import graft.core.Jsons

/** Storage-format resolution (reference config.py:183-218): explicit
  * override → table property `write.format.default` → per-table config →
  * global config → `parquet`.
  *
  * The reference's second format is Vortex; no JVM Vortex implementation
  * exists, so the `vortex` label maps to an alternate parquet profile
  * (zstd compression — the same "smaller files, slower writes" trade the
  * reference's benchmarks measured) while keeping the resolution API shape.
  */
class FormatResolver(lh: Lakehouse) {
  import FormatResolver.Config
  val ValidFormats = Set("parquet", "vortex") // config.py:20
  private def path = lh.metaDir.resolve("formats.json")

  private def load(): Config =
    if (Files.exists(path)) Jsons.readFile[Config](path) else Config()

  def setGlobalFormat(f: String): Unit = synchronized {
    require(ValidFormats(f), s"invalid format: $f")
    Jsons.writeFile(path, load().copy(global = Some(f)))
  }

  def setTableFormat(table: String, f: String): Unit = synchronized {
    require(ValidFormats(f), s"invalid format: $f")
    val c = load()
    Jsons.writeFile(path, c.copy(perTable = c.perTable + (table -> f)))
  }

  /** Full resolution chain (config.py:183-218). */
  def resolve(table: String, overrideFormat: Option[String] = None): String = {
    overrideFormat.foreach(f => require(ValidFormats(f), s"invalid format: $f"))
    overrideFormat
      .orElse(
        if (lh.catalog.tableExists(table))
          lh.catalog.loadTable(table).meta.properties.get("write.format.default")
        else None)
      .orElse(load().perTable.get(table))
      .orElse(load().global)
      .getOrElse("parquet")
  }

  /** Parquet writer options for a resolved format label. */
  def writerOptions(format: String): Map[String, String] = format match {
    case "parquet" => Map.empty
    case "vortex" => Map("compression" -> "zstd")
    case other => throw new IllegalArgumentException(s"invalid format: $other")
  }

  /** Convert a table's storage to `format` (reference vortex_io.py
    * convert semantics): set the table's default write format, then
    * rewrite the live data under the new profile in one snapshot.
    * Returns the rewritten row count. */
  def convertTable(table: String, format: String): Long = {
    require(ValidFormats(format), s"invalid format: $format")
    lh.catalog.loadTable(table).setProperty("write.format.default", format)
    val tbl = lh.catalog.loadTable(table) // reload: codec comes from properties
    val snap = tbl.overwrite(tbl.read())
    lh.audit.log(table, "convert_format", Map("format" -> format))
    snap.totalRows
  }
}

object FormatResolver {
  case class Config(global: Option[String] = None,
      perTable: Map[String, String] = Map.empty)

  /** Compression codec used by IceTable commits for a table's properties —
    * keeps the write path dependent only on table metadata. */
  def codecFor(properties: Map[String, String]): Option[String] =
    properties.get("write.format.default") match {
      case Some("vortex") => Some("zstd")
      case _ => None
    }
}
