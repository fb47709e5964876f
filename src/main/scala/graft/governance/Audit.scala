package graft.governance

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}
import scala.jdk.CollectionConverters._

import graft.core.{IceTable, Jsons}

case class AuditEntry(
    timestampMs: Long,
    table: String,
    operation: String,
    details: Map[String, String])

/** JSONL append-only audit log, capped at 10k entries (reference
  * audit.py:13-183); every write path appends (catalog.py:626-627 et al.).
  */
class AuditLog(path: Path) {
  val MaxEntries = 10000
  /** Trim cadence: re-reading + parsing the whole log on EVERY append would
    * make each DML op O(log size); checking every N appends bounds the log
    * at MaxEntries + N while keeping appends O(1). */
  private val TrimEvery = 256
  private var appendsSinceTrim = 0

  def log(table: String, operation: String,
      details: Map[String, String] = Map.empty): Unit = synchronized {
    Files.createDirectories(path.getParent)
    val line = Jsons.write(AuditEntry(System.currentTimeMillis(), table, operation,
      details)).replaceAll("\\s*\n\\s*", " ") + "\n"
    Files.write(path, line.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    appendsSinceTrim += 1
    if (appendsSinceTrim >= TrimEvery) {
      appendsSinceTrim = 0
      trim()
    }
  }

  def entries(table: Option[String] = None, operation: Option[String] = None,
      sinceMs: Option[Long] = None): List[AuditEntry] = synchronized {
    if (!Files.exists(path)) return Nil
    Files.readAllLines(path).asScala.toList.filter(_.nonEmpty)
      .map(Jsons.read[AuditEntry](_))
      .filter(e => table.forall(_ == e.table))
      .filter(e => operation.forall(_ == e.operation))
      .filter(e => sinceMs.forall(e.timestampMs >= _))
  }

  /** Clear entries older than an ISO timestamp or `30d/24h/5m` duration
    * (audit.py duration grammar shared with expire). Returns removed count. */
  def clearOlderThan(spec: String): Int = synchronized {
    val cutoff = IceTable.parseCutoffMs(spec)
    val all = entries()
    val kept = all.filter(_.timestampMs >= cutoff)
    rewrite(kept)
    all.size - kept.size
  }

  private def trim(): Unit = {
    val all = entries()
    if (all.size > MaxEntries) rewrite(all.takeRight(MaxEntries))
  }

  private def rewrite(es: List[AuditEntry]): Unit = {
    val body = es.map(e => Jsons.write(e).replaceAll("\\s*\n\\s*", " ")).mkString("", "\n", "\n")
    Jsons.writeString(path, if (es.isEmpty) "" else body)
  }
}
