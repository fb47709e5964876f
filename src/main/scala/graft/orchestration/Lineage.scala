package graft.orchestration

import java.nio.file.Files

import graft.Lakehouse
import graft.core.Jsons

case class LineageEdge(sources: List[String], target: String, operation: String,
    sql: String, timestampMs: Long)

/** Table-level lineage DAG (reference lineage.py:36-286): edges deduped on
  * (source-set, target); upstream/downstream BFS with depth + cycle guard;
  * impact analysis. */
class Lineage(lh: Lakehouse) {
  private def path = lh.metaDir.resolve("lineage.json")

  private def load(): List[LineageEdge] =
    if (Files.exists(path)) Jsons.readFile[List[LineageEdge]](path) else Nil

  def record(sources: Seq[String], target: String, operation: String,
      sql: String = ""): Unit = synchronized {
    val norm = sources.map(normalize).distinct.sorted.toList
    val t = normalize(target)
    val existing = load()
    // dedupe on same source-set + target (lineage.py:64-72)
    val without = existing.filterNot(e => e.sources == norm && e.target == t)
    Jsons.writeFile(path, without :+
      LineageEdge(norm, t, operation, sql, System.currentTimeMillis()))
  }

  private def normalize(t: String): String =
    if (t.contains(".")) t else s"default.$t"

  def edges(): List[LineageEdge] = load()

  /** Follow a [[graft.core.Catalog.renameTable]]: the renamed table keeps
    * its position in the DAG under its new name (edges store normalized
    * `ns.t` strings on both sides). */
  private[graft] def renameTable(from: String, to: String): Unit =
    synchronized {
      val f = normalize(from)
      val t = normalize(to)
      Jsons.writeFile(path, load().map { e =>
        e.copy(
          sources = e.sources.map(s => if (s == f) t else s).distinct.sorted,
          target = if (e.target == f) t else e.target)
      })
    }

  /** Remove every edge targeting `table` (reference lineage remove);
    * returns how many were dropped. */
  def removeEdges(target: String): Int = synchronized {
    val t = normalize(target)
    val es = load()
    val kept = es.filterNot(_.target == t)
    Jsons.writeFile(path, kept)
    es.size - kept.size
  }

  /** BFS over the DAG. `dir`=up follows target→sources; down follows
    * source→targets. Cycle-guarded, depth-limited. */
  private def bfs(start: String, maxDepth: Int, up: Boolean): Map[String, Int] = {
    val es = load()
    var frontier = Set(normalize(start))
    var seen = Map(normalize(start) -> 0)
    var depth = 0
    while (frontier.nonEmpty && depth < maxDepth) {
      depth += 1
      val next = frontier.flatMap { node =>
        if (up) es.filter(_.target == node).flatMap(_.sources)
        else es.filter(_.sources.contains(node)).map(_.target)
      }.filterNot(seen.contains)
      next.foreach(n => seen += n -> depth)
      frontier = next
    }
    seen - normalize(start)
  }

  def upstream(table: String, maxDepth: Int = 5): Map[String, Int] =
    bfs(table, maxDepth, up = true)

  def downstream(table: String, maxDepth: Int = 5): Map[String, Int] =
    bfs(table, maxDepth, up = false)

  /** Impact analysis: everything downstream, grouped by depth. */
  def impact(table: String, maxDepth: Int = 5): Map[Int, List[String]] =
    downstream(table, maxDepth).groupBy(_._2)
      .map { case (d, m) => d -> m.keys.toList.sorted }
}

case class SavedQuery(name: String, sql: String, description: String,
    createdMs: Long)

case class QueryHistoryEntry(sql: String, rows: Long, durationSec: Double,
    timestampMs: Long)

/** Saved queries + run history capped at 1000 (reference queries.py). */
class SavedQueries(lh: Lakehouse) {
  val MaxHistory = 1000
  private def qPath = lh.metaDir.resolve("saved_queries.json")
  private def hPath = lh.metaDir.resolve("query_history.json")

  private def loadQ(): Map[String, SavedQuery] =
    if (Files.exists(qPath)) Jsons.readFile[Map[String, SavedQuery]](qPath) else Map.empty

  def save(name: String, sql: String, description: String = ""): Unit =
    synchronized {
      Jsons.writeFile(qPath, loadQ() + (name ->
        SavedQuery(name, sql, description, System.currentTimeMillis())))
    }

  def get(name: String): SavedQuery =
    loadQ().getOrElse(name, throw new IllegalArgumentException(s"no such query: $name"))

  def list(): List[SavedQuery] = loadQ().values.toList.sortBy(_.name)

  def drop(name: String): Unit = synchronized {
    require(loadQ().contains(name), s"no such query: $name")
    Jsons.writeFile(qPath, loadQ() - name)
  }

  def runSaved(name: String, maxRows: Int = 1000)
      : org.apache.spark.sql.DataFrame = {
    val q = get(name)
    val t0 = System.nanoTime()
    // cache so the history count() and the caller's consumption share one run
    val df = lh.engine.execute(q.sql, maxRows).cache()
    recordHistory(q.sql, df.count(), (System.nanoTime() - t0) / 1e9)
    df
  }

  def recordHistory(sql: String, rows: Long, durationSec: Double): Unit =
    synchronized {
      val h = history() :+ QueryHistoryEntry(sql, rows, durationSec,
        System.currentTimeMillis())
      Jsons.writeFile(hPath, h.takeRight(MaxHistory))
    }

  def history(): List[QueryHistoryEntry] =
    if (Files.exists(hPath)) Jsons.readFile[List[QueryHistoryEntry]](hPath) else Nil

  def clearHistory(): Int = synchronized {
    val n = history().size
    Jsons.writeFile(hPath, List.empty[QueryHistoryEntry])
    n
  }
}
