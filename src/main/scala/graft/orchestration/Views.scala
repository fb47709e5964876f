package graft.orchestration

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.Lakehouse
import graft.core.Jsons

case class ViewDef(name: String, sql: String, description: String, createdMs: Long)

/** Logical views: name→SQL resolved at query time (reference views.py). */
class Views(lh: Lakehouse) {
  private def path = lh.metaDir.resolve("views.json")

  private def load(): Map[String, ViewDef] =
    if (Files.exists(path)) Jsons.readFile[Map[String, ViewDef]](path) else Map.empty

  def create(name: String, sql: String, description: String = ""): Unit =
    synchronized {
      require(!load().contains(name), s"view exists: $name")
      lh.engine.validateSql(sql)
      Jsons.writeFile(path, load() + (name ->
        ViewDef(name, sql, description, System.currentTimeMillis())))
    }

  def list(): List[ViewDef] = load().values.toList.sortBy(_.name)

  def get(name: String): ViewDef =
    load().getOrElse(name, throw new IllegalArgumentException(s"no such view: $name"))

  def drop(name: String): Unit = synchronized {
    require(load().contains(name), s"no such view: $name")
    Jsons.writeFile(path, load() - name)
  }

  def query(name: String, maxRows: Int = 1000): DataFrame =
    lh.engine.execute(get(name).sql, maxRows)
}

case class MatViewMeta(
    name: String,
    sql: String,
    backingTable: String,
    sourceSnapshots: Map[String, Long],
    refreshedMs: Long,
    rowCount: Long,
    lastRefreshSec: Double)

/** Materialized views backed by catalog tables `default.mv_<name>`
  * (reference matviews.py). Source snapshot-ids are captured from the PARSED
  * plan's relations (vs the reference's substring matching, matviews.py:35-51)
  * so freshness checks are exact. */
class MatViews(lh: Lakehouse) {
  val MaxRows = 1000000L
  private def path = lh.metaDir.resolve("matviews.json")

  private def load(): Map[String, MatViewMeta] =
    if (Files.exists(path)) Jsons.readFile[Map[String, MatViewMeta]](path) else Map.empty

  private def save(m: Map[String, MatViewMeta]): Unit = Jsons.writeFile(path, m)

  private def sourceSnapshots(sql: String): Map[String, Long] =
    lh.engine.referencedTables(sql).flatMap { t =>
      val ident = if (t.contains(".")) t else s"default.$t"
      if (lh.catalog.tableExists(ident))
        lh.catalog.loadTable(ident).currentSnapshot.map(s => ident -> s.id)
      else None
    }.toMap

  def create(name: String, sql: String): MatViewMeta = synchronized {
    require(!load().contains(name), s"materialized view exists: $name")
    refreshInternal(name, sql)
  }

  def refresh(name: String): MatViewMeta = synchronized {
    val m = get(name)
    refreshInternal(name, m.sql)
  }

  private def refreshInternal(name: String, sql: String): MatViewMeta = {
    val t0 = System.nanoTime()
    val df = lh.engine.execute(sql, maxRows = MaxRows.toInt)
    val backing = s"default.mv_$name"
    if (!lh.catalog.tableExists(backing))
      lh.catalog.createTable(backing, df.schema, Nil, Map("graft.matview" -> name))
    val snap = lh.catalog.loadTable(backing).overwrite(df)
    val meta = MatViewMeta(name, sql, backing, sourceSnapshots(sql),
      System.currentTimeMillis(), snap.totalRows, (System.nanoTime() - t0) / 1e9)
    save(load() + (name -> meta))
    meta
  }

  def get(name: String): MatViewMeta =
    load().getOrElse(name, throw new IllegalArgumentException(s"no such matview: $name"))

  def list(): List[MatViewMeta] = load().values.toList.sortBy(_.name)

  def read(name: String): DataFrame = lh.catalog.loadTable(get(name).backingTable).read()

  def drop(name: String): Unit = synchronized {
    val m = get(name)
    if (lh.catalog.tableExists(m.backingTable)) lh.catalog.dropTable(m.backingTable)
    save(load() - name)
  }

  /** Stale iff any source table's current snapshot ≠ recorded
    * (matviews.py:248-280). */
  def isStale(name: String): Boolean = {
    val m = get(name)
    m.sourceSnapshots.exists { case (t, sid) =>
      !lh.catalog.tableExists(t) ||
        lh.catalog.loadTable(t).currentSnapshot.forall(_.id != sid)
    }
  }
}
