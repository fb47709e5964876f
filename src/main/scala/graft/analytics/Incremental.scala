package graft.analytics

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.Lakehouse
import graft.core.Jsons

case class Watermark(snapshotId: Long, processedAtMs: Long, rows: Long)

case class IncrementalBatch(
    data: DataFrame,
    isFull: Boolean,
    fromSnapshot: Option[Long],
    toSnapshot: Option[Long])

/** Snapshot-watermark micro-batch "streaming" (reference incremental.py).
  * State: `{pipeline → {table → watermark}}` JSON (incremental.py:33-139).
  */
class Incremental(lh: Lakehouse) {
  private def path = lh.metaDir.resolve("watermarks.json")

  private def load(): Map[String, Map[String, Watermark]] =
    if (Files.exists(path)) Jsons.readFile[Map[String, Map[String, Watermark]]](path)
    else Map.empty

  def watermark(pipeline: String, table: String): Option[Watermark] =
    load().getOrElse(pipeline, Map.empty).get(table)

  def setWatermark(pipeline: String, table: String, wm: Watermark): Unit =
    synchronized {
      val all = load()
      val p = all.getOrElse(pipeline, Map.empty) + (table -> wm)
      Jsons.writeFile(path, all + (pipeline -> p))
    }

  def clearWatermarks(pipeline: String): Unit = synchronized {
    Jsons.writeFile(path, load() - pipeline)
  }

  /** All watermarks by pipeline (reference incremental.py list_watermarks). */
  def listWatermarks(): Map[String, Map[String, Watermark]] = load()

  /** New-since-watermark rows (incremental.py:142-239): no watermark → full
    * scan flagged `isFull`; same snapshot → empty; else `new EXCEPT ALL old`
    * over two snapshot reads. */
  def getIncrementalData(pipeline: String, table: String): IncrementalBatch = {
    val tbl = lh.catalog.loadTable(table)
    val current = tbl.currentSnapshot
    watermark(pipeline, table) match {
      case None =>
        IncrementalBatch(tbl.read(), isFull = true, None, current.map(_.id))
      case Some(wm) if current.exists(_.id == wm.snapshotId) =>
        IncrementalBatch(tbl.emptyDf(tbl.schema), isFull = false,
          Some(wm.snapshotId), current.map(_.id))
      case Some(wm) =>
        val oldDf = tbl.readSnapshot(tbl.snapshotById(wm.snapshotId))
        val newDf = tbl.read()
        IncrementalBatch(newDf.exceptAll(oldDf), isFull = false,
          Some(wm.snapshotId), current.map(_.id))
    }
  }

  /** Advance the watermark after a successful step (incremental.py:330-350).
    * Pass the batch's `toSnapshot` so rows committed between the read and
    * the advance are NOT skipped — advancing to "current at advance time"
    * would silently drop them from the next batch. Falls back to the
    * current snapshot only when no batch snapshot is given. */
  def advance(pipeline: String, table: String, rows: Long,
      toSnapshot: Option[Long] = None): Unit = {
    val sid = toSnapshot.orElse(
      lh.catalog.loadTable(table).currentSnapshot.map(_.id))
    sid.foreach { s =>
      setWatermark(pipeline, table, Watermark(s, System.currentTimeMillis(), rows))
    }
  }
}
