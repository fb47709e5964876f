package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Lakehouse
import graft.core.Snapshot

/** Change-data-capture over snapshot pairs (reference cdc.py:19-388).
  *
  * The reference computes added/removed row sets via EXCEPT, then classifies
  * INSERT/UPDATE/DELETE with a Python dict loop keyed on the key tuple
  * (cdc.py:146-187). Here classification is a null-safe full-outer join on
  * the keys — fully distributed, so it holds at 100 TB where the reference's
  * driver-side dict would not.
  */
class Cdc(lh: Lakehouse) {

  /** added/removed rows between two snapshots via exceptAll both ways
    * (cdc.py:107-116; incremental.py:225-227). */
  def snapshotDiff(table: String, fromRef: Option[String], toRef: Option[String])
      : (DataFrame, DataFrame) = {
    val tbl = lh.catalog.loadTable(table)
    val (fromSnap, toSnap) = defaultRefs(tbl.snapshots, fromRef, toRef, tbl.tags)
    val oldDf = tbl.readSnapshot(fromSnap)
    val newDf = tbl.readSnapshot(toSnap)
    (newDf.exceptAll(oldDf), oldDf.exceptAll(newDf))
  }

  /** Change rows classified INSERT / DELETE / UPDATE_BEFORE / UPDATE_AFTER,
    * with `changed_columns` per UPDATE (cdc.py:146-187). Default `from` =
    * second-to-last snapshot (cdc.py:53-59), default key = first column
    * (cdc.py:121). */
  def getChanges(table: String, fromRef: Option[String] = None,
      toRef: Option[String] = None, keyCols: Seq[String] = Nil): DataFrame = {
    val tbl = lh.catalog.loadTable(table)
    val cols = tbl.schema.fieldNames.toSeq
    val keys = if (keyCols.nonEmpty) keyCols else cols.take(1)
    val (fromSnap, toSnap) = defaultRefs(tbl.snapshots, fromRef, toRef, tbl.tags)
    Cdc.classifyChanges(tbl.readSnapshot(fromSnap), tbl.readSnapshot(toSnap),
      keys, cols)
  }

  /** INSERT/UPDATE/DELETE counts between two snapshots (cdc.py:230-258). */
  def changeSummary(table: String, fromRef: Option[String] = None,
      toRef: Option[String] = None, keys: Seq[String] = Nil): Map[String, Long] = {
    val counts = getChanges(table, fromRef, toRef, keys)
      .groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Map(
      "inserted" -> counts.getOrElse("INSERT", 0L),
      "deleted" -> counts.getOrElse("DELETE", 0L),
      "updated" -> counts.getOrElse("UPDATE_AFTER", 0L))
  }

  /** Walk consecutive snapshot pairs, newest first (cdc.py:190-227). */
  def changeLog(table: String, keys: Seq[String] = Nil, limit: Int = 10)
      : Seq[(Long, Long, Map[String, Long])] = {
    val snaps = lh.catalog.loadTable(table).snapshots
    snaps.sliding(2).toSeq.reverse.take(limit).collect {
      case List(from, to) =>
        (from.id, to.id,
          changeSummary(table, Some(from.id.toString), Some(to.id.toString), keys))
    }
  }

  /** Export change rows to CSV or NDJSON (cdc.py:261-325). */
  def exportChanges(changes: DataFrame, path: String, format: String = "json"): Unit =
    format match {
      case "csv" =>
        changes.withColumn("changed_columns", concat_ws(",", col("changed_columns")))
          .write.mode("overwrite").option("header", "true").csv(path)
      case "json" | "ndjson" => changes.write.mode("overwrite").json(path)
      case other => throw new IllegalArgumentException(s"unknown format: $other")
    }

  /** Apply a change set to a target table: INSERTs appended, DELETEs and
    * UPDATEs applied by overwriting rows matched null-safely on ALL columns
    * (cdc.py:328-388; NULL-safe equality = `<=>`). */
  def replayChanges(changes: DataFrame, targetTable: String): Map[String, Long] = {
    val tbl = lh.catalog.loadTable(targetTable)
    val cols = tbl.schema.fieldNames.toSeq
    val proj: DataFrame => DataFrame = _.select(cols.map(col): _*)

    val inserts = proj(changes.where(col("change_type") === "INSERT"))
    val deletes = proj(changes.where(col("change_type") === "DELETE"))
    val before = proj(changes.where(col("change_type") === "UPDATE_BEFORE"))
    val after = proj(changes.where(col("change_type") === "UPDATE_AFTER"))

    val current = tbl.read()
    // remove DELETE + UPDATE_BEFORE rows (exceptAll = multiset, so duplicate
    // rows are removed once each), then add INSERT + UPDATE_AFTER rows
    val next = current.exceptAll(deletes).exceptAll(before)
      .unionByName(inserts).unionByName(after)
    tbl.overwrite(next)
    lh.audit.log(targetTable, "replay_changes", Map.empty)
    Map(
      "inserted" -> inserts.count(),
      "deleted" -> deletes.count(),
      "updated" -> after.count())
  }

  private def defaultRefs(snaps: List[Snapshot], fromRef: Option[String],
      toRef: Option[String], tags: Map[String, Long] = Map.empty)
      : (Option[Snapshot], Option[Snapshot]) = {
    require(snaps.nonEmpty, "table has no snapshots")
    val tbl = snaps
    def resolve(r: String): Snapshot = {
      // id -> named tag -> timestamp, the IceTable.resolveRef precedence
      r.toLongOption.orElse(tags.get(r)) match {
        case Some(id) => tbl.find(_.id == id)
          .getOrElse(throw new IllegalArgumentException(s"no snapshot $id"))
        case None =>
          val ts = graft.core.IceTable.parseInstantMs(r)
          tbl.filter(_.timestampMs <= ts).lastOption
            .getOrElse(throw new IllegalArgumentException(s"no snapshot at $r"))
      }
    }
    val to = toRef.map(resolve).getOrElse(tbl.last)
    // default from = second-to-last (cdc.py:53-59); None if only one snapshot
    val from = fromRef.map(resolve).orElse(
      tbl.filter(_.id < to.id).lastOption)
    (from, Some(to))
  }
}

object Cdc {

  /** Classify the row-level delta between two frames of the same schema as
    * INSERT / DELETE / UPDATE_BEFORE / UPDATE_AFTER with a `changed_columns`
    * list per update — the table-free core of [[Cdc.getChanges]], usable on
    * any pair of DataFrames (snapshots, imports, pipeline stages).
    *
    * Shape: exceptAll both ways (bag semantics) narrows the input to rows
    * that actually differ, then ONE null-safe full-outer join on the keys
    * classifies — fully distributed, no driver-side dict (the reference
    * classifies in a Python loop, cdc.py:146-187).
    *
    * Precondition: `keys` must uniquely identify rows within the CHANGED
    * set of each side (the natural primary-key contract). If a key value
    * appears on multiple changed rows of both sides, the full-outer join
    * cross-products them into N×M UPDATE_BEFORE/UPDATE_AFTER rows with
    * arbitrary before/after pairings. */
  def classifyChanges(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      cols: Seq[String]): DataFrame = {
    // exceptAll compares POSITIONALLY — project both sides to the same
    // column order first, or frames with reordered columns would silently
    // classify every row as changed
    val o = oldDf.select(cols.map(col): _*)
    val nw = newDf.select(cols.map(col): _*)
    classifyDelta(o.exceptAll(nw), nw.exceptAll(o), keys, cols)
  }

  /** [[classifyChanges]] from an ALREADY-COMPUTED (removed, added) delta —
    * the changelog's O(touched) merge-on-read replay path, where the
    * commit's own delete files and added files name the delta without any
    * table-sized exceptAll. Contract: `removed`/`added` are the physical
    * row sets the commit killed/created; a rewrite that re-creates an
    * identical row therefore classifies as an UPDATE pair with an empty
    * `changed_columns` (a no-op update IS a physical change — the
    * exceptAll path cancels such pairs instead, the only divergence). */
  def classifyDelta(removedDf: DataFrame, addedDf: DataFrame,
      keys: Seq[String], cols: Seq[String]): DataFrame = {
    val added = addedDf.select(cols.map(col): _*)
    val removed = removedDf.select(cols.map(col): _*)

    // presence flags robust to genuinely-null keys: checking a data column
    // for null is not enough, so tag each side before joining
    val at = added.withColumn("_present_a", lit(true)).alias("a")
    val rt = removed.withColumn("_present_r", lit(true)).alias("r")
    val jt = at.join(rt, keys.map(k => col(s"a.$k") <=> col(s"r.$k")).reduce(_ && _), "full_outer")

    val presentA = col("a._present_a").isNotNull
    val presentR = col("r._present_r").isNotNull

    // ONE pass over the join: the old shape unioned four filtered
    // projections of `jt`, which re-ran the full-outer join (and the
    // exceptAll subtrees above it) four times — exchange reuse dedups the
    // shuffles but not the join stages. Emitting the per-row change
    // entries as an exploded array keeps the same multiset of output rows
    // at one join evaluation (update rows emit BEFORE then AFTER).
    def rowStruct(p: String) = struct(cols.map(c => col(s"$p.$c").as(c)): _*)
    val entries =
      when(presentA && !presentR,
        array(struct(lit("INSERT").as("change_type"), rowStruct("a").as("row"))))
      .when(presentR && !presentA,
        array(struct(lit("DELETE").as("change_type"), rowStruct("r").as("row"))))
      .otherwise(array(
        struct(lit("UPDATE_BEFORE").as("change_type"), rowStruct("r").as("row")),
        struct(lit("UPDATE_AFTER").as("change_type"), rowStruct("a").as("row"))))
    jt.select(explode(entries).as("__e"), changedColumns(cols))
      .select((col("__e.change_type").as("change_type") +:
        cols.map(c => col(s"__e.row.$c").as(c)) :+
        col("changed_columns")): _*)
  }

  private def changedColumns(cols: Seq[String]): Column =
    when(col("a._present_a").isNotNull && col("r._present_r").isNotNull,
      cols.map(c => when(!(col(s"a.$c") <=> col(s"r.$c")), array(lit(c)))
        .otherwise(array().cast("array<string>"))).reduce(concat(_, _)))
      .otherwise(array().cast("array<string>")).as("changed_columns")
}
