package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Lakehouse
import graft.core.IceTable

/** Commit-replay CHANGELOG over an IceLite table — the streaming face of
  * the batch snapshot-diff API (reference incremental.py:142-239, mirrored
  * at [[graft.analytics.Incremental]]): instead of one `exceptAll` between
  * a watermark and HEAD, each commit in a range becomes its own batch of
  * `(_change_type, _commit_id, row…)` records, so a consumer can maintain
  * downstream state (rollups, mirrors, indexes) commit-by-commit with
  * exactly-once replay by snapshot id.
  *
  * Per-commit cost is shaped to the COMMIT, not the table:
  *  - `append` commits never diff anything — their inserted rows are read
  *    straight from the files the commit ADDED (a manifest subtraction, no
  *    shuffle, no scan of pre-existing data). On a 100 TB table with
  *    KB-sized streaming appends each batch costs KBs.
  *  - merge-on-read delete/update/replace-where/merge commits replay from
  *    the commit's OWN delete files and added files
  *    ([[graft.core.IceTable.morDelta]]) — O(touched): the position
  *    deletes name the dead rows (touched-files scan + broadcast identity
  *    semi-join), the added files name the new ones. A single streamed
  *    MoR delete on a 100 TB table costs the touched files, never a
  *    table-sized diff.
  *  - only TRUE rewrites (overwrite/compaction/rollback/copy-on-write
  *    mutations) fall back to snapshot `exceptAll` diffs (both
  *    directions), exactly as the reference's incremental read does —
  *    these are the rare maintenance commits, and a diff is the only
  *    exact answer once files are rewritten.
  *
  * Three consumption shapes:
  *  - [[Changelog.changesBetween]]: the batch changelog frame for a commit
  *    range — lazy, distributed, no driver materialization.
  *  - [[ChangelogStream]]: an incremental runner with a durable offset
  *    (last processed snapshot id) — sink first, offset after, so a crash
  *    between the two re-delivers the SAME batch with the same `toId` and
  *    an idempotent sink (the [[Streaming.appendBatch]] pattern) gets
  *    exactly-once end-to-end.
  *  - [[Changelog.appendStream]]: a true Structured Streaming `readStream`
  *    over the table's `commit-*` data directories for APPEND-ONLY tables —
  *    Spark's file-stream checkpoint gives exactly-once file pickup, and
  *    every downstream streaming operator (watermarks, windows, stateful
  *    maps, sinks) composes normally.
  */
object Changelog {

  val ChangeTypeCol = "_change_type"
  val CommitIdCol = "_commit_id"
  val ChangedColumnsCol = "_changed_columns"

  /** Changelog rows for every commit in `(fromId, toId]` (fromId None =
    * from the beginning, i.e. the oldest retained snapshot replays as its
    * own diff against nothing). Unknown/expired `fromId` throws — replay
    * would silently double-count otherwise.
    *
    * `pairUpdateKeys` (optional): with a non-empty primary key, each
    * `update` commit's insert/delete rows are PAIRED into
    * `update_before`/`update_after` records with a `_changed_columns`
    * array (the [[graft.analytics.Cdc.classifyChanges]] classification at
    * changelog granularity — reference cdc.py:146-187), so downstream
    * consumers see updates as updates instead of delete+insert. Every
    * other commit kind keeps its insert/delete rows (with an empty
    * `_changed_columns` for schema stability). Key contract as
    * classifyChanges: the keys must uniquely identify rows within each
    * commit's changed set. A multiset fold (e.g. the rollup maintenance)
    * treats `update_before` as delete and `update_after` as insert —
    * same rows, richer labels. */
  /** `requireFromRetained` (default true) is the OFFSET-consumer
    * contract: an expired `fromId` refuses instead of silently skipping
    * the gap. The SQL face's commit-id FILTER pushdown passes false —
    * `WHERE _commit_id > 5` is an explicit range request, not a resume
    * point, so it replays whatever retained commits fall in the range
    * (each commit still needs its own parent entry to replay — inherent). */
  def changesBetween(tbl: IceTable, fromId: Option[Long], toId: Long,
      pairUpdateKeys: Seq[String] = Nil,
      requireFromRetained: Boolean = true): DataFrame = {
    // ONE log read serves the retention check AND the range: with
    // separate reads an expiry landing between them would pass the check
    // yet silently drop the pruned commits from the range — a permanent
    // skip. Raw entries are constant-size; manifest lists resolve only
    // for the commits actually replayed, so a bounded tail query on a
    // 500k-commit table costs O(range) metadata reads, not O(history) —
    // the same contract the `_commit_id` pushdown exists for.
    val lr = tbl.snapshotRangeWithParents(fromId, toId)
    if (requireFromRetained) fromId.foreach { f =>
      require(lr.refs.exists(_.id == f),
        s"from-snapshot $f is not in the retained log — it may have been " +
          "expired; re-seed the consumer from a full read")
    }
    framesFor(tbl, lr.range, pairUpdateKeys)
  }

  /** Union one replay frame per `(snapshot, parent)` pair — the shared
    * tail of [[changesBetween]] and [[ChangelogStream.processAvailable]]
    * (which must derive range and head from ONE log read, so it cannot
    * delegate to changesBetween's own read). */
  private[streaming] def framesFor(tbl: IceTable,
      range: List[(graft.core.Snapshot, Option[graft.core.Snapshot])],
      pairUpdateKeys: Seq[String]): DataFrame = {
    val batches = range
      .map { case (s, parent) => commitChanges(tbl, s, parent, pairUpdateKeys) }
    if (batches.isEmpty) emptyChangelog(tbl, pairUpdateKeys)
    else batches.reduce(_.unionByName(_))
  }

  /** One commit's changelog. Appends read ONLY the added files; everything
    * else diffs parent vs child snapshot in both directions. */
  private def commitChanges(tbl: IceTable, s: graft.core.Snapshot,
      parent: Option[graft.core.Snapshot],
      pairUpdateKeys: Seq[String] = Nil): DataFrame = {
    // an expired parent makes both the added-files subtraction and the
    // diff silently treat carried-forward rows as fresh inserts — refuse
    require(s.parentId.isEmpty || parent.isDefined,
      s"snapshot ${s.id}'s parent ${s.parentId.get} has been expired — " +
        "cannot replay this range; re-seed the consumer from a full read")
    val noChanged = (df: DataFrame) =>
      if (pairUpdateKeys.isEmpty) df
      else df.withColumn(ChangedColumnsCol, array().cast("array<string>"))
    val stamp = (df: DataFrame, kind: String) =>
      noChanged(df).withColumn(ChangeTypeCol, lit(kind))
        .withColumn(CommitIdCol, lit(s.id))
    s.operation match {
      case "append" =>
        val parentPaths = parent.map(_.files.map(_.path).toSet)
          .getOrElse(Set.empty)
        val added = s.files.filterNot(f => parentPaths(f.path))
        if (added.isEmpty) emptyChangelog(tbl, pairUpdateKeys)
        // field-id-resolved read of just the added files (no deletes: an
        // append never carries new delete state)
        else stamp(tbl.readSnapshot(Some(s.copy(files = added,
          deleteFiles = Nil, eqDeleteFiles = Nil))), "insert")
      // update-shaped commits pair: MoR updates/merges (operation
      // "update") AND CoW row-level rewrites, which commit as "overwrite"
      // with a matched-rows summary (Dml.updateBy/update via
      // rewriteWhereCow) or merge-* summary keys (MERGE INTO via
      // mergeFilesCow / the full-overwrite mergeDf) — without this arm a
      // CoW UPDATE or MERGE replays as bare delete+insert while the same
      // statement in MoR mode pairs, an asymmetry no consumer should
      // have to know about
      case op if pairUpdateKeys.nonEmpty && (op == "update" ||
          (op == "overwrite" && (s.summary.contains("matched-rows") ||
            s.summary.keys.exists(_.startsWith("merge-"))))) =>
        val cols = tbl.schema.fieldNames.toSeq
        // MoR update-shaped commits (update/replace-where/merge: position
        // deletes + appended files) pair from the commit's OWN delta —
        // O(touched), see morDelta — with the key join over two
        // touched-sized frames. CoW rewrites restrict both sides to
        // CHANGED LINEAGE first (rewriteDelta): its file cancellation is
        // exact for the exceptAll multiset diff, and classifyChanges IS
        // classifyDelta over that diff, so pairing over the restricted
        // frames equals pairing over the full table at O(rewritten) —
        // the composition that is NOT safe is handing restricted frames
        // straight to classifyDelta as a physical delta (see
        // rewriteDelta's scaladoc). Full-table frames remain only the
        // no-cancellation fallback; either way the pairing join costs
        // the changed-set-sized key join on top.
        def classifyFrames(before: DataFrame, after: DataFrame) =
          graft.analytics.Cdc
            .classifyChanges(before, after, pairUpdateKeys, cols)
        val classified = parent.flatMap(p => tbl.morDelta(p, s)) match {
          case Some((removed, added)) =>
            graft.analytics.Cdc
              .classifyDelta(removed, added, pairUpdateKeys, cols)
          case None =>
            parent.flatMap(p => tbl.rewriteDelta(p, s)) match {
              case Some((before, after)) => classifyFrames(before, after)
              case None =>
                classifyFrames(
                  parent.map(p => tbl.readSnapshot(Some(p)))
                    .getOrElse(tbl.emptyDf(tbl.schema)),
                  tbl.readSnapshot(Some(s)))
            }
        }
        classified
          .withColumn(ChangeTypeCol, lower(col("change_type")))
          .withColumn(ChangedColumnsCol, col("changed_columns"))
          .drop("change_type", "changed_columns")
          .withColumn(CommitIdCol, lit(s.id))
      case other =>
        def fullDiff: DataFrame = {
          val before = parent.map(p => tbl.readSnapshot(Some(p)))
            .getOrElse(tbl.emptyDf(tbl.schema))
          val after = tbl.readSnapshot(Some(s))
          stamp(after.exceptAll(before), "insert")
            .unionByName(stamp(before.exceptAll(after), "delete"))
        }
        // True rewrites restrict the diff to CHANGED LINEAGE first: data
        // files shared by both snapshots with identical delete coverage
        // cancel out of the multiset diff exactly (IceTable.rewriteDelta),
        // so a partial rewrite replays at O(rewritten) — the whole-table
        // both-directions exceptAll only remains for full rewrites.
        def rewriteDiff: DataFrame =
          parent.flatMap(p => tbl.rewriteDelta(p, s)) match {
            case Some((before, after)) =>
              stamp(after.exceptAll(before), "insert")
                .unionByName(stamp(before.exceptAll(after), "delete"))
            case None => fullDiff
          }
        // merge-on-read delete/update/replace/merge commits: the commit's
        // own delete files and added files name the delta, so the replay
        // is O(touched) — scans only the touched data files (position
        // deletes) or one live pass with a broadcast key semi-join
        // (equality deletes) plus the added files, never the
        // both-directions table-sized exceptAll.
        if (other == "delete" || other == "update")
          parent.flatMap(p => tbl.morDelta(p, s))
            .map { case (removed, added) =>
              stamp(added, "insert").unionByName(stamp(removed, "delete"))
            }.getOrElse(rewriteDiff)
        // compaction commits carry the live-rows-preserved contract in
        // their summary (compacted-files / compacted-delete-files, written
        // only by the engine's own data-preserving maintenance ops): the
        // changelog is empty BY CONSTRUCTION — replaying a routine
        // compaction of a 100 TB table must not read a byte of it
        else if (s.summary.contains("compacted-files") ||
            s.summary.contains("compacted-delete-files"))
          emptyChangelog(tbl, pairUpdateKeys)
        else rewriteDiff
    }
  }

  private def emptyChangelog(tbl: IceTable,
      pairUpdateKeys: Seq[String] = Nil): DataFrame = {
    val base = tbl.emptyDf(tbl.schema)
      .withColumn(ChangeTypeCol, lit(""))
      .withColumn(CommitIdCol, lit(0L))
      .where(lit(false))
    if (pairUpdateKeys.isEmpty) base
    else base.withColumn(ChangedColumnsCol, array().cast("array<string>"))
  }

  /** The close-the-loop composition over the changelog: maintain a
    * per-key `(n, sum_micro)` rollup TABLE from a source table's commits —
    * [[ChangelogStream]] (exactly-once replay by snapshot id) feeding
    * [[graft.analytics.IncrementalAgg.maintain]] (insert adds, delete
    * subtracts), landing as ONE rollup overwrite stamped with the batch's
    * `toId` so a crash-redelivered batch is a detectable no-op (the same
    * idempotence pattern as [[Streaming.maintainCountSumStream]]'s batch
    * ids, with changelog offsets as the watermark). Cost per run: the NEW
    * commits' changelog (appends read only their added files) + a
    * key-join against the state-sized rollup — never a source recompute.
    * Returns the new offset, or None when already caught up. */
  def maintainRollup(lh: Lakehouse, source: String, rollup: String,
      keyCols: Seq[String], valCol: String,
      checkpointDir: Path): Option[Long] = {
    val cs = new ChangelogStream(lh, source, checkpointDir)
    val offsetBefore = cs.lastProcessed
    cs.processAvailable { (changes, toId) =>
      val stamped: Option[Long] =
        if (!lh.catalog.tableExists(rollup)) None
        else lh.catalog.loadTable(rollup).currentSnapshot
          .flatMap(_.summary.get("changelog-to-id")).map(_.toLong)
      if (!stamped.exists(_ >= toId)) {
        // The rollup's stamp, not the runner's offset, is the fold
        // watermark: a crash AFTER the rollup commit but BEFORE the
        // offset write leaves stamp > offset, and if NEW source commits
        // arrived before the rerun, this batch's range is a strict
        // SUPERSET of the stamped one — folding the delivered frame
        // as-is would double-count the already-applied prefix. Re-derive
        // the delta from max(offset, stamp) instead.
        val effFrom = (offsetBefore.toList ++ stamped.toList)
          .reduceOption(math.max(_, _))
        val delta0 =
          if (effFrom == offsetBefore) changes
          else changesBetween(lh.catalog.loadTable(source), effFrom, toId)
        val delta = delta0.withColumn("__op",
          when(col(ChangeTypeCol) === "insert", "I").otherwise("D"))
        val state =
          if (lh.catalog.tableExists(rollup))
            lh.catalog.loadTable(rollup).read()
          else graft.analytics.IncrementalAgg
            .countSumState(changes.where(lit(false)), keyCols, valCol)
        val next = graft.analytics.IncrementalAgg
          .maintain(state, delta, keyCols, valCol, "__op")
        if (!lh.catalog.tableExists(rollup))
          lh.catalog.createTable(rollup, next.schema, Nil, Map.empty)
        lh.catalog.loadTable(rollup)
          .overwrite(next, Map("changelog-to-id" -> toId.toString))
      }
    }
  }

  /** Structured Streaming source over an APPEND-ONLY table: Spark's file
    * stream lists `data/commit-*` each trigger and its own checkpoint log
    * guarantees each file is emitted exactly once. Staging dirs are
    * dot-prefixed (hidden to Spark's listing) and delete dirs don't match
    * the glob, so only committed data files ever surface.
    *
    * Append-only is a CONTRACT, not detected at runtime mid-stream: a
    * later overwrite/compaction writes its rewritten rows into a fresh
    * `commit-*` dir and this source would re-emit them (file streams
    * cannot retract). The call refuses tables whose history already
    * violates it; keep maintenance off changelog-sourced tables or use
    * [[ChangelogStream]], which handles every commit kind. */
  def appendStream(spark: SparkSession, tbl: IceTable): DataFrame = {
    val bad = tbl.rawLog.find(s => s.operation != "append")
    require(bad.isEmpty,
      s"appendStream requires an append-only history; found " +
        s"'${bad.get.operation}' snapshot ${bad.get.id} — use ChangelogStream")
    // recursiveFileLookup: transform-partitioned tables lay data under
    // `_p_k=v` subdirectories of each commit dir — recursive listing
    // reads those files WITHOUT partition discovery, so no inferred
    // `_p_*` columns drift the schema (the partition dirs carry DERIVED
    // transform values; the source columns stay inside the parquet, so
    // tbl.schema reads exactly). A 100 TB streaming table is almost
    // always partitioned — this must not be the surface that refuses it.
    spark.readStream
      .schema(tbl.schema)
      .option("recursiveFileLookup", "true")
      .parquet(tbl.dataDir.toString + "/commit-*")
  }
}

/** Exactly-once incremental changelog consumer: tracks the last processed
  * snapshot id in a single atomically-replaced offset file under
  * `checkpointDir`. See [[Changelog]] for the delivery contract. */
class ChangelogStream(lh: Lakehouse, table: String, checkpointDir: Path) {
  Files.createDirectories(checkpointDir)
  private def offsetPath = checkpointDir.resolve("offset")
  private def uuidPath = checkpointDir.resolve("table-uuid")

  /** Last snapshot id whose batch the sink has durably processed. */
  def lastProcessed: Option[Long] =
    if (Files.exists(offsetPath))
      Some(new String(Files.readAllBytes(offsetPath), "UTF-8").trim.toLong)
    else None

  /** Bind this checkpoint to the table's identity uuid
    * ([[graft.core.Catalog.TableUuidKey]] — rename-stable, fresh per
    * create/clone). Snapshot ids are per-table SEQUENTIAL, so without
    * this a drop+recreate at the same name could alias: the recreated
    * table's log would contain the old offset id and the consumer would
    * silently deliver diffs of an unrelated table. Rename is the flip
    * side: the uuid moves with the dir, so a consumer re-pointed at the
    * NEW name with the same checkpoint resumes exactly-once. */
  private def bindTableUuid(tbl: graft.core.IceTable): Unit = {
    val current = tbl.meta.properties.get(graft.core.Catalog.TableUuidKey)
    val recorded =
      if (Files.exists(uuidPath))
        Some(new String(Files.readAllBytes(uuidPath), "UTF-8").trim)
      else None
    (current, recorded) match {
      case (Some(u), Some(r)) =>
        require(r == u,
          s"checkpoint $checkpointDir is bound to table identity $r but " +
            s"'$table' now resolves to $u — the table was dropped and " +
            "recreated (or the checkpoint belongs to a different table); " +
            "snapshot-id offsets do not transfer — re-seed with reseed() " +
            "or a fresh checkpoint")
      case (Some(u), None) =>
        // first bind. An OFFSET that predates the binding cannot be
        // trusted against a uuid-bearing table: tables carry the uuid
        // from creation, so an unbound offset file means the checkpoint
        // was written against some OTHER (older, since-recreated) table
        // — refusing is the only non-aliasing answer. A genuinely legacy
        // checkpoint over a genuinely legacy table has no uuid on either
        // side and keeps working below.
        require(lastProcessed.isEmpty,
          s"checkpoint $checkpointDir has an offset but no identity " +
            s"binding, while '$table' carries one — the offset predates " +
            "this table; re-seed with reseed() or a fresh checkpoint")
        writeUuid(u)
      case (None, Some(r)) =>
        throw new IllegalArgumentException(
          s"checkpoint $checkpointDir is bound to table identity $r but " +
            s"'$table' carries NO identity property — the table was " +
            "dropped and recreated (or replaced by an unmanaged copy); " +
            "re-seed with reseed() or a fresh checkpoint")
      case (None, None) => () // legacy table + legacy checkpoint
    }
  }

  /** Run ONE micro-batch covering every commit since [[lastProcessed]] up
    * to the current head. `sink` receives the changelog frame and the
    * batch's `toId`; the offset advances only AFTER the sink returns, so a
    * crash between the two re-delivers the same `(frame, toId)` — an
    * idempotent sink keyed on `toId` is exactly-once. Returns the new
    * offset, or None when there was nothing to process. */
  def processAvailable(sink: (DataFrame, Long) => Unit): Option[Long] = {
    val tbl = lh.catalog.loadTable(table)
    bindTableUuid(tbl)
    val from = lastProcessed
    // head, the offset-retention check, and the replay range all derive
    // from ONE log read: composing separate reads (a head read, then
    // changesBetween's own) would let an expiry land between them — the
    // retention check passes against the first read while the range
    // computed from the second silently loses the pruned commits, and
    // writeOffset(head) then advances past never-delivered rows forever.
    val lr = tbl.snapshotRangeWithParents(from, Long.MaxValue)
    from.foreach { f =>
      require(lr.refs.exists(_.id == f),
        s"from-snapshot $f is not in the retained log — it may have been " +
          "expired; re-seed the consumer from a full read")
    }
    if (lr.range.isEmpty) return None // caught up (or empty table)
    val head = lr.range.last._1.id
    sink(Changelog.framesFor(tbl, lr.range, Nil), head)
    writeOffset(head)
    Some(head)
  }

  /** The DOCUMENTED recovery for an expired offset, made executable:
    * when [[processAvailable]] refuses because the offset (or a commit's
    * parent) fell out of the retained log, re-seed — `sink` receives the
    * FULL table state pinned at one snapshot and that snapshot's id; the
    * caller REPLACES (not folds) its downstream state with it. The
    * offset advances to that snapshot only after the sink returns, same
    * crash contract as processAvailable, so the next call resumes
    * incrementally from the re-seed point. Returns the new offset, or
    * None on an empty table. */
  def reseed(sink: (DataFrame, Long) => Unit): Option[Long] = {
    val tbl = lh.catalog.loadTable(table)
    val cur = tbl.currentSnapshot.getOrElse(return None)
    // read the ALREADY-RESOLVED snapshot directly: a readAsOf(cur.id)
    // would re-read the log, and under the aggressive expiry this API
    // exists for the snapshot can vanish between the two reads — the
    // recovery path itself would then throw an unclassifiable error
    sink(tbl.readSnapshot(Some(cur)), cur.id)
    writeOffset(cur.id)
    // RE-bind: reseed replaces downstream state wholesale, so it is also
    // the documented recovery from a drop+recreate — the full read just
    // delivered IS the new table's state, adopt its identity (or clear a
    // stale binding when the new table carries none)
    tbl.meta.properties.get(graft.core.Catalog.TableUuidKey) match {
      case Some(u) => writeUuid(u)
      case None => Files.deleteIfExists(uuidPath); ()
    }
    Some(cur.id)
  }

  // Jsons.writeString = unique-temp atomic replace: two processes sharing
  // a checkpoint dir must never promote each other's half-written temp
  // (a fixed sibling temp name would — see Jsons.writeString's contract)
  private def writeOffset(id: Long): Unit =
    graft.core.Jsons.writeString(offsetPath, id.toString)

  private def writeUuid(u: String): Unit =
    graft.core.Jsons.writeString(uuidPath, u)
}
