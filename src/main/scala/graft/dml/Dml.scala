package graft.dml

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Lakehouse

case class UpsertResult(inserted: Long, updated: Long)

/** One step of a batch (reference execute_batch, catalog.py:1003-1088). */
case class BatchOp(
    op: String, // insert | update | delete | upsert
    table: String,
    rows: Seq[Map[String, Any]] = Nil,
    filter: String = "",
    set: Map[String, Any] = Map.empty,
    keys: Seq[String] = Nil)

case class BatchResult(op: String, table: String, status: String, // ok|failed|skipped
    message: String, count: Long)

/** The write operators (reference catalog.py §2.9). Every mutation is
  * read-modify-overwrite producing a NEW snapshot (old snapshots remain for
  * time travel / CDC), validation rules run pre-commit, and the audit log
  * records each operation — exactly the reference's write lifecycle
  * (catalog.py:500-1344).
  *
  * Scale posture: updates/deletes/upserts are expressed as DataFrame
  * transforms (`when/otherwise`, anti-join + union) over the snapshot scan —
  * no row ever reaches the driver.
  */
class Dml(lh: Lakehouse) {
  import lh.{catalog, spark}

  /** Typed row coercion (catalog.py:543-600): ISO strings → date/timestamp,
    * numbers widened, null preserved. */
  def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) | (None, _) => null
    case (Some(x), _) => coerce(x, dt)
    case (s: String, LongType) => s.trim.toLong
    case (n: Number, LongType) => n.longValue()
    case (s: String, DoubleType) => s.trim.toDouble
    case (n: Number, DoubleType) => n.doubleValue()
    case (x, StringType) => x.toString
    case (b: Boolean, BooleanType) => b
    case (s: String, BooleanType) => s.trim.toBoolean
    case (d: java.sql.Date, DateType) => d
    case (s: String, DateType) => java.sql.Date.valueOf(java.time.LocalDate.parse(s.trim))
    case (t: java.sql.Timestamp, TimestampType) => t
    case (s: String, TimestampType) =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(
        graft.core.IceTable.parseInstantMs(s.trim)))
    case (n: Number, TimestampType) =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(n.longValue()))
    case (x, t) =>
      throw new IllegalArgumentException(s"cannot coerce $x (${x.getClass.getSimpleName}) to $t")
  }

  def rowsToDf(table: String, rows: Seq[Map[String, Any]]): DataFrame = {
    val schema = catalog.loadTable(table).schema
    val sparkRows = rows.map { m =>
      val unknown = m.keySet -- schema.fieldNames.toSet
      require(unknown.isEmpty, s"unknown columns: ${unknown.mkString(",")}")
      Row.fromSeq(schema.fields.map(f => coerce(m.getOrElse(f.name, null), f.dataType)).toSeq)
    }
    spark.createDataFrame(sparkRows.asJava, schema)
  }

  /** Append typed rows; validation (incl. unique-vs-existing) pre-commit
    * (catalog.py:500-629). Returns inserted count. */
  def insertRows(table: String, rows: Seq[Map[String, Any]]): Long =
    insertDf(table, rowsToDf(table, rows))

  def insertDf(table: String, df: DataFrame): Long = {
    val tbl = catalog.loadTable(table)
    lh.validation.enforce(table, df, Some(tbl.read()))
    val snap = tbl.append(df)
    lh.audit.log(table, "insert", Map("rows" -> snap.summary("added-rows")))
    snap.summary("added-rows").toLong
  }

  /** Rewrite matching rows via when/otherwise per column, overwrite-snapshot
    * (catalog.py:632-762). Returns matched-row count.
    *
    * Table property `write.update.mode=merge-on-read` switches to ONE
    * atomic position-delete + append snapshot
    * ([[graft.core.IceTable.updateWhereMor]]): at 100 TB a small update
    * costs KBs instead of rewriting every data file. Validation, audit
    * and history semantics are identical either way. */
  def update(table: String, filter: String, set: Map[String, Any]): Long = {
    val tbl = catalog.loadTable(table)
    tbl.locked {
      val schema = tbl.schema
      val df = tbl.read()
      val cond = expr(filter)
      val setCols = set.map { case (c, v) =>
        val f = schema.fields.find(_.name == c)
          .getOrElse(throw new IllegalArgumentException(s"no such column: $c"))
        c -> lit(coerce(v, f.dataType)).cast(f.dataType)
      }
      val mor = tbl.meta.properties.get("write.update.mode")
        .contains("merge-on-read")
      val matchCond = coalesce(cond, lit(false))
      // Validate rewritten rows against the rows that were NOT touched, so
      // unique rules catch an update that duplicates an existing key. Both
      // frames come from plain filters (hit rows with the SETs applied vs
      // the untouched remainder) — never from a whole-table when/otherwise
      // rewrite, whose every-column rewrite would cost the full-table
      // scans the O(touched) write paths exist to avoid. (Lazy frames:
      // `enforce` only evaluates them when rules exist for the table.)
      val hits = setCols.foldLeft(df.where(matchCond)) { case (d, (c, v)) =>
        d.withColumn(c, v)
      }
      lh.validation.enforce(table, hits, Some(df.where(!matchCond)))
      val matched =
        if (mor) tbl.updateWhereMor(matchCond, setCols)
        // the RAW condition feeds victim pruning (a coalesce() wrapper
        // would defeat conjunct extraction); NULL-semantics stay exact —
        // the marker below re-wraps with coalesce
        else tbl.rewriteWhereCow(cond, { live =>
          // evaluate the match BEFORE any column is rewritten — if a SET
          // touches a column the filter references, re-evaluating the
          // filter afterwards would select the wrong rows
          val marked = live.withColumn("__matched", matchCond)
          setCols.foldLeft(marked) { case (d, (c, v)) =>
            d.withColumn(c, when(col("__matched"), v).otherwise(col(c)))
          }.drop("__matched")
        })._1
      lh.audit.log(table, "update",
        Map("matched" -> matched.toString, "filter" -> filter,
          "mode" -> (if (mor) "merge-on-read" else "copy-on-write")))
      matched
    }
  }

  /** SQL `UPDATE` executor face ([[graft.engine.GraftRowLevelStrategy]]):
    * like [[update]] but with the condition and SET values REBOUND onto
    * each internal read frame by `condOf`/`setsOf` — how the analyzed
    * command's resolved expressions (including IN/EXISTS subqueries in the
    * WHERE, scalar subqueries in SET) ride the engine's own machinery.
    * Same validation (hits vs untouched remainder), audit and
    * `write.update.mode` routing as [[update]]; copy-on-write goes through
    * RUNTIME victim discovery ([[graft.core.IceTable.rewriteWhereCowBy]]),
    * so a subquery-conditioned update on a 100 TB table still rewrites
    * only the files that hold matches. Every SET value sees the PRE-update
    * row (one simultaneous projection — standard SQL semantics). */
  def updateBy(table: String, pruneHint: Column,
      condOf: DataFrame => Column,
      setsOf: DataFrame => Map[String, Column], filterDesc: String): Long = {
    val tbl = catalog.loadTable(table)
    tbl.locked {
      val schema = tbl.schema
      def applySets(d: DataFrame): DataFrame = {
        val sets = setsOf(d)
        sets.keys.foreach(k => require(schema.fieldNames.contains(k),
          s"no such column: $k"))
        d.select(schema.fieldNames.toSeq.map { n =>
          sets.get(n).map(_.as(n)).getOrElse(col(n))
        }: _*)
      }
      val df = tbl.read()
      val matchCond = coalesce(condOf(df), lit(false))
      val mor = tbl.meta.properties.get("write.update.mode")
        .contains("merge-on-read")
      // unique rules see the rewritten rows against the untouched remainder
      // — lazy frames, only evaluated when rules exist for the table
      lh.validation.enforce(table, applySets(df.where(matchCond)),
        Some(df.where(!matchCond)))
      val matched =
        if (mor) tbl.updateWhereMorBy(pruneHint, condOf, setsOf)
        else tbl.rewriteWhereCowBy(pruneHint, condOf, { live =>
          // evaluate the condition ONCE into a marker column instead of
          // inlining it per SET column: a condition carrying a subquery
          // (EXISTS/IN) duplicated inside one projection plants the SAME
          // analyzed subquery plan — identical exprIds — several times in
          // one tree, and the resulting self-conflicting existence joins
          // bind against deduplicated children and fail at execution
          // (fuzz-found). One instance per query sidesteps the collision
          // and evaluates the (possibly joined) match decision once.
          // uniquify against the table schema: withColumn REPLACES an
          // existing column of the same name, which would silently
          // overwrite user data if a table column were named like the
          // marker — compared case-INSENSITIVELY, because that is how
          // withColumn/analysis resolve under the default
          // spark.sql.caseSensitive=false
          val lower = live.columns.map(_.toLowerCase).toSet
          val marker = Iterator.iterate("__graft_upd_match")(_ + "_")
            .dropWhile(m => lower.contains(m.toLowerCase)).next()
          val marked = live.withColumn(marker,
            coalesce(condOf(live), lit(false)))
          val sets = setsOf(marked)
          marked.select(schema.fieldNames.toSeq.map { n =>
            sets.get(n).map(v => when(col(marker), v).otherwise(col(n)).as(n))
              .getOrElse(col(n))
          }: _*)
        }, discoverVictims = true)._1
      lh.audit.log(table, "update",
        Map("matched" -> matched.toString, "filter" -> filterDesc,
          "mode" -> (if (mor) "merge-on-read" else "copy-on-write")))
      matched
    }
  }

  /** Keep only rows NOT matching the filter (catalog.py:765-831). Returns
    * deleted count.
    *
    * Table property `write.delete.mode=merge-on-read` switches from the
    * reference's copy-on-write (full read + overwrite — rewrites the whole
    * table for a 1-row delete) to position-delete files
    * ([[graft.core.IceTable.deleteWhereMor]]): at 100 TB a small delete
    * costs KBs instead of re-copying every data file. Results, audit and
    * history semantics are identical either way. */
  def delete(table: String, filter: String): Long =
    deleteWhere(table, expr(filter), filter)

  /** Column-predicate delete — the ONE implementation of the
    * `write.delete.mode` routing and NULL-kept semantics, shared by the
    * string-predicate API above and the DSv2 SQL surface
    * ([[graft.engine.GraftSparkTable]]), so the two can never diverge. */
  def deleteWhere(table: String, cond: Column,
      filterDesc: String = "<column predicate>"): Long = {
    val tbl = catalog.loadTable(table)
    tbl.locked {
      val mor = tbl.meta.properties.get("write.delete.mode")
        .contains("merge-on-read")
      val deleted =
        if (mor) tbl.deleteWhereMor(cond)
        // partial copy-on-write: rewrite only the candidate files, carry
        // the rest by reference — NULL-cond rows are kept (three-valued)
        else tbl.rewriteWhereCow(cond,
          live => live.where(!coalesce(cond, lit(false))))._1
      lh.audit.log(table, "delete",
        Map("deleted" -> deleted.toString, "filter" -> filterDesc,
          "mode" -> (if (mor) "merge-on-read" else "copy-on-write")))
      deleted
    }
  }

  /** SQL subquery-`DELETE` executor face (see [[updateBy]]): the rebound
    * condition rides either the MoR position-delete commit or runtime-
    * victim-discovery partial CoW — both O(touched) even when the literal
    * conjuncts prune nothing. NULL-condition rows are kept (three-valued),
    * exactly like [[deleteWhere]]. */
  def deleteBy(table: String, pruneHint: Column,
      condOf: DataFrame => Column, filterDesc: String): Long = {
    val tbl = catalog.loadTable(table)
    tbl.locked {
      val mor = tbl.meta.properties.get("write.delete.mode")
        .contains("merge-on-read")
      val deleted =
        if (mor) tbl.deleteWhereMorBy(pruneHint, condOf)
        else tbl.rewriteWhereCowBy(pruneHint, condOf,
          live => live.where(!coalesce(condOf(live), lit(false))),
          discoverVictims = true)._1
      lh.audit.log(table, "delete",
        Map("deleted" -> deleted.toString, "filter" -> filterDesc,
          "mode" -> (if (mor) "merge-on-read" else "copy-on-write")))
      deleted
    }
  }

  /** Replace the table's contents, with the same validation + audit wrap
    * as [[insertDf]] (the DSv2 `INSERT OVERWRITE` path; the engine API's
    * own overwrites go through IceTable directly, reference parity). The
    * candidate validates against NO existing remainder — it replaces
    * everything. */
  def overwriteDf(table: String, df: DataFrame): Long = {
    val tbl = catalog.loadTable(table)
    tbl.locked {
      lh.validation.enforce(table, df, None)
      val snap = tbl.overwrite(df)
      lh.audit.log(table, "overwrite",
        Map("rows" -> snap.summary("added-rows")))
      snap.summary("added-rows").toLong
    }
  }

  /** FILTER overwrite (SQL `INSERT INTO … REPLACE WHERE` / DSv2
    * OVERWRITE_BY_FILTER): atomically replace exactly the rows matching
    * `cond` with `df` — ONE snapshot, so readers never observe the
    * deleted-but-not-reinserted middle state. Default is copy-on-write
    * (kept remainder ∪ incoming, same commit shape as [[overwriteDf]]);
    * table property `write.overwrite.mode=merge-on-read` switches to an
    * atomic position-delete + append ([[graft.core.IceTable
    * .overwriteWhereMor]]) that rewrites no existing file — at 100 TB,
    * replacing one partition costs the new data plus a KB-sized delete
    * file. Validation runs the incoming batch against the kept remainder
    * (a unique rule catches a replace that collides with surviving
    * rows); the audit log records the filter and mode. Returns the
    * replaced (deleted) row count. */
  def overwriteWhereDf(table: String, cond: Column, df: DataFrame,
      filterDesc: String = "<column predicate>"): Long = {
    val tbl = catalog.loadTable(table)
    tbl.locked {
      val matchCond = coalesce(cond, lit(false))
      val kept = tbl.read().where(!matchCond)
      lh.validation.enforce(table, df, Some(kept))
      val mor = tbl.meta.properties.get("write.overwrite.mode")
        .contains("merge-on-read")
      val replaced =
        if (mor) tbl.overwriteWhereMor(matchCond, df)._1
        else {
          // partial copy-on-write: only candidate files are read and
          // rewritten (their non-matching rows kept); untouched files
          // carry by reference and the incoming batch lands in the SAME
          // atomic snapshot — replacing one partition of a 100 TB table
          // rewrites that partition, not the table
          val aligned = df.select(tbl.schema.fieldNames.map(col).toSeq: _*)
          // raw `cond` for victim pruning (coalesce defeats extraction);
          // the kept-rows filter below keeps the exact NULL semantics
          tbl.rewriteWhereCow(cond,
            live => live.where(!matchCond),
            alsoAppend = Some(aligned),
            extraSummary = Map("replace-where" -> filterDesc))._1
        }
      lh.audit.log(table, "overwrite",
        Map("replaced" -> replaced.toString, "filter" -> filterDesc,
          "mode" -> (if (mor) "merge-on-read" else "copy-on-write")))
      replaced
    }
  }

  /** Commit the result of a SQL `MERGE INTO`
    * ([[graft.engine.GraftMergeStrategy]]): the merged frame replaces the
    * table's contents in ONE copy-on-write snapshot, with the same
    * validation enforcement and audit logging as every other write
    * surface. `statsAfterWrite` is evaluated AFTER the staged data write
    * (inside the table lock, before the metadata commit): the per-clause
    * counts ride the SAME job as the content — an `Observation` on the
    * merged plan — so the merge join is never evaluated a second time
    * just for the audit. (When validation rules exist for the table,
    * `enforce` runs its own counting actions first and completes the
    * observation early — same values, one extra pass only on
    * rule-guarded tables.) */
  def mergeDf(table: String, merged: DataFrame,
      statsAfterWrite: () => Map[String, Long]): Map[String, Long] = {
    val tbl = catalog.loadTable(table)
    tbl.locked {
      lh.validation.enforce(table, merged, None)
      var counts: Map[String, Long] = Map.empty
      tbl.overwriteObserved(merged, () => {
        counts = statsAfterWrite()
        counts.map { case (k, v) => s"merge-$k" -> v.toString }
      })
      lh.audit.log(table, "merge",
        counts.map { case (k, v) => k -> v.toString })
      counts
    }
  }

  /** FILE-LEVEL partial-CoW twin of [[mergeDf]]
    * ([[graft.core.IceTable.mergeFilesCow]]): `filter` is the merge's
    * source-key IN-list superset — only candidate files are read and
    * rewritten through `replacementOf` (victims' live rows → the full
    * replacement content: merge-classified touched rows, in-file
    * untouched rows carried verbatim, source-only inserts); every other
    * data file carries by REFERENCE, so a small MERGE on a 100 TB
    * copy-on-write table rewrites only the files it touches. Validation
    * enforces the replacement content AGAINST the carried remainder
    * (lazy — only read when rules exist), so unique rules still catch an
    * update that duplicates a key living in a carried file; per-clause
    * counts ride the staged write's own Observation. */
  def mergePartialCowDf(table: String, filter: Column,
      replacementOf: DataFrame => DataFrame,
      statsAfterWrite: () => Map[String, Long]): Map[String, Long] = {
    val tbl = catalog.loadTable(table)
    tbl.locked {
      var counts: Map[String, Long] = Map.empty
      tbl.mergeFilesCow(filter,
        (live, carried) => {
          val replacement = replacementOf(live)
          // unique rules see the replacement against the CARRIED-file rows
          // — a MERGE update duplicating a key that lives in a carried
          // file must fail here, exactly like updateBy's hits-vs-remainder
          lh.validation.enforce(table, replacement, Some(carried()))
          replacement
        },
        () => {
          counts = statsAfterWrite()
          counts.map { case (k, v) => s"merge-$k" -> v.toString }
        })
      lh.audit.log(table, "merge",
        counts.map { case (k, v) => k -> v.toString })
      counts
    }
  }

  /** Merge-on-read twin of [[mergeDf]]: `delta` is the classified
    * O(touched) subset of the merge join (rows with
    * [[graft.engine.GraftMerge.CatCol]] ∈ updated/deleted/inserted,
    * carrying the target-schema values plus the matched rows' lineage
    * identities). It is STAGED to a temp parquet in ONE distributed pass
    * — completing the counts observation — and both commit halves (the
    * position-delete file and the appended content) derive from that
    * materialized set, exactly the [[graft.core.IceTable.updateWhereMor]]
    * shape (including its staging location: a dotted dir INSIDE the
    * table's data dir, i.e. the shared warehouse filesystem — a
    * driver-local temp path would not be visible to executors on a real
    * cluster). Carried rows are never read back or rewritten. */
  def mergeMorDf(table: String, delta: DataFrame, asOfId: Long,
      statsAfterWrite: () => Map[String, Long]): Map[String, Long] = {
    import graft.core.IceTable
    import graft.engine.GraftMerge
    val tbl = catalog.loadTable(table)
    tbl.locked {
      val tmp = tbl.dataDir.resolve(
        s".merge-delta-${java.util.UUID.randomUUID().toString.take(12)}")
      try {
        delta.write.mode("overwrite").parquet(tmp.toString)
        val counts = statsAfterWrite()
        val staged = spark.read.parquet(tmp.toString)
        val dead = staged.where(col(GraftMerge.CatCol)
            .isin("updated", "deleted"))
          .select(col(IceTable.LineageFileCol).as("file_path"),
            col(IceTable.LineagePosCol).as("pos"))
        val newRows = staged.where(col(GraftMerge.CatCol)
            .isin("updated", "inserted"))
          .select(tbl.schema.fieldNames.map(col).toSeq: _*)
        // unique rules see the new content against the SURVIVING rows
        // (everything except the rows this merge deletes/rewrites): a
        // MoR update that duplicates a key in an untouched row must fail
        // here, like the partial-CoW path's carried remainder. Lazy — the
        // anti-join only runs when rules exist for the table.
        val remainder = tbl.readWithLineage()
          .join(staged.where(col(GraftMerge.CatCol)
              .isin("updated", "deleted"))
            .select(col(IceTable.LineageFileCol), col(IceTable.LineagePosCol)),
            Seq(IceTable.LineageFileCol, IceTable.LineagePosCol), "left_anti")
          .drop(IceTable.LineageFileCol, IceTable.LineagePosCol)
        lh.validation.enforce(table, newRows, Some(remainder))
        tbl.mergeMor(dead, newRows, asOfId,
          counts.map { case (k, v) => s"merge-$k" -> v.toString })
        lh.audit.log(table, "merge",
          counts.map { case (k, v) => k -> v.toString } +
            ("mode" -> "merge-on-read"))
        counts
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      }
    }
  }

  /** Key-match merge: unmatched-existing ∪ incoming — the idiomatic
    * left_anti + unionByName form of the reference's LEFT JOIN + IS NULL
    * (catalog.py:1289-1326). Duplicate keys WITHIN the incoming batch are
    * collapsed to the last occurrence first (the row a sequential
    * reference-style upsert would leave behind), so the merge can never
    * introduce duplicate keys or misreport counts. */
  def upsert(table: String, incoming: DataFrame, keys: Seq[String]): UpsertResult = {
    val tbl = catalog.loadTable(table)
    tbl.locked {
      val schema = tbl.schema
      keys.foreach(k => require(schema.fieldNames.contains(k), s"no such key column: $k"))
      val existing = tbl.read()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*)
        .orderBy(monotonically_increasing_id().desc)
      val inc = incoming.select(schema.fieldNames.map(col).toSeq: _*)
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).drop("__rn")
      // FILE-LEVEL partial copy-on-write when the incoming key set is
      // small and the incoming plan is deterministic: only files that can
      // hold an incoming key are rewritten (their non-matching rows kept
      // via the same anti-join); every other file carries by REFERENCE
      // and the incoming batch appends in the SAME atomic snapshot — a
      // small upsert against a 100 TB table rewrites only the files it
      // touches. A nondeterministic incoming plan could yield a probe key
      // set that disagrees with the join's (silently duplicating keys in
      // a carried file), so it falls back to the whole-table form — the
      // same soundness rule as the MERGE restriction.
      val incDeterministic = !org.apache.spark.sql.graft.DatasetBridge
        .analyzed(incoming).exists(_.expressions.exists(e => !e.deterministic))
      val cap = graft.engine.GraftMerge.InListKeyCap
      val probe =
        if (incDeterministic)
          inc.select(keys.map(col): _*).limit(cap + 1).collect()
        else Array.empty[org.apache.spark.sql.Row]
      val inFilter =
        if (incDeterministic && probe.length <= cap)
          Some(keys.zipWithIndex.map { case (k, i) =>
            val vals = probe.map(_.get(i)).filter(_ != null).distinct
            if (vals.isEmpty) lit(false) else col(k).isin(vals.toSeq: _*)
          }.reduce(_ && _))
        else None
      // matched-count with the SMALL side as the build side: the
      // existing→inc semi broadcasts (Catalyst/AQE) so the table is a
      // map-only scan, and the distinct shuffles only the MATCHED keys —
      // the flipped form (inc semi existing.distinct) would shuffle the
      // whole table's keys twice. inc's keys are unique after the dedup
      // window, so distinct matched existing keys == matched inc rows.
      // With a sound IN-list the count scans only candidate FILES
      // (matches can live nowhere else — manifest pruning at the scan).
      val countBase = inFilter match {
        case Some(f) => tbl.currentSnapshot.filter(_.files.nonEmpty)
          .map(s => tbl.readSnapshotPruned(s, Some(f))).getOrElse(existing)
        case None => existing
      }
      val updated = countBase.join(inc.select(keys.map(col): _*),
          keys, "left_semi")
        .select(keys.map(col): _*).distinct().count()
      val inserted = inc.count() - updated
      lh.validation.enforce(table, inc, None)
      inFilter match {
        case Some(inF) =>
          tbl.rewriteWhereCow(inF,
            live => live.join(inc, keys, "left_anti"),
            alsoAppend = Some(inc))
        case None =>
          val merged = existing.join(inc, keys, "left_anti").unionByName(inc)
          tbl.overwrite(merged)
      }
      lh.audit.log(table, "upsert",
        Map("inserted" -> inserted.toString, "updated" -> updated.toString))
      UpsertResult(inserted, updated)
    }
  }

  def upsertRows(table: String, rows: Seq[Map[String, Any]], keys: Seq[String]): UpsertResult =
    upsert(table, rowsToDf(table, rows), keys)

  /** Sequential ops; first failure stops the batch and the rest are marked
    * skipped; no cross-table rollback (catalog.py:1003-1088). */
  def executeBatch(ops: Seq[BatchOp]): List[BatchResult] = {
    var failed = false
    ops.toList.map { op =>
      if (failed) BatchResult(op.op, op.table, "skipped", "previous op failed", 0)
      else try {
        val n = op.op match {
          case "insert" => insertRows(op.table, op.rows)
          case "update" => update(op.table, op.filter, op.set)
          case "delete" => delete(op.table, op.filter)
          case "upsert" =>
            val r = upsertRows(op.table, op.rows, op.keys); r.inserted + r.updated
          case other => throw new IllegalArgumentException(s"unknown batch op: $other")
        }
        BatchResult(op.op, op.table, "ok", "", n)
      } catch {
        case e: Exception =>
          failed = true
          BatchResult(op.op, op.table, "failed", String.valueOf(e.getMessage), 0)
      }
    }
  }
}
