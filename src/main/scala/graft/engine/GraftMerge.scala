package graft.engine

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, UpdateAction}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge, DatasetBridge}

import graft.core.IceTable

/** SQL `MERGE INTO` for graft tables — the natural completion of the
  * native-SQL-writes story (INSERT/DELETE/REPLACE WHERE already route
  * through [[graft.dml.Dml]]):
  *
  * {{{
  * MERGE INTO g.ns.t t USING src s ON t.id = s.id
  * WHEN MATCHED AND s.del THEN DELETE
  * WHEN MATCHED THEN UPDATE SET *
  * WHEN NOT MATCHED THEN INSERT *
  * WHEN NOT MATCHED BY SOURCE THEN UPDATE SET flag = 'stale'
  * }}}
  *
  * Spark's DSv2 row-level-operation rewrite requires a native executor-side
  * BatchWrite; graft's commit protocol is driver-orchestrated (V1Write),
  * so MERGE is claimed one level higher: a planner [[SparkStrategy]]
  * (registered by [[graft.GraftExtensions]], which Spark consults BEFORE
  * its own strategies) matches the fully-ANALYZED `MergeIntoTable` command
  * — star-expansion and assignment alignment already done by the analyzer
  * — over a [[GraftSparkTable]] relation and executes it as one
  * distributed DataFrame plan + one atomic commit through
  * [[graft.dml.Dml]] (validation + audit, like every other write surface).
  *
  * Semantics (SQL standard / Spark MERGE):
  *  - clauses are evaluated FIRST-MATCH per row, in declaration order —
  *    a `when` chain, which short-circuits exactly that way;
  *  - a target row matched by MORE THAN ONE source row raises an error
  *    ONLY when a matched UPDATE/DELETE clause applies to one of the
  *    duplicated pairs (the nondeterministic-modification case —
  *    Spark/Delta/Iceberg's rule); a many-to-one match where no matched
  *    clause applies (e.g. an insert-only dedup-ingest MERGE) is valid
  *    and carries ONE copy of the target row. Enforced by window
  *    aggregates over a per-target-row id inside the same plan via
  *    `raise_error` — no extra pass, and no commit can land on ambiguous
  *    input;
  *  - assignment keys must resolve to top-level target columns; nested
  *    field assignments (`SET addr.city = …`) are refused loudly rather
  *    than silently keeping the old value;
  *  - unmatched target rows with no `NOT MATCHED BY SOURCE` clause (and
  *    matched rows with no applying clause) carry over unchanged;
  *    unmatched source rows with no applying INSERT clause are ignored.
  *
  * Scale shape: ONE full-outer join on the merge condition (shuffle or
  * broadcast by Catalyst's choice), window aggregates partitioned by the
  * unique per-target-row id (near-uniform, never single-partition), then
  * ONE commit pass:
  *  - copy-on-write (default): the merged content overwrites the table;
  *    the per-clause audit counts ride the SAME write job as an
  *    [[org.apache.spark.sql.Observation]] — the join is evaluated once,
  *    not once for counts and once for content;
  *  - `write.merge.mode=merge-on-read`: ONE pass over the join stages the
  *    O(touched) delta (updated/deleted row identities + new row
  *    content), from which a position-delete file and an append land as
  *    ONE atomic snapshot ([[IceTable.mergeMor]]) — carried rows are
  *    never rewritten, so a small MERGE on a 100 TB table costs
  *    O(touched) like a MoR update. */
object GraftMerge {

  private val TP = "__graft_merge_t_present"
  private val SP = "__graft_merge_s_present"
  private val TID = "__graft_merge_tid"

  /** Classification column: updated/deleted/carried/inserted/ignored, or
    * null for the collapsed duplicates of a many-to-one carried row. */
  val CatCol = "__graft_merge_cat"
  /** Row-survives-the-merge column (false = deleted/ignored/collapsed). */
  val KeepCol = "__graft_merge_keep"

  val Categories = Seq("updated", "deleted", "carried", "inserted", "ignored")

  /** Refuse assignment keys that are not top-level target columns —
    * a nested-field or computed key would otherwise silently fall back
    * to the old value while the merge reports success. */
  private def validateAssignments(m: MergeIntoTable,
      targetAttrs: Seq[Attribute]): Unit = {
    val tgtIds = targetAttrs.map(_.exprId).toSet
    def check(actions: Seq[MergeAction], where: String): Unit =
      actions.foreach {
        case u: UpdateAction => u.assignments.foreach(_.key match {
          case ar: AttributeReference if tgtIds(ar.exprId) => ()
          case k => throw new UnsupportedOperationException(
            s"MERGE $where assignment key '${k.sql}' does not resolve to " +
              "a top-level target column (nested-field assignments are " +
              "not supported — update the whole struct column instead)")
        })
        case i: InsertAction => i.assignments.foreach(_.key match {
          case ar: AttributeReference if tgtIds(ar.exprId) => ()
          case k => throw new UnsupportedOperationException(
            s"MERGE $where assignment key '${k.sql}' does not resolve to " +
              "a top-level target column")
        })
        case _ => ()
      }
    check(m.matchedActions, "WHEN MATCHED")
    check(m.notMatchedActions, "WHEN NOT MATCHED")
    check(m.notMatchedBySourceActions, "WHEN NOT MATCHED BY SOURCE")
  }

  /** Source keys with at most this many distinct tuples restrict the
    * target read as a literal IN-list (pushed into the parquet scan →
    * manifest file skipping + row-group pushdown); above it, a semi-join
    * restriction (broadcast when Catalyst sizes it so). */
  val InListKeyCap = 10000

  /** The merge condition's equi-key conjuncts: top-level
    * `t.col = <expr over source>` equalities (either side order), with
    * deterministic source expressions only — the restriction below
    * re-evaluates them, which must be repeatable. Non-equality conjuncts
    * are ignored (they stay in the join condition; a key-based
    * restriction is a SUPERSET of the true match set either way). */
  def keyEqualities(m: MergeIntoTable): Seq[(AttributeReference, Expression)] = {
    val tgtIds = m.targetTable.output.map(_.exprId).toSet
    val srcIds = m.sourceTable.output.map(_.exprId).toSet
    def srcOnly(e: Expression): Boolean =
      e.deterministic && e.references.nonEmpty &&
        e.references.forall(a => srcIds(a.exprId))
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        split(l) ++ split(r)
      case other => Seq(other)
    }
    split(m.mergeCondition).collect {
      case org.apache.spark.sql.catalyst.expressions.EqualTo(
          l: AttributeReference, r) if tgtIds(l.exprId) && srcOnly(r) =>
        (l, r)
      case org.apache.spark.sql.catalyst.expressions.EqualTo(
          l, r: AttributeReference) if tgtIds(r.exprId) && srcOnly(l) =>
        (r, l)
    }
  }

  /** The source-key restriction plan, when sound: `(inFilter, keyDf,
    * keyNames)` where `inFilter` is a literal IN-list Column over the
    * TARGET key column names (present when the source has ≤
    * [[InListKeyCap]] distinct key tuples — pushable into a scan for
    * manifest file skipping + row-group pushdown; the per-column
    * cross-product is a superset of the tuple set, which is safe), and
    * `keyDf` the distinct source-key frame for semi/anti-join
    * restriction above the cap.
    *
    * None — restriction unsound — when: a `NOT MATCHED BY SOURCE` clause
    * exists (it must see every target row); no deterministic equi-key
    * conjunct extracts; or the SOURCE PLAN contains any nondeterministic
    * expression (the key probe re-evaluates the source, and a
    * nondeterministic source could yield probe keys that disagree with
    * the join's keys — silently dropping matches; Delta materializes the
    * source for exactly this reason, we fall back to the unrestricted
    * join instead). */
  def sourceKeyPlan(spark: SparkSession, m: MergeIntoTable)
      : Option[(Option[Column], DataFrame, Seq[String])] = {
    if (m.notMatchedBySourceActions.nonEmpty) return None
    val keys = keyEqualities(m)
    if (keys.isEmpty) return None
    val srcDeterministic = !m.sourceTable.exists(
      _.expressions.exists(e => !e.deterministic))
    if (!srcDeterministic) return None
    val srcDf = DatasetBridge.ofRows(spark, m.sourceTable)
    val keyDf = srcDf.select(keys.map { case (a, e) =>
      ColumnBridge.column(e).cast(a.dataType).as(a.name) }: _*).distinct()
    val probe = keyDf.limit(InListKeyCap + 1).collect()
    val inFilter =
      if (probe.length > InListKeyCap) None
      else Some(keys.zipWithIndex.map { case ((a, _), i) =>
        val vals = probe.map(_.get(i)).filter(_ != null).distinct
        if (vals.isEmpty) lit(false) else col(a.name).isin(vals: _*)
      }.reduce(_ && _))
    Some((inFilter, keyDf, keys.map(_._1.name)))
  }

  /** Restrict the merge-on-read target read to rows that CAN be touched:
    * when restriction is sound ([[sourceKeyPlan]]), the merge delta only
    * needs target rows whose key columns match some source row (plus the
    * source-only inserts), so the full-outer join never has to see — or
    * SHUFFLE — the carried 99% of a large table. Small key sets push an
    * IN-list into the pruned lineage read (file skipping + row-group
    * pushdown — non-matching rows that survive the superset filter
    * classify as `carried` and are dropped from the delta); larger key
    * sets fall back to a left-semi join. When None is returned the
    * caller reads the full table; otherwise it must correct the
    * `carried` audit count to `liveRows − updated − deleted`, since
    * carried rows never enter the frame. */
  def restrictedTarget(spark: SparkSession, m: MergeIntoTable,
      tbl: IceTable): Option[DataFrame] =
    sourceKeyPlan(spark, m).map {
      case (Some(f), _, _) => tbl.readWithLineagePruned(Some(f))
      case (None, keyDf, names) =>
        tbl.readWithLineage().join(keyDf, names, "left_semi")
    }

  /** The classified merge frame: the full-outer join of `tgt0` (the
    * target content — the command's own relation for copy-on-write, the
    * engine's lineage-bearing read for merge-on-read) against the
    * command's source, one row per surviving pair, columns = target
    * schema values + `passthrough` (carried verbatim from `tgt0`,
    * null on source-only rows) + [[CatCol]] + [[KeepCol]].
    *
    * `rebind` substitutes the command's target AttributeReferences with
    * `tgt0`'s when the two differ (the MoR path); identity for CoW. */
  def classify(spark: SparkSession, m: MergeIntoTable, tgt0: DataFrame,
      passthrough: Seq[String],
      rebind: Expression => Expression): DataFrame = {
    // WITH SCHEMA EVOLUTION needs the field-id alter path (IceTable
    // addColumn), which DSv2 TableChanges cannot carry — refuse loudly
    // rather than silently merging against the unevolved schema
    require(!m.withSchemaEvolution,
      "MERGE … WITH SCHEMA EVOLUTION is not supported: evolve the schema " +
        "through the engine API (IceTable.addColumn) first")
    val targetAttrs: Seq[Attribute] = m.targetTable.output
    validateAssignments(m, targetAttrs)
    val reserved = Seq(TP, SP, TID, CatCol, KeepCol)
    val clash = (m.targetTable.output ++ m.sourceTable.output)
      .map(_.name).toSet.intersect(reserved.toSet)
    require(clash.isEmpty, s"reserved merge column name in use: $clash")

    val tgt = tgt0
      .withColumn(TP, lit(true))
      .withColumn(TID, monotonically_increasing_id())
    val src = DatasetBridge.ofRows(spark, m.sourceTable)
      .withColumn(SP, lit(true))
    def cc(e: Expression): Column = ColumnBridge.column(rebind(e))
    val joined = tgt.join(src, cc(m.mergeCondition), "full_outer")

    def condCol(a: MergeAction): Column =
      a.condition.map(cc).getOrElse(lit(true))
    def assignedValue(a: MergeAction, attr: Attribute,
        default: Column): Column = a match {
      case u: UpdateAction =>
        u.assignments.find(_.key match {
          case ar: AttributeReference => ar.exprId == attr.exprId
          case _ => false
        }).map(asg => cc(asg.value)).getOrElse(default)
      case i: InsertAction =>
        i.assignments.find(_.key match {
          case ar: AttributeReference => ar.exprId == attr.exprId
          case _ => false
        }).map(asg => cc(asg.value)).getOrElse(default)
      case _: DeleteAction => default
      case other => throw new UnsupportedOperationException(
        s"unsupported MERGE action: $other")
    }
    // first-match chain: when(c1, v1).otherwise(when(c2, v2)...(default))
    def chainValue(actions: Seq[MergeAction], attr: Attribute,
        default: Column): Column =
      actions.foldRight(default)((a, els) =>
        when(condCol(a), assignedValue(a, attr, default)).otherwise(els))
    def chainKeep(actions: Seq[MergeAction], default: Column): Column =
      actions.foldRight(default)((a, els) =>
        when(condCol(a),
          lit(!a.isInstanceOf[DeleteAction])).otherwise(els))
    def chainCat(actions: Seq[MergeAction], default: Column): Column =
      actions.foldRight(default)((a, els) =>
        when(condCol(a), lit(a match {
          case _: DeleteAction => "deleted"
          case _: InsertAction => "inserted"
          case _ => "updated"
        })).otherwise(els))

    // ---- target-side rows (matched or not-matched-by-source) ----------
    val matched = col(SP).isNotNull
    val wTid = Window.partitionBy(col(TID))
    val mc = count(col(SP)).over(wTid)
    // does the FIRST-matching clause of any duplicated pair modify the
    // row? Only then is a many-to-one match ambiguous (Spark/Delta rule);
    // a carried many-to-one row instead collapses to one output copy
    val appliesM = m.matchedActions.foldRight(lit(false))((a, els) =>
      when(condCol(a), lit(true)).otherwise(els))
    val anyApplies =
      max(when(matched && appliesM, lit(1)).otherwise(lit(0))).over(wTid)
    val rn = row_number().over(Window.partitionBy(col(TID)).orderBy(col(TID)))
    val keepT =
      when(mc > 1 && anyApplies === 1,
        raise_error(lit("MERGE cardinality violation: a target row " +
          "matched more than one source row with an applying matched " +
          "clause")).cast("boolean"))
      .when(mc > 1, rn === 1) // valid many-to-one carry: one copy survives
      .otherwise(when(matched, chainKeep(m.matchedActions, lit(true)))
        .otherwise(chainKeep(m.notMatchedBySourceActions, lit(true))))
    val catT =
      when(mc > 1, when(rn === 1, lit("carried")).otherwise(lit(null)))
      .otherwise(when(matched, chainCat(m.matchedActions, lit("carried")))
        .otherwise(chainCat(m.notMatchedBySourceActions, lit("carried"))))
    def valT(attr: Attribute): Column =
      when(mc > 1, cc(attr)) // carried copy: values unchanged
        .otherwise(when(matched, chainValue(m.matchedActions, attr, cc(attr)))
          .otherwise(chainValue(m.notMatchedBySourceActions, attr,
            cc(attr))))
    val tAll = joined.where(col(TP).isNotNull).select(
      targetAttrs.map(a => valT(a).cast(a.dataType).as(a.name)) ++
        passthrough.map(col) ++
        Seq(catT.as(CatCol), keepT.as(KeepCol)): _*)

    // ---- source-only rows (NOT MATCHED) --------------------------------
    val sSide = joined.where(col(TP).isNull)
    val keepS = chainKeep(m.notMatchedActions, lit(false))
    val sAll = sSide.select(
      targetAttrs.map(a =>
        chainValue(m.notMatchedActions, a, lit(null))
          .cast(a.dataType).as(a.name)) ++
        passthrough.map(c => lit(null).cast(tgt0.schema(c).dataType).as(c)) ++
        Seq(when(keepS, lit("inserted")).otherwise(lit("ignored")).as(CatCol),
          keepS.as(KeepCol)): _*)

    tAll.unionByName(sAll)
  }

  /** Attach the per-clause audit counts to `classified` as an
    * [[Observation]] — they materialize from whatever single action later
    * consumes the frame (the overwrite's stage write, the MoR delta
    * write), never from a second evaluation of the merge join. */
  def observed(classified: DataFrame): (DataFrame, Observation) = {
    val obs = Observation()
    val aggs = Categories.map(c =>
      count(when(col(CatCol) === c, lit(1))).as(c))
    (classified.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** Observation metrics → the per-category count map. */
  def counts(obs: Observation): Map[String, Long] =
    Categories.map(c => c -> (obs.get.getOrElse(c, 0L) match {
      case l: java.lang.Long => l.longValue
      case l: Long => l
      case other => other.toString.toLong
    })).toMap
}

/** Planner strategy claiming analyzed MERGE commands over graft tables.
  * Anything else returns Nil so Spark's own planning proceeds. */
class GraftMergeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case m: MergeIntoTable => m.targetTable match {
      case r: DataSourceV2ScanRelation
          if r.relation.table.isInstanceOf[GraftSparkTable] =>
        val t = r.relation.table.asInstanceOf[GraftSparkTable]
        Seq(GraftMergeExec(t.lakehouse, t.fullIdent, m))
      case _ => Nil
    }
    case _ => Nil
  }
}

/** Physical MERGE command: builds the classified merge plan and commits
  * it through Dml (validation + audit + ONE atomic snapshot), all under
  * the table lock so the read-compute-commit cycle is atomic against
  * in-JVM writers. Runs nested Spark jobs from the driver — the
  * RunnableCommand pattern. Copy-on-write by default;
  * `write.merge.mode=merge-on-read` lands a position-delete + append
  * snapshot instead (O(touched)). The side effect is memoized — a
  * re-executed plan (or both executeCollect and doExecute firing) can
  * never merge twice (the V2CommandExec rule). */
case class GraftMergeExec(lh: graft.Lakehouse, fullName: String,
    m: MergeIntoTable) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil

  private lazy val result: Array[InternalRow] = {
    val spark = session.asInstanceOf[SparkSession]
    val tbl = lh.catalog.loadTable(fullName)
    val mor = tbl.meta.properties.get("write.merge.mode")
      .contains("merge-on-read") &&
      tbl.currentSnapshot.exists(_.files.nonEmpty)
    if (!mor) {
      val targetAttrs = m.targetTable.output
      GraftMerge.sourceKeyPlan(spark, m) match {
        // FILE-LEVEL partial copy-on-write: with a sound IN-list key
        // restriction, only the candidate files (manifest bounds /
        // partition dirs / blooms admit a source key) are read and
        // rewritten; every other data file carries by REFERENCE — both
        // the join's SHUFFLE and the rewrite's WRITE are O(touched), so
        // a small MERGE on a 100 TB CoW table rewrites only the files
        // it touches, like Iceberg's copy-on-write row-level ops
        case Some((Some(inF), _, _))
            if tbl.currentSnapshot.exists(_.files.nonEmpty) =>
          var obs: Observation = null
          lh.dml.mergePartialCowDf(fullName, inF, { live =>
            // rebind the command's target attrs onto the engine read of
            // the candidate files (same shape as the MoR branch)
            val byName = DatasetBridge.output(live)
              .map(a => a.name -> a).toMap
            val mapping: Map[ExprId, Attribute] = targetAttrs
              .flatMap(o => byName.get(o.name).map(o.exprId -> _)).toMap
            val rebind: Expression => Expression = _.transform {
              case ar: AttributeReference if mapping.contains(ar.exprId) =>
                mapping(ar.exprId)
            }
            // exact split within the candidate files: null-keyed rows
            // can never equal-match and carry verbatim
            val touched = live.where(inF)
            val untouched = live.where(coalesce(!inF, lit(true)))
            val part = GraftMerge.classify(spark, m, touched, Nil, rebind)
            val carried = untouched.select(
              targetAttrs.map(a => col(a.name)) ++
                Seq(lit("carried").as(GraftMerge.CatCol),
                  lit(true).as(GraftMerge.KeepCol)): _*)
            val (obsFrame, o) = GraftMerge.observed(part.unionByName(carried))
            obs = o
            obsFrame.where(col(GraftMerge.KeepCol))
              .drop(GraftMerge.CatCol, GraftMerge.KeepCol)
          }, () => {
            val c = GraftMerge.counts(obs)
            // rows in files carried by reference never enter the frame —
            // derive their count from the exact live-row accounting. Read
            // the head HERE (inside the commit lock, after the pinned
            // snapshot read): a commit interleaving after the pin aborts
            // the merge CAS, so this head always equals the pinned parent
            // in any summary that actually publishes
            val parentLive = tbl.currentSnapshot.get.liveRows
            c + ("carried" -> (parentLive - c("updated") - c("deleted")))
          })
        case skp =>
          // row-level restriction (semi/anti pair above the IN-list cap)
          // or no sound restriction: only the source-key-matching target
          // rows enter the full-outer join; untouched rows union in as
          // carried — a map-only scan, so the join's shuffle is
          // O(touched), though the CoW WRITE still rewrites the table
          val classified = skp match {
            case Some((inFilterOpt, keyDf, names)) =>
              // the splitTarget shape, from the ALREADY-collected key
              // plan (no second probe): exact partition, null keys carry
              val tgt = DatasetBridge.ofRows(spark, m.targetTable)
              val (touched, untouched) = inFilterOpt match {
                case Some(c) => (tgt.where(c),
                  tgt.where(coalesce(!c, lit(true))))
                case None => (tgt.join(keyDf, names, "left_semi"),
                  tgt.join(keyDf, names, "left_anti"))
              }
              val part = GraftMerge.classify(spark, m, touched, Nil, identity)
              val carried = untouched.select(
                targetAttrs.map(a => col(a.name)) ++
                  Seq(lit("carried").as(GraftMerge.CatCol),
                    lit(true).as(GraftMerge.KeepCol)): _*)
              part.unionByName(carried)
            case None =>
              GraftMerge.classify(spark, m,
                DatasetBridge.ofRows(spark, m.targetTable), Nil, identity)
          }
          val (obsFrame, obs) = GraftMerge.observed(classified)
          val merged = obsFrame.where(col(GraftMerge.KeepCol))
            .drop(GraftMerge.CatCol, GraftMerge.KeepCol)
          lh.dml.mergeDf(fullName, merged, () => GraftMerge.counts(obs))
      }
    } else {
      // merge-on-read: rebind the command's target attributes onto the
      // engine's lineage-bearing read, stage the O(touched) delta in ONE
      // pass over the join, and land delete-file + append as one snapshot.
      // When no NOT-MATCHED-BY-SOURCE clause exists, the read is
      // restricted to source-key-matching rows FIRST (IN-list pushdown /
      // semi-join), so the full-outer join — which Spark can never
      // broadcast — shuffles O(touched) rows, not the whole table.
      val snap = tbl.currentSnapshot.get
      val asOf = snap.id
      val restricted = GraftMerge.restrictedTarget(spark, m, tbl)
      val tgt0 = restricted.getOrElse(tbl.readWithLineage())
      val newAttrs = DatasetBridge.output(tgt0)
      val byName = newAttrs.map(a => a.name -> a).toMap
      val mapping: Map[ExprId, Attribute] = m.targetTable.output
        .flatMap(o => byName.get(o.name).map(o.exprId -> _)).toMap
      val rebind: Expression => Expression = _.transform {
        case ar: AttributeReference if mapping.contains(ar.exprId) =>
          mapping(ar.exprId)
      }
      val lineage = Seq(IceTable.LineageFileCol, IceTable.LineagePosCol)
      val classified = GraftMerge.classify(spark, m, tgt0, lineage, rebind)
      val (obsFrame, obs) = GraftMerge.observed(classified)
      val delta = obsFrame.where(col(GraftMerge.CatCol)
        .isin("updated", "deleted", "inserted"))
      lh.dml.mergeMorDf(fullName, delta, asOf, () => {
        val c = GraftMerge.counts(obs)
        // restricted frame never saw the carried rows — derive their
        // count from the snapshot's exact live-row accounting instead
        if (restricted.isDefined)
          c + ("carried" -> (snap.liveRows - c("updated") - c("deleted")))
        else c
      })
    }
    Array.empty
  }

  override def executeCollect(): Array[InternalRow] = result

  override protected def doExecute(): RDD[InternalRow] = {
    result
    sparkContext.emptyRDD
  }
}
