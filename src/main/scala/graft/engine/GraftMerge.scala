package graft.engine

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, UpdateAction}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge, DatasetBridge}

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
  * distributed DataFrame plan + one atomic overwrite commit through
  * [[graft.dml.Dml.mergeDf]] (validation + audit, like every other write
  * surface).
  *
  * Semantics (SQL standard / Spark MERGE):
  *  - clauses are evaluated FIRST-MATCH per row, in declaration order —
  *    a `when` chain, which short-circuits exactly that way;
  *  - a target row matched by MORE THAN ONE source row raises an error
  *    (nondeterministic update) — enforced by a window count over a
  *    per-target-row id, evaluated inside the same plan via
  *    `raise_error`, so the check costs no extra pass and no commit can
  *    land on ambiguous input;
  *  - unmatched target rows with no `NOT MATCHED BY SOURCE` clause (and
  *    matched rows with no applying clause) carry over unchanged;
  *    unmatched source rows with no applying INSERT clause are ignored.
  *
  * Scale shape: ONE full-outer join on the merge condition (shuffle or
  * broadcast by Catalyst's choice), a window partitioned by the unique
  * per-target-row id (near-uniform, never single-partition), then the
  * copy-on-write overwrite — the same commit shape as
  * [[graft.dml.Dml.upsert]], which is this operator's key-equality
  * special case. */
object GraftMerge {

  private val TP = "__graft_merge_t_present"
  private val SP = "__graft_merge_s_present"
  private val TID = "__graft_merge_tid"
  private val MC = "__graft_merge_match_count"

  /** Build (mergedRows, perRowCategory) frames for the command. Category
    * frame has one string column `c` ∈ updated/deleted/carried/inserted/
    * ignored for the audit counts. */
  def plan(spark: SparkSession, m: MergeIntoTable): (DataFrame, DataFrame) = {
    // WITH SCHEMA EVOLUTION needs the field-id alter path (IceTable
    // addColumn), which DSv2 TableChanges cannot carry — refuse loudly
    // rather than silently merging against the unevolved schema
    require(!m.withSchemaEvolution,
      "MERGE … WITH SCHEMA EVOLUTION is not supported: evolve the schema " +
        "through the engine API (IceTable.addColumn) first")
    val targetAttrs: Seq[Attribute] = m.targetTable.output
    val reserved = Seq(TP, SP, TID, MC)
    val clash = (m.targetTable.output ++ m.sourceTable.output)
      .map(_.name).toSet.intersect(reserved.toSet)
    require(clash.isEmpty, s"reserved merge column name in use: $clash")

    val tgt = DatasetBridge.ofRows(spark, m.targetTable)
      .withColumn(TP, lit(true))
      .withColumn(TID, monotonically_increasing_id())
    val src = DatasetBridge.ofRows(spark, m.sourceTable)
      .withColumn(SP, lit(true))
    val joined = tgt.join(src, ColumnBridge.column(m.mergeCondition),
      "full_outer")

    def condCol(a: MergeAction): Column =
      a.condition.map(ColumnBridge.column).getOrElse(lit(true))
    def attrCol(a: Attribute): Column = ColumnBridge.column(a)
    def assignedValue(a: MergeAction, attr: Attribute,
        default: Column): Column = a match {
      case u: UpdateAction =>
        u.assignments.find(_.key match {
          case ar: AttributeReference => ar.exprId == attr.exprId
          case _ => false
        }).map(asg => ColumnBridge.column(asg.value)).getOrElse(default)
      case i: InsertAction =>
        i.assignments.find(_.key match {
          case ar: AttributeReference => ar.exprId == attr.exprId
          case _ => false
        }).map(asg => ColumnBridge.column(asg.value)).getOrElse(default)
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
    val tSide = joined.where(col(TP).isNotNull)
      .withColumn(MC, count(col(SP)).over(Window.partitionBy(col(TID))))
    val keepT = when(col(MC) > 1,
      raise_error(lit("MERGE cardinality violation: a target row matched " +
        "more than one source row")).cast("boolean"))
      .otherwise(when(matched, chainKeep(m.matchedActions, lit(true)))
        .otherwise(chainKeep(m.notMatchedBySourceActions, lit(true))))
    def valT(attr: Attribute): Column =
      when(matched, chainValue(m.matchedActions, attr, attrCol(attr)))
        .otherwise(chainValue(m.notMatchedBySourceActions, attr,
          attrCol(attr)))
    val resT = tSide.where(keepT)
      .select(targetAttrs.map(a =>
        valT(a).cast(a.dataType).as(a.name)): _*)
    val catT = tSide.select(
      (when(matched, chainCat(m.matchedActions, lit("carried")))
        .otherwise(chainCat(m.notMatchedBySourceActions, lit("carried"))))
        .as("c"))

    // ---- source-only rows (NOT MATCHED) --------------------------------
    val sSide = joined.where(col(TP).isNull)
    val keepS = chainKeep(m.notMatchedActions, lit(false))
    def valS(attr: Attribute): Column =
      chainValue(m.notMatchedActions, attr, lit(null))
    val resS = sSide.where(keepS)
      .select(targetAttrs.map(a =>
        valS(a).cast(a.dataType).as(a.name)): _*)
    val catS = sSide.select(
      when(keepS, lit("inserted")).otherwise(lit("ignored")).as("c"))

    (resT.unionByName(resS), catT.unionByName(catS))
  }
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

/** Physical MERGE command: builds the merged-content plan and commits it
  * through Dml (validation + audit + one overwrite snapshot), all under
  * the table lock so the read-compute-overwrite cycle is atomic against
  * in-JVM writers. Runs nested Spark jobs from the driver — the
  * RunnableCommand pattern. */
case class GraftMergeExec(lh: graft.Lakehouse, fullName: String,
    m: MergeIntoTable) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil

  override def executeCollect(): Array[InternalRow] = {
    val spark = session.asInstanceOf[SparkSession]
    val (merged, cats) = GraftMerge.plan(spark, m)
    lh.dml.mergeDf(fullName, merged, {
      cats.groupBy("c").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    })
    Array.empty
  }

  override protected def doExecute(): RDD[InternalRow] = {
    executeCollect()
    sparkContext.emptyRDD
  }
}
