package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Analyzer rule that substitutes a FALLBACK-STATE graft DSv2 relation —
  * a snapshot carrying merge-on-read delete state or rename/retype/
  * drop-re-add schema history — with the engine's own analyzed read plan,
  * re-aliased onto the relation's output exprIds.
  *
  * Why: such snapshots cannot be a plain parquet file scan, so without
  * this rule they ride [[EngineReadScanBuilder]]'s `V1Scan` bridge —
  * correct, but row-based at the scan boundary (no columnar batches, no
  * codegen fusion across it; measured 9-14% on wide aggregates at sf0.1,
  * tools/MorReadProf). Substituting the LOGICAL plan instead makes the
  * delete anti-joins and field-id projections part of the query's own
  * plan: Catalyst pushes the query's filters through them into the
  * columnar parquet scans (row-group pushdown AND manifest/partition/
  * bloom file skipping via the GraftFileIndex `listFiles` hook), and
  * whole-stage codegen spans the subtree. The V1 bridge stays behind as
  * the exact fallback for sessions built without the graft extensions.
  *
  * Never rewrites a WRITE TARGET relation: `MERGE INTO` (planned by
  * [[GraftMergeStrategy]] off the target's scan relation), `DELETE FROM` /
  * `UPDATE` (routed through the table's SupportsDelete face), and V2
  * writes (`INSERT INTO`/`REPLACE WHERE`) all identify the table through
  * that node — only READ-side occurrences (including the SOURCE side of a
  * MERGE) are substituted.
  *
  * Substitution runs once per relation (the DSv2 node disappears), pins
  * the snapshot at analysis time (same contract as the scan builders),
  * and mints fresh exprIds per occurrence, so self-joins of the same
  * table stay unambiguous. Disable with
  * `spark.graft.engineReadSubstitution=false`.
  */
class GraftEngineReadRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.engineReadSubstitution", "true")
        .toBoolean) return plan
    if (!plan.exists {
      case r: DataSourceV2Relation => r.table.isInstanceOf[GraftSparkTable]
      case _ => false
    }) return plan
    // write-target relations by OBJECT IDENTITY — the same table read
    // elsewhere in the same plan (e.g. a MERGE whose source selects from
    // its own target) must still substitute
    val protectedRels = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    def protect(p: LogicalPlan): Unit = p.foreach {
      case r: DataSourceV2Relation => protectedRels.add(r); ()
      case _ => ()
    }
    plan.foreach {
      case m: MergeIntoTable => protect(m.targetTable)
      case d: DeleteFromTable => protect(d.table)
      case u: UpdateTable => protect(u.table)
      case w: V2WriteCommand => protect(w.table)
      // the PRE-conversion INSERT shape: until ResolveInsertInto rewrites
      // it to a V2WriteCommand (which requires the query side resolved),
      // the write target sits under InsertIntoStatement — substituting it
      // in an earlier iteration would break the INSERT's own pattern match
      case i: InsertIntoStatement => protect(i.table)
      case _ => ()
    }
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation if !protectedRels.contains(r) =>
        r.table match {
          case t: GraftSparkTable => substituted(t, r).getOrElse(r)
          case _ => r
        }
    }
  }

  // clean tables never substitute but the analyzer re-runs this rule to
  // fixpoint — cache the per-relation decision by object identity so the
  // table-log probe (engineReadState → snapshot read) happens once per
  // relation per analysis, not once per iteration. Weak keys: entries die
  // with the plan. None-valued entries are the point (the "clean" answer).
  private val decided = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DataSourceV2Relation, Option[LogicalPlan]]())

  private def substituted(t: GraftSparkTable, r: DataSourceV2Relation)
      : Option[LogicalPlan] = {
    val cached = decided.get(r)
    if (cached != null) return cached
    val out = r.output
    val result = t.engineReadState.map { case (tbl, snap) =>
      val child = org.apache.spark.sql.graft.DatasetBridge
        .analyzed(tbl.readSnapshot(Some(snap)))
      val byName = child.output.map(a => a.name -> a).toMap
      // alias onto the relation's exprIds: everything above the relation
      // (already-resolved references, later-resolved ones) keeps binding
      val aliases: Seq[NamedExpression] = out.map(o =>
        Alias(byName(o.name), o.name)(exprId = o.exprId))
      Project(aliases, child): LogicalPlan
    }
    decided.put(r, result)
    result
  }
}
