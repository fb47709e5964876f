package graft.engine

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, ExprId, Expression, Literal, OuterReference, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.graft.{ColumnBridge, DatasetBridge, FilterBridge}

/** SQL `UPDATE` and subquery-conditioned `DELETE` for graft tables — the
  * two row-level statements Spark's own planning cannot serve here:
  *
  *  - `UpdateTable` has NO built-in executor at all without the DSv2
  *    `SupportsRowLevelOperations` rewrite (which requires a native
  *    executor-side BatchWrite; graft's commit protocol is
  *    driver-orchestrated), so `UPDATE cat.ns.t SET … WHERE …` errored;
  *  - `DeleteFromTable` whose condition cannot push as `sources.Filter`
  *    (`WHERE k IN (SELECT …)`, correlated `EXISTS`, scalar functions) was
  *    refused by the `SupportsDelete` face (`canDeleteWhere`,
  *    [[GraftSparkTable]]) — deliberately, never partially applied.
  *
  * Like [[GraftMergeStrategy]], a planner strategy (consulted BEFORE
  * Spark's own strategies) claims the fully-ANALYZED command and executes
  * it through [[graft.dml.Dml]] — same validation, audit, table lock and
  * `write.update.mode`/`write.delete.mode` routing as every other write
  * surface. Pushable plain DELETEs keep riding the proven
  * `SupportsDelete` path; this strategy claims only what that path
  * refuses (plus every UPDATE).
  *
  * Subquery conditions work by REBINDING, not re-resolution: the
  * command's condition/assignment expressions are kept fully analyzed
  * (subquery plans intact — uncorrelated `IN`, correlated `EXISTS`/
  * scalar subqueries all ride Spark's own subquery planning), and only
  * the target table's `AttributeReference`s are swapped for the
  * same-named attributes of whatever frame the engine machinery actually
  * reads — including OUTER references inside subquery plans
  * ([[GraftRowLevel.rebinder]]). The merge-on-read paths stage matches in
  * one pass (O(touched) position-delete + append); copy-on-write runs
  * RUNTIME victim discovery ([[graft.core.IceTable.rewriteWhereCowBy]]),
  * so either mode touches only the files that hold matching rows — a
  * subquery delete against a 100 TB table never rewrites the table.
  * (Reference semantics: `update_rows`/`delete_rows`,
  * catalog.py:632-831.)
  */
object GraftRowLevel {

  def hasSubquery(e: Expression): Boolean =
    e.exists(_.isInstanceOf[SubqueryExpression])

  /** Deterministic through subquery plans too — `Expression.deterministic`
    * does not inspect a subquery's inner plan. Mutually recursive with the
    * plan check so a subquery nested inside ANOTHER subquery's plan (e.g.
    * `WHERE k IN (SELECT k FROM s WHERE v < (SELECT rand()))`) is caught
    * at any depth, not just the first level. */
  def fullyDeterministic(e: Expression): Boolean = {
    def exprOk(x: Expression): Boolean =
      x.deterministic && !x.exists {
        case s: SubqueryExpression => !planOk(s.plan)
        case _ => false
      }
    def planOk(p: LogicalPlan): Boolean =
      !p.exists(_.expressions.exists(x => !exprOk(x)))
    exprOk(e)
  }

  /** Expression rebinder `cmd attrs → df attrs` by NAME: swaps the
    * command relation's references for the given frame's, descending into
    * subquery plans so correlated OUTER references follow the target
    * frame as well. Everything stays RESOLVED — the rebound expression
    * drops into `df.where`/`df.select` without re-analysis risk. */
  def rebinder(cmdOutput: Seq[Attribute], df: DataFrame)
      : Expression => Expression = {
    val byName = DatasetBridge.output(df).map(a => a.name -> a).toMap
    val mapping: Map[ExprId, Attribute] =
      cmdOutput.flatMap(o => byName.get(o.name).map(o.exprId -> _)).toMap
    // OuterReference is a LEAF expression (its wrapped attribute is a
    // plain field, not a TreeNode child) — transforms never descend into
    // it, so the analysis-time correlation shape `outer(attr)` needs its
    // own case or the inner attribute silently keeps the command's exprId
    def rebindExpr(e: Expression): Expression = e.transformDown {
      case OuterReference(ar: AttributeReference)
          if mapping.contains(ar.exprId) =>
        OuterReference(mapping(ar.exprId))
      case ar: AttributeReference if mapping.contains(ar.exprId) =>
        mapping(ar.exprId)
      case s: SubqueryExpression => s.withNewPlan(rebindPlan(s.plan))
    }
    def rebindPlan(p: LogicalPlan): LogicalPlan = p.transformDown {
      case node => node.transformExpressions {
        case OuterReference(ar: AttributeReference)
            if mapping.contains(ar.exprId) =>
          OuterReference(mapping(ar.exprId))
        case ar: AttributeReference if mapping.contains(ar.exprId) =>
          mapping(ar.exprId)
        case s: SubqueryExpression => s.withNewPlan(rebindPlan(s.plan))
      }
    }
    rebindExpr
  }

  /** Human-readable condition for the audit log. */
  def describe(e: Expression): String =
    (try e.sql catch { case _: Throwable => e.toString }).take(500)

  /** The graft DSv2 table under a command's target relation, if any. */
  def graftTable(p: LogicalPlan): Option[GraftSparkTable] = p match {
    case SubqueryAlias(_, child) => graftTable(child)
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSparkTable] =>
      Some(r.table.asInstanceOf[GraftSparkTable])
    case r: DataSourceV2ScanRelation
        if r.relation.table.isInstanceOf[GraftSparkTable] =>
      Some(r.relation.table.asInstanceOf[GraftSparkTable])
    case _ => None
  }
}

/** Planner strategy claiming analyzed UPDATE (always) and DELETE (only
  * when the `SupportsDelete` push-down path cannot serve it) over graft
  * tables. Anything else returns Nil so Spark's own planning proceeds. */
class GraftRowLevelStrategy extends SparkStrategy {

  private def graftTable(p: LogicalPlan): Option[GraftSparkTable] =
    GraftRowLevel.graftTable(p)

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // analysis-time capture ([[GraftCaptureUpdateRule]]): the stored
    // command's subqueries are still in their analyzed correlated form,
    // which rebinds + re-optimizes cleanly inside the engine's frames
    case c: GraftCapturedUpdate => graftTable(c.captured.u.table) match {
      case Some(t) => Seq(GraftUpdateExec(t.lakehouse, t.fullIdent,
        t.isPinned, c.captured.u, preOptimized = true))
      case None => Nil
    }
    case u: UpdateTable => graftTable(u.table) match {
      case Some(t) => Seq(GraftUpdateExec(t.lakehouse, t.fullIdent,
        t.isPinned, u))
      case None => Nil
    }
    case d: DeleteFromTable => graftTable(d.table) match {
      // claim exactly the complement of the SupportsDelete face: a fully
      // source.Filter-translatable condition keeps its proven DSv2 route
      case Some(t) if FilterBridge.translate(d.condition).isEmpty =>
        Seq(GraftDeleteExec(t.lakehouse, t.fullIdent, t.isPinned, d))
      case _ => Nil
    }
    case _ => Nil
  }
}

/** Physical `UPDATE cat.ns.t SET … [WHERE …]` command: routes the
  * analyzed assignments + condition through [[graft.dml.Dml.updateBy]]
  * (validation + audit + ONE atomic snapshot; `write.update.mode` picks
  * MoR position-delete+append or partial copy-on-write). Memoized like
  * [[GraftMergeExec]] — a re-executed plan can never update twice. */
case class GraftUpdateExec(lh: graft.Lakehouse, fullName: String,
    pinned: Boolean, u: UpdateTable, preOptimized: Boolean = false)
    extends LeafExecNode {
  override def output: Seq[Attribute] = Nil

  private lazy val result: Array[InternalRow] = {
    require(!pinned, s"table $fullName is pinned to a VERSION/TIMESTAMP " +
      "AS OF snapshot — time-travel reads are immutable")
    val cmdOut = u.table.output
    val cond: Expression = u.condition.getOrElse(Literal.TrueLiteral)
    require(GraftRowLevel.fullyDeterministic(cond) &&
      u.assignments.forall(a => GraftRowLevel.fullyDeterministic(a.value)),
      "UPDATE with a nondeterministic condition or assignment is not " +
        "supported")
    // a CORRELATED subquery in a SET value cannot survive the optimizer
    // round trip: PullupCorrelatedPredicates has already rewritten the
    // command's subquery into its pulled-up (join-condition) form, which
    // only the row-level-operation rewrite knows how to reconstruct.
    // With builder extensions, [[GraftCaptureUpdateRule]] intercepts such
    // commands BEFORE the optimizer (`preOptimized = true` here) — their
    // analysis-time subquery shape rebinds and re-optimizes cleanly, so
    // they execute. Only a `register`-wired session (immutable analyzer,
    // no capture rule) still sees the pulled-up shape — refuse loudly
    // rather than re-inject an invalid plan.
    if (!preOptimized) u.assignments.foreach(a => a.value.foreach {
      case s: SubqueryExpression if s.getOuterAttrs.nonEmpty =>
        throw new UnsupportedOperationException(
          "correlated subquery in an UPDATE SET value needs the " +
            "builder-installed extensions " +
            "(spark.sql.extensions=graft.GraftExtensions) — or express " +
            "the update as MERGE INTO instead")
      case _ => ()
    })
    val schema = lh.catalog.loadTable(fullName).schema
    val sets: Seq[(String, Expression)] = u.assignments.map { a =>
      a.key match {
        case ar: AttributeReference if cmdOut.exists(_.exprId == ar.exprId) =>
          ar.name -> a.value
        case k => throw new UnsupportedOperationException(
          s"UPDATE SET key '${GraftRowLevel.describe(k)}' does not " +
            "resolve to a top-level target column (nested-field " +
            "assignments are not supported — update the whole struct " +
            "column instead)")
      }
    }
    require(sets.map(_._1).distinct.size == sets.size,
      "duplicate column in SET clause")
    val condOf: DataFrame => Column =
      df => ColumnBridge.column(GraftRowLevel.rebinder(cmdOut, df)(cond))
    val setsOf: DataFrame => Map[String, Column] = df => {
      val rb = GraftRowLevel.rebinder(cmdOut, df)
      sets.map { case (n, v) =>
        n -> ColumnBridge.column(rb(v)).cast(schema(n).dataType)
      }.toMap
    }
    lh.dml.updateBy(fullName, ColumnBridge.column(cond), condOf, setsOf,
      GraftRowLevel.describe(cond))
    Array.empty
  }

  override def executeCollect(): Array[InternalRow] = result

  override protected def doExecute(): RDD[InternalRow] = {
    result
    sparkContext.emptyRDD
  }
}

/** Physical subquery-conditioned `DELETE FROM cat.ns.t WHERE …` command
  * (the shapes `canDeleteWhere` refuses): routes through
  * [[graft.dml.Dml.deleteBy]]. Memoized like [[GraftMergeExec]]. */
case class GraftDeleteExec(lh: graft.Lakehouse, fullName: String,
    pinned: Boolean, d: DeleteFromTable) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil

  private lazy val result: Array[InternalRow] = {
    require(!pinned, s"table $fullName is pinned to a VERSION/TIMESTAMP " +
      "AS OF snapshot — time-travel reads are immutable")
    val cmdOut = d.table.output
    val cond = d.condition
    require(GraftRowLevel.fullyDeterministic(cond),
      "DELETE with a nondeterministic condition is not supported")
    val condOf: DataFrame => Column =
      df => ColumnBridge.column(GraftRowLevel.rebinder(cmdOut, df)(cond))
    lh.dml.deleteBy(fullName, ColumnBridge.column(cond), condOf,
      GraftRowLevel.describe(cond))
    Array.empty
  }

  override def executeCollect(): Array[InternalRow] = result

  override protected def doExecute(): RDD[InternalRow] = {
    result
    sparkContext.emptyRDD
  }
}
