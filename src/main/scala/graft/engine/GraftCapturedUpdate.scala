package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Command, LeafNode, LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opaque (deliberately non-`Product`) box around a fully-ANALYZED
  * `UpdateTable`. Catalyst tree transforms discover a node's children and
  * expressions by reflecting over its constructor `Product` fields — a
  * plain class field is invisible to that machinery, so the optimizer can
  * neither descend into the captured command nor rewrite its subquery
  * expressions. That invisibility is the point: see
  * [[GraftCaptureUpdateRule]]. */
final class AnalyzedUpdate(val u: UpdateTable) {
  override def toString: String =
    s"AnalyzedUpdate(sets=${u.assignments.size}, " +
      s"where=${u.condition.isDefined})"
}

/** Leaf command carrying an analyzed `UPDATE` whose SET values contain
  * CORRELATED subqueries, frozen in its analysis-time shape.
  *
  * Why freezing is necessary: the optimizer's PullupCorrelatedPredicates
  * rewrites every correlated subquery in the plan — including inside DML
  * commands — into its pulled-up (join-condition) form, which only
  * Spark's own DSv2 row-level-operation rewrite (requiring a native
  * executor-side BatchWrite) knows how to reconstruct. Re-injecting that
  * pulled-up shape into the engine's internal frames is invalid. The
  * analysis-time shape, by contrast, is exactly what a correlated scalar
  * subquery in a SELECT list looks like — rebound onto the engine's read
  * frame ([[GraftRowLevel.rebinder]] follows OUTER references), each
  * internal `df.select` re-optimizes it through Spark's own
  * decorrelation, the supported path. */
case class GraftCapturedUpdate(captured: AnalyzedUpdate)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** Post-hoc resolution rule (runs once, after the plan is fully resolved,
  * BEFORE the optimizer): captures `UPDATE` commands over graft tables
  * whose SET values carry correlated subqueries into
  * [[GraftCapturedUpdate]], so [[GraftRowLevelStrategy]] receives the
  * analysis-time expression shapes instead of the optimizer's pulled-up
  * ones. Every other UPDATE keeps the proven direct path. Builder-installed
  * extensions only (`spark.sql.extensions=graft.GraftExtensions`) — a
  * session wired via `GraftExtensions.register` has an immutable analyzer,
  * no rule, and keeps the loud refusal. */
class GraftCaptureUpdateRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u: UpdateTable
        if u.resolved && GraftRowLevel.graftTable(u.table).isDefined &&
          u.assignments.exists(a => a.value.exists {
            case s: SubqueryExpression => s.getOuterAttrs.nonEmpty
            case _ => false
          }) =>
      GraftCapturedUpdate(new AnalyzedUpdate(u))
    case _ => plan
  }
}
