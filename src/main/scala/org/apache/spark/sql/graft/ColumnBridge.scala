package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column↔Expression converters — the standard
  * pattern for Spark extension libraries that define custom Catalyst
  * expressions (Spark 4 removed the public `Column.expr` / `new Column`). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** One leaf of a filter Column usable for manifest pruning: a comparison
    * (`op` ∈ =, <, <=, >, >=, normalized to attr-on-the-left), a null
    * check (`op` ∈ isnull, isnotnull, value = null), or a literal IN-list
    * (`op` = in, value = Seq of (rawValue, litType) pairs — one declared
    * type per element, since a parsed list may mix representations).
    * `litType` is the literal's Catalyst type when one is declared (e.g.
    * a `timestamp'…'` SQL literal) — a Long is micros only when litType
    * says so. Extracted from the Spark 4 ColumnNode AST, which is
    * `private[sql]` — hence here. */
  case class PredLeaf(field: String, op: String, value: Any,
      litType: Option[org.apache.spark.sql.types.DataType] = None)

  private def flip(op: String): String = op match {
    case "<" => ">" case "<=" => ">=" case ">" => "<" case ">=" => "<="
    case eq => eq
  }

  /** Flatten `filter`'s top-level AND chain and keep only the leaves of
    * shape `attr op literal` / `literal op attr` / null checks. Opaque
    * leaves (casts, functions, ORs, attr-vs-attr) are simply omitted —
    * callers must re-apply the full filter exactly. Handles all three
    * Column ASTs: the DSL's node tree, `expr("…")`'s unparsed SQL (parsed
    * here), and wrapped Catalyst expressions. */
  def prunableConjuncts(filter: Column): Seq[PredLeaf] = {
    import org.apache.spark.sql.internal.{ColumnNode, Literal => NodeLit, SqlExpression, UnresolvedAttribute => NodeAttr, UnresolvedFunction => NodeFn}
    def splitAnd(n: ColumnNode): Seq[ColumnNode] = n match {
      case f: NodeFn if f.functionName == "and" => f.arguments.flatMap(splitAnd)
      case other => Seq(other)
    }
    def name(a: NodeAttr): String = a.nameParts.mkString(".")
    splitAnd(filter.node).flatMap {
      case f: NodeFn => (f.functionName, f.arguments.toList) match {
        case (op @ ("=" | "<" | "<=" | ">" | ">="), List(l, r)) => (l, r) match {
          case (a: NodeAttr, v: NodeLit) if v.value != null =>
            Seq(PredLeaf(name(a), op, v.value, v.dataType))
          case (v: NodeLit, a: NodeAttr) if v.value != null =>
            Seq(PredLeaf(name(a), flip(op), v.value, v.dataType))
          case _ => Nil
        }
        case ("isNull", List(a: NodeAttr)) => Seq(PredLeaf(name(a), "isnull", null))
        case ("isNotNull", List(a: NodeAttr)) => Seq(PredLeaf(name(a), "isnotnull", null))
        case ("in", (a: NodeAttr) :: rest)
            if rest.nonEmpty && rest.forall {
              case v: NodeLit => v.value != null
              case _ => false
            } =>
          Seq(PredLeaf(name(a), "in",
            rest.collect { case v: NodeLit => (v.value, v.dataType) }))
        case _ => Nil
      }
      case s: SqlExpression =>
        try catalystLeaves(
          org.apache.spark.sql.catalyst.parser.CatalystSqlParser
            .parseExpression(s.expression))
        catch { case _: Exception => Nil }
      case e: org.apache.spark.sql.classic.ExpressionColumnNode =>
        catalystLeaves(e.expression)
      case _ => Nil
    }
  }

  /** [[prunableConjuncts]] over a Catalyst expression tree — public for the
    * SQL entry path, which extracts per-table filters from an OPTIMIZED
    * logical plan (conditions there are Catalyst expressions over
    * `AttributeReference`s, never Column nodes). */
  def catalystConjuncts(e: Expression): Seq[PredLeaf] = catalystLeaves(e)

  /** [[prunableConjuncts]] over a Catalyst expression tree (the shape
    * `expr("…")` parses to). */
  private def catalystLeaves(e: Expression): Seq[PredLeaf] = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    def split(x: Expression): Seq[Expression] = x match {
      case ce.And(l, r) => split(l) ++ split(r)
      case o => Seq(o)
    }
    def nameOf(x: Expression): Option[String] = x match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => Some(a.name)
      case a: ce.AttributeReference => Some(a.name)
      case _ => None
    }
    def mk(l: Expression, r: Expression, op: String): Seq[PredLeaf] = (l, r) match {
      case (a, ce.Literal(v, t)) if nameOf(a).isDefined && v != null =>
        Seq(PredLeaf(nameOf(a).get, op, v, Some(t)))
      case (ce.Literal(v, t), a) if nameOf(a).isDefined && v != null =>
        Seq(PredLeaf(nameOf(a).get, flip(op), v, Some(t)))
      case _ => Nil
    }
    split(e).flatMap {
      case ce.EqualTo(l, r) => mk(l, r, "=")
      case ce.LessThan(l, r) => mk(l, r, "<")
      case ce.LessThanOrEqual(l, r) => mk(l, r, "<=")
      case ce.GreaterThan(l, r) => mk(l, r, ">")
      case ce.GreaterThanOrEqual(l, r) => mk(l, r, ">=")
      case ce.IsNull(a) => nameOf(a).map(PredLeaf(_, "isnull", null)).toSeq
      case ce.IsNotNull(a) => nameOf(a).map(PredLeaf(_, "isnotnull", null)).toSeq
      case ce.In(a, list)
          if nameOf(a).isDefined && list.nonEmpty && list.forall {
            case ce.Literal(v, _) => v != null
            case _ => false
          } =>
        Seq(PredLeaf(nameOf(a).get, "in",
          list.collect { case ce.Literal(v, t) => (v, Some(t): Option[org.apache.spark.sql.types.DataType]) }))
      case ce.InSet(a, hset) if nameOf(a).isDefined && !hset.contains(null) =>
        // the optimizer's large-list form: element values are internal
        // representations in the CHILD's type
        Seq(PredLeaf(nameOf(a).get, "in",
          hset.toSeq.map(v => (v, Some(a.dataType): Option[org.apache.spark.sql.types.DataType]))))
      case _ => Nil
    }
  }
}
