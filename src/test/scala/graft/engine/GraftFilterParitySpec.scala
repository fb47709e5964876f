package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Parity contract for [[GraftSparkTable.toColumn]] — the `sources.Filter`
  * → Column translation the engine-read scan applies IN-PLAN
  * (`EngineReadScanBuilder.build`): because that `where()` runs in
  * addition to file skipping, an over-restrictive translation would drop
  * rows Spark's residual re-application cannot restore. This spec proves
  * translation parity with Catalyst semantics for EVERY supported Filter
  * shape by round-tripping Spark's OWN pushdown translation
  * (`DataSourceStrategy.translateFilter`, the same conversion the DSv2
  * planner performs) and comparing row sets on data with nulls and
  * coerced literal types. */
class GraftFilterParitySpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  // parquet-backed, NOT a LocalRelation: ConvertToLocalRelation would
  // otherwise evaluate the filter at optimization time and leave nothing
  // to translate (a vacuous test)
  private lazy val df = {
    val p = SparkFixture.tmpDir("graft-fps-").resolve("t").toString
    Seq(
      (Option(1L), Option("ab")),
      (Option(2L), None: Option[String]),
      (None: Option[Long], Option("b")),
      (Option(3L), Option("abc")),
      (Option(4L), Option(""))).toDF("x", "s").write.parquet(p)
    spark.read.parquet(p)
  }

  /** The resolved, optimized predicate Spark would hand to pushdown
    * translation for `df.where(c)`. */
  private def pushedExpr(c: Column) =
    df.where(c).asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition
      }

  private def rows(d: org.apache.spark.sql.DataFrame): Set[String] =
    d.collect().map(_.mkString("|")).toSet

  private val cases: Seq[(String, Column)] = Seq(
    "EqualTo" -> (col("x") === 2L),
    "EqualTo coerced int literal" -> (col("x") === 2),
    "EqualNullSafe" -> (col("x") <=> 2L),
    "GreaterThan" -> (col("x") > 1L),
    "GreaterThanOrEqual" -> (col("x") >= 2L),
    "LessThan" -> (col("x") < 3L),
    "LessThanOrEqual" -> (col("x") <= 2L),
    "In" -> col("x").isin(1L, 3L, 99L),
    "IsNull" -> col("x").isNull,
    "IsNotNull" -> col("x").isNotNull,
    "StringStartsWith" -> col("s").startsWith("a"),
    "StringEndsWith" -> col("s").endsWith("b"),
    "StringContains" -> col("s").contains("b"),
    "And" -> (col("x") >= 1L && col("s").isNotNull),
    "Or" -> (col("x") === 1L || col("s") === "b"),
    "Not" -> !(col("x") === 1L),
    "Not over string match (null semantics)" -> !col("s").startsWith("a"))

  test("toColumn round-trips Spark's own pushdown translation with " +
      "identical row sets for every supported Filter shape") {
    var exercised = 0
    val failures = cases.flatMap { case (name, c) =>
      pushedExpr(c) match {
        case None =>
          // the optimizer folded the filter away (nothing to push) —
          // nothing the scan could over-restrict
          None
        case Some(cond) =>
          org.apache.spark.sql.graft.FilterBridge.translate(cond) match {
            case None =>
              Some(s"$name: Spark itself cannot translate — would never " +
                "reach toColumn; fine, but flag for review")
            case Some(v1) =>
              GraftSparkTable.toColumn(v1) match {
                case None =>
                  // untranslatable filters are simply not applied in-plan
                  // (pushFilters keeps only translatable ones) — safe
                  None
                case Some(tc) =>
                  exercised += 1
                  val want = rows(df.where(c))
                  val got = rows(df.where(tc))
                  if (got != want)
                    Some(s"$name: filter $v1 -> rows $got, Catalyst " +
                      s"semantics -> $want")
                  else None
              }
          }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    assert(exercised >= cases.size - 2,
      s"only $exercised/${cases.size} shapes reached the row-set compare " +
        "— the round-trip went vacuous")
  }

  test("the in-plan where can never DROP rows the pushed filters keep: " +
      "translated conjunction is implied by the original predicate") {
    // the scan applies toColumn(pushed) where pushed ⊆ translatable
    // filters; spot-check that for a mixed predicate the applied subset
    // keeps a superset of the exact rows (residual re-application then
    // narrows exactly)
    val mixed = col("x") > 1L && abs(col("x")) < 3L // abs: untranslatable
    val cond = pushedExpr(mixed).get
    val parts = {
      // split the conjunction the way pushFilters sees it
      def split(e: org.apache.spark.sql.catalyst.expressions.Expression):
          Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
          split(l) ++ split(r)
        case o => Seq(o)
      }
      split(cond)
    }
    val translatable = parts
      .flatMap(p => org.apache.spark.sql.graft.FilterBridge.translate(p))
      .flatMap(f => GraftSparkTable.toColumn(f))
    val applied = translatable.reduce(_ && _)
    val exact = rows(df.where(mixed))
    val scanKept = rows(df.where(applied))
    assert(exact.subsetOf(scanKept),
      s"in-plan filter dropped exact rows: exact=$exact kept=$scanKept")
  }
}
