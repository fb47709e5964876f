package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

import graft.text.TextExpressions._

/** SparkSessionExtensions registration so SQL users can call the custom
  * expressions directly:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions). ...
  * // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * spark.sql("SELECT graft_shingles(text, 3), graft_simhash(text) FROM docs")
  * }}}
  *
  * Functions: graft_shingles(text, n), graft_minhash(shingles, k),
  * graft_simhash(text), graft_marker_count(text, csvMarkers),
  * graft_dot(a, b).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def stringArg(e: Expression, what: String): String = e match {
    case Literal(s, org.apache.spark.sql.types.StringType) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  def apply(e: SparkSessionExtensions): Unit = {
    // SQL `MERGE INTO g.ns.t …` over GraftCatalog tables: planned by the
    // strategy below (Spark consults injected strategies before its own,
    // whose row-level-operation path requires a native BatchWrite)
    e.injectPlannerStrategy(_ => new graft.engine.GraftMergeStrategy)
    // SQL UPDATE (always) and subquery-conditioned DELETE (the shapes the
    // SupportsDelete push-down face refuses) over GraftCatalog tables
    e.injectPlannerStrategy(_ => new graft.engine.GraftRowLevelStrategy)
    // UPDATEs whose SET values carry CORRELATED subqueries are captured in
    // their analysis-time shape, before the optimizer pulls the
    // correlation up into a form only the DSv2 row-level rewrite could
    // reconstruct — the strategy above then re-optimizes the subquery
    // inside the engine's own read frames (the supported SELECT-list path)
    e.injectPostHocResolutionRule(sp =>
      new graft.engine.GraftCaptureUpdateRule(sp))
    // fallback-state (MoR / schema-history) catalog reads become the
    // engine's own COLUMNAR plan instead of the row-based V1 bridge —
    // builder-installed extensions only (the analyzer is immutable after
    // session build, so `register` below cannot add this; such sessions
    // keep the exact V1 fallback)
    e.injectResolutionRule(sp => new graft.engine.GraftEngineReadRule(sp))
    // per-QUERY-EXECUTION re-pin of engine-read substitutions: temp views
    // and frames composed over already-analyzed plans observe new commits
    // instead of serving the analysis-time snapshot forever
    e.injectPlanNormalizationRule(sp =>
      new graft.engine.GraftRefreshStaleReadRule(sp))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_shingles"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[Shingles].getName, "graft_shingles"),
        (args: Seq[Expression]) =>
          Shingles(args.head, if (args.size > 1) intArg(args(1), "n") else 3)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[MinHashSignature].getName, "graft_minhash"),
        (args: Seq[Expression]) =>
          MinHashSignature(args.head,
            if (args.size > 1) intArg(args(1), "k") else 128)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[SimHash64].getName, "graft_simhash"),
        (args: Seq[Expression]) => SimHash64(args.head)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_marker_count"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[MarkerCount].getName, "graft_marker_count"),
        (args: Seq[Expression]) =>
          MarkerCount(args.head,
            stringArg(args(1), "markers").split(',').toSeq)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[DotProduct].getName, "graft_dot"),
        (args: Seq[Expression]) => DotProduct(args.head, args(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_qdot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[IntDotProduct].getName, "graft_qdot"),
        (args: Seq[Expression]) => IntDotProduct(args.head, args(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bpe_tokens"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[BpeTokenCount].getName, "graft_bpe_tokens"),
        (args: Seq[Expression]) => BpeTokenCount(args.head)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_repetition"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[RepetitionRatio].getName, "graft_repetition"),
        (args: Seq[Expression]) =>
          RepetitionRatio(args.head,
            if (args.size > 1) intArg(args(1), "n") else 2)))
  }
}

object GraftExtensions {
  /** Register the functions + MERGE strategy on an already-built session
    * (e.g. tests, or the driver's plain SparkSession). Idempotent. */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[graft.engine.GraftMergeStrategy]))
      spark.experimental.extraStrategies =
        cur :+ new graft.engine.GraftMergeStrategy
    val cur2 = spark.experimental.extraStrategies
    if (!cur2.exists(_.isInstanceOf[graft.engine.GraftRowLevelStrategy]))
      spark.experimental.extraStrategies =
        cur2 :+ new graft.engine.GraftRowLevelStrategy
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_shingles",
      args => Shingles(args.head,
        args.lift(1).collect { case Literal(v: Int, _) => v }.getOrElse(3)),
      "built-in")
    reg.createOrReplaceTempFunction("graft_simhash",
      args => SimHash64(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash",
      args => MinHashSignature(args.head,
        args.lift(1).collect { case Literal(v: Int, _) => v }.getOrElse(128)),
      "built-in")
    reg.createOrReplaceTempFunction("graft_dot",
      args => DotProduct(args.head, args(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_bpe_tokens",
      args => BpeTokenCount(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_repetition",
      args => RepetitionRatio(args.head,
        args.lift(1).collect { case Literal(v: Int, _) => v }.getOrElse(2)),
      "built-in")
  }
}
