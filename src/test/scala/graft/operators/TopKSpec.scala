package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{SparkFixture, Tables}

class TopKSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("heap-pruned top-k equals the window form on lineitem") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
    val got = TopK.topKPerGroup(li, Seq("l_returnflag"),
      Seq(("l_quantity", false), ("l_orderkey", true), ("l_linenumber", true)),
      k = 7)
    val w = Window.partitionBy("l_returnflag")
      .orderBy(desc("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    val expect = li.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 7)
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("k larger than group size returns the whole group, ranked") {
    val df = Seq(("a", 3L), ("a", 1L), ("b", 9L)).toDF("g", "v")
    val got = TopK.topKPerGroup(df, Seq("g"), Seq(("v", true)), k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set(("a", 1L, 1), ("a", 3L, 2), ("b", 9L, 1)))
  }

  test("multi-column groups and null order keys (nulls first ascending)") {
    val df = Seq(
      ("x", 1, Some(5L)), ("x", 1, None), ("x", 1, Some(2L)),
      ("x", 2, Some(1L))).toDF("g1", "g2", "v")
    val got = TopK.topKPerGroup(df, Seq("g1", "g2"), Seq(("v", true)), k = 2)
      .select("g2", "v", "rnk")
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getInt(2))).toSet
    assert(got == Set((1, None, 1), (1, Some(2L), 2), (2, Some(1L), 1)))
  }

  test("non-comparable order columns are rejected at the driver, not mid-task") {
    val df = Seq(("a", Array[Byte](1, 2))).toDF("g", "b")
    val e = intercept[IllegalArgumentException] {
      TopK.topKPerGroup(df, Seq("g"), Seq(("b", true)), k = 1)
    }
    assert(e.getMessage.contains("heap prune"))
  }

  test("topFractionPerGroup equals the window-form reference") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
    val got = TopK.topFractionPerGroup(li, Seq("l_returnflag"),
      Seq(("l_quantity", false), ("l_orderkey", true), ("l_linenumber", true)),
      fraction = 0.1)
    val w = Window.partitionBy("l_returnflag")
      .orderBy(desc("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    val expect = li
      .withColumn("rnk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("l_returnflag")))
      .where(col("rnk") <= greatest(ceil(col("__n") * 0.1), lit(1)))
      .drop("__n")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("topFractionPerGroup keeps at least one row per non-empty group") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 9L)).toDF("g", "v")
    val got = TopK.topFractionPerGroup(df, Seq("g"), Seq(("v", true)),
      fraction = 0.01)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 1L), ("b", 9L)))
  }

  test("topFractionPerGroup runs in a single shuffle") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
    val plan = TopK.topFractionPerGroup(li, Seq("l_returnflag"),
      Seq(("l_quantity", false), ("l_orderkey", true), ("l_linenumber", true)),
      fraction = 0.25).queryExecution.executedPlan.toString
    val shuffles = "Exchange (hash|range|single)partitioning".r
      .findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles:\n$plan")
  }

  test("prune happens before the shuffle (MapPartitions below the Exchange)") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
    val plan = TopK.topKPerGroup(li, Seq("l_returnflag"),
      Seq(("l_quantity", false), ("l_orderkey", true), ("l_linenumber", true)),
      k = 3).queryExecution.executedPlan.toString
    val exchangeAt = plan.indexOf("Exchange hashpartitioning")
    val mapAt = plan.indexOf("MapPartitions")
    assert(exchangeAt >= 0 && mapAt >= 0, plan)
    // executedPlan prints top-down: the prune must be DEEPER (later in the
    // string) than the window's exchange — i.e. upstream of the shuffle
    assert(mapAt > exchangeAt,
      s"per-partition prune must run before the shuffle:\n$plan")
  }
}
