package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def rankMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("two-node symmetric cycle converges to uniform; mass sums to 1") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    val r = rankMap(PageRank.ranks(edges, "src", "dst", "w", iters = 5))
    assert(math.abs(r("a") - 0.5) < 1e-12)
    assert(math.abs(r("b") - 0.5) < 1e-12)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("one iteration matches the hand formula, with dangling mass") {
    // a -> b, b -> c, c has no out-edges (dangling). N=3.
    // r0 = 1/3 each; dangling mass = 1/3.
    // r1(x) = 0.15/3 + 0.85*(contrib(x) + (1/3)/3)
    //   contrib(b) = contrib(c) = 1/3, contrib(a) = 0
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L)).toDF("src", "dst", "w")
    val r = rankMap(PageRank.ranks(edges, "src", "dst", "w", iters = 1))
    val base = 0.15 / 3 + 0.85 * (1.0 / 3 / 3)
    assert(math.abs(r("a") - base) < 1e-12)
    assert(math.abs(r("b") - (base + 0.85 / 3)) < 1e-12)
    assert(math.abs(r("c") - (base + 0.85 / 3)) < 1e-12)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("weights matter: heavier edge pulls more rank") {
    // hub h splits 3:1 between x and y; x,y cycle back to h
    val edges = Seq(("h", "x", 3L), ("h", "y", 1L),
      ("x", "h", 1L), ("y", "h", 1L)).toDF("src", "dst", "w")
    val r = rankMap(PageRank.ranks(edges, "src", "dst", "w", iters = 10))
    assert(r("x") > r("y"))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    // stationary ratio of x:y inflow is 3:1 on the damped walk
    val expectedGap = (r("x") - r("y")) / r("h")
    assert(expectedGap > 0.3 && expectedGap < 0.5) // 0.85 * (3/4 - 1/4) = 0.425
  }

  test("parallel edges accumulate weight like a single summed edge") {
    val par = Seq(("h", "x", 1L), ("h", "x", 2L), ("h", "y", 1L),
      ("x", "h", 1L), ("y", "h", 1L)).toDF("src", "dst", "w")
    val merged = Seq(("h", "x", 3L), ("h", "y", 1L),
      ("x", "h", 1L), ("y", "h", 1L)).toDF("src", "dst", "w")
    val rp = rankMap(PageRank.ranks(par, "src", "dst", "w", iters = 4))
    val rm = rankMap(PageRank.ranks(merged, "src", "dst", "w", iters = 4))
    rm.foreach { case (k, v) => assert(math.abs(rp(k) - v) < 1e-12) }
  }
}
