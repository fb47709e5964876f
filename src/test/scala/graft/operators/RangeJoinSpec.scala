package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  // deterministic pseudo-random points/intervals (no RNG: hash-derived)
  private lazy val points = spark.range(0, 300)
    .select(col("id").as("pid"),
      (pmod(xxhash64(col("id")), lit(1000L)).cast("double") / 10.0 - 20.0)
        .as("v"))
  private lazy val intervals = spark.range(0, 40)
    .select(col("id").as("iid"),
      (pmod(xxhash64(col("id"), lit(1)), lit(900L)).cast("double") / 10.0 - 25.0)
        .as("lo"))
    .withColumn("hi", col("lo")
      + pmod(xxhash64(col("iid"), lit(2)), lit(300L)).cast("double") / 10.0)

  private def naive(inclusiveHi: Boolean) = {
    val cond = col("v") >= col("lo") &&
      (if (inclusiveHi) col("v") <= col("hi") else col("v") < col("hi"))
    points.join(intervals, cond)
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
  }

  private def banded(binWidth: Double, inclusiveHi: Boolean) =
    RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi",
      binWidth, inclusiveHi)
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq

  test("banded join equals the naive inequality join (negatives, odd widths)") {
    val expect = naive(inclusiveHi = false)
    assert(expect.nonEmpty, "fixture must produce matches")
    for (bw <- Seq(0.7, 5.0, 13.3, 500.0))
      assert(banded(bw, inclusiveHi = false) == expect, s"binWidth=$bw diverged")
  }

  test("inclusive upper bound honored") {
    assert(banded(7.0, inclusiveHi = true) == naive(inclusiveHi = true))
  }

  test("boundary exactness: point on lo kept, point on exclusive hi dropped") {
    val p = Seq((1L, 10.0), (2L, 20.0), (3L, 19.999999)).toDF("pid", "v")
    val iv = Seq((7L, 10.0, 20.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, "v", iv, "lo", "hi", binWidth = 4.0)
      .select("pid").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 3L))
  }

  test("plans as an equi-join — never nested-loop or cartesian") {
    val plan = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("interval overlap join equals naive inequality join, exactly once per pair") {
    val a = intervals.select(col("iid").as("a_id"),
      col("lo").as("a_lo"), col("hi").as("a_hi"))
    val b = spark.range(0, 35).select(col("id").as("b_id"),
        (pmod(xxhash64(col("id"), lit(7)), lit(800L)).cast("double") / 10.0
          - 15.0).as("b_lo"))
      .withColumn("b_hi", col("b_lo")
        + pmod(xxhash64(col("b_id"), lit(8)), lit(250L)).cast("double") / 10.0)
    val expect = a.join(b, col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(expect.nonEmpty)
    for (bw <- Seq(1.3, 8.0, 40.0, 900.0)) {
      val got = RangeJoin.intervalOverlapJoin(a, "a_lo", "a_hi",
        b, "b_lo", "b_hi", bw)
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      assert(got == expect, s"binWidth=$bw diverged (dup or missing pairs)")
    }
  }

  test("rejects nonpositive binWidth") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 0.0)
    }
  }
}
