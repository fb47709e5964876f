package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class EmaSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def events = Seq(
    ("u1", 1L, 1L, 10.0), ("u1", 2L, 2L, 20.0), ("u1", 3L, 3L, 30.0),
    ("u2", 1L, 4L, 5.0), ("u2", 5L, 5L, -7.5),
    ("u3", 9L, 6L, 100.0)
  ).toDF("user_id", "ts", "event_id", "value")

  /** Reference: the closed-form term-by-term micro-quantized sum the
    * operator defines (exact contract), for α = 1 - 2^-m. */
  private def closedForm(xs: Seq[Double], m: Int): Long = {
    val alpha = 1.0 - 1.0 / (1L << m).toDouble
    val n = xs.size
    xs.zipWithIndex.map { case (x, i) =>
      val rn = i + 1
      val k = (n - rn).toLong * m
      if (k > 60) 0L
      else {
        val scaled = if (rn == 1) x else alpha * x
        math.round(scaled / (1L << k).toDouble * 1e6)
      }
    }.sum
  }

  test("matches the closed form per key (m=1)") {
    val got = Ema.dyadicEmaFinal(events, Seq("user_id"), "ts", "event_id",
      "value", m = 1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got("u1") == ((3L, closedForm(Seq(10.0, 20.0, 30.0), 1))))
    assert(got("u2") == ((2L, closedForm(Seq(5.0, -7.5), 1))))
    assert(got("u3") == ((1L, closedForm(Seq(100.0), 1))))
  }

  test("closed form tracks the sequential recurrence within n micro-units") {
    // sequential: ema_1 = x_1; ema_j = α x_j + (1-α) ema_{j-1}
    val xs = Seq(10.0, 20.0, 30.0)
    val seqEma = xs.tail.foldLeft(xs.head)((e, x) => 0.5 * x + 0.5 * e)
    val cf = closedForm(xs, 1)
    assert(math.abs(cf - math.round(seqEma * 1e6)) <= xs.size,
      s"closed form $cf vs sequential ${math.round(seqEma * 1e6)}")
  }

  test("result is invariant to input partitioning and row order") {
    val a = Ema.dyadicEmaFinal(events, Seq("user_id"), "ts", "event_id",
      "value", m = 2).collect().map(r => (r.getString(0), r.getLong(2))).toSet
    val b = Ema.dyadicEmaFinal(events.orderBy(rand(42)).repartition(7),
      Seq("user_id"), "ts", "event_id", "value", m = 2)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(a == b)
  }

  test("deep history underflows to exactly zero, not an error") {
    val long = spark.range(0, 200).select(lit("u").as("user_id"),
      col("id").as("ts"), col("id").as("event_id"), lit(1.0).as("value"))
    val got = Ema.dyadicEmaFinal(long, Seq("user_id"), "ts", "event_id",
      "value", m = 1).collect()(0)
    assert(got.getLong(1) == 200L)
    // EMA of a constant stream is the constant
    assert(math.abs(got.getLong(2) - 1000000L) <= 2, got.getLong(2).toString)
  }

  test("m outside [1,30] is rejected") {
    intercept[IllegalArgumentException] {
      Ema.dyadicEmaFinal(events, Seq("user_id"), "ts", "event_id", "value", 0)
    }
    intercept[IllegalArgumentException] {
      Ema.dyadicEmaFinal(events, Seq("user_id"), "ts", "event_id", "value", 31)
    }
  }
}
