package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class ResampleSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  lazy val df = Seq(
    ("a", ts("2025-01-01 00:10:00"), 1.0),
    ("a", ts("2025-01-01 00:40:00"), 2.0),
    // a: hour 01 and 02 empty
    ("a", ts("2025-01-01 03:05:00"), 4.0),
    ("b", ts("2025-01-01 01:30:00"), 10.0)
    // b: hours 00, 02, 03 empty (span is global, not per-group)
  ).toDF("grp", "ts", "v")

  test("hourly gap fill: full global grid, zero-filled gaps, exact sums") {
    val got = Resample.gapFill(df, "grp", "ts", "v", "hour")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3))).toSet
    val expect = Set(
      ("a", "2025-01-01 00:00:00.0", 2L, 3.0),
      ("a", "2025-01-01 01:00:00.0", 0L, 0.0),
      ("a", "2025-01-01 02:00:00.0", 0L, 0.0),
      ("a", "2025-01-01 03:00:00.0", 1L, 4.0),
      ("b", "2025-01-01 00:00:00.0", 0L, 0.0),
      ("b", "2025-01-01 01:00:00.0", 1L, 10.0),
      ("b", "2025-01-01 02:00:00.0", 0L, 0.0),
      ("b", "2025-01-01 03:00:00.0", 0L, 0.0))
    assert(got == expect)
  }

  test("non-gap rows equal the plain aggregation") {
    val filled = Resample.gapFill(df, "grp", "ts", "v", "hour")
      .where(col("n") > 0)
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      .toSet
    val plain = df.groupBy(col("grp"), date_trunc("hour", col("ts")).as("b"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      .toSet
    assert(filled == plain)
  }

  test("day unit produces one bucket per day across the span") {
    val d2 = Seq(
      ("x", ts("2025-03-01 12:00:00"), 1.0),
      ("x", ts("2025-03-04 12:00:00"), 1.0)).toDF("grp", "ts", "v")
    val got = Resample.gapFill(d2, "grp", "ts", "v", "day")
    assert(got.count() == 4) // Mar 1..4 inclusive
    assert(got.where(col("n") === 0).count() == 2)
  }

  test("unsupported unit is rejected") {
    intercept[IllegalArgumentException] {
      Resample.gapFill(df, "grp", "ts", "v", "second")
    }
  }
}
