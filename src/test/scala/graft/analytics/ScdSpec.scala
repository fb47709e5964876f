package graft.analytics

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class ScdSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  lazy val log = Seq(
    // user 1: gold -> gold (collapse) -> silver -> gold
    (1L, ts("2025-01-01 00:00:00"), 1L, "gold"),
    (1L, ts("2025-01-02 00:00:00"), 2L, "gold"),
    (1L, ts("2025-01-03 00:00:00"), 3L, "silver"),
    (1L, ts("2025-01-04 00:00:00"), 4L, "gold"),
    // user 2: single observation
    (2L, ts("2025-01-01 12:00:00"), 5L, "bronze")
  ).toDF("user_id", "ts", "event_id", "tier")

  test("runs collapse; intervals chain; last row per key is current") {
    val h = Scd.scd2(log, Seq("user_id"), "ts", "event_id", Seq("tier"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4))).toSet
    val expect = Set(
      (1L, "gold", ts("2025-01-01 00:00:00"),
        Some(ts("2025-01-03 00:00:00")), false),
      (1L, "silver", ts("2025-01-03 00:00:00"),
        Some(ts("2025-01-04 00:00:00")), false),
      (1L, "gold", ts("2025-01-04 00:00:00"), None, true),
      (2L, "bronze", ts("2025-01-01 12:00:00"), None, true))
    assert(h == expect)
  }

  test("asOf returns each key's state at a point in time") {
    val h = Scd.scd2(log, Seq("user_id"), "ts", "event_id", Seq("tier"))
    val at = Scd.asOf(h, lit(ts("2025-01-03 06:00:00")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(at == Map(1L -> "silver", 2L -> "bronze"))
    val before = Scd.asOf(h, lit(ts("2024-12-31 00:00:00")))
    assert(before.count() == 0)
  }

  test("a change in ANY tracked attribute opens a new interval") {
    val multi = Seq(
      (1L, ts("2025-01-01 00:00:00"), 1L, "gold", "us"),
      (1L, ts("2025-01-02 00:00:00"), 2L, "gold", "eu"), // region changed
      (1L, ts("2025-01-03 00:00:00"), 3L, "gold", "eu")  // unchanged
    ).toDF("user_id", "ts", "event_id", "tier", "region")
    val h = Scd.scd2(multi, Seq("user_id"), "ts", "event_id",
      Seq("tier", "region"))
    assert(h.count() == 2)
    assert(h.where(col("is_current")).select("region").head.getString(0) == "eu")
  }

  test("both windows share one shuffle (single Exchange on the key)") {
    val plan = Scd.scd2(log, Seq("user_id"), "ts", "event_id", Seq("tier"))
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected one key shuffle:\n$plan")
  }
}
