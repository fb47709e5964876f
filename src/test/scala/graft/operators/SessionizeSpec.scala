package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def ts(minutes: Long) = new Timestamp(minutes * 60 * 1000)

  test("gap sessionization: boundaries, counts and exact sums per key") {
    // user 1: events at 0, 10, 20 min (one session), then 60, 65 (second)
    // user 2: single event (its own session)
    val ev = Seq(
      (1L, 10L, ts(0), 1.5), (1L, 11L, ts(10), 2.5), (1L, 12L, ts(20), 3.0),
      (1L, 13L, ts(60), 1.0), (1L, 14L, ts(65), 4.0),
      (2L, 20L, ts(5), 7.25)
    ).toDF("user_id", "event_id", "ts", "value")
    val got = Sessionize.sessions(ev, "user_id", "ts", "event_id", "value",
      gapMicros = 30L * 60 * 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getTimestamp(3), r.getTimestamp(4), r.getDouble(5))))
      .toMap
    assert(got.keySet == Set((1L, 1L), (1L, 2L), (2L, 1L)))
    assert(got((1L, 1L)) == ((3L, ts(0), ts(20), 7.0)))
    assert(got((1L, 2L)) == ((2L, ts(60), ts(65), 5.0)))
    assert(got((2L, 1L)) == ((1L, ts(5), ts(5), 7.25)))
  }

  test("a gap of exactly the threshold does NOT split; one microsecond more does") {
    val boundary = Seq(
      (1L, 1L, ts(0), 1.0), (1L, 2L, ts(30), 1.0),          // gap == 30 min
      (2L, 3L, ts(0), 1.0),
      (2L, 4L, new Timestamp(30L * 60 * 1000 + 1), 1.0))    // 30 min + 1 ms
      .toDF("user_id", "event_id", "ts", "value")
    val sess = Sessionize.sessions(boundary, "user_id", "ts", "event_id",
      "value", gapMicros = 30L * 60 * 1000000)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sess == Map(1L -> 1L, 2L -> 2L))
  }
}
