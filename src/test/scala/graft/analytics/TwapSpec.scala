package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture
import java.sql.Timestamp

class TwapSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("hand-computed holding durations and mass") {
    // u1: 10.0 held 60s, 20.0 held 30s, 5.0 terminal (0s)
    val df = Seq(
      ("u1", ts(0), 1L, 10.0), ("u1", ts(60), 2L, 20.0),
      ("u1", ts(90), 3L, 5.0),
      ("u2", ts(10), 4L, 7.5)
    ).toDF("user_id", "t", "event_id", "value")
    val got = Twap.timeWeighted(df, Seq("user_id"), "t", "event_id", "value")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("u1") == ((3L, 10000000L * 60 + 20000000L * 30, 90L)))
    assert(got("u2") == ((1L, 0L, 0L))) // single observation: zero mass
  }

  test("twap equals the plain average when observations are equally spaced") {
    val df = (0 until 10).map(i => ("u", ts(i * 5L), i.toLong, (i + 1).toDouble))
      .toDF("user_id", "t", "event_id", "value")
    val r = Twap.timeWeighted(df, Seq("user_id"), "t", "event_id", "value")
      .collect()(0)
    // last value is excluded (zero duration): mean of 1..9 = 5
    assert(r.getLong(2).toDouble / r.getLong(3) / 1e6 == 5.0)
  }

  test("invariant to input partitioning and row order") {
    val df = (0 until 200).map(i =>
      (s"u${i % 7}", ts(i * 13L % 997), i.toLong, (i * 31 % 17).toDouble))
      .toDF("user_id", "t", "event_id", "value")
    def run(d: org.apache.spark.sql.DataFrame) =
      Twap.timeWeighted(d, Seq("user_id"), "t", "event_id", "value")
        .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
    assert(run(df) == run(df.orderBy(rand(3)).repartition(11)))
  }

  test("simultaneous observations (same second) contribute zero duration") {
    val df = Seq(("u", ts(5), 1L, 100.0), ("u", ts(5), 2L, 3.0),
      ("u", ts(65), 3L, 1.0)).toDF("user_id", "t", "event_id", "value")
    val r = Twap.timeWeighted(df, Seq("user_id"), "t", "event_id", "value")
      .collect()(0)
    // 100.0 held 0s (tie), 3.0 held 60s, 1.0 terminal
    assert(r.getLong(2) == 3000000L * 60)
    assert(r.getLong(3) == 60L)
  }
}
