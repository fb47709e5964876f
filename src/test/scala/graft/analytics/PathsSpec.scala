package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture
import java.sql.Timestamp

class PathsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("paths assemble in (ts, tie) order and count across keys") {
    val df = Seq(
      (1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "b"), (1L, ts(3), 3L, "c"),
      (2L, ts(5), 4L, "a"), (2L, ts(6), 5L, "b"), (2L, ts(7), 6L, "c"),
      (3L, ts(1), 7L, "b"), (3L, ts(0), 8L, "a")
    ).toDF("user_id", "t", "event_id", "etype")
    val got = Paths.topPaths(df, "user_id", "t", "event_id", "etype", 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a>b>c" -> 2L, "a>b" -> 1L))
  }

  test("simultaneous events order by the tie column") {
    val df = Seq((1L, ts(5), 9L, "late"), (1L, ts(5), 2L, "early"))
      .toDF("user_id", "t", "event_id", "etype")
    val got = Paths.topPaths(df, "user_id", "t", "event_id", "etype", 5)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("early>late"))
  }

  test("maxLen caps the path, protecting against unbounded keys") {
    val df = (0 until 100).map(i => (1L, ts(i.toLong), i.toLong, s"e$i"))
      .toDF("user_id", "t", "event_id", "etype")
    val got = Paths.topPaths(df, "user_id", "t", "event_id", "etype",
      k = 5, maxLen = 3)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("e0>e1>e2"))
  }

  test("top-k orders by count desc then path, and is partition-invariant") {
    val df = (0 until 60).map { i =>
      val et = if (i % 3 == 0) "x" else "y"
      (i.toLong, ts(1), i.toLong, et)
    }.toDF("user_id", "t", "event_id", "etype")
    def run(d: org.apache.spark.sql.DataFrame) =
      Paths.topPaths(d, "user_id", "t", "event_id", "etype", 1)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(run(df) == Seq(("y", 40L)))
    assert(run(df) == run(df.repartition(7)))
  }
}
