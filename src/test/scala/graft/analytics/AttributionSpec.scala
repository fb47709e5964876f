package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture
import java.sql.Timestamp

class AttributionSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def run(rows: Seq[(String, Timestamp, Long, String)],
      lookback: Long = 100L) =
    Attribution.lastTouch(
      rows.toDF("user_id", "t", "event_id", "etype"),
      "user_id", "t", "event_id", "etype", "click", "purchase", lookback)
      .collect()
      .map(r => r.getLong(1) -> (Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap

  test("credits the most recent click within the lookback") {
    val got = run(Seq(
      ("u", ts(0), 1L, "click"), ("u", ts(50), 2L, "click"),
      ("u", ts(60), 3L, "purchase"),       // → click 2, gap 10
      ("u", ts(200), 4L, "purchase")))     // click 2 is 150s old → none
    assert(got(3L) == ((Some(2L), Some(10L))))
    assert(got(4L) == ((None, None)))
  }

  test("a purchase with no preceding click is unattributed") {
    val got = run(Seq(
      ("u", ts(10), 1L, "purchase"), ("u", ts(20), 2L, "click"),
      ("u", ts(30), 3L, "purchase")))
    assert(got(1L) == ((None, None)))
    assert(got(3L) == ((Some(2L), Some(10L))))
  }

  test("a same-instant click matches with gap zero") {
    val got = run(Seq(
      ("u", ts(5), 1L, "click"), ("u", ts(5), 2L, "purchase")))
    assert(got(2L) == ((Some(1L), Some(0L))))
  }

  test("simultaneous clicks break ties by the tie column (latest id wins)") {
    val got = run(Seq(
      ("u", ts(5), 1L, "click"), ("u", ts(5), 7L, "click"),
      ("u", ts(9), 9L, "purchase")))
    assert(got(9L) == ((Some(7L), Some(4L))))
  }

  test("attribution never crosses users and ignores other event types") {
    val got = run(Seq(
      ("a", ts(0), 1L, "click"), ("b", ts(5), 2L, "purchase"),
      ("b", ts(1), 3L, "view"), ("b", ts(2), 4L, "click"),
      ("b", ts(3), 5L, "error")))
    assert(got(2L) == ((Some(4L), Some(3L))))
    assert(!got.contains(3L) && !got.contains(5L))
  }

  test("single shuffle: one Exchange hashpartitioning in the plan") {
    val df = (0 until 200).map(i =>
      (s"u${i % 5}", ts(i.toLong), i.toLong,
        if (i % 3 == 0) "click" else "purchase"))
      .toDF("user_id", "t", "event_id", "etype")
    val plan = Attribution.lastTouch(df, "user_id", "t", "event_id",
      "etype", "click", "purchase", 50L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("non-positive lookback is rejected") {
    intercept[IllegalArgumentException] {
      Attribution.lastTouch(Seq(("u", ts(0), 1L, "click"))
        .toDF("user_id", "t", "event_id", "etype"),
        "user_id", "t", "event_id", "etype", "click", "purchase", 0L)
    }
  }
}
