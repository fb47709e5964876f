package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class IntervalsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long, Long)]) =
    Intervals.coalesce(rows.toDF("k", "s", "e", "id"),
      Seq("k"), "s", "e", "id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

  test("overlapping and touching intervals merge; gaps split") {
    val got = run(Seq(
      ("u", 0L, 10L, 1L), ("u", 5L, 20L, 2L),   // overlap -> [0,20]
      ("u", 20L, 30L, 3L),                       // touching -> [0,30]
      ("u", 40L, 50L, 4L)))                      // gap -> own span
    assert(got == Set(("u", 1L, 0L, 30L, 3L), ("u", 2L, 40L, 50L, 1L)))
  }

  test("an interval swallowed by a longer predecessor does not reopen") {
    // [0,100] then [10,20] then [30,40]: cummax keeps 100, all one span
    val got = run(Seq(("u", 0L, 100L, 1L), ("u", 10L, 20L, 2L),
      ("u", 30L, 40L, 3L), ("u", 150L, 160L, 4L)))
    assert(got == Set(("u", 1L, 0L, 100L, 3L), ("u", 2L, 150L, 160L, 1L)))
  }

  test("keys are independent; zero-length intervals participate") {
    val got = run(Seq(("a", 0L, 0L, 1L), ("a", 0L, 5L, 2L),
      ("b", 0L, 5L, 3L)))
    assert(got == Set(("a", 1L, 0L, 5L, 2L), ("b", 1L, 0L, 5L, 1L)))
  }

  test("inverted intervals are dropped; result is partition-invariant") {
    val rows = (0 until 200).map { i =>
      ("u" + (i % 5), (i * 7 % 100).toLong, (i * 7 % 100 + i % 13).toLong,
        i.toLong)
    } :+ (("u0", 50L, 40L, 999L)) // inverted: dropped
    def res(d: org.apache.spark.sql.DataFrame) =
      Intervals.coalesce(d, Seq("k"), "s", "e", "id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val df = rows.toDF("k", "s", "e", "id")
    assert(res(df) == res(df.orderBy(rand(5)).repartition(13)))
    assert(!res(df).exists { case (_, _, s, e, _) => e < s })
  }

  test("merged spans are disjoint and cover their inputs") {
    val rows = (0 until 300).map(i =>
      ("k", (i * 31 % 500).toLong, (i * 31 % 500 + i % 37).toLong, i.toLong))
    val spans = run(rows).toSeq.sortBy(_._3)
    spans.sliding(2).foreach {
      case Seq((_, _, _, e1, _), (_, _, s2, _, _)) => assert(s2 > e1)
      case _ =>
    }
    // every input point lies inside some span
    rows.foreach { case (_, s, e, _) =>
      if (e >= s) assert(spans.exists(sp => sp._3 <= s && e <= sp._4)) }
  }
}
