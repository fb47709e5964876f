package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class CoverageSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("hand-computed coverage thresholds") {
    // counts: a=5, b=3, c=1, d=1 (total 10)
    val docs = Seq("a a a b", "a b c", "a b d").toDF("text")
    val got = Coverage.coverageThresholds(docs, "text", Seq(50, 80, 100))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(50) == ((1L, 5L)))   // 'a' alone covers 5/10
    assert(got(80) == ((2L, 8L)))   // a+b cover 8/10
    assert(got(100) == ((4L, 10L))) // whole vocabulary
  }

  test("ties in frequency break lexicographically") {
    // x and y both occur twice: rank order must be x then y
    val docs = Seq("y x", "x y z").toDF("text")
    val got = Coverage.coverageThresholds(docs, "text", Seq(40))
      .collect()(0)
    // 40% of 5 = 2 occurrences -> first-ranked token 'x' suffices
    assert(got.getLong(1) == 1L && got.getLong(2) == 2L)
  }

  test("coverage is monotone in the threshold and invariant to partitioning") {
    val docs = (0 until 100).map(i => s"tok${i % 13} tok${i % 7} tok${i % 3}")
      .toDF("text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Coverage.coverageThresholds(d, "text", Seq(25, 50, 75, 95))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val a = run(docs)
    assert(a.map(_._2._1).sliding(2).forall(s => s.head <= s.last))
    assert(a == run(docs.repartition(9)))
  }

  test("a token-less corpus yields an empty result, not an error") {
    val docs = Seq("   ", "").toDF("text")
    val got = Coverage.coverageThresholds(docs, "text", Seq(50, 90))
    assert(got.count() == 0)
    assert(got.columns.toSeq ==
      Seq("pct", "n_tokens", "covered_occurrences"))
  }

  test("bad percents are rejected") {
    val docs = Seq("a").toDF("text")
    intercept[IllegalArgumentException] {
      Coverage.coverageThresholds(docs, "text", Seq(0))
    }
    intercept[IllegalArgumentException] {
      Coverage.coverageThresholds(docs, "text", Seq.empty)
    }
  }
}
