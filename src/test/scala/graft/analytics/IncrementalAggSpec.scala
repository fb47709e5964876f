package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def rows(ids: Range) =
    ids.map(i => (s"k${i % 5}", i.toLong, (i % 7) / 2.0))
      .toDF("k", "id", "v")

  test("maintained state equals full recompute after inserts and deletes") {
    val base = rows(0 until 100)
    val state = IncrementalAgg.countSumState(base, Seq("k"), "v")
    val delta = rows(100 until 130).withColumn("op", lit("I"))
      .unionByName(rows(0 until 20).withColumn("op", lit("D")))
    val got = IncrementalAgg.maintain(state, delta, Seq("k"), "v", "op")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val exp = IncrementalAgg.countSumState(rows(20 until 130), Seq("k"), "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == exp)
  }

  test("a key fully deleted leaves the state") {
    val base = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("k", "v")
    val state = IncrementalAgg.countSumState(base, Seq("k"), "v")
    val delta = Seq(("a", 1.0, "D"), ("a", 2.0, "D")).toDF("k", "v", "op")
    val got = IncrementalAgg.maintain(state, delta, Seq("k"), "v", "op")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("b"))
  }

  test("a brand-new key enters the state via inserts alone") {
    val state = IncrementalAgg.countSumState(
      Seq(("a", 1.0)).toDF("k", "v"), Seq("k"), "v")
    val delta = Seq(("z", 4.5, "I"), ("z", 0.5, "I")).toDF("k", "v", "op")
    val got = IncrementalAgg.maintain(state, delta, Seq("k"), "v", "op")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got("z") == ((2L, 5000000L)))
    assert(got("a") == ((1L, 1000000L)))
  }

  test("over-deletion surfaces as a negative count, not silence") {
    val state = IncrementalAgg.countSumState(
      Seq(("a", 1.0)).toDF("k", "v"), Seq("k"), "v")
    val delta = Seq(("a", 1.0, "D"), ("a", 1.0, "D")).toDF("k", "v", "op")
    val got = IncrementalAgg.maintain(state, delta, Seq("k"), "v", "op")
      .collect()
    assert(got.length == 1 && got(0).getLong(1) == -1L)
  }

  test("an unknown op fails the job instead of nulling the delta") {
    val state = IncrementalAgg.countSumState(
      Seq(("a", 1.0)).toDF("k", "v"), Seq("k"), "v")
    val delta = Seq(("a", 1.0, "X")).toDF("k", "v", "op")
    val e = intercept[Exception] {
      IncrementalAgg.maintain(state, delta, Seq("k"), "v", "op").collect()
    }
    assert(e.getMessage != null)
  }

  test("maintenance is associative: two batches == one combined batch") {
    val base = rows(0 until 60)
    val s0 = IncrementalAgg.countSumState(base, Seq("k"), "v")
    val d1 = rows(60 until 80).withColumn("op", lit("I"))
    val d2 = rows(0 until 10).withColumn("op", lit("D"))
    val stepped = IncrementalAgg.maintain(
      IncrementalAgg.maintain(s0, d1, Seq("k"), "v", "op"),
      d2, Seq("k"), "v", "op")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val combined = IncrementalAgg.maintain(s0, d1.unionByName(d2),
      Seq("k"), "v", "op")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stepped == combined)
  }
}
