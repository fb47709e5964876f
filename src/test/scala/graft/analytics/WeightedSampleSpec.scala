package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class WeightedSampleSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def items(n: Int) = spark.range(0, n)
    .select(col("id"), (col("id") % 10 + 1).as("w"))

  test("sample is deterministic and invariant to partitioning") {
    def run(d: org.apache.spark.sql.DataFrame) =
      WeightedSample.sampleWithoutReplacement(d, col("id"), col("w"), 50, 9L)
        .collect().map(_.getLong(0)).toSeq
    val a = run(items(2000))
    val b = run(items(2000).orderBy(rand(4)).repartition(13))
    assert(a == b)
    assert(a.size == 50 && a.distinct.size == 50)
  }

  test("matches a driver-side replay of the key formula") {
    val got = WeightedSample
      .sampleWithoutReplacement(items(500), col("id"), col("w"), 20, 3L)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    val exp = (0 until 500).map { i =>
      val hex = md.digest(s"3:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4503599627370496.0
      val w = i % 10 + 1
      (i.toLong, math.round(-math.log(u) / w * 1e12))
    }.sortBy(t => (t._2, t._1)).take(20)
    assert(got.toSeq == exp)
  }

  test("higher weight wins proportionally more slots") {
    // two weight classes 1 and 10 in equal numbers: the heavy class must
    // dominate the sample (probability argument; deterministic given seed)
    val df = spark.range(0, 2000)
      .select(col("id"), when(col("id") < 1000, 1L).otherwise(10L).as("w"))
    val heavy = WeightedSample
      .sampleWithoutReplacement(df, col("id"), col("w"), 200, 1L)
      .where(col("w") === 10).count()
    assert(heavy > 140, s"heavy class took only $heavy of 200")
  }

  test("sampleByGroup: k per group, same keys as the global sampler") {
    val df = spark.range(0, 400)
      .select(col("id"), (col("id") % 4).as("g"), (col("id") % 7 + 1).as("w"))
    val got = WeightedSample.sampleByGroup(df, Seq(col("g")), col("id"),
      col("w"), k = 5, seed = 2L)
      .collect().map(r => r.getLong(1) -> r.getLong(0))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet == (0L until 4L).toSet)
    assert(got.values.forall(_.size == 5))
    // per-group winners = the 5 smallest (key, id) of that group's rows:
    // replay with the global sampler restricted to the group
    (0L until 4L).foreach { g =>
      val ref = WeightedSample.sampleWithoutReplacement(
        df.where(col("g") === g), col("id"), col("w"), 5, 2L)
        .collect().map(_.getLong(0)).toSet
      assert(got(g) == ref, s"group $g")
    }
  }

  test("sampleByGroup: groups smaller than k return whole") {
    val df = Seq((1L, "a", 5L), (2L, "a", 1L), (3L, "b", 2L))
      .toDF("id", "g", "w")
    val got = WeightedSample.sampleByGroup(df, Seq(col("g")), col("id"),
      col("w"), k = 10)
    assert(got.count() == 3)
  }

  test("non-positive and null weights are excluded") {
    val df = Seq((1L, Some(5L)), (2L, Some(0L)), (3L, Some(-2L)),
      (4L, None)).toDF("id", "w")
    val got = WeightedSample
      .sampleWithoutReplacement(df, col("id"), col("w"), 10, 0L)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }

  test("selection avoids a global sort: TakeOrdered in the plan") {
    val plan = WeightedSample
      .sampleWithoutReplacement(items(100), col("id"), col("w"), 5, 0L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
