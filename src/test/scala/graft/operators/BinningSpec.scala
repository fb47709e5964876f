package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class BinningSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("bin sizes differ by at most one and cover [0, k)") {
    val df = spark.range(0, 1003).select((col("id") * 17 % 997).as("v"),
      col("id"))
    val sizes = Binning.equalFrequency(df, Seq(col("v"), col("id")), 8)
      .groupBy("bin").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0L until 8L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1, sizes.toString)
    assert(sizes.values.sum == 1003)
  }

  test("bins are ordered: every value in bin i <= every value in bin i+1") {
    val df = spark.range(0, 500).select((col("id") * 31 % 499).as("v"),
      col("id")).repartition(7)
    val ranges = Binning.equalFrequency(df, Seq(col("v"), col("id")), 5)
      .groupBy("bin").agg(min("v").as("lo"), max("v").as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    ranges.toSeq.sliding(2).foreach {
      case Seq((_, _, hi), (_, lo, _)) => assert(hi <= lo)
      case _ =>
    }
  }

  test("matches the window-rank formula on a small frame") {
    val df = Seq(30, 10, 50, 20, 40, 60, 25).toDF("v")
    val got = Binning.equalFrequency(df, Seq(col("v")), 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // rank order: 10,20,25,30,40,50,60; bin = (rank-1)*3 div 7
    val exp = Seq(10, 20, 25, 30, 40, 50, 60).zipWithIndex
      .map { case (v, i) => v -> (i.toLong * 3 / 7) }.toMap
    assert(got == exp)
  }

  test("k=1 puts everything in bin 0; empty input yields empty output") {
    val one = Binning.equalFrequency(spark.range(0, 10).toDF, Seq(col("id")), 1)
      .select("bin").distinct().collect().map(_.getLong(0)).toSeq
    assert(one == Seq(0L))
    val empty = Binning.equalFrequency(
      spark.range(0, 0).toDF, Seq(col("id")), 4)
    assert(empty.count() == 0)
    assert(empty.columns.contains("bin"))
  }

  test("binStats reports per-bin count/min/max consistent with the binning") {
    val df = spark.range(0, 100).select((col("id") % 50).as("v"), col("id"))
    val stats = Binning.binStats(df, "v", Seq(col("id")), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stats.values.sum == 100)
    assert(stats.keySet == (0L until 4L).toSet)
  }

  test("k < 1 is rejected") {
    intercept[IllegalArgumentException] {
      Binning.equalFrequency(spark.range(1).toDF, Seq(col("id")), 0)
    }
  }
}
