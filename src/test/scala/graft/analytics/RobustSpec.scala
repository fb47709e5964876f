package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class RobustSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("hand-computed median, MAD and outlier count") {
    // values 1..9 plus outlier 1000: med = 5.5, MAD of |v-5.5| = 2.5
    // (devs 0.5..4.5, 994.5 -> sorted 0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5)
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).map(("g", _))
      .toDF("g", "v")
    val r = Robust.madOutliers(df, Seq("g"), "v").collect()(0)
    assert(r.getLong(1) == 10L)
    assert(r.getLong(2) == 22000000L) // 5.5 * 4e6
    assert(r.getLong(3) == 10000000L) // 2.5 * 4e6
    // threshold = 3*1.4826*2.5 = 11.12: only 1000 (dev 994.5) exceeds
    assert(r.getLong(4) == 1L)
  }

  test("constant group: MAD 0, everything non-median is an outlier") {
    val df = (Seq.fill(5)(3.0) :+ 3.1).map(("g", _)).toDF("g", "v")
    val r = Robust.madOutliers(df, Seq("g"), "v").collect()(0)
    assert(r.getLong(3) == 0L)   // MAD 0
    assert(r.getLong(4) == 1L)   // the 3.1 deviates from mad=0
  }

  test("robust to the corruption that breaks mean/stddev") {
    // one 1e9 reading among 99 unit-scale values: mean-based 3-sigma
    // flags NOTHING else, median/MAD still flags exactly the corrupt row
    val vals = (1 to 99).map(i => (i % 10).toDouble) :+ 1e9
    val df = vals.map(("g", _)).toDF("g", "v")
    val r = Robust.madOutliers(df, Seq("g"), "v").collect()(0)
    assert(r.getLong(4) >= 1L)
    val devs = vals.map(v => math.abs(v - 4.0))
    val mean = vals.sum / vals.size
    val sd = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / vals.size)
    assert(vals.count(v => math.abs(v - mean) > 3 * sd) <= 1,
      "sanity: the mean/stddev test is blinded by the outlier itself")
    assert(devs.max > 0)
  }

  test("groups are independent and partitioning-invariant") {
    val df = ((1 to 20).map(i => ("a", i.toDouble)) ++
      (1 to 20).map(i => ("b", i * 100.0))).toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Robust.madOutliers(d, Seq("g"), "v")
        .collect().map(r => r.getString(0) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val a = run(df)
    assert(a("b")._1 == a("a")._1 * 100)
    assert(a == run(df.repartition(9)))
  }
}
