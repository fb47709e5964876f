package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class SkewReportSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("hand-computed skew statistics") {
    // key "hot" 60 rows, "a".."j" 4 rows each: 100 rows, 11 keys
    val df = (Seq.fill(60)("hot") ++
      ('a' to 'j').flatMap(c => Seq.fill(4)(c.toString))).toDF("k")
    val r = SkewReport.keySkew(df, col("k"), partitions = 10).collect()(0)
    assert(r.getLong(0) == 11L)            // n_keys
    assert(r.getLong(1) == 100L)           // total_rows
    assert(r.getLong(2) == 60L)            // max_count
    assert(r.getString(4) == "hot")        // top_key
    // ceil(60*10/100) = 6: the hot key needs ~6 subsplits
    assert(r.getLong(5) == 6L)
  }

  test("uniform keys need no salt") {
    val df = spark.range(0, 1000).select((col("id") % 50).as("k"))
    val r = SkewReport.keySkew(df, col("k"), partitions = 8).collect()(0)
    assert(r.getLong(2) == 20L)
    assert(r.getLong(5) == 1L)
  }

  test("null keys are reported as a key, and can be the hottest") {
    val df = (Seq.fill(30)(None) ++ (1 to 10).map(i => Some(i)))
      .toDF("k")
    val r = SkewReport.keySkew(df, col("k"), partitions = 4).collect()(0)
    assert(r.getLong(0) == 11L)
    assert(r.getLong(2) == 30L)
    assert(r.isNullAt(4)) // the null key's string cast stays null
  }

  test("ties on count break by key string") {
    val df = Seq("b", "b", "a", "a").toDF("k")
    val r = SkewReport.keySkew(df, col("k")).collect()(0)
    assert(r.getString(4) == "a")
  }
}
