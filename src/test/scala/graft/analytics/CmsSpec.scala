package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class CmsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def freqData = spark.range(0, 4000)
    .select((col("id") % 37).cast("string").as("v")).repartition(7)

  test("point estimate never underestimates, and is exact sans collisions") {
    val df = freqData
    val sk = Cms.sketch(df, col("v"), depth = 4, width = 256)
    val exact = df.groupBy("v").agg(count(lit(1)).as("exact_c"))
    val est = Cms.estimates(sk, exact, "v", depth = 4, width = 256)
      .join(exact.withColumnRenamed("v", "key"), Seq("key"))
      .collect()
    assert(est.length == 37)
    est.foreach { r =>
      val (e, x) = (r.getLong(1), r.getLong(2))
      assert(e >= x, s"CMS underestimated ${r.getString(0)}: est=$e exact=$x")
    }
    // 37 keys into a 256-wide row: with 4 independent rows, at least one
    // collision-free row per key is overwhelmingly likely — and when a
    // key's min-row is collision-free the estimate is exact
    val exactHits = est.count(r => r.getLong(1) == r.getLong(2))
    assert(exactHits >= 30, s"only $exactHits/37 exact at low load")
  }

  test("grid is linear: sketch(a ++ b) == cell-wise sum of the sketches") {
    val a = spark.range(0, 900).select((col("id") % 53).cast("string").as("v"))
    val b = spark.range(0, 700).select((col("id") % 31).cast("string").as("v"))
    val whole = Cms.sketch(a.union(b), col("v"), depth = 3, width = 64)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val merged = Cms.sketch(a, col("v"), depth = 3, width = 64)
      .union(Cms.sketch(b, col("v"), depth = 3, width = 64))
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(whole == merged)
  }

  test("every grid row sums to the multiset size; state bounded by d*w") {
    val df = freqData
    val sk = Cms.sketch(df, col("v"), depth = 4, width = 32).cache()
    val n = df.count()
    val rowSums = sk.groupBy("j").agg(sum("cnt").as("s")).collect()
    assert(rowSums.length == 4 && rowSums.forall(_.getLong(1) == n))
    assert(sk.count() <= 4L * 32)
    sk.unpersist()
    ()
  }

  test("sketch is deterministic across partitionings (pure md5 function)") {
    val df = freqData
    val s1 = Cms.sketch(df.repartition(13), col("v")).collect().toSet
    val s2 = Cms.sketch(df.coalesce(1), col("v")).collect().toSet
    assert(s1 == s2)
  }

  test("null values and null probes are skipped, not hashed") {
    val df = Seq(Some("a"), Some("a"), None, Some("b")).toDF("v")
    val sk = Cms.sketch(df, col("v"), depth = 2, width = 16)
    assert(sk.agg(sum("cnt")).collect()(0).getLong(0) == 2L * 3)
    val est = Cms.estimates(sk, df.distinct(), "v", depth = 2, width = 16)
    assert(est.count() == 2)
  }
}
