package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The r21 parallelism-floor helper: pinned exchanges and conditional
  * scan spreads must never change results, and wideScan must be a no-op
  * exactly when documented (wide input, or a plan it cannot cheaply
  * probe). */
class SpreadSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("byKey pins the partition count to the session floor") {
    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "k")
    val out = Spread.byKey(df, col("k"))
    assert(out.rdd.getNumPartitions == Spread.target(df))
    // same rows, just re-placed
    assert(out.as[(Long, Int)].collect().sortBy(_._1).toSeq ==
      df.as[(Long, Int)].collect().sortBy(_._1).toSeq)
  }

  test("wideScan spreads a narrow 1-partition scan and no-ops on wide input") {
    val one = spark.range(0, 50, 1, 1).toDF("id")
    assert(one.rdd.getNumPartitions == 1)
    val spread = Spread.wideScan(one)
    assert(spread.rdd.getNumPartitions == Spread.target(one))
    assert(spread.as[Long].collect().sorted.toSeq == (0L until 50L))
    val wide = spark.range(0, 50, 1, Spread.target(one) + 3).toDF("id")
    assert(Spread.wideScan(wide) eq wide, "already-wide input must pass through")
  }

  test("wideScan leaves non-narrow plans untouched (no eager probing)") {
    val a = spark.range(0, 10, 1, 1).toDF("id")
    val joined = a.join(a.withColumnRenamed("id", "id2"), col("id") === col("id2"))
    assert(Spread.wideScan(joined) eq joined,
      "a plan with a join upstream must be returned unchanged")
  }

  test("cluster-pair salt changes placement only: salt=1 == salt=4 == brute") {
    // 3 clusters, one hot: vectors built so several in-cluster pairs pass
    val rows = (0 until 40).map { i =>
      val c = if (i < 30) 0 else i % 3
      (i.toLong, c, Array.fill(8)(if (i % 2 == 0) 1.0f else 0.9f))
    }
    val adf = rows.toDF("vec_id", "cluster", "embedding")
    def run(salt: Int) = graft.vector.KMeansIvf
      .dupPairsFromClusters(adf, "vec_id", "embedding", threshold = 0.9,
        salt = salt)
      .select("id_a", "id_b").as[(Long, Long)].collect().sorted.toSeq
    val s1 = run(1)
    assert(s1.nonEmpty, "fixture must produce pairs or the test is vacuous")
    assert(run(4) == s1)
    assert(run(7) == s1)
    val q = graft.vector.Quantize.quantize(
      adf.select(col("vec_id"), col("embedding")), "embedding")
      .select(col("vec_id"), col("q"))
      .join(adf.select(col("vec_id"), col("cluster")), "vec_id")
    def runQ(salt: Int) = graft.vector.Quantize
      .qDupPairsFromClusters(q, "vec_id", "q", threshold = 0.9, salt = salt)
      .select("id_a", "id_b").as[(Long, Long)].collect().sorted.toSeq
    val q1 = runQ(1)
    assert(q1.nonEmpty)
    assert(runQ(5) == q1)
  }
}
