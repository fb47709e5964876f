package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The parallelism-floor helper: pinned exchanges and conditional scan
  * spreads must never change results; r22 makes the floor ROW-AWARE
  * (min(cap, ceil(estRows × weight / rowsPerTask))) so tiny stages stop
  * paying cap-many empty tasks while big inputs still pin at the session
  * cap. */
class SpreadSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("byKey pins the partition count to the row-aware floor") {
    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "k")
    val out = Spread.byKey(df, col("k"))
    assert(out.rdd.getNumPartitions == Spread.target(df))
    assert(Spread.target(df) <= Spread.cap(df))
    // same rows, just re-placed
    assert(out.as[(Long, Int)].collect().sortBy(_._1).toSeq ==
      df.as[(Long, Int)].collect().sortBy(_._1).toSeq)
  }

  test("target scales with rows and weight, capped at the session cap") {
    val tiny = spark.range(0, 100, 1, 1).toDF("id")
    assert(Spread.target(tiny) == 1, "100 rows must not fan out")
    // a huge weight saturates to the cap, never beyond
    assert(Spread.target(tiny, weight = Long.MaxValue / 2) == Spread.cap(tiny))
    // escape hatch: rowsPerTask <= 0 restores pin-at-cap
    spark.conf.set("spark.graft.spread.rowsPerTask", "-1")
    try assert(Spread.target(tiny) == Spread.cap(tiny))
    finally spark.conf.unset("spark.graft.spread.rowsPerTask")
  }

  test("estRows is exact on parquet leaves (footer row counts)") {
    val dir = java.nio.file.Files.createTempDirectory("spread_est").toString
    spark.range(0, 12345).toDF("id").write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(Spread.estRows(back) == 12345L)
    // a projection/filter above the leaf keeps the leaf estimate
    assert(Spread.estRows(back.select(col("id")).where(col("id") >= 0)) == 12345L)
    // an explode multiplies (the conservative fan-out factor)
    val exploded = back.select(explode(array(lit(1), lit(2))).as("x"))
    assert(Spread.estRows(exploded) > 12345L)
  }

  test("wideScan spreads a narrow 1-partition scan and no-ops on wide input") {
    val one = spark.range(0, 200000, 1, 1).toDF("id")
    assert(one.rdd.getNumPartitions == 1)
    val spread = Spread.wideScan(one, weight = 64L)
    assert(spread.rdd.getNumPartitions == Spread.target(one, 64L))
    assert(spread.rdd.getNumPartitions > 1,
      "200k rows at weight 64 must fan out")
    assert(spread.as[Long].collect().sorted.toSeq == (0L until 200000L))
    val wide = spark.range(0, 50, 1, Spread.cap(one) + 3).toDF("id")
    assert(Spread.wideScan(wide) eq wide, "already-wide input must pass through")
    // a tiny 1-partition scan stays 1 partition under the row-aware floor
    val tiny = spark.range(0, 10, 1, 1).toDF("id")
    assert(Spread.wideScan(tiny) eq tiny,
      "10 rows must not pay a repartition")
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
