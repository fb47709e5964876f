package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** Reference Morton interleave, bit-at-a-time. */
  private def morton(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zvalue2 matches the bitwise reference on deterministic samples") {
    val pts = (0 until 500).map { i =>
      (i.toLong * 2654435761L % 65536, i.toLong * 40503L % 65536)
    }
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zvalue2(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == morton(x, y, 16), s"mismatch at ($x,$y)")
    }
  }

  test("zvalue2 masks values wider than the configured bits") {
    val got = Seq((65536L + 3L, 2L)).toDF("x", "y")
      .select(ZOrder.zvalue2(col("x"), col("y"), bits = 16))
      .collect().head.getLong(0)
    assert(got == morton(3L, 2L, 16))
  }

  test("z-locality: adjacent z-values are close in both dimensions") {
    // the defining property exploited by file skipping: a contiguous
    // z-range touches a bounded sub-rectangle, not a full row/column
    val df = spark.range(0, 64).select(
      (col("id") % 8).as("x"), floor(col("id") / 8).as("y"))
    val zs = df.select(ZOrder.zvalue2(col("x"), col("y"), bits = 3).as("z"),
        col("x"), col("y"))
      .orderBy("z").collect()
    // first quarter of z-order on an 8x8 grid is exactly the 4x4 quadrant
    val quad = zs.take(16).map(r => (r.getLong(1), r.getLong(2)))
    assert(quad.forall { case (x, y) => x < 4 && y < 4 })
  }

  test("clusterByZ yields disjoint z-ranges across output partitions") {
    val df = spark.range(0, 4096).select(
      ((col("id") * 48271) % 256).as("x"), ((col("id") * 16807) % 256).as("y"))
    val parts = ZOrder.clusterByZ(df, "x", "y", numPartitions = 8)
      .select(ZOrder.zvalue2(col("x"), col("y")).as("z"))
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    parts.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping z-ranges: $parts")
      case _ =>
    }
  }

  test("zvalue2Sql emits the same arithmetic (spot-check via substitution)") {
    // evaluate the generated SQL string by substituting literal values —
    // proves the string encodes the same formula the Column tree computes
    val sql = ZOrder.zvalue2Sql("7", "5", bits = 4)
    val got = spark.sql(s"SELECT $sql AS z").collect().head.getLong(0)
    assert(got == morton(7, 5, 4))
  }
}
