package graft.vector

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkFixture, Tables}

class QuantizeSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("codes bounded, scale positive, zero vector safe") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val q = Quantize.quantize(df, "v").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getSeq[Int](3)))).toMap
    val (s1, q1) = q(1L)
    assert(s1 == 127.0) // max|x| = 1.0
    assert(q1 == Seq(64, -127, 32)) // floor(x*127+0.5)
    val (s2, q2) = q(2L)
    assert(s2 == 0.0 && q2.forall(_ == 0))
  }

  test("compiled qdot equals the higher-order-function reference") {
    val q = Quantize.quantize(
      Tables.load(spark, dir, "embeddings").select(col("vec_id"), col("embedding")),
      "embedding")
    val mismatches = q.select(
      Quantize.qdot(col("q"), col("q")).as("fast"),
      aggregate(zip_with(col("q"), col("q"), (x, y) => (x * y).cast("long")),
        lit(0L), (acc, x) => acc + x).as("ref"))
      .where(col("fast") =!= col("ref")).count()
    assert(mismatches == 0)
  }

  test("quantized cosine tracks float cosine within 2% on real embeddings") {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).limit(60)
    val q = Quantize.quantize(e, "embedding")
    val a = q.select(col("vec_id").as("ida"), col("embedding").as("ea"),
      col("q").as("qa"))
    val b = q.select(col("vec_id").as("idb"), col("embedding").as("eb"),
      col("q").as("qb"))
    val drift = a.join(b, col("ida") < col("idb"))
      .select(abs(VectorOps.cosine(col("ea"), col("eb"))
        - Quantize.qcosine(col("qa"), col("qb"))).as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    assert(drift < 0.02, s"quantization drift $drift exceeds 2%")
  }

  test("int8Quantize rejects non-float arrays at analysis time, not executor runtime") {
    import spark.implicits._
    val strings = Seq(Seq("a", "b")).toDF("v")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      strings.select(VectorExpressions.int8Quantize(col("v"))).collect()
    }
    assert(e.getMessage.contains("array<float>"), e.getMessage)
    val ints = Seq(Seq(1, 2, 3)).toDF("v")
    intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(VectorExpressions.int8Quantize(col("v"))).collect()
    }
    // the documented escape hatch: cast numeric elements to double first
    val ok = ints.select(VectorExpressions.int8Quantize(
      col("v").cast("array<double>")).getField("q")).head.getSeq[Int](0)
    assert(ok == Seq(42, 85, 127))
  }

  test("qDupPairsFromClusters equals qDupPairs restricted to within-cluster pairs") {
    import spark.implicits._
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).limit(80)
    val q = Quantize.quantize(e, "embedding").select(col("vec_id"), col("q"))
    val clustered = q.withColumn("cluster", (col("vec_id") % 3).cast("int"))
    val got = Quantize.qDupPairsFromClusters(clustered, "vec_id", "q", 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = Quantize.qDupPairs(q, "vec_id", "q", 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      .filter(p => p._1 % 3 == p._2 % 3)
    assert(got == brute)
  }

  test("qDupPairs is deterministic and matches qcosine thresholding") {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).limit(80)
    val q = Quantize.quantize(e, "embedding").select(col("vec_id"), col("q"))
    val pairs = Quantize.qDupPairs(q, "vec_id", "q", 0.45)
    val got = pairs.select("id_a", "id_b").as[(Long, Long)]
      .collect().sorted.toSeq
    // cross-check against the float-cosine pairs at a loose band: every
    // quantized pair must be a float pair at threshold-2%, and every
    // float pair at threshold+2% must be found quantized
    val f = VectorOps.cosineDupPairs(e, "vec_id", "embedding", 0.43)
      .select(col("id_a"), col("id_b"), col("cos"))
    val loose = f.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val tight = f.where(col("cos") >= 0.47)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.toSet.subsetOf(loose))
    assert(tight.subsetOf(got.toSet))
    assert(got == pairs.select("id_a", "id_b").as[(Long, Long)]
      .collect().sorted.toSeq) // stable across evaluations
  }
}
