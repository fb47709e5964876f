package graft.vector

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  lazy val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings").cache()
  lazy val queries = emb.where($"vec_id" <= 20)
    .select($"vec_id".as("qid"), $"embedding".as("qe")).cache()
  lazy val corpus = emb.select($"vec_id".as("nid"), $"embedding".as("ne")).cache()

  test("cosine is exact and bounded") {
    val self = emb.select(VectorOps.cosine($"embedding", $"embedding").as("c"))
      .agg(min("c"), max("c")).head
    assert(math.abs(self.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(self.getDouble(1) - 1.0) < 1e-12)
    val all = VectorOps.bruteForceTopK(queries, corpus, k = 3)
      .agg(min("score"), max("score")).head
    assert(all.getDouble(0) >= -1.0 - 1e-12 && all.getDouble(1) <= 1.0 + 1e-12)
  }

  test("bruteForceTopK returns k deterministic neighbors per query") {
    val got = VectorOps.bruteForceTopK(queries, corpus, k = 5).cache()
    assert(got.groupBy("qid").count().where($"count" =!= 5).count() == 0)
    assert(got.where($"qid" === $"nid").count() == 0)
    // deterministic across runs
    val a = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val b = VectorOps.bruteForceTopK(queries, corpus, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(a == b)
  }

  test("compiled hyperplane signature matches interpreted HOF formulation") {
    val compiled = emb.select($"vec_id",
      VectorOps.hyperplaneSignature($"embedding", 8, 64).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val interpreted = emb.select($"vec_id",
      VectorOps.hyperplaneSignatureInterpreted($"embedding", 8, 64).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(compiled == interpreted)
  }

  test("bucketed dup pairs = brute-force pairs restricted to equal buckets") {
    val e = emb.select($"vec_id", $"embedding")
    val brute = VectorOps.cosineDupPairs(e, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val buckets = IvfIndex.bucketed(e, "embedding", 8, 64)
      .select($"vec_id", $"bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = IvfIndex.dupPairs(e, "vec_id", "embedding", 0.45, nPlanes = 8, dims = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = brute.filter { case (a, b) => buckets(a) == buckets(b) }
    assert(got == expected)
  }

  test("IVF bucketed ANN: bucket assignment deterministic, recall reasonable") {
    val exact = VectorOps.bruteForceTopK(queries, corpus, k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = IvfIndex.topK(queries, corpus, k = 5, nPlanes = 4, dims = 64,
      probes = 5).select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ANN is approximate; 4 planes + full Hamming-1 probing → decent recall
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall unexpectedly low: $recall")
    // buckets must be stable across evaluations (no RNG)
    val b1 = IvfIndex.bucketed(corpus, "ne", 6, 64).select("nid", "bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b2 = IvfIndex.bucketed(corpus, "ne", 6, 64).select("nid", "bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b1 == b2)
  }
}
