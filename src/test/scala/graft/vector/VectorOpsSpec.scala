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

  test("hyperplane signature: compiled == interpreted on ragged vectors too") {
    val ragged = Seq(
      (1L, Array.fill(64)(0.5f)),        // exact dims
      (2L, Array.fill(32)(-1.0f)),       // shorter than dims
      (3L, Array.fill(80)(0.25f)),       // longer than dims
      (4L, Array.empty[Float])           // empty
    ).toDF("id", "v")
    val both = ragged.select($"id",
      VectorOps.hyperplaneSignature($"v", 8, 64).as("c"),
      VectorOps.hyperplaneSignatureInterpreted($"v", 8, 64).as("i"))
      .collect()
    both.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"id=${r.getLong(0)} compiled=${r.getLong(1)} interpreted=${r.getLong(2)}"))
  }

  test("k-means IVF trains on array<double> vectors too") {
    val dbl = emb.select($"vec_id",
      transform($"embedding", x => x.cast("double")).as("embedding"))
    val c = KMeansIvf.train(dbl, "vec_id", "embedding", k = 2, dims = 64, iters = 1)
    assert(c.length == 2 && c.head.length == 64)
    assert(KMeansIvf.assign(dbl, "embedding", c).count() == emb.count())
  }

  test("k-means IVF: deterministic training, exact within-cluster pairs, probe recall") {
    val e = emb.select($"vec_id", $"embedding")
    val c1 = KMeansIvf.train(e, "vec_id", "embedding", k = 4, dims = 64, iters = 2)
    val c2 = KMeansIvf.train(e, "vec_id", "embedding", k = 4, dims = 64, iters = 2)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq) // no RNG, decimal-exact means
    // every vector lands in exactly one cluster; assignment is stable
    val asg = KMeansIvf.assign(e, "embedding", c1).select("vec_id", "cluster")
    assert(asg.count() == e.count())
    assert(asg.groupBy("cluster").count().count() <= 4)
    // within-cluster pairs are a subset of brute force with matching scores
    val brute = VectorOps.cosineDupPairs(e, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = KMeansIvf.dupPairsFromClusters(e.join(asg, "vec_id"),
      "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ivf.keySet.subsetOf(brute.keySet))
    ivf.foreach { case (k, v) => assert(v == brute(k)) } // bit-identical cosine
    // probing several clusters recovers most exact top-k neighbors
    val exact = VectorOps.bruteForceTopK(queries, corpus, k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = KMeansIvf.topK(queries, corpus, k = 5, c1, probes = 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.5, s"k-means IVF recall unexpectedly low: $recall")
  }
}
