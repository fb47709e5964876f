package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkFixture, Tables}

class SelectionSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("epochShuffle: deterministic across partitionings, seed changes the permutation") {
    val docs = Tables.load(spark, dir, "documents").select("doc_id")
    def ranks(df: org.apache.spark.sql.DataFrame, seed: Long) =
      Selection.epochShuffle(df, "doc_id", seed)
        .select("doc_id", "shuffle_rank").as[(Long, Long)].collect().sorted.toSeq
    val a = ranks(docs, 42L)
    assert(a == ranks(docs.repartition(7), 42L),
      "same seed must give the same permutation at any parallelism")
    val b = ranks(docs, 43L)
    assert(a != b, "different seeds must permute differently")
    // a permutation: ranks are exactly 1..n
    assert(a.map(_._2).sorted == (1L to a.size.toLong))
  }

  test("importanceSample: partitioning-invariant, tracks the acceptance probability") {
    val n = 5000L
    val docs = spark.range(0, n).select(col("id").as("doc_id"))
    def sample(df: org.apache.spark.sql.DataFrame, p: Double, seed: Long) =
      Selection.importanceSample(df, "doc_id", lit(p), seed)
        .select("doc_id").as[Long].collect().sorted.toSeq
    val a = sample(docs, 0.3, 7L)
    // identical admitted SET at any physical layout — the property
    // rand(seed)-based sampling does not have
    assert(a == sample(docs.repartition(13), 0.3, 7L))
    assert(math.abs(a.size - n * 0.3) < n * 0.05,
      s"acceptance rate off: ${a.size} of $n at p=0.3")
    // different seeds give different samples; p=0 none, p=1 all
    assert(a != sample(docs, 0.3, 8L))
    assert(sample(docs, 0.0, 7L).isEmpty)
    assert(sample(docs, 1.0, 7L).size == n)
  }

  test("tokenBudgetSelect == local greedy reference, boundary inclusive") {
    val docs = Seq(
      (1L, 10L, 0.9), (2L, 20L, 0.8), (3L, 15L, 0.8),
      (4L, 30L, 0.5), (5L, 5L, 0.4))
      .toDF("doc_id", "n_tokens", "score")
    // greedy by (score desc, id): 1(10) -> 2(30) -> 3(45) -> 4 would hit 75
    val kept = Selection.tokenBudgetSelect(docs, "doc_id", "n_tokens",
      "score", budgetTokens = 45L)
      .select("doc_id", "sel_rank", "cum_tokens")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(kept == Seq((1L, 1L, 10L), (2L, 2L, 30L), (3L, 3L, 45L)))
    // budget below the best doc keeps nothing; huge budget keeps all
    assert(Selection.tokenBudgetSelect(docs, "doc_id", "n_tokens", "score", 9L).count() == 0)
    assert(Selection.tokenBudgetSelect(docs, "doc_id", "n_tokens", "score", 1L << 40).count() == 5)
  }

  test("ppsSystematicSample: local reference equality, exact-k, " +
      "partitioning invariance, size-weighting, input guards") {
    val docs = (1L to 200L).map(i => (i, 1L + (i % 13))).toDF("doc_id", "sz")
    val k = 20
    val got = Selection.ppsSystematicSample(docs, "doc_id", "sz", k, seed = 5L)
      .select("doc_id", "cum_size").as[(Long, Long)].collect().sorted.toSeq
    // local reference: same permutation, same integer threshold test
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long) = md.digest(s"5:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val perm = (1L to 200L).map(i => (key(i), i)).sorted.map(_._2)
    val sizes = (1L to 200L).map(i => i -> (1L + (i % 13))).toMap
    val total = sizes.values.sum
    var cum = 0L
    val want = perm.flatMap { id =>
      val prev = cum; cum += sizes(id)
      if (cum * k / total > prev * k / total) Some((id, cum)) else None
    }.sorted
    assert(got == want.map { case (id, c) => (id, c) })
    assert(got.size == k, s"all sizes < T/k here, so exactly k: ${got.size}")
    // partitioning invariance (the determinism claim)
    val got12 = Selection.ppsSystematicSample(docs.repartition(12), "doc_id",
      "sz", k, seed = 5L).select("doc_id").as[Long].collect().sorted.toSeq
    assert(got12 == got.map(_._1))
    // heavier rows are selected more often (probability ∝ size): compare
    // selection rates of the biggest vs smallest size class over seeds
    val many = (1 to 30).flatMap(s =>
      Selection.ppsSystematicSample(docs, "doc_id", "sz", k, seed = s.toLong)
        .select("doc_id").as[Long].collect())
    val bigRate = many.count(id => sizes(id) == 13L).toDouble
    val smallRate = many.count(id => sizes(id) == 1L).toDouble
    assert(bigRate > 3 * smallRate,
      s"size-13 rows must be picked far more often: $bigRate vs $smallRate")
    // guards: reserved output name collision refuses; negative size fails
    intercept[IllegalArgumentException](Selection.ppsSystematicSample(
      docs.withColumnRenamed("sz", "cum_size"), "doc_id", "cum_size", k, 5L))
    val bad = Seq((1L, 5L), (2L, -3L)).toDF("doc_id", "sz")
    intercept[Exception](
      Selection.ppsSystematicSample(bad, "doc_id", "sz", 1, 5L).collect())
  }
}
