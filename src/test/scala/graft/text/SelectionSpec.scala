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
}
