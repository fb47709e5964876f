package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class TokenSimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the mat"),           // exact dup of 1
    (3L, "the cat sat on the red mat"),       // near dup of 1
    (4L, "quantum flux capacitors energize"), // unrelated
    (5L, "the the the the the the")           // stopword-only
  ).toDF("doc_id", "text")

  test("tfCosinePairs: identical docs score ~1.0, unrelated below") {
    val pairs = TokenSimilarity.tfCosinePairs(docs, "doc_id", "text",
      threshold = 0.0, maxTokenFreq = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("sim")).toMap
    // sqrt(ss)*sqrt(ss) is ss only up to an ulp, so ~1.0, not == 1.0
    assert(math.abs(pairs((1L, 2L)) - 1.0) < 1e-12)
    assert(pairs((1L, 3L)) > 0.9 && pairs((1L, 3L)) < 1.0)
    assert(!pairs.contains((1L, 4L)), "no shared tokens -> no pair row")
    // doc 5 shares only 'the' with 1/2/3 but tf-weighting keeps sim < 1
    assert(pairs((1L, 5L)) < pairs((1L, 3L)))
  }

  test("tfCosinePairs threshold + token-frequency cap prune") {
    val strict = TokenSimilarity.tfCosinePairs(docs, "doc_id", "text",
      threshold = 0.9, maxTokenFreq = 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // cap at 3: 'the' (in 4 docs) and 'cat'/'sat'/'on'/'mat' (3 docs) survive,
    // so capping at 2 must drop every cross-doc token except none -> no pairs
    val capped = TokenSimilarity.tfCosinePairs(docs, "doc_id", "text",
      threshold = 0.0, maxTokenFreq = 2)
    assert(capped.count() == 0)
  }

  test("tfidfPairs downweights stopwords relative to raw tf") {
    val tf = TokenSimilarity.tfCosinePairs(docs, "doc_id", "text",
      threshold = 0.0, maxTokenFreq = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("sim")).toMap
    val tfidf = TokenSimilarity.tfidfPairs(docs, "doc_id", "text",
      threshold = 0.0, maxTokenFreq = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("sim")).toMap
    // the (1,5) pair is pure stopword overlap: idf must push it down
    assert(tfidf((1L, 5L)) < tf((1L, 5L)))
    // identical docs stay at exactly 1.0 under any weighting
    assert(math.abs(tfidf((1L, 2L)) - 1.0) < 1e-12)
  }

  test("columnCompleteness counts nulls/distincts per column in one pass") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("a")), (3L, None), (4L, Some("b"))
    ).toDF("id", "v")
    val rep = graft.analytics.Profile.columnCompleteness(df)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rep("id") == ((4L, 0L, 4L, 1.0)))
    assert(rep("v") == ((4L, 1L, 2L, 0.75)))
    // empty frame: zero counts, vacuous completeness — no nulls anywhere
    val empty = graft.analytics.Profile.columnCompleteness(
      df.where(lit(false))).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(empty("id") == ((0L, 0L, 0L, 1.0)))
    assert(empty("v") == ((0L, 0L, 0L, 1.0)))
  }
}
