package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class CollocationsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  val corpus = Seq(
    (1L, "new york is big and new york is loud"),
    (2L, "new york has new ideas and york has none"),
    (3L, "big ideas and loud ideas"))

  /** Independent plain-Scala PMI (no Spark, no shared code). */
  private def referencePmi(minCount: Long): Map[(String, String), (Long, Long)] = {
    val toks = corpus.map(_._2.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bigrams = toks.flatMap(t => t.zip(t.drop(1)))
    val t1 = toks.map(_.size).sum.toDouble
    val t2 = bigrams.size.toDouble
    bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= minCount)
      .map { case ((w1, w2), c12) =>
        val pmi = math.log((c12 / t2) / ((uni(w1) / t1) * (uni(w2) / t1)))
        (w1, w2) -> ((c12, math.floor(pmi * 1e6 + 0.5).toLong))
      }
  }

  test("pmiBigrams matches an independent scalar implementation") {
    val got = Collocations.pmiBigrams(corpus.toDF("doc_id", "text"),
      "doc_id", "text", minCount = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val expect = referencePmi(2L)
    assert(got == expect)
    assert(got.contains(("new", "york")), "collocation must be found")
    // "new york" (3 of 4 'york' follow 'new') is a stronger collocation
    // than the syntactic "is big"-style pairs below the count threshold
    val nycount = got(("new", "york"))._1
    assert(nycount == 3L)
  }

  test("minCount filters the low-frequency PMI explosion") {
    val got = Collocations.pmiBigrams(corpus.toDF("doc_id", "text"),
      "doc_id", "text", minCount = 4L)
    assert(got.count() == 0, "no bigram appears 4 times in this corpus")
  }
}
