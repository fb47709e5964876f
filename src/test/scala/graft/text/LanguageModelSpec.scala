package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class LanguageModelSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("unigramLogProb matches a hand-computed corpus") {
    // corpus: "a a b" + "b c" -> counts a=2 b=2 c=1, total=5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = LanguageModel.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def q(cnt: Long): Long =
      math.floor(math.log(cnt.toDouble / 5.0) * 1e6 + 0.5).toLong
    val d1 = (q(2) + q(2) + q(2)).toDouble / (3 * 1e6)
    val d2 = (q(2) + q(1)).toDouble / (2 * 1e6)
    assert(got(1L)._1 == 3L)
    assert(got(1L)._2 == d1) // exact: micro-unit integer arithmetic
    assert(got(2L)._1 == 2L)
    assert(got(2L)._2 == d2)
    // rarer tokens => more negative average
    assert(got(2L)._2 < got(1L)._2)
  }

  test("empty-token docs are excluded, common-token docs score higher") {
    val docs = Seq(
      (1L, "the the the the"),
      (2L, "zzyzx"),
      (3L, "   ")).toDF("doc_id", "text")
    val rows = LanguageModel.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!rows.contains(3L)) // whitespace-only: no tokens, no row
    assert(rows(1L) > rows(2L))
  }
}
