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

  test("bigramLogProb matches a hand-computed corpus") {
    // doc1 "a b a b": bigrams ab, ba, ab -> c2(ab)=2+c2 from doc2
    // doc2 "a b c":   bigrams ab, bc
    // corpus: c2(a b)=3, c2(b a)=1, c2(b c)=1; cp(a)=3, cp(b)=2; V=3
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = LanguageModel.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    def q(c2: Long, cp: Long): Long =
      math.floor(math.log((c2 + 1).toDouble / (cp + 3).toDouble) * 1e6 + 0.5)
        .toLong
    val ab = q(3, 3); val ba = q(1, 2); val bc = q(1, 2)
    assert(got(1L) == ((3L, (ab + ba + ab).toDouble / (3 * 1e6))))
    assert(got(2L) == ((2L, (ab + bc).toDouble / (2 * 1e6))))
  }

  test("bigram: word order separates docs unigram statistics cannot") {
    // same token multiset, different order: the scrambled doc must score
    // lower under the bigram model trained on the coherent corpus
    val docs = (1 to 8).map(i => (i.toLong, "the cat sat on the mat")) ++
      Seq((9L, "mat the on sat cat the"))
    val rows = LanguageModel.bigramLogProb(
      docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rows(9L) < rows(1L))
  }

  test("bigram: single-token and empty docs drop out") {
    val docs = Seq((1L, "solo"), (2L, " "), (3L, "a b"))
      .toDF("doc_id", "text")
    val ids = LanguageModel.bigramLogProb(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(3L))
  }
}
