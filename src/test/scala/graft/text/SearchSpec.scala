package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class SearchSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  val corpus = Seq(
    (1L, "hash join beats nested loop join"),
    (2L, "sort merge join shuffles both sides"),
    (3L, "broadcast hash join avoids the shuffle entirely"),
    (4L, "window functions need a sort"),
    (5L, ""))

  lazy val df = corpus.toDF("doc_id", "text")

  /** Independent plain-Scala BM25 (no Spark, no shared code). */
  private def referenceBm25(query: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): Map[Long, (Long, Long)] = {
    val docs = corpus.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.filter(_._2.nonEmpty).toMap
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    val dfreq = query.map(q => q -> docs.count(_._2.contains(q))).toMap
    docs.flatMap { case (id, toks) =>
      val contribs = query.flatMap { q =>
        val tf = toks.count(_ == q).toDouble
        if (tf == 0) None
        else {
          val idf = math.log((n - dfreq(q) + 0.5) / (dfreq(q) + 0.5) + 1.0)
          val tfp = tf * (k1 + 1.0) /
            (tf + k1 * ((1.0 - b) + b * toks.size / avgdl))
          Some(math.floor(idf * tfp * 1e6 + 0.5).toLong)
        }
      }
      if (contribs.isEmpty) None
      else Some(id -> ((contribs.size.toLong, contribs.sum)))
    }
  }

  test("invertedIndex: tf per (token, doc), empty docs absent") {
    val idx = Search.invertedIndex(df, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(idx(("join", 1L)) == 2L)
    assert(idx(("join", 2L)) == 1L)
    assert(!idx.keys.exists(_._2 == 5L), "empty doc must have no postings")
  }

  test("bm25 matches an independent scalar implementation") {
    val got = Search.bm25(df, "doc_id", "text", Seq("join", "hash"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val expect = referenceBm25(Seq("join", "hash"))
    assert(got == expect)
    // doc 1 mentions join twice + hash once: top score
    assert(got(1L)._2 == got.values.map(_._2).max)
    assert(!got.contains(4L), "doc without query terms must be absent")
  }

  test("rarer term scores higher than a common one at equal tf") {
    // "nested" df=1, "join" df=3 — one occurrence each in doc 1
    val got = Search.bm25(df, "doc_id", "text", Seq("nested"))
      .union(Search.bm25(df, "doc_id", "text", Seq("sort")))
      .collect()
    val nested = Search.bm25(df, "doc_id", "text", Seq("nested"))
      .where(col("doc_id") === 1L).head.getLong(2)
    val join1 = Search.bm25(df, "doc_id", "text", Seq("beats"))
      .where(col("doc_id") === 1L).head.getLong(2)
    assert(nested == join1, "equal-df equal-tf terms score identically")
    assert(got.nonEmpty)
  }
}
