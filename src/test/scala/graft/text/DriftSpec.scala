package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class DriftSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** Independent plain-Scala KL (no Spark, no shared code). */
  private def referenceKl(corpus: Seq[(String, String)])
      : Map[String, (Long, Long, Long)] = {
    val toks = corpus.map { case (s, t) =>
      s -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val global = toks.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val cg = global.values.sum.toDouble
    toks.groupBy(_._1).map { case (slice, docs) =>
      val words = docs.flatMap(_._2)
      val counts = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cs = words.size.toDouble
      val kl = counts.map { case (w, c) =>
        val ps = c / cs
        val pg = global(w) / cg
        math.floor(ps * math.log(ps / pg) * 1e6 + 0.5).toLong
      }.sum
      slice -> ((words.size.toLong, counts.size.toLong, kl))
    }
  }

  test("identical slices have zero divergence") {
    val corpus = Seq(("a", "x y z x"), ("b", "x y z x"))
    val got = Drift.tokenKlDivergence(corpus.toDF("source", "text"),
      "source", "text")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == Map("a" -> 0L, "b" -> 0L))
  }

  test("matches an independent scalar implementation; skew ranks higher") {
    val corpus = Seq(
      ("balanced", "alpha beta gamma delta"),
      ("balanced", "alpha beta gamma delta"),
      ("skewed", "alpha alpha alpha alpha"),
      ("mild", "alpha beta gamma epsilon"))
    val got = Drift.tokenKlDivergence(corpus.toDF("source", "text"),
      "source", "text")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == referenceKl(corpus))
    assert(got("skewed")._3 > got("mild")._3)
    assert(got("mild")._3 > got("balanced")._3)
    assert(got.values.forall(_._3 >= 0), "KL is non-negative")
  }

  test("ngramNovelty matches a hand-computed reference; boundaries exact") {
    // reference corpus grams: "a b c", "b c d" (doc 1) and "x y z" (doc 2)
    val ref = Seq((1L, "a b c d"), (2L, "x y z")).toDF("doc_id", "text")
    val cand = Seq(
      (10L, "a b c d"),        // grams {a b c, b c d} — all seen -> 0 ppm
      (11L, "p q r s"),        // {p q r, q r s} — none seen -> 1e6 ppm
      (12L, "a b c q r s"),    // {a b c, b c q, c q r, q r s} — 3/4 novel
      (13L, "a b"))            // < 3 tokens: no grams -> absent
      .toDF("doc_id", "text")
    val got = Drift.ngramNovelty(cand, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      10L -> ((2L, 0L, 0L)),
      11L -> ((2L, 2L, 1000000L)),
      12L -> ((4L, 3L, 750000L))))
    assert(!got.contains(13L), "sub-n docs carry no grams")
  }
}
