package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class LineDedupSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  // "Cookie Notice" (case/whitespace variants) appears in docs 1,2,3;
  // "unique line ..." lines are per-doc; doc 4 is ONLY boilerplate; doc 5
  // repeats a line internally but shares it with no other doc; blank lines
  // pepper doc 1 and must survive in place.
  private def corpus = Seq(
    (1L, "Cookie Notice\n\nunique line one\n\nfooter text"),
    (2L, "  cookie notice  \nunique line two\nfooter text"),
    (3L, "COOKIE NOTICE\nunique line three"),
    (4L, "cookie notice\nfooter text"),
    (5L, "self repeat\nself repeat\nself repeat"),
    (6L, "")).toDF("doc_id", "text")

  private def run(minDocs: Int = 2) =
    LineDedup.removeRepeatedLines(corpus, "doc_id", "text", minDocs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("cross-doc repeated lines are scrubbed, order and blanks preserved") {
    val m = run()
    // "cookie notice" in 4 docs, "footer text" in 3 — both removed;
    // normalization unifies case/whitespace variants
    assert(m(1L) == (("\nunique line one\n", 5L, 2L)))
    assert(m(2L) == (("unique line two", 3L, 2L)))
    assert(m(3L) == (("unique line three", 2L, 1L)))
  }

  test("a doc that is pure boilerplate survives with empty text") {
    val m = run()
    assert(m(4L) == (("", 2L, 2L)))
  }

  test("within-doc repetition alone is not boilerplate (distinct docs)") {
    val m = run()
    assert(m(5L) == (("self repeat\nself repeat\nself repeat", 3L, 0L)))
  }

  test("empty text round-trips as one blank kept line") {
    val m = run()
    assert(m(6L) == (("", 1L, 0L)))
  }

  test("minDocs raises the bar: only the 3+-doc lines go") {
    val m = run(minDocs = 4)
    // "cookie notice" is in 4 docs (removed); "footer text" only 3 (kept)
    assert(m(1L) == (("\nunique line one\n\nfooter text", 5L, 1L)))
    assert(m(4L) == (("footer text", 2L, 1L)))
  }

  test("equals a brute-force reference on a random corpus") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta")
    val docs = (1L to 40L).map { id =>
      val nLines = 1 + rnd.nextInt(6)
      val text = Seq.fill(nLines)(
        Seq.fill(1 + rnd.nextInt(2))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")).mkString("\n")
      (id, text)
    }
    val df = docs.toDF("doc_id", "text")
    val got = LineDedup.removeRepeatedLines(df, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    // independent reference: plain Scala collections
    val lines = docs.flatMap { case (id, t) =>
      t.split("\n", -1).zipWithIndex.map { case (l, i) => (id, i, l) } }
    val dup = lines.filter(_._3.trim.nonEmpty)
      .groupBy(_._3.trim.toLowerCase).map { case (k, v) =>
        k -> v.map(_._1).distinct.size }
      .collect { case (k, n) if n >= 2 => k }.toSet
    val exp = docs.map { case (id, t) =>
      val ls = t.split("\n", -1)
      val kept = ls.filter(l =>
        l.trim.isEmpty || !dup.contains(l.trim.toLowerCase))
      (id, kept.mkString("\n"), ls.length.toLong,
        (ls.length - kept.length).toLong)
    }.toSet
    assert(got == exp)
  }
}
