package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  // docs 1 and 2 share the 3-token span "lorem ipsum dolor"; doc 3 is
  // unique; doc 4 is too short for any 3-span; doc 5 repeats a span
  // internally but shares it with no other doc
  private def corpus = Seq(
    (1L, "lorem ipsum dolor sit amet"),
    (2L, "prefix words lorem ipsum dolor trailing"),
    (3L, "completely unrelated text with no overlap here"),
    (4L, "too short"),
    (5L, "echo echo echo echo echo echo")).toDF("doc_id", "text")

  test("markRepeatedSpans counts cross-doc duplicated span occurrences") {
    val m = SpanDedup.markRepeatedSpans(corpus, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m(1L) == ((3L, 1L))) // 5 tokens -> 3 spans, one duplicated
    assert(m(2L) == ((4L, 1L)))
    assert(m(3L) == ((5L, 0L))) // 7 tokens -> 5 spans
    assert(!m.contains(4L)) // shorter than k: no spans, no row
    // all of doc 5's spans are "echo echo echo" — repeated within the doc
    // only, so countDistinct(doc)=1 and none are marked
    assert(m(5L) == ((4L, 0L)))
  }

  test("removeRepeatedSpans scrubs the covered union, keeps the rest") {
    val out = SpanDedup.removeRepeatedSpans(corpus, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L) == (("sit amet", 3)))
    assert(out(2L) == (("prefix words trailing", 3)))
    assert(out(3L) == (("completely unrelated text with no overlap here", 0)))
    // short docs pass through normalized, untouched
    assert(out(4L) == (("too short", 0)))
    assert(out(5L)._2 == 0)
    assert(out.size == 5) // one row per input doc, always
  }

  test("overlapping duplicated spans remove the union of positions, once") {
    // docs share a 4-token run => two overlapping duplicated 3-spans in
    // each; covered union is 4 positions, not 6
    val df = Seq(
      (1L, "a b c d x"),
      (2L, "y a b c d")).toDF("doc_id", "text")
    val out = SpanDedup.removeRepeatedSpans(df, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L) == (("x", 4)))
    assert(out(2L) == (("y", 4)))
  }

  test("crossSpanContamination flags only training docs sharing a span with ref") {
    val train = Seq(
      (10L, "the secret benchmark answer is forty two"),
      (20L, "completely clean training text goes right here")).toDF("doc_id", "text")
    val ref = Seq(
      (1L, "quiz: the secret benchmark answer is forty two indeed"))
      .toDF("doc_id", "text")
    val got = SpanDedup.crossSpanContamination(train, "doc_id", "text",
      ref, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(10L)._2 > 0) // shares 5-token spans with ref
    assert(got(20L) == ((3L, 0L))) // 7 tokens -> 3 spans, none shared
  }

  test("minDocs raises the duplication bar") {
    val df = Seq(
      (1L, "shared span here plus one"),
      (2L, "shared span here plus two"),
      (3L, "shared span here plus three")).toDF("doc_id", "text")
    // "shared span here plus" occurs in 3 docs; at minDocs=4 nothing dups
    val none = SpanDedup.markRepeatedSpans(df, "doc_id", "text", k = 4, minDocs = 4)
      .where(org.apache.spark.sql.functions.col("n_dup_spans") > 0).count()
    assert(none == 0)
    val some = SpanDedup.markRepeatedSpans(df, "doc_id", "text", k = 4, minDocs = 3)
      .where(org.apache.spark.sql.functions.col("n_dup_spans") > 0).count()
    assert(some == 3)
  }
}
