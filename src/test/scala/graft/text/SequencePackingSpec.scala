package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class SequencePackingSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val docs = Seq(
    // group g: 60+60 fill seq 0 (budget 100 overflows at 120 -> doc 2 tips
    // into seq 0 because the PRECEDING total was 60 < 100), 90 starts seq 1
    ("g", 1L, 60L), ("g", 2L, 60L), ("g", 3L, 90L),
    // group h: an oversize doc spans bins by itself
    ("h", 1L, 250L), ("h", 2L, 10L)
  ).toDF("source", "doc_id", "tokens")

  test("assign: contiguous fill by (cumsum - tokens) / budget") {
    val got = SequencePacking.assign(docs, "source", "doc_id", "tokens", 100L)
      .select("source", "doc_id", "seq_no", "oversize")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(("g", 1L)) == ((0L, false)))
    assert(got(("g", 2L)) == ((0L, false))) // starts at cum=60 < 100
    assert(got(("g", 3L)) == ((1L, false))) // starts at cum=120 -> bin 1
    assert(got(("h", 1L)) == ((0L, true)))  // 250 > budget: flagged
    assert(got(("h", 2L)) == ((2L, false))) // starts at cum=250 -> bin 2
  }

  test("pack: per-sequence totals, groups pack independently") {
    val got = SequencePacking.pack(docs, "source", "doc_id", "tokens", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(("g", 0L)) == ((2L, 120L, false)))
    assert(got(("g", 1L)) == ((1L, 90L, false)))
    assert(got(("h", 0L)) == ((1L, 250L, true)))
    assert(got(("h", 2L)) == ((1L, 10L, false)))
    // every token lands in exactly one sequence
    val total = got.values.map(_._2).sum
    assert(total == 60 + 60 + 90 + 250 + 10)
  }

  test("budget must be positive") {
    intercept[IllegalArgumentException](
      SequencePacking.assign(docs, "source", "doc_id", "tokens", 0L))
  }
}
