package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class ChunkingSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("chunk: overlapping windows, short docs yield one chunk") {
    val docs = Seq(
      (1L, "a b c d e f g"),  // 7 tokens, size 4 stride 2 -> starts 0,2,4(? kmax=ceil(3/2)=2) -> 3 chunks
      (2L, "x y")             // 2 tokens -> single chunk
    ).toDF("doc_id", "text")
    val got = Chunking.chunk(docs, "doc_id", "text", chunkSize = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    assert(got((1L, 0L)) == ((4L, "a b c d")))
    assert(got((1L, 1L)) == ((4L, "c d e f")))
    assert(got((1L, 2L)) == ((3L, "e f g"))) // trailing shorter chunk
    assert(got((2L, 0L)) == ((2L, "x y")))
    assert(got.size == 4)
    // every token of doc 1 appears in some chunk (coverage)
    val covered = got.collect { case ((1L, _), (_, t)) => t.split(" ") }
      .flatten.toSet
    assert(covered == Set("a", "b", "c", "d", "e", "f", "g"))
  }

  test("chunk validates size and stride") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunking.chunk(df, "doc_id", "text", 0, 1))
    intercept[IllegalArgumentException](Chunking.chunk(df, "doc_id", "text", 4, 5))
  }
}
