package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class SortedNeighborhoodSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("candidatePairs equals brute-force rank-distance pairs") {
    // ids 1..40 with sort key = id: rank == id
    val df = (1L to 40L).toDF("id")
    for (w <- Seq(1, 3, 10)) {
      val got = SortedNeighborhood.candidatePairs(df, "id",
        Seq(col("id")), window = w)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = (for {
        a <- 1L to 40L; b <- 1L to 40L if b > a && b <= a + w
      } yield (a, b)).toSet
      assert(got == expect, s"window $w")
    }
  }

  test("pair ordering follows sort order, not id order") {
    // key sorts 20 before 10: pair must be (20, 10)
    val df = Seq((10L, "zz"), (20L, "aa")).toDF("id", "k")
    val got = SortedNeighborhood.candidatePairs(df, "id",
      Seq(col("k")), window = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((20L, 10L)))
  }

  test("jaccardPairs verifies candidates exactly; out-of-window dups missed by design") {
    val nearDupA = "alpha beta gamma delta epsilon zeta eta theta"
    val nearDupB = "alpha beta gamma delta epsilon zeta eta iota"
    val df = Seq(
      (1L, nearDupA), // prefix "alpha beta ..." sorts adjacent to 2
      (2L, nearDupB),
      (3L, "unrelated words entirely different content here now"),
      (4L, "zebra yaks xylophones wander very usefully today okay")
    ).toDF("doc_id", "text")
    val got = SortedNeighborhood.jaccardPairs(df, "doc_id", "text",
      sortCols = Seq(substring(trim(lower(col("text"))), 1, 20), col("doc_id")),
      window = 1, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == Set((1L, 2L)))
  }
}
