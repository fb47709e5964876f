package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "kitten"), (2L, "sitting"), (3L, "kitchen"), (4L, "mitten"),
    (5L, "bitten"), (6L, "apple"), (7L, "apples"), (8L, "applet"),
    (9L, "zebra"), (10L, "kitten") // exact dup of 1
  ).toDF("id", "s")

  test("blocked pairs equal the naive within-block quadratic check") {
    val blk = substring(col("s"), 1, 1)
    val got = FuzzyJoin.blockedPairs(docs, "id", "s", blk, maxDist = 2)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val side = docs.select(col("id"), col("s"), blk.as("b")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val exp = (for {
      (ia, sa, ba) <- side; (ib, sb, bb) <- side
      if ba == bb && ia < ib
      d = lev(sa, sb) if d <= 2
    } yield (ia, ib, d)).toSet
    assert(got == exp)
    assert(exp.nonEmpty)
  }

  test("each unordered pair appears exactly once") {
    val pairs = FuzzyJoin.blockedPairs(docs, "id", "s", lit(1), maxDist = 3)
    assert(pairs.count() == pairs.select("id_a", "id_b").distinct().count())
    assert(pairs.where(col("id_a") >= col("id_b")).count() == 0)
  }

  test("maxDist=0 finds only exact duplicates") {
    val got = FuzzyJoin.blockedPairs(docs, "id", "s", lit(1), maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 10L)))
  }

  test("pairs straddling blocks are not produced (blocking contract)") {
    // kitten(k) vs mitten(m): distance 1 but different first-letter blocks
    val got = FuzzyJoin
      .blockedPairs(docs, "id", "s", substring(col("s"), 1, 1), maxDist = 2)
      .where((col("id_a") === 1 && col("id_b") === 4)).count()
    assert(got == 0)
  }

  test("distance histogram sums to the pair count") {
    val blk = substring(col("s"), 1, 1)
    val n = FuzzyJoin.blockedPairs(docs, "id", "s", blk, 2).count()
    val hist = FuzzyJoin.pairDistanceCounts(docs, "id", "s", blk, 2)
      .agg(sum("n_pairs")).collect()(0).getLong(0)
    assert(hist == n)
  }

  test("negative maxDist is rejected") {
    intercept[IllegalArgumentException] {
      FuzzyJoin.blockedPairs(docs, "id", "s", lit(1), -1)
    }
  }
}
