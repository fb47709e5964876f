package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class PrefixFilterJoinSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  val docsDir = "/root/testdata/sf0.001"
  lazy val docs = graft.Tables.load(spark, docsDir, "documents")

  private def asPairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b", "inter", "na", "nb").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

  test("prefix-filtered join equals uncapped all-pairs jaccardPairs") {
    val exact = NearDup.jaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8, maxShingleFreq = 0)
      .select(col("id_a"), col("id_b"), col("inter"),
        col("na").cast("long").as("na"), col("nb").cast("long").as("nb"))
    val pf = PrefixFilterJoin.jaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8)
    val e = asPairSet(exact)
    val p = asPairSet(pf)
    assert(e.nonEmpty, "fixture must produce at least one near-dup pair")
    assert(p == e)
  }

  test("containment equals the naive all-pairs directed check") {
    val sh = NearDup.shingleTable(docs, "doc_id", "text", 3)
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val t = 0.85
    val naive = (for {
      (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq
      if a != b
      inter = (sa & sb).size
      if inter.toDouble >= t * sa.size.toDouble
    } yield (a, b, inter.toLong, sa.size.toLong, sb.size.toLong)).toSet
    val got = asPairSet(PrefixFilterJoin.containmentPairs(
      docs, "doc_id", "text", n = 3, threshold = t))
    assert(naive.nonEmpty, "fixture must contain at least one containment")
    assert(got == naive)
  }

  test("containment is directed: a quote inside a long doc, not the reverse") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),                      // 2 shingles
      (2L, "intro words alpha beta gamma delta more tail text here end")
    ).toDF("doc_id", "text")
    val got = PrefixFilterJoin.containmentPairs(df, "doc_id", "text",
      n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L))) // 1 ⊂ 2 only
  }

  test("completeness survives ceil float overshoot (t*n an exact integer)") {
    // 5 shingles each, overlap 4: jaccard = 4/(5+5-4) = 2/3 at t=2/3 —
    // t*n = 10/3; and the classic trap t=0.8, n=5 → IEEE 0.8*5 > 4
    // (prefix would shrink to 1 token without the epsilon guard)
    val df = Seq(
      (1L, "a b c d e f g"), // shingles: abc bcd cde def efg (5)
      (2L, "a b c d e f x") // shingles: abc bcd cde def efx (5), overlap 4
    ).toDF("doc_id", "text")
    val got = PrefixFilterJoin.jaccardPairs(df, "doc_id", "text",
      n = 3, threshold = 4.0 / 6.0)
    val rows = got.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
      r.getAs[Long]("inter")) == ((1L, 2L, 4L)))
  }

  test("candidatePairs is a superset of true pairs and respects size filter") {
    val sh = NearDup.shingleTable(docs, "doc_id", "text", 3)
    val cands = PrefixFilterJoin.candidatePairs(sh, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = NearDup.jaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8, maxShingleFreq = 0)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.subsetOf(cands))
    // the filter did something: candidates are far fewer than all pairs
    val nDocs = docs.count()
    assert(cands.size < nDocs * (nDocs - 1) / 4)
  }
}
