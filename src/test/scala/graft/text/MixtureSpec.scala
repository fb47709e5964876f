package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class MixtureSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val docs = Seq(
    ("web", 1L, 100L), ("web", 2L, 300L),   // 400 tokens
    ("code", 3L, 100L),                      // 100 tokens
    ("chat", 4L, 50L), ("chat", 5L, 50L)     // 100 tokens
  ).toDF("source", "doc_id", "tokens")

  test("uniform plan caps fractions at 1 and splits the budget evenly") {
    val p = Mixture.plan(docs, "source", "tokens", targetTokens = 300L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // 3 sources, uniform share 1/3 -> 100 tokens each
    assert(p("web") == ((2L, 400L, 1.0 / 3, 100.0 / 400)))
    assert(p("code") == ((1L, 100L, 1.0 / 3, 1.0)))
    assert(p("chat") == ((2L, 100L, 1.0 / 3, 1.0)))
  }

  test("explicit weights: missing source excluded, heavy source capped") {
    val p = Mixture.plan(docs, "source", "tokens", targetTokens = 200L,
      weights = Map("web" -> 0.5, "code" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(p("web") == 100.0 / 400)
    assert(p("code") == 1.0)
    assert(p("chat") == 0.0)
  }

  test("zero/NULL token totals: excluded stays 0, weighted-but-empty is 1, no ANSI crash") {
    val withDead = docs.unionByName(Seq(
      ("dead", 6L, None: Option[Long]),   // NULL token total
      ("empty", 7L, Some(0L))             // zero token total
    ).toDF("source", "doc_id", "tokens"))
    val p = Mixture.plan(withDead, "source", "tokens", targetTokens = 200L,
      weights = Map("web" -> 0.5, "empty" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(p("dead") == 0.0, "unweighted NULL-token source must not leak at 1.0")
    assert(p("empty") == 1.0, "weighted zero-token source costs no budget")
    assert(p("web") == 100.0 / 400)
    assert(p("chat") == 0.0)
    // even a POSITIVE weight cannot include an unknown (NULL) token mass
    val p2 = Mixture.plan(withDead, "source", "tokens", targetTokens = 200L,
      weights = Map("dead" -> 1.0))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(p2("dead") == 0.0, "unknown token mass is not budget-free")
  }

  test("sample draws a seeded subset honoring zero fractions") {
    val s = Mixture.sample(docs, "source", "tokens", targetTokens = 200L,
      weights = Map("web" -> 1.0), seed = 7L)
    assert(s.where($"source" =!= "web").count() == 0)
    assert(s.count() <= 2)
    // deterministic for a fixed seed + partitioning
    val s2 = Mixture.sample(docs, "source", "tokens", targetTokens = 200L,
      weights = Map("web" -> 1.0), seed = 7L)
    assert(s.collect().toSeq == s2.collect().toSeq)
  }
}
