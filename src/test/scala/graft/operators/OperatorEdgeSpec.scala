package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkFixture

/** Empty-input and degenerate-input behavior of the round-5 operators:
  * at 100 TB some partition, source, or day WILL be empty, and operators
  * must return empty results — never throw, never emit phantom rows. */
class OperatorEdgeSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def emptyEvents = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", TimestampType), StructField("event_type", StringType)))
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  test("funnel, cohort, and transitions on zero events return zero rows") {
    assert(graft.analytics.Funnel.funnel(emptyEvents, "user_id", "ts",
      "event_type", Seq("a", "b")).count() == 0)
    assert(graft.analytics.Funnel.cohortRetention(emptyEvents, "user_id",
      "ts").count() == 0)
    assert(graft.analytics.Funnel.transitions(emptyEvents, "user_id", "ts",
      "event_type", "event_id").count() == 0)
  }

  test("funnel with a step type absent from the data reaches nobody past it") {
    val e = Seq((1L, 1L, new Timestamp(0), "a")).toDF(
      "event_id", "user_id", "ts", "event_type")
    val r = graft.analytics.Funnel.funnel(e, "user_id", "ts", "event_type",
      Seq("a", "never_happens", "b")).collect().head
    assert(r.getAs[Int]("reached") == 1)
  }

  test("histogram on empty input and on all-null values returns zero bins") {
    val empty = Seq.empty[(Long, Option[Double])].toDF("id", "v")
    assert(graft.analytics.Profile.histogram(empty, "v", 10.0).count() == 0)
    val nulls = Seq((1L, Option.empty[Double]), (2L, None)).toDF("id", "v")
    assert(graft.analytics.Profile.histogram(nulls, "v", 10.0).count() == 0)
  }

  test("topFractionPerGroup on empty input returns empty") {
    val empty = Seq.empty[(String, Long)].toDF("g", "v")
    assert(TopK.topFractionPerGroup(empty, Seq("g"), Seq(("v", true)),
      0.5).count() == 0)
  }

  test("zorder clusterByZ on empty input writes no rows, zvalue handles 0/0") {
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(ZOrder.clusterByZ(empty, "x", "y", 4).count() == 0)
    val z = Seq((0L, 0L)).toDF("x", "y")
      .select(ZOrder.zvalue2(col("x"), col("y")).as("z"))
      .collect().head.getLong(0)
    assert(z == 0L)
  }

  test("hash split of an empty frame and ngram diversity of empty text") {
    val empty = Seq.empty[Long].toDF("id")
    assert(empty.select(HashSplit.assign(col("id"),
      Seq("a" -> 0.5, "b" -> 0.5))).count() == 0)
    val blank = Seq((1L, "s", ""), (2L, "s", "one two")).toDF(
      "doc_id", "source", "text")
    // both docs have < 3 tokens: no grams at all, so no output row
    assert(graft.text.TextAnalysis.ngramDiversity(blank, "source", "text",
      n = 3).count() == 0)
  }

  test("bloom prunedJoin with empty fact side returns empty, not an error") {
    val dim = Seq(1L, 2L).toDF("k")
    val fact = Seq.empty[Long].toDF("fk")
    assert(BloomPrune.prunedJoin(fact, "fk", dim, "k").count() == 0)
  }
}
