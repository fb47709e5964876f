package graft.analytics

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkFixture, Tables}

class FunnelSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  // user 1: full ordered funnel; user 2: purchase BEFORE view (step 3 not
  // reached); user 3: signup only; user 4: no signup at all
  private lazy val events = Seq(
    (1L, ts(0), "signup"), (1L, ts(5), "view"), (1L, ts(9), "purchase"),
    (2L, ts(0), "signup"), (2L, ts(8), "view"), (2L, ts(3), "purchase"),
    (3L, ts(2), "signup"),
    (4L, ts(1), "view"), (4L, ts(2), "purchase")
  ).zipWithIndex.map { case ((u, t, ty), i) => (i.toLong, u, t, ty) }
    .toDF("event_id", "user_id", "ts", "event_type")

  test("ordered funnel: later steps only count after the previous step") {
    val got = Funnel.funnel(events, "user_id", "ts", "event_type",
      Seq("signup", "view", "purchase"))
      .select("user_id", "reached")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0))
  }

  test("funnel picks the EARLIEST qualifying timestamp per step") {
    val e2 = Seq(
      (0L, 1L, ts(0), "signup"), (1L, 1L, ts(2), "view"),
      (2L, 1L, ts(4), "view"), (3L, 1L, ts(3), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val r = Funnel.funnel(e2, "user_id", "ts", "event_type",
      Seq("signup", "view", "purchase")).collect().head
    assert(r.getTimestamp(r.fieldIndex("step_1_ts")) == ts(2))
    // purchase at t=3 is after the first view (t=2) — counts
    assert(r.getTimestamp(r.fieldIndex("step_2_ts")) == ts(3))
  }

  test("funnelSummary step counts are monotone non-increasing") {
    val got = Funnel.funnelSummary(events, "user_id", "ts", "event_type",
      Seq("signup", "view", "purchase"))
      .orderBy("step_no")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, "signup", 3L), (2, "view", 2L), (3, "purchase", 1L)))
  }

  test("funnel runs in a single shuffle (one Exchange for all steps)") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val plan = Funnel.funnel(ev, "user_id", "ts", "event_type",
      Seq("signup", "view", "purchase"))
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange (hash|range|single)partitioning".r
      .findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles:\n$plan")
  }

  test("cohortRetention: day-0 cell counts each cohort's full population") {
    val e = Seq(
      (0L, 1L, ts(0)), (1L, 1L, ts(60 * 24)),          // day 0 and day 1
      (2L, 2L, ts(30)), (3L, 3L, ts(60 * 24 + 5))      // cohorts day0, day1
    ).toDF("event_id", "user_id", "ts")
    val got = Funnel.cohortRetention(e, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSet
    assert(got == Set(
      ("1970-01-01", 0, 2L), ("1970-01-01", 1, 1L), ("1970-01-02", 0, 1L)))
  }

  test("transitions count ordered consecutive pairs per user") {
    val got = Funnel.transitions(events, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // user1: signup->view->purchase; user2 (ts order): signup->purchase->view;
    // user3: none; user4: view->purchase
    assert(got == Map(
      ("signup", "view") -> 1L, ("view", "purchase") -> 2L,
      ("signup", "purchase") -> 1L, ("purchase", "view") -> 1L))
  }
}
