package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Lakehouse, SparkFixture}
import graft.governance.ValidationRule

class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def newLh() = Lakehouse.open(spark, SparkFixture.tmpDir("graft-an-").toString)

  private def seeded(): Lakehouse = {
    val lh = newLh()
    lh.catalog.createTable("m", Seq("id" -> "long", "cat" -> "string", "v" -> "double"),
      Nil, Map.empty)
    lh.dml.insertRows("m", (1 to 100).map(i => Map[String, Any](
      "id" -> i, "cat" -> s"c${i % 4}",
      "v" -> (if (i % 10 == 0) null else i.toDouble))))
    lh
  }

  test("profile: one-pass nulls/distinct/min/max/mean/percentiles + top values") {
    val lh = seeded()
    val p = lh.profile.profileTable("m")
    assert(p.rowCount == 100)
    val v = p.columns.find(_.name == "v").get
    assert(v.nullCount == 10 && v.distinctCount == 90)
    assert(v.min.get.toDouble == 1.0 && v.max.get.toDouble == 99.0)
    assert(v.p50.isDefined && v.mean.isDefined && v.stddev.isDefined)
    val cat = p.columns.find(_.name == "cat").get
    assert(cat.topValues.size == 4 && cat.topValues.forall(_._2 == 25))
    val id = p.columns.find(_.name == "id").get
    assert(id.distinctCount == 100 && id.nullCount == 0)
  }

  test("approxQuantiles ranks within the sketch's relative-error bound") {
    val df = spark.range(1, 10001).select(col("id").cast("double").as("v"))
    val got = Profile.approxQuantiles(df, "v", Seq(0.25, 0.5, 0.75),
      relativeError = 0.01)
    // GK guarantee: returned value's rank within eps*n of the target rank
    Seq(2500.0, 5000.0, 7500.0).zip(got).foreach { case (exact, approx) =>
      assert(math.abs(approx - exact) <= 100.0 + 1,
        s"approx $approx vs exact $exact exceeds eps*n")
    }
  }

  test("approxDistinct lands within the HLL error envelope per column") {
    val df = spark.range(1, 5001).select(
      col("id"), (col("id") % 100).as("mod100"), lit("const").as("c"))
    val got = Profile.approxDistinct(df, rsd = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(got("id") - 5000L) <= 500, got.toString)
    assert(math.abs(got("mod100") - 100L) <= 10, got.toString)
    assert(got("c") == 1L)
  }

  test("approxDistinct skips unhashable map columns instead of failing the query") {
    val df = spark.range(1, 101).select(
      col("id"), map(lit("k"), col("id")).as("m"), (col("id") % 10).as("mod10"))
    val got = Profile.approxDistinct(df)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("m"), got.toString)
    assert(got.contains("id") && got.contains("mod10"), got.toString)
    val mapsOnly = spark.range(1).select(map(lit("k"), col("id")).as("m"))
    val e = intercept[IllegalArgumentException] { Profile.approxDistinct(mapsOnly) }
    assert(e.getMessage.contains("no hashable columns"))
  }

  test("stats cache + staleness by snapshot id") {
    val lh = seeded()
    val s = lh.profile.computeStats("m")
    assert(s.rowCount == 100 && s.snapshotIdAtCache == 1 && s.fileCount > 0)
    assert(s.columnNullCounts("v") == 10)
    assert(!lh.profile.isStatsStale("m"))
    lh.dml.insertRows("m", Seq(Map("id" -> 101, "cat" -> "c9", "v" -> 1.5)))
    assert(lh.profile.isStatsStale("m"))
  }

  test("sampling: bernoulli deterministic, stratified >=1 per stratum, systematic") {
    val lh = seeded()
    val df = lh.catalog.loadTable("m").read().cache()
    val s1 = lh.sampling.randomSample(df, 0.2, seed = 7).collect().map(_.getLong(0)).toSet
    val s2 = lh.sampling.randomSample(df, 0.2, seed = 7).collect().map(_.getLong(0)).toSet
    assert(s1 == s2 && s1.nonEmpty && s1.size < 60)
    val strat = lh.sampling.stratifiedSample(df, "cat", 0.1, seed = 7)
    val perStratum = strat.groupBy("cat").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum.keySet == Set("c0", "c1", "c2", "c3"))
    // ceil(25 * 0.1) = 3 per stratum
    assert(perStratum.values.forall(_ == 3))
    val sys = lh.sampling.systematicSample(df, 10)
    assert(sys.count() == 10)
    val stats = lh.sampling.sampleStats(df, strat)
    assert(stats.contains(("v", "mean")) && stats.contains(("id", "max")))
  }

  test("dedup: find/summary/remove/report") {
    val lh = newLh()
    lh.catalog.createTable("d", Seq("k" -> "long", "x" -> "string"), Nil, Map.empty)
    lh.dml.insertRows("d", Seq(
      Map("k" -> 1, "x" -> "a"), Map("k" -> 1, "x" -> "b"),
      Map("k" -> 2, "x" -> "c"), Map("k" -> 3, "x" -> "d"), Map("k" -> 3, "x" -> "e"),
      Map("k" -> 3, "x" -> "f")))
    val df = lh.catalog.loadTable("d").read()
    val dups = lh.dedup.findDuplicates(df, Seq("k")).collect()
    assert(dups.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((3L, 3L), (1L, 2L)))
    assert(lh.dedup.dedupSummary(df, Seq("k")) ==
      Map("total_rows" -> 6L, "unique_rows" -> 3L, "duplicate_rows" -> 3L))
    val report = lh.dedup.dedupReport("d", Seq("k"))
    assert(report("suggested_keys").asInstanceOf[Seq[String]].contains("x"))
    val removed = lh.dedup.removeDuplicates("d", Seq("k"))
    assert(removed == 3)
    assert(lh.catalog.loadTable("d").read().count() == 3)
    // history preserved — pre-dedup snapshot still has 6 rows
    assert(lh.catalog.loadTable("d").readAsOf("1").count() == 6)
  }

  test("stratifiedSample: planted 90%-one-stratum skew samples without " +
      "a stratum-keyed window (only GlobalOrder's partition-local one); " +
      "exact ceil(n*f) and >=1 guarantees hold") {
    val lh = newLh()
    // 9000 rows in stratum "hot", 100 in each of 10 cold strata, 1 in
    // a singleton stratum (the >=1 guarantee's edge)
    val rows = (0 until 9000).map(i => ("hot", i.toLong)) ++
      (0 until 1000).map(i => (s"c${i % 10}", 9000L + i)) :+
      (("solo", 99999L))
    val df = rows.toDF("cat", "id")
    val s = lh.sampling.stratifiedSample(df, "cat", 0.1, seed = 7)
    val plan = s.queryExecution.executedPlan.toString
    // every window must be partition-local (__pid) — a stratum-keyed or
    // unpartitioned windowspec would funnel the hot group into one task
    assert(!"windowspecdefinition\\((?!__pid)".r.findFirstIn(plan).isDefined,
      s"stratum-keyed/global window in the plan:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"single-partition exchange in the plan:\n$plan")
    val per = s.groupBy("cat").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per("hot") == 900)
    assert((0 until 10).forall(i => per(s"c$i") == 10), per.toString)
    assert(per("solo") == 1, "the >=1-per-stratum guarantee")
    // deterministic for a fixed input layout + seed
    val again = lh.sampling.stratifiedSample(df, "cat", 0.1, seed = 7)
      .select("id").as[Long].collect().sorted.toSeq
    assert(again == s.select("id").as[Long].collect().sorted.toSeq)
  }

  test("dedup keep-first/last: planted 90%-one-key skew dedups through a " +
      "hash aggregate — no Window over partitionBy(keys) in the plan") {
    val lh = newLh()
    // 90% of rows share key 0 — a window dedup would funnel them all
    // through ONE task; the min_by/max_by plan partial-aggregates them
    // map-side instead
    val rows = (0 until 1000).map(i =>
      (if (i % 10 == 0) i.toLong / 10 + 1 else 0L, i.toLong))
    val df = rows.toDF("k", "pos").coalesce(1) // one partition: scan order = row order
    val first = lh.dedup.keepOneFrame(df, Seq("k"), "first")
    val plan = first.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"keep-first dedup must not plan a Window:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate") ||
      plan.contains("SortAggregate"), s"expected an aggregate plan:\n$plan")
    // keep-first over scan order: key 0's survivor is its FIRST row (pos 1)
    val got = first.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(0L) == 1L, s"keep-first must pick key 0's first row: $got")
    assert(got.size == 101) // 100 singleton keys + the hot key
    val last = lh.dedup.keepOneFrame(df, Seq("k"), "last")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(last(0L) == 999L, s"keep-last must pick key 0's last row: $last")
    // schema/order preserved exactly
    assert(first.columns.toSeq == Seq("k", "pos"))
  }

  test("quality score components + anomaly detection") {
    val lh = seeded()
    lh.validation.addRule(ValidationRule("q1", "m", "not_null", List("v")))
    val q = lh.quality.computeScore("m")
    assert(q.completeness > 0.9 && q.completeness < 1.0) // 10/300 null cells
    assert(q.freshness == 1.0) // just written
    assert(q.ruleCompliance < 1.0) // 10 null v rows fail the rule
    assert(q.score > 0 && q.score < 1)
    assert(lh.quality.history("m").nonEmpty)
    // establish the anomaly baseline EXPLICITLY: scoring no longer caches
    // stats as a side effect (that used to clobber the baseline and mask
    // anomalies when a score ran after the data changed)
    lh.profile.computeStats("m")
    // anomaly: blow away most rows → critical row-count anomaly
    lh.dml.delete("m", "id > 5")
    val anoms = lh.quality.detectAnomalies("m")
    assert(anoms.exists(a => a.kind == "row_count" && a.severity == "critical"))
    // detection is read-only: the cached baseline survives, so a second
    // detection still reports the same anomaly
    val anoms2 = lh.quality.detectAnomalies("m")
    assert(anoms2.exists(a => a.kind == "row_count" && a.severity == "critical"))
  }
}
