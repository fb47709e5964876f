package graft.orchestration

import org.scalatest.funsuite.AnyFunSuite
import graft.{Lakehouse, SparkFixture}

class OrchestrationSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def seeded(): Lakehouse = {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-orc-").toString)
    lh.catalog.createTable("sales",
      Seq("id" -> "long", "region" -> "string", "amount" -> "double"), Nil, Map.empty)
    lh.dml.insertRows("sales", (1 to 50).map(i => Map[String, Any](
      "id" -> i, "region" -> (if (i % 2 == 0) "east" else "west"),
      "amount" -> i * 10.0)))
    lh
  }

  test("engine: execute with auto-limit, ns rewrite, executeAsOf") {
    val lh = seeded()
    val df = lh.engine.execute("SELECT * FROM sales", maxRows = 10)
    assert(df.count() == 10) // bare SELECT auto-limited
    val df2 = lh.engine.execute("SELECT count(*) AS n FROM default.sales LIMIT 5")
    assert(df2.head.getLong(0) == 50) // ns.table rewritten to ns__table
    lh.dml.delete("sales", "id > 25")
    val asOf = lh.engine.executeAsOf("sales", "SELECT count(*) AS n FROM sales", "1")
    assert(asOf.head.getLong(0) == 50)
    assert(lh.engine.referencedTables("SELECT * FROM sales s JOIN other o ON s.id=o.id")
      .toSet == Set("sales", "other"))
  }

  test("views: CRUD + query resolution at read time") {
    val lh = seeded()
    lh.views.create("east_sales", "SELECT * FROM sales WHERE region = 'east'")
    assert(lh.views.query("east_sales").count() == 25)
    // view reflects later writes (resolved at query time)
    lh.dml.insertRows("sales", Seq(Map("id" -> 51, "region" -> "east", "amount" -> 1.0)))
    assert(lh.views.query("east_sales").count() == 26)
    intercept[IllegalArgumentException](lh.views.get("nope"))
    lh.views.drop("east_sales")
    assert(lh.views.list().isEmpty)
  }

  test("matviews: materialize, freshness by source snapshot, refresh") {
    val lh = seeded()
    val m = lh.matviews.create("region_totals",
      "SELECT region, sum(amount) AS total FROM sales GROUP BY region")
    assert(m.rowCount == 2)
    assert(m.sourceSnapshots.keySet == Set("default.sales"))
    assert(!lh.matviews.isStale("region_totals"))
    lh.dml.insertRows("sales", Seq(Map("id" -> 99, "region" -> "east", "amount" -> 5.0)))
    assert(lh.matviews.isStale("region_totals"))
    lh.matviews.refresh("region_totals")
    assert(!lh.matviews.isStale("region_totals"))
    val got = lh.matviews.read("region_totals").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("east") == (2 to 50 by 2).map(_ * 10.0).sum + 5.0)
  }

  test("pipelines: dry-run validation, run with target, failure stops") {
    val lh = seeded()
    lh.pipelines.create("p1", Seq(
      PipelineStep("SELECT region, count(*) AS n FROM sales GROUP BY region",
        targetTable = Some("region_counts")),
      PipelineStep("SELECT * FROM region_counts WHERE n > 0")))
    assert(lh.pipelines.dryRun("p1").forall(_.status == "valid"))
    val results = lh.pipelines.run("p1")
    assert(results.map(_.status) == List("ok", "ok"))
    assert(lh.catalog.loadTable("region_counts").read().count() == 2)
    // lineage recorded
    assert(lh.lineage.downstream("sales").contains("default.region_counts"))
    // failing pipeline: second step invalid → third skipped
    lh.pipelines.create("p2", Seq(
      PipelineStep("SELECT 1 AS one"),
      PipelineStep("SELECT * FROM does_not_exist"),
      PipelineStep("SELECT 2 AS two")))
    val r2 = lh.pipelines.run("p2")
    assert(r2.map(_.status) == List("ok", "failed", "skipped"))
    assert(lh.pipelines.get("p2").lastRunStatus == "failed")
  }

  test("incremental pipeline only processes new rows") {
    val lh = seeded()
    lh.pipelines.create("inc", Seq(
      PipelineStep("SELECT id, amount FROM sales", targetTable = Some("sink"),
        mode = "append")))
    lh.pipelines.run("inc", incremental = true)
    assert(lh.catalog.loadTable("sink").read().count() == 50)
    // second run with no new data appends nothing
    lh.pipelines.run("inc", incremental = true)
    assert(lh.catalog.loadTable("sink").read().count() == 50)
    lh.dml.insertRows("sales", Seq(Map("id" -> 100, "region" -> "east", "amount" -> 7.0)))
    lh.pipelines.run("inc", incremental = true)
    assert(lh.catalog.loadTable("sink").read().count() == 51)
  }

  test("incremental pipeline works with namespace-qualified step SQL") {
    val lh = seeded()
    lh.pipelines.create("inc_ns", Seq(
      PipelineStep("SELECT id, amount FROM default.sales",
        targetTable = Some("sink_ns"), mode = "append")))
    lh.pipelines.run("inc_ns", incremental = true)
    assert(lh.catalog.loadTable("sink_ns").read().count() == 50)
    lh.dml.insertRows("sales", Seq(Map("id" -> 200, "region" -> "east", "amount" -> 1.0)))
    val r = lh.pipelines.run("inc_ns", incremental = true)
    assert(r.head.status == "ok")
    // only the single new row flowed through the ns__-registered batch view
    assert(lh.catalog.loadTable("sink_ns").read().count() == 51)
  }

  test("ns rewrite is token-aware: literals and longer identifiers untouched") {
    val lh = seeded()
    val sql = "SELECT 'default.sales' AS lit, count(*) AS n FROM default.sales"
    val rewritten = lh.engine.rewriteNamespaces(sql)
    assert(rewritten == "SELECT 'default.sales' AS lit, count(*) AS n FROM default__sales")
    val row = lh.engine.execute(sql, 10).head
    assert(row.getString(0) == "default.sales" && row.getLong(1) == 50)
  }

  test("ns rewrite handles digit-leading table names and leaves numeric " +
      "literals alone (the candidate scan is not letter-anchored)") {
    val lh = seeded()
    lh.catalog.createTable("default.2024sales",
      Seq("id" -> "long", "x" -> "double"), Nil, Map.empty)
    lh.catalog.loadTable("default.2024sales")
      .append(spark.range(0, 7).toDF("id")
        .withColumn("x", org.apache.spark.sql.functions.lit(2.0)))
    // `1.5` is a candidate the tableExists check must cheaply reject —
    // rewriting it would corrupt the literal
    val sql = "SELECT count(*) AS n FROM default.2024sales WHERE x > 1.5"
    assert(lh.engine.rewriteNamespaces(sql) ==
      "SELECT count(*) AS n FROM default__2024sales WHERE x > 1.5")
    assert(lh.engine.execute(sql, 10).head.getLong(0) == 7)
  }

  test("query cache: hit/miss, TTL-free invalidation by table") {
    val lh = seeded()
    val (r1, hit1) = lh.queryCache.execute("SELECT count(*) AS n FROM sales")
    assert(!hit1 && r1.head.getLong(0) == 50)
    val (r2, hit2) = lh.queryCache.execute("select   count(*) as N from sales;")
    assert(hit2, "normalized SQL should hit cache")
    assert(r2.head.getLong(0) == 50)
    assert(lh.queryCache.stats.hits == 1 && lh.queryCache.stats.misses == 1)
    assert(lh.queryCache.invalidateTable("sales") == 1)
    val (_, hit3) = lh.queryCache.execute("SELECT count(*) AS n FROM sales")
    assert(!hit3)
  }

  test("cache policies persist across process restarts (meta file)") {
    val lh = seeded()
    lh.queryCache.setPolicy("sales", enabled = false, ttlSeconds = Some(7))
    // a fresh Lakehouse over the same warehouse = a new CLI/MCP process
    val lh2 = Lakehouse.open(spark, lh.warehouseDir)
    val p = lh2.queryCache.policy("sales").getOrElse(fail("policy not persisted"))
    assert(!p.enabled && p.ttlMs.contains(7000L))
    assert(lh2.queryCache.listPolicies().keySet == Set("default.sales"))
    // disabled policy bypasses caching in the new process too
    val (_, hit1) = lh2.queryCache.execute("SELECT count(*) AS n FROM sales")
    val (_, hit2) = lh2.queryCache.execute("SELECT count(*) AS n FROM sales")
    assert(!hit1 && !hit2)
  }

  test("saved queries + capped history") {
    val lh = seeded()
    lh.savedQueries.save("cnt", "SELECT count(*) AS n FROM sales")
    assert(lh.savedQueries.runSaved("cnt").head.getLong(0) == 50)
    assert(lh.savedQueries.history().nonEmpty)
    lh.savedQueries.drop("cnt")
    intercept[IllegalArgumentException](lh.savedQueries.get("cnt"))
  }

  test("lineage BFS: upstream/downstream/impact with depth") {
    val lh = seeded()
    lh.lineage.record(Seq("a"), "b", "op")
    lh.lineage.record(Seq("b"), "c", "op")
    lh.lineage.record(Seq("c"), "d", "op")
    assert(lh.lineage.downstream("a", 2) ==
      Map("default.b" -> 1, "default.c" -> 2))
    assert(lh.lineage.upstream("d", 5).keySet ==
      Set("default.a", "default.b", "default.c"))
    assert(lh.lineage.impact("a", 5)(1) == List("default.b"))
    // cycle guard: a→b→a terminates
    lh.lineage.record(Seq("b"), "a", "op")
    assert(lh.lineage.downstream("a", 10).size == 3)
  }

  test("maintenance: compaction threshold + retention policy expiry") {
    val lh = seeded()
    // generate many small files via repeated appends
    (1 to 11).foreach(i => lh.dml.insertRows("sales",
      Seq(Map("id" -> (1000 + i), "region" -> "east", "amount" -> 1.0))))
    lh.maintenance.setPolicy(MaintenancePolicy("default.sales",
      compactFileThreshold = 5, snapshotRetain = 3))
    val planned = lh.maintenance.maintainTable("default.sales", dryRun = true)
    assert(planned.exists(_.action == "compact"))
    assert(planned.exists(_.action == "expire_snapshots"))
    val done = lh.maintenance.maintainTable("default.sales")
    assert(done.exists(_.action == "compact"))
    val tbl = lh.catalog.loadTable("sales")
    assert(tbl.currentSnapshot.get.files.size == 1)
    assert(tbl.read().count() == 61)
    // retention policy on another table
    lh.retention.setPolicy(RetentionPolicy("default.sales", maxSnapshots = Some(2)))
    val wouldExpire = lh.retention.evaluate("default.sales", dryRun = true)
    assert(wouldExpire.nonEmpty)
    lh.retention.evaluate("default.sales", dryRun = false)
    assert(lh.catalog.loadTable("sales").snapshots.size <= 3)
  }

  test("maintenance: eq-delete entry chain triggers compaction") {
    import org.apache.spark.sql.functions.col
    val lh = seeded()
    val tbl = lh.catalog.loadTable("sales")
    // N key-delete commits, each one eq-delete entry; file count stays at
    // 1-2, far below the compact threshold — only the entry chain grows
    (1 to 5).foreach(i =>
      tbl.deleteKeysMor(Seq("id"), Seq(i.toLong).toDF("id")))
    assert(tbl.currentSnapshot.get.eqDeleteFiles.size == 5)
    lh.maintenance.setPolicy(MaintenancePolicy("default.sales",
      compactFileThreshold = 100, snapshotRetain = 50,
      eqDeleteEntryThreshold = 5))
    val planned = lh.maintenance.maintainTable("default.sales", dryRun = true)
    assert(planned.exists(a => a.action == "compact" &&
      a.detail.contains("eq-delete")))
    lh.maintenance.maintainTable("default.sales")
    val after = lh.catalog.loadTable("sales").currentSnapshot.get
    // compaction absorbed the chain: reads pay zero eq-delete anti-joins
    assert(after.eqDeleteFiles.isEmpty)
    assert(after.deleteFiles.isEmpty)
    assert(lh.catalog.loadTable("sales").read().count() == 45)
    assert(!lh.catalog.loadTable("sales").read()
      .where(col("id") <= 5).limit(1).collect().nonEmpty)
  }

  test("auto-refresh cascade refreshes stale downstream matviews") {
    val lh = seeded()
    lh.matviews.create("totals", "SELECT region, sum(amount) AS t FROM sales GROUP BY region")
    lh.lineage.record(Seq("default.sales"), "default.mv_totals", "matview")
    lh.dml.insertRows("sales", Seq(Map("id" -> 77, "region" -> "west", "amount" -> 3.0)))
    assert(lh.matviews.isStale("totals"))
    val steps = lh.autoRefresh.trigger("default.sales")
    assert(steps.exists(s => s.kind == "refresh_matview" && s.status == "ok"))
    assert(!lh.matviews.isStale("totals"))
    assert(lh.autoRefresh.history().nonEmpty)
  }
}
