package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** GraftEngineReadRule: fallback-state (merge-on-read / schema-history)
  * `catalog.ns.table` reads are substituted with the engine's COLUMNAR
  * plan — no V1 row bridge — while write targets stay untouched; and the
  * engine-side assemble scan skips files from Catalyst-pushed data
  * filters (GraftFileIndex wired into every engine read, not just
  * prunedRead). */
class EngineReadSubstitutionSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private lazy val catName = s"gsub${System.nanoTime() % 100000}"
  private lazy val lh = {
    val wh = SparkFixture.tmpDir("graft-subst-")
    val l = graft.Lakehouse.open(spark, wh.toString)
    spark.conf.set(s"spark.sql.catalog.$catName",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catName.warehouse", wh.toString)
    l
  }

  private val SubstConf = "spark.graft.engineReadSubstitution"
  private def withSubst[T](on: Boolean)(f: => T): T = {
    spark.conf.set(SubstConf, on.toString)
    try f finally spark.conf.set(SubstConf, "true")
  }

  /** Two single-file range commits (ids 0-99 and 1000-1099) + a position
    * delete -> merge-on-read fallback state with boundable files. */
  private def seedMor(): Unit = {
    if (lh.catalog.tableExists("default.sm")) return
    val d = ((0L until 100L) ++ (1000L until 1100L))
      .map(i => (i, s"v$i")).toDF("id", "v")
    lh.catalog.createTable("default.sm", d.schema, Nil, Map.empty)
    val t = lh.catalog.loadTable("default.sm")
    t.append(d.where(col("id") < 100).coalesce(1))
    t.append(d.where(col("id") >= 1000).coalesce(1))
    t.deleteWhereMor(col("id") === 7L || col("id") === 1007L)
    assert(t.currentSnapshot.get.deleteFiles.nonEmpty)
  }

  /** The FINAL physical plan, descending through AQE. */
  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
  }

  private def collectScans(p: SparkPlan): Seq[SparkPlan] = {
    val here = p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f: SparkPlan
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      case r: org.apache.spark.sql.execution.RDDScanExec => r
      // the V1Scan bridge plans as a row-based V1 scan node
      case r: org.apache.spark.sql.execution.RowDataSourceScanExec => r
    }
    // AQE leaves (QueryStageExec) hide their subtree from collect
    val nested = p.collect {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectScans(q.plan)
    }.flatten
    here ++ nested
  }

  /** Files actually read by the DATA scans (schema contains `marker`,
    * distinguishing them from position-delete-file scans), from the
    * executed plan's own metrics — listFiles-level skipping shows here
    * and nowhere in the analyzed plan. */
  private def dataFilesRead(df: DataFrame, marker: String = "v"): Long =
    collectScans(finalPlan(df)).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.dataSchema.fieldNames.contains(marker) =>
        f.metrics("numFiles").value
    }.sum

  test("substituted MoR read is columnar FileSourceScan (no V1 row " +
      "bridge); rule off falls back to the BatchScan bridge; results " +
      "identical") {
    seedMor()
    val sql = s"SELECT id, v FROM $catName.default.sm WHERE id < 10 ORDER BY id"
    val on = withSubst(on = true) {
      val df = spark.sql(sql)
      val scans = collectScans(finalPlan(df))
      assert(scans.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]),
        s"substituted plan must scan parquet natively:\n$scans")
      assert(!scans.exists(x =>
        x.isInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] ||
          x.isInstanceOf[org.apache.spark.sql.execution.RowDataSourceScanExec]),
        "substituted plan must not contain the row-based bridge scan")
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    }
    val off = withSubst(on = false) {
      val df = spark.sql(sql)
      val scans = collectScans(finalPlan(df))
      assert(scans.exists(x =>
        x.isInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] ||
          x.isInstanceOf[org.apache.spark.sql.execution.RowDataSourceScanExec]),
        s"with the rule disabled the V1 bridge must serve the read:\n$scans")
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    }
    assert(on == off && on.length == 9, s"on=$on off=$off") // id 7 deleted
    assert(on == (0L until 10L).filterNot(_ == 7L).map(i => (i, s"v$i")))
  }

  test("pushed filter skips files THROUGH the substituted MoR plan: " +
      "manifest bounds drop the non-matching commit at listFiles time") {
    seedMor()
    val filtered = spark.sql(
      s"SELECT id, v FROM $catName.default.sm WHERE id >= 1000")
    assert(filtered.count() == 99) // 1007 deleted
    assert(dataFilesRead(filtered) == 1,
      "only the 1000-1099 file can satisfy id >= 1000")
    val full = spark.sql(s"SELECT id, v FROM $catName.default.sm")
    assert(full.count() == 198)
    assert(dataFilesRead(full) == 2)
  }

  test("engine API read gets the same listFiles skipping (assemble rides " +
      "GraftFileIndex): plain read().where() opens one file of two") {
    seedMor()
    val t = lh.catalog.loadTable("default.sm")
    val df = t.read().where(col("id") >= 1000).select("id", "v")
    assert(df.count() == 99)
    assert(dataFilesRead(df) == 1,
      "engine read must skip the 0-99 file from the pushed filter")
  }

  test("self-join of a fallback-state table substitutes both sides " +
      "unambiguously") {
    seedMor()
    val n = spark.sql(
      s"""SELECT COUNT(*) AS n FROM $catName.default.sm a
         |JOIN $catName.default.sm b ON a.id = b.id""".stripMargin)
      .head.getLong(0)
    assert(n == 198L, s"self-join over live rows, got $n")
  }

  test("write targets stay protected: INSERT INTO t SELECT FROM t " +
      "substitutes only the SOURCE side; MoR DELETE still routes " +
      "through the engine") {
    seedMor()
    if (!lh.catalog.tableExists("default.sw")) {
      val d = (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v")
      lh.catalog.createTable("default.sw", d.schema, Nil,
        Map("write.delete.mode" -> "merge-on-read"))
      lh.catalog.loadTable("default.sw").append(d)
      lh.catalog.loadTable("default.sw").deleteWhereMor(col("id") === 0L)
    }
    val before = lh.catalog.loadTable("default.sw").read().count()
    spark.sql(s"INSERT INTO $catName.default.sw " +
      s"SELECT id + 100, v FROM $catName.default.sw WHERE id = 5")
    assert(lh.catalog.loadTable("default.sw").read().count() == before + 1)
    spark.sql(s"DELETE FROM $catName.default.sw WHERE id = 105")
    val t = lh.catalog.loadTable("default.sw")
    assert(t.read().count() == before)
    assert(t.currentSnapshot.get.deleteFiles.nonEmpty,
      "delete mode property must still route to position deletes")
  }

  test("INSERT INTO a fallback-state table through a VIEW source: the " +
      "pre-conversion InsertIntoStatement target stays protected across " +
      "analyzer iterations") {
    seedMor()
    val before = lh.catalog.loadTable("default.sm").read().count()
    spark.sql(s"SELECT id + 2000 AS id, v FROM $catName.default.sm " +
      "WHERE id = 5").createOrReplaceTempView("ins_src_view")
    spark.sql(s"INSERT INTO $catName.default.sm SELECT * FROM ins_src_view")
    val t = lh.catalog.loadTable("default.sm")
    assert(t.read().count() == before + 1)
    assert(t.read().where(col("id") === 2005L).count() == 1L)
  }

  test("renamed schema history: the old-version group's scan translates " +
      "pushed leaves by field-id before pruning — file skipped, rows " +
      "exact") {
    if (!lh.catalog.tableExists("default.sr")) {
      val d1 = (0L until 50L).map(i => (i, s"a$i")).toDF("id", "a")
      lh.catalog.createTable("default.sr", d1.schema, Nil, Map.empty)
      val t = lh.catalog.loadTable("default.sr")
      t.append(d1.coalesce(1)) // schema v1: column named `a`
      t.renameColumn("a", "b")
      t.append((1000L until 1050L).map(i => (i, s"b$i")).toDF("id", "b")
        .coalesce(1)) // schema v2
    }
    // rename history -> fallback state -> substituted engine plan
    val hi = spark.sql(
      s"SELECT id, b FROM $catName.default.sr WHERE id >= 1000 ORDER BY id")
    assert(hi.count() == 50)
    assert(dataFilesRead(
      spark.sql(s"SELECT id, b FROM $catName.default.sr WHERE id >= 1000"),
      marker = "id") == 1,
      "bounds must skip the v1 file (leaf translated id->id across groups)")
    // filter on the RENAMED column prunes the v1 group via its old name
    val old = spark.sql(
      s"SELECT id, b FROM $catName.default.sr WHERE b >= 'b1' ORDER BY id")
    val oldRows = old.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(oldRows.length == 50 && oldRows.forall(_._2.startsWith("b")))
    assert(dataFilesRead(
      spark.sql(s"SELECT id, b FROM $catName.default.sr WHERE b >= 'b1'"),
      marker = "id") == 1,
      "v1 file's `a` bounds (all < 'b') must prune it for b >= 'b1'")
  }

  test("stale substitution re-pins per query execution: temp views and " +
      "derived frames over a fallback-state table observe new commits; " +
      "a clean-again head drops back to the plain read") {
    val d = (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
    lh.catalog.createTable("default.st", d.schema, Nil, Map.empty)
    val t = lh.catalog.loadTable("default.st")
    t.append(d.coalesce(1))
    t.deleteWhereMor(col("id") < 10L) // fallback state (90 live)
    val df = spark.table(s"$catName.default.st")
    df.createOrReplaceTempView("st_view")
    assert(spark.table("st_view").count() == 90)
    assert(df.count() == 90)
    // new commit AFTER the view's plan was analyzed (and pinned)
    lh.catalog.loadTable("default.st").deleteWhereMor(col("id") < 20L)
    assert(spark.table("st_view").count() == 80,
      "a temp view must observe commits made after its creation")
    // a frame COMPOSED over the already-analyzed df gets a fresh
    // QueryExecution -> re-pinned
    assert(df.where(lit(true)).count() == 80,
      "a derived frame must observe the new head")
    // append through the engine (commutes with MoR state)
    lh.catalog.loadTable("default.st")
      .append((500L until 510L).map(i => (i, s"n$i")).toDF("id", "v"))
    assert(spark.table("st_view").count() == 90)
    // compaction absorbs the delete state -> head is CLEAN again; the
    // tagged subtree must rebuild as the plain head read, not error
    lh.catalog.loadTable("default.st").compactSmall(Long.MaxValue)
    assert(lh.catalog.loadTable("default.st")
      .currentSnapshot.get.deleteFiles.isEmpty,
      "fixture: compaction must clear delete state")
    assert(spark.table("st_view").count() == 90,
      "a clean-again head must read exactly, through the refreshed plan")
    // and further commits on the clean head stay visible
    lh.catalog.loadTable("default.st").deleteWhereMor(col("id") >= 500L)
    assert(spark.table("st_view").count() == 80)
  }
}
