package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** DSv2 TableCatalog over IceLite (GraftCatalog): native
  * `catalog.ns.table` SQL resolution — no ns__table rewrite — with
  * manifest file skipping wired into the scan's pushed filters. */
class GraftCatalogSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  // one catalog instance per suite run, unique name to dodge the
  // session's catalog cache across test reruns
  private lazy val catName = s"gc${System.nanoTime() % 100000}"
  private lazy val lh = {
    val wh = SparkFixture.tmpDir("graft-dsv2-")
    val l = graft.Lakehouse.open(spark, wh.toString)
    spark.conf.set(s"spark.sql.catalog.$catName",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catName.warehouse", wh.toString)
    l
  }

  private def seed(): Unit = {
    if (lh.catalog.tableExists("sales.orders")) return
    lh.catalog.createNamespace("sales")
    lh.catalog.createNamespace("ref")
    val ord = (0 until 200).map(i => (i.toLong, i % 7, (i * 10).toLong))
      .toDF("o_id", "nat_id", "amount")
    lh.catalog.createTable("sales.orders", ord.schema, Nil, Map.empty)
    val t = lh.catalog.loadTable("sales.orders")
    // four single-file range commits so bounds pruning has work to do
    (0 until 4).foreach(b => t.append(
      ord.where(col("o_id") >= b * 50 && col("o_id") < (b + 1) * 50).coalesce(1)))
    val nat = (0 until 7).map(i => (i, s"nation$i")).toDF("nat_id", "n_name")
    lh.catalog.createTable("ref.nation", nat.schema, Nil, Map.empty)
    lh.catalog.loadTable("ref.nation").append(nat)
  }

  test("native catalog.ns.table resolution; two-namespace join without " +
      "any identifier rewrite") {
    seed()
    val got = spark.sql(
      s"""SELECT n.n_name, COUNT(*) AS n, SUM(o.amount) AS total
         |FROM $catName.sales.orders o JOIN $catName.ref.nation n
         |  ON o.nat_id = n.nat_id
         |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin).collect()
    val want = lh.catalog.loadTable("sales.orders").read().alias("o")
      .join(lh.catalog.loadTable("ref.nation").read().alias("n"), "nat_id")
      .groupBy("n_name").agg(count(lit(1)).as("n"), sum("amount").as("total"))
      .orderBy("n_name").collect()
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }

  test("pushed range filter reaches the manifest: native scan opens only " +
      "the matching files") {
    seed()
    def scannedFiles(sql: String): Int = {
      val df = spark.sql(sql)
      df.collect()
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan match {
            case fs: org.apache.spark.sql.execution.datasources.v2.FileScan =>
              fs.planInputPartitions().map {
                case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
                  fp.files.length
                case _ => 1
              }.sum
            case _ => -1
          }
      }.sum
    }
    val q = s"SELECT o_id, amount FROM $catName.sales.orders WHERE o_id >= 150"
    assert(spark.sql(q).count() == 50)
    // 1 of 4 range files can contain o_id >= 150
    assert(scannedFiles(q) == 1, s"expected 1 file after manifest pruning")
    // unfiltered scan sees all 4
    assert(scannedFiles(s"SELECT * FROM $catName.sales.orders") == 4)
  }

  test("SHOW + metadata surfaces work; DDL create/drop round-trips") {
    seed()
    val tables = spark.sql(s"SHOW TABLES IN $catName.sales").collect()
      .map(_.getString(1)).toSet
    assert(tables == Set("orders"))
    val nss = spark.sql(s"SHOW NAMESPACES IN $catName").collect()
      .map(_.getString(0)).toSet
    assert(nss.contains("sales") && nss.contains("ref"))
    spark.sql(s"CREATE TABLE $catName.ref.t2 (id BIGINT, v STRING)")
    assert(lh.catalog.tableExists("ref.t2"))
    spark.sql(s"DROP TABLE $catName.ref.t2")
    assert(!lh.catalog.tableExists("ref.t2"))
  }

  test("native INSERT INTO / INSERT OVERWRITE route through the engine's " +
      "commit protocol (snapshots, schema alignment, history)") {
    seed()
    spark.sql(s"CREATE TABLE $catName.ref.wt (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $catName.ref.wt VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $catName.ref.wt VALUES (3, 'c')")
    val t = lh.catalog.loadTable("ref.wt")
    assert(t.rawLog.map(_.operation) == List("append", "append"),
      "each INSERT must be one engine append snapshot")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $catName.ref.wt")
      .head.getLong(0) == 3)
    spark.sql(s"INSERT OVERWRITE $catName.ref.wt VALUES (9, 'z')")
    assert(t.rawLog.map(_.operation) == List("append", "append", "overwrite"))
    assert(spark.sql(s"SELECT id FROM $catName.ref.wt").collect()
      .map(_.getLong(0)).toSeq == Seq(9L))
    // time travel still works over natively-written snapshots
    assert(t.readAsOf("2").count() == 3)
    // the df writeTo API lands on the same path
    import spark.implicits._
    Seq((10L, "w")).toDF("id", "v").writeTo(s"$catName.ref.wt").append()
    assert(t.read().count() == 2)
    spark.sql(s"DROP TABLE $catName.ref.wt")
  }

  test("filter overwrite (REPLACE WHERE / writeTo.overwrite): exactly the " +
      "matching rows replaced, ONE snapshot, both CoW and MoR modes") {
    seed()
    spark.sql(s"CREATE TABLE $catName.ref.rw (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $catName.ref.rw VALUES " +
      (0 until 10).map(i => s"($i, 'old$i')").mkString(", "))
    val t = lh.catalog.loadTable("ref.rw")
    // SQL REPLACE WHERE, copy-on-write default
    spark.sql(s"INSERT INTO $catName.ref.rw REPLACE WHERE id >= 7 " +
      "VALUES (7, 'new7'), (77, 'new77')")
    assert(t.rawLog.size == 2, "the replace must land as ONE snapshot")
    val got = t.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == ((0 until 7).map(i => (i.toLong, s"old$i")) ++
      Seq((7L, "new7"), (77L, "new77"))), s"got $got")
    // writeTo(...).overwrite(cond) lands on the same path
    import spark.implicits._
    Seq((0L, "z0"), (100L, "z100")).toDF("id", "v")
      .writeTo(s"$catName.ref.rw").overwrite(col("id") < 1)
    assert(t.read().count() == 10 &&
      t.read().where(col("v") === "z0").count() == 1)
    // merge-on-read mode: same result, NO data file rewritten
    t.setProperty("write.overwrite.mode", "merge-on-read")
    val filesBefore = t.currentSnapshot.get.files.map(_.path).toSet
    spark.sql(s"INSERT INTO $catName.ref.rw REPLACE WHERE id >= 100 " +
      "VALUES (100, 'm100')")
    val snap = lh.catalog.loadTable("ref.rw").currentSnapshot.get
    assert(filesBefore.subsetOf(snap.files.map(_.path).toSet),
      "MoR replace must keep every pre-existing data file")
    assert(snap.deleteFiles.nonEmpty, "MoR replace uses position deletes")
    assert(lh.catalog.loadTable("ref.rw").read()
      .where(col("id") === 100L).collect().map(_.getString(1)).toSeq ==
      Seq("m100"))
    // both surfaces audited
    val ops = lh.audit.entries(table = Some("ref.rw")).map(_.operation)
    assert(ops.count(_ == "overwrite") >= 3)
    spark.sql(s"DROP TABLE $catName.ref.rw")
  }

  test("SQL INSERT/DELETE enforce validation rules and write audit " +
      "entries exactly like the engine API") {
    seed()
    spark.sql(s"CREATE TABLE $catName.ref.vt (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $catName.ref.vt VALUES (1, 'a'), (2, 'b')")
    lh.validation.addRule(graft.governance.ValidationRule(
      "vt-unique-id", "ref.vt", "unique", List("id")))
    // duplicate id through plain SQL must be REJECTED by the same rule
    // Dml.insertDf enforces — the SQL surface is not a validation bypass
    intercept[Exception] {
      spark.sql(s"INSERT INTO $catName.ref.vt VALUES (1, 'dup')")
    }
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $catName.ref.vt")
      .head.getLong(0) == 2, "the rejected insert must commit nothing")
    spark.sql(s"DELETE FROM $catName.ref.vt WHERE id = 2")
    // both mutations audited under the same table ident
    val ops = lh.audit.entries(table = Some("ref.vt")).map(_.operation)
    assert(ops.contains("insert") && ops.contains("delete"),
      s"SQL-surface mutations must audit like the API: $ops")
    spark.sql(s"DROP TABLE $catName.ref.vt")
  }

  test("native DELETE FROM: copy-on-write by default, merge-on-read by " +
      "table property; untranslatable predicates route to the row-level " +
      "strategy") {
    seed()
    spark.sql(s"CREATE TABLE $catName.ref.dt (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $catName.ref.dt VALUES " +
      (0 until 20).map(i => s"($i, 'v$i')").mkString(", "))
    val t = lh.catalog.loadTable("ref.dt")
    assert(t.read().count() == 20)
    spark.sql(s"DELETE FROM $catName.ref.dt WHERE id < 5")
    assert(t.read().count() == 15)
    assert(t.currentSnapshot.get.operation == "overwrite",
      "default delete mode is copy-on-write")
    t.setProperty("write.delete.mode", "merge-on-read")
    spark.sql(s"DELETE FROM $catName.ref.dt WHERE id >= 18 OR v = 'v10'")
    assert(t.read().count() == 12)
    assert(lh.catalog.loadTable("ref.dt").currentSnapshot.get
      .deleteFiles.nonEmpty, "property must route to position deletes")
    // an untranslatable predicate (refused by canDeleteWhere in rounds
    // past) now routes through GraftRowLevelStrategy — exact, MoR here
    spark.sql(s"DELETE FROM $catName.ref.dt WHERE id % 2 = 0")
    val left = lh.catalog.loadTable("ref.dt").read()
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(left.forall(_ % 2 == 1) && left.size == 7, s"got $left")
    spark.sql(s"DROP TABLE $catName.ref.dt")
  }

  test("additive schema evolution reads natively (missing columns null, " +
      "matching the engine's field-id read); renamed history reads " +
      "through the engine fallback, still exact") {
    seed()
    if (!lh.catalog.tableExists("ref.ev")) {
      val d = (0 until 5).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      lh.catalog.createTable("ref.ev", d.schema, Nil, Map.empty)
      val t = lh.catalog.loadTable("ref.ev")
      t.append(d) // schema v1 files
      t.addColumn("extra", "long") // additive evolution
      import org.apache.spark.sql.functions.lit
      t.append((5 until 8).map(i => (i.toLong, s"v$i", i * 10L))
        .toDF("id", "v", "extra")) // schema v2 files
    }
    val got = spark.sql(
        s"SELECT id, extra FROM $catName.ref.ev ORDER BY id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    val want = lh.catalog.loadTable("ref.ev").read().orderBy("id")
      .select("id", "extra").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSeq == want.toSeq && got.length == 8,
      "native scan must equal the engine's field-id read after an " +
        "additive evolution")
    // a RENAME makes by-name file scans wrong -> the engine-read fallback
    // takes over: the SQL surface keeps working and matches the engine's
    // field-id read (old files' `v` values appear under the new name)
    lh.catalog.loadTable("ref.ev").renameColumn("v", "label")
    val gotR = spark.sql(
      s"SELECT id, label FROM $catName.ref.ev ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val wantR = lh.catalog.loadTable("ref.ev").read().orderBy("id")
      .select("id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(gotR.toSeq == wantR.toSeq && gotR.length == 8 &&
      gotR.head._2 == "v0",
      "renamed-history scan must realias old files by field-id")
  }

  test("drop + re-add of a same-named column must NOT resurrect dropped " +
      "data through the native scan (field-ids differ -> engine fallback " +
      "reads old files as NULL)") {
    seed()
    if (!lh.catalog.tableExists("ref.readd")) {
      val d = (0 until 4).map(i => (i.toLong, i * 100L)).toDF("id", "score")
      lh.catalog.createTable("ref.readd", d.schema, Nil, Map.empty)
      val t = lh.catalog.loadTable("ref.readd")
      t.append(d) // schema v1 files carry `score` under its ORIGINAL id
      t.dropColumn("score")
      t.addColumn("score", "long") // same name+type, NEW field-id
      t.append(Seq((9L, 999L)).toDF("id", "score")) // schema v3 file
    }
    val got = spark.sql(
      s"SELECT id, score FROM $catName.ref.readd ORDER BY id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    val want = lh.catalog.loadTable("ref.readd").read().orderBy("id")
      .select("id", "score").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSeq == want.toSeq,
      "native scan must equal the engine read after drop + re-add")
    assert(got.count(_._2 == -1L) == 4 && got.exists(_._2 == 999L),
      s"old files' dropped values must read as NULL, got ${got.toSeq}")
  }

  test("merge-on-read delete state reads through the engine fallback " +
      "(deletes applied, pushed filters still skip), never misread") {
    seed()
    if (!lh.catalog.tableExists("sales.mor")) {
      val d = (0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      lh.catalog.createTable("sales.mor", d.schema, Nil, Map.empty)
      lh.catalog.loadTable("sales.mor").append(d)
      lh.catalog.loadTable("sales.mor").deleteWhereMor(col("id") < 5)
    }
    // the native SQL surface applies the position deletes exactly
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $catName.sales.mor")
      .head.getLong(0) == 15)
    val got = spark.sql(
      s"SELECT id FROM $catName.sales.mor WHERE id < 7 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(5L, 6L),
      s"deletes + residual filter must both apply, got $got")
    // equality deletes and a later re-append (the covered-up-to rule)
    // read exactly too
    if (lh.catalog.loadTable("sales.mor").currentSnapshot.get
        .eqDeleteFiles.isEmpty) {
      val t = lh.catalog.loadTable("sales.mor")
      t.deleteKeysMor(Seq("id"), Seq(6L, 7L).toDF("id"))
      t.append(Seq((6L, "readd")).toDF("id", "v")) // after the eq-delete
    }
    val got2 = spark.sql(
      s"SELECT id, v FROM $catName.sales.mor WHERE id < 9 ORDER BY id, v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val want2 = lh.catalog.loadTable("sales.mor").read()
      .where(col("id") < 9).orderBy("id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got2 == want2 && got2.contains((6L, "readd")) &&
      !got2.contains((6L, "v6")) && !got2.exists(_._1 == 7L),
      s"eq-delete coverage rule must hold on the SQL surface: $got2")
    // after folding + full compaction the direct parquet path returns and
    // is still exact
    lh.catalog.loadTable("sales.mor").compact(targetFiles = 1)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $catName.sales.mor")
      .head.getLong(0) ==
      lh.catalog.loadTable("sales.mor").read().count())
  }

  test("SQL time travel: VERSION AS OF (id and tag) and TIMESTAMP AS OF " +
      "resolve exactly like the engine's readAsOf; pinned tables refuse " +
      "writes") {
    lh.catalog.createTable("sales.tt",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val t = lh.catalog.loadTable("sales.tt")
    t.append((0L until 10L).map(i => (i, s"a$i")).toDF("id", "v")) // snap 1
    t.tagSnapshot("v1", Some("1"))
    t.append((10L until 20L).map(i => (i, s"b$i")).toDF("id", "v")) // snap 2
    t.deleteWhereMor(col("id") === 3L) // snap 3: MoR state
    // by snapshot id
    assert(spark.sql(
      s"SELECT COUNT(*) AS n FROM $catName.sales.tt VERSION AS OF '1'")
      .head.getLong(0) == 10L)
    // by tag
    val tagRows = spark.sql(
      s"SELECT id FROM $catName.sales.tt VERSION AS OF 'v1' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(tagRows == (0L until 10L))
    // head (with MoR delete state) still exact through the pinned path
    assert(spark.sql(
      s"SELECT COUNT(*) AS n FROM $catName.sales.tt VERSION AS OF '3'")
      .head.getLong(0) == 19L)
    // TIMESTAMP AS OF: an instant after snap 2 but before snap 3 —
    // engine semantics: last snapshot at or before the instant
    val s2ms = t.snapshotById(2L).get.timestampMs
    val s3ms = t.snapshotById(3L).get.timestampMs
    assume(s3ms > s2ms, "timestamps must be distinct for the AS OF probe")
    val iso = java.time.Instant.ofEpochMilli(s3ms - 1).toString
    assert(spark.sql(
      s"SELECT COUNT(*) AS n FROM $catName.sales.tt TIMESTAMP AS OF '$iso'")
      .head.getLong(0) == 20L)
    // parity with the engine API on every ref
    for (ref <- Seq("1", "2", "3", "v1")) {
      val sqlRows = spark.sql(
        s"SELECT id, v FROM $catName.sales.tt VERSION AS OF '$ref'")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val apiRows = t.readAsOf(ref)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(sqlRows == apiRows, s"ref '$ref' must match readAsOf")
    }
    // a pinned table face refuses writes at plan time
    val pinned = new GraftSparkTable(lh, "sales.tt", Some("1"))
    intercept[IllegalArgumentException] {
      pinned.newWriteBuilder(null)
    }
    assert(!pinned.canDeleteWhere(
      Array.empty[org.apache.spark.sql.sources.Filter]))
  }

  test("CALL cat.system.<proc>: tag / rollback / compact / compact_deletes " +
      "/ expire ride the engine's own maintenance ops and return result " +
      "rows") {
    lh.catalog.createTable("sales.proc",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val t = lh.catalog.loadTable("sales.proc")
    t.append((0L until 40L).map(i => (i, s"a$i")).toDF("id", "v")
      .coalesce(2)) // snap 1
    t.append((40L until 80L).map(i => (i, s"b$i")).toDF("id", "v")
      .coalesce(2)) // snap 2
    // tag the head, then roll back to snap 1 and verify the read
    val tagged = spark.sql(
      s"CALL $catName.system.tag_snapshot('sales.proc', 'keep')")
      .head.getLong(0)
    assert(tagged == 2L)
    val rolled = spark.sql(
      s"CALL $catName.system.rollback_to_snapshot('sales.proc', '1')")
      .head.getLong(0)
    assert(rolled == 3L) // rollback commits a NEW snapshot
    assert(lh.catalog.loadTable("sales.proc").read().count() == 40L)
    // compact to one file (positional default target_files = 1)
    val comp = spark.sql(s"CALL $catName.system.compact('sales.proc')").head
    assert(comp.getInt(1) == 1, s"compact must land 1 file, got $comp")
    assert(lh.catalog.loadTable("sales.proc").read().count() == 40L)
    // nothing to fold -> folded=false
    assert(!spark.sql(
      s"CALL $catName.system.compact_deletes('sales.proc')").head.getBoolean(0))
    // MoR delete, then fold + verify
    lh.catalog.loadTable("sales.proc").deleteWhereMor(col("id") < 2L)
    lh.catalog.loadTable("sales.proc").deleteWhereMor(col("id") === 5L)
    assert(spark.sql(
      s"CALL $catName.system.compact_deletes('sales.proc')").head.getBoolean(0))
    assert(lh.catalog.loadTable("sales.proc").read().count() == 37L)
    // expire with retain_last: the tagged snapshot stays pinned
    val exp = spark.sql(s"CALL $catName.system.expire_snapshots(" +
      s"'sales.proc', retain_last => 1)").head
    assert(exp.getLong(0) >= 1L, s"expected expirations, got $exp")
    val t2 = lh.catalog.loadTable("sales.proc")
    assert(t2.snapshotById(2L).isDefined, "tagged snapshot must survive")
    assert(t2.readAsOf("keep").count() == 80L)
    assert(t2.read().count() == 37L)
    // remove_tag, listProcedures surface
    assert(spark.sql(
      s"CALL $catName.system.remove_tag('sales.proc', 'keep')")
      .head.getBoolean(0))
    // orphan GC through SQL: dry run counts, real run sweeps, data intact
    val dryN = spark.sql(s"CALL $catName.system.remove_orphans(" +
      s"'sales.proc', dry_run => true)").head.getLong(0)
    val swept = spark.sql(
      s"CALL $catName.system.remove_orphans('sales.proc')").head
    assert(swept.getLong(0) == dryN && swept.getBoolean(1))
    assert(lh.catalog.loadTable("sales.proc").read().count() == 37L,
      "orphan sweep must not touch live data")
    assert(spark.sql(s"CALL $catName.system.remove_orphans(" +
      s"'sales.proc', dry_run => true)").head.getLong(0) == 0L)
    val cat = spark.sessionState.catalogManager.catalog(catName)
      .asInstanceOf[GraftCatalog]
    assert(cat.listProcedures(Array("system")).map(_.name).toSet ==
      GraftProcedures.names.toSet)
  }

  test("metadata tables: cat.ns.t.snapshots / files / delete_files / " +
      "tags / history / properties / partitions inspect live state " +
      "from SQL") {
    lh.catalog.createTable("sales.mt",
      Seq("id" -> "long", "v" -> "string"), Nil, Map("owner" -> "graft"))
    val t = lh.catalog.loadTable("sales.mt")
    t.append((0L until 30L).map(i => (i, s"a$i")).toDF("id", "v")
      .coalesce(2)) // snap 1: 2 files
    t.deleteWhereMor(col("id") < 3L) // snap 2: MoR position deletes
    t.tagSnapshot("m1")
    val snaps = spark.sql(s"SELECT snapshot_id, operation, data_files, " +
      s"live_rows FROM $catName.sales.mt.snapshots ORDER BY snapshot_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(snaps == Seq((1L, "append", 2L, 30L), (2L, "delete", 2L, 27L)),
      s"snapshots: $snaps")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $catName.sales.mt.files")
      .head.getLong(0) == 2L)
    val dels = spark.sql(s"SELECT delete_type, matched_rows FROM " +
      s"$catName.sales.mt.delete_files").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(dels == Seq(("position", 3L)), s"delete_files: $dels")
    assert(spark.sql(s"SELECT tag, snapshot_id FROM $catName.sales.mt.tags")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("m1", 2L)))
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM " +
      s"$catName.sales.mt.history WHERE is_current_ancestor")
      .head.getLong(0) == 2L)
    assert(spark.sql(s"SELECT value FROM $catName.sales.mt.properties " +
      s"WHERE key = 'owner'").head.getString(0) == "graft")
    // partitions face: per-partition file/row/byte stats from manifests —
    // an unpartitioned table reports one <unpartitioned> row...
    val up = spark.sql(s"SELECT partition, data_files, row_count FROM " +
      s"$catName.sales.mt.partitions").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(up == Seq(("<unpartitioned>", 2L, 30L)), s"partitions: $up")
    // ...a partitioned one reports its live dirs with exact counts
    lh.catalog.createTable("sales.mtp",
      Seq("id" -> "long", "cat" -> "string"), Seq("identity(cat)"), Map.empty)
    lh.catalog.loadTable("sales.mtp").append(
      Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "cat")
        .repartition(2, col("cat")))
    val parts = spark.sql(s"SELECT partition, row_count FROM " +
      s"$catName.sales.mtp.partitions ORDER BY partition").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(parts == Seq(("_p_cat=a", 2L), ("_p_cat=b", 1L)), s"parts: $parts")
    // metadata joins with the data surface in one query
    val joined = spark.sql(
      s"""SELECT s.snapshot_id, COUNT(d.id) AS n
         |FROM $catName.sales.mt.snapshots s CROSS JOIN $catName.sales.mt d
         |WHERE s.snapshot_id = 2 GROUP BY s.snapshot_id""".stripMargin)
      .head
    assert(joined.getLong(0) == 2L && joined.getLong(1) == 27L)
    // the STATIC per-face schemas (what Table.schema() serves during
    // analysis, no frame rebuild) must never drift from frame()'s output
    val tMeta = lh.catalog.loadTable("sales.mt")
    for (face <- GraftMetaTables.Names) {
      val built = GraftMetaTables.frame(spark, tMeta, face).schema
        .fields.map(f => (f.name, f.dataType)).toSeq
      val static = GraftMetaTables.Schemas(face)
        .fields.map(f => (f.name, f.dataType)).toSeq
      assert(built == static, s"schema drift on metadata face '$face'")
    }
    // a typo'd base table reports the standard not-found error
    intercept[org.apache.spark.sql.catalyst.analysis.NoSuchTableException] {
      spark.sessionState.catalogManager.catalog(catName)
        .asInstanceOf[GraftCatalog].loadTable(
          org.apache.spark.sql.connector.catalog.Identifier.of(
            Array("sales", "nope"), "snapshots"))
    }
  }

  test("changes metadata face: cat.ns.t.changes replays the commit log " +
      "from SQL; from_id/to_id options prune to a commit range; empty " +
      "table and compaction commits replay empty") {
    lh.catalog.createTable("sales.chf",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    // empty table: the face is queryable, zero rows, data cols + stamps
    val empty = spark.sql(s"SELECT * FROM $catName.sales.chf.changes")
    assert(empty.columns.toSeq ==
      Seq("id", "v", "_change_type", "_commit_id", "_changed_columns"))
    assert(empty.count() == 0)
    // an explicit from_id on a ZERO-commit table replays empty too —
    // nothing was ever expired there, so the offset contract has nothing
    // to refuse (regression: the strict-from validation must not run
    // before the empty-table branch)
    assert(spark.read.option("from_id", "1")
      .table(s"$catName.sales.chf.changes").count() == 0)
    val t = lh.catalog.loadTable("sales.chf")
    t.append((0L until 10L).map(i => (i, s"a$i")).toDF("id", "v")) // c1
    t.append((10L until 14L).map(i => (i, s"b$i")).toDF("id", "v")) // c2
    t.deleteWhereMor(col("id") < 2L) // c3: MoR position delete
    val all = spark.sql(s"SELECT _change_type, COUNT(*) AS n FROM " +
      s"$catName.sales.chf.changes GROUP BY 1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all == Map("insert" -> 14L, "delete" -> 2L), s"changes: $all")
    // bounds (from_id exclusive, to_id inclusive): (1, 2] = c2's inserts
    val c2 = spark.read.option("from_id", "1").option("to_id", "2")
      .table(s"$catName.sales.chf.changes")
    assert(c2.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (10L until 14L))
    assert(c2.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("insert"))
    // pair_keys (Iceberg's identifier_columns): an update commit's
    // delete+insert pair reads back as update_before/update_after with
    // the REAL changed-column set
    t.updateWhereMor(col("id") === 5L,
      Map("v" -> org.apache.spark.sql.functions.lit("upd5"))) // c4
    val paired = spark.read.option("from_id", "3").option("to_id", "4")
      .option("pair_keys", "id").table(s"$catName.sales.chf.changes")
      .collect().map(r => (r.getAs[String]("_change_type"),
        r.getAs[String]("v"), r.getAs[Seq[String]]("_changed_columns")))
      .sortBy(_._1).toSeq
    assert(paired == Seq(("update_after", "upd5", Seq("v")),
      ("update_before", "a5", Seq("v"))), s"paired: $paired")
    // a routine compaction replays empty through the face (live-rows-
    // preserved contract) — maintenance must never look like churn
    t.compact(targetFiles = 1)
    assert(spark.read.option("from_id", "4")
      .table(s"$catName.sales.chf.changes").count() == 0)
  }

  test("changes face pushes _commit_id bounds into the replay: a SQL " +
      "WHERE prunes to the requested commits — and keeps working after " +
      "older commits expire, where the unbounded face must refuse") {
    lh.catalog.createTable("sales.chp",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val t = lh.catalog.loadTable("sales.chp")
    t.append((0L until 10L).map(i => (i, s"a$i")).toDF("id", "v")) // c1
    t.append((10L until 14L).map(i => (i, s"b$i")).toDF("id", "v")) // c2
    t.deleteWhereMor(col("id") === 3L) // c3
    t.append((20L until 23L).map(i => (i, s"c$i")).toDF("id", "v")) // c4
    // plain-SQL bound replays exactly (2, head]: c3's delete + c4's inserts
    val recent = spark.sql(s"SELECT _change_type, id FROM " +
      s"$catName.sales.chp.changes WHERE _commit_id > 2").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(recent == Set(("delete", 3L), ("insert", 20L), ("insert", 21L),
      ("insert", 22L)), s"recent: $recent")
    // equality bound → exactly one commit's records
    assert(spark.sql(s"SELECT COUNT(*) FROM $catName.sales.chp.changes " +
      "WHERE _commit_id = 4").head.getLong(0) == 3L)
    // expire c1: commit 2's parent entry is gone, so the UNBOUNDED face
    // (which must replay c2) refuses loudly …
    val expired = t.expireSnapshots(retainLast = Some(3))
    assert(expired == List(1L))
    val e = intercept[Exception](
      spark.sql(s"SELECT COUNT(*) FROM $catName.sales.chp.changes").collect())
    assert(e.getMessage.contains("expired"), s"got: ${e.getMessage}")
    // … while the SAME bound keeps working: filter semantics replay only
    // the retained in-range commits — the 100 TB case where the log tail
    // is long gone and SQL asks about the last few commits
    assert(spark.sql(s"SELECT COUNT(*) FROM $catName.sales.chp.changes " +
      "WHERE _commit_id > 2").head.getLong(0) == 4L)
    // an EXPLICIT from_id is a resume point: even when a higher pushed
    // bound supersedes it as the effective replay start, an expired
    // from_id must still refuse — an extra WHERE clause can never
    // silently waive the offset-consumer contract
    val e2 = intercept[Exception](
      spark.read.option("from_id", "1")
        .table(s"$catName.sales.chp.changes")
        .where("_commit_id > 2").count())
    assert(e2.getMessage.contains("expired"), s"got: ${e2.getMessage}")
    // a RETAINED explicit from_id composes with a pushed bound: the
    // replay starts at the tighter of the two
    assert(spark.read.option("from_id", "2")
      .table(s"$catName.sales.chp.changes")
      .where("_commit_id > 3").count() == 3L)
  }

  test("ALTER TABLE: add/rename/drop column ride field-id evolution " +
      "(old files resolve, never rewritten); SET/UNSET TBLPROPERTIES " +
      "ride the metadata CAS; unsupported shapes refuse loudly") {
    lh.catalog.createTable("sales.alt",
      Seq("id" -> "long", "a" -> "string"), Nil, Map.empty)
    lh.catalog.loadTable("sales.alt")
      .append((0L until 10L).map(i => (i, s"a$i")).toDF("id", "a"))
    val fileCountBefore =
      lh.catalog.loadTable("sales.alt").currentSnapshot.get.files.size
    spark.sql(s"ALTER TABLE $catName.sales.alt ADD COLUMN score DOUBLE")
    spark.sql(s"ALTER TABLE $catName.sales.alt RENAME COLUMN a TO label")
    // evolution is METADATA-ONLY: same data files, old files resolve
    val t = lh.catalog.loadTable("sales.alt")
    assert(t.currentSnapshot.get.files.size == fileCountBefore)
    assert(t.schema.fieldNames.toSeq == Seq("id", "label", "score"))
    val rows = spark.sql(s"SELECT id, label, score FROM $catName.sales.alt " +
      s"WHERE id = 3").head
    assert(rows.getString(1) == "a3" && rows.isNullAt(2),
      "old files must resolve renamed/added columns by field-id")
    spark.sql(s"ALTER TABLE $catName.sales.alt DROP COLUMN score")
    assert(lh.catalog.loadTable("sales.alt").schema.fieldNames.toSeq ==
      Seq("id", "label"))
    spark.sql(s"ALTER TABLE $catName.sales.alt " +
      s"SET TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    assert(lh.catalog.loadTable("sales.alt").meta
      .properties("write.delete.mode") == "merge-on-read")
    spark.sql(s"ALTER TABLE $catName.sales.alt " +
      s"UNSET TBLPROPERTIES ('write.delete.mode')")
    assert(!lh.catalog.loadTable("sales.alt").meta
      .properties.contains("write.delete.mode"))
    // type changes have no exact field-id story on this surface
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $catName.sales.alt ALTER COLUMN id TYPE INT")
    }
    // multi-change statements validate against the EVOLVING schema before
    // applying ANY change: a semantically-failing second change (dup add,
    // rename collision) must leave the statement fully unapplied
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $catName.sales.alt ADD COLUMNS (x INT, x INT)")
    }
    assert(!lh.catalog.loadTable("sales.alt").schema.fieldNames.contains("x"),
      "a failing multi-add must apply NOTHING")
    intercept[Exception] {
      // second rename collides with the first's target
      spark.sql(s"ALTER TABLE $catName.sales.alt RENAME COLUMN label TO id")
    }
    assert(lh.catalog.loadTable("sales.alt").schema.fieldNames.toSeq ==
      Seq("id", "label"), "a colliding rename must apply nothing")
  }

  test("CREATE TABLE … PARTITIONED BY maps DSv2 transforms onto the " +
      "engine's spec grammar; writes lay out by the spec and scans prune") {
    spark.sql(s"""CREATE TABLE $catName.sales.pt
      | (id BIGINT, ts TIMESTAMP, v STRING)
      | USING graft PARTITIONED BY (bucket(4, id), days(ts))""".stripMargin)
    val t = lh.catalog.loadTable("sales.pt")
    assert(t.meta.partitionSpec == List("bucket(4,id)", "day(ts)"),
      s"spec: ${t.meta.partitionSpec}")
    (0L until 40L).map(i => (i,
      java.sql.Timestamp.valueOf(s"2024-01-0${1 + (i % 3)} 10:00:00"),
      s"v$i")).toDF("id", "ts", "v").createOrReplaceTempView("pt_src")
    spark.sql(s"INSERT INTO $catName.sales.pt SELECT * FROM pt_src")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $catName.sales.pt")
      .head.getLong(0) == 40L)
    // partition-dir pruning: a one-day filter reads a subset of files
    val all = lh.catalog.loadTable("sales.pt").currentSnapshot.get.files.size
    assert(all > 1, s"expected multiple partition files, got $all")
    val pruned = spark.sql(s"SELECT id FROM $catName.sales.pt " +
      s"WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'")
    pruned.collect()
    val read = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan match {
          case fs: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            fs.planInputPartitions().map {
              case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
                fp.files.length
              case _ => 1
            }.sum
          case _ => -1
        }
    }.sum
    assert(pruned.count() == 13L)
    assert(read > 0 && read < all,
      s"day(ts) partition dirs must prune the scan: read $read of $all")
  }

  test("history.is_current_ancestor follows the state lineage: commits " +
      "discarded by a rollback report false") {
    seed()
    val d = (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v")
    lh.catalog.createTable("ref.hist", d.schema, Nil, Map.empty)
    val t = lh.catalog.loadTable("ref.hist")
    t.append(d.where(col("id") < 5))   // snap 1
    t.append(d.where(col("id") >= 5))  // snap 2 (to be discarded)
    t.deleteWhereMor(col("id") === 1L) // snap 3 (to be discarded)
    t.rollbackTo("1")                  // snap 4: state = snap 1
    t.append(d.where(col("id") === 9L)) // snap 5 on the restored state
    val hist = spark.sql(
      s"SELECT snapshot_id, is_current_ancestor FROM $catName.ref.hist.history")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(hist == Map(1L -> true, 2L -> false, 3L -> false,
      4L -> true, 5L -> true), s"got $hist")
    spark.sql(s"DROP TABLE $catName.ref.hist")
  }

  test("CTAS / partitioned CTAS / RTAS: tables land with field-id " +
      "schemas, the query's rows, and live partition layouts") {
    seed()
    // plain CTAS of a filtered join
    spark.sql(s"""CREATE TABLE $catName.sales.ct AS
      | SELECT o.o_id, n.n_name, o.amount
      | FROM $catName.sales.orders o
      | JOIN $catName.ref.nation n ON o.nat_id = n.nat_id
      | WHERE o.amount >= 1900""".stripMargin)
    val ct = lh.catalog.loadTable("sales.ct")
    assert(ct.read().count() == 10)
    // engine-assigned field-ids on every column (the CTAS schema came
    // from the query, not a DDL — createTable must still stamp ids)
    assert(ct.schema.fields.forall(f =>
      graft.core.TableMeta.fieldId(f).isDefined),
      s"missing field-ids: ${ct.schema.treeString}")
    assert(spark.sql(s"SELECT MIN(o_id) AS m FROM $catName.sales.ct")
      .head.getLong(0) == 190L)
    // CTAS into an existing name refuses (no silent replace)
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $catName.sales.ct AS SELECT 1 AS x")
    }
    // partitioned CTAS: transforms flow through TransformBridge like DDL
    spark.sql(s"""CREATE TABLE $catName.sales.ctp
      | PARTITIONED BY (n_name)
      | AS SELECT * FROM $catName.sales.ct""".stripMargin)
    val ctp = lh.catalog.loadTable("sales.ctp")
    assert(ctp.meta.allTransforms.exists(t =>
      t.isInstanceOf[graft.core.PartitionTransform.Identity] &&
        t.source == "n_name"),
      s"spec: ${ctp.meta.partitionSpec}")
    assert(ctp.read().count() == 10)
    assert(ctp.currentSnapshot.get.files.forall(_.path.contains("_p_n_name=")),
      "partitioned CTAS must lay files out by the spec")
    // RTAS: drops + recreates with the new query's schema and rows
    spark.sql(s"REPLACE TABLE $catName.sales.ct AS " +
      s"SELECT o_id FROM $catName.sales.ctp WHERE o_id >= 195")
    val ct2 = lh.catalog.loadTable("sales.ct")
    assert(ct2.schema.fieldNames.toSeq == Seq("o_id"))
    assert(ct2.read().as[Long].collect().sorted.toSeq ==
      (195L to 199L))
    spark.sql(s"DROP TABLE $catName.sales.ct")
    spark.sql(s"DROP TABLE $catName.sales.ctp")
  }

  test("ALTER TABLE … RENAME TO: metadata move — reads, time travel, " +
      "tags, MoR delete state and governance stores all follow; the " +
      "commit protocol is intact at the new path") {
    val rows = (0 until 60).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    lh.catalog.createTable("default.rn_a", rows.schema, Nil,
      Map("write.delete.mode" -> "merge-on-read"))
    val t = lh.catalog.loadTable("default.rn_a")
    t.append(rows.where(col("id") < 30).coalesce(1))
    t.append(rows.where(col("id") >= 30).coalesce(1))
    t.tagSnapshot("v1", Some("1"))
    // MoR position-delete state: delete-manifest paths must survive the
    // move (the rename re-points every absolute metadata path)
    lh.dml.delete("default.rn_a", "id >= 55")
    lh.sla.setPolicy(graft.governance.SlaPolicy("default.rn_a",
      minRowCount = Some(1L)))
    lh.retention.setPolicy(graft.orchestration.RetentionPolicy(
      "default.rn_a", maxSnapshots = Some(100)))
    lh.validation.addRule(graft.governance.ValidationRule(
      "rn-nn", "default.rn_a", "not_null", List("v")))
    lh.lineage.record(Seq("default.rn_a"), "default.rn_downstream", "ctas")
    lh.tagging.addTag("default.rn_a", "golden")
    spark.sql(s"ALTER TABLE $catName.default.rn_a RENAME TO default.rn_b")
    assert(!lh.catalog.tableExists("default.rn_a"))
    val t2 = lh.catalog.loadTable("default.rn_b")
    assert(t2.read().count() == 55,
      "MoR delete state must apply through the re-pointed manifests")
    assert(spark.sql(s"SELECT count(*) AS n FROM $catName.default.rn_b")
      .head.getLong(0) == 55)
    // time travel: snapshot ids and tags resolve on the new name
    assert(t2.readAsOf("1").count() == 30)
    assert(t2.readAsOf("v1").count() == 30)
    // governance stores followed the rename
    assert(lh.sla.policy("default.rn_b").isDefined &&
      lh.sla.policy("default.rn_a").isEmpty)
    assert(lh.retention.policy("default.rn_b").isDefined)
    assert(lh.validation.listRules(Some("default.rn_b")).nonEmpty)
    assert(lh.lineage.edges().exists(_.sources.contains("default.rn_b")))
    assert(!lh.lineage.edges().exists(_.sources.contains("default.rn_a")))
    assert(lh.tagging.tags("default.rn_b") == List("golden"))
    // the commit protocol still works at the new path (heads CAS, stage
    // claim, manifest append)
    t2.append(Seq((100L, "post")).toDF("id", "v"))
    assert(lh.catalog.loadTable("default.rn_b").read().count() == 56)
    // validation rules gate writes under the NEW name (a stale key would
    // silently stop enforcing)
    intercept[Exception] {
      lh.dml.insertRows("default.rn_b",
        Seq(Map[String, Any]("id" -> 200, "v" -> null)))
    }
    // old name is reusable afterwards
    lh.catalog.createTable("default.rn_a",
      Seq("x" -> "long"), Nil, Map.empty)
    assert(lh.catalog.loadTable("default.rn_a").read().count() == 0)
  }

  test("rename edge contracts: unqualified target keeps the SOURCE " +
      "namespace; a pending WAP stage survives and publishes; a crashed " +
      "rename resumes (store re-keys only)") {
    seed() // ensures the sales namespace exists
    val rows = (0 until 20).map(i => (i.toLong, s"w$i")).toDF("id", "v")
    lh.catalog.createTable("sales.rn_q", rows.schema, Nil, Map.empty)
    val t = lh.catalog.loadTable("sales.rn_q")
    t.append(rows.where(col("id") < 10))
    // a staged (unpublished) WAP batch — its registry entry stores the
    // absolute stage dir and must follow the move
    t.stageAppend(rows.where(col("id") >= 10), "w1")
    // UNQUALIFIED target: must stay in sales, not move to default
    lh.renameTable("sales.rn_q", "rn_q2")
    assert(lh.catalog.tableExists("sales.rn_q2"))
    assert(!lh.catalog.tableExists("default.rn_q2"))
    val t2 = lh.catalog.loadTable("sales.rn_q2")
    // the stage is intact at the new path: audit view sees it, orphan GC
    // does not collect it, publish lands it
    assert(t2.readWap("w1").count() == 20)
    assert(t2.orphanFiles().isEmpty,
      "a registered stage must stay pinned after rename")
    t2.publishWap("w1")
    assert(lh.catalog.loadTable("sales.rn_q2").read().count() == 20)
    // RESUME: simulate a crash after the catalog move but before the
    // store followers — the facade's intent was already durably recorded
    // (the real flow writes it before the move), policies still keyed to
    // the old name
    lh.retention.setPolicy(graft.orchestration.RetentionPolicy(
      "sales.rn_q2", maxSnapshots = Some(50)))
    val intent = lh.metaDir.resolve("rename-intents").resolve(
      java.net.URLEncoder.encode("sales.rn_q2", "UTF-8") + ".json")
    graft.core.Jsons.writeFile(intent,
      graft.core.RenameIntent("sales.rn_q2", "sales.rn_q3"))
    lh.catalog.renameTable("sales.rn_q2", "sales.rn_q3") // move only
    assert(lh.retention.policy("sales.rn_q2").isDefined, "precondition")
    lh.renameTable("sales.rn_q2", "sales.rn_q3") // resume: re-keys stores
    assert(lh.retention.policy("sales.rn_q3").isDefined &&
      lh.retention.policy("sales.rn_q2").isEmpty)
    assert(lh.catalog.loadTable("sales.rn_q3").read().count() == 20)
    // the retired intent must not linger (a stale entry would let a
    // FUTURE typo'd rename of the same pair slip the evidence gate)
    assert(!java.nio.file.Files.exists(intent))
  }

  test("a REFUSED rename withdraws its just-written intent: once the old " +
      "table is later dropped, re-running the same pair must refuse " +
      "instead of 'resuming' onto the unrelated live target") {
    seed()
    val rows = (0 until 4).map(i => (i.toLong, s"w$i")).toDF("id", "v")
    lh.catalog.createTable("sales.rn_w1", rows.schema, Nil, Map.empty)
    lh.catalog.createTable("sales.rn_w2", rows.schema, Nil, Map.empty)
    lh.retention.setPolicy(graft.orchestration.RetentionPolicy(
      "sales.rn_w2", maxSnapshots = Some(11)))
    // refused: target exists — the move never happens
    intercept[IllegalArgumentException] {
      lh.renameTable("sales.rn_w1", "sales.rn_w2")
    }
    lh.catalog.dropTable("sales.rn_w1")
    // without intent withdrawal this would pass the evidence gate and
    // re-key rn_w2's governance entries under a rename that never ran
    val e = intercept[IllegalArgumentException] {
      lh.renameTable("sales.rn_w1", "sales.rn_w2")
    }
    assert(e.getMessage.contains("refusing to resume") ||
      e.getMessage.contains("no such table"), e.getMessage)
    assert(lh.retention.policy("sales.rn_w2")
      .exists(_.maxSnapshots.contains(11)), "target stores untouched")
  }

  test("typo'd rename against a target that is mid-rename from a " +
      "DIFFERENT source: the marker's CONTENT refuses the pair and no " +
      "intent is left behind; the legitimate resume then completes") {
    seed()
    val rows = (0 until 8).map(i => (i.toLong, s"m$i")).toDF("id", "v")
    lh.catalog.createTable("sales.rn_mr", rows.schema, Nil, Map.empty)
    lh.catalog.loadTable("sales.rn_mr").append(rows)
    val oldDir = lh.catalog.tableDir("sales", "rn_mr")
    val newDir = lh.catalog.tableDir("sales", "rn_mrb")
    graft.core.Jsons.writeFile(
      oldDir.resolve(graft.core.Catalog.RenameMarkerFile),
      graft.core.RenamePending("sales.rn_mr", "sales.rn_mrb",
        oldDir.toAbsolutePath.toString + "/",
        newDir.toAbsolutePath.toString + "/"))
    java.nio.file.Files.move(oldDir, newDir,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // typo: rn_typo never existed, but rn_mrb exists and carries a
    // marker — the refusal forwards into the catalog's PRECISE
    // content-mismatch message (naming what the marker actually records)
    val e = intercept[IllegalArgumentException] {
      lh.renameTable("sales.rn_typo", "sales.rn_mrb")
    }
    assert(e.getMessage.contains("records sales.rn_mr -> sales.rn_mrb"),
      e.getMessage)
    val typoIntent = lh.metaDir.resolve("rename-intents").resolve(
      java.net.URLEncoder.encode("sales.rn_typo", "UTF-8") + ".json")
    assert(!java.nio.file.Files.exists(typoIntent),
      "the refused typo must not leave intent evidence behind")
    // the REAL pair still resumes exactly
    lh.renameTable("sales.rn_mr", "sales.rn_mrb")
    assert(lh.catalog.loadTable("sales.rn_mrb").read().count() == 8)
  }

  test("a rename refused for a missing source must not clobber a PENDING " +
      "intent of the same source toward a different target") {
    seed()
    val rows = (0 until 6).map(i => (i.toLong, s"p$i")).toDF("id", "v")
    lh.catalog.createTable("sales.rn_pi", rows.schema, Nil, Map.empty)
    lh.catalog.loadTable("sales.rn_pi").append(rows)
    // crash AFTER the catalog move fully completed but BEFORE followers:
    // the intent file is the only resume evidence
    val intent = lh.metaDir.resolve("rename-intents").resolve(
      java.net.URLEncoder.encode("sales.rn_pi", "UTF-8") + ".json")
    graft.core.Jsons.writeFile(intent,
      graft.core.RenameIntent("sales.rn_pi", "sales.rn_pi2"))
    lh.catalog.renameTable("sales.rn_pi", "sales.rn_pi2")
    // mistyped second command: source gone, target rn_pi3 absent — must
    // refuse EARLY without touching the pending intent
    val e = intercept[IllegalArgumentException] {
      lh.renameTable("sales.rn_pi", "sales.rn_pi3")
    }
    assert(e.getMessage.contains("no such table"), e.getMessage)
    assert(java.nio.file.Files.exists(intent),
      "the early refusal must preserve the pending intent")
    // the legitimate resume still works off that intent
    lh.renameTable("sales.rn_pi", "sales.rn_pi2")
    assert(lh.catalog.loadTable("sales.rn_pi2").read().count() == 6)
    assert(!java.nio.file.Files.exists(intent))
  }

  test("dropNamespace counts mid-rename tables: a namespace whose only " +
      "table is hidden behind a rename marker refuses to drop") {
    lh.catalog.createNamespace("rnns")
    val rows = (0 until 3).map(i => (i.toLong, s"d$i")).toDF("id", "v")
    lh.catalog.createTable("rnns.t", rows.schema, Nil, Map.empty)
    val oldDir = lh.catalog.tableDir("rnns", "t")
    val newDir = lh.catalog.tableDir("rnns", "t2")
    graft.core.Jsons.writeFile(
      oldDir.resolve(graft.core.Catalog.RenameMarkerFile),
      graft.core.RenamePending("rnns.t", "rnns.t2",
        oldDir.toAbsolutePath.toString + "/",
        newDir.toAbsolutePath.toString + "/"))
    java.nio.file.Files.move(oldDir, newDir,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    assert(lh.catalog.listTables("rnns").isEmpty, "precondition: hidden")
    val e = intercept[IllegalArgumentException] {
      lh.catalog.dropNamespace("rnns")
    }
    assert(e.getMessage.contains("not empty"), e.getMessage)
    lh.renameTable("rnns.t", "rnns.t2") // complete it; ns stays usable
    assert(lh.catalog.listTables("rnns") == List("rnns.t2"))
  }

  test("corrupt rename marker: the repair path fails with the manual " +
      "instructions, not a raw JSON parse error") {
    seed()
    val rows = (0 until 4).map(i => (i.toLong, s"c$i")).toDF("id", "v")
    lh.catalog.createTable("sales.rn_cm", rows.schema, Nil, Map.empty)
    lh.catalog.loadTable("sales.rn_cm").append(rows)
    val oldDir = lh.catalog.tableDir("sales", "rn_cm")
    val newDir = lh.catalog.tableDir("sales", "rn_cm2")
    java.nio.file.Files.write(
      oldDir.resolve(graft.core.Catalog.RenameMarkerFile),
      "{truncated".getBytes("UTF-8"))
    java.nio.file.Files.move(oldDir, newDir,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val e = intercept[IllegalStateException] {
      lh.catalog.renameTable("sales.rn_cm", "sales.rn_cm2")
    }
    assert(e.getMessage.contains("unreadable rename marker") &&
      e.getMessage.contains(graft.core.Catalog.RenameMarkerFile),
      e.getMessage)
    // the FACADE must surface the same repair message (its dispatch keys
    // on marker EXISTENCE, so a corrupt marker forwards into the
    // catalog's instructions instead of a generic resume refusal)
    val e2 = intercept[IllegalStateException] {
      lh.renameTable("sales.rn_cm", "sales.rn_cm2")
    }
    assert(e2.getMessage.contains("unreadable rename marker"),
      e2.getMessage)
  }

  test("rename resume requires positive evidence: a mistyped source " +
      "name against a live target refuses instead of re-keying " +
      "governance stores onto the unrelated table") {
    seed()
    val rows = (0 until 5).map(i => (i.toLong, s"e$i")).toDF("id", "v")
    lh.catalog.createTable("sales.rn_live", rows.schema, Nil, Map.empty)
    lh.catalog.loadTable("sales.rn_live").append(rows)
    lh.retention.setPolicy(graft.orchestration.RetentionPolicy(
      "sales.rn_live", maxSnapshots = Some(7)))
    val e = intercept[IllegalArgumentException] {
      lh.renameTable("sales.rn_nosuch", "sales.rn_live")
    }
    assert(e.getMessage.contains("refusing to resume"), e.getMessage)
    // the live target's stores are untouched by the refused call
    assert(lh.retention.policy("sales.rn_live")
      .exists(_.maxSnapshots.contains(7)))
    assert(lh.audit.entries(table = Some("sales.rn_live"))
      .forall(_.operation != "rename_table"),
      "a refused resume must not audit-log a rename that never happened")
  }

  test("crashed rename mid-fixups: the marker makes reads refuse LOUDLY " +
      "(never silently resurrect MoR-deleted rows), and re-running the " +
      "rename completes the fixups exactly") {
    seed()
    val rows = (0 until 40).map(i => (i.toLong, s"c$i")).toDF("id", "v")
    lh.catalog.createTable("sales.rn_cr", rows.schema, Nil, Map.empty)
    val t = lh.catalog.loadTable("sales.rn_cr")
    t.append(rows)
    t.deleteWhereMor(col("id") < 15) // delete parquet carries abs paths
    assert(t.read().count() == 25, "precondition")
    // simulate a crash at the WORST point: the dir move (commit point)
    // landed, ZERO fixups ran — exactly what the marker protects
    val oldDir = lh.catalog.tableDir("sales", "rn_cr")
    val newDir = lh.catalog.tableDir("sales", "rn_cr2")
    graft.core.Jsons.writeFile(
      oldDir.resolve(graft.core.Catalog.RenameMarkerFile),
      graft.core.RenamePending("sales.rn_cr", "sales.rn_cr2",
        oldDir.toAbsolutePath.toString + "/",
        newDir.toAbsolutePath.toString + "/"))
    java.nio.file.Files.move(oldDir, newDir,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // reads refuse loudly while the marker is live, naming the repair
    val e = intercept[IllegalStateException] {
      lh.catalog.loadTable("sales.rn_cr2")
    }
    assert(e.getMessage.contains("INCOMPLETE rename") &&
      e.getMessage.contains("sales.rn_cr"), e.getMessage)
    // whole-catalog sweeps must keep working: the one mid-rename table
    // is skipped from listings (else registerViews/maintenance/dashboards
    // would all throw on it), and re-appears once the rename completes
    assert(!lh.catalog.listTables("sales").contains("sales.rn_cr2"))
    lh.catalog.registerViews() // must not throw
    // re-running the SAME rename resumes through the Lakehouse (the
    // catalog marker is the positive evidence) and completes the fixups
    lh.renameTable("sales.rn_cr", "sales.rn_cr2")
    val t2 = lh.catalog.loadTable("sales.rn_cr2")
    assert(t2.read().count() == 25,
      "MoR delete state must survive a resumed rename exactly")
    assert(t2.read().agg(min(col("id"))).head.getLong(0) == 15L)
    assert(lh.catalog.listTables("sales").contains("sales.rn_cr2"),
      "the completed rename must re-surface the table in listings")
    assert(!java.nio.file.Files.exists(
      newDir.resolve(graft.core.Catalog.RenameMarkerFile)))
    // a mismatched resume attempt refuses (marker names a different pair)
    // and the commit protocol still works at the new path
    t2.append(Seq((100L, "post")).toDF("id", "v"))
    assert(lh.catalog.loadTable("sales.rn_cr2").read().count() == 26)
  }

  test("rename intent without a committed move: reads of the SOURCE " +
      "refuse loudly until the rename is re-run or the marker cleared") {
    seed()
    val rows = (0 until 6).map(i => (i.toLong, s"p$i")).toDF("id", "v")
    lh.catalog.createTable("sales.rn_pre", rows.schema, Nil, Map.empty)
    lh.catalog.loadTable("sales.rn_pre").append(rows)
    // crash between the marker write and the (never-executed) dir move
    val dir = lh.catalog.tableDir("sales", "rn_pre")
    graft.core.Jsons.writeFile(
      dir.resolve(graft.core.Catalog.RenameMarkerFile),
      graft.core.RenamePending("sales.rn_pre", "sales.rn_pre2",
        dir.toAbsolutePath.toString + "/",
        lh.catalog.tableDir("sales", "rn_pre2")
          .toAbsolutePath.toString + "/"))
    val e = intercept[IllegalStateException] {
      lh.catalog.loadTable("sales.rn_pre")
    }
    assert(e.getMessage.contains("never committed"), e.getMessage)
    // re-running the intended rename completes it (the normal path
    // tolerates and overwrites the stale pre-move marker)
    lh.renameTable("sales.rn_pre", "sales.rn_pre2")
    assert(lh.catalog.loadTable("sales.rn_pre2").read().count() == 6)
    assert(!lh.catalog.tableExists("sales.rn_pre"))
  }

  test("rename × zero-copy clones: a pinned SOURCE refuses to rename; " +
      "renaming the CLONE re-pins under the new name with no unpinned " +
      "window and keeps its promote/discard lifecycle") {
    val rows = (0 until 40).map(i => (i.toLong, s"s$i")).toDF("id", "v")
    lh.catalog.createTable("default.rn_s", rows.schema, Nil, Map.empty)
    lh.catalog.loadTable("default.rn_s").append(rows)
    lh.cloning.clone("default.rn_s", "default.rn_c", zeroCopy = true)
    // the clone's manifests reference data files under the source dir —
    // moving the source would strand them, exactly like dropping it
    val e = intercept[Exception] {
      lh.renameTable("default.rn_s", "default.rn_s2")
    }
    assert(e.getMessage.contains("zero-copy clones"), e.getMessage)
    assert(lh.catalog.tableExists("default.rn_s"), "refusal must not move")
    // renaming the CLONE: pin follows atomically (new pin before the
    // move, old released after)
    lh.renameTable("default.rn_c", "default.rn_c2")
    val srcT = lh.catalog.loadTable("default.rn_s")
    assert(srcT.tags.contains("clone-default.rn_c2"))
    assert(!srcT.tags.contains("clone-default.rn_c"))
    assert(lh.catalog.loadTable("default.rn_c2").read().count() == 40)
    // the clone record followed: discard under the NEW name drops the
    // table and releases the re-pinned tag (GC teeth restored)
    lh.cloning.discard("default.rn_c2")
    assert(!lh.catalog.tableExists("default.rn_c2"))
    assert(lh.catalog.loadTable("default.rn_s").tags.keys
      .forall(!_.startsWith("clone-")), "pin must be released")
    // with no pins left the source renames freely
    lh.renameTable("default.rn_s", "default.rn_s2")
    assert(lh.catalog.loadTable("default.rn_s2").read().count() == 40)
  }
}
