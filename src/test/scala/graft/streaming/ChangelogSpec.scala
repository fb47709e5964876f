package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkFixture

/** Commit-replay changelog (Changelog / ChangelogStream / appendStream):
  * stream-of-commits must equal batch snapshot diffs over a multi-commit
  * history including a MoR delete, with exactly-once offsets. */
class ChangelogSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def newLh() =
    graft.Lakehouse.open(spark, SparkFixture.tmpDir("graft-cls-").toString)

  private def df(ids: Range) =
    ids.map(i => (i.toLong, s"row$i")).toDF("id", "name")

  test("3-commit replay (append, append, MoR delete) equals the batch " +
      "snapshot diffs; materialized state equals the final table") {
    val lh = newLh()
    val t = lh.catalog.createTable("default.cl1",
      Seq("id" -> "long", "name" -> "string"), Nil, Map.empty)
    t.append(df(0 until 50)) // commit 1
    t.append(df(50 until 80)) // commit 2
    t.deleteWhereMor(col("id") % 10 === 0) // commit 3: MoR position delete
    val ch = Changelog.changesBetween(t, None, 3L)
    // per-commit equality with the batch diff:
    //  c1: 50 inserts; c2: 30 inserts; c3: 8 deletes (0,10,...,70), 0 inserts
    val byCommit = ch.groupBy(col(Changelog.CommitIdCol),
        col(Changelog.ChangeTypeCol)).count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byCommit == Map((1L, "insert") -> 50L, (2L, "insert") -> 30L,
      (3L, "delete") -> 8L), s"got $byCommit")
    // exact rows, not just counts: commit 3's deletes are the batch diff
    val diff3 = t.readSnapshot(t.snapshotById(2L))
      .exceptAll(t.readSnapshot(t.snapshotById(3L)))
    val got3 = ch.where(col(Changelog.CommitIdCol) === 3L &&
        col(Changelog.ChangeTypeCol) === "delete")
      .select("id", "name")
    assert(got3.exceptAll(diff3).isEmpty && diff3.exceptAll(got3).isEmpty)
    // materialize: inserts minus deletes == final table state
    val ins = ch.where(col(Changelog.ChangeTypeCol) === "insert")
      .select("id", "name")
    val del = ch.where(col(Changelog.ChangeTypeCol) === "delete")
      .select("id", "name")
    val material = ins.exceptAll(del)
    val fin = t.read()
    assert(material.exceptAll(fin).isEmpty && fin.exceptAll(material).isEmpty)
  }

  test("MoR update commit emits delete(old) + insert(new)") {
    val lh = newLh()
    val t = lh.catalog.createTable("default.cl2",
      Seq("id" -> "long", "name" -> "string"), Nil, Map.empty)
    t.append(df(0 until 20))
    t.updateWhereMor(col("id") < 3, Map("name" -> lit("upd")))
    val ch = Changelog.changesBetween(t, Some(1L), 2L)
    val rows = ch.select(Changelog.ChangeTypeCol, "id", "name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set(
      ("delete", 0L, "row0"), ("delete", 1L, "row1"), ("delete", 2L, "row2"),
      ("insert", 0L, "upd"), ("insert", 1L, "upd"), ("insert", 2L, "upd")),
      s"got $rows")
  }

  test("pairUpdateKeys: an update commit's rows pair into update_before/" +
      "update_after with changed_columns; other commits keep insert/" +
      "delete; the multiset fold is unchanged") {
    val lh = newLh()
    val t = lh.catalog.createTable("default.cl2p",
      Seq("id" -> "long", "name" -> "string"), Nil, Map.empty)
    t.append(df(0 until 20)) // commit 1
    t.updateWhereMor(col("id") < 3, Map("name" -> lit("upd"))) // commit 2
    t.deleteWhereMor(col("id") === 19L) // commit 3
    val ch = Changelog.changesBetween(t, None, 3L, pairUpdateKeys = Seq("id"))
    val byType = ch.groupBy(col(Changelog.CommitIdCol),
        col(Changelog.ChangeTypeCol)).count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byType == Map((1L, "insert") -> 20L,
      (2L, "update_before") -> 3L, (2L, "update_after") -> 3L,
      (3L, "delete") -> 1L), s"got $byType")
    // changed_columns names exactly the updated column; before/after carry
    // the old/new values
    val upd = ch.where(col(Changelog.CommitIdCol) === 2L)
      .select(col(Changelog.ChangeTypeCol), col("id"), col("name"),
        col(Changelog.ChangedColumnsCol))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getSeq[String](3).toList)).toSet
    assert(upd == (0 until 3).flatMap(i => Seq(
      ("update_before", i.toLong, s"row$i", List("name")),
      ("update_after", i.toLong, "upd", List("name")))).toSet, s"got $upd")
    // non-update rows carry an EMPTY changed_columns (stable schema)
    assert(ch.where(col(Changelog.CommitIdCol) =!= 2L &&
      size(col(Changelog.ChangedColumnsCol)) =!= 0).isEmpty)
    // fold equivalence: before/after as delete/insert == the unpaired fold
    val paired = ch.withColumn("k",
      when(col(Changelog.ChangeTypeCol).isin("insert", "update_after"),
        "insert").otherwise("delete"))
    val ins = paired.where(col("k") === "insert").select("id", "name")
    val del = paired.where(col("k") === "delete").select("id", "name")
    val material = ins.exceptAll(del)
    val fin = t.read()
    assert(material.exceptAll(fin).isEmpty && fin.exceptAll(material).isEmpty)
  }

  test("pairUpdateKeys over a partial-CoW UPDATE commit: the rewrite's " +
      "delete+insert rows pair into update_before/update_after exactly " +
      "like MoR, carried-by-reference rows never appear") {
    val lh = newLh()
    val t = lh.catalog.createTable("default.cl2c",
      Seq("id" -> "long", "name" -> "string"), Nil, Map.empty) // CoW mode
    // two single-file commits so the rewrite touches one and carries one
    t.append(df(0 until 10).coalesce(1))
    t.append(df(1000 until 1010).coalesce(1))
    lh.dml.update("default.cl2c", "id >= 1007", Map("name" -> "upd"))
    val snap = t.currentSnapshot.get
    // CoW row-level rewrites commit as "overwrite" + matched-rows — the
    // exact shape the pairing arm must recognize
    assert(snap.operation == "overwrite" &&
      snap.summary.contains("matched-rows") &&
      snap.summary.get("carried-files").exists(_.toInt > 0),
      s"precondition: a partial CoW rewrite, got ${snap.summary}")
    val ch = Changelog.changesBetween(t, Some(2L), 3L,
      pairUpdateKeys = Seq("id"))
    val rows = ch.select(Changelog.ChangeTypeCol, "id", "name",
        Changelog.ChangedColumnsCol)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getSeq[String](3).toList)).toSet
    assert(rows == (1007 until 1010).flatMap(i => Seq(
      ("update_before", i.toLong, s"row$i", List("name")),
      ("update_after", i.toLong, "upd", List("name")))).toSet,
      s"CoW update must pair by key, got $rows")
    // fold equivalence holds across the CoW commit too
    val paired = ch.withColumn("k",
      when(col(Changelog.ChangeTypeCol).isin("insert", "update_after"),
        "insert").otherwise("delete"))
    val material = df(0 until 10).unionByName(df(1000 until 1010))
      .unionByName(paired.where(col("k") === "insert").select("id", "name"))
      .exceptAll(paired.where(col("k") === "delete").select("id", "name"))
    val fin = t.read()
    assert(material.exceptAll(fin).isEmpty && fin.exceptAll(material).isEmpty)
  }

  test("paired CoW replay is O(rewritten): carried files are never " +
      "scanned, and restricted-frame pairing equals full-frame pairing " +
      "even with an identical duplicate key in a carried file") {
    val lh = newLh()
    val t = lh.catalog.createTable("default.cl2r",
      Seq("k" -> "long", "sub" -> "long", "v" -> "string"), Nil, Map.empty)
    import spark.implicits._
    // file 1: ids in the low range, INCLUDING (500, 1, "dup") — an
    // identical-key twin of a row the update will touch in file 2
    t.append(((0 until 10).map(i => (i.toLong, i.toLong, s"a$i")) :+
      ((500L, 1L, "dup"))).toDF("k", "sub", "v").coalesce(1))
    // file 2: high range + the twin's sibling (500, 1002, "dup")
    t.append(((1000 until 1010).map(i => (i.toLong, i.toLong, s"b$i")) :+
      ((500L, 1002L, "dup"))).toDF("k", "sub", "v").coalesce(1))
    // match only PART of the victim file: rows 1000-1001 are rewritten
    // UNCHANGED — the shape that distinguishes diff-then-classify
    // (drops them) from treating restricted frames as a physical delta
    // (would emit bogus no-op update pairs for them)
    lh.dml.update("default.cl2r", "sub >= 1002", Map("v" -> "upd"))
    val snap = t.currentSnapshot.get
    assert(snap.summary.get("carried-files").exists(_.toInt == 1),
      s"precondition: file 1 must carry by reference, got ${snap.summary}")
    val carried = t.snapshots.head.files.map(_.path).toSet
    val paired = Changelog.changesBetween(t, Some(2L), 3L,
      pairUpdateKeys = Seq("k"))
    // O(rewritten): the replay's scans never open the carried file
    val scanned = paired.inputFiles.toSet
    assert(carried.forall(c => !scanned.exists(_.endsWith(
        c.substring(c.lastIndexOf('/'))))),
      s"carried file scanned by the paired CoW replay: $scanned")
    val got = paired.select(Changelog.ChangeTypeCol, "k", "sub", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    // only the MATCHED rows pair — including key 500, whose identical
    // twin sits untouched in the carried file; the rewritten-but-
    // unchanged rows 1000-1001 must produce NO records at all
    val expect = ((1002 until 1010).map(_.toLong) :+ 500L).flatMap { k =>
      val sub = if (k == 500L) 1002L else k
      val old = if (k == 500L) "dup" else s"b$k"
      Seq(("update_before", k, sub, old), ("update_after", k, sub, "upd"))
    }.toSet
    assert(got == expect, s"got $got")
    assert(!got.exists(_._2 == 1000L) && !got.exists(_._2 == 1001L),
      "rewritten-but-unchanged rows must not appear as no-op pairs")
    // differential: full-frame classification (the pre-optimization
    // reference semantics) produces the identical pair set
    val full = graft.analytics.Cdc.classifyChanges(
        t.readAsOf("2"), t.readAsOf("3"), Seq("k"), Seq("k", "sub", "v"))
      .select(lower(col("change_type")), col("k"), col("sub"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(got == full, s"restricted != full: got $got vs $full")
  }

  test("pairUpdateKeys over MERGE INTO commits: CoW and MoR modes emit " +
      "the IDENTICAL paired changelog (update pairs, inserts, deletes) — " +
      "the mode asymmetry removed for UPDATE must not persist for MERGE") {
    val lh = newLh()
    val catName = s"clm${System.nanoTime() % 100000}"
    spark.conf.set(s"spark.sql.catalog.$catName",
      classOf[graft.engine.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catName.warehouse",
      lh.warehouseDir)
    graft.GraftExtensions.register(spark)
    def vdf(ids: Range) = ids.map(i => (i.toLong, s"row$i")).toDF("id", "v")
    def setup(name: String, props: Map[String, String]) = {
      val t = lh.catalog.createTable(s"default.$name",
        Seq("id" -> "long", "v" -> "string"), Nil, props)
      // two single-file commits so the CoW merge carries one by reference
      t.append(vdf(0 until 10).coalesce(1))
      t.append(vdf(1000 until 1010).coalesce(1))
      t
    }
    val cow = setup("clm_cow", Map.empty)
    val mor = setup("clm_mor", Map("write.merge.mode" -> "merge-on-read"))
    Seq((1002L, "upd"), (1003L, "DEL"), (2000L, "new"))
      .toDF("id", "v").createOrReplaceTempView("clm_src")
    def merge(name: String) = spark.sql(
      s"""MERGE INTO $catName.default.$name t USING clm_src s ON t.id = s.id
         |WHEN MATCHED AND s.v = 'DEL' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    merge("clm_cow"); merge("clm_mor")
    // precondition: the CoW merge is the overwrite+merge-* shape the
    // pairing arm must recognize WITHOUT a matched-rows key
    val cs = cow.currentSnapshot.get
    assert(cs.operation == "overwrite" &&
      cs.summary.keys.exists(_.startsWith("merge-")) &&
      !cs.summary.contains("matched-rows"),
      s"precondition: CoW merge summary shape, got ${cs.summary}")
    assert(mor.currentSnapshot.get.operation == "update",
      s"precondition: MoR merge op, got ${mor.currentSnapshot.get.operation}")
    def paired(t: graft.core.IceTable) =
      Changelog.changesBetween(t, Some(2L), 3L, pairUpdateKeys = Seq("id"))
        .select(Changelog.ChangeTypeCol, "id", "v",
          Changelog.ChangedColumnsCol)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.getSeq[String](3).toList)).toSet
    val gotCow = paired(cow)
    assert(gotCow == paired(mor),
      s"CoW and MoR MERGE must pair identically, CoW got $gotCow")
    assert(gotCow == Set(
      ("update_before", 1002L, "row1002", List("v")),
      ("update_after", 1002L, "upd", List("v")),
      ("delete", 1003L, "row1003", Nil),
      ("insert", 2000L, "new", Nil)), s"got $gotCow")
  }

  test("ChangelogStream × rename: a consumer re-pointed at the NEW name " +
      "with the same checkpoint resumes exactly-once; the OLD name " +
      "refuses loudly; a RECREATED table at the old name refuses via the " +
      "identity uuid instead of silently aliasing snapshot ids") {
    val lh = newLh()
    val t = lh.catalog.createTable("default.cl_rn",
      Seq("id" -> "long", "name" -> "string"), Nil, Map.empty)
    t.append(df(0 until 10)) // commit 1
    t.append(df(10 until 20)) // commit 2
    val ckpt = SparkFixture.tmpDir("graft-cls-rn-")
    val cs = new ChangelogStream(lh, "default.cl_rn", ckpt)
    var delivered = List.empty[(Long, Long)] // (toId, rows)
    cs.processAvailable((ch, to) => delivered :+= (to, ch.count()))
    assert(delivered == List((2L, 20L)))
    // rename mid-stream, then more commits under the new name
    lh.renameTable("default.cl_rn", "default.cl_rn2")
    val t2 = lh.catalog.loadTable("default.cl_rn2")
    t2.append(df(20 until 25)) // commit 3
    // the OLD name refuses loudly — never a silent empty batch
    val e1 = intercept[Exception] {
      new ChangelogStream(lh, "default.cl_rn", ckpt)
        .processAvailable((_, _) => ())
    }
    assert(e1.getMessage.contains("no such table"), e1.getMessage)
    // re-pointed at the NEW name with the SAME checkpoint: exactly-once
    // resume — only commit 3 is delivered (snapshot ids and the identity
    // uuid both survived the rename)
    val cs2 = new ChangelogStream(lh, "default.cl_rn2", ckpt)
    cs2.processAvailable((ch, to) => delivered :+= (to, ch.count()))
    assert(delivered == List((2L, 20L), (3L, 5L)), s"got $delivered")
    // recreate a table at the OLD name with enough commits that the
    // stale offset id EXISTS in its log — the bare-id check alone would
    // pass and silently deliver an unrelated diff; the uuid must refuse
    val tNew = lh.catalog.createTable("default.cl_rn",
      Seq("id" -> "long", "name" -> "string"), Nil, Map.empty)
    tNew.append(df(100 until 104)); tNew.append(df(104 until 108))
    tNew.append(df(108 until 112)); tNew.append(df(112 until 116))
    val ckptOld = SparkFixture.tmpDir("graft-cls-rn-old-")
    // simulate the orphaned consumer: its checkpoint carries the ORIGINAL
    // table's binding (copy the files the first consumer wrote)
    java.nio.file.Files.copy(ckpt.resolve("offset"),
      ckptOld.resolve("offset"))
    java.nio.file.Files.copy(ckpt.resolve("table-uuid"),
      ckptOld.resolve("table-uuid"))
    val csOld = new ChangelogStream(lh, "default.cl_rn", ckptOld)
    val e2 = intercept[IllegalArgumentException] {
      csOld.processAvailable((_, _) => ())
    }
    assert(e2.getMessage.contains("dropped and recreated"), e2.getMessage)
    // reseed() is the documented recovery: full state, identity rebound,
    // incremental consumption resumes against the recreated table
    var reseeded = 0L
    csOld.reseed((full, _) => reseeded = full.count())
    assert(reseeded == 16L)
    tNew.append(df(116 until 118)) // commit 5 on the recreated table
    var after = List.empty[(Long, Long)]
    csOld.processAvailable((ch, to) => after :+= (to, ch.count()))
    assert(after == List((5L, 2L)), s"got $after")
    // binding edges that must ALSO refuse (never silently alias):
    // (a) bound checkpoint vs a table stripped of its identity property
    tNew.removeProperty(graft.core.Catalog.TableUuidKey)
    val eA = intercept[IllegalArgumentException] {
      csOld.processAvailable((_, _) => ())
    }
    assert(eA.getMessage.contains("NO identity property"), eA.getMessage)
    // (b) a pre-binding checkpoint (offset, no uuid file) vs a
    // uuid-bearing table: the offset predates the table
    val ckptPre = SparkFixture.tmpDir("graft-cls-rn-pre-")
    java.nio.file.Files.copy(ckpt.resolve("offset"),
      ckptPre.resolve("offset"))
    val eB = intercept[IllegalArgumentException] {
      new ChangelogStream(lh, "default.cl_rn2", ckptPre)
        .processAvailable((_, _) => ())
    }
    assert(eB.getMessage.contains("predates"), eB.getMessage)
  }

  test("appendStream over a transform-partitioned layout: recursive " +
      "listing reads the exact table schema (no inferred _p_* columns), " +
      "stream == batch across multi-commit partitioned dirs") {
    val lh = newLh()
    lh.catalog.createTable("default.cl6",
      Seq("id" -> "long", "ts" -> "timestamp", "name" -> "string"),
      Seq("day(ts)", "bucket(4, id)"), Map.empty)
    val t = lh.catalog.loadTable("default.cl6")
    def rows(r: Range) = r.map(i => (i.toLong,
      java.sql.Timestamp.valueOf(s"2024-03-0${1 + i % 3} 12:00:00"),
      s"n$i")).toDF("id", "ts", "name")
    t.append(rows(0 until 30))
    t.append(rows(30 until 40))
    val src = Changelog.appendStream(spark, t)
    assert(src.schema.fieldNames.toSeq == Seq("id", "ts", "name"),
      s"partition dirs must not surface: ${src.schema.fieldNames.toSeq}")
    val q = src.writeStream.format("memory").queryName("cl6_sink")
      .option("checkpointLocation",
        SparkFixture.tmpDir("graft-cls-part-").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("cl6_sink").orderBy("id").collect().toSeq
    val want = t.read().orderBy("id").collect().toSeq
    assert(got == want, s"stream rows must equal the batch read")
  }

  test("ChangelogStream: exactly-once offsets, idempotent redelivery " +
      "contract, no-op when caught up") {
    val lh = newLh()
    val t = lh.catalog.createTable("default.cl3",
      Seq("id" -> "long", "name" -> "string"), Nil, Map.empty)
    val ckpt = SparkFixture.tmpDir("graft-cls-ckpt-")
    val cs = new ChangelogStream(lh, "default.cl3", ckpt)
    assert(cs.processAvailable((_, _) => fail("no commits yet")) == None)
    t.append(df(0 until 10))
    t.append(df(10 until 15))
    var batches = List.empty[(Long, Long, Long)] // (toId, inserts, deletes)
    def sink(d: org.apache.spark.sql.DataFrame, toId: Long): Unit = {
      val ins = d.where(col(Changelog.ChangeTypeCol) === "insert").count()
      val del = d.where(col(Changelog.ChangeTypeCol) === "delete").count()
      batches ::= ((toId, ins, del))
    }
    assert(cs.processAvailable(sink).contains(2L))
    assert(cs.lastProcessed.contains(2L))
    assert(batches == List((2L, 15L, 0L)))
    // caught up: no redelivery
    assert(cs.processAvailable(sink).isEmpty && batches.size == 1)
    // a new MoR delete commit arrives: next batch covers ONLY it
    t.deleteWhereMor(col("id") < 2)
    assert(cs.processAvailable(sink).contains(3L))
    assert(batches.head == ((3L, 0L, 2L)))
    // a fresh consumer from the same checkpoint resumes, not restarts
    val cs2 = new ChangelogStream(lh, "default.cl3", ckpt)
    assert(cs2.lastProcessed.contains(3L))
  }

  test("maintainRollup: changelog-driven rollup equals a full recompute " +
      "across appends, MoR delete and MoR update; redelivery is a no-op") {
    val lh = newLh()
    val src = lh.catalog.createTable("default.mr_src",
      Seq("id" -> "long", "grp" -> "long", "v" -> "double"), Nil, Map.empty)
    def rows(r: Range) = r.map(i => (i.toLong, (i % 3).toLong, i * 1.5))
      .toDF("id", "grp", "v")
    val ckpt = SparkFixture.tmpDir("graft-mr-ckpt-")
    def rollupNow(): Map[Long, (Long, Long)] =
      lh.catalog.loadTable("default.mr_rollup").read().collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def recompute(): Map[Long, (Long, Long)] =
      graft.analytics.IncrementalAgg
        .countSumState(lh.catalog.loadTable("default.mr_src").read(),
          Seq("grp"), "v")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    src.append(rows(0 until 30))
    assert(Changelog.maintainRollup(lh, "default.mr_src",
      "default.mr_rollup", Seq("grp"), "v", ckpt).contains(1L))
    assert(rollupNow() == recompute())

    src.append(rows(30 until 50))
    src.deleteWhereMor(col("id") % 5 === 0)
    src.updateWhereMor(col("id") === 7L, Map("v" -> lit(100.0)))
    assert(Changelog.maintainRollup(lh, "default.mr_src",
      "default.mr_rollup", Seq("grp"), "v", ckpt).contains(4L))
    assert(rollupNow() == recompute(),
      "rollup must equal a full recompute after delete+update commits")

    // caught up: nothing to do
    assert(Changelog.maintainRollup(lh, "default.mr_src",
      "default.mr_rollup", Seq("grp"), "v", ckpt).isEmpty)
    // crash-redelivery: offset lost but the rollup's stamped toId makes
    // the replayed batch a no-op — counts cannot double-fold
    java.nio.file.Files.deleteIfExists(ckpt.resolve("offset"))
    val before = rollupNow()
    val rollupSnaps = lh.catalog.loadTable("default.mr_rollup").rawLog.size
    assert(Changelog.maintainRollup(lh, "default.mr_src",
      "default.mr_rollup", Seq("grp"), "v", ckpt).contains(4L))
    assert(rollupNow() == before, "redelivered batch must not double-fold")
    assert(lh.catalog.loadTable("default.mr_rollup").rawLog.size == rollupSnaps,
      "a skipped redelivery must not commit a new rollup snapshot")

    // SUPERSET redelivery: offset lost AND new commits arrived before the
    // rerun — the batch range strictly contains the stamped range, so the
    // fold must re-derive its delta from the stamp, not the offset, or
    // the already-applied prefix double-counts
    java.nio.file.Files.deleteIfExists(ckpt.resolve("offset"))
    src.append(rows(50 until 60)) // commit 5, unseen by the rollup
    assert(Changelog.maintainRollup(lh, "default.mr_src",
      "default.mr_rollup", Seq("grp"), "v", ckpt).contains(5L))
    assert(rollupNow() == recompute(),
      "superset redelivery must fold ONLY the unapplied suffix")
  }

  test("ChangelogStream.reseed: the documented expired-offset recovery — " +
      "full-state replacement, offset advanced, incremental resume after") {
    val lh = newLh()
    val t = lh.catalog.createTable("default.cl5",
      Seq("id" -> "long", "name" -> "string"), Nil, Map.empty)
    val cs = new ChangelogStream(lh, "default.cl5",
      SparkFixture.tmpDir("graft-cls5-ckpt-"))
    t.append(df(0 until 5)) // c1
    assert(cs.processAvailable((_, _) => ()).contains(1L))
    t.append(df(5 until 10)) // c2
    t.deleteWhereMor(col("id") < 2) // c3
    t.append(df(10 until 12)) // c4
    t.expireSnapshots(retainLast = Some(1))
    // the offset (1) expired: the incremental path refuses loudly…
    val e = intercept[IllegalArgumentException](
      cs.processAvailable((_, _) => fail("must refuse")))
    assert(e.getMessage.contains("expired"), e.getMessage)
    // …and reseed delivers the FULL pinned state + advances the offset
    var seeded = Seq.empty[Long]
    assert(cs.reseed((d, toId) => {
      seeded = d.select("id").collect().map(_.getLong(0)).toSeq.sorted
      assert(toId == 4L)
    }).contains(4L))
    assert(seeded == (2L until 12L), s"seeded: $seeded")
    assert(cs.lastProcessed.contains(4L))
    // incremental consumption resumes from the re-seed point
    t.append(df(12 until 14)) // c5
    var got = Seq.empty[Long]
    assert(cs.processAvailable((d, _) =>
      got = d.select("id").collect().map(_.getLong(0)).toSeq.sorted)
      .contains(5L))
    assert(got == Seq(12L, 13L))
  }

  test("expired mid-range history refuses replay instead of double-counting") {
    val lh = newLh()
    val t = lh.catalog.createTable("default.cl4",
      Seq("id" -> "long", "name" -> "string"), Nil, Map.empty)
    t.append(df(0 until 5))
    t.append(df(5 until 10))
    t.append(df(10 until 15))
    t.expireSnapshots(retainLast = Some(1))
    intercept[IllegalArgumentException] {
      Changelog.changesBetween(t, Some(1L), 3L).count()
    }
  }

  test("appendStream: a real readStream over commit dirs emits each " +
      "commit's rows exactly once; non-append history is refused") {
    val lh = newLh()
    val t = lh.catalog.createTable("default.cl5",
      Seq("id" -> "long", "name" -> "string"), Nil, Map.empty)
    t.append(df(0 until 30))
    t.append(df(30 until 40))
    val q = Changelog.appendStream(spark, t)
      .writeStream.format("memory").queryName("cl5_sink")
      .option("checkpointLocation",
        SparkFixture.tmpDir("graft-cls-fs-").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("cl5_sink").orderBy("id").collect().toSeq
    val want = t.read().orderBy("id").collect().toSeq
    assert(got == want)
    // a rewrite in the history breaks the append-only contract -> refused
    t.compact(targetFiles = 1)
    intercept[IllegalArgumentException] { Changelog.appendStream(spark, t) }
  }

  private def logicalScanFiles(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] =
    plan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.toSeq
          case _ => Nil
        }
    }.flatten

  test("MoR position-delete replay derives from the commit's delete file: " +
      "no exceptAll in the plan, and only the touched commit's data files " +
      "are scanned") {
    val lh = newLh()
    val t = lh.catalog.createTable("default.cl_mdf",
      Seq("id" -> "long", "name" -> "string"), Nil, Map.empty)
    t.append(df(0 until 50)) // commit 1 — the delete's victims live here
    t.append(df(1000 until 1050)) // commit 2 — untouched by the delete
    t.deleteWhereMor(col("id") < 5) // commit 3: MoR position delete
    val ch = Changelog.changesBetween(t, Some(2L), 3L)
    // exact rows still equal the snapshot diff
    val diff = t.readSnapshot(t.snapshotById(2L))
      .exceptAll(t.readSnapshot(t.snapshotById(3L)))
    val got = ch.where(col(Changelog.ChangeTypeCol) === "delete")
      .select("id", "name")
    assert(got.exceptAll(diff).isEmpty && diff.exceptAll(got).isEmpty)
    assert(ch.where(col(Changelog.ChangeTypeCol) === "insert").isEmpty)
    // plan shape: delete-file-driven, not a table-sized diff
    val plan = ch.queryExecution.analyzed
    assert(plan.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Except => e
    }.isEmpty, "replay of a pure MoR delete must not diff snapshots")
    // scan set: every data file read belongs to the commit the delete
    // touched — commit 2's files are never opened
    val dataScans = logicalScanFiles(plan).filter(_.contains("/data/commit-"))
    assert(dataScans.nonEmpty)
    assert(dataScans.forall(_.contains("commit-00001")),
      s"replay scanned beyond the touched commit: $dataScans")
  }

  test("MoR update replay derives from the commit's delete + added " +
      "files: no exceptAll, untouched commits never scanned, pairing " +
      "intact") {
    val lh = newLh()
    val t = lh.catalog.createTable("default.cl_mur",
      Seq("id" -> "long", "name" -> "string"), Nil, Map.empty)
    t.append(df(0 until 40)) // commit 1 — the update's victims live here
    t.append(df(1000 until 1040)) // commit 2 — untouched
    t.updateWhereMor(col("id") < 3, Map("name" -> lit("upd"))) // commit 3
    val ch = Changelog.changesBetween(t, Some(2L), 3L)
    val rows = ch.select(Changelog.ChangeTypeCol, "id", "name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set(
      ("delete", 0L, "row0"), ("delete", 1L, "row1"), ("delete", 2L, "row2"),
      ("insert", 0L, "upd"), ("insert", 1L, "upd"), ("insert", 2L, "upd")),
      s"got $rows")
    val plan = ch.queryExecution.analyzed
    assert(plan.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Except => e
    }.isEmpty, "MoR update replay must not diff snapshots")
    val dataScans = logicalScanFiles(plan).filter(_.contains("/data/commit-"))
    assert(dataScans.nonEmpty &&
      dataScans.forall(p => p.contains("commit-00001") ||
        p.contains("commit-00003")),
      s"update replay scanned an untouched commit: $dataScans")
    // pairUpdateKeys goes through classifyDelta on the same O(touched)
    // frames: same pairs, no exceptAll
    val paired = Changelog.changesBetween(t, Some(2L), 3L,
      pairUpdateKeys = Seq("id"))
    val prows = paired.select(Changelog.ChangeTypeCol, "id", "name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(prows == Set(
      ("update_before", 0L, "row0"), ("update_before", 1L, "row1"),
      ("update_before", 2L, "row2"),
      ("update_after", 0L, "upd"), ("update_after", 1L, "upd"),
      ("update_after", 2L, "upd")), s"got $prows")
    assert(paired.where(col(Changelog.ChangedColumnsCol) =!=
      array(lit("name"))).isEmpty)
    assert(paired.queryExecution.analyzed.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Except => e
    }.isEmpty, "paired MoR update replay must not diff snapshots")
  }

  test("equality-delete replay derives from the key set: no exceptAll, " +
      "one live-parent pass with a key semi-join") {
    val lh = newLh()
    val t = lh.catalog.createTable("default.cl_eqr",
      Seq("id" -> "long", "name" -> "string"), Nil, Map.empty)
    t.append(df(0 until 50)) // commit 1
    t.append(df(50 until 80)) // commit 2
    t.deleteKeysMor(Seq("id"),
      Seq(3L, 60L, 999L).toDF("id")) // commit 3: keys 3 and 60 match
    val ch = Changelog.changesBetween(t, Some(2L), 3L)
    val rows = ch.select(Changelog.ChangeTypeCol, "id", "name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set(("delete", 3L, "row3"), ("delete", 60L, "row60")),
      s"got $rows")
    assert(ch.queryExecution.analyzed.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Except => e
    }.isEmpty, "equality-delete replay must not diff snapshots")
    // and the full-range fold through the mixed history still materializes
    // to the final table
    val all = Changelog.changesBetween(t, None, 3L)
    val material = all.where(col(Changelog.ChangeTypeCol) === "insert")
      .select("id", "name")
      .exceptAll(all.where(col(Changelog.ChangeTypeCol) === "delete")
        .select("id", "name"))
    val fin = t.read()
    assert(material.exceptAll(fin).isEmpty && fin.exceptAll(material).isEmpty)
  }

  test("mixed 14-commit history: EVERY commit's replay equals the exact " +
      "snapshot diff (whichever path computed it), and the full fold " +
      "materializes to the final table") {
    val lh = newLh()
    val t = lh.catalog.createTable("default.cl_mix",
      Seq("id" -> "long", "name" -> "string"), Nil, Map.empty)
    t.append(df(0 until 100)) // c1
    t.append(df(100 until 200)) // c2
    t.deleteWhereMor(col("id") % 17 === 0) // c3: MoR position delete
    t.updateWhereMor(col("id") >= 50 && col("id") < 61,
      Map("name" -> upper(col("name")))) // c4: MoR update (some victims gone)
    t.deleteKeysMor(Seq("id"),
      Seq(3L, 107L, 55L, 9999L).toDF("id")) // c5: equality delete
    t.append(df(200 until 260)) // c6
    t.overwriteWhereMor(col("id") >= 180 && col("id") < 220,
      (180L until 220L).map(i => (i, "repl")).toDF("id", "name")) // c7
    t.compact(targetFiles = 2) // c8: true rewrite, content unchanged
    t.deleteWhereMor(col("id") < 10) // c9: MoR delete over compacted files
    t.updateWhereMor(col("id") % 31 === 5,
      Map("name" -> concat(col("name"), lit("!")))) // c10
    // c11-c14: the PARTIAL copy-on-write family — carried files must
    // cancel out of the replay, and the diff must stay exact
    lh.dml.delete("default.cl_mix", "id >= 240") // c11
    lh.dml.update("default.cl_mix", "id >= 230 AND id < 240",
      Map("name" -> "upd")) // c12
    lh.dml.overwriteWhereDf("default.cl_mix",
      col("id") >= 160 && col("id") < 170,
      (160L until 165L).map(i => (i, "rw")).toDF("id", "name")) // c13
    // zero-match upsert: everything inserts via alsoAppend, one snapshot
    lh.dml.upsert("default.cl_mix",
      Seq((165L, "up"), (9000L, "new")).toDF("id", "name"), Seq("id")) // c14
    assert(t.currentSnapshot.get.id == 14L,
      s"expected 14 commits, got ${t.currentSnapshot.get.id}")
    for (i <- 1L to 14L) {
      val before = if (i == 1) t.emptyDf(t.schema)
        else t.readSnapshot(t.snapshotById(i - 1))
      val after = t.readSnapshot(t.snapshotById(i))
      val ch = Changelog.changesBetween(t, if (i == 1) None else Some(i - 1), i)
      val ins = ch.where(col(Changelog.ChangeTypeCol) === "insert")
        .select("id", "name")
      val del = ch.where(col(Changelog.ChangeTypeCol) === "delete")
        .select("id", "name")
      val wantIns = after.exceptAll(before)
      val wantDel = before.exceptAll(after)
      assert(ins.exceptAll(wantIns).isEmpty && wantIns.exceptAll(ins).isEmpty,
        s"commit $i inserts diverge from the exact diff")
      assert(del.exceptAll(wantDel).isEmpty && wantDel.exceptAll(del).isEmpty,
        s"commit $i deletes diverge from the exact diff")
    }
    val all = Changelog.changesBetween(t, None, 14L)
    val material = all.where(col(Changelog.ChangeTypeCol) === "insert")
      .select("id", "name")
      .exceptAll(all.where(col(Changelog.ChangeTypeCol) === "delete")
        .select("id", "name"))
    val fin = t.read()
    assert(material.exceptAll(fin).isEmpty && fin.exceptAll(material).isEmpty,
      "folding the whole changelog must materialize the final table")
    // and the update-shaped commits paired by key classify consistently:
    // c4 updated 10 live rows (51 and 68? no - 51 and 85 were deleted by
    // c3's %17; count derived from the diff instead of hardcoding)
    val paired = Changelog.changesBetween(t, Some(3L), 4L,
      pairUpdateKeys = Seq("id"))
    val nb = paired.where(col(Changelog.ChangeTypeCol) === "update_before").count()
    val na = paired.where(col(Changelog.ChangeTypeCol) === "update_after").count()
    val want4 = t.readSnapshot(t.snapshotById(3L))
      .exceptAll(t.readSnapshot(t.snapshotById(4L))).count()
    assert(nb == want4 && na == want4, s"pairing: $nb/$na vs $want4")
  }

  test("compaction replay is empty BY CONTRACT (live rows preserved): " +
      "full, partial, and delete compaction read zero data files") {
    val lh = newLh()
    val t = lh.catalog.createTable("default.cl_cmp",
      Seq("id" -> "long", "name" -> "string"), Nil, Map.empty)
    t.append(df(0 until 50)) // c1
    t.append(df(50 until 90)) // c2
    t.compact(targetFiles = 1) // c3: full compact
    val ch3 = Changelog.changesBetween(t, Some(2L), 3L)
    assert(ch3.isEmpty, "full-compaction changelog must be empty")
    assert(logicalScanFiles(ch3.queryExecution.analyzed).isEmpty,
      "replaying a compaction must not plan a single file read")
    t.append(df(90 until 95)) // c4: small file
    t.append(df(95 until 99)) // c5: small file
    val sizes = t.currentSnapshot.get.files.map(_.bytes).sorted
    t.compactSmall(maxBytes = sizes(1), targetFiles = 1) // c6: partial
    val ch6 = Changelog.changesBetween(t, Some(5L), 6L)
    assert(ch6.isEmpty && logicalScanFiles(ch6.queryExecution.analyzed).isEmpty,
      "partial compaction must replay as a scan-free empty changelog")
    t.deleteWhereMor(col("id") < 3) // c7: MoR delete state to fold
    t.compactDeletes().foreach { _ => // c8: delete-file compaction
      val ch8 = Changelog.changesBetween(t, Some(7L), 8L)
      assert(ch8.isEmpty &&
        logicalScanFiles(ch8.queryExecution.analyzed).isEmpty,
        "delete compaction must replay as a scan-free empty changelog")
    }
    // and the whole-history fold still materializes the final table
    val toId = t.currentSnapshot.get.id
    val all = Changelog.changesBetween(t, None, toId)
    val material = all.where(col(Changelog.ChangeTypeCol) === "insert")
      .select("id", "name")
      .exceptAll(all.where(col(Changelog.ChangeTypeCol) === "delete")
        .select("id", "name"))
    val fin = t.read()
    assert(material.exceptAll(fin).isEmpty && fin.exceptAll(material).isEmpty)
  }

  test("rewrite replay cancels shared files (rewriteDelta): a rollback " +
      "past one commit reads ONLY that commit's files, never the " +
      "carried-forward table") {
    val lh = newLh()
    val t = lh.catalog.createTable("default.cl_rb",
      Seq("id" -> "long", "name" -> "string"), Nil, Map.empty)
    t.append(df(0 until 50)) // c1: file(s) shared by both snapshots
    t.append(df(1000 until 1050)) // c2: the rolled-back commit
    t.rollbackTo("1") // c3: replace re-referencing c1's manifests
    val ch = Changelog.changesBetween(t, Some(2L), 3L)
    val rows = ch.select(Changelog.ChangeTypeCol, "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows == (1000L until 1050L).map(("delete", _)).toSet,
      s"rollback must emit exactly the undone inserts, got ${rows.size}")
    // the diff is restricted to changed lineage: c1's file cancels out,
    // so only commit-2 data files appear in the plan
    val dataScans = logicalScanFiles(ch.queryExecution.analyzed)
      .filter(_.contains("/data/commit-"))
    assert(dataScans.nonEmpty)
    assert(dataScans.forall(_.contains("commit-00002")),
      s"shared files must cancel out of the rewrite replay: $dataScans")
  }
}
