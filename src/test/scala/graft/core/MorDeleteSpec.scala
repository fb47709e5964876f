package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Merge-on-read position deletes: a delete commits a tiny
  * `(file_path, pos)` parquet instead of rewriting data files — the
  * Iceberg-v2 scale path for small deletes against huge tables. Every
  * assertion compares against the copy-on-write result, which is the
  * semantic oracle. */
class MorDeleteSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def newCatalog() =
    Catalog.open(spark, SparkFixture.tmpDir("graft-mor-").toString)

  private def seeded(cat: Catalog, name: String): IceTable = {
    cat.createTable(name, Seq("id" -> "long", "grp" -> "string", "v" -> "double"),
      Nil, Map.empty)
    val t = cat.loadTable(name)
    val df = spark.range(0, 1000)
      .select(col("id"), concat(lit("g"), pmod(col("id"), lit(7))).as("grp"),
        (col("id") * 1.5).as("v"))
      .repartition(4, col("id"))
    t.overwrite(df)
    t
  }

  private def ids(t: IceTable): Seq[Long] =
    t.read().select("id").as[Long].collect().toSeq.sorted

  test("MoR delete equals copy-on-write delete; data files untouched") {
    val cat = newCatalog()
    val mor = seeded(cat, "default.mor")
    val cow = seeded(cat, "default.cow")
    val filesBefore = mor.currentSnapshot.get.files.map(_.path).toSet

    val nMor = mor.deleteWhereMor(col("grp") === "g3" || col("id") < 10)
    // copy-on-write twin via the overwrite path
    val keep = cow.read().where(!(col("grp") === "g3" || col("id") < 10))
    cow.overwrite(keep)

    assert(nMor > 0)
    assert(ids(mor) == ids(cow), "MoR read must equal COW result")
    val snap = mor.currentSnapshot.get
    assert(snap.files.map(_.path).toSet == filesBefore,
      "MoR delete must not rewrite or drop any data file")
    assert(snap.deleteFiles.nonEmpty && snap.operation == "delete")
    assert(snap.liveRows == 1000 - nMor)
  }

  test("history preserved: pre-delete snapshot still sees every row") {
    val cat = newCatalog()
    val t = seeded(cat, "default.hist")
    val before = t.currentSnapshot.get.id
    t.deleteWhereMor(col("id") % 2 === 0)
    assert(t.read().count() == 500)
    assert(t.readAsOf(before.toString).count() == 1000,
      "time travel to the pre-delete snapshot must resurrect the rows")
  }

  test("deletes stack: second delete removes from the already-deleted view") {
    val cat = newCatalog()
    val t = seeded(cat, "default.stack")
    val n1 = t.deleteWhereMor(col("id") < 100)
    // overlapping predicate: rows < 100 are already gone, so only
    // [100, 200) match — positions are never deleted twice
    val n2 = t.deleteWhereMor(col("id") < 200)
    assert(n1 == 100 && n2 == 100)
    assert(t.read().count() == 800)
    assert(t.currentSnapshot.get.liveRows == 800)
  }

  test("append after MoR delete keeps old deletes; new rows unaffected") {
    val cat = newCatalog()
    val t = seeded(cat, "default.app")
    t.deleteWhereMor(col("id") < 500)
    t.append(Seq((5000L, "gX", 1.0), (5001L, "gX", 2.0))
      .toDF("id", "grp", "v"))
    val got = ids(t)
    assert(got.size == 502 && got.head == 500L && got.takeRight(2) == Seq(5000L, 5001L))
  }

  test("compaction absorbs deletes: files rewritten, delete list cleared") {
    val cat = newCatalog()
    val t = seeded(cat, "default.comp")
    t.deleteWhereMor(col("id") >= 900)
    val before = ids(t)
    t.compact(targetFiles = 2)
    val snap = t.currentSnapshot.get
    assert(snap.deleteFiles.isEmpty, "compaction must absorb position deletes")
    assert(snap.files.size == 2)
    assert(ids(t) == before)
  }

  test("zero-match delete commits an empty-delete snapshot and changes nothing") {
    val cat = newCatalog()
    val t = seeded(cat, "default.zero")
    val n = t.deleteWhereMor(col("id") === -1L)
    assert(n == 0)
    assert(t.read().count() == 1000)
    assert(t.currentSnapshot.get.deleteFiles.isEmpty,
      "a 0-row delete file must not be tracked")
  }

  test("orphan scan treats delete files as live") {
    val cat = newCatalog()
    val t = seeded(cat, "default.orph")
    t.deleteWhereMor(col("id") < 10)
    assert(t.orphanFiles() == Nil)
  }

  test("rollback past a delete resurrects rows; rollback to a delete keeps it") {
    val cat = newCatalog()
    val t = seeded(cat, "default.rb")
    val preDelete = t.currentSnapshot.get.id
    t.deleteWhereMor(col("id") < 100)
    val postDelete = t.currentSnapshot.get.id
    t.rollbackTo(preDelete.toString)
    assert(t.read().count() == 1000)
    t.rollbackTo(postDelete.toString)
    assert(t.read().count() == 900)
  }

  test("small delete set broadcasts: no shuffle of the data side") {
    val cat = newCatalog()
    val t = seeded(cat, "default.bc")
    t.deleteWhereMor(col("id") < 10)
    val plan = t.read().queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join for a tiny delete set, got:\n$plan")
  }

  test("equality delete drops matching keys without touching data files") {
    val cat = newCatalog()
    val t = seeded(cat, "eq1")
    val before = t.currentSnapshot.get.files.map(_.path).toSet
    val keys = Seq(1L, 5L, 999L, 123456L).toDF("id") // 123456 matches nothing
    val matched = t.deleteKeysMor(Seq("id"), keys)
    assert(matched == 3L)
    assert(t.currentSnapshot.get.files.map(_.path).toSet == before)
    assert(!ids(t).exists(Set(1L, 5L, 999L)))
    assert(ids(t).size == 997)
    assert(t.currentSnapshot.get.liveRows == 997L)
  }

  test("equality delete does not retro-delete later appends of the same key") {
    val cat = newCatalog()
    val t = seeded(cat, "eq2")
    t.deleteKeysMor(Seq("id"), Seq(7L).toDF("id"))
    assert(!ids(t).contains(7L))
    // re-insert id 7: the new row lives in a file the delete does not cover
    t.append(Seq((7L, "g0", 10.5)).toDF("id", "grp", "v"))
    assert(ids(t).count(_ == 7L) == 1)
    assert(t.currentSnapshot.get.liveRows == 1000L)
  }

  test("equality and position deletes stack with exact liveRows") {
    val cat = newCatalog()
    val t = seeded(cat, "eq3")
    t.deleteKeysMor(Seq("id"), Seq(1L, 2L).toDF("id"))
    val posDeleted = t.deleteWhereMor(col("id") < 10) // 0..9 minus eq-deleted 1,2
    assert(posDeleted == 8L)
    assert(ids(t).size == 990)
    assert(t.currentSnapshot.get.liveRows == 990L)
    // deleting an eq-deleted key again matches nothing (disjoint sets)
    assert(t.deleteKeysMor(Seq("id"), Seq(1L).toDF("id")) == 0L)
  }

  test("multi-column equality keys; null keys never match") {
    val cat = newCatalog()
    val t = seeded(cat, "eq4")
    val keys = Seq((Some(3L), Some("g3")), (Some(4L), None))
      .toDF("id", "grp") // (4, null) dropped by the writer
    val matched = t.deleteKeysMor(Seq("id", "grp"), keys)
    assert(matched == 1L)
    assert(!ids(t).contains(3L) && ids(t).contains(4L))
  }

  test("compaction absorbs equality deletes; rollback restores them") {
    val cat = newCatalog()
    val t = seeded(cat, "eq5")
    t.deleteKeysMor(Seq("id"), Seq(0L).toDF("id"))
    val delSnap = t.currentSnapshot.get.id
    t.compact(targetFiles = 2)
    assert(t.currentSnapshot.get.eqDeleteFiles.isEmpty)
    assert(ids(t).size == 999 && !ids(t).contains(0L))
    t.append(Seq((0L, "g0", 0.0)).toDF("id", "grp", "v"))
    assert(ids(t).contains(0L))
    t.rollbackTo(delSnap.toString)
    assert(!ids(t).contains(0L) && ids(t).size == 999)
  }

  test("orphan scan treats equality-delete files as live") {
    val cat = newCatalog()
    val t = seeded(cat, "eq6")
    t.deleteKeysMor(Seq("id"), Seq(10L).toDF("id"))
    assert(t.orphanFiles(delete = false).isEmpty)
    assert(ids(t).size == 999) // a scan after the (no-op) orphan pass
  }

  test("interleaved append/eq-delete: each entry scopes to its own watermark") {
    val cat = newCatalog()
    val t = seeded(cat, "eq7") // ids 0..999
    // delete 1: covers the seed files only
    t.deleteKeysMor(Seq("id"), Seq(1L, 2L).toDF("id"))
    // append re-inserts id 1 (not covered by delete 1) and adds 2000
    t.append(Seq((1L, "gA", 1.0), (2000L, "gA", 2.0)).toDF("id", "grp", "v"))
    // delete 2: covers seed + first append — kills the re-inserted 1 and 2000
    t.deleteKeysMor(Seq("id"), Seq(1L, 2000L, 3L).toDF("id"))
    // append again: id 2000 comes back, above delete 2's watermark
    t.append(Seq((2000L, "gB", 3.0)).toDF("id", "grp", "v"))
    val got = ids(t)
    assert(!got.contains(1L), "id 1 eq-deleted by the second entry")
    assert(!got.contains(2L) && !got.contains(3L))
    assert(got.count(_ == 2000L) == 1, "last append of 2000 must survive")
    assert(got.size == 997 + 1) // 1000 - {1,2,3} + final 2000
    val snap = t.currentSnapshot.get
    assert(snap.eqDeleteFiles.size == 2)
    val Seq(e1, e2) = snap.eqDeleteFiles.sortBy(_.coveredUpTo)
    assert(e1.coveredUpTo < e2.coveredUpTo,
      "watermarks must be the snapshot ids current at each delete")
    assert(snap.liveRows == got.size.toLong)
  }

  test("eq-delete read plan carries no per-file path literals") {
    val cat = newCatalog()
    val t = seeded(cat, "eq8")
    t.deleteKeysMor(Seq("id"), Seq(1L).toDF("id"))
    val plan = t.read().queryExecution.optimizedPlan.toString
    val nFiles = t.currentSnapshot.get.files.size
    assert(nFiles > 1, "seed must produce multiple files for this to bite")
    // the old design inlined every covered file path via isInCollection —
    // O(files) literals serialized to every task at 100 TB scale
    assert(!plan.contains("commit-00001/part-"),
      s"read plan must not embed data-file path literals:\n$plan")
    assert(plan.contains("commit-"), // the scalar watermark extract is fine
      "expected the commit-id extraction in the plan")
  }

  test("rename of an eq-delete key column resolves by field-id") {
    val cat = newCatalog()
    val t = seeded(cat, "eq9")
    t.deleteKeysMor(Seq("id"), Seq(5L, 6L).toDF("id"))
    t.renameColumn("id", "doc_id")
    val t2 = cat.loadTable("eq9")
    val got = t2.read().select("doc_id").as[Long].collect().toSeq.sorted
    assert(got.size == 998 && !got.contains(5L) && !got.contains(6L),
      "rename must not detach the live equality delete")
    // and the delete still scopes: re-insert under the new name survives
    t2.append(Seq((5L, "g0", 0.0)).toDF("doc_id", "grp", "v"))
    assert(t2.read().where(col("doc_id") === 5L).count() == 1)
  }

  test("dropping a live eq-delete key column is refused; non-key drop fine") {
    val cat = newCatalog()
    val t = seeded(cat, "eq10")
    t.deleteKeysMor(Seq("id"), Seq(9L).toDF("id"))
    val ex = intercept[IllegalArgumentException](t.dropColumn("id"))
    assert(ex.getMessage.contains("equality-delete"))
    t.dropColumn("v") // not a key column — allowed
    assert(ids(t).size == 999)
    // compaction absorbs the entry, after which the drop is legal
    t.compact(targetFiles = 1)
    cat.loadTable("eq10").dropColumn("id")
  }

  test("orphan scan is separator-anchored: sibling dir sharing an eq-dir prefix is collectible") {
    val cat = newCatalog()
    val t = seeded(cat, "eq11")
    t.deleteKeysMor(Seq("id"), Seq(10L).toDF("id"))
    val eqDir = t.currentSnapshot.get.eqDeleteFiles.head.dir
    // a stray file in a SIBLING dir whose name extends the eq-dir's name
    val strayDir = java.nio.file.Paths.get(eqDir + "-tmp")
    java.nio.file.Files.createDirectories(strayDir)
    val stray = strayDir.resolve("leftover.parquet")
    java.nio.file.Files.write(stray, Array[Byte](1, 2, 3))
    assert(t.orphanFiles(delete = false).contains(stray.toString),
      "prefix match without the separator must not shield sibling dirs")
    t.orphanFiles(delete = true)
    assert(!java.nio.file.Files.exists(stray))
    assert(ids(t).size == 999) // table unharmed
  }

  test("Dml.delete honors write.delete.mode=merge-on-read") {
    val cat = newCatalog()
    val lh = graft.Lakehouse.open(spark, cat.warehouse.toString)
    lh.catalog.createTable("default.dmor",
      Seq("id" -> "long", "v" -> "string"), Nil,
      Map("write.delete.mode" -> "merge-on-read"))
    val t = lh.catalog.loadTable("default.dmor")
    t.overwrite(spark.range(0, 100)
      .select(col("id"), concat(lit("x"), col("id")).as("v")))
    val filesBefore = t.currentSnapshot.get.files.map(_.path).toSet
    val n = lh.dml.delete("default.dmor", "id < 25")
    assert(n == 25)
    val t2 = lh.catalog.loadTable("default.dmor")
    assert(t2.read().count() == 75)
    assert(t2.currentSnapshot.get.files.map(_.path).toSet == filesBefore,
      "property must route the CLI/API delete through the MoR path")
  }

  test("MoR writers skip files the filter cannot touch: the victim scan " +
      "opens only candidate files (manifest bounds)") {
    val cat = newCatalog()
    cat.createTable("default.morskip",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val t = cat.loadTable("default.morskip")
    t.append((0L until 100L).map(i => (i, s"a$i")).toDF("id", "v"))
    t.append((10000L until 10100L).map(i => (i, s"b$i")).toDF("id", "v"))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.analyzed.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                h.location.inputFiles.toSeq
              case _ => Nil
            }
        }.flatten.foreach(seen.add)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // both a range and an IN-list shape restrict the scan
      assert(t.deleteWhereMor(col("id") < 3) == 3L)
      assert(t.updateWhereMor(col("id").isin(5L, 7L),
        Map("v" -> lit("upd"))) == 2L)
      val deadline = System.nanoTime() + 10e9.toLong
      def scans() = {
        import scala.jdk.CollectionConverters._
        seen.asScala.toSeq.filter(_.contains("/morskip/data/commit-"))
      }
      while (scans().size < 2 && System.nanoTime() < deadline)
        Thread.sleep(50)
      val got = scans()
      assert(got.nonEmpty, "expected the victim scans to be observed")
      assert(got.forall(_.contains("commit-00001")),
        s"MoR victim scan opened files the filter cannot touch: $got")
    } finally spark.listenerManager.unregister(listener)
    assert(t.read().count() == 197)
    assert(t.read().where(col("v") === "upd").count() == 2)
  }
}
