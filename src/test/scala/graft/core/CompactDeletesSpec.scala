package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Delete-file compaction (IceTable.compactDeletes): accumulated
  * equality-delete entries and position-delete files fold into ONE
  * position-delete file, data files untouched, read results identical. */
class CompactDeletesSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def newCatalog() =
    Catalog.open(spark, SparkFixture.tmpDir("graft-cds-").toString)

  private def df(ids: Range) =
    ids.map(i => (i.toLong, s"row$i", i % 5)).toDF("id", "name", "grp")

  test("N eq-delete + pos-delete commits fold to one delete file; " +
      "rows, liveRows and watermark semantics all preserved") {
    val cat = newCatalog()
    val t = cat.createTable("t1",
      Seq("id" -> "long", "name" -> "string", "grp" -> "int"), Nil, Map.empty)
    t.append(df(0 until 100)) // commit 1
    // two equality deletes (cover commit 1 only)
    t.deleteKeysMor(Seq("id"), Seq(5L, 15L, 25L).toDF("id")) // commit 2
    t.deleteKeysMor(Seq("grp"), Seq(4).toDF("grp")) // commit 3: ids %5==4
    // appended AFTER the eq deletes: same keys must SURVIVE (watermark)
    t.append(df(100 until 120)) // commit 4 (grp 4 rows: 104,109,114,119)
    // two position deletes
    t.deleteWhereMor(col("id") === 50L) // commit 5
    t.deleteWhereMor(col("id") === 101L) // commit 6
    val before = t.read().orderBy("id").collect().toSeq
    val liveBefore = t.currentSnapshot.get.liveRows
    val eqBefore = t.currentSnapshot.get.eqDeleteFiles.size
    val posBefore = t.currentSnapshot.get.deleteFiles.size
    assert(eqBefore == 2 && posBefore == 2)

    val snap = t.compactDeletes().get
    assert(snap.eqDeleteFiles.isEmpty, "eq entries must be folded away")
    assert(snap.deleteFiles.size == 1,
      s"expected ONE folded delete file, got ${snap.deleteFiles.size}")
    // data files untouched — zero data rewrite
    assert(snap.files == t.snapshotById(6L).get.files)

    val after = t.read().orderBy("id").collect().toSeq
    assert(after == before, "read must be identical after delete compaction")
    assert(t.currentSnapshot.get.liveRows == liveBefore)
    assert(after.map(_.getLong(0)).toSet.intersect(Set(5L, 15L, 25L, 50L, 101L))
      .isEmpty)
    // watermark-protected rows are still present
    assert(after.map(_.getLong(0)).toSet
      .intersect(Set(104L, 109L, 114L, 119L)) == Set(104L, 109L, 114L, 119L))
    // old snapshots still time-travel with their own delete state
    assert(t.readAsOf("1").count() == 100)
  }

  test("read plan after compaction is a single anti-join — no per-entry " +
      "equality joins left") {
    val cat = newCatalog()
    val t = cat.createTable("t2",
      Seq("id" -> "long", "name" -> "string", "grp" -> "int"), Nil, Map.empty)
    t.append(df(0 until 50))
    (0 until 3).foreach(k =>
      t.deleteKeysMor(Seq("id"), Seq(k.toLong * 7 + 1).toDF("id")))
    val planBefore = t.read().queryExecution.optimizedPlan.toString
    assert(planBefore.split("Join LeftOuter").length - 1 >= 3,
      s"expected per-entry eq joins before compaction:\n$planBefore")
    t.compactDeletes()
    val planAfter = t.read().queryExecution.optimizedPlan.toString
    assert(planAfter.split("LeftAnti").length - 1 == 1,
      s"expected exactly one anti-join after compaction:\n$planAfter")
    assert(!planAfter.contains("LeftOuter"),
      s"no equality-delete joins may remain:\n$planAfter")
    assert(t.read().count() == 47)
  }

  test("nothing to fold returns None and commits nothing") {
    val cat = newCatalog()
    val t = cat.createTable("t3",
      Seq("id" -> "long", "name" -> "string", "grp" -> "int"), Nil, Map.empty)
    t.append(df(0 until 10))
    assert(t.compactDeletes().isEmpty)
    t.deleteWhereMor(col("id") === 3L) // a single pos-delete file: fine as-is
    val log = t.rawLog.map(_.id)
    assert(t.compactDeletes().isEmpty)
    assert(t.rawLog.map(_.id) == log)
  }

  test("concurrent commit between read and CAS aborts the compaction " +
      "instead of erasing the competitor's deletes") {
    val cat = newCatalog()
    val a = cat.createTable("t4",
      Seq("id" -> "long", "name" -> "string", "grp" -> "int"), Nil, Map.empty)
    a.append(df(0 until 50))
    a.deleteKeysMor(Seq("id"), Seq(1L).toDF("id"))
    a.deleteKeysMor(Seq("id"), Seq(2L).toDF("id"))
    val b = cat.loadTable("t4")
    var fired = false
    a.onCommitAttempt = _ => if (!fired) { fired = true; b.deleteWhereMor(col("id") === 30L) }
    intercept[java.util.ConcurrentModificationException] { a.compactDeletes() }
    a.onCommitAttempt = _ => ()
    // the competitor's delete survives; a retry folds everything
    assert(a.read().where(col("id") === 30L).count() == 0)
    val snap = a.compactDeletes().get
    assert(snap.deleteFiles.size == 1 && snap.eqDeleteFiles.isEmpty)
    assert(a.read().count() == 47)
  }
}
