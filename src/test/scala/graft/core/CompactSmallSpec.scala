package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Partial compaction: rewrite ONLY the files at or below a size
  * threshold, carry large files forward untouched — the small-files fix
  * whose cost is O(small), never O(table). Content preservation and
  * exact liveRows are asserted through every delete flavor. */
class CompactSmallSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def newCatalog() =
    Catalog.open(spark, SparkFixture.tmpDir("graft-csm-").toString)

  /** One big file (1000 rows) + 4 small ones (10 rows each). Returns the
    * threshold that makes exactly the small ones eligible. */
  private def seeded(cat: Catalog, name: String): (IceTable, Long) = {
    cat.createTable(name, Seq("id" -> "long", "v" -> "double"), Nil, Map.empty)
    val t = cat.loadTable(name)
    t.append(spark.range(0, 1000)
      .select(col("id"), (col("id") * 1.5).as("v")).coalesce(1))
    for (k <- 0 until 4)
      t.append(spark.range(2000 + k * 10, 2010 + k * 10)
        .select(col("id"), (col("id") * 1.5).as("v")).coalesce(1))
    val threshold = t.currentSnapshot.get.files.map(_.bytes).max - 1
    (t, threshold)
  }

  test("rewrites only the small files; big file untouched; content identical") {
    val cat = newCatalog()
    val (t, threshold) = seeded(cat, "default.basic")
    val before = t.read().orderBy("id").collect().toSeq
    val bigPath = t.currentSnapshot.get.files.maxBy(_.bytes).path
    val snap = t.compactSmall(threshold, targetFiles = 1)
    assert(snap.operation == "replace")
    val files = t.currentSnapshot.get.files
    assert(files.map(_.path).contains(bigPath), "big file must survive as-is")
    assert(files.size == 2, s"expected big + 1 rewritten, got ${files.map(_.path)}")
    assert(t.read().orderBy("id").collect().toSeq == before)
    assert(t.currentSnapshot.get.liveRows == 1040L)
  }

  test("no-op when nothing to gain") {
    val cat = newCatalog()
    val (t, threshold) = seeded(cat, "default.noop")
    val before = t.currentSnapshot.get
    // threshold below every file -> zero eligible
    assert(t.compactSmall(1L).id == before.id)
    assert(t.currentSnapshot.get.id == before.id)
  }

  test("position deletes spanning kept and small files stay exact") {
    val cat = newCatalog()
    val (t, threshold) = seeded(cat, "default.posdel")
    // delete 5 rows in the big file and 4 in small ones
    val n = t.deleteWhereMor(col("id").isin(1L, 2L, 3L, 4L, 5L, 2000L, 2010L, 2020L, 2030L))
    assert(n == 9L)
    val before = t.read().orderBy("id").collect().toSeq
    t.compactSmall(threshold, targetFiles = 1)
    val snap = t.currentSnapshot.get
    assert(t.read().orderBy("id").collect().toSeq == before)
    assert(snap.liveRows == 1040L - 9L, s"liveRows=${snap.liveRows}")
    // the surviving delete rows reference only the surviving big file
    assert(snap.deleteFiles.map(_.rows).sum == 5L,
      s"small-file delete rows must be absorbed: ${snap.deleteFiles}")
  }

  test("equality deletes: entries carry forward, liveRows stays exact") {
    val cat = newCatalog()
    val (t, threshold) = seeded(cat, "default.eqdel")
    // eq-delete 3 keys living in small files and 2 in the big one
    val nEq = t.deleteKeysMor(Seq("id"),
      Seq(10L, 20L, 2001L, 2002L, 2003L).toDF("id"))
    assert(nEq == 5L)
    val before = t.read().orderBy("id").collect().toSeq
    t.compactSmall(threshold, targetFiles = 1)
    val snap = t.currentSnapshot.get
    assert(t.read().orderBy("id").collect().toSeq == before)
    assert(snap.eqDeleteFiles.nonEmpty, "eq entries must carry forward")
    assert(snap.liveRows == 1040L - 5L, s"liveRows=${snap.liveRows}")
    // the rewritten files are above the entries' watermark: re-appending
    // an eq-deleted key must still survive (no retro-delete)
    t.append(Seq((2001L, 0.0)).toDF("id", "v"))
    assert(t.read().where(col("id") === 2001L).count() == 1)
  }

  test("concurrent append aborts the partial rewrite; retry succeeds") {
    val cat = newCatalog()
    val (t, threshold) = seeded(cat, "default.race")
    val other = cat.loadTable("default.race")
    var fired = false
    t.onCommitAttempt = _ => if (!fired) {
      fired = true
      other.append(Seq((9999L, 1.0)).toDF("id", "v"))
    }
    try intercept[java.util.ConcurrentModificationException] {
      t.compactSmall(threshold)
    } finally t.onCommitAttempt = _ => ()
    // nothing lost; retry against fresh state compacts cleanly
    assert(t.read().count() == 1041)
    t.compactSmall(t.currentSnapshot.get.files.map(_.bytes).max - 1)
    assert(t.read().count() == 1041)
    assert(t.read().where(col("id") === 9999L).count() == 1)
  }
}
