package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Merge-on-read UPDATE: one atomic snapshot carrying both the position
  * deletes of the old rows and the appended updated copies. Every
  * assertion compares against the copy-on-write rewrite, the semantic
  * oracle. */
class MorUpdateSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def newCatalog() =
    Catalog.open(spark, SparkFixture.tmpDir("graft-moru-").toString)

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

  test("MoR update equals copy-on-write update; old data files untouched; one snapshot") {
    val cat = newCatalog()
    val mor = seeded(cat, "default.mor")
    val cow = seeded(cat, "default.cow")
    val filesBefore = mor.currentSnapshot.get.files.map(_.path).toSet
    val snapsBefore = mor.rawLog.size

    val filter = col("grp") === "g3" || col("id") < 10
    val sets = Map("v" -> lit(-1.0), "grp" -> lit("updated"))
    val nMor = mor.updateWhereMor(filter, sets)
    val cowDf = cow.read()
    val marked = cowDf.withColumn("__m", coalesce(filter, lit(false)))
    val nCow = marked.where(col("__m")).count()
    cow.overwrite(marked
      .withColumn("v", when(col("__m"), lit(-1.0)).otherwise(col("v")))
      .withColumn("grp", when(col("__m"), lit("updated")).otherwise(col("grp")))
      .drop("__m"))
    assert(nMor == nCow && nMor > 0, s"mor=$nMor cow=$nCow")

    // identical content
    assert(mor.read().exceptAll(cow.read()).isEmpty &&
      cow.read().exceptAll(mor.read()).isEmpty)
    // atomic: exactly ONE new snapshot, old data files all still referenced
    assert(mor.rawLog.size == snapsBefore + 1)
    val after = mor.currentSnapshot.get
    assert(filesBefore.subsetOf(after.files.map(_.path).toSet),
      "MoR update must not rewrite existing data files")
    assert(after.deleteFiles.nonEmpty, "update must carry position deletes")
    assert(after.operation == "update")
    assert(after.summary("updated-rows").toLong == nMor)
    // history: the pre-update snapshot still shows the old values
    val prev = mor.rawLog(snapsBefore - 1).id
    assert(mor.readAsOf(prev.toString).where(col("grp") === "updated").count() == 0)
  }

  test("update of already-updated rows composes (delete files stack)") {
    val cat = newCatalog()
    val t = seeded(cat, "default.twice")
    assert(t.updateWhereMor(col("id") < 100, Map("v" -> lit(0.0))) == 100L)
    assert(t.updateWhereMor(col("id") < 50, Map("v" -> lit(9.0))) == 50L)
    val v = t.read().agg(
      sum(when(col("v") === 9.0, 1L).otherwise(0L)),
      sum(when(col("v") === 0.0, 1L).otherwise(0L))).head()
    assert(v.getLong(0) == 50L && v.getLong(1) == 50L)
    assert(t.read().count() == 1000)
  }

  test("zero-match update commits NOTHING: no snapshot, no empty data file") {
    val cat = newCatalog()
    val t = seeded(cat, "default.zero")
    val snapsBefore = t.rawLog.size
    assert(t.updateWhereMor(col("id") < 0, Map("v" -> lit(0.0))) == 0L)
    assert(t.read().count() == 1000)
    assert(t.rawLog.size == snapsBefore,
      "a no-match update must not burn a snapshot per scheduled run")
    assert(t.orphanFiles().isEmpty, "no-match update left stranded files")
  }

  test("concurrent MoR updates of the SAME row: the loser aborts, no duplicate") {
    val cat = newCatalog()
    val t = seeded(cat, "default.upur")
    val other = cat.loadTable("default.upur")
    var fired = false
    t.onCommitAttempt = _ => if (!fired) {
      fired = true
      assert(other.updateWhereMor(col("id") === 7L, Map("v" -> lit(-1.0))) == 1L)
    }
    try intercept[java.util.ConcurrentModificationException] {
      t.updateWhereMor(col("id") === 7L, Map("v" -> lit(-2.0)))
    } finally t.onCommitAttempt = _ => ()
    // exactly ONE row id=7 with the winner's value — the loser committing
    // would have appended a second copy
    val rows = t.read().where(col("id") === 7L).collect()
    assert(rows.length == 1 && rows(0).getDouble(2) == -1.0, rows.mkString)
  }

  test("update racing a concurrent MoR delete of its rows aborts (no resurrection)") {
    val cat = newCatalog()
    val t = seeded(cat, "default.updel")
    val other = cat.loadTable("default.updel")
    var fired = false
    t.onCommitAttempt = _ => if (!fired) {
      fired = true
      assert(other.deleteWhereMor(col("id") === 7L) == 1L)
    }
    try intercept[java.util.ConcurrentModificationException] {
      t.updateWhereMor(col("id") === 7L, Map("v" -> lit(-2.0)))
    } finally t.onCommitAttempt = _ => ()
    // the delete won; the aborted update must not re-append the row
    assert(t.read().where(col("id") === 7L).count() == 0)
  }

  test("unknown SET column and empty SET are refused") {
    val cat = newCatalog()
    val t = seeded(cat, "default.bad")
    intercept[IllegalArgumentException] {
      t.updateWhereMor(col("id") < 10, Map("nope" -> lit(1)))
    }
    intercept[IllegalArgumentException] {
      t.updateWhereMor(col("id") < 10, Map.empty)
    }
  }

  test("concurrent compaction aborts the update; retry against fresh state succeeds") {
    val cat = newCatalog()
    val t = seeded(cat, "default.conflict")
    val other = cat.loadTable("default.conflict")
    var fired = false
    t.onCommitAttempt = _ => if (!fired) { fired = true; other.compact(2) }
    try intercept[java.util.ConcurrentModificationException] {
      t.updateWhereMor(col("id") < 10, Map("v" -> lit(-7.5)))
    } finally t.onCommitAttempt = _ => ()
    // nothing half-applied (sentinel value never occurs in seeded data)
    assert(t.read().where(col("v") === -7.5).count() == 0)
    assert(t.updateWhereMor(col("id") < 10, Map("v" -> lit(-7.5))) == 10L)
    assert(t.read().where(col("v") === -7.5).count() == 10)
  }

  test("concurrent append commutes: both land, appended rows untouched") {
    val cat = newCatalog()
    val t = seeded(cat, "default.commute")
    val other = cat.loadTable("default.commute")
    var fired = false
    t.onCommitAttempt = _ => if (!fired) {
      fired = true
      other.append(Seq((5000L, "g1", 1.0)).toDF("id", "grp", "v"))
    }
    try assert(t.updateWhereMor(col("grp") === "g1", Map("v" -> lit(0.0))) > 0)
    finally t.onCommitAttempt = _ => ()
    // the concurrent append's g1 row was NOT read by the update → survives
    assert(t.read().where(col("id") === 5000L && col("v") === 1.0).count() == 1)
    assert(t.read().count() == 1001)
  }

  test("orphan GC sweeps a crashed update's temp hit-set dir") {
    val cat = newCatalog()
    val t = seeded(cat, "default.crash")
    // simulate a writer that died between materializing the hit set and
    // committing: a .upd-hits-* dir with data + Spark side files
    val dead = java.nio.file.Paths.get(t.dir.toString, "data", ".upd-hits-deadbeef")
    java.nio.file.Files.createDirectories(dead)
    java.nio.file.Files.writeString(dead.resolve("part-0.parquet"), "x")
    java.nio.file.Files.writeString(dead.resolve("_SUCCESS"), "")
    t.orphanFiles(delete = true)
    assert(!java.nio.file.Files.exists(dead),
      "crashed update temp dir survived the GC sweep")
    assert(t.read().count() == 1000, "GC touched live data")
  }

  test("Dml honors write.update.mode=merge-on-read") {
    val wh = SparkFixture.tmpDir("graft-morudml-").toString
    val lh = graft.Lakehouse.open(spark, wh)
    lh.catalog.createTable("default.u",
      Seq("id" -> "long", "v" -> "double"), Nil,
      Map("write.update.mode" -> "merge-on-read"))
    val t = lh.catalog.loadTable("default.u")
    t.append(spark.range(0, 100).select(col("id"), (col("id") * 1.0).as("v")))
    val filesBefore = t.currentSnapshot.get.files.map(_.path).toSet
    val n = lh.dml.update("default.u", "id < 10", Map("v" -> 999.0))
    assert(n == 10L)
    val after = lh.catalog.loadTable("default.u")
    assert(after.read().where(col("v") === 999.0).count() == 10)
    assert(filesBefore.subsetOf(
      after.currentSnapshot.get.files.map(_.path).toSet),
      "MoR Dml update must not rewrite data files")
    assert(after.currentSnapshot.get.operation == "update")
  }
}
