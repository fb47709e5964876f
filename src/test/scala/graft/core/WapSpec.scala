package graft.core

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Write-audit-publish staged commits (IceTable.stageAppend / readWap /
  * publishWap / discardWap): staged data invisible to main until an atomic
  * zero-copy publish; auditable in between; safe under races and GC. */
class WapSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def newCatalog() =
    Catalog.open(spark, SparkFixture.tmpDir("graft-wap-").toString)

  private def df(ids: Range) =
    ids.map(i => (i.toLong, s"row$i")).toDF("id", "name")

  test("staged write is invisible to main; publish is zero-copy and makes " +
      "it visible atomically") {
    val cat = newCatalog()
    val t = cat.createTable("t1", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    t.append(df(0 until 10))
    val logBefore = t.rawLog.map(_.id)
    val sc = t.stageAppend(df(100 until 120), "batch-7")
    assert(sc.rows == 20 && t.stagedCommits.map(_.wapId) == List("batch-7"))
    // invisible: no new snapshot, main reads exactly the old rows
    assert(t.rawLog.map(_.id) == logBefore)
    assert(t.read().count() == 10)
    // audit view = main + staged
    assert(t.readWap("batch-7").count() == 30)
    assert(t.readWap("batch-7").where(col("id") >= 100).count() == 20)
    val snap = t.publishWap("batch-7")
    assert(snap.summary("published-wap") == "batch-7")
    assert(t.read().count() == 30)
    // zero-copy: staged dir was RENAMED into the commit dir, not copied
    assert(!Files.exists(Paths.get(sc.dir)), "staged dir must be renamed away")
    assert(snap.files.exists(_.path.contains(f"commit-${snap.id}%05d")))
    assert(t.stagedCommits.isEmpty)
    // eq-delete watermark safety: published files live under commit-<id>
    // so a later equality delete scopes them correctly
    t.deleteKeysMor(Seq("id"), Seq(105L).toDF("id"))
    assert(t.read().where(col("id") === 105L).count() == 0)
  }

  test("discard drops the staged data; orphan GC pins registered staged " +
      "dirs and collects crashed unregistered ones") {
    val cat = newCatalog()
    val t = cat.createTable("t2", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    t.append(df(0 until 5))
    val sc = t.stageAppend(df(10 until 15), "audit-me")
    // registered staged dir survives a destructive orphan sweep
    t.orphanFiles(delete = true)
    assert(Files.exists(Paths.get(sc.dir)), "registered staged dir was GC'd")
    assert(t.readWap("audit-me").count() == 10)
    // a crashed stage (dir without registry entry) IS collected
    val crashed = t.dataDir.resolve(".wap-crashed-xyz")
    Files.createDirectories(crashed)
    Files.write(crashed.resolve("junk.parquet"), Array[Byte](1, 2, 3))
    t.orphanFiles(delete = true)
    assert(!Files.exists(crashed), "unregistered .wap- dir must be collected")
    t.discardWap("audit-me")
    assert(!Files.exists(Paths.get(sc.dir)))
    assert(t.stagedCommits.isEmpty)
    assert(t.read().count() == 5)
    intercept[IllegalArgumentException] { t.publishWap("audit-me") }
  }

  test("publish commutes with a concurrent foreign append: both land, " +
      "ids dense, no rows lost") {
    val cat = newCatalog()
    val a = cat.createTable("t3", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    a.append(df(0 until 10))
    a.stageAppend(df(100 until 110), "wap1")
    val b = cat.loadTable("t3")
    var fired = false
    a.onCommitAttempt = _ => if (!fired) { fired = true; b.append(df(200 until 210)) }
    val snap = a.publishWap("wap1")
    a.onCommitAttempt = _ => ()
    assert(a.rawLog.map(_.id) == List(1L, 2L, 3L))
    assert(snap.id == 3L && snap.parentId.contains(2L))
    assert(a.read().count() == 30, "publish must carry the competitor's rows")
  }

  test("schema evolution between stage and publish resolves by field-id") {
    val cat = newCatalog()
    val t = cat.createTable("t4", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    t.append(df(0 until 3))
    t.stageAppend(df(10 until 13), "pre-evo")
    t.renameColumn("name", "label")
    // audit view already resolves the staged files' old column by field-id
    assert(t.readWap("pre-evo").select("label").where(col("id") === 10L)
      .head.getString(0) == "row10")
    t.publishWap("pre-evo")
    val rows = t.read().orderBy("id").select("label").collect().map(_.getString(0))
    assert(rows.toSeq == Seq("row0", "row1", "row2", "row10", "row11", "row12"))
  }

  test("publish crash window: a surviving registry entry whose dir was " +
      "already renamed recovers to the published snapshot") {
    val cat = newCatalog()
    val t = cat.createTable("t6", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    t.append(df(0 until 5))
    val sc = t.stageAppend(df(10 until 15), "crashy")
    val snap = t.publishWap("crashy")
    // simulate the crash between the commit CAS and the registry cleanup:
    // the registry entry is back, the dir is long renamed away
    Jsons.writeFile(t.dir.resolve("staged").resolve("crashy.json"), sc)
    assert(t.stagedCommits.map(_.wapId) == List("crashy"))
    val recovered = t.publishWap("crashy")
    assert(recovered.id == snap.id,
      "retried publish must recognize the published snapshot, not re-publish")
    assert(t.stagedCommits.isEmpty, "recovery must finish the cleanup")
    assert(t.read().count() == 10, "no rows may be double-published")
    // a registry entry with a missing dir and NO published snapshot is a
    // loud, actionable error
    Jsons.writeFile(t.dir.resolve("staged").resolve("ghost.json"),
      StagedCommit("ghost", t.dataDir.resolve(".wap-ghost-x").toString,
        1, 0, 0, 0L))
    intercept[IllegalStateException] { t.publishWap("ghost") }
    t.discardWap("ghost")
  }

  test("orphan GC refuses a destructive sweep while a tag dangles " +
      "(mid-reinstatement window)") {
    val cat = newCatalog()
    val t = cat.createTable("t7", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    t.append(df(0 until 5))
    t.setProperty("ref.tag.dangling", "999")
    intercept[IllegalArgumentException] { t.orphanFiles(delete = true) }
    t.orphanFiles(delete = false) // dry-run stays available
    t.removeTag("dangling")
    t.orphanFiles(delete = true) // consistent pins sweep fine
  }

  test("duplicate wap id refused; bad ids refused") {
    val cat = newCatalog()
    val t = cat.createTable("t5", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    t.stageAppend(df(0 until 2), "x1")
    intercept[IllegalArgumentException] { t.stageAppend(df(2 until 4), "x1") }
    intercept[IllegalArgumentException] { t.stageAppend(df(2 until 4), "a/b") }
    t.discardWap("x1")
  }
}
