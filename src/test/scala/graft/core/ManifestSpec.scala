package graft.core

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** The append-only manifest layer: commits must write O(new files) bytes,
  * not O(snapshots × files) — the snapshot log holds constant-size
  * entries pointing at per-commit manifest files, and an append REUSES
  * the parent's manifests by reference (Iceberg's manifest-list design).
  * Legacy inline snapshot logs must stay readable and migrate on the
  * next commit. */
class ManifestSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def newCatalog() =
    Catalog.open(spark, SparkFixture.tmpDir("graft-mwh-").toString)

  private def df(ids: Range) = ids.map(i => (i.toLong, s"row$i")).toDF("id", "name")

  test("commit write-cost is O(new files): log entries are constant-size, " +
      "each data manifest holds only its own commit's files") {
    val cat = newCatalog()
    val tbl = cat.createTable("t", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    val logSizes = (1 to 5).map { i =>
      tbl.append(df(i * 10 until i * 10 + 5).repartition(2))
      Files.size(tbl.headPath(tbl.logHead._1))
    }
    // raw log entries inline NO file lists (they point at manifests)
    val raw = tbl.rawLog
    assert(raw.size == 5)
    assert(raw.forall(_.manifestList.isDefined))
    assert(raw.forall(r => r.files.isEmpty && r.deleteFiles.isEmpty))
    // per-commit log growth is ~constant: appending snapshot 5 (10 live
    // files) must cost about what appending snapshot 2 (4 live files)
    // did — not grow with total file count. Generous 2× slack for id
    // widths; the OLD design grew the delta linearly (full re-list).
    val deltas = logSizes.zip(logSizes.tail).map { case (a, b) => b - a }
    assert(deltas.last <= deltas.head * 2,
      s"log growth not O(1) per commit: $deltas")
    // the newest data manifest lists ONLY commit 5's files
    val ml = Manifests.readList(raw.last.manifestList.get)
    assert(ml.dataManifests.size == 5) // one per append, shared by reference
    val newest = Manifests.readManifest(ml.dataManifests.last)
    assert(newest.size == 2)
    assert(newest.forall(_.path.contains("commit-00005")))
    // manifests of earlier commits are SHARED by reference, not rewritten:
    // snapshot 4's list is a strict prefix of snapshot 5's
    val ml4 = Manifests.readList(raw(3).manifestList.get)
    assert(ml.dataManifests.startsWith(ml4.dataManifests))
    // resolved view is unchanged semantics: full live file set + rows
    assert(tbl.currentSnapshot.get.files.size == 10)
    assert(tbl.read().count() == 25)
    // time travel still resolves old snapshots' file sets
    assert(tbl.readAsOf(raw.head.id.toString).count() == 5)
  }

  test("MOR deletes ride the manifest layer: delete commits write only " +
      "delete manifests; eq-delete entries stay inline in the list") {
    val cat = newCatalog()
    val tbl = cat.createTable("t2", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    tbl.append(df(0 until 100).repartition(4))
    tbl.deleteWhereMor(col("id") < 10)
    tbl.deleteKeysMor(Seq("id"), Seq(50L, 51L).toDF("id"))
    val raw = tbl.rawLog
    assert(raw.size == 3)
    val ml2 = Manifests.readList(raw(1).manifestList.get)
    val ml3 = Manifests.readList(raw(2).manifestList.get)
    // the position-delete commit added ONE delete manifest, reused data
    assert(ml2.dataManifests == Manifests.readList(raw.head.manifestList.get).dataManifests)
    assert(ml2.deleteManifests.size == 1)
    // the eq-delete commit added an inline entry, touched no manifests
    assert(ml3.dataManifests == ml2.dataManifests)
    assert(ml3.deleteManifests == ml2.deleteManifests)
    assert(ml3.eqDeleteFiles.size == 1)
    assert(tbl.read().count() == 88)
    // rollback to the pre-delete snapshot resurrects everything
    tbl.rollbackTo(raw.head.id.toString)
    assert(tbl.read().count() == 100)
  }

  test("legacy inline snapshot log stays readable and migrates on commit") {
    val cat = newCatalog()
    val tbl = cat.createTable("t3", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    tbl.append(df(0 until 20))
    tbl.append(df(20 until 30))
    // rewrite the table in the OLD format: inline whole-file snapshots.json
    // log, no heads/ directory (pre-CAS layout)
    val inline = tbl.snapshots.map(_.copy(manifestList = None))
    Jsons.writeFile(tbl.snapshotsPath, inline)
    Files.walk(tbl.headsDir).iterator().asScala.toList
      .sortBy(-_.getNameCount).foreach(Files.deleteIfExists)
    assert(tbl.read().count() == 30)
    assert(tbl.readAsOf(inline.head.id.toString).count() == 20)
    // next commit bridges the legacy parent into manifest files AND
    // migrates the log to heads/v-1, tombstoning snapshots.json
    tbl.append(df(30 until 35))
    val raw = tbl.rawLog
    assert(raw.last.manifestList.isDefined)
    assert(raw.last.files.isEmpty)
    assert(!Files.exists(tbl.snapshotsPath),
      "legacy snapshots.json must be tombstoned after the first CAS commit")
    assert(Files.exists(tbl.dir.resolve("snapshots.json.v0-migrated")))
    assert(tbl.read().count() == 35)
    val ml = Manifests.readList(raw.last.manifestList.get)
    // parent's inline list was materialized as one manifest + one new
    assert(ml.dataManifests.size == 2)
  }

  test("long append chains fold their manifest list (merge-on-commit)") {
    val cat = newCatalog()
    val tbl = cat.createTable("t5", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    val n = IceTable.MergeManifestCount + 1
    (1 to n).foreach(i => tbl.append(df(i until i + 1).coalesce(1)))
    val raw = tbl.rawLog
    val ml = Manifests.readList(raw.last.manifestList.get)
    // chain was folded: merged manifest + the latest commit's own, not n
    assert(ml.dataManifests.size < IceTable.MergeManifestCount,
      s"expected merged chain, got ${ml.dataManifests.size} manifests")
    // nothing lost: full live file set and every row still readable
    assert(tbl.currentSnapshot.get.files.size == n)
    assert(tbl.read().count() == n)
    // pre-merge snapshots still resolve (their manifests stay on disk)
    assert(tbl.readAsOf(raw.head.id.toString).count() == 1)
  }

  test("crashed-writer stage dirs are reported and deleted by orphanFiles") {
    val cat = newCatalog()
    val tbl = cat.createTable("t6", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    tbl.append(df(0 until 10))
    // simulate a writer that died mid-stage (data written, never claimed)
    val dead = tbl.dataDir.resolve(".stage-deadbeef0000")
    Files.createDirectories(dead)
    df(100 until 105).coalesce(1).write.mode("overwrite")
      .parquet(dead.toString)
    // ...and one that died before writing anything (empty stage dir)
    val empty = tbl.dataDir.resolve(".stage-deadbeef0001")
    Files.createDirectories(empty)
    val orphans = tbl.orphanFiles()
    assert(orphans.exists(_.contains(".stage-deadbeef0000")),
      s"stranded stage parquet not reported: $orphans")
    assert(orphans.contains(empty.toString),
      s"empty stage dir not reported: $orphans")
    tbl.orphanFiles(delete = true)
    assert(!Files.exists(dead) && !Files.exists(empty),
      "stage dirs must be fully removed, not just their files")
    // live data untouched
    assert(tbl.read().count() == 10)
    assert(tbl.orphanFiles().isEmpty)
  }

  test("expired commit dirs vanish entirely — _SUCCESS markers don't pin them") {
    val cat = newCatalog()
    val tbl = cat.createTable("t7", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    tbl.append(df(0 until 10)) // commit-00001
    val firstDir = tbl.dataDir.resolve("commit-00001")
    assert(Files.exists(firstDir.resolve("_SUCCESS")), "expected Spark side files")
    tbl.overwrite(df(10 until 20)) // commit-00002
    tbl.expireSnapshots(retainLast = Some(1))
    tbl.orphanFiles(delete = true)
    assert(!Files.exists(firstDir),
      "expired commit dir must be removed wholesale, side files included")
    assert(tbl.read().count() == 10)
    assert(tbl.orphanFiles().isEmpty)
  }

  test("expire + orphanFiles collect stranded manifest files") {
    val cat = newCatalog()
    val tbl = cat.createTable("t4", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    tbl.append(df(0 until 10))
    val firstData = tbl.currentSnapshot.get.files.map(_.path)
    tbl.overwrite(df(10 until 20)) // snapshot 1's files now dead weight
    val expired = tbl.expireSnapshots(retainLast = Some(1))
    assert(expired.nonEmpty)
    val orphans = tbl.orphanFiles()
    // snapshot 1's data files AND its manifest/list JSON are orphaned
    assert(firstData.forall(orphans.contains))
    assert(orphans.exists(_.contains("list-00001")))
    assert(orphans.exists(p => p.contains("m-00001") && p.endsWith(".json")))
    tbl.orphanFiles(delete = true)
    assert(tbl.orphanFiles().isEmpty)
    assert(tbl.read().count() == 10)
    // the survivor's manifests are untouched
    val raw = tbl.rawLog
    assert(Files.exists(Paths.get(raw.last.manifestList.get)))
  }
}
