package graft.core

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** The cross-process optimistic commit protocol (CAS over write-once
  * `heads/v-N.json` files — Iceberg's HadoopTableOperations shape).
  *
  * The in-JVM [[IceTable.tableLock]] serializes same-process writers, so
  * these specs simulate a FOREIGN process with the `onCommitAttempt` hook:
  * it fires between a commit's head-read and its CAS attempt — exactly the
  * window where another process can land a commit — and runs a full
  * competing commit on a SECOND IceTable instance (the lock is reentrant
  * from the same thread, as it would be absent for a real second process).
  *
  * Invariants asserted throughout: no commit is ever lost (the round-11
  * log rewrite silently dropped the loser — last-writer-wins), snapshot
  * ids stay dense and the parent chain linear, and data-dir names always
  * equal the snapshot id that landed (the eq-delete watermark parses ids
  * from `data/commit-NNNNN/` paths). */
class ConcurrentCommitSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def newCatalog() =
    Catalog.open(spark, SparkFixture.tmpDir("graft-ccs-").toString)

  private def df(ids: Range) = ids.map(i => (i.toLong, s"row$i")).toDF("id", "name")

  /** Arm `t`'s hook to run `competitor` exactly once, then disarm. */
  private def injectOnce(t: IceTable)(competitor: => Unit): Unit = {
    var fired = false
    t.onCommitAttempt = _ => if (!fired) { fired = true; competitor }
  }

  private def assertLinear(t: IceTable): Unit = {
    val log = t.rawLog
    assert(log.map(_.id) == log.map(_.id).sorted, "ids out of order")
    assert(log.map(_.id).distinct == log.map(_.id), "duplicate snapshot ids")
    log.sliding(2).foreach {
      case List(a, b) => assert(b.parentId.contains(a.id),
        s"broken parent chain: ${b.id} -> ${b.parentId}, expected ${a.id}")
      case _ =>
    }
  }

  test("append vs append: loser retries, both commits survive, ids dense") {
    val cat = newCatalog()
    val a = cat.createTable("t1", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    a.append(df(0 until 10))
    val b = cat.loadTable("t1")
    injectOnce(a)(b.append(df(100 until 110)))
    val retriesBefore = IceTable.casRetryCounter.get()
    a.append(df(200 until 210))
    // the diagnostic retry counter (tools/CommitThroughput's metric)
    // must actually fire on a lost CAS — a zero-retries measurement
    // means genuinely-no-contention, not a dead counter
    assert(IceTable.casRetryCounter.get() > retriesBefore,
      "the lost CAS must increment casRetryCounter")
    val log = a.rawLog
    assert(log.map(_.id) == List(1L, 2L, 3L), s"expected dense ids, got $log")
    assertLinear(a)
    // NEITHER write lost: all 30 rows live (the pre-CAS log rewrite would
    // have dropped b's 10)
    assert(a.read().count() == 30)
    // data dirs landed on the ids their snapshots carry (watermark safety)
    assert(Files.isDirectory(a.dataDir.resolve("commit-00002")))
    assert(Files.isDirectory(a.dataDir.resolve("commit-00003")))
  }

  test("append vs expire: expire publishes first, append re-parents onto " +
      "the shrunk log") {
    val cat = newCatalog()
    val a = cat.createTable("t2", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    a.append(df(0 until 5))
    a.append(df(5 until 10))
    a.append(df(10 until 15))
    val b = cat.loadTable("t2")
    injectOnce(a)(assert(b.expireSnapshots(retainLast = Some(1)) == List(1L, 2L)))
    a.append(df(15 until 20))
    val log = a.rawLog
    assert(log.map(_.id) == List(3L, 4L))
    assert(log.last.parentId.contains(3L))
    // append keeps the parent's files: nothing lost despite the expire
    assert(a.read().count() == 20)
  }

  test("data-less winner (rollback) steals the id: append's claimed dir " +
      "moves forward to the retry id") {
    val cat = newCatalog()
    val a = cat.createTable("t3", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    a.append(df(0 until 10)) // id 1
    a.append(df(10 until 20)) // id 2
    val b = cat.loadTable("t3")
    // b's rollback is pure metadata: it claims NO data dir but takes
    // snapshot id 3 — a's staged data must migrate to commit-00004
    injectOnce(a)(b.rollbackTo("1"))
    a.append(df(20 until 30))
    val log = a.rawLog
    assert(log.map(_.id) == List(1L, 2L, 3L, 4L))
    assert(log(2).summary.get("rolled-back-to").contains("1"))
    assertLinear(a)
    // rollback dropped id 2's rows from the live view; append's rows land
    assert(a.read().count() == 20)
    assert(Files.isDirectory(a.dataDir.resolve("commit-00004")))
    assert(!Files.exists(a.dataDir.resolve("commit-00003")),
      "no data dir may exist for the data-less rollback snapshot")
  }

  test("MoR position delete vs rollback: delete retries onto the rollback " +
      "and still removes its rows") {
    val cat = newCatalog()
    val a = cat.createTable("t4", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    a.append(df(0 until 100)) // id 1
    a.append(df(100 until 110)) // id 2
    val b = cat.loadTable("t4")
    // rollback to id 1 lands between the delete's read and its CAS; the
    // delete's positions reference id-1 files, which the zero-copy
    // rollback re-references — still valid, commit allowed
    injectOnce(a)(b.rollbackTo("1"))
    val deleted = a.deleteWhereMor(col("id") < 10)
    assert(deleted == 10)
    val log = a.rawLog
    assert(log.map(_.id) == List(1L, 2L, 3L, 4L))
    assert(log.last.operation == "delete")
    assert(log.last.parentId.contains(3L))
    // live view: rollback restored 0..99, then delete removed 0..9
    assert(a.read().count() == 90)
    assert(a.read().where(col("id") < 10).count() == 0)
  }

  test("MoR update vs rollback: the update ABORTS — committing would " +
      "resurrect rows the rollback removed") {
    val cat = newCatalog()
    val a = cat.createTable("t4u", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    a.append(df(0 until 10)) // id 1
    a.append(df(100 until 110)) // id 2
    val b = cat.loadTable("t4u")
    // the update reads id 2's state (rows 0..9 + 100..109) and computes
    // updated copies of 100..109; the rollback to id 1 removes exactly
    // those rows from the live view — letting the update land would
    // append fresh copies of them (its position deletes against the
    // rolled-back-away id-2 files are inert): resurrection, a state no
    // serial order of {update, rollback} produces. Must abort.
    injectOnce(a)(b.rollbackTo("1"))
    intercept[java.util.ConcurrentModificationException] {
      a.updateWhereMor(col("id") >= 100, Map("name" -> lit("upd")))
    }
    // live view is exactly the rollback target: nothing resurrected
    assert(a.read().count() == 10)
    assert(a.read().where(col("id") >= 100).count() == 0)
    assert(a.read().where(col("name") === "upd").count() == 0)
  }

  test("MoR delete matching zero rows is a no-op: no snapshot committed, " +
      "no spurious conflict for concurrent updates") {
    val cat = newCatalog()
    val a = cat.createTable("t4z", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    a.append(df(0 until 10))
    val before = a.rawLog.map(_.id)
    assert(a.deleteWhereMor(col("id") > 1000) == 0L)
    assert(a.rawLog.map(_.id) == before,
      "a zero-match MoR delete must not commit a snapshot")
    // the would-be delete dir left no parquet behind
    assert(a.orphanFiles().isEmpty)
  }

  test("tag lands inside expire's pin-read/CAS window: expire REINSTATES " +
      "the pinned snapshot — a successful tag is never silently broken") {
    val cat = newCatalog()
    val a = cat.createTable("t4t", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    a.append(df(0 until 5)) // id 1
    a.append(df(5 until 10)) // id 2
    a.append(df(10 until 15)) // id 3
    val b = cat.loadTable("t4t")
    // b tags snapshot 1 AFTER a's expire attempt has read the (empty) pin
    // set but BEFORE its log CAS lands — the cross-domain window where the
    // old code removed the tag after the fact, silently breaking b's
    // returned success
    var taggedId = -1L
    var fired = false
    a.onExpirePinRead = () => if (!fired) { fired = true; taggedId = b.tagSnapshot("pin1", Some("1")) }
    val expired = a.expireSnapshots(retainLast = Some(1))
    a.onExpirePinRead = () => ()
    assert(taggedId == 1L, "the tag call must have returned success")
    // snapshot 1 was reinstated for its pin; snapshot 2 stayed expired
    assert(expired == List(2L), s"got $expired")
    assert(a.tags == Map("pin1" -> 1L))
    assert(a.snapshotById(1L).isDefined, "pinned snapshot must survive")
    assert(a.snapshotById(2L).isEmpty)
    // the reinstated snapshot is fully readable (manifests intact)
    assert(a.readAsOf("pin1").count() == 5)
    // and a later expire with the tag visible up front keeps honoring it
    assert(a.expireSnapshots(retainLast = Some(1)).isEmpty)
    assert(a.snapshotById(1L).isDefined)
  }

  test("zero-copy clone lands inside expire's pin-read/CAS window: the " +
      "clone's pin is reinstated, the clone reads intact, and the " +
      "source's destructive orphan GC keeps its files") {
    val cat = newCatalog()
    val a = cat.createTable("t4c", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    a.append(df(0 until 5)) // id 1 — the clone target
    a.append(df(5 until 10)) // id 2
    a.append(df(10 until 15)) // id 3 — head, always retained
    // the clone (whose pin tag rides the metadata CAS) lands AFTER the
    // expire attempt read the pin set but BEFORE its log CAS — the
    // cross-domain window where an unprotected clone would end up
    // referencing files of an expired snapshot
    var fired = false
    a.onExpirePinRead = () => if (!fired) {
      fired = true
      cat.cloneTableZeroCopy("t4c", "t4c_clone", asOf = Some("1"))
    }
    val expired = a.expireSnapshots(retainLast = Some(1))
    a.onExpirePinRead = () => ()
    // the pinned snapshot was reinstated; only snapshot 2 stayed expired
    assert(expired == List(2L), s"got $expired")
    assert(a.snapshotById(1L).isDefined, "pinned snapshot must survive")
    assert(a.tags.get("clone-default.t4c_clone").contains(1L))
    // destructive orphan GC on the source keeps every clone-shared file
    a.orphanFiles(delete = true)
    val clone = cat.loadTable("t4c_clone")
    assert(clone.read().orderBy("id").collect().map(_.getLong(0)).toSeq ==
      (0L until 5L), "clone must read intact through the race")
  }

  test("MoR delete vs concurrent compaction: the delete ABORTS instead of " +
      "silently dropping (positions reference rewritten files)") {
    val cat = newCatalog()
    val a = cat.createTable("t5", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    a.append(df(0 until 100))
    val b = cat.loadTable("t5")
    injectOnce(a)(b.compact(targetFiles = 1))
    val e = intercept[java.util.ConcurrentModificationException] {
      a.deleteWhereMor(col("id") < 10)
    }
    assert(e.getMessage.contains("removed or relocated rows"))
    // table unharmed: compaction's view intact, no delete applied
    assert(a.read().count() == 100)
    assertLinear(a)
    // the aborted delete's files are unreferenced -> orphan GC collects
    val orphans = a.orphanFiles()
    assert(orphans.exists(_.contains("/del-")),
      s"expected the aborted delete dir among orphans, got $orphans")
    a.orphanFiles(delete = true)
    assert(a.orphanFiles().isEmpty)
  }

  test("equality delete vs concurrent append: watermark pins to the read " +
      "snapshot, so the appended rows with matching keys survive") {
    val cat = newCatalog()
    val a = cat.createTable("t6", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    a.append(df(0 until 50)) // id 1
    val b = cat.loadTable("t6")
    // b re-appends ids 0..9 AFTER a's delete read its snapshot: those new
    // rows must NOT be retro-deleted (sequence-number scoping)
    injectOnce(a)(b.append(df(0 until 10)))
    val matched = a.deleteKeysMor(Seq("id"), (0L until 10L).toDF("id"))
    assert(matched == 10)
    val log = a.rawLog
    assert(log.map(_.id) == List(1L, 2L, 3L))
    assert(log.last.operation == "delete")
    // 50 - 10 deleted + 10 re-appended survivors
    assert(a.read().count() == 50)
    assert(a.read().where(col("id") < 10).count() == 10,
      "rows appended concurrently with the delete must survive it")
  }

  test("MoR filter-overwrite vs concurrent append: the append commutes " +
      "(its rows were not read) and both commits survive") {
    val cat = newCatalog()
    val a = cat.createTable("t12", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    a.append(df(0 until 100))
    val b = cat.loadTable("t12")
    // b appends AFTER a's replace read its snapshot: the appended rows
    // (including ids inside the replaced range!) must survive — they were
    // not part of the state the replace read
    injectOnce(a)(b.append(df(200 until 210)))
    val (deleted, _) = a.overwriteWhereMor(col("id") >= 50,
      df(50 until 60))
    assert(deleted == 50)
    assert(a.rawLog.map(_.operation) == List("append", "append", "update"))
    // 0..49 kept + 50..59 replacement + 200..209 concurrent append
    assert(a.read().count() == 70)
    assert(a.read().where(col("id") >= 200).count() == 10)
    assertLinear(a)
  }

  test("MoR MERGE vs concurrent append: the append commutes (its rows " +
      "were not read) and both commits survive") {
    val cat = newCatalog()
    val a = cat.createTable("t12m", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    a.append(df(0 until 100))
    val asOf = a.currentSnapshot.get.id
    // the merge's touched set: update ids >= 90 (dead identities + copies)
    val hits = a.readWithLineage().where(col("id") >= 90)
    val dead = hits.select(col(IceTable.LineageFileCol).as("file_path"),
      col(IceTable.LineagePosCol).as("pos"))
    val fresh = hits.withColumn("name", lit("merged"))
      .select(col("id"), col("name"))
    val b = cat.loadTable("t12m")
    injectOnce(a)(b.append(df(200 until 210)))
    a.mergeMor(dead, fresh, asOf, Map("merge-updated" -> "10"))
    assert(a.rawLog.map(_.operation) == List("append", "append", "update"))
    // 0..89 kept + 90..99 merged copies + 200..209 concurrent append
    assert(a.read().count() == 110)
    assert(a.read().where(col("name") === "merged").count() == 10)
    assert(a.read().where(col("id") >= 200).count() == 10,
      "rows appended concurrently with the merge must survive it")
    assertLinear(a)
  }

  test("MoR MERGE vs concurrent compaction: ABORTS instead of committing " +
      "positions against rewritten files") {
    val cat = newCatalog()
    val a = cat.createTable("t13m", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    a.append(df(0 until 100))
    val asOf = a.currentSnapshot.get.id
    val hits = a.readWithLineage().where(col("id") >= 90)
    val dead = hits.select(col(IceTable.LineageFileCol).as("file_path"),
      col(IceTable.LineagePosCol).as("pos"))
    val fresh = hits.withColumn("name", lit("merged"))
      .select(col("id"), col("name"))
    val b = cat.loadTable("t13m")
    injectOnce(a)(b.compact(targetFiles = 1))
    val e = intercept[java.util.ConcurrentModificationException] {
      a.mergeMor(dead, fresh, asOf)
    }
    assert(e.getMessage.contains("removed or relocated rows"))
    assert(a.read().count() == 100, "aborted merge must change nothing")
    assert(a.read().where(col("name") === "merged").count() == 0)
    assertLinear(a)
  }

  test("MoR filter-overwrite vs concurrent compaction: ABORTS instead of " +
      "committing positions against rewritten files") {
    val cat = newCatalog()
    val a = cat.createTable("t13", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    a.append(df(0 until 100))
    val b = cat.loadTable("t13")
    injectOnce(a)(b.compact(targetFiles = 1))
    val e = intercept[java.util.ConcurrentModificationException] {
      a.overwriteWhereMor(col("id") >= 50, df(50 until 60))
    }
    assert(e.getMessage.contains("removed or relocated rows"))
    assert(a.read().count() == 100, "aborted replace must change nothing")
    assertLinear(a)
  }

  test("compaction vs concurrent append: the rewrite ABORTS instead of " +
      "silently dropping the appended rows") {
    val cat = newCatalog()
    val a = cat.createTable("t11", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    a.append(df(0 until 50).repartition(4))
    val b = cat.loadTable("t11")
    // b's append lands between compaction's read and its CAS: publishing
    // the compacted (pre-append) file list would lose b's 10 rows
    injectOnce(a)(b.append(df(100 until 110)))
    val e = intercept[java.util.ConcurrentModificationException] {
      a.compact(targetFiles = 1)
    }
    assert(e.getMessage.contains("drop the concurrent commit"))
    // nothing lost, table healthy, a re-run compaction succeeds
    assert(a.read().count() == 60)
    assertLinear(a)
    a.orphanFiles(delete = true)
    val snap = a.compact(targetFiles = 1)
    assert(snap.files.size == 1 && a.read().count() == 60)
  }

  test("expire vs expire: second expire sees the shrunk log and no-ops " +
      "without a new head version") {
    val cat = newCatalog()
    val a = cat.createTable("t7", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    (0 until 4).foreach(i => a.append(df(i * 5 until i * 5 + 5)))
    val b = cat.loadTable("t7")
    injectOnce(a)(assert(b.expireSnapshots(retainLast = Some(2)).nonEmpty))
    // a re-decides on the freshest log: nothing left to expire -> Left
    assert(a.expireSnapshots(retainLast = Some(2)).isEmpty)
    val vAfter = a.logHead._1
    // and a no-op expire publishes no new head version
    assert(a.expireSnapshots(retainLast = Some(2)).isEmpty)
    assert(a.logHead._1 == vAfter, "a no-op expire must not publish a head")
    assert(a.rawLog.map(_.id) == List(3L, 4L))
  }

  test("hook storm exhausts retries: commit aborts cleanly, claimed dir is " +
      "un-claimed, table never wedges") {
    val cat = newCatalog()
    val a = cat.createTable("t8", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    a.append(df(0 until 5))
    val b = cat.loadTable("t8")
    // EVERY attempt loses to a DATA-LESS foreign commit: a's rename of its
    // staged dir onto the attempt id keeps succeeding (nobody claims data
    // dirs), so on exhaustion a holds a claimed `commit-N` dir — exactly
    // the wedge case: the un-claim must park it back under a stage name
    a.onCommitAttempt = _ => b.rollbackTo("1")
    intercept[java.util.ConcurrentModificationException] {
      a.append(df(500 until 510))
    }
    a.onCommitAttempt = _ => ()
    // b's commits all survive; a's staged data is parked, not blocking
    val afterStorm = a.rawLog.map(_.id)
    assertLinear(a)
    // the very next append must succeed at the next dense id
    a.append(df(600 until 610))
    assert(a.rawLog.map(_.id) == afterStorm :+ (afterStorm.last + 1))
    assert(a.read().where(col("id") >= 600 && col("id") < 610).count() == 10)
    // parked stage data from the aborted commit is orphan-collectible
    a.orphanFiles(delete = true)
    assert(a.orphanFiles().isEmpty)
    assert(a.read().where(col("id") >= 500 && col("id") < 510).count() == 0)
  }

  test("metadata CAS: concurrent schema evolutions both land with " +
      "distinct field-ids; properties compose with evolutions") {
    val cat = newCatalog()
    val a = cat.createTable("t12", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    val b = cat.loadTable("t12")
    // b's addColumn lands between a's meta read and its CAS: a must
    // retry on the fresh meta so BOTH columns land, and a's field-id
    // must re-floor ABOVE b's new column's id (no id reuse)
    var fired = false
    a.onMetaAttempt = _ => if (!fired) { fired = true; b.addColumn("from_b", "long") }
    a.addColumn("from_a", "string")
    a.onMetaAttempt = _ => ()
    val m = a.meta
    assert(m.schema.fieldNames.contains("from_a") &&
      m.schema.fieldNames.contains("from_b"),
      s"lost a concurrent evolution: ${m.schema.fieldNames.toSeq}")
    val ids = m.schema.fields.flatMap(TableMeta.fieldId)
    assert(ids.distinct.length == ids.length, s"field-id collision: ${ids.toSeq}")
    // property set racing an evolution: both survive
    fired = false
    a.onMetaAttempt = _ => if (!fired) { fired = true; b.addColumn("from_b2", "long") }
    a.setProperty("owner", "alice")
    a.onMetaAttempt = _ => ()
    assert(a.meta.properties.get("owner").contains("alice"))
    assert(a.meta.schema.fieldNames.contains("from_b2"))
    // schema versions stayed linear (each evolution a new version)
    assert(a.meta.schemas.map(_.id) == a.meta.schemas.map(_.id).sorted)
  }

  test("head pruning keeps a bounded window and readers always resolve") {
    val cat = newCatalog()
    val a = cat.createTable("t9", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    val n = (IceTable.KeepHeads + 4).toInt
    (0 until n).foreach(i => a.append(df(i until i + 1).coalesce(1)))
    val s = Files.list(a.headsDir)
    val count = try s.iterator().asScala.size finally s.close()
    assert(count <= IceTable.KeepHeads + 1,
      s"heads dir must stay bounded, found $count files")
    assert(a.read().count() == n)
    assert(a.rawLog.size == n)
  }

  test("legacy snapshots.json is tombstoned by the first CAS commit and " +
      "its content fully carried into v-1") {
    val cat = newCatalog()
    val a = cat.createTable("t10", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    a.append(df(0 until 10))
    a.append(df(10 until 20))
    // rewind to the legacy layout: whole-file log, no heads/
    val inline = a.snapshots.map(_.copy(manifestList = None))
    Jsons.writeFile(a.snapshotsPath, inline)
    import scala.jdk.CollectionConverters._
    Files.walk(a.headsDir).iterator().asScala.toList
      .sortBy(-_.getNameCount).foreach(Files.deleteIfExists)
    assert(a.logHead._1 == 0L)
    a.append(df(20 until 25))
    assert(a.logHead._1 == 1L)
    assert(!Files.exists(a.snapshotsPath),
      "legacy log must be tombstoned by the first CAS commit")
    assert(Files.exists(a.dir.resolve("snapshots.json.v0-migrated")))
    assert(a.read().count() == 25)
    assert(a.rawLog.map(_.id) == List(1L, 2L, 3L))
  }
}
