package graft.core

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The REAL cross-process test: two separate JVMs (no shared
  * [[IceTable.tableLock]], no test hook) concurrently append to the same
  * table directory through [[graft.tools.CommitStorm]]. The in-JVM
  * ConcurrentCommitSpec proves the protocol under controlled
  * interleavings; this spec proves it under genuine process-boundary
  * races — the exact scenario the pre-CAS whole-file log rewrite lost
  * commits in (last-writer-wins). */
class CrossProcessCommitSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def launch(args: Seq[String]): Process = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    // forward the --add-opens set this (forked test) JVM runs with —
    // Spark needs them on JDK 17
    val opens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports"))
    val cmd = Seq(javaBin) ++ opens ++
      Seq("-Xmx2g", "-cp", cp, "graft.tools.CommitStorm") ++ args
    new ProcessBuilder(cmd: _*).inheritIO().start()
  }

  test("two real JVMs appending concurrently: no commit lost, ids dense, " +
      "chain linear") {
    val wh = SparkFixture.tmpDir("graft-xproc-").toString
    val cat = Catalog.open(spark, wh)
    val tbl = cat.createTable("t", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    tbl.append(Seq((0L, "seed")).toDF("id", "name")) // snapshot 1
    val perProc = 4
    val p1 = launch(Seq(wh, "t", "1000", perProc.toString))
    val p2 = launch(Seq(wh, "t", "2000", perProc.toString))
    assert(p1.waitFor(300, java.util.concurrent.TimeUnit.SECONDS) &&
      p2.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
      "storm processes did not finish in time")
    assert(p1.exitValue() == 0, "process 1 failed")
    assert(p2.exitValue() == 0, "process 2 failed")
    val log = tbl.rawLog
    // every commit from BOTH processes survived, ids dense, chain linear
    assert(log.size == 1 + 2 * perProc,
      s"expected ${1 + 2 * perProc} snapshots, got ${log.map(_.id)}")
    assert(log.map(_.id) == (1L to (1 + 2 * perProc)).toList)
    log.sliding(2).foreach {
      case List(a, b) => assert(b.parentId.contains(a.id))
      case _ =>
    }
    // every appended row is live exactly once
    val ids = tbl.read().select("id").collect().map(_.getLong(0)).sorted
    val expect = (Seq(0L) ++ (0 until perProc).map(1000L + _) ++
      (0 until perProc).map(2000L + _)).sorted
    assert(ids.toSeq == expect, "rows lost or duplicated across processes")
    // no stranded state: data dirs match snapshot ids, no stage dirs left
    assert(tbl.orphanFiles().isEmpty,
      "concurrent commits left orphaned files")
  }

  test("two real JVMs evolving schema concurrently: every column lands, " +
      "field-ids unique, versions linear") {
    val wh = SparkFixture.tmpDir("graft-xmeta-").toString
    val cat = Catalog.open(spark, wh)
    val tbl = cat.createTable("t", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    val perProc = 3
    val p1 = launch(Seq(wh, "t", "100", perProc.toString, "addcols"))
    val p2 = launch(Seq(wh, "t", "200", perProc.toString, "addcols"))
    assert(p1.waitFor(300, java.util.concurrent.TimeUnit.SECONDS) &&
      p2.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
      "storm processes did not finish in time")
    assert(p1.exitValue() == 0 && p2.exitValue() == 0)
    val m = tbl.meta
    val names = m.schema.fieldNames.toSet
    val expect = Set("id", "name") ++
      (0 until perProc).map(i => s"c100_$i") ++
      (0 until perProc).map(i => s"c200_$i")
    assert(names == expect, s"lost columns: ${expect -- names}")
    val ids = m.schema.fields.flatMap(TableMeta.fieldId)
    assert(ids.distinct.length == ids.length, s"field-id collision: ${ids.toSeq}")
    // one schema version per evolution, ids strictly increasing
    assert(m.schemas.size == 1 + 2 * perProc)
    assert(m.schemas.map(_.id) == (1 to (1 + 2 * perProc)).toList)
  }

  test("two real JVMs mixing appends, MOR deletes, MOR updates and compactions: " +
      "final state is exactly the landed operations, no row lost or resurrected") {
    val wh = SparkFixture.tmpDir("graft-xmixed-").toString
    val cat = Catalog.open(spark, wh)
    val tbl = cat.createTable("t", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    tbl.append(Seq((0L, "seed")).toDF("id", "name"))
    val perProc = 8
    val p1 = launch(Seq(wh, "t", "1000", perProc.toString, "mixed"))
    val p2 = launch(Seq(wh, "t", "2000", perProc.toString, "mixed"))
    assert(p1.waitFor(300, java.util.concurrent.TimeUnit.SECONDS) &&
      p2.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
      "storm processes did not finish in time")
    assert(p1.exitValue() == 0, "process 1 failed")
    assert(p2.exitValue() == 0, "process 2 failed")
    // each process reported exactly which of its operations LANDED, in
    // order (conflicting-rewrite aborts are legal and excluded). Each id
    // is touched by exactly one process, so replaying each report alone
    // yields that id's expected final (id, name) state.
    val expected = scala.collection.mutable.Map(0L -> "seed")
    var sawAppend, sawUpdate, sawWap, sawPartialCow = false
    for (start <- Seq(1000L, 2000L)) {
      val ops = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(wh, s"storm-report-$start.txt")).toArray
        .map(_.toString).filter(_.nonEmpty)
      ops.foreach { line =>
        val parts = line.split(' ')
        (parts(0), parts(1).toLong) match {
          case ("A", id) =>
            expected(id) = s"p$start-${id - start}"; sawAppend = true
          case ("U", id) => expected(id) = parts(2); sawUpdate = true
          case ("D", id) => expected.remove(id); ()
          case ("P", id) => expected.remove(id); sawPartialCow = true
          case ("W", id) => expected(id) = parts(2); sawWap = true
          case other => fail(s"unparseable report line: $line ($other)")
        }
      }
    }
    assert(sawAppend, "no append landed — storm produced no signal")
    assert(sawUpdate, "no MoR update landed — update leg never exercised")
    assert(sawWap, "no WAP publish landed — stage/publish leg never exercised")
    // the partial-CoW leg aborts legally under racing (requireParentId);
    // it retries 4× with fresh state, so at least one process normally
    // lands it — but do not REQUIRE it (no flaky assert on a race)
    info(s"partial-CoW delete landed in at least one process: $sawPartialCow")
    // no staged leftovers: every stage was published (or aborted cleanly)
    assert(tbl.stagedCommits.isEmpty,
      s"staged commits left behind: ${tbl.stagedCommits}")
    val live = tbl.read().select("id", "name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(live == expected.toMap,
      s"live state diverges from landed ops: " +
        s"missing=${expected.toMap.toSet -- live.toSet} " +
        s"unexpected=${live.toSet -- expected.toMap.toSet}")
    // the snapshot chain stayed linear through the mixed racing
    val log = tbl.rawLog
    log.sliding(2).foreach {
      case List(a, b) => assert(b.parentId.contains(a.id),
        s"chain fork: ${b.id} parent ${b.parentId} after ${a.id}")
      case _ =>
    }
    // rawLog sorts by id, so compare against the dense expected RANGE —
    // catches duplicate or skipped ids, which sorted==sorted cannot
    assert(log.map(_.id) == (1L to log.size).toList,
      s"snapshot ids not dense from 1: ${log.map(_.id)}")
    // aborted rewrites may leave stranded stage dirs — GC must collect
    // them WITHOUT touching live data
    tbl.orphanFiles(delete = true)
    val liveAfterGc = tbl.read().select("id", "name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(liveAfterGc == expected.toMap, "orphan GC deleted live data")
    assert(tbl.orphanFiles().isEmpty, "orphans survived the GC sweep")
  }

  test("two real JVMs racing zero-copy clones against expire + " +
      "destructive orphan GC + compaction: every validated clone read " +
      "its exact pinned snapshot, the source survives intact") {
    val wh = SparkFixture.tmpDir("graft-xclone-").toString
    val cat = Catalog.open(spark, wh)
    val tbl = cat.createTable("t", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    tbl.append((0L until 20L).map(i => (i, s"seed$i")).toDF("id", "name"))
    val p1 = launch(Seq(wh, "t", "1000", "8", "cloner"))
    val p2 = launch(Seq(wh, "t", "2000", "10", "expirer"))
    assert(p1.waitFor(300, java.util.concurrent.TimeUnit.SECONDS) &&
      p2.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
      "storm processes did not finish in time")
    // the cloner exits nonzero on ANY pin divergence (a clone reading
    // rows that disagree with its pinned snapshot's liveRows)
    assert(p1.exitValue() == 0, "cloner observed a broken pin")
    assert(p2.exitValue() == 0, "expirer failed")
    val validated = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(wh, "storm-report-1000.txt")).toArray
      .map(_.toString).filter(_.startsWith("C "))
    assert(validated.nonEmpty,
      "no clone was ever validated — the race leg proved nothing")
    val appended = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(wh, "storm-report-2000.txt")).toArray
      .map(_.toString).filter(_.startsWith("A ")).map(_.drop(2).toLong)
    // source state: the seed rows plus every append that landed
    val ids = tbl.read().select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == ((0L until 20L) ++ appended).sorted,
      "source rows lost or duplicated under clone/expire racing")
    // no clone tables or stale pins left behind
    assert(cat.listTables("default").forall(!_.contains("cl_")),
      s"clone tables leaked: ${cat.listTables("default")}")
    info(s"validated clones: ${validated.length}")
  }

  test("two real JVMs racing the SQL row-level verbs (UPDATE + subquery " +
      "DELETE through GraftRowLevelStrategy): final state is exactly the " +
      "landed statements, chain linear") {
    val wh = SparkFixture.tmpDir("graft-xsql-").toString
    val cat = Catalog.open(spark, wh)
    // MoR update + CoW delete: one storm covers both commit machineries
    // under racing (position-delete appends AND carried-file pinning)
    val tbl = cat.createTable("t", Seq("id" -> "long", "name" -> "string"),
      Nil, Map("write.update.mode" -> "merge-on-read"))
    tbl.append(Seq((0L, "seed")).toDF("id", "name"))
    val perProc = 8
    val p1 = launch(Seq(wh, "t", "1000", perProc.toString, "sqlverbs"))
    val p2 = launch(Seq(wh, "t", "2000", perProc.toString, "sqlverbs"))
    assert(p1.waitFor(300, java.util.concurrent.TimeUnit.SECONDS) &&
      p2.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
      "storm processes did not finish in time")
    assert(p1.exitValue() == 0, "process 1 failed")
    assert(p2.exitValue() == 0, "process 2 failed")
    val expected = scala.collection.mutable.Map(0L -> "seed")
    var sawUpdate, sawDelete = false
    for (start <- Seq(1000L, 2000L)) {
      val ops = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(wh, s"storm-report-$start.txt")).toArray
        .map(_.toString).filter(_.nonEmpty)
      ops.foreach { line =>
        val parts = line.split(' ')
        (parts(0), parts(1).toLong) match {
          case ("A", id) => expected(id) = s"p$start-${id - start}"
          case ("U", id) => expected(id) = parts(2); sawUpdate = true
          case ("D", id) => expected.remove(id); sawDelete = true
          case other => fail(s"unparseable report line: $line ($other)")
        }
      }
    }
    // both SQL verbs must land somewhere or the leg proved nothing;
    // the 4× fresh-state retries make exhaustion effectively impossible
    // for statements touching only the process's OWN rows
    assert(sawUpdate, "no SQL UPDATE landed — verb never exercised")
    assert(sawDelete, "no subquery DELETE landed — verb never exercised")
    val live = tbl.read().select("id", "name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(live == expected.toMap,
      s"live state diverges from landed SQL statements: " +
        s"missing=${expected.toMap.toSet -- live.toSet} " +
        s"unexpected=${live.toSet -- expected.toMap.toSet}")
    val log = tbl.rawLog
    log.sliding(2).foreach {
      case List(a, b) => assert(b.parentId.contains(a.id),
        s"chain fork: ${b.id} parent ${b.parentId} after ${a.id}")
      case _ =>
    }
    assert(log.map(_.id) == (1L to log.size).toList,
      s"snapshot ids not dense from 1: ${log.map(_.id)}")
    // aborted CoW rewrites may strand stage dirs — GC collects them
    // without touching live data
    tbl.orphanFiles(delete = true)
    assert(tbl.read().count() == expected.size, "orphan GC deleted live data")
  }

  test("two real JVMs: an exactly-once changelog consumer (offset replay " +
      "+ documented re-seed on expiry) converges to the writer's state " +
      "under aggressive history pruning") {
    val wh = SparkFixture.tmpDir("graft-xproc-cons-").toString
    val cat = Catalog.open(spark, wh)
    val tbl = cat.createTable("cp", Seq("id" -> "long", "name" -> "string"),
      Nil, Map.empty)
    tbl.append(Seq((0L, "seed")).toDF("id", "name"))
    val producer = launch(Seq(wh, "cp", "100", "40", "producer"))
    val consumer = launch(Seq(wh, "cp", "0", "1", "consumer"))
    assert(producer.waitFor(300, java.util.concurrent.TimeUnit.SECONDS) &&
      consumer.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
      "producer/consumer did not finish in time")
    assert(producer.exitValue() == 0, "producer failed")
    assert(consumer.exitValue() == 0, "consumer failed")
    val lines = java.nio.file.Files
      .readString(java.nio.file.Paths.get(wh, "consumer-state.txt"))
      .split("\n").filter(_.nonEmpty).toSeq
    val meta = lines.head
    assert(meta.startsWith("meta "), meta)
    val folded = lines.tail.map { l =>
      val Array(k, v) = l.split("\t"); (k.toLong, v)
    }.sorted
    val table = tbl.read().select("id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(folded == table,
      s"consumer state diverged from the table ($meta): " +
        s"missing=${(table.toSet -- folded).take(5)} " +
        s"extra=${(folded.toSet -- table).take(5)}")
    // the re-seed path MUST have been taken (the consumer starts only
    // after expiry pruned the tail, so its from-zero replay refuses), AND
    // incremental batches must have followed it — neither self-healing
    // alone nor a single final catch-up can pass
    val reseeds = "reseeds=(\\d+)".r.findFirstMatchIn(meta).get.group(1).toInt
    val batches = "batches=(\\d+)".r.findFirstMatchIn(meta).get.group(1).toInt
    assert(reseeds >= 1, s"re-seed path never exercised: $meta")
    assert(batches >= 1, s"expected incremental consumption, got $meta")
  }

  test("RENAME racing a real appending process: commits land in the " +
      "renamed table or abort loudly — never into a resurrected zombie " +
      "of the old path") {
    val wh = SparkFixture.tmpDir("graft-xrename-").toString
    val cat = Catalog.open(spark, wh)
    val tbl = cat.createTable("rn",
      Seq("id" -> "long", "name" -> "string"), Nil, Map.empty)
    tbl.append(Seq((0L, "seed")).toDF("id", "name")) // snapshot 1
    val perProc = 25
    val p = launch(Seq(wh, "rn", "1000", perProc.toString))
    // let the storm get some commits in, then move the table under it
    Thread.sleep(6000)
    cat.renameTable("rn", "rn2")
    assert(p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
      "storm process did not finish in time")
    // exit 0 (storm finished before the move) and nonzero (a commit lost
    // the race and aborted LOUDLY) are both legal — silence + loss is not
    val t2 = cat.loadTable("rn2")
    val log = t2.rawLog
    assert(log.map(_.id) == (1L to log.size).toList,
      s"renamed log must stay dense + linear: ${log.map(_.id)}")
    // landed rows are the seed + a PREFIX of the storm sequence: append
    // mode dies at its first failed commit, so nothing lands after a gap
    val ids = t2.read().select("id").collect().map(_.getLong(0)).sorted.toSeq
    val n = ids.size - 1
    assert(ids == 0L +: (0 until n).map(1000L + _),
      s"rows must be seed + a storm prefix, got $ids")
    assert(log.size == n + 1, "every landed row = exactly one commit")
    // NO zombie: whatever the racing writer resurrected at the old path,
    // it is not a table — no meta.json, no committed head (the casLog
    // liveness guard refuses to recreate the CAS dir)
    val oldDir = java.nio.file.Paths.get(wh, "default", "rn")
    assert(!java.nio.file.Files.exists(oldDir.resolve("meta.json")),
      "old path must not hold a table after rename")
    val zombieHeads = oldDir.resolve("heads")
    if (java.nio.file.Files.isDirectory(zombieHeads)) {
      val s = java.nio.file.Files.list(zombieHeads)
      val committed =
        try s.iterator().asScala.exists(
          _.getFileName.toString.matches("v-\\d+\\.json"))
        finally s.close()
      assert(!committed, "a commit CAS'd into the zombie old path — lost")
    }
    assert(!cat.tableExists("rn"))
    // the renamed table keeps committing at its new path
    t2.append(Seq((9999L, "post")).toDF("id", "name"))
    assert(cat.loadTable("rn2").read().count() == ids.size + 1)
  }
}
