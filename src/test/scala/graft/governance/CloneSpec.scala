package graft.governance

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Lakehouse, SparkFixture}

/** Zero-copy clone ([[graft.core.Catalog.cloneTableZeroCopy]] behind
  * `Cloning.clone(…, zeroCopy = true)`; copy semantics stay the default
  * for reference parity): an O(metadata) clone referencing the source's
  * data files by path, GC-safe via the pin tag — the source can expire,
  * compact and orphan-GC freely and the clone still reads. */
class CloneSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def lake(): Lakehouse =
    Lakehouse.open(spark, SparkFixture.tmpDir("graft-clone-").toString)

  private def parquetCount(dir: java.nio.file.Path): Long = {
    if (!java.nio.file.Files.exists(dir)) return 0L
    val s = java.nio.file.Files.walk(dir)
    try s.filter(p => p.toString.endsWith(".parquet")).count()
    finally s.close()
  }

  test("zero-copy clone reads identically (incl. MoR delete state), " +
      "copies no data, and evolves independently of the source") {
    val lh = lake()
    lh.catalog.createTable("default.src",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val src = lh.catalog.loadTable("default.src")
    src.append((0L until 40L).map(i => (i, s"a$i")).toDF("id", "v")) // c1
    src.deleteWhereMor(col("id") < 5L) // c2: MoR position-delete state
    val before = src.read().orderBy("id").collect().toSeq

    val rec = lh.cloning.clone("default.src", "default.c1", zeroCopy = true)
    assert(rec.zeroCopy)
    val clone = lh.catalog.loadTable("default.c1")
    // identical read, including the position-delete subtraction
    assert(clone.read().orderBy("id").collect().toSeq == before)
    // NOT A BYTE copied: the clone's data dir holds no parquet, its one
    // snapshot is the zero-copy marker referencing the source by path
    assert(parquetCount(clone.dataDir) == 0L, "zero-copy clone copied data")
    val s1 = clone.currentSnapshot.get
    assert(s1.summary.get("zero-copy").contains("true") &&
      s1.summary.get("cloned-from").exists(_.startsWith("default.src@")))
    assert(s1.files.nonEmpty &&
      s1.files.forall(f => !f.path.startsWith(clone.dataDir.toString)))
    // the pin landed on the source
    assert(lh.catalog.loadTable("default.src").tags
      .get("clone-default.c1").contains(2L))

    // independent evolution: clone mutations never touch the source …
    clone.append(Seq((100L, "x")).toDF("id", "v"))
    clone.deleteWhereMor(col("id") === 10L)
    assert(clone.read().count() == before.size + 1 - 1)
    assert(lh.catalog.loadTable("default.src").read().orderBy("id")
      .collect().toSeq == before)
    // … and source mutations never leak into the clone (snapshot pinned)
    src.append(Seq((200L, "y")).toDF("id", "v"))
    assert(clone.read().where(col("id") === 200L).count() == 0)
    // CoW rewrite on the clone lands rewritten rows in the CLONE's dir
    lh.dml.update("default.c1", "id = 11", Map("v" -> "upd"))
    assert(lh.catalog.loadTable("default.c1").read()
      .where(col("id") === 11L).head.getString(1) == "upd")
    assert(parquetCount(clone.dataDir) > 0L)
    assert(lh.catalog.loadTable("default.src").read()
      .where(col("id") === 11L).head.getString(1) == "a11")
  }

  test("source expire + destructive orphan GC leave the clone intact; " +
      "discard releases the pin; dropTable refuses while a clone lives") {
    val lh = lake()
    lh.catalog.createTable("default.src2",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val src = lh.catalog.loadTable("default.src2")
    src.append((0L until 30L).map(i => (i, s"a$i")).toDF("id", "v")) // c1
    lh.cloning.clone("default.src2", "default.c2", zeroCopy = true)
    val cloneRows = lh.catalog.loadTable("default.c2").read().count()
    assert(cloneRows == 30L)

    // the source moves on: an overwrite strands c1's files from ITS
    // perspective — only the clone pin keeps them live
    src.append(Seq((500L, "z")).toDF("id", "v")) // c2
    src.overwrite((0L until 3L).map(i => (i, s"n$i")).toDF("id", "v")) // c3
    val expired = src.expireSnapshots(retainLast = Some(1))
    assert(!expired.contains(1L), "pinned snapshot must never expire")
    assert(expired.contains(2L))
    src.orphanFiles(delete = true)
    // the clone still reads every row through the shared files
    assert(lh.catalog.loadTable("default.c2").read().count() == 30L)

    // dropping the source is refused while the clone references it
    val e = intercept[IllegalArgumentException](
      lh.catalog.dropTable("default.src2"))
    assert(e.getMessage.contains("zero-copy clones"))

    // discard releases the pin; now the source can expire + collect fully
    lh.cloning.discard("default.c2")
    assert(!lh.catalog.tableExists("default.c2"))
    val srcAfter = lh.catalog.loadTable("default.src2")
    assert(!srcAfter.tags.contains("clone-default.c2"), "pin not released")
    val expired2 = srcAfter.expireSnapshots(retainLast = Some(1))
    assert(expired2.contains(1L), "unpinned snapshot should now expire")
    srcAfter.orphanFiles(delete = true)
    assert(srcAfter.read().count() == 3L)
    lh.catalog.dropTable("default.src2") // no longer refused
    assert(!lh.catalog.tableExists("default.src2"))
  }

  test("dropping a zero-copy clone DIRECTLY via catalog.dropTable (not " +
      "Cloning.discard) releases the source pin — no stranded tag " +
      "blocking GC forever") {
    val lh = lake()
    lh.catalog.createTable("default.src6",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val src = lh.catalog.loadTable("default.src6")
    src.append((0L until 10L).map(i => (i, s"a$i")).toDF("id", "v")) // c1
    lh.cloning.clone("default.src6", "default.c6", zeroCopy = true)
    assert(src.tags.contains("clone-default.c6"))
    src.overwrite(Seq((99L, "z")).toDF("id", "v")) // c2: strands c1's files
    // bypass Cloning.discard — the raw catalog drop must still sweep the
    // pin, or the pinned snapshot could never be expired/collected
    lh.catalog.dropTable("default.c6")
    val srcAfter = lh.catalog.loadTable("default.src6")
    assert(!srcAfter.tags.contains("clone-default.c6"),
      s"stale pin survived the drop: ${srcAfter.tags}")
    val expired = srcAfter.expireSnapshots(retainLast = Some(1))
    assert(expired.contains(1L),
      "snapshot must be expirable once its clone is gone")
    srcAfter.orphanFiles(delete = true)
    assert(srcAfter.read().count() == 1L)
  }

  test("copy clone inherits NO ref.tag.* properties: tag ids resolve " +
      "against the SOURCE's log, and an inherited clone pin would " +
      "falsely block dropping the copy") {
    val lh = lake()
    lh.catalog.createTable("default.src8",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val src = lh.catalog.loadTable("default.src8")
    src.append((0L until 6L).map(i => (i, s"a$i")).toDF("id", "v"))
    src.tagSnapshot("user-tag")
    lh.cloning.clone("default.src8", "default.z8", zeroCopy = true)
    assert(src.tags.keySet == Set("user-tag", "clone-default.z8"))
    // the copy clone starts with a clean tag namespace...
    lh.cloning.clone("default.src8", "default.c10")
    val copy = lh.catalog.loadTable("default.c10")
    assert(copy.tags.isEmpty, s"inherited tags: ${copy.tags}")
    assert(!copy.meta.properties.contains(graft.core.Catalog.ClonedFromKey))
    // ...so dropping it is not blocked by the source's pin on z8
    lh.catalog.dropTable("default.c10")
    assert(!lh.catalog.tableExists("default.c10"))
    // and the source's own tags are untouched
    assert(src.tags.keySet == Set("user-tag", "clone-default.z8"))
  }

  test("fast-forward promote: lands while the source is unchanged since " +
      "the fork; refuses race-free once a source commit lands after it; " +
      "plain promote keeps reference overwrite semantics") {
    val lh = lake()
    lh.catalog.createTable("default.src7",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val src = lh.catalog.loadTable("default.src7")
    src.append((0L until 5L).map(i => (i, s"a$i")).toDF("id", "v"))
    val fork1 = src.currentSnapshot.get.id
    val rec = lh.cloning.clone("default.src7", "default.c7", zeroCopy = true)
    assert(rec.forkSnapshotId.contains(fork1))
    // edit the clone, source untouched → fast-forward publishes
    lh.catalog.loadTable("default.c7")
      .append(Seq((100L, "new")).toDF("id", "v"))
    lh.cloning.promote("default.c7", requireSourceUnchanged = true)
    assert(src.read().count() == 6)
    // a copy clone records its fork too; a post-fork source commit makes
    // the guarded promote refuse — and leaves the source bit-identical
    val rec2 = lh.cloning.clone("default.src7", "default.c8")
    assert(rec2.forkSnapshotId.contains(src.currentSnapshot.get.id))
    src.append(Seq((200L, "landed-after-fork")).toDF("id", "v"))
    val before = src.read().collect().map(_.toString).sorted.toSeq
    intercept[java.util.ConcurrentModificationException](
      lh.cloning.promote("default.c8", requireSourceUnchanged = true))
    assert(src.read().collect().map(_.toString).sorted.toSeq == before,
      "a refused fast-forward must leave the source untouched")
    // the unguarded promote still deliberately overwrites (parity)
    lh.cloning.promote("default.c8")
    assert(src.read().count() == 6,
      "plain promote replaces the source with the clone's content")
    // an as-of clone of an OLD snapshot can never fast-forward a head
    // that already moved past it
    val rec3 = lh.cloning.clone("default.src7", "default.c9",
      asOf = Some(fork1.toString))
    assert(rec3.forkSnapshotId.contains(fork1))
    intercept[java.util.ConcurrentModificationException](
      lh.cloning.promote("default.c9", requireSourceUnchanged = true))
    // an EMPTY source forks at head 0: the guarded promote is still
    // expressible (and still refuses once the source takes a commit)
    lh.catalog.createTable("default.emp7",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val rec4 = lh.cloning.clone("default.emp7", "default.c11")
    assert(rec4.forkSnapshotId.contains(0L))
    lh.catalog.loadTable("default.c11")
      .append(Seq((1L, "x")).toDF("id", "v"))
    lh.cloning.promote("default.c11", requireSourceUnchanged = true)
    assert(lh.catalog.loadTable("default.emp7").read().count() == 1)
  }

  test("guards: eq-delete state refuses zero-copy cloning in both " +
      "directions; empty source refuses; copy clone stays the default") {
    val lh = lake()
    lh.catalog.createTable("default.src3",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val src = lh.catalog.loadTable("default.src3")
    intercept[IllegalArgumentException](
      lh.catalog.cloneTableZeroCopy("default.src3", "default.c3"))
    src.append((0L until 20L).map(i => (i, s"a$i")).toDF("id", "v"))
    // clone first, then: eq deletes on a table HOLDING foreign files are
    // refused (coveredUpTo watermarks live in the source's id space)
    lh.cloning.clone("default.src3", "default.c3", zeroCopy = true)
    val clone = lh.catalog.loadTable("default.c3")
    val e1 = intercept[IllegalArgumentException](
      clone.deleteKeysMor(Seq("id"), Seq(1L).toDF("id")))
    assert(e1.getMessage.contains("foreign"))
    // and a source WITH eq-delete state refuses to be zero-copy cloned
    src.deleteKeysMor(Seq("id"), Seq(2L).toDF("id"))
    val e2 = intercept[IllegalArgumentException](
      lh.catalog.cloneTableZeroCopy("default.src3", "default.c4"))
    assert(e2.getMessage.contains("equality-delete"))
    // default path still copies (parity): data lands in the clone's dir
    val rec = lh.cloning.clone("default.src3", "default.c5")
    assert(!rec.zeroCopy)
    assert(parquetCount(lh.catalog.loadTable("default.c5").dataDir) > 0L)
    assert(lh.catalog.loadTable("default.c5").read().count() ==
      src.read().count())
  }
}
