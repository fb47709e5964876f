package graft.governance

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Lakehouse, SparkFixture}

/** Differential fuzz of the zero-copy-clone lifecycle (round 18's newest
  * commit-machinery surface): random op sequences churn the SOURCE —
  * appends, overwrites, MoR deletes/updates, partial-CoW deletes,
  * compaction, rollback, schema renames, AND the destructive pair the pin
  * contract exists for (expireSnapshots + orphanFiles(delete=true)) —
  * while the clone takes its own appends and exact-id deletes. Invariants
  * at every checkpoint:
  *
  *   1. clone.read() == frozen-at-clone rows ± the clone's OWN edits
  *      (multiset-exact), no matter what the source did;
  *   2. source.read() keeps matching an independently maintained model;
  *   3. the pin tag survives until release, then expire+GC actually
  *      reclaim (teeth: the pinned snapshot expires once released).
  *
  * Ends by releasing through BOTH paths — Cloning.discard and a direct
  * catalog.dropTable (the path that used to strand the pin forever) —
  * then destructive-GCs the source and re-validates it. Deterministic
  * seeds. */
class CloneFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private type Row2 = (Long, String)

  private def collect2(df: org.apache.spark.sql.DataFrame): Seq[Row2] =
    df.select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  private def fuzz(seed: Long, nOps: Int, dropDirect: Boolean): Unit = {
    val rng = new scala.util.Random(seed)
    val lh = Lakehouse.open(spark,
      SparkFixture.tmpDir(s"graft-clfz-$seed-").toString)
    lh.catalog.createTable("default.src",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val src = lh.catalog.loadTable("default.src")

    var nextId = 0L
    // the fuzz renames the value column back and forth; writes must target
    // whatever the CURRENT schema calls it (append aligns by name)
    def vCol: String = src.schema.fieldNames.filter(_ != "id").head

    // source model: maintained as a plain in-memory multiset
    var srcModel = Map.empty[Long, String]
    def srcRows: Seq[Row2] = srcModel.toSeq.sorted

    def appendSrc(n: Int): Unit = {
      val b = (0 until n).map { _ => nextId += 1; (nextId, s"v${rng.nextInt(20)}") }
      src.append(b.toDF("id", vCol).coalesce(1))
      srcModel ++= b
    }
    appendSrc(15)
    appendSrc(10)

    // ---- clone at a random-ish point; freeze the expected state --------
    lh.cloning.clone("default.src", "default.cl", zeroCopy = true)
    val frozen = collect2(lh.catalog.loadTable("default.cl").read())
    assert(frozen == srcRows, "clone must read the source state at clone time")
    var cloneModel: Map[Long, String] = srcModel
    var cloneNext = 1000000L

    def readSrcNorm(): Seq[Row2] = {
      val d = src.read()
      collect2(if (d.columns.contains("w")) d.withColumnRenamed("w", "v") else d)
    }

    val pinTag = "clone-default.cl"
    assert(src.tags.contains(pinTag))
    val pinnedId = src.tags(pinTag)

    for (step <- 1 to nOps) {
      rng.nextInt(12) match {
        case 0 | 1 => appendSrc(2 + rng.nextInt(5))
        case 2 => // overwrite the source entirely
          val b = (0 until 3 + rng.nextInt(5)).map { _ =>
            nextId += 1; (nextId, s"o${rng.nextInt(20)}")
          }
          src.overwrite(b.toDF("id", vCol))
          srcModel = b.toMap
        case 3 => // MoR delete an exact live id
          if (srcModel.nonEmpty) {
            val ks = srcModel.keys.toSeq.sorted
            val k = ks(rng.nextInt(ks.size))
            src.deleteWhereMor(col("id") === k)
            srcModel -= k
          }
        case 4 => // MoR update an exact live id
          if (srcModel.nonEmpty) {
            val ks = srcModel.keys.toSeq.sorted
            val k = ks(rng.nextInt(ks.size))
            val nv = s"u${rng.nextInt(99)}"
            src.updateWhereMor(col("id") === k, Map(vCol -> lit(nv)))
            srcModel += (k -> nv)
          }
        case 5 => src.compact(targetFiles = 1 + rng.nextInt(3))
        case 6 => // expire aggressively — the pin must hold
          val expired = src.expireSnapshots(retainLast = Some(1))
          assert(!expired.contains(pinnedId),
            s"pinned snapshot $pinnedId expired at step $step")
        case 7 => // destructive orphan GC on the source
          src.orphanFiles(delete = true)
        case 8 => // rollback source to a random retained snapshot
          val snaps = src.rawLog.map(_.id)
          if (snaps.size > 2) {
            src.rollbackTo(snaps(rng.nextInt(snaps.size - 1)).toString)
            srcModel = readSrcNorm().toMap // re-seed model from truth
          }
        case 9 => // clone-side append
          val b = (0 until 1 + rng.nextInt(4)).map { _ =>
            cloneNext += 1; (cloneNext, s"c${rng.nextInt(20)}")
          }
          lh.catalog.loadTable("default.cl").append(b.toDF("id", "v"))
          cloneModel ++= b
        case 10 => // clone-side exact-id delete (foreign-file-safe: MoR)
          if (cloneModel.nonEmpty) {
            val ks = cloneModel.keys.toSeq.sorted
            val k = ks(rng.nextInt(ks.size))
            lh.catalog.loadTable("default.cl").deleteWhereMor(col("id") === k)
            cloneModel -= k
          }
        case 11 => // source schema rename must not leak into the clone
          val cols = src.schema.fieldNames
          if (cols.contains("v")) src.renameColumn("v", "w")
          else src.renameColumn("w", "v")
      }
      if (step % 4 == 0 || step == nOps) {
        // normalize the source read (the rename op may have it as `w`)
        assert(readSrcNorm() == srcRows, s"source diverged at step $step")
        assert(collect2(lh.catalog.loadTable("default.cl").read()) ==
          cloneModel.toSeq.sorted, s"clone diverged at step $step")
        assert(src.tags.contains(pinTag), s"pin vanished at step $step")
      }
    }

    // ---- release through the requested path; GC must get its teeth back
    if (dropDirect) lh.catalog.dropTable("default.cl")
    else lh.cloning.discard("default.cl")
    assert(!lh.catalog.tableExists("default.cl"))
    val srcAfter = lh.catalog.loadTable("default.src")
    assert(!srcAfter.tags.contains(pinTag),
      s"pin not released via ${if (dropDirect) "dropTable" else "discard"}")
    val expired = srcAfter.expireSnapshots(retainLast = Some(1))
    assert(srcAfter.rawLog.size == 1,
      s"expiry must reclaim the full unpinned history, kept ${srcAfter.rawLog.size}")
    assert(expired.nonEmpty, "released history must actually expire")
    srcAfter.orphanFiles(delete = true)
    val srcDf = srcAfter.read()
    val norm = if (srcDf.columns.contains("w"))
      srcDf.withColumnRenamed("w", "v") else srcDf
    assert(collect2(norm) == srcRows,
      "source must survive destructive GC after release")
    ()
  }

  test("zero-copy clone lifecycle fuzz: source churn + destructive GC " +
      "never perturb the clone; release via Cloning.discard") {
    fuzz(seed = 19001L, nOps = 28, dropDirect = false)
  }

  test("zero-copy clone lifecycle fuzz: release via DIRECT dropTable " +
      "also unpins (the stranded-tag path)") {
    fuzz(seed = 19002L, nOps = 28, dropDirect = true)
  }

  test("clone-of-clone: the pin chain holds — dropping the middle clone " +
      "refuses while its own clone lives; teardown in order reclaims") {
    val lh = Lakehouse.open(spark,
      SparkFixture.tmpDir("graft-clfz-chain-").toString)
    lh.catalog.createTable("default.a",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val a = lh.catalog.loadTable("default.a")
    a.append((0L until 12L).map(i => (i, s"a$i")).toDF("id", "v"))
    lh.cloning.clone("default.a", "default.b", zeroCopy = true)
    val b = lh.catalog.loadTable("default.b")
    b.append((100L until 104L).map(i => (i, s"b$i")).toDF("id", "v"))
    lh.cloning.clone("default.b", "default.c", zeroCopy = true)
    val cRows = collect2(lh.catalog.loadTable("default.c").read())
    assert(cRows.size == 16)
    // middle drop refused: c still references b's files (incl. a's by path)
    val e = intercept[IllegalArgumentException](lh.catalog.dropTable("default.b"))
    assert(e.getMessage.contains("zero-copy clones"))
    // a churns + destructive-GCs; c (two hops away) still reads
    a.overwrite(Seq((999L, "z")).toDF("id", "v"))
    a.expireSnapshots(retainLast = Some(1))
    a.orphanFiles(delete = true)
    assert(collect2(lh.catalog.loadTable("default.c").read()) == cRows,
      "grandclone must survive the root's destructive GC")
    // ordered teardown: c, then b, then a — every pin released, GC total
    lh.catalog.dropTable("default.c")
    assert(!lh.catalog.loadTable("default.b").tags.contains("clone-default.c"))
    lh.catalog.dropTable("default.b")
    val aAfter = lh.catalog.loadTable("default.a")
    assert(!aAfter.tags.exists(_._1.startsWith("clone-")))
    aAfter.expireSnapshots(retainLast = Some(1))
    aAfter.orphanFiles(delete = true)
    assert(collect2(aAfter.read()) == Seq((999L, "z")))
  }
}
