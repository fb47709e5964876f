package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Randomized MULTI-THREADED commit storm: unlike ConcurrentCommitSpec
  * (which injects one competitor at a chosen CAS window) this lets real
  * thread scheduling pick the interleavings — N threads fire random ops
  * (append, MoR delete/update of their own rows, compaction, expiry)
  * at the same table through separate IceTable instances, so every
  * coordination path is the on-disk CAS, exactly as across processes.
  *
  * The oracle is the abort contract: an op that RETURNED is in the final
  * state, an op that THREW left no trace. Each thread applies an op to
  * its private model only when the call returns; at join the union of
  * models must equal the table, the snapshot chain must be linear with
  * dense parents, and liveRows accounting must match the actual count.
  * A concurrent reader thread hammers read()/prunedRead throughout —
  * readers must never crash or see a torn snapshot. Deterministic seeds
  * (per-thread), nondeterministic schedules (the point). */
class CommitStormFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

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

  private def storm(seed: Long, props: Map[String, String]): Unit = {
    val cat = Catalog.open(spark,
      SparkFixture.tmpDir(s"graft-storm-$seed-").toString)
    cat.createTable(s"st$seed",
      Seq("id" -> "long", "v" -> "string"), Nil, props)
    val nThreads = 4
    val opsPerThread = 10
    val models = Array.fill(nThreads)(Map.empty[Long, String])
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    @volatile var writersDone = false

    val writers = (0 until nThreads).map { ti =>
      new Thread(() => {
        try {
          val rng = new scala.util.Random(seed + ti)
          val tbl = cat.loadTable(s"st$seed") // own instance: on-disk CAS only
          var next = ti * 1000000L
          for (_ <- 1 to opsPerThread) {
            try {
              rng.nextInt(10) match {
                case 0 | 1 | 2 | 3 | 4 =>
                  val b = (0 until 2 + rng.nextInt(4)).map { _ =>
                    next += 1; (next, s"t$ti-v${rng.nextInt(9)}")
                  }
                  tbl.append(b.toDF("id", "v").coalesce(1))
                  models(ti) ++= b // only on success
                case 5 | 6 =>
                  val mine = models(ti)
                  if (mine.nonEmpty) {
                    val ks = mine.keys.toSeq.sorted
                    val k = ks(rng.nextInt(ks.size))
                    tbl.deleteWhereMor(col("id") === k)
                    models(ti) -= k
                  }
                case 7 =>
                  val mine = models(ti)
                  if (mine.nonEmpty) {
                    val ks = mine.keys.toSeq.sorted
                    val k = ks(rng.nextInt(ks.size))
                    val nv = s"t$ti-u${rng.nextInt(99)}"
                    tbl.updateWhereMor(col("id") === k, Map("v" -> lit(nv)))
                    models(ti) += (k -> nv)
                  }
                case 8 => tbl.compact(targetFiles = 2)
                case 9 => tbl.expireSnapshots(retainLast = Some(6))
              }
            } catch {
              // the abort contract: a thrown op left NO trace — the model
              // is untouched and the storm goes on. Engine invariant
              // failures would surface at the final differential check.
              case _: Exception => ()
            }
          }
        } catch { case t: Throwable => errors.add(t) }
      }, s"storm-writer-$ti")
    }
    val reader = new Thread(() => {
      try {
        val tbl = cat.loadTable(s"st$seed")
        while (!writersDone) {
          // readers must never crash mid-storm or see a torn snapshot:
          // every read resolves some committed snapshot exactly
          val n = tbl.read().count()
          assert(n >= 0)
          val p = tbl.prunedRead(col("id") >= 1000000L).count()
          assert(p >= 0)
        }
      } catch { case t: Throwable => errors.add(t) }
    }, "storm-reader")

    writers.foreach(_.start()); reader.start()
    writers.foreach(_.join(300000)); writersDone = true; reader.join(300000)
    assert(errors.isEmpty, s"storm surfaced: ${errors.peek()}")

    val tbl = cat.loadTable(s"st$seed")
    assertLinear(tbl)
    val expect = models.reduce(_ ++ _).toSeq.sorted
    val got = tbl.read().select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(got == expect,
      s"final state diverged from the success-model: got ${got.size} rows, " +
        s"want ${expect.size}; missing=${(expect.toSet -- got).take(5)} " +
        s"extra=${(got.toSet -- expect).take(5)}")
    val snap = tbl.currentSnapshot.get
    assert(snap.liveRows == got.size,
      s"liveRows accounting ${snap.liveRows} != actual ${got.size}")
  }

  test("4-thread random op storm (CoW-default modes): success-model == " +
      "final state, linear chain, exact liveRows, readers never torn") {
    storm(seed = 19301L, props = Map.empty)
  }

  test("4-thread random op storm (merge-on-read modes): same invariants") {
    storm(seed = 19302L, props = Map(
      "write.update.mode" -> "merge-on-read",
      "write.delete.mode" -> "merge-on-read"))
  }
}
