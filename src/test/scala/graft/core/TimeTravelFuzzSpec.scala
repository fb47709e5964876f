package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Fuzz of time travel × rollback × tags × expiry: random commit
  * sequences with the state AFTER EVERY COMMIT recorded driver-side;
  * at every checkpoint, `readAsOf(id)` of every RETAINED snapshot must
  * reproduce its recorded state exactly — through MoR delete layers,
  * zero-copy rollbacks re-referencing old manifests, compactions and
  * tag-pinned survivors of expiry. Hand-written specs pin each
  * mechanism; this pins their composition (e.g. time travel INTO the
  * span between a rollback's target and the rollback itself, or to a
  * tag-pinned island whose neighbors were expired). */
class TimeTravelFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def fuzz(seed: Long, nOps: Int): Unit = {
    val rng = new scala.util.Random(seed)
    val cat = Catalog.open(spark,
      SparkFixture.tmpDir(s"graft-ttfuzz-$seed-").toString)
    var curName = s"tt$seed"
    var tbl = cat.createTable(curName,
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    var renameN = 0
    var nextId = 0L
    def batch(n: Int) = {
      val rows = (0 until n).map { _ =>
        nextId += 1
        (nextId, s"v${rng.nextInt(20)}")
      }
      rows.toDF("id", "v")
    }
    def state(): Seq[String] =
      tbl.read().collect().map(_.mkString("|")).sorted.toSeq
    val recorded = scala.collection.mutable.Map[Long, Seq[String]]()
    var tagN = 0
    def record(): Unit =
      tbl.currentSnapshot.foreach(s => recorded(s.id) = state())
    tbl.append(batch(15)); record()
    def check(): Unit = {
      for (s <- tbl.rawLog) {
        val got = tbl.readAsOf(s.id.toString).collect()
          .map(_.mkString("|")).sorted.toSeq
        assert(got == recorded(s.id),
          s"time travel to ${s.id} (op ${s.operation}) diverged from the " +
            s"recorded state (seed=$seed): got ${got.size} rows, " +
            s"recorded ${recorded(s.id).size}")
      }
      // every tag resolves and reproduces its pinned state
      for ((name, id) <- tbl.tags) {
        val got = tbl.readAsOf(name).collect()
          .map(_.mkString("|")).sorted.toSeq
        assert(got == recorded(id), s"tag $name -> $id diverged")
      }
    }
    var sinceCheck = 0
    for (_ <- 1 to nOps) {
      rng.nextInt(13) match {
        case 0 | 1 | 2 => tbl.append(batch(2 + rng.nextInt(5)).coalesce(1))
        case 3 | 4 =>
          tbl.deleteWhereMor(col("id") % (2 + rng.nextInt(4)) === 0)
        case 5 =>
          val ids = tbl.read().select("id").as[Long].collect()
          if (ids.nonEmpty) {
            val victim = ids(rng.nextInt(ids.length))
            tbl.rewriteWhereCow(col("id") === victim,
              l => l.where(col("id") =!= victim))
          }
        case 6 =>
          val ids = tbl.read().select("id").as[Long].collect()
          if (ids.nonEmpty)
            tbl.updateWhereMor(col("id") === ids(rng.nextInt(ids.length)),
              Map("v" -> lit(s"u${rng.nextInt(99)}")))
        case 7 => tbl.compact(targetFiles = 1 + rng.nextInt(2))
        case 8 =>
          val snaps = tbl.rawLog.map(_.id)
          if (snaps.size > 2)
            tbl.rollbackTo(snaps(rng.nextInt(snaps.size - 1)).toString)
        case 9 =>
          tagN += 1
          tbl.tagSnapshot(s"pin$tagN")
        case 10 | 11 =>
          // expire drops recorded entries for unretained ids; tags pin
          val gone = tbl.expireSnapshots(retainLast = Some(3 + rng.nextInt(4)))
          gone.foreach(recorded.remove)
        case 12 =>
          // RENAME mid-history: the metadata move must preserve every
          // retained snapshot's recorded state — time travel through MoR
          // delete layers, rollback islands and tag pins keeps working
          // under the new name (the delete-parquet re-point must be
          // exact for HISTORICAL snapshots, not just the head)
          renameN += 1
          val next = s"tt${seed}_r$renameN"
          tbl = cat.renameTable(curName, next)
          curName = next
      }
      // a commit may or may not have landed (deletes can match nothing);
      // recording by id is idempotent either way
      record()
      sinceCheck += 1
      if (sinceCheck >= 4) { check(); sinceCheck = 0 }
    }
    check()
    assert(tbl.rawLog.size >= 3, "fuzz degenerated to a trivial log")
    assert(renameN >= 1,
      "seed never exercised the rename op — pick a seed that does")
  }

  test("random commits + rollbacks + tags + expiry: readAsOf reproduces " +
      "every retained snapshot's recorded state (seed 18501)") {
    fuzz(18501L, 30)
  }

  test("random commits + rollbacks + tags + expiry: readAsOf reproduces " +
      "every retained snapshot's recorded state (seed 18502)") {
    fuzz(18502L, 30)
  }
}
