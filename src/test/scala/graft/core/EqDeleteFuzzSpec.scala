package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Differential fuzz of EQUALITY-delete watermark scoping (the Iceberg
  * sequence-number rule): random interleavings of appends that
  * deliberately RECYCLE previously-deleted keys, `deleteKeysMor` calls,
  * position deletes, compactions (which fold eq-deletes into data), and
  * delete-compaction — against a model where each row carries its commit
  * era and an equality delete removes exactly the matching-key rows
  * whose era ≤ the delete's watermark. The property that must never
  * break: a key re-appended AFTER its equality delete SURVIVES (the
  * watermark scopes the delete to files that existed when it was
  * issued), while every covered instance dies — including across
  * stacked deletes of overlapping key sets. liveRows accounting must
  * stay exact throughout (position + equality entries are disjoint by
  * construction). Deterministic seeds. */
class EqDeleteFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def fuzz(seed: Long, nOps: Int): Unit = {
    val rng = new scala.util.Random(seed)
    val cat = Catalog.open(spark,
      SparkFixture.tmpDir(s"graft-eqfz-$seed-").toString)
    val tbl = cat.createTable(s"eq$seed",
      Seq("k" -> "long", "v" -> "string"), Nil, Map.empty)

    // model: row instances (k, v, era) — era = the snapshot id whose
    // commit wrote the row's file (recomputed on compaction: rewritten
    // files belong to the compaction's own commit)
    var rows = Vector.empty[(Long, String, Long)]
    var uniq = 0

    def headId = tbl.currentSnapshot.map(_.id).getOrElse(0L)
    def appendKeys(ks: Seq[Long]): Unit = {
      uniq += 1
      val b = ks.map(k => (k, s"v$uniq-$k"))
      tbl.append(b.toDF("k", "v").coalesce(1))
      val era = headId
      rows ++= b.map { case (k, v) => (k, v, era) }
    }

    appendKeys(1L to 15L)

    for (step <- 1 to nOps) {
      rng.nextInt(10) match {
        case 0 | 1 | 2 => // append, recycling keys half the time
          val ks = (0 until 2 + rng.nextInt(5)).map { _ =>
            if (rng.nextBoolean() && rows.nonEmpty)
              rows(rng.nextInt(rows.size))._1 // recycle a live key
            else 100L + rng.nextInt(200) // fresh-ish key space
          }
          appendKeys(ks.distinct)
        case 3 | 4 | 5 => // equality delete of a random key set
          val pool = (rows.map(_._1) ++ (1L to 20L)).distinct
          val ks = (0 until 1 + rng.nextInt(4))
            .map(_ => pool(rng.nextInt(pool.size))).distinct
          val watermark = headId
          val n = tbl.deleteKeysMor(Seq("k"), ks.toDF("k"))
          val (dead, alive) = rows.partition(r =>
            ks.contains(r._1) && r._3 <= watermark)
          assert(n == dead.size,
            s"delete reported $n, model says ${dead.size} at step $step")
          rows = alive
        case 6 => // position delete composes with eq-delete state
          if (rows.nonEmpty) {
            val victim = rows(rng.nextInt(rows.size))
            tbl.deleteWhereMor(col("k") === victim._1 && col("v") === victim._2)
            rows = rows.filterNot(r => r._1 == victim._1 && r._2 == victim._2)
          }
        case 7 => // compaction folds eq-deletes into data; eras move to now
          tbl.compact(targetFiles = 1 + rng.nextInt(2))
          val era = headId
          rows = rows.map { case (k, v, _) => (k, v, era) }
        case 8 => // fold the delete state only — data files keep their
          // original commit eras (compactDeletes rewrites no data). The
          // model may still inflate eras safely: a future delete's
          // watermark is ≥ every already-existing row's era either way,
          // so coverage is unchanged; only rows appended AFTER a delete
          // (case 9) depend on the era-vs-watermark order.
          tbl.compactDeletes()
          val era = headId
          rows = rows.map { case (k, v, _) => (k, v, era) }
        case 9 => // key re-use immediately after a delete — the core claim
          if (rows.nonEmpty) {
            val k = rows(rng.nextInt(rows.size))._1
            val watermark = headId
            val n = tbl.deleteKeysMor(Seq("k"), Seq(k).toDF("k"))
            val dead = rows.count(r => r._1 == k && r._3 <= watermark)
            assert(n == dead)
            rows = rows.filterNot(r => r._1 == k && r._3 <= watermark)
            appendKeys(Seq(k)) // same key, next commit: MUST survive
            assert(tbl.read().where(col("k") === k).count() ==
              rows.count(_._1 == k), s"recycled key $k mis-scoped at $step")
          }
      }
      if (step % 4 == 0 || step == nOps) {
        val got = tbl.read().select(col("k"), col("v")).collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
        val want = rows.map(r => (r._1, r._2)).sorted
        assert(got == want,
          s"state diverged at step $step: got ${got.size}, want ${want.size}")
        val snap = tbl.currentSnapshot.get
        assert(snap.liveRows == rows.size,
          s"liveRows ${snap.liveRows} != model ${rows.size} at step $step")
      }
    }
  }

  test("equality-delete watermark fuzz: recycled keys survive, covered " +
      "instances die, accounting exact through compactions (seed 1)") {
    fuzz(19601L, nOps = 26)
  }

  test("equality-delete watermark fuzz (seed 2)") {
    fuzz(19602L, nOps = 26)
  }
}
