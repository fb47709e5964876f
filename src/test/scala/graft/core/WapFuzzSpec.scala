package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Differential fuzz of the write-audit-publish lifecycle composed with
  * everything that can happen BETWEEN stage and publish: random
  * interleavings of normal commits (append/MoR delete/update/compact/
  * expire/destructive orphan GC), multiple concurrent staged batches,
  * and schema evolution, against a pure in-memory model. Invariants at
  * every checkpoint:
  *
  *   1. main == model of PUBLISHED state only (staged batches invisible);
  *   2. readWap(id) == main ∪ that batch (and only that batch);
  *   3. orphan GC (delete=true) never touches a registered staged dir;
  *   4. publish makes exactly the staged rows visible — including
  *      batches staged under an OLDER schema (field-id resolution);
  *   5. discard removes the batch without trace.
  *
  * The directed WapSpec pins each property in isolation; this pins their
  * COMPOSITION over random sequences. Deterministic seeds. */
class WapFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def fuzz(seed: Long): Unit = {
    val rng = new scala.util.Random(seed)
    val cat = Catalog.open(spark,
      SparkFixture.tmpDir(s"graft-wapfz-$seed-").toString)
    val tbl = cat.createTable(s"wf$seed",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)

    var nextId = 0L
    var main = Map.empty[Long, String] // published state model
    var staged = Map.empty[String, Map[Long, String]] // wapId -> its rows
    var wapSeq = 0

    def batch(n: Int): Seq[(Long, String)] =
      (0 until n).map { _ => nextId += 1; (nextId, s"v${rng.nextInt(9)}") }

    def vCol: String = tbl.schema.fieldNames.filter(_ != "id").head
    def readNorm(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] = {
      val d = if (df.columns.contains("w")) df.withColumnRenamed("w", "v") else df
      d.select(col("id"), col("v")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    }

    val b0 = batch(12)
    tbl.append(b0.toDF("id", vCol).coalesce(1)); main ++= b0

    for (step <- 1 to 30) {
      rng.nextInt(12) match {
        case 0 | 1 => // normal append
          val b = batch(2 + rng.nextInt(4))
          tbl.append(b.toDF("id", vCol).coalesce(1)); main ++= b
        case 2 => // stage a new batch
          wapSeq += 1
          val id = s"wap-$seed-$wapSeq"
          val b = batch(3 + rng.nextInt(4))
          tbl.stageAppend(b.toDF("id", vCol).coalesce(1), id)
          staged += id -> b.toMap
        case 3 | 4 => // publish a random staged batch
          if (staged.nonEmpty) {
            val id = staged.keys.toSeq.sorted.apply(rng.nextInt(staged.size))
            tbl.publishWap(id)
            main ++= staged(id); staged -= id
          }
        case 5 => // discard a random staged batch
          if (staged.nonEmpty) {
            val id = staged.keys.toSeq.sorted.apply(rng.nextInt(staged.size))
            tbl.discardWap(id)
            staged -= id
          }
        case 6 => // MoR delete an exact published id
          if (main.nonEmpty) {
            val ks = main.keys.toSeq.sorted
            val k = ks(rng.nextInt(ks.size))
            tbl.deleteWhereMor(col("id") === k); main -= k
          }
        case 7 => // MoR update an exact published id
          if (main.nonEmpty) {
            val ks = main.keys.toSeq.sorted
            val k = ks(rng.nextInt(ks.size))
            val nv = s"u${rng.nextInt(99)}"
            tbl.updateWhereMor(col("id") === k, Map(vCol -> lit(nv)))
            main += (k -> nv)
          }
        case 8 => tbl.compact(targetFiles = 1 + rng.nextInt(2))
        case 9 => // expire + DESTRUCTIVE orphan GC: staged dirs must survive
          tbl.expireSnapshots(retainLast = Some(2))
          tbl.orphanFiles(delete = true)
        case 10 => // schema rename between stage and publish
          if (tbl.schema.fieldNames.contains("v")) tbl.renameColumn("v", "w")
          else tbl.renameColumn("w", "v")
        case 11 => // stage + immediately audit-read, leave it staged
          wapSeq += 1
          val id = s"wap-$seed-$wapSeq"
          val b = batch(2)
          tbl.stageAppend(b.toDF("id", vCol).coalesce(1), id)
          staged += id -> b.toMap
          assert(readNorm(tbl.readWap(id)) ==
            (main ++ staged(id)).toSeq.sorted, s"audit read wrong at $step")
      }
      if (step % 5 == 0 || step == 30) {
        assert(readNorm(tbl.read()) == main.toSeq.sorted,
          s"main diverged at step $step (staged leaked or publish lost?)")
        assert(tbl.stagedCommits.map(_.wapId).toSet == staged.keySet,
          s"staged registry diverged at step $step")
        staged.keys.foreach { id =>
          assert(readNorm(tbl.readWap(id)) == (main ++ staged(id)).toSeq.sorted,
            s"readWap($id) != main ∪ batch at step $step")
        }
      }
    }
    // drain: publish everything left, then the model must match exactly
    staged.keys.toSeq.sorted.foreach { id =>
      tbl.publishWap(id); main ++= staged(id)
    }
    assert(readNorm(tbl.read()) == main.toSeq.sorted, "post-drain divergence")
    assert(tbl.stagedCommits.isEmpty)
  }

  test("random WAP lifecycle interleavings: staged invisible, audit " +
      "exact, GC never eats a registered stage, publish exact across " +
      "schema evolution (seed 1)") {
    fuzz(19501L)
  }

  test("random WAP lifecycle interleavings (seed 2)") {
    fuzz(19502L)
  }
}
