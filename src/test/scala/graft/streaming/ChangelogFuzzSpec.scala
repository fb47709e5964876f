package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Fold-invariant fuzz of the commit-replay changelog: random commit
  * sequences (append, MoR position delete, partial-CoW delete, MoR
  * update, compaction, rollback, full overwrite) and, after every few
  * commits, the invariant that DEFINES a changelog —
  *
  *   multiset-fold(changesBetween(None, head)) == read()
  *
  * (insert adds a row instance, delete removes one). Each commit kind
  * exercises a different replay path (manifest-level added files,
  * morDelta O(touched), rewriteDelta lineage cancellation, scan-free
  * compaction, table-sized overwrite diff); the fuzz pins their
  * COMPOSITION, which the hand-picked ChangelogSpec cases cannot
  * enumerate. Deterministic seeds. */
class ChangelogFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def foldMatchesRead(tbl: graft.core.IceTable): Unit = {
    val head = tbl.currentSnapshot.map(_.id).getOrElse(return)
    val state = tbl.read().groupBy(col("id"), col("v"))
      .agg(count(lit(1)).as("n"))
    def checkFold(ch: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val folded = ch.groupBy(col("id"), col("v"))
        .agg(sum(when(col(Changelog.ChangeTypeCol)
            .isin("insert", "update_after"), 1L)
          .otherwise(-1L)).as("n"))
        .where(col("n") =!= 0L)
      // exact multiset equality both directions
      val extra = folded.exceptAll(state).count()
      val missing = state.exceptAll(folded).count()
      assert(extra == 0L && missing == 0L,
        s"$label changelog fold diverges from table state at head $head: " +
          s"extra=$extra missing=$missing")
    }
    checkFold(Changelog.changesBetween(tbl, None, head), "unpaired")
    // the PAIRED replay (update commits — MoR and partial-CoW alike —
    // read back as update_before/update_after) must fold to the same
    // state: update_before ≡ delete, update_after ≡ insert
    checkFold(Changelog.changesBetween(tbl, None, head,
      pairUpdateKeys = Seq("id")), "paired")
  }

  private def fuzz(seed: Long, nOps: Int,
      props: Map[String, String]): Unit = {
    val rng = new scala.util.Random(seed)
    val cat = graft.core.Catalog.open(spark,
      SparkFixture.tmpDir(s"graft-clfuzz-$seed-").toString)
    val tbl = cat.createTable(s"cf$seed",
      Seq("id" -> "long", "v" -> "string"), Nil, props)
    var nextId = 0L
    def batch(n: Int) = {
      val rows = (0 until n).map { _ =>
        nextId += 1
        (nextId, s"v${rng.nextInt(20)}")
      }
      rows.toDF("id", "v")
    }
    tbl.append(batch(20).coalesce(2))
    var sinceCheck = 0
    for (_ <- 1 to nOps) {
      val live = () => tbl.read().select("id").as[Long].collect()
      rng.nextInt(11) match {
        case 0 | 1 | 2 =>
          tbl.append(batch(3 + rng.nextInt(6)).coalesce(1))
        case 3 | 4 =>
          // MoR position delete of a random live slice (may match 0)
          val ids = live()
          if (ids.nonEmpty)
            tbl.deleteWhereMor(col("id") % (2 + rng.nextInt(4)) === 0 &&
              col("id") <= ids.max && col("id") >= ids.min)
        case 5 =>
          // partial-CoW delete (rewrites victims, carries the rest)
          val ids = live()
          if (ids.nonEmpty) {
            val victim = ids(rng.nextInt(ids.length))
            tbl.rewriteWhereCow(col("id") === victim,
              l => l.where(col("id") =!= victim))
          }
        case 6 =>
          val ids = live()
          if (ids.nonEmpty)
            tbl.updateWhereMor(col("id") === ids(rng.nextInt(ids.length)),
              Map("v" -> lit(s"u${rng.nextInt(99)}")))
        case 7 =>
          tbl.compact(targetFiles = 1 + rng.nextInt(3))
        case 8 =>
          // rollback to a random retained snapshot
          val snaps = tbl.rawLog.map(_.id)
          if (snaps.size > 2)
            tbl.rollbackTo(snaps(rng.nextInt(snaps.size - 1)).toString)
        case 9 =>
          tbl.overwrite(batch(5 + rng.nextInt(10)))
        case 10 =>
          // partial-CoW UPDATE (commits as "overwrite"+matched-rows — the
          // shape the paired replay's CoW arm must recognize)
          val ids = live()
          if (ids.nonEmpty) {
            val victim = ids(rng.nextInt(ids.length))
            val nv = s"c${rng.nextInt(99)}"
            tbl.rewriteWhereCow(col("id") === victim, l =>
              l.withColumn("v", when(col("id") === victim, lit(nv))
                .otherwise(col("v"))))
          }
      }
      sinceCheck += 1
      if (sinceCheck >= 4) { foldMatchesRead(tbl); sinceCheck = 0 }
    }
    foldMatchesRead(tbl)
  }

  test("random commit sequences: the changelog fold equals the table " +
      "state at every checkpoint (default CoW-leaning modes)") {
    fuzz(seed = 18201L, nOps = 24, props = Map.empty)
  }

  test("random commit sequences: the changelog fold equals the table " +
      "state at every checkpoint (merge-on-read update/delete modes)") {
    fuzz(seed = 18202L, nOps = 24, props = Map(
      "write.update.mode" -> "merge-on-read",
      "write.delete.mode" -> "merge-on-read"))
  }
}
