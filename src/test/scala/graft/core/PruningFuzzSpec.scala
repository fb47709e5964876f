package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Differential fuzz of manifest file skipping: `prunedRead(pred)` must
  * equal `read().where(pred)` for RANDOM predicates over randomly
  * partitioned tables with multi-era layouts (partition-spec evolution
  * mid-history), range-clustered and unclustered files, a column rename
  * (bounds are field-id-keyed — predicates on the NEW name must still
  * prune old files), MoR delete state and an update. A pruning bug that
  * drops a live file loses data SILENTLY — FilePruningSpec pins known
  * shapes; this hunts unknown ones. The fuzz also asserts pruning
  * actually fires (some predicate kept < total files), so a regression
  * to never-prune cannot pass unnoticed. Deterministic seeds. */
class PruningFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def fuzz(seed: Long, spec1: Seq[String], spec2: Seq[String]): Unit = {
    val rng = new scala.util.Random(seed)
    val cat = Catalog.open(spark,
      SparkFixture.tmpDir(s"graft-prfuzz-$seed-").toString)
    val tbl = cat.createTable(s"pf$seed",
      Seq("id" -> "long", "grp" -> "long", "s" -> "string", "x" -> "double"),
      spec1, Map.empty)
    var nextId = 0L
    def batch(n: Int) = {
      val rows = (0 until n).map { _ =>
        nextId += 1
        (nextId, (rng.nextInt(8)).toLong,
          if (rng.nextInt(10) == 0) null else s"v${rng.nextInt(6)}",
          if (rng.nextInt(10) == 0) null
          else java.lang.Double.valueOf(rng.nextInt(1000) / 8.0))
      }
      rows.toDF("id", "grp", "s", "x")
    }
    // era 1: clustered + unclustered files under spec1
    tbl.append(batch(300).repartitionByRange(4, col("id")))
    tbl.append(batch(120).coalesce(2))
    // evolve the partition spec mid-history: era-2 files lay out
    // differently, old files keep their dirs forever
    if (spec2 != spec1) tbl.updatePartitionSpec(spec2)
    tbl.append(batch(200).repartitionByRange(3, col("id")))
    // rename: bounds/buckets must keep pruning via field-ids
    tbl.renameColumn("grp", "g2")
    tbl.append(batch(100).coalesce(1).toDF("id", "g2", "s", "x"))
    // MoR state: deletes subtract, the update relocates rows
    tbl.deleteWhereMor(col("id") % 7 === 0)
    tbl.updateWhereMor(col("id") === 5L, Map("x" -> lit(999.5)))

    def pred(depth: Int = 0): Column = {
      val simple = rng.nextInt(9) match {
        case 0 => col("id") < lit(rng.nextInt(nextId.toInt + 10).toLong)
        case 1 => col("id") >= lit(rng.nextInt(nextId.toInt + 10).toLong)
        case 2 => col("g2") === lit(rng.nextInt(10).toLong)
        case 3 => col("g2").isin((0 until 1 + rng.nextInt(3))
          .map(_ => rng.nextInt(10).toLong): _*)
        case 4 => col("s") === lit(s"v${rng.nextInt(8)}")
        case 5 => col("s") > lit(s"v${rng.nextInt(6)}")
        case 6 => col("x") < lit(rng.nextInt(1200) / 8.0)
        case 7 => col("s").isNull
        case 8 => col("x").isNotNull
      }
      if (depth < 2 && rng.nextInt(3) == 0) {
        val other = pred(depth + 1)
        if (rng.nextBoolean()) simple && other else simple || other
      } else if (depth < 2 && rng.nextInt(6) == 0) !pred(depth + 1)
      else simple
    }

    val full = tbl.read()
    var anyPruned = false
    for (i <- 1 to 18) {
      val p = pred()
      val got = tbl.prunedRead(p).collect().map(_.mkString("|")).sorted.toSeq
      val want = full.where(p).collect().map(_.mkString("|")).sorted.toSeq
      val (kept, total) = tbl.pruneStats(p)
      if (kept < total) anyPruned = true
      assert(got == want,
        s"pruning dropped or duplicated rows (seed=$seed predicate $i " +
          s"[${p.toString.take(120)}], kept $kept/$total files): " +
          s"got ${got.size} rows, want ${want.size}")
    }
    assert(anyPruned,
      s"no predicate pruned anything (seed=$seed) — the fuzz lost its teeth")
  }

  test("random predicates over a bucket-partitioned table evolved to " +
      "identity partitioning: prunedRead == read().where everywhere") {
    fuzz(18401L, Seq("bucket(4,grp)"), Seq("identity(grp)"))
  }

  test("random predicates over a truncate-partitioned table (spec kept) " +
      "with rename + MoR state: prunedRead == read().where everywhere") {
    fuzz(18402L, Seq("truncate(2,s)"), Seq("truncate(2,s)"))
  }

  test("random predicates over an unpartitioned range-clustered table: " +
      "bounds pruning alone stays exact") {
    fuzz(18403L, Nil, Nil)
  }

  test("random predicates over a BARE-identity-spec table (the SQL " +
      "bridge's PARTITIONED BY (col) form) evolved to truncate-" +
      "partitioning: the rename carries the normalized spec, pruning " +
      "stays exact") {
    // `grp` stored as a bare spec string — exercises parse's bare branch
    // through write layout, per-era pruning, and the rename carry
    fuzz(19401L, Seq("grp"), Seq("truncate(1,s)"))
  }

  test("same pruning fuzz THROUGH the merged single-scan read: with the " +
      "era threshold forced to 2, the merged path's leaf translation " +
      "(physical name -> field-id -> current name) prunes exactly like " +
      "per-era (seed 19402)") {
    graft.SparkFixture.withMergedThreshold(2) {
      fuzz(19402L, Seq("bucket(4,grp)"), Seq("identity(grp)"))
    }
  }
}
