package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.Union
import graft.SparkFixture

/** The deep-evolution merged single-scan read (IceTable.assembleMerged):
  * past MergedAssembleMinGroups schema eras, a read collapses the
  * per-era union (O(columns × eras) plan — measured 12 s of driver
  * analysis at 500 cols × 50 eras, tools/SchemaScale) into ONE scan with
  * per-column coalesce over historical names. Differential-gated here
  * against the per-era path on the same table, with MoR delete/update
  * state, adds/drops/repeat-renames, pruning still firing, and the
  * ambiguous rename-SWAP shape falling back to per-era. */
class MergedAssembleSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def union(df: org.apache.spark.sql.DataFrame) =
    org.apache.spark.sql.graft.DatasetBridge.analyzed(df)
      .collect { case u: Union => u }

  test("12-era history (repeat renames, add, drop, MoR deletes + update): " +
      "merged read == per-era read exactly, single-scan plan, pruning " +
      "still skips files") {
    val cat = Catalog.open(spark,
      SparkFixture.tmpDir("graft-masm-").toString)
    val tbl = cat.createTable("m1",
      Seq("id" -> "long", "a" -> "long", "b" -> "string"), Nil, Map.empty)
    var aName = "a"
    // 12 eras: each commit preceded by an evolution; files range-cluster
    // on id so bounds pruning has something to skip
    (0 until 12).foreach { e =>
      e match {
        case 2 => tbl.addColumn("c", "long")
        case 5 => tbl.dropColumn("b")
        case _ =>
          val nn = s"a$e"
          tbl.renameColumn(aName, nn); aName = nn
      }
      val hasB = e < 5
      val hasC = e >= 2
      val base = spark.range(e * 100, (e + 1) * 100).toDF("id")
        .withColumn(aName, col("id") * 2)
      val withB = if (hasB) base.withColumn("b", concat(lit("x"),
        col("id").cast("string"))) else base
      val df = if (hasC) withB.withColumn("c", col("id") % 9) else withB
      tbl.append(df.coalesce(1))
    }
    tbl.deleteWhereMor(col("id") % 10 === 3)
    tbl.updateWhereMor(col("id") === 777L, Map(aName -> lit(-1L)))
    assert(tbl.meta.schemas.size >= IceTable.MergedAssembleMinGroups,
      "precondition: enough eras to trigger the merged path")

    // merged path: NO per-era union in the analyzed plan
    val merged = tbl.read()
    assert(union(merged).isEmpty,
      "expected the merged single-scan read, found a per-era union")
    // differential: force the per-era path on the SAME table
    val perEra = graft.SparkFixture
      .withMergedThreshold(Int.MaxValue, expectFired = false) {
        val df = cat.loadTable("m1").read()
        assert(union(df).nonEmpty, "per-era fallback must union")
        df.collect().map(_.mkString("|")).sorted.toSeq
      }
    val got = merged.collect().map(_.mkString("|")).sorted.toSeq
    assert(got == perEra, s"merged != per-era: ${got.size} vs ${perEra.size}")
    // model check, not just self-consistency: 1200 rows − 120 deleted
    assert(got.size == 1080)
    assert(merged.where(col("id") === 777L).select(aName)
      .head.getLong(0) == -1L, "the MoR update must read through")
    // old files resolve the current name by field-id through coalesce
    assert(merged.where(col("id") === 50L).select(aName)
      .head.getLong(0) == 100L)
    // column added at era 2: older files read null
    assert(merged.where(col("id") < 200 && col("c").isNotNull).count() == 0)
    assert(merged.where(col("id") === 250L).select("c")
      .head.getLong(0) == 250L % 9)

    // pruning still fires under the merged path (never-renamed column)
    val pruned = tbl.prunedRead(col("id") >= 1100L)
    assert(pruned.inputFiles.length < tbl.currentSnapshot.get.files.size,
      "bounds pruning must still skip files in the merged path")
    val want = merged.where(col("id") >= 1100L)
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(pruned.collect().map(_.mkString("|")).sorted.toSeq == want)
  }

  test("rename SWAP across eras (a->tmp, b->a, tmp->b) is ambiguous by " +
      "physical name: the merged path refuses and the per-era fallback " +
      "stays exact") {
    val cat = Catalog.open(spark,
      SparkFixture.tmpDir("graft-masw-").toString)
    val tbl = cat.createTable("m2",
      Seq("id" -> "long", "a" -> "long", "b" -> "long"), Nil, Map.empty)
    def batch(e: Int, an: String, bn: String) =
      spark.range(e * 50, (e + 1) * 50).toDF("id")
        .withColumn(an, col("id") * 10).withColumn(bn, col("id") * 100)
    tbl.append(batch(0, "a", "b").coalesce(1))
    // the swap: after it, physical name `a` carries field-id of b's data
    tbl.renameColumn("a", "tmp")
    tbl.renameColumn("b", "a")
    tbl.renameColumn("tmp", "b")
    tbl.append(batch(1, "b", "a").coalesce(1)) // writer uses CURRENT names
    // pad eras past the threshold with benign same-column renames
    var idName = "id"
    (0 until IceTable.MergedAssembleMinGroups).foreach { e =>
      val nn = s"id$e"
      tbl.renameColumn(idName, nn); idName = nn
      tbl.append(batch(2 + e, "b", "a")
        .withColumnRenamed("id", idName).coalesce(1))
    }
    val df = cat.loadTable("m2").read()
    assert(union(df).nonEmpty,
      "the swap must force the per-era fallback (physical name `a` maps " +
        "to two field-ids)")
    // and the data reads RIGHT: era-0 rows' original a-values surface
    // under today's name for that field-id, which is `b`
    val r = df.where(col(idName) === 10L).select("b", "a").head
    assert(r.getLong(0) == 100L && r.getLong(1) == 1000L,
      s"swap semantics by field-id, got $r")
  }

  test("case-only rename across many eras: the merged read schema would " +
      "hold both spellings (duplicate under Spark's case-insensitive " +
      "parquet resolution) — must fall back to per-era and stay exact") {
    val cat = Catalog.open(spark,
      SparkFixture.tmpDir("graft-macs-").toString)
    val tbl = cat.createTable("m3",
      Seq("id" -> "long", "vid" -> "long"), Nil, Map.empty)
    tbl.append(spark.range(0, 40).toDF("id")
      .withColumn("vid", col("id") * 3).coalesce(1))
    tbl.renameColumn("vid", "VID") // case-only (I/i: the Turkish-locale trap), field-id unchanged
    var n = "VID"
    (0 until IceTable.MergedAssembleMinGroups).foreach { e =>
      tbl.append(spark.range((e + 1) * 40L, (e + 2) * 40L).toDF("id")
        .withColumn(n, col("id") * 3).coalesce(1))
      val nn = s"VID$e"
      tbl.renameColumn(n, nn); n = nn
    }
    // the collision check must be locale-independent: under a Turkish
    // default locale "ID".toLowerCase is "ıd" ≠ "id" — a
    // default-locale fold would let the duplicate spellings through
    val savedLocale = java.util.Locale.getDefault
    val df = try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      cat.loadTable("m3").read()
    } finally java.util.Locale.setDefault(savedLocale)
    assert(union(df).nonEmpty,
      "case-colliding physical names must take the per-era fallback")
    assert(df.count() ==
      40L * (IceTable.MergedAssembleMinGroups + 1))
    assert(df.where(col("id") === 10L).select(n).head.getLong(0) == 30L)
  }
}
