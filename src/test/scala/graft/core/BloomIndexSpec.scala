package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class BloomIndexSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def newCatalog() =
    Catalog.open(spark, SparkFixture.tmpDir("graft-bl-").toString)

  /** Scattered high-cardinality ids: every file's [min, max] straddles
    * every id, so min/max bounds can NEVER prune a point lookup — only
    * the bloom can. ids are spread round-robin across 8 files. */
  private def scatteredTable(cat: Catalog, name: String,
      props: Map[String, String]) = {
    cat.createTable(name, Seq("id" -> "long", "v" -> "string"), Nil, props)
    val t = cat.loadTable(name)
    val df = spark.range(0, 8000)
      .select(col("id"), concat(lit("val"), col("id")).as("v"))
      .repartition(8, col("id")) // hash layout -> interleaved ranges
    t.overwrite(df)
    t
  }

  test("point lookup on a scattered column prunes via bloom, same result") {
    val cat = newCatalog()
    val t = scatteredTable(cat, "default.bl",
      Map(BloomIndex.PropKey -> "id"))
    val total = t.currentSnapshot.get.files.size
    assert(total == 8)
    // bounds are useless here: every file spans ~[0, 8000)
    val probe = col("id") === 4242L
    val (kept, all) = t.pruneStats(probe)
    assert(all == 8 && kept < 8 && kept >= 1,
      s"bloom must prune scattered point lookup: kept $kept of $all")
    val got = t.prunedRead(probe).collect()
    assert(got.length == 1 && got.head.getString(1) == "val4242")
    // absent key: typically zero files open; result stays empty+correct
    val none = t.prunedRead(col("id") === 999999L).collect()
    assert(none.isEmpty)
  }

  test("IN-list probes the bloom once per file (one footer read), " +
      "keeping only files that might hold SOME element") {
    val cat = newCatalog()
    val t = scatteredTable(cat, "default.bi",
      Map(BloomIndex.PropKey -> "id"))
    // every file spans ~[0, 8000): bounds keep all 8, blooms must drop
    // the files holding neither element (round-robin: each id lives in
    // exactly one file)
    val probe = col("id").isin(4242L, 17L)
    val (kept, all) = t.pruneStats(probe)
    assert(all == 8 && kept < 8 && kept >= 1,
      s"bloom IN probe must prune: kept $kept of $all")
    val got = t.prunedRead(probe).collect().map(_.getLong(0)).toSet
    assert(got == Set(4242L, 17L))
    // all-absent list: typically nothing opens; stays empty + exact
    assert(t.prunedRead(col("id").isin(900001L, 900002L)).count() == 0)
  }

  test("without the table property, no bloom is written and no file prunes") {
    val cat = newCatalog()
    val t = scatteredTable(cat, "default.nb", Map.empty)
    val (kept, all) = t.pruneStats(col("id") === 4242L)
    assert(kept == all, "no bloom pages -> keep every file (three-valued)")
    assert(t.prunedRead(col("id") === 4242L).count() == 1)
  }

  test("string column blooms prune too; non-equality ops never consult blooms") {
    val cat = newCatalog()
    cat.createTable("default.bs", Seq("k" -> "string", "n" -> "long"),
      Nil, Map(BloomIndex.PropKey -> "k"))
    val t = cat.loadTable("default.bs")
    val df = spark.range(0, 4000)
      .select(concat(lit("key-"), col("id")).as("k"), col("id").as("n"))
      .repartition(8, col("id"))
    t.overwrite(df)
    val (kept, all) = t.pruneStats(col("k") === "key-123")
    assert(kept < all, s"string bloom must prune: $kept of $all")
    assert(t.prunedRead(col("k") === "key-123").count() == 1)
    // range op: blooms can't answer; bounds keep everything (scattered)
    val (keptRange, allRange) = t.pruneStats(col("k") > "key-")
    assert(keptRange == allRange)
  }

  test("bloom probe survives column rename (field-id resolution)") {
    val cat = newCatalog()
    val t = scatteredTable(cat, "default.br",
      Map(BloomIndex.PropKey -> "id"))
    t.renameColumn("id", "doc")
    val t2 = cat.loadTable("default.br")
    // property still names the OLD column: conjunct field is "doc",
    // bloomCols has "id" -> no probe, keeps all (safe), result right
    val (k1, a1) = t2.pruneStats(col("doc") === 4242L)
    assert(k1 == a1)
    // after updating the property to the new name, pruning resumes
    t2.setProperty(BloomIndex.PropKey, "doc")
    val t3 = cat.loadTable("default.br")
    val (k2, a2) = t3.pruneStats(col("doc") === 4242L)
    assert(k2 < a2, s"renamed column must still probe old files: $k2 of $a2")
    assert(t3.prunedRead(col("doc") === 4242L).count() == 1)
  }
}
