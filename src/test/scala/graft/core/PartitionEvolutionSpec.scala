package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Partition-spec evolution: metadata-only (no data rewrite), per-era
  * pruning, time travel across the boundary, and the ambiguous-dir-name
  * guard. The 100 TB claim under test: day(ts) → hour(ts) on a huge
  * table is one metadata CAS; correctness never depends on rewriting
  * old files. */
class PartitionEvolutionSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def newCatalog() =
    Catalog.open(spark, SparkFixture.tmpDir("graft-pev-").toString)

  test("evolution is metadata-only; each era prunes by its own layout; reads stay complete") {
    val cat = newCatalog()
    cat.createTable("default.e",
      Seq("cat" -> "string", "d" -> "date", "v" -> "long"),
      Seq("identity(cat)"), Map.empty)
    val t = cat.loadTable("default.e")
    val era1 = Seq(
      ("a", "2024-01-01", 1L), ("b", "2024-01-01", 2L),
      ("a", "2024-02-01", 3L), ("b", "2024-02-01", 4L))
      .toDF("cat", "d", "v").withColumn("d", col("d").cast("date"))
    t.append(era1.repartition(2, col("cat")))
    val filesEra1 = t.currentSnapshot.get.files.map(_.path).toSet
    assert(filesEra1.forall(_.contains("_p_cat=")), filesEra1.toString)
    val preEvoSnap = t.currentSnapshot.get.id

    t.updatePartitionSpec(Seq("day(d)"))
    assert(t.meta.transforms.map(_.spec) == List("day(d)"))
    assert(t.meta.previousPartitionSpecs == List(List("identity(cat)")))
    // metadata-only: the old era's files were not touched
    assert(t.currentSnapshot.get.files.map(_.path).toSet == filesEra1)

    val era2 = Seq(
      ("c", "2024-03-01", 5L), ("c", "2024-04-01", 6L))
      .toDF("cat", "d", "v").withColumn("d", col("d").cast("date"))
    t.append(era2.repartition(2, col("d")))
    val newFiles =
      t.currentSnapshot.get.files.map(_.path).filterNot(filesEra1)
    assert(newFiles.nonEmpty &&
      newFiles.forall(p => p.contains("_p_d_day=") && !p.contains("_p_cat=")),
      newFiles.toString)

    // reads complete across both layouts
    assert(t.read().count() == 6)
    assert(t.read().agg(sum("v")).head().getLong(0) == 21L)

    // the PARTITION-DIR layer (bounds pruning is a separate, value-exact
    // layer): era-1 files prune on cat by their dirs; era-2 files carry
    // no cat dir and must be kept by this layer no matter the predicate
    val catConj = FilePruning.conjunctsOf(col("cat") === "a", t.schema)
    val tfs = t.meta.allTransforms
    val (era1F, era2F) = t.currentSnapshot.get.files
      .partition(f => filesEra1(f.path))
    assert(era1F.exists(f =>
      !FilePruning.keepFileByPartitions(f, catConj, tfs, t.schema)),
      "cat dirs must prune within era 1")
    assert(era2F.forall(f =>
      FilePruning.keepFileByPartitions(f, catConj, tfs, t.schema)),
      "era-2 files (no cat dir) must never partition-prune on cat")
    assert(t.prunedRead(col("cat") === "a").agg(sum("v")).head().getLong(0) == 4L)

    // symmetric: day dirs prune within era 2, era-1 files always kept
    val marchOnly = col("d") === lit(java.sql.Date.valueOf("2024-03-01"))
    val dayConj = FilePruning.conjunctsOf(marchOnly, t.schema)
    assert(era2F.exists(f =>
      !FilePruning.keepFileByPartitions(f, dayConj, tfs, t.schema)),
      "day dirs must prune within era 2")
    assert(era1F.forall(f =>
      FilePruning.keepFileByPartitions(f, dayConj, tfs, t.schema)),
      "era-1 files (no day dir) must never partition-prune on day")
    assert(t.prunedRead(marchOnly).agg(sum("v")).head().getLong(0) == 5L)

    // time travel to the pre-evolution snapshot still reads era 1 alone
    assert(t.readAsOf(preEvoSnap.toString).count() == 4)
  }

  test("same dir name with different truncate widths across eras never prunes") {
    val cat = newCatalog()
    cat.createTable("default.tr", Seq("s" -> "string", "v" -> "long"),
      Seq("truncate(2,s)"), Map.empty)
    val t = cat.loadTable("default.tr")
    t.append(Seq(("aaaa", 1L), ("zzzz", 2L)).toDF("s", "v")
      .repartition(2, col("s")))
    t.updatePartitionSpec(Seq("truncate(4,s)"))
    t.append(Seq(("aaaa", 3L)).toDF("s", "v").coalesce(1))
    // both eras write `_p_s_trunc` dirs with DIFFERENT widths: judging the
    // era-1 dir "zz" under width-4 semantics (truncate4("zzzz") = "zzzz")
    // would wrongly prune the file holding the match — the name must be
    // excluded from pruning entirely
    assert(t.meta.allTransforms.isEmpty,
      s"ambiguous trunc name must not prune: ${t.meta.allTransforms}")
    // the partition-dir layer must keep every file (the bounds layer may
    // still prune value-exactly — that one cannot be fooled by widths)
    val conj = FilePruning.conjunctsOf(col("s") === "zzzz", t.schema)
    assert(t.currentSnapshot.get.files.forall(f =>
      FilePruning.keepFileByPartitions(f, conj, t.meta.allTransforms, t.schema)))
    assert(t.prunedRead(col("s") === "zzzz").agg(sum("v")).head().getLong(0) == 2L)
  }

  test("pre-evolution meta JSON (no previousPartitionSpecs field) reads as Nil") {
    val json =
      """{"namespace":"default","name":"old","schemas":[{"id":1,
        |"structJson":"{\"type\":\"struct\",\"fields\":[]}"}],
        |"currentSchemaId":1,"partitionSpec":["identity(x)"],
        |"properties":{}}""".stripMargin
    val m = Jsons.read[TableMeta](json)
    assert(m.previousPartitionSpecs == Nil)
    assert(m.allTransforms.map(_.spec) == List("identity(x)"))
  }

  test("evolution validates source columns and duplicate dir names") {
    val cat = newCatalog()
    cat.createTable("default.bad", Seq("x" -> "long"), Nil, Map.empty)
    val t = cat.loadTable("default.bad")
    intercept[IllegalArgumentException] {
      t.updatePartitionSpec(Seq("identity(nope)"))
    }
    intercept[IllegalArgumentException] {
      t.updatePartitionSpec(Seq("identity(x)", "identity(x)"))
    }
    // no-op evolution records nothing AND burns no metadata version
    t.updatePartitionSpec(Seq("identity(x)"))
    val vBefore = t.metaHead._1
    t.updatePartitionSpec(Seq("identity(x)"))
    assert(t.meta.previousPartitionSpecs == Nil)
    assert(t.metaHead._1 == vBefore,
      "idempotent re-apply must not write a new metadata version")
  }

  test("renaming a partition-source column carries the spec (writes keep " +
      "working, new files lay out under the new name, old files keep " +
      "reading); dropping one refuses") {
    val cat = newCatalog()
    cat.createTable("default.rn", Seq("g" -> "long", "v" -> "string"),
      Seq("bucket(4,g)"), Map.empty)
    val t = cat.loadTable("default.rn")
    t.append((0L until 20L).map(i => (i, s"a$i")).toDF("g", "v"))
    t.renameColumn("g", "g2")
    // the current spec followed the rename; the old-named spec became a
    // previous era (old files keep their _p_g_bucket dirs)
    assert(t.meta.partitionSpec == List("bucket(4,g2)"))
    assert(t.meta.previousPartitionSpecs.contains(List("bucket(4,g)")))
    // writes under the renamed spec work and lay out under the new name
    t.append((20L until 30L).map(i => (i, s"b$i")).toDF("g2", "v"))
    val newFiles = t.currentSnapshot.get.files.map(_.path)
      .filter(_.contains("commit-00002"))
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("_p_g2_bucket=")),
      s"new files must use the renamed layout: $newFiles")
    assert(t.read().count() == 30)
    // dropping the current partition source refuses loudly
    val e = intercept[IllegalArgumentException](t.dropColumn("g2"))
    assert(e.getMessage.contains("partition"))
    // after evolving the spec away, the drop is legal
    t.updatePartitionSpec(Nil)
    t.dropColumn("g2")
    assert(t.read().columns.toSeq == Seq("v"))
  }

  test("renaming a BARE-identity partition source carries the spec " +
      "(no parens to splice — the SQL bridge stores PARTITIONED BY (col) " +
      "verbatim); round-trip renames keep pruning teeth") {
    val cat = newCatalog()
    // bare spec string, exactly as TransformBridge emits for identity
    cat.createTable("default.bare", Seq("g" -> "long", "v" -> "string"),
      Seq("g"), Map.empty)
    val t = cat.loadTable("default.bare")
    t.append((0L until 8L).map(i => (i % 2, s"a$i")).toDF("g", "v"))
    t.renameColumn("g", "g2") // crashed with substring(0,-1) before the fix
    assert(t.meta.partitionSpec == List("identity(g2)"))
    assert(t.meta.previousPartitionSpecs.contains(List("g")))
    t.append((8L until 12L).map(i => (i % 2, s"b$i")).toDF("g2", "v"))
    val newFiles = t.currentSnapshot.get.files.map(_.path)
      .filter(_.contains("commit-00002"))
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("_p_g2=")),
      s"new files must use the renamed layout: $newFiles")
    assert(t.read().count() == 12)
    // rename BACK: the previous eras now hold both `g` (bare) and
    // `identity(g2)`; the current spec is `identity(g)`. The bare and
    // normalized forms of the same transform must collapse in
    // allTransforms (parsed-value distinct) instead of tripping the
    // dir-name-collision exclusion and disabling pruning on _p_g
    t.renameColumn("g2", "g")
    val tfs = t.meta.allTransforms
    assert(tfs.toSet ==
      Set(PartitionTransform.Identity("g"), PartitionTransform.Identity("g2")),
      tfs.toString)
    t.append(Seq((0L, "c0")).toDF("g", "v"))
    assert(t.read().count() == 13)
    // pruning across all three eras stays exact vs a full-scan filter
    assert(t.prunedRead(col("g") === 0L).count() ==
      t.read().where(col("g") === 0L).count())
  }

  test("compact migrates old files to the current layout") {
    val cat = newCatalog()
    cat.createTable("default.mig", Seq("cat" -> "string", "v" -> "long"),
      Seq("identity(cat)"), Map.empty)
    val t = cat.loadTable("default.mig")
    t.append(Seq(("a", 1L), ("b", 2L)).toDF("cat", "v").repartition(2, col("cat")))
    t.updatePartitionSpec(Nil) // un-partition
    t.compact(targetFiles = 1)
    val files = t.currentSnapshot.get.files.map(_.path)
    assert(files.forall(!_.contains("_p_cat=")),
      s"compaction must rewrite into the current (empty) layout: $files")
    assert(t.read().count() == 2)
  }
}
