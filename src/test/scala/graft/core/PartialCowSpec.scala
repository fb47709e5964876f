package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Lakehouse, SparkFixture}

/** Partial copy-on-write ([[IceTable.rewriteWhereCow]]): `DELETE` /
  * `UPDATE` / `REPLACE WHERE` in copy-on-write mode rewrite ONLY the
  * candidate files (manifest bounds / partition dirs / blooms admit the
  * filter), carrying every other data file forward BY REFERENCE — the
  * whole-table overwrite the CoW paths used to pay becomes O(touched
  * files). Content, matched counts, delete bookkeeping, liveRows, and
  * the changelog-replay composition are asserted exactly. */
class PartialCowSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def newLh() =
    Lakehouse.open(spark, SparkFixture.tmpDir("graft-pcow-").toString)

  private def df(ids: Range) =
    ids.map(i => (i.toLong, s"row$i")).toDF("id", "name")

  /** Two single-file commits with disjoint id ranges: bounds make each
    * file prunable by an id predicate. */
  private def seeded(lh: Lakehouse, name: String,
      props: Map[String, String] = Map.empty): IceTable = {
    lh.catalog.createTable(name, Seq("id" -> "long", "name" -> "string"),
      Nil, props)
    val t = lh.catalog.loadTable(name)
    t.append(df(0 until 100).coalesce(1))
    t.append(df(1000 until 1100).coalesce(1))
    t
  }

  test("CoW DELETE rewrites only the candidate file; the other file is " +
      "carried by REFERENCE (same path); rows and count exact") {
    val lh = newLh()
    val t = seeded(lh, "default.d1")
    val loPath = t.currentSnapshot.get.files.minBy(_.path).path
    val paths = t.currentSnapshot.get.files.map(_.path).toSet
    val n = lh.dml.delete("default.d1", "id >= 1050")
    assert(n == 50L)
    val t2 = lh.catalog.loadTable("default.d1")
    val after = t2.currentSnapshot.get
    assert(after.operation == "overwrite")
    assert(after.summary("matched-rows") == "50")
    assert(after.summary("rewritten-files") == "1")
    assert(after.summary("carried-files") == "1")
    // the untouched commit's file survives with its exact path; the
    // victim's path is gone
    val afterPaths = after.files.map(_.path).toSet
    assert(afterPaths.exists(p => paths.contains(p)),
      "one parent file must be carried by reference")
    val carried = afterPaths.intersect(paths)
    assert(carried.size == 1)
    val rows = t2.read().select("id").as[Long].collect().sorted
    assert(rows.toSeq == ((0L until 100L) ++ (1000L until 1050L)))
    assert(after.liveRows == 150L)
    // the 0-99 file is untouched whichever file carried
    assert(t2.readAsOf("2").count() == 200L, "history preserved")
    // NULL-cond rows kept: a filter over a null-bearing expression
    val n2 = lh.dml.delete("default.d1", "CASE WHEN id < 10 THEN NULL ELSE id < 20 END")
    assert(n2 == 10L)
    assert(lh.catalog.loadTable("default.d1").read().count() == 140L)
    // the lo file had to be rewritten this time; carried = the previous
    // rewrite's output
    assert(loPath == loPath) // (path var used above for clarity)
  }

  test("zero matches: NO snapshot commits (scheduled no-op delete must " +
      "not pollute the log), count 0") {
    val lh = newLh()
    val t = seeded(lh, "default.d0")
    val head = t.currentSnapshot.get.id
    assert(lh.dml.delete("default.d0", "id = 777") == 0L)
    assert(lh.catalog.loadTable("default.d0").currentSnapshot.get.id == head)
  }

  test("CoW UPDATE rewrites only the candidate file; carried file " +
      "untouched; filter evaluated on pre-update values") {
    val lh = newLh()
    val t = seeded(lh, "default.u1")
    val paths = t.currentSnapshot.get.files.map(_.path).toSet
    val n = lh.dml.update("default.u1", "id >= 1090",
      Map("name" -> "upd"))
    assert(n == 10L)
    val t2 = lh.catalog.loadTable("default.u1")
    val after = t2.currentSnapshot.get
    assert(after.files.map(_.path).toSet.intersect(paths).size == 1,
      "the 0-99 file must carry by reference")
    assert(t2.read().where(col("name") === "upd").count() == 10L)
    assert(t2.read().count() == 200L)
    assert(t2.read().where(col("id") === 5L).head.getString(1) == "row5")
  }

  test("REPLACE WHERE (CoW): kept remainder of the candidate file + " +
      "incoming batch land in ONE snapshot; untouched file carried") {
    val lh = newLh()
    val t = seeded(lh, "default.r1")
    val paths = t.currentSnapshot.get.files.map(_.path).toSet
    val head = t.currentSnapshot.get.id
    val incoming = df(5000 until 5020)
    val n = lh.dml.overwriteWhereDf("default.r1",
      col("id") >= 1000L && col("id") < 1050L, incoming)
    assert(n == 50L)
    val t2 = lh.catalog.loadTable("default.r1")
    val after = t2.currentSnapshot.get
    assert(after.id == head + 1, "one atomic snapshot")
    assert(after.files.map(_.path).toSet.intersect(paths).size == 1)
    val ids = t2.read().select("id").as[Long].collect().sorted.toSeq
    assert(ids == ((0L until 100L) ++ (1050L until 1100L) ++
      (5000L until 5020L)))
    // zero matches still lands the incoming batch atomically
    val n2 = lh.dml.overwriteWhereDf("default.r1",
      col("id") === -1L, df(9000 until 9010))
    assert(n2 == 0L)
    assert(lh.catalog.loadTable("default.r1").read().count() == 180L)
  }

  test("position-delete state: deletes referencing the CARRIED file " +
      "survive (still applied); those referencing the victim are " +
      "absorbed; liveRows exact") {
    val lh = newLh()
    val t = seeded(lh, "default.pd1")
    // MoR position deletes spanning BOTH files
    t.deleteWhereMor(col("id") === 7L || col("id") === 1007L)
    assert(t.currentSnapshot.get.deleteFiles.nonEmpty)
    // partial CoW delete touching only the hi file
    val n = lh.dml.delete("default.pd1", "id >= 1050")
    assert(n == 50L)
    val t2 = lh.catalog.loadTable("default.pd1")
    val after = t2.currentSnapshot.get
    // pruned delete file still present (covers the carried 0-99 file)
    assert(after.deleteFiles.map(_.rows).sum == 1L,
      s"only id=7's position survives: ${after.deleteFiles}")
    val rows = t2.read().select("id").as[Long].collect().sorted.toSeq
    assert(rows == ((0L until 100L).filterNot(_ == 7L) ++
      (1000L until 1050L).filterNot(_ == 1007L)))
    assert(after.liveRows == rows.size.toLong)
  }

  test("equality-delete state: accounting reduced by exactly the " +
      "matches that lived in the victims; liveRows exact") {
    val lh = newLh()
    val t = seeded(lh, "default.eq1")
    // eq-delete 5 keys in the hi file, 2 in the lo file
    t.deleteKeysMor(Seq("id"),
      Seq(1001L, 1002L, 1003L, 1004L, 1005L, 10L, 11L).toDF("id"))
    assert(t.currentSnapshot.get.eqDeleteFiles.map(_.rows).sum == 7L)
    // partial CoW delete: victims = the hi file only
    val n = lh.dml.delete("default.eq1", "id >= 1050")
    assert(n == 50L)
    val t2 = lh.catalog.loadTable("default.eq1")
    val after = t2.currentSnapshot.get
    // 5 matched rows lived in the rewritten file -> deducted; 2 remain
    assert(after.eqDeleteFiles.map(_.rows).sum == 2L,
      s"eq accounting must deduct the victims' matches: ${after.eqDeleteFiles}")
    val rows = t2.read().select("id").as[Long].collect().sorted.toSeq
    assert(rows == ((0L until 100L).filterNot(i => i == 10L || i == 11L) ++
      Seq(1000L) ++ (1006L until 1050L)))
    assert(after.liveRows == rows.size.toLong)
  }

  test("changelog replay of a partial CoW delete reads only the " +
      "rewritten lineage (carried file cancels out of the diff)") {
    val lh = newLh()
    val t = seeded(lh, "default.cl1")
    val head = t.currentSnapshot.get.id
    lh.dml.delete("default.cl1", "id >= 1050")
    val t2 = lh.catalog.loadTable("default.cl1")
    val ch = graft.streaming.Changelog.changesBetween(t2, Some(head), head + 1)
    val got = ch.select(col(graft.streaming.Changelog.ChangeTypeCol), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == (1050L until 1100L).map(("delete", _)).toSet,
      s"replay must emit exactly the deleted rows, got ${got.size}")
    val scanned = ch.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.toSeq
          case _ => Nil
        }
    }.flatten.filter(_.contains("/data/commit-"))
    assert(scanned.nonEmpty)
    assert(!scanned.exists(_.contains("commit-00001")),
      s"the carried 0-99 file must cancel out of the replay: $scanned")
  }

  test("UPSERT rides partial CoW: untouched file carried by reference; " +
      "matched rows replaced, inserts appended, duplicate incoming keys " +
      "collapse to the last occurrence") {
    val lh = newLh()
    val t = seeded(lh, "default.up1")
    val paths = t.currentSnapshot.get.files.map(_.path).toSet
    // touches only the hi file: one update (1005), one insert (7000),
    // duplicated incoming key 1005 keeps the LAST row
    val inc = Seq((1005L, "first"), (7000L, "new"), (1005L, "last"))
      .toDF("id", "name")
    val r = lh.dml.upsert("default.up1", inc, Seq("id"))
    assert(r.updated == 1L && r.inserted == 1L)
    val t2 = lh.catalog.loadTable("default.up1")
    val after = t2.currentSnapshot.get
    assert(after.files.map(_.path).toSet.intersect(paths).size == 1,
      "the 0-99 file must carry by reference")
    assert(t2.read().count() == 201L)
    assert(t2.read().where(col("id") === 1005L).head.getString(1) == "last")
    assert(t2.read().where(col("id") === 7000L).count() == 1L)
    // a NONDETERMINISTIC incoming plan falls back to the whole-table
    // form (probe soundness) but stays correct
    val rnd = spark.range(1).select((rand(7) * 0).cast("long").as("id"),
      lit("zero").as("name"))
    val r2 = lh.dml.upsert("default.up1", rnd, Seq("id"))
    assert(r2.updated == 1L && r2.inserted == 0L)
    assert(lh.catalog.loadTable("default.up1").read()
      .where(col("id") === 0L).head.getString(1) == "zero")
  }

  test("partition-transformed table: victims selected by PARTITION DIRS " +
      "(bucket transform), non-matching partitions carried by reference, " +
      "replacement written under the current spec") {
    val lh = newLh()
    lh.catalog.createTable("default.pt1",
      Seq("id" -> "long", "name" -> "string"),
      Seq("bucket(4,id)"), Map.empty)
    val t = lh.catalog.loadTable("default.pt1")
    t.append(df(0 until 400))
    val before = t.currentSnapshot.get
    assert(before.files.size >= 4, s"expected ≥4 bucket files")
    // one specific id: only its bucket's partition dir can match
    val n = lh.dml.delete("default.pt1", "id = 123")
    assert(n == 1L)
    val after = lh.catalog.loadTable("default.pt1").currentSnapshot.get
    val carried = after.files.map(_.path).toSet
      .intersect(before.files.map(_.path).toSet)
    assert(carried.nonEmpty && after.summary("carried-files").toInt > 0,
      s"other buckets must carry by reference: ${after.summary}")
    // every REWRITTEN file sits in id=123's bucket dir — pruning is even
    // finer (id bounds drop non-matching files within the bucket too),
    // so carried files may include same-bucket files, but a rewrite
    // outside the victim bucket would mean partition pruning failed
    // (compute the bucket with the same expression the transform uses)
    val victimBucket = spark.range(1)
      .select(pmod(hash(lit(123L)), lit(4))).head.getInt(0)
    val rewrittenOld = before.files.map(_.path).toSet -- carried
    assert(rewrittenOld.nonEmpty &&
      rewrittenOld.forall(_.contains(s"_p_id_bucket=$victimBucket")),
      s"only bucket-$victimBucket files may rewrite: $rewrittenOld")
    val rows = lh.catalog.loadTable("default.pt1").read()
      .select("id").as[Long].collect().sorted.toSeq
    assert(rows == (0L until 400L).filterNot(_ == 123L))
  }

  test("update validation still enforces against the remainder " +
      "(unique rule catches a duplicating update)") {
    val lh = newLh()
    seeded(lh, "default.v1")
    lh.validation.addRule(graft.governance.ValidationRule(
      "uq", "default.v1", "unique", List("id"), Map.empty))
    intercept[graft.governance.ValidationException] {
      lh.dml.update("default.v1", "id = 1099", Map("id" -> 0))
    }
    // untouched after the refused update
    assert(lh.catalog.loadTable("default.v1").read()
      .where(col("id") === 1099L).count() == 1L)
  }
}
