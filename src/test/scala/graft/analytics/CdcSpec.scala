package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Lakehouse, SparkFixture}

class CdcSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val cols = Seq("id" -> "long", "v" -> "string")

  private def seeded(): Lakehouse = {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cdc-").toString)
    lh.catalog.createTable("t", cols, Nil, Map.empty)
    lh.dml.insertRows("t", Seq(
      Map("id" -> 1, "v" -> "a"), Map("id" -> 2, "v" -> "b"), Map("id" -> 3, "v" -> "c")))
    // snapshot 2: update id=2, delete id=3, insert id=4
    lh.dml.upsertRows("t", Seq(Map("id" -> 2, "v" -> "B"), Map("id" -> 4, "v" -> "d")),
      keys = Seq("id"))
    lh.dml.delete("t", "id = 3")
    lh
  }

  test("CDC refs accept named tags (id -> tag -> timestamp precedence)") {
    val lh = seeded()
    lh.catalog.loadTable("t").tagSnapshot("base", Some("1"))
    val byTag = lh.cdc.changeSummary("t", fromRef = Some("base"), keys = Seq("id"))
    val byId = lh.cdc.changeSummary("t", fromRef = Some("1"), keys = Seq("id"))
    assert(byTag == byId, s"tag ref diverged: $byTag vs $byId")
    assert(byTag("inserted") >= 1 && byTag("deleted") >= 1)
  }

  test("getChanges classifies INSERT/UPDATE/DELETE with changed_columns") {
    val lh = seeded()
    // compare snapshot 1 (initial insert) to current
    val ch = lh.cdc.getChanges("t", fromRef = Some("1"), keyCols = Seq("id")).cache()
    val types = ch.groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types == Map("INSERT" -> 1L, "DELETE" -> 1L,
      "UPDATE_BEFORE" -> 1L, "UPDATE_AFTER" -> 1L))
    val upd = ch.where($"change_type" === "UPDATE_AFTER").head
    assert(upd.getAs[Long]("id") == 2 && upd.getAs[String]("v") == "B")
    assert(upd.getSeq[String](upd.fieldIndex("changed_columns")) == Seq("v"))
    assert(ch.where($"change_type" === "INSERT").head.getAs[Long]("id") == 4)
    assert(ch.where($"change_type" === "DELETE").head.getAs[Long]("id") == 3)
  }

  test("classifyChanges works table-free, null-safe on keys") {
    val oldDf = Seq((Some(1L), "a"), (Some(2L), "b"), (None: Option[Long], "n"))
      .toDF("id", "v")
    val newDf = Seq((Some(1L), "a"), (Some(2L), "B"), (None: Option[Long], "m"))
      .toDF("id", "v")
    val ch = Cdc.classifyChanges(oldDf, newDf, Seq("id"), Seq("id", "v"))
    val byType = ch.collect().groupBy(_.getAs[String]("change_type"))
    // id=1 unchanged (absent); id=2 and the NULL key both classify as update
    assert(!byType.contains("INSERT") && !byType.contains("DELETE"))
    assert(byType("UPDATE_AFTER").map(_.getAs[String]("v")).toSet == Set("B", "m"))
    assert(byType("UPDATE_BEFORE").map(_.getAs[String]("v")).toSet == Set("b", "n"))
    assert(byType("UPDATE_AFTER").forall(
      r => r.getSeq[String](r.fieldIndex("changed_columns")) == Seq("v")))
    // column ORDER must not matter: a reordered newDf classifies identically
    val reordered = Cdc.classifyChanges(oldDf,
      newDf.select($"v", $"id"), Seq("id"), Seq("id", "v"))
    assert(reordered.where($"change_type" === "UPDATE_AFTER").count() == 2)
    assert(reordered.where(
      $"change_type".isin("INSERT", "DELETE")).count() == 0)
  }

  test("changeSummary and changeLog walk snapshot pairs") {
    val lh = seeded()
    val s = lh.cdc.changeSummary("t", fromRef = Some("1"), keys = Seq("id"))
    assert(s == Map("inserted" -> 1L, "deleted" -> 1L, "updated" -> 1L))
    val log = lh.cdc.changeLog("t", keys = Seq("id"))
    assert(log.size == 2) // (1→2), (2→3) pairs, newest first
    assert(log.head._1 == 2 && log.head._2 == 3)
    assert(log.head._3("deleted") == 1)
  }

  test("replayChanges applies a change set to a cloned table") {
    val lh = seeded()
    // clone state at snapshot 1 into t2, then replay 1→current changes
    lh.catalog.createTable("t2", cols, Nil, Map.empty)
    lh.catalog.loadTable("t2").append(lh.catalog.loadTable("t").readAsOf("1"))
    val ch = lh.cdc.getChanges("t", fromRef = Some("1"), keyCols = Seq("id"))
    val counts = lh.cdc.replayChanges(ch, "t2")
    assert(counts == Map("inserted" -> 1L, "deleted" -> 1L, "updated" -> 1L))
    val got = lh.catalog.loadTable("t2").read().orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = lh.catalog.loadTable("t").read().orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == want)
  }

  test("incremental watermarks: full → empty → diff") {
    val lh = seeded()
    val b1 = lh.incremental.getIncrementalData("p1", "t")
    assert(b1.isFull && b1.data.count() == 3)
    lh.incremental.advance("p1", "t", b1.data.count())
    val b2 = lh.incremental.getIncrementalData("p1", "t")
    assert(!b2.isFull && b2.data.count() == 0)
    // new write → only the delta comes back
    lh.dml.insertRows("t", Seq(Map("id" -> 9, "v" -> "z")))
    val b3 = lh.incremental.getIncrementalData("p1", "t")
    assert(!b3.isFull)
    assert(b3.data.collect().map(_.getLong(0)).toSeq == Seq(9L))
    lh.incremental.clearWatermarks("p1")
    assert(lh.incremental.getIncrementalData("p1", "t").isFull)
  }
}
