package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Lakehouse, SparkFixture}

class EdgeCasesSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def newLh() = Lakehouse.open(spark, SparkFixture.tmpDir("graft-edge-").toString)

  test("empty table: read/profile/update/delete/diff all behave") {
    val lh = newLh()
    lh.catalog.createTable("e", Seq("id" -> "long", "v" -> "double"), Nil, Map.empty)
    val tbl = lh.catalog.loadTable("e")
    assert(tbl.read().count() == 0)
    assert(tbl.read().schema.fieldNames.toSeq == Seq("id", "v"))
    assert(lh.dml.update("e", "id = 1", Map("v" -> 2.0)) == 0)
    assert(lh.dml.delete("e", "id = 1") == 0)
    val p = lh.profile.profileTable("default.e")
    assert(p.rowCount == 0)
    // upsert into empty table = plain insert
    val r = lh.dml.upsertRows("e", Seq(Map("id" -> 1, "v" -> 1.5)), Seq("id"))
    assert(r.inserted == 1 && r.updated == 0)
  }

  test("append aligns: extra columns dropped, missing null-filled, types cast") {
    val lh = newLh()
    lh.catalog.createTable("a", Seq("id" -> "long", "name" -> "string",
      "score" -> "double"), Nil, Map.empty)
    val messy = Seq((1, "x", "ignored"), (2, "y", "ignored"))
      .toDF("id", "name", "extra") // int id (needs cast), no score, extra col
    lh.catalog.loadTable("a").append(messy)
    val back = lh.catalog.loadTable("a").read()
    assert(back.columns.toSeq == Seq("id", "name", "score"))
    assert(back.schema("id").dataType.typeName == "long")
    assert(back.where($"score".isNull).count() == 2)
  }

  test("bad refs and duplicate DDL raise clear errors") {
    val lh = newLh()
    lh.catalog.createTable("t", Seq("id" -> "long"), Nil, Map.empty)
    intercept[IllegalArgumentException](lh.catalog.createTable("t",
      Seq("id" -> "long"), Nil, Map.empty))
    lh.dml.insertRows("t", Seq(Map("id" -> 1)))
    val tbl = lh.catalog.loadTable("t")
    intercept[IllegalArgumentException](tbl.readAsOf("999"))
    intercept[IllegalArgumentException](tbl.readAsOf("1990-01-01T00:00:00Z"))
    intercept[IllegalArgumentException](lh.catalog.loadTable("missing"))
    intercept[IllegalArgumentException](
      lh.catalog.createTable("x", Seq("id" -> "long"), Seq("bogus(id)"), Map.empty))
  }

  test("snapshot diff and CDC on tables that grow from empty") {
    val lh = newLh()
    lh.catalog.createTable("g", Seq("id" -> "long"), Nil, Map.empty)
    lh.dml.insertRows("g", Seq(Map("id" -> 1)))
    // from=None default is second-to-last; with a single snapshot the diff
    // treats "before" as empty
    val ch = lh.cdc.getChanges("g", keyCols = Seq("id"))
    assert(ch.where($"change_type" === "INSERT").count() == 1)
  }

  test("unique validation tolerates concurrent duplicate values inside one batch") {
    val lh = newLh()
    lh.catalog.createTable("u", Seq("id" -> "long"), Nil, Map.empty)
    lh.validation.addRule(graft.governance.ValidationRule("u1", "u", "unique", List("id")))
    val e = intercept[graft.governance.ValidationException](
      lh.dml.insertRows("u", Seq(Map("id" -> 1), Map("id" -> 1))))
    assert(e.failures.exists(_.ruleType == "unique"))
  }
}
