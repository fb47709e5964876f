package graft.dml

import org.scalatest.funsuite.AnyFunSuite
import graft.{Lakehouse, SparkFixture}
import graft.governance.{ValidationException, ValidationRule}

class DmlSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def newLh() = Lakehouse.open(spark, SparkFixture.tmpDir("graft-lh-").toString)

  private val cols = Seq("id" -> "long", "name" -> "string", "dept" -> "string",
    "salary" -> "double", "hired" -> "date")

  private def seed(lh: Lakehouse): Unit = {
    lh.catalog.createTable("emp", cols, Nil, Map.empty)
    lh.dml.insertRows("emp", Seq(
      Map("id" -> 1, "name" -> "Alice", "dept" -> "eng", "salary" -> 100.0, "hired" -> "2020-01-05"),
      Map("id" -> 2, "name" -> "Bob", "dept" -> "sales", "salary" -> 90.0, "hired" -> "2021-03-15"),
      Map("id" -> 3, "name" -> "Charlie", "dept" -> "eng", "salary" -> 120.5)))
  }

  test("insert coerces types: ISO date strings, int→long, missing→null") {
    val lh = newLh()
    seed(lh)
    val df = lh.catalog.loadTable("emp").read()
    assert(df.count() == 3)
    val alice = df.where($"id" === 1).head
    assert(alice.getAs[java.sql.Date]("hired").toString == "2020-01-05")
    val charlie = df.where($"id" === 3).head
    assert(charlie.isNullAt(charlie.fieldIndex("hired")))
    // audit recorded the write
    assert(lh.audit.entries(table = Some("emp"), operation = Some("insert")).nonEmpty)
  }

  test("update rewrites matching rows and preserves history") {
    val lh = newLh()
    seed(lh)
    val n = lh.dml.update("emp", "dept = 'eng'", Map("salary" -> 130))
    assert(n == 2)
    val df = lh.catalog.loadTable("emp").read()
    assert(df.where($"salary" === 130.0).count() == 2)
    assert(df.where($"name" === "Bob").head.getDouble(3) == 90.0)
    // previous snapshot still shows old values
    assert(lh.catalog.loadTable("emp").readAsOf("1")
      .where($"salary" === 100.0).count() == 1)
  }

  test("update whose filter references the SET column uses pre-update values") {
    val lh = newLh()
    seed(lh)
    // Bob (90.0) is the only salary < 95; raising it above the filter bound
    // must still count/validate exactly that one row
    lh.validation.addRule(ValidationRule("rr", "emp", "range", List("salary"),
      Map("max" -> "1000")))
    val n = lh.dml.update("emp", "salary < 95", Map("salary" -> 200))
    assert(n == 1)
    val df = lh.catalog.loadTable("emp").read()
    assert(df.where($"name" === "Bob").head.getDouble(3) == 200.0)
    assert(df.where($"salary" === 200.0).count() == 1)
    // and a validation-violating update on the same shape is rejected
    intercept[ValidationException](
      lh.dml.update("emp", "salary < 250", Map("salary" -> 5000)))
  }

  test("update that would duplicate an existing unique key is rejected") {
    val lh = newLh()
    seed(lh)
    lh.validation.addRule(ValidationRule("uq", "emp", "unique", List("id")))
    // rewriting id 2 -> 1 collides with the untouched row id=1
    intercept[ValidationException](
      lh.dml.update("emp", "id = 2", Map("id" -> 1)))
    // non-colliding rewrite passes
    assert(lh.dml.update("emp", "id = 2", Map("id" -> 20)) == 1)
  }

  test("delete keeps non-matching rows, counts deleted") {
    val lh = newLh()
    seed(lh)
    assert(lh.dml.delete("emp", "salary < 95") == 1)
    val df = lh.catalog.loadTable("emp").read()
    assert(df.count() == 2)
    assert(df.where($"name" === "Bob").count() == 0)
  }

  test("upsert: anti-join + union, returns inserted/updated counts") {
    val lh = newLh()
    seed(lh)
    val r = lh.dml.upsertRows("emp", Seq(
      Map("id" -> 2, "name" -> "Bob", "dept" -> "marketing", "salary" -> 95.0),
      Map("id" -> 4, "name" -> "Dana", "dept" -> "eng", "salary" -> 110.0)),
      keys = Seq("id"))
    assert(r == UpsertResult(inserted = 1, updated = 1))
    val df = lh.catalog.loadTable("emp").read()
    assert(df.count() == 4)
    assert(df.where($"id" === 2).head.getString(2) == "marketing")
  }

  test("batch executor: stop-on-first-failure, remaining skipped") {
    val lh = newLh()
    seed(lh)
    val results = lh.dml.executeBatch(Seq(
      BatchOp("insert", "emp", rows = Seq(Map("id" -> 10, "name" -> "Eve"))),
      BatchOp("update", "emp", filter = "BROKEN SYNTAX ===", set = Map("salary" -> 1)),
      BatchOp("delete", "emp", filter = "id = 10")))
    assert(results.map(_.status) == List("ok", "failed", "skipped"))
    // the failed batch did not roll back step 1 (documented non-goal)
    assert(lh.catalog.loadTable("emp").read().where($"id" === 10).count() == 1)
  }

  test("validation rules enforced in write path") {
    val lh = newLh()
    seed(lh)
    lh.validation.addRule(ValidationRule("r1", "emp", "not_null", List("name")))
    lh.validation.addRule(ValidationRule("r2", "emp", "unique", List("id")))
    lh.validation.addRule(ValidationRule("r3", "emp", "range", List("salary"),
      Map("min" -> "0", "max" -> "1000")))
    lh.validation.addRule(ValidationRule("r4", "emp", "expression", Nil,
      Map("sql" -> "dept IS NULL OR dept != 'forbidden'")))
    // null name rejected
    val e1 = intercept[ValidationException](
      lh.dml.insertRows("emp", Seq(Map("id" -> 5))))
    assert(e1.failures.exists(_.ruleType == "not_null"))
    // duplicate id vs existing rejected
    val e2 = intercept[ValidationException](
      lh.dml.insertRows("emp", Seq(Map("id" -> 1, "name" -> "X"))))
    assert(e2.failures.exists(_.ruleType == "unique"))
    // range violation
    val e3 = intercept[ValidationException](
      lh.dml.insertRows("emp", Seq(Map("id" -> 6, "name" -> "Y", "salary" -> -5))))
    assert(e3.failures.exists(_.ruleType == "range"))
    // expression violation
    val e4 = intercept[ValidationException](
      lh.dml.insertRows("emp", Seq(Map("id" -> 7, "name" -> "Z", "dept" -> "forbidden"))))
    assert(e4.failures.exists(_.ruleType == "expression"))
    // clean row passes
    assert(lh.dml.insertRows("emp", Seq(
      Map("id" -> 8, "name" -> "Ok", "salary" -> 50))) == 1)
  }

  test("update on a table whose column is literally named like the " +
      "internal match marker never clobbers that column") {
    val lh = newLh()
    // the CoW rewrite evaluates the condition once into a marker column;
    // withColumn REPLACES same-named columns, so the marker must uniquify
    lh.catalog.createTable("mk",
      Seq("id" -> "long", "__graft_upd_match" -> "string"), Nil, Map.empty)
    lh.dml.insertRows("mk", Seq(
      Map("id" -> 1, "__graft_upd_match" -> "keep1"),
      Map("id" -> 2, "__graft_upd_match" -> "keep2")))
    assert(lh.dml.update("mk", "id = 1", Map("id" -> 10)) == 1)
    val out = lh.catalog.loadTable("mk").read()
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq == Seq((2L, "keep2"), (10L, "keep1")), out.mkString(","))
  }
}
