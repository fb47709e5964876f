package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** SQL `MERGE INTO` over the DSv2 catalog ([[GraftMergeStrategy]]):
  * first-match clause ordering, all four clause kinds, cardinality
  * enforcement, validation + audit parity with the other write surfaces. */
class GraftMergeSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private lazy val catName = s"gm${System.nanoTime() % 100000}"
  private lazy val lh = {
    val wh = SparkFixture.tmpDir("graft-merge-")
    val l = graft.Lakehouse.open(spark, wh.toString)
    spark.conf.set(s"spark.sql.catalog.$catName",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catName.warehouse", wh.toString)
    graft.GraftExtensions.register(spark)
    l
  }

  test("MERGE: matched-update, matched-delete (first-match order), " +
      "not-matched insert, not-matched-by-source update — one snapshot, " +
      "counts in summary, audited") {
    lh.catalog.createTable("default.m1",
      Seq("id" -> "long", "v" -> "string", "amt" -> "long"), Nil, Map.empty)
    val t = lh.catalog.loadTable("default.m1")
    t.append(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (4L, "d", 40L)).toDF("id", "v", "amt"))
    Seq((2L, "B", 200L), (3L, "DEL", 0L), (9L, "NEW", 900L),
      (10L, "skip", 0L))
      .toDF("id", "v", "amt").createOrReplaceTempView("m1_src")
    spark.sql(
      s"""MERGE INTO $catName.default.m1 t USING m1_src s ON t.id = s.id
         |WHEN MATCHED AND s.v = 'DEL' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v, amt = s.amt + t.amt
         |WHEN NOT MATCHED AND s.v != 'skip' THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND t.id = 4 THEN UPDATE SET v = 'stale'
         |""".stripMargin)
    val got = t.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a", 10L), (2L, "B", 220L), (4L, "stale", 40L),
      (9L, "NEW", 900L)), s"got $got")
    // one snapshot; per-clause counts stamped into its summary
    val snap = t.currentSnapshot.get
    assert(t.rawLog.size == 2)
    assert(snap.summary.get("merge-updated").contains("2") && // id=2, id=4
      snap.summary.get("merge-deleted").contains("1") &&
      snap.summary.get("merge-inserted").contains("1") &&
      snap.summary.get("merge-carried").contains("1") && // id=1
      snap.summary.get("merge-ignored").contains("1"), // id=10 'skip'
      s"summary: ${snap.summary}")
    assert(lh.audit.entries(table = Some("default.m1"))
      .exists(_.operation == "merge"))
  }

  test("MERGE cardinality violation (two source rows match one target " +
      "row) errors and commits nothing") {
    lh.catalog.createTable("default.m2",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val t = lh.catalog.loadTable("default.m2")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    Seq((1L, "x"), (1L, "y")).toDF("id", "v")
      .createOrReplaceTempView("m2_src")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $catName.default.m2 t USING m2_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(c => String.valueOf(c.getMessage) +: msgs(c.getCause))
    assert(msgs(e).exists(_.contains("cardinality")), msgs(e).mkString("|"))
    assert(t.rawLog.size == 1 && t.read().count() == 1,
      "a failed merge must leave the table untouched")
  }

  test("MERGE enforces validation rules like every other write surface") {
    lh.catalog.createTable("default.m3",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val t = lh.catalog.loadTable("default.m3")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    lh.validation.addRule(graft.governance.ValidationRule(
      "m3-not-null-v", "default.m3", "not_null", List("v")))
    Seq((3L, null.asInstanceOf[String])).toDF("id", "v")
      .createOrReplaceTempView("m3_src")
    intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $catName.default.m3 t USING m3_src s ON t.id = s.id
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(t.read().count() == 2, "the rejected merge must commit nothing")
  }

  test("MERGE is the upsert special case: key-equality merge equals " +
      "Dml.upsert on the same input") {
    lh.catalog.createTable("default.m4",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    lh.catalog.createTable("default.m4b",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val init = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    lh.catalog.loadTable("default.m4").append(init)
    lh.catalog.loadTable("default.m4b").append(init)
    val inc = Seq((2L, "B2"), (4L, "D4")).toDF("id", "v")
    inc.createOrReplaceTempView("m4_src")
    spark.sql(
      s"""MERGE INTO $catName.default.m4 t USING m4_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    lh.dml.upsert("default.m4b", inc, Seq("id"))
    val a = lh.catalog.loadTable("default.m4").read().orderBy("id")
      .collect().toSeq
    val b = lh.catalog.loadTable("default.m4b").read().orderBy("id")
      .collect().toSeq
    assert(a == b && a.size == 4, s"merge=$a upsert=$b")
  }
}
