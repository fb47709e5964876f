package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** SQL `UPDATE` and subquery `DELETE`/`UPDATE` over the DSv2 catalog
  * ([[GraftRowLevelStrategy]]): plain and subquery conditions, both
  * write modes, partial-file commit shapes, simultaneous SET semantics,
  * NULL three-valued handling, validation + audit parity, and refusals. */
class GraftRowLevelSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private lazy val catName = s"gr${System.nanoTime() % 100000}"
  private lazy val lh = {
    val wh = SparkFixture.tmpDir("graft-rowlevel-")
    val l = graft.Lakehouse.open(spark, wh.toString)
    spark.conf.set(s"spark.sql.catalog.$catName",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catName.warehouse", wh.toString)
    graft.GraftExtensions.register(spark)
    l
  }

  private def df(ids: Range) =
    ids.map(i => (i.toLong, s"row$i", i.toLong * 10)).toDF("id", "name", "amt")

  /** Two single-file commits with disjoint id ranges so bounds make each
    * file independently prunable/discoverable. */
  private def seeded(name: String, props: Map[String, String] = Map.empty) = {
    lh.catalog.createTable(name,
      Seq("id" -> "long", "name" -> "string", "amt" -> "long"), Nil, props)
    val t = lh.catalog.loadTable(name)
    t.append(df(0 until 100).coalesce(1))
    t.append(df(1000 until 1100).coalesce(1))
    t
  }

  test("plain SQL UPDATE (CoW): expression SET sees old row, partial " +
      "rewrite touches only the matching file, audited") {
    val t = seeded("default.u1")
    val paths = t.currentSnapshot.get.files.map(_.path).toSet
    spark.sql(s"UPDATE $catName.default.u1 " +
      "SET name = concat(name, '!'), amt = amt + 1 WHERE id >= 1050")
    val t2 = lh.catalog.loadTable("default.u1")
    val after = t2.currentSnapshot.get
    assert(after.summary("matched-rows") == "50")
    assert(after.summary("rewritten-files") == "1")
    assert(after.summary("carried-files") == "1")
    assert(after.files.map(_.path).toSet.intersect(paths).size == 1)
    val got = t2.read().where(col("id") === 1050L).head()
    assert(got.getString(1) == "row1050!" && got.getLong(2) == 10501L)
    assert(t2.read().where(col("name").endsWith("!")).count() == 50)
    assert(t2.read().count() == 200)
    val audits = lh.audit.entries(Some("default.u1"))
    assert(audits.exists(a => a.operation == "update" &&
      a.details.get("mode").contains("copy-on-write")))
  }

  test("SQL UPDATE all rows (no WHERE) and cross-referencing SET is " +
      "simultaneous (standard SQL), not sequential") {
    lh.catalog.createTable("default.u2",
      Seq("a" -> "long", "b" -> "long"), Nil, Map.empty)
    val t = lh.catalog.loadTable("default.u2")
    t.append(Seq((1L, 100L), (2L, 200L)).toDF("a", "b"))
    spark.sql(s"UPDATE $catName.default.u2 SET a = b, b = a")
    val got = lh.catalog.loadTable("default.u2").read()
      .orderBy("a").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((100L, 1L), (200L, 2L)), s"got $got")
  }

  test("SQL UPDATE (MoR): position-delete + append, no data file " +
      "rewritten; uncorrelated IN-subquery condition") {
    val t = seeded("default.u3", Map("write.update.mode" -> "merge-on-read"))
    val paths = t.currentSnapshot.get.files.map(_.path).toSet
    Seq(5L, 6L, 2000L).toDF("id").createOrReplaceTempView("u3_keys")
    spark.sql(s"UPDATE $catName.default.u3 SET name = 'hit' " +
      "WHERE id IN (SELECT id FROM u3_keys)")
    val t2 = lh.catalog.loadTable("default.u3")
    val after = t2.currentSnapshot.get
    // every parent data file survives untouched; matches land as
    // delete-file + appended copies
    assert(paths.subsetOf(after.files.map(_.path).toSet))
    assert(after.deleteFiles.nonEmpty)
    assert(after.summary("updated-rows") == "2")
    assert(t2.read().where(col("name") === "hit")
      .select("id").as[Long].collect().sorted.toSeq == Seq(5L, 6L))
    assert(t2.read().count() == 200)
  }

  test("subquery DELETE (CoW): runtime victim discovery rewrites only " +
      "the file holding matches even though literals prune nothing") {
    val t = seeded("default.d1")
    val paths = t.currentSnapshot.get.files.map(_.path).toSet
    // keys live ONLY in the second file — but as a subquery, static
    // manifest pruning can't see that
    Seq(1050L, 1060L).toDF("id").createOrReplaceTempView("d1_keys")
    spark.sql(s"DELETE FROM $catName.default.d1 " +
      "WHERE id IN (SELECT id FROM d1_keys)")
    val t2 = lh.catalog.loadTable("default.d1")
    val after = t2.currentSnapshot.get
    assert(after.summary("matched-rows") == "2")
    assert(after.summary("rewritten-files") == "1")
    assert(after.summary("carried-files") == "1")
    assert(after.files.map(_.path).toSet.intersect(paths).size == 1)
    assert(t2.read().count() == 198)
    assert(t2.read().where(col("id").isin(1050L, 1060L)).count() == 0)
    val audits = lh.audit.entries(Some("default.d1"))
    assert(audits.exists(a => a.operation == "delete" &&
      a.details.get("mode").contains("copy-on-write")))
  }

  test("correlated EXISTS DELETE (MoR): O(touched) position delete, " +
      "data files untouched") {
    val t = seeded("default.d2", Map("write.delete.mode" -> "merge-on-read"))
    val paths = t.currentSnapshot.get.files.map(_.path).toSet
    Seq((3L, "x"), (1001L, "y"), (5000L, "z")).toDF("k", "tag")
      .createOrReplaceTempView("d2_src")
    spark.sql(s"DELETE FROM $catName.default.d2 t WHERE EXISTS " +
      "(SELECT 1 FROM d2_src s WHERE s.k = t.id)")
    val t2 = lh.catalog.loadTable("default.d2")
    val after = t2.currentSnapshot.get
    assert(after.files.map(_.path).toSet == paths)
    assert(after.deleteFiles.nonEmpty)
    assert(after.summary("deleted-rows") == "2")
    assert(t2.read().count() == 198)
    assert(t2.read().where(col("id").isin(3L, 1001L)).count() == 0)
  }

  test("non-pushable scalar DELETE condition (previously refused) works; " +
      "NULL conditions keep rows (three-valued)") {
    lh.catalog.createTable("default.d3",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val t = lh.catalog.loadTable("default.d3")
    t.append(Seq((1L, "aa"), (2L, "bbbb"), (3L, null))
      .toDF("id", "v"))
    // length(v) can't push as a sources.Filter; length(null) is NULL →
    // row 3 is KEPT
    spark.sql(s"DELETE FROM $catName.default.d3 WHERE length(v) > 2")
    val got = lh.catalog.loadTable("default.d3").read()
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 3L), s"got $got")
  }

  test("UPDATE with NULL-yielding condition leaves those rows untouched") {
    lh.catalog.createTable("default.u4",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val t = lh.catalog.loadTable("default.u4")
    t.append(Seq((1L, "a"), (2L, null), (3L, "c")).toDF("id", "v"))
    spark.sql(s"UPDATE $catName.default.u4 SET v = 'X' WHERE v < 'b'")
    val got = lh.catalog.loadTable("default.u4").read().orderBy("id")
      .collect().map(r => Option(r.getString(1))).toSeq
    assert(got == Seq(Some("X"), None, Some("c")), s"got $got")
  }

  test("uncorrelated scalar subquery in SET works; correlated scalar " +
      "subquery in SET executes via analysis-time capture (CoW)") {
    lh.catalog.createTable("default.u5",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val t = lh.catalog.loadTable("default.u5")
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    Seq((1L, "ONE"), (2L, "TWO")).toDF("k", "label")
      .createOrReplaceTempView("u5_lab")
    spark.sql(s"UPDATE $catName.default.u5 SET v = " +
      "(SELECT max(label) FROM u5_lab) WHERE id = 1")
    val got = lh.catalog.loadTable("default.u5").read().orderBy("id")
      .collect().map(_.getString(1)).toSeq
    assert(got == Seq("TWO", "b", "c"), s"got $got")
    // correlated: matched rows take the per-key aggregate; a matched row
    // with NO subquery hit takes NULL (standard scalar-subquery
    // semantics); unmatched rows keep their value
    spark.sql(s"UPDATE $catName.default.u5 t SET v = " +
      "(SELECT max(label) FROM u5_lab s WHERE s.k = t.id) WHERE id >= 2")
    val got2 = lh.catalog.loadTable("default.u5").read().orderBy("id")
      .collect().map(r => Option(r.getString(1))).toSeq
    assert(got2 == Seq(Some("TWO"), Some("TWO"), None), s"got $got2")
  }

  test("correlated scalar subquery in SET (MoR): position-delete + " +
      "append, simultaneous with a cross-referencing plain SET") {
    lh.catalog.createTable("default.u10",
      Seq("id" -> "long", "v" -> "string", "amt" -> "long"), Nil,
      Map("write.update.mode" -> "merge-on-read"))
    val t = lh.catalog.loadTable("default.u10")
    t.append(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "v", "amt"))
    val paths = t.currentSnapshot.get.files.map(_.path).toSet
    Seq((1L, 100L), (1L, 7L), (3L, 5L)).toDF("k", "x")
      .createOrReplaceTempView("u10_src")
    // v reads the PRE-update amt (simultaneous-SET contract) while amt
    // takes the correlated aggregate
    spark.sql(s"UPDATE $catName.default.u10 t SET " +
      "amt = (SELECT sum(x) FROM u10_src s WHERE s.k = t.id), " +
      "v = concat(v, '-', cast(amt AS string)) WHERE id <> 2")
    val t2 = lh.catalog.loadTable("default.u10")
    assert(paths.subsetOf(t2.currentSnapshot.get.files.map(_.path).toSet),
      "MoR correlated UPDATE must keep every parent data file")
    assert(t2.currentSnapshot.get.deleteFiles.nonEmpty)
    val got = t2.read().orderBy("id").collect()
      .map(r => (r.getString(1), Option(r.get(2)).map(_.toString))).toSeq
    assert(got == Seq(("a-10", Some("107")), ("b", Some("20")),
      ("c-30", Some("5"))), s"got $got")
  }

  test("validation rules fire on SQL UPDATE exactly like the API path") {
    lh.catalog.createTable("default.u6",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val t = lh.catalog.loadTable("default.u6")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    lh.validation.addRule(graft.governance.ValidationRule(
      "u6-not-null-v", "default.u6", "not_null", List("v")))
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $catName.default.u6 SET v = NULL WHERE id = 1")
    }
    assert(e.getMessage != null)
    // no commit happened
    assert(lh.catalog.loadTable("default.u6").read()
      .where(col("v").isNull).count() == 0)
  }

  test("refusals: nested SET key, nondeterministic condition, " +
      "non-graft target unchanged") {
    lh.catalog.createTable("default.u7",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    lh.catalog.loadTable("default.u7")
      .append(Seq((1L, "a")).toDF("id", "v"))
    // Spark's own analyzer refuses nondeterministic DML conditions before
    // the strategy is consulted; the exec keeps a belt require regardless
    val e1 = intercept[Exception] {
      spark.sql(s"UPDATE $catName.default.u7 SET v = 'x' WHERE rand() < 2")
    }
    assert(e1.getMessage.contains("NON_DETERMINISTIC"),
      s"got: ${e1.getMessage}")
    // plain temp view is not a graft table: Spark's own unsupported error
    Seq((1L, "a")).toDF("id", "v").createOrReplaceTempView("u7_view")
    intercept[Exception] {
      spark.sql("UPDATE u7_view SET v = 'x' WHERE id = 1")
    }
    ()
  }

  test("nondeterministic subquery NESTED inside another subquery's plan " +
      "is refused at any depth") {
    // rand() in a Filter is legal to Spark's analyzer (Filter admits
    // nondeterminism), and Expression.deterministic never inspects a
    // subquery's inner plan — so only the strategy's recursive check
    // stands between this statement and a nondeterministic victim scan
    lh.catalog.createTable("default.u9",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    lh.catalog.loadTable("default.u9")
      .append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM $catName.default.u9 WHERE id IN (" +
        s"SELECT id FROM $catName.default.u9 WHERE id IN (" +
        s"SELECT id FROM $catName.default.u9 WHERE rand() < 2))")
    }
    assert(e.getMessage.contains("nondeterministic") ||
      e.getMessage.contains("NON_DETERMINISTIC"), s"got: ${e.getMessage}")
    assert(lh.catalog.loadTable("default.u9").read().count() == 2,
      "refused statement must not have deleted anything")
  }

  test("SQL UPDATE over a transform-partitioned table: partition-dir " +
      "pruning feeds victim discovery, only matching-partition files " +
      "rewrite") {
    lh.catalog.createTable("default.u8",
      Seq("id" -> "long", "day" -> "date", "v" -> "string"),
      Seq("day(day)"), Map.empty)
    val t = lh.catalog.loadTable("default.u8")
    val rows = (0 until 90).map(i => (i.toLong,
      java.sql.Date.valueOf(s"2024-02-0${1 + i % 3}"), s"v$i"))
      .toDF("id", "day", "v")
    t.append(rows)
    val before = t.currentSnapshot.get.files.map(_.path).toSet
    assert(before.size >= 3, s"expected one file per day dir, got $before")
    spark.sql(s"UPDATE $catName.default.u8 SET v = 'D1' " +
      "WHERE day = DATE '2024-02-01'")
    val t2 = lh.catalog.loadTable("default.u8")
    val after = t2.currentSnapshot.get
    assert(after.summary("carried-files").toInt > 0 &&
      after.summary("rewritten-files").toInt >= 1,
      s"only the matching day partition may rewrite: ${after.summary}")
    // every non-matching day file carries BY REFERENCE (same path)
    val otherDays = before.filterNot(_.contains("_p_day_day=2024-02-01"))
    assert(otherDays.nonEmpty &&
      otherDays.subsetOf(after.files.map(_.path).toSet),
      "non-matching day partitions must carry by reference")
    assert(t2.read().where(col("v") === "D1").count() == 30)
    assert(t2.read().count() == 90)
  }

  test("plain pushable SQL DELETE still routes through SupportsDelete " +
      "(strategy claims only the refused shapes) and stays correct") {
    val t = seeded("default.d4")
    spark.sql(s"DELETE FROM $catName.default.d4 WHERE id >= 1050")
    val t2 = lh.catalog.loadTable("default.d4")
    assert(t2.read().count() == 150)
    // partial CoW shape preserved by the existing path
    assert(t2.currentSnapshot.get.summary("rewritten-files") == "1")
  }

  test("MERGE-style mixed condition: literal conjunct prunes candidates, " +
      "subquery conjunct restricts within them") {
    val t = seeded("default.d5")
    Seq(10L, 1010L).toDF("id").createOrReplaceTempView("d5_keys")
    // id < 100 statically prunes to the first file; the subquery picks
    // one row inside it
    spark.sql(s"DELETE FROM $catName.default.d5 WHERE id < 100 " +
      "AND id IN (SELECT id FROM d5_keys)")
    val t2 = lh.catalog.loadTable("default.d5")
    val after = t2.currentSnapshot.get
    assert(after.summary("matched-rows") == "1")
    assert(after.summary("rewritten-files") == "1")
    assert(t2.read().count() == 199)
    assert(t2.read().where(col("id") === 10L).count() == 0)
    assert(t2.read().where(col("id") === 1010L).count() == 1)
  }
}
