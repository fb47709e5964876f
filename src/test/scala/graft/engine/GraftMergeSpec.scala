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

  test("partial-CoW MERGE unique validation sees CARRIED-file rows: an " +
      "update duplicating a key that lives in a carried file must fail, " +
      "and a fresh-key update against the same layout must pass") {
    lh.catalog.createTable("default.m19",
      Seq("id" -> "long", "k" -> "string"), Nil, Map.empty)
    val t = lh.catalog.loadTable("default.m19")
    def rows(r: Range) = r.map(i => (i.toLong, s"k$i")).toDF("id", "k")
    t.append(rows(0 until 100).coalesce(1))      // carried file
    t.append(rows(1000 until 1100).coalesce(1))  // victim file
    lh.validation.addRule(graft.governance.ValidationRule(
      "m19-unique-k", "default.m19", "unique", List("k")))
    // dup: k5 lives in the carried file — the IN-list restriction makes
    // this a mergeFilesCow commit whose replacement never contains the
    // carried rows, so only a remainder-aware enforce can catch it
    Seq((1001L, "k5")).toDF("id", "k").createOrReplaceTempView("m19_dup")
    intercept[Exception] {
      spark.sql(s"""MERGE INTO $catName.default.m19 t USING m19_dup s
        |ON t.id = s.id WHEN MATCHED THEN UPDATE SET k = s.k""".stripMargin)
    }
    assert(t.read().where(col("k") === "k5").count() == 1,
      "the rejected merge must commit nothing")
    // control: a fresh key through the same partial-CoW path commits
    Seq((1001L, "fresh")).toDF("id", "k").createOrReplaceTempView("m19_ok")
    spark.sql(s"""MERGE INTO $catName.default.m19 t USING m19_ok s
      |ON t.id = s.id WHEN MATCHED THEN UPDATE SET k = s.k""".stripMargin)
    val t2 = lh.catalog.loadTable("default.m19")
    assert(t2.read().where(col("k") === "fresh").count() == 1)
    assert(t2.currentSnapshot.get.summary.get("carried-files")
      .exists(_.toInt > 0), "control merge must ride the partial-CoW path")
  }

  test("MoR MERGE unique validation sees the SURVIVING rows: an update " +
      "duplicating a key in an untouched row must fail; fresh key passes") {
    lh.catalog.createTable("default.m20",
      Seq("id" -> "long", "k" -> "string"), Nil,
      Map("write.merge.mode" -> "merge-on-read"))
    val t = lh.catalog.loadTable("default.m20")
    t.append((0 until 50).map(i => (i.toLong, s"k$i")).toDF("id", "k"))
    lh.validation.addRule(graft.governance.ValidationRule(
      "m20-unique-k", "default.m20", "unique", List("k")))
    Seq((40L, "k5")).toDF("id", "k").createOrReplaceTempView("m20_dup")
    intercept[Exception] {
      spark.sql(s"""MERGE INTO $catName.default.m20 t USING m20_dup s
        |ON t.id = s.id WHEN MATCHED THEN UPDATE SET k = s.k""".stripMargin)
    }
    assert(t.read().where(col("k") === "k5").count() == 1,
      "the rejected MoR merge must commit nothing")
    Seq((40L, "fresh")).toDF("id", "k").createOrReplaceTempView("m20_ok")
    spark.sql(s"""MERGE INTO $catName.default.m20 t USING m20_ok s
      |ON t.id = s.id WHEN MATCHED THEN UPDATE SET k = s.k""".stripMargin)
    val t2 = lh.catalog.loadTable("default.m20")
    assert(t2.read().where(col("k") === "fresh").count() == 1)
    assert(t2.currentSnapshot.get.deleteFiles.nonEmpty,
      "control merge must ride the MoR path")
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

  test("insert-only MERGE with a many-to-one source is VALID (dedup " +
      "ingest): no cardinality error, target row carried once") {
    lh.catalog.createTable("default.m5",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val t = lh.catalog.loadTable("default.m5")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // id=1 matches TWICE; id=7 is new (also duplicated in the source —
    // both unmatched copies insert, standard MERGE semantics)
    Seq((1L, "x"), (1L, "y"), (7L, "n1")).toDF("id", "v")
      .createOrReplaceTempView("m5_src")
    spark.sql(
      s"""MERGE INTO $catName.default.m5 t USING m5_src s ON t.id = s.id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = t.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (7L, "n1")), s"got $got")
    val snap = t.currentSnapshot.get
    assert(snap.summary.get("merge-carried").contains("2") && // 1 once, 2
      snap.summary.get("merge-inserted").contains("1"),
      s"summary: ${snap.summary}")
  }

  test("many-to-one match where no matched clause CONDITION applies " +
      "carries one copy; it errors only when a modifying clause applies") {
    lh.catalog.createTable("default.m6",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val t = lh.catalog.loadTable("default.m6")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    Seq((1L, "x"), (1L, "y")).toDF("id", "v")
      .createOrReplaceTempView("m6_src")
    // conditions false for every duplicated pair -> valid, carried once
    spark.sql(
      s"""MERGE INTO $catName.default.m6 t USING m6_src s ON t.id = s.id
         |WHEN MATCHED AND s.v = 'zzz' THEN UPDATE SET *""".stripMargin)
    assert(t.read().count() == 1)
    // a pair DOES satisfy the update condition -> ambiguous -> error
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $catName.default.m6 t USING m6_src s ON t.id = s.id
           |WHEN MATCHED AND s.v = 'x' THEN UPDATE SET *""".stripMargin)
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(c => String.valueOf(c.getMessage) +: msgs(c.getCause))
    assert(msgs(e).exists(_.contains("cardinality")), msgs(e).mkString("|"))
  }

  test("single-pass MERGE: the source is evaluated ONCE — audit counts " +
      "ride the write job as an Observation, not a second join pass") {
    lh.catalog.createTable("default.m7",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val t = lh.catalog.loadTable("default.m7")
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    val acc = spark.sparkContext.longAccumulator("m7_src_evals")
    val bump = udf((x: Long) => { acc.add(1L); x }).asNondeterministic()
    Seq((2L, "B"), (4L, "D")).toDF("id", "v")
      .withColumn("id", bump(col("id")))
      .createOrReplaceTempView("m7_src")
    spark.sql(
      s"""MERGE INTO $catName.default.m7 t USING m7_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(t.read().count() == 4)
    assert(acc.value == 2L,
      s"source rows evaluated ${acc.value} times for 2 rows — the merge " +
        "join must run exactly once")
  }

  test("assignment to a non-top-level key is refused loudly, not " +
      "silently dropped") {
    val seed = spark.sql(
      "SELECT 1L AS id, named_struct('city','x','zip','1') AS addr")
    lh.catalog.createTable("default.m8", seed.schema, Nil, Map.empty)
    val t = lh.catalog.loadTable("default.m8")
    t.append(seed)
    spark.sql("SELECT 1L AS id, 'y' AS city").createOrReplaceTempView("m8_src")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $catName.default.m8 t USING m8_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET addr.city = s.city""".stripMargin)
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(c => String.valueOf(c.getMessage) +: msgs(c.getCause))
    assert(msgs(e).exists(m => m.contains("top-level") ||
      m.contains("nested") || m.contains("INVALID") || m.contains("cannot")),
      msgs(e).mkString("|"))
    // the old value must survive — nothing committed
    val city = t.read().select("addr.city").head().getString(0)
    assert(city == "x" && t.rawLog.size == 1)
  }

  test("merge-on-read MERGE: one position-delete + append snapshot, " +
      "parent data files retained, counts stamped, result identical to " +
      "the CoW semantics") {
    lh.catalog.createTable("default.m9",
      Seq("id" -> "long", "v" -> "string", "amt" -> "long"), Nil,
      Map("write.merge.mode" -> "merge-on-read"))
    val t = lh.catalog.loadTable("default.m9")
    t.append(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "v", "amt"))
    t.append(Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "v", "amt"))
    Seq((2L, "B", 200L), (3L, "DEL", 0L), (9L, "NEW", 900L))
      .toDF("id", "v", "amt").createOrReplaceTempView("m9_src")
    spark.sql(
      s"""MERGE INTO $catName.default.m9 t USING m9_src s ON t.id = s.id
         |WHEN MATCHED AND s.v = 'DEL' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v, amt = s.amt + t.amt
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = t.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a", 10L), (2L, "B", 220L), (4L, "d", 40L),
      (9L, "NEW", 900L)), s"got $got")
    // ONE new snapshot, update-shaped: parent files all retained,
    // position deletes present, appended file(s) added
    val snaps = t.snapshots
    assert(snaps.size == 3, s"history: ${t.rawLog.map(_.operation)}")
    val (p, c) = (snaps(1), snaps(2))
    assert(c.operation == "update" && c.deleteFiles.nonEmpty &&
      p.files.map(_.path).toSet.subsetOf(c.files.map(_.path).toSet) &&
      c.files.size > p.files.size,
      s"op=${c.operation} del=${c.deleteFiles.size} " +
        s"files ${p.files.size}->${c.files.size}")
    assert(c.summary.get("merge-updated").contains("1") &&
      c.summary.get("merge-deleted").contains("1") &&
      c.summary.get("merge-inserted").contains("1") &&
      c.summary.get("merge-carried").contains("2"),
      s"summary: ${c.summary}")
    // time travel still sees the pre-merge state
    assert(t.readSnapshot(t.snapshotById(2L)).count() == 4)
  }

  private def analyzedScanFiles(
      qe: org.apache.spark.sql.execution.QueryExecution): Seq[String] =
    qe.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.toSeq
          case _ => Nil
        }
    }.flatten

  test("restricted MoR MERGE: the target read is source-key-pruned — " +
      "files that cannot hold a matching key are never scanned by any " +
      "job of the merge") {
    lh.catalog.createTable("default.m11",
      Seq("id" -> "long", "v" -> "string"), Nil,
      Map("write.merge.mode" -> "merge-on-read"))
    val t = lh.catalog.loadTable("default.m11")
    t.append((0L until 10L).map(i => (i, s"r$i")).toDF("id", "v"))
    t.append((1000L until 1010L).map(i => (i, s"r$i")).toDF("id", "v"))
    Seq((1L, "U1"), (3L, "U3")).toDF("id", "v")
      .createOrReplaceTempView("m11_src")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        analyzedScanFiles(qe).foreach(seen.add)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      spark.sql(
        s"""MERGE INTO $catName.default.m11 t USING m11_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
      // listener delivery is async — wait for the merge table's scans
      val deadline = System.nanoTime() + 10e9.toLong
      def tableScans() = {
        import scala.jdk.CollectionConverters._
        seen.asScala.toSeq.filter(_.contains("/m11/data/commit-"))
      }
      while (tableScans().isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      val scans = tableScans()
      assert(scans.nonEmpty, "expected the merge to scan the target table")
      assert(scans.forall(_.contains("commit-00001")),
        s"merge scanned files the source keys cannot touch: $scans")
    } finally spark.listenerManager.unregister(listener)
    val got = t.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got.take(4) == Seq((0L, "r0"), (1L, "U1"), (2L, "r2"), (3L, "U3"))
      && got.size == 20, s"got $got")
    assert(t.currentSnapshot.get.summary.get("merge-carried").contains("18"),
      s"summary: ${t.currentSnapshot.get.summary}")
  }

  test("restriction is a SUPERSET: extra non-equality conjuncts in the " +
      "merge condition still evaluate exactly") {
    lh.catalog.createTable("default.m12",
      Seq("id" -> "long", "amt" -> "long"), Nil,
      Map("write.merge.mode" -> "merge-on-read"))
    val t = lh.catalog.loadTable("default.m12")
    t.append(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "amt"))
    // id=1 matches key AND amt guard; id=2 matches key but NOT the
    // guard (20 >= 15 fails) -> must be carried, not updated
    Seq((1L, 100L), (2L, 15L), (9L, 900L)).toDF("id", "amt")
      .createOrReplaceTempView("m12_src")
    spark.sql(
      s"""MERGE INTO $catName.default.m12 t USING m12_src s
         |ON t.id = s.id AND t.amt < s.amt
         |WHEN MATCHED THEN UPDATE SET amt = s.amt
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = t.read().orderBy("id", "amt").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // id=2: the pair fails t.amt < s.amt, so the SOURCE row is unmatched
    // -> inserts (standard MERGE: the condition is part of the JOIN)
    assert(got == Seq((1L, 100L), (2L, 15L), (2L, 20L), (3L, 30L),
      (9L, 900L)), s"got $got")
  }

  test("cardinality violation still raises through the restricted path " +
      "and commits nothing") {
    lh.catalog.createTable("default.m13",
      Seq("id" -> "long", "v" -> "string"), Nil,
      Map("write.merge.mode" -> "merge-on-read"))
    val t = lh.catalog.loadTable("default.m13")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    Seq((1L, "x"), (1L, "y")).toDF("id", "v")
      .createOrReplaceTempView("m13_src")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $catName.default.m13 t USING m13_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(c => String.valueOf(c.getMessage) +: msgs(c.getCause))
    assert(msgs(e).exists(_.contains("cardinality")), msgs(e).mkString("|"))
    assert(t.rawLog.size == 1 && t.read().count() == 2,
      "a failed restricted merge must leave the table untouched")
  }

  test("NOT MATCHED BY SOURCE disables the restriction: every target " +
      "row is visible to the clause chain on a MoR table") {
    lh.catalog.createTable("default.m14",
      Seq("id" -> "long", "v" -> "string"), Nil,
      Map("write.merge.mode" -> "merge-on-read"))
    val t = lh.catalog.loadTable("default.m14")
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    Seq((2L, "B")).toDF("id", "v").createOrReplaceTempView("m14_src")
    spark.sql(
      s"""MERGE INTO $catName.default.m14 t USING m14_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale'""".stripMargin)
    val got = t.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "stale"), (2L, "B"), (3L, "stale")), s"got $got")
    val c = t.currentSnapshot.get
    assert(c.operation == "update" && c.deleteFiles.nonEmpty,
      "NMBS merge on a MoR table must still land as position-delete+append")
  }

  test("readWithLineagePruned skips files whose bounds exclude the " +
      "filter and keeps exact rows + lineage") {
    lh.catalog.createTable("default.m15",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val t = lh.catalog.loadTable("default.m15")
    t.append((0L until 10L).map(i => (i, s"r$i")).toDF("id", "v"))
    t.append((1000L until 1010L).map(i => (i, s"r$i")).toDF("id", "v"))
    val pruned = t.readWithLineagePruned(Some(col("id") < 5))
    val files = pruned.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.toSeq
          case _ => Nil
        }
    }.flatten.filter(_.contains("/data/commit-"))
    assert(files.nonEmpty && files.forall(_.contains("commit-00001")),
      s"pruned read scanned: $files")
    val rows = pruned.collect()
    assert(rows.length == 5 &&
      rows.forall(r => !r.isNullAt(r.fieldIndex(
        graft.core.IceTable.LineageFileCol))))
  }

  test("CoW restriction split is exact: null-keyed target rows are " +
      "carried (never matched, never dropped), and the result equals " +
      "standard MERGE semantics") {
    lh.catalog.createTable("default.m16",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val t = lh.catalog.loadTable("default.m16")
    t.append(Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "nullkey"),
      (java.lang.Long.valueOf(3L), "c")).toDF("id", "v"))
    Seq((1L, "A"), (9L, "N")).toDF("id", "v")
      .createOrReplaceTempView("m16_src")
    spark.sql(
      s"""MERGE INTO $catName.default.m16 t USING m16_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = t.read().collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1)))
      .toSet
    assert(got == Set((1L, "A"), (-1L, "nullkey"), (3L, "c"), (9L, "N")),
      s"got $got")
    val sm = t.currentSnapshot.get.summary
    assert(sm.get("merge-updated").contains("1") &&
      sm.get("merge-carried").contains("2") &&
      sm.get("merge-inserted").contains("1"), s"summary: $sm")
  }

  test("merge-on-read MERGE with a delete-only clause set works (no " +
      "appended content)") {
    lh.catalog.createTable("default.m10",
      Seq("id" -> "long", "v" -> "string"), Nil,
      Map("write.merge.mode" -> "merge-on-read"))
    val t = lh.catalog.loadTable("default.m10")
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    Seq(Tuple1(2L)).toDF("id").createOrReplaceTempView("m10_src")
    spark.sql(
      s"""MERGE INTO $catName.default.m10 t USING m10_src s ON t.id = s.id
         |WHEN MATCHED THEN DELETE""".stripMargin)
    val got = t.read().orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L), s"got $got")
    val c = t.currentSnapshot.get
    assert(c.operation == "update" && c.deleteFiles.nonEmpty)
  }

  test("FILE-LEVEL partial CoW MERGE: the untouched file is carried by " +
      "REFERENCE (never read, never rewritten); counts and rows exact") {
    lh.catalog.createTable("default.m17",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val t = lh.catalog.loadTable("default.m17")
    t.append((0L until 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t.append((1000L until 1100L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1))
    val loPath = t.currentSnapshot.get.files.minBy(_.path).path
    val parentPaths = t.currentSnapshot.get.files.map(_.path).toSet
    Seq((1005L, "UPD"), (1006L, "DEL"), (5000L, "NEW")).toDF("id", "v")
      .createOrReplaceTempView("m17_src")
    // track every table file any job under the merge plans to read
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        analyzedScanFiles(qe).foreach(seen.add)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      spark.sql(
        s"""MERGE INTO $catName.default.m17 t USING m17_src s ON t.id = s.id
           |WHEN MATCHED AND s.v = 'DEL' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET v = s.v
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      // listener delivery is async — wait for the merge table's scans
      val deadline = System.nanoTime() + 10e9.toLong
      def tableScans() = {
        import scala.jdk.CollectionConverters._
        seen.asScala.toSeq.filter(_.contains("/m17/data/commit-"))
      }
      while (tableScans().isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      val scans = tableScans()
      assert(scans.nonEmpty, "expected the merge to scan the target table")
      assert(scans.forall(_.contains("commit-00002")),
        s"the 0-99 file must never be read by a partial CoW merge: $scans")
    } finally spark.listenerManager.unregister(listener)
    val after = t.currentSnapshot.get
    assert(after.files.map(_.path).toSet.intersect(parentPaths) == Set(loPath),
      "the untouched file must carry by REFERENCE")
    assert(after.summary.get("rewritten-files").contains("1") &&
      after.summary.get("carried-files").contains("1") &&
      after.summary.get("merge-updated").contains("1") &&
      after.summary.get("merge-deleted").contains("1") &&
      after.summary.get("merge-inserted").contains("1") &&
      after.summary.get("merge-carried").contains("198"),
      s"summary: ${after.summary}")
    val rows = t.read().select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows.size == 200 && rows(1005L) == "UPD" &&
      !rows.contains(1006L) && rows(5000L) == "NEW" && rows(7L) == "v7")
  }

  test("partial CoW MERGE with NO matching file (insert-only against " +
      "disjoint keys): every file carries by reference, inserts land") {
    lh.catalog.createTable("default.m18",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val t = lh.catalog.loadTable("default.m18")
    t.append((0L until 50L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    val parentPaths = t.currentSnapshot.get.files.map(_.path).toSet
    Seq((9000L, "NEW1"), (9001L, "NEW2")).toDF("id", "v")
      .createOrReplaceTempView("m18_src")
    spark.sql(
      s"""MERGE INTO $catName.default.m18 t USING m18_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = t.currentSnapshot.get
    assert(parentPaths.subsetOf(after.files.map(_.path).toSet),
      "all parent files must carry by reference")
    assert(after.summary.get("rewritten-files").contains("0") &&
      after.summary.get("merge-inserted").contains("2") &&
      after.summary.get("merge-carried").contains("50"),
      s"summary: ${after.summary}")
    assert(t.read().count() == 52)
  }
}
