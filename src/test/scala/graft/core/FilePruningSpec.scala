package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class FilePruningSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def newCatalog() =
    Catalog.open(spark, SparkFixture.tmpDir("graft-wh-").toString)

  test("commit collects per-file column bounds keyed by field-id") {
    val cat = newCatalog()
    cat.createTable("default.b", Seq("v" -> "long", "s" -> "string"), Nil, Map.empty)
    val t = cat.loadTable("default.b")
    t.append(Seq((10L, "apple"), (20L, "pear")).toDF("v", "s").coalesce(1))
    val f = t.currentSnapshot.get.files.head
    val ids = t.schema.fields.flatMap(TableMeta.fieldId).map(_.toString)
    assert(ids.forall(f.bounds.contains), f.bounds.keySet.toString)
    val vB = f.bounds(TableMeta.fieldId(t.schema("v")).get.toString)
    assert(vB.min.contains("10") && vB.max.contains("20") && vB.nulls.contains(0L))
    val sB = f.bounds(TableMeta.fieldId(t.schema("s")).get.toString)
    assert(sB.min.contains("apple") && sB.max.contains("pear"))
  }

  test("range predicate on a z-ordered table reads strictly fewer files, same result") {
    val cat = newCatalog()
    cat.createTable("default.z", Seq("x" -> "long", "y" -> "long"), Nil, Map.empty)
    val t = cat.loadTable("default.z")
    val df = spark.range(0, 4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    t.overwrite(graft.operators.ZOrder.clusterByZ(df, "x", "y", numPartitions = 8))
    val total = t.currentSnapshot.get.files.size
    assert(total == 8, s"expected 8 z-clustered files, got $total")
    // a corner of the (x, y) plane lives in few z-runs -> few files
    val filter = col("x") < 8 && col("y") < 8
    val (kept, all) = t.pruneStats(filter)
    assert(all == total && kept < total && kept >= 1,
      s"z-ordered range predicate must prune files: kept $kept of $all")
    val got = t.prunedRead(filter).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = t.read().where(filter).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected && got.size == 64)
  }

  test("IN-list predicates prune by bounds: a file is kept only when " +
      "some element falls inside [min, max]") {
    val cat = newCatalog()
    cat.createTable("default.in1",
      Seq("v" -> "long", "s" -> "string"), Nil, Map.empty)
    val t = cat.loadTable("default.in1")
    t.append((0L until 10L).map(i => (i, s"a$i")).toDF("v", "s").coalesce(1))
    t.append((100L until 110L).map(i => (i, s"b$i")).toDF("v", "s").coalesce(1))
    t.append((1000L until 1010L).map(i => (i, s"c$i")).toDF("v", "s").coalesce(1))
    // elements hit file 1 and file 3; 500 hits nothing
    val filter = col("v").isin(3L, 1005L, 500L)
    val (kept, all) = t.pruneStats(filter)
    assert((kept, all) == ((2, 3)), s"IN bounds prune: kept $kept of $all")
    val got = t.prunedRead(filter).collect().map(_.getLong(0)).toSet
    assert(got == Set(3L, 1005L))
    // string IN-lists prune too
    val (ks, as_) = t.pruneStats(col("s").isin("b101", "zzz"))
    assert((ks, as_) == ((1, 3)), s"string IN prune: kept $ks of $as_")
    // an expr()-spelled SQL IN reaches the same conjunct path
    val (ke, _) = t.pruneStats(expr("v IN (3, 1005, 500)"))
    assert(ke == 2, s"SQL IN prune: kept $ke")
    // a null element makes IN three-valued (never TRUE for non-matches,
    // NULL otherwise) — it must not extract, and must not prune
    val (kn, an) = t.pruneStats(expr("v IN (3, NULL)"))
    assert(kn == an, "a NULL-bearing IN-list must never prune")
  }

  test("bounds survive column rename (field-id keyed, not name keyed)") {
    val cat = newCatalog()
    cat.createTable("default.r", Seq("v" -> "long"), Nil, Map.empty)
    val t = cat.loadTable("default.r")
    t.append(Seq(1L, 2L, 3L).toDF("v").coalesce(1))
    t.append(Seq(100L, 200L).toDF("v").coalesce(1))
    t.renameColumn("v", "w")
    val t2 = cat.loadTable("default.r")
    val (kept, all) = t2.pruneStats(col("w") > 50L)
    assert((kept, all) == ((1, 2)), s"rename must not orphan bounds: $kept/$all")
    assert(t2.prunedRead(col("w") > 50L).count() == 2)
  }

  test("string bounds compare by UTF-8 bytes, not UTF-16 code units") {
    val cat = newCatalog()
    cat.createTable("default.u", Seq("s" -> "string"), Nil, Map.empty)
    val t = cat.loadTable("default.u")
    t.append(Seq("😀").toDF("s").coalesce(1)) // U+1F600, UTF-8 F0 9F 98 80
    t.append(Seq("apple").toDF("s").coalesce(1))
    // U+FF5E: UTF-8 EF BD 9E sorts BELOW the emoji; UTF-16 0xFF5E sorts
    // ABOVE its surrogate 0xD83D — a code-unit comparison would wrongly
    // prune the emoji file here
    val filter = col("s") >= "～"
    val (kept, all) = t.pruneStats(filter)
    assert((kept, all) == ((1, 2)), s"UTF-8 ordering violated: $kept/$all")
    assert(t.prunedRead(filter).count() == 1)
  }

  test("date-typed bounds prune by ISO string literals") {
    val cat = newCatalog()
    cat.createTable("default.d", Seq("day" -> "date", "v" -> "long"), Nil, Map.empty)
    val t = cat.loadTable("default.d")
    t.append(Seq(("2025-11-01", 1L), ("2025-11-20", 2L)).toDF("day", "v")
      .withColumn("day", to_date(col("day"))).coalesce(1))
    t.append(Seq(("2025-12-01", 3L), ("2025-12-20", 4L)).toDF("day", "v")
      .withColumn("day", to_date(col("day"))).coalesce(1))
    val filter = col("day") >= "2025-12-01"
    assert(t.pruneStats(filter) == ((1, 2)))
    assert(t.prunedRead(filter).count() == 2)
  }

  test("null-count bounds: isNull / isNotNull prune, all-null file fails comparisons") {
    val cat = newCatalog()
    cat.createTable("default.n", Seq("v" -> "long"), Nil, Map.empty)
    val t = cat.loadTable("default.n")
    t.append(Seq(Some(1L), Some(2L)).toDF("v").coalesce(1))
    t.append(spark.range(3).select(lit(null).cast("long").as("v")).coalesce(1))
    assert(t.pruneStats(col("v").isNull) == ((1, 2)))
    assert(t.pruneStats(col("v").isNotNull) == ((1, 2)))
    // a comparison can never match the all-null file even though it has
    // no min/max to test against
    assert(t.pruneStats(col("v") > 0L) == ((1, 2)))
    assert(t.prunedRead(col("v").isNotNull).count() == 2)
  }

  test("unsupported predicates never prune and stay exact") {
    val cat = newCatalog()
    cat.createTable("default.x", Seq("v" -> "long", "s" -> "string"), Nil, Map.empty)
    val t = cat.loadTable("default.x")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("v", "s").coalesce(1))
    t.append(Seq((10L, "c"), (20L, "d")).toDF("v", "s").coalesce(1))
    // disjunction, function-of-column, non-literal comparand: all opaque
    for (f <- Seq(col("v") === 1L || col("v") === 20L,
        length(col("s")) > 0, col("v") > col("v") - 1)) {
      assert(t.pruneStats(f)._1 == 2, s"opaque predicate must keep all files: $f")
      assert(t.prunedRead(f).collect().toSet == t.read().where(f).collect().toSet)
    }
    // mixed AND: the prunable conjunct prunes, the opaque one rides along
    val mixed = col("v") > 5L && length(col("s")) > 0
    assert(t.pruneStats(mixed) == ((1, 2)))
    assert(t.prunedRead(mixed).count() == 2)
  }

  test("SQL-string predicates (expr / CLI --where) prune too, including typed literals") {
    val cat = newCatalog()
    cat.createTable("default.sq",
      Seq("v" -> "long", "ts" -> "timestamp", "day" -> "date"), Nil, Map.empty)
    val t = cat.loadTable("default.sq")
    def df(vs: Seq[Long], d: String) = vs.toDF("v")
      .withColumn("ts", to_timestamp(lit(s"$d 12:00:00")))
      .withColumn("day", to_date(lit(d)))
    t.append(df(Seq(1L, 5L), "2025-01-15").coalesce(1))
    t.append(df(Seq(100L, 200L), "2025-06-15").coalesce(1))
    assert(t.pruneStats(expr("v > 50")) == ((1, 2)))
    assert(t.pruneStats(expr("v > 50 AND v < 150")) == ((1, 2)))
    assert(t.pruneStats(expr("ts >= timestamp'2025-03-01 00:00:00'")) == ((1, 2)))
    assert(t.pruneStats(expr("day < date'2025-03-01'")) == ((1, 2)))
    // a bare numeric literal must NOT be misread as date/timestamp internals
    assert(t.pruneStats(expr("v = 5")) == ((1, 2)))
    assert(t.prunedRead(expr("v > 50")).count() == 2)
    // exportTable --where rides the same pruner and stays exact
    val lh = graft.Lakehouse.open(spark, t.dir.getParent.getParent.toString)
    val out = SparkFixture.tmpDir("graft-exp-").toString + "/x"
    val n = lh.importExport.exportTable("default.sq", out, "parquet", Some("v > 50"))
    assert(n == 2 && spark.read.parquet(out).count() == 2)
  }

  test("-0.0 bounds never prune a 0.0 predicate (SQL treats them equal)") {
    val cat = newCatalog()
    cat.createTable("default.fz", Seq("v" -> "double"), Nil, Map.empty)
    val t = cat.loadTable("default.fz")
    t.append(Seq(-0.0).toDF("v").coalesce(1))
    t.append(Seq(42.0).toDF("v").coalesce(1))
    val f = col("v") === 0.0
    // the -0.0 file must survive pruning and its row must match
    assert(t.pruneStats(f)._1 >= 1)
    assert(t.prunedRead(f).count() == t.read().where(f).count())
    assert(t.prunedRead(f).count() == 1)
  }

  test("bare-string timestamp literals never prune (session-timezone dependent)") {
    val cat = newCatalog()
    cat.createTable("default.tz", Seq("ts" -> "timestamp"), Nil, Map.empty)
    val t = cat.loadTable("default.tz")
    t.append(spark.sql("SELECT timestamp'2025-01-15 12:00:00' AS ts").coalesce(1))
    t.append(spark.sql("SELECT timestamp'2025-06-15 12:00:00' AS ts").coalesce(1))
    // a string literal casts to timestamp in the SESSION zone — pruning on
    // a UTC parse could drop matching files in non-UTC sessions, so it
    // must not prune at all; the typed literal still does
    assert(t.pruneStats(expr("ts >= '2025-03-01'")) == ((2, 2)))
    assert(t.pruneStats(col("ts") >= "2025-03-01") == ((2, 2)))
    assert(t.pruneStats(expr("ts >= timestamp'2025-03-01 00:00:00'")) == ((1, 2)))
    assert(t.prunedRead(col("ts") >= "2025-03-01").count() == 1)
  }

  test("partition-dir pruning: month transform on a date column, null dirs, bucket prunes ONLY on equality") {
    val cat = newCatalog()
    cat.createTable("default.pm",
      Seq("day" -> "date", "v" -> "long", "k" -> "string"),
      List("month(day)", "bucket(4,k)"), Map.empty)
    val t = cat.loadTable("default.pm")
    val rows = Seq(("2025-01-10", 1L, "a"), ("2025-02-20", 2L, "b"),
      ("2025-06-05", 3L, "c"), (null, 4L, "d"))
    t.append(rows.toDF("day", "v", "k").withColumn("day", to_date(col("day"))))
    val total = t.currentSnapshot.get.files.size
    assert(total >= 4, s"expected one file per month dir + null dir, got $total")
    // range predicate on the SOURCE column prunes by month dir
    val f1 = col("day") >= "2025-03-01"
    val (k1, _) = t.pruneStats(f1)
    assert(k1 < total && k1 >= 1, s"month-dir prune failed: $k1/$total")
    assert(t.prunedRead(f1).collect().map(_.getLong(1)).toSeq == Seq(3L))
    // mid-month boundary keeps the containing month
    assert(t.prunedRead(col("day") > "2025-01-15").collect()
      .map(_.getLong(1)).sorted.toSeq == Seq(2L, 3L))
    // null-dir handling: isNull keeps only the null dir, comparisons drop it
    assert(t.prunedRead(col("day").isNull).collect().map(_.getLong(1)).toSeq == Seq(4L))
    val (kNotNull, _) = t.pruneStats(col("day").isNotNull)
    assert(kNotNull == total - 1)
    // the bucket DIR layer prunes on EQUALITY (the literal's bucket is
    // computed with Spark's own Murmur3Hash expression): the file holding
    // k='a' is always kept, and some other-bucket file drops unless all
    // four keys collide into one bucket — checked in isolation because
    // the column-bounds layer also prunes k === 'a' here
    val conjs = FilePruning.conjunctsOf(col("k") === "a", t.schema)
    val files = t.currentSnapshot.get.files
    val kept = files.filter(f =>
      FilePruning.keepFileByPartitions(f, conjs, t.meta.transforms, t.schema))
    val aBucket = spark.range(1)
      .select(pmod(hash(lit("a")), lit(4))).head.getInt(0)
    assert(kept.exists(_.path.contains(s"_p_k_bucket=$aBucket")),
      s"the k='a' bucket must survive equality pruning: ${kept.map(_.path)}")
    assert(kept.forall(_.path.contains(s"_p_k_bucket=$aBucket")),
      s"only k='a'-bucket files may survive: ${kept.map(_.path)}")
    // range and null-check ops on the bucketed column never dir-prune
    // (hash is not monotone; hash(null) lands in a numeric dir)
    for (c <- Seq(col("k") >= "a", col("k").isNull, col("k").isNotNull)) {
      val cs = FilePruning.conjunctsOf(c, t.schema)
      assert(files.forall(f =>
        FilePruning.keepFileByPartitions(f, cs, t.meta.transforms, t.schema)),
        s"non-equality op must keep every file: $c")
    }
    assert(t.prunedRead(col("k") === "a").count() == 1)
    // exactness through the read: every key still returns exactly its row
    for (k <- Seq("a", "b", "c", "d"))
      assert(t.prunedRead(col("k") === k).count() == 1, s"key $k")
  }

  test("partition-dir pruning: identity and integral truncate transforms") {
    val cat = newCatalog()
    cat.createTable("default.pt", Seq("region" -> "string", "v" -> "long"),
      List("identity(region)", "truncate(10,v)"), Map.empty)
    val t = cat.loadTable("default.pt")
    t.append(Seq(("eu", 3L), ("us", 17L), ("ap", 25L)).toDF("region", "v"))
    val total = t.currentSnapshot.get.files.size
    assert(t.pruneStats(col("region") === "us")._1 < total)
    assert(t.prunedRead(col("region") === "us").count() == 1)
    // truncate(10): v >= 20 can only live in dirs floored >= 20
    val (kt, _) = t.pruneStats(col("v") >= 20L)
    assert(kt < total, s"truncate-dir prune failed: $kt/$total")
    assert(t.prunedRead(col("v") >= 20L).collect().map(_.getString(0)).toSeq == Seq("ap"))
  }

  test("clustered compact rewrites a scattered table into a prunable layout") {
    val cat = newCatalog()
    cat.createTable("default.cc", Seq("x" -> "long", "y" -> "long"), Nil, Map.empty)
    val t = cat.loadTable("default.cc")
    // scattered appends: every file covers the whole x range -> no pruning
    (0 until 4).foreach { i =>
      t.append(spark.range(0, 256).select(
        ((col("id") * 7 + i) % 64).as("x"), (col("id") / 4).as("y")).coalesce(1))
    }
    val filter = col("x") < 8L
    assert(t.pruneStats(filter)._1 == 4, "scattered layout should not prune")
    val before = t.read().where(filter).count()
    // single-column range clustering
    t.compact(targetFiles = 8, clusterBy = Seq("x"))
    val (kept, total) = t.pruneStats(filter)
    assert(total == 8 && kept < total && kept >= 1,
      s"clustered compact must make the range prunable: $kept/$total")
    assert(t.prunedRead(filter).count() == before)
    // two-column z-order clustering keeps both dimensions prunable
    t.compact(targetFiles = 8, clusterBy = Seq("x", "y"))
    val f2 = col("x") < 8L && col("y") < 8L
    val (kz, tz) = t.pruneStats(f2)
    assert(tz == 8 && kz < tz, s"z-order compact must prune: $kz/$tz")
    assert(t.prunedRead(f2).collect().toSet == t.read().where(f2).collect().toSet)
  }

  test("bucket dirs never answer null checks: hash(null) lands in a real bucket") {
    val cat = newCatalog()
    cat.createTable("default.bn", Seq("k" -> "long", "v" -> "long"),
      List("bucket(4,k)"), Map.empty)
    val t = cat.loadTable("default.bn")
    t.append(Seq((Some(1L), 10L), (Some(2L), 20L), (None, 30L))
      .toDF("k", "v"))
    // Spark's hash(null) = the seed, so the null-k row lives in a NUMERIC
    // bucket dir — judging isNull by dir name would drop it
    val nulls = t.prunedRead(col("k").isNull).collect().map(_.getLong(1))
    assert(nulls.toSeq == Seq(30L),
      s"null-keyed row lost through bucket-dir pruning: ${nulls.toSeq}")
    assert(t.prunedRead(col("k").isNotNull).count() == 2)
  }

  test("empty-string partition values share the null dir and are never pruned") {
    val cat = newCatalog()
    cat.createTable("default.es", Seq("s" -> "string", "v" -> "long"),
      List("identity(s)"), Map.empty)
    val t = cat.loadTable("default.es")
    t.append(Seq(("", 1L), ("x", 2L), (null, 3L)).toDF("s", "v"))
    // "" and null both serialize as __HIVE_DEFAULT_PARTITION__ — the dir
    // layer cannot distinguish them, so neither comparisons nor isNotNull
    // may drop that dir for string sources
    assert(t.prunedRead(col("s") === "").collect().map(_.getLong(1)).toSeq == Seq(1L))
    assert(t.prunedRead(col("s").isNotNull).collect().map(_.getLong(1)).sorted.toSeq
      == Seq(1L, 2L))
    assert(t.prunedRead(col("s").isNull).collect().map(_.getLong(1)).toSeq == Seq(3L))
  }

  test("prunedRead surfaces filter analysis errors even when everything prunes away") {
    val cat = newCatalog()
    cat.createTable("default.ae", Seq("v" -> "long"), Nil, Map.empty)
    val t = cat.loadTable("default.ae")
    // empty table: the typo must still throw like read().where would
    intercept[org.apache.spark.sql.AnalysisException] {
      t.prunedRead(col("no_such_col") > 5).collect()
    }
    t.append(Seq(1L, 2L).toDF("v").coalesce(1))
    intercept[org.apache.spark.sql.AnalysisException] {
      t.prunedRead(col("no_such_col") > 5).collect()
    }
  }

  test("bucket-dir equality pruning never drops files written under a different source-type era") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    val fid = 7L
    def f(dt: DataType) = TableMeta.withFieldId(StructField("k", dt), fid)
    val curSchema = StructType(Seq(f(LongType)))
    val oldSchema = StructType(Seq(f(IntegerType)))
    val tfs = Seq(PartitionTransform.Bucket(4, "k"))
    def bucketOf(l: Literal): Int = {
      val h = Murmur3Hash(Seq(l), 42).eval(null).asInstanceOf[Int]
      ((h % 4) + 4) % 4
    }
    // Murmur3 is type-sensitive: find a value whose int-era bucket differs
    // from its long-era bucket
    val v = (0 to 1000).find(i =>
      bucketOf(Literal(i, IntegerType)) != bucketOf(Literal(i.toLong, LongType))).get
    val intBucket = bucketOf(Literal(v, IntegerType))
    val conjs = FilePruning.conjunctsOf(col("k") === v.toLong, curSchema)
    assert(conjs.nonEmpty)
    val fileSchemaOf: Int => Option[StructType] = {
      case 1 => Some(oldSchema); case 2 => Some(curSchema); case _ => None
    }
    // current-era file sitting in the WRONG bucket dir: provably no match
    val fNew = FileEntry(s"/wh/t/data/_p_k_bucket=$intBucket/f1.parquet",
      10, 100, schemaId = 2)
    assert(!FilePruning.keepFileByPartitions(fNew, conjs, tfs, curSchema,
      fileSchemaOf))
    // int-era file in the int-hash bucket dir: the matching row LIVES here
    // (the write hashed k as int) — era guard must keep it
    val fOld = FileEntry(s"/wh/t/data/_p_k_bucket=$intBucket/f0.parquet",
      10, 100, schemaId = 1)
    assert(FilePruning.keepFileByPartitions(fOld, conjs, tfs, curSchema,
      fileSchemaOf))
    // without a schema resolver (unknown era) behavior is unchanged:
    // current-type pruning applies
    assert(!FilePruning.keepFileByPartitions(fNew, conjs, tfs, curSchema))
  }

  test("manifests without bounds (older snapshots) read fine and never prune") {
    val f = FileEntry("/nope.parquet", 10, 100, 1)
    val schema = TableMeta.schemaOf(Seq("v" -> "long"))
    val conjs = Seq(FilePruning.Conjunct("v", ">", Some("1000")))
    assert(FilePruning.keepFile(f, conjs, schema))
    // and a JSON roundtrip without the bounds field deserializes to empty
    val json = """{"path":"/p.parquet","rows":5,"bytes":50,"schemaId":1}"""
    val fe = Jsons.read[FileEntry](json)
    assert(fe.bounds.isEmpty && fe.rows == 5)
  }
}
