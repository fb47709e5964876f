package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.SparkFixture

/** Differential fuzz of SQL `MERGE INTO` ([[GraftMergeStrategy]]): random
  * merges — conditioned matched-UPDATE, optional matched-DELETE,
  * conditioned not-matched-INSERT, random source overlap — executed
  * against the engine (one-plan merge → CoW file carry or MoR
  * position-delete commit → manifest read-back) and replayed as a pure
  * SELECT over temp views encoding the same first-match-wins semantics:
  *
  *   kept/updated = `m LEFT JOIN s` where unmatched keep, matched+cond1
  *   update (old-row values feed SET), matched+!cond1 delete (or keep
  *   when the DELETE clause is absent);
  *   inserted = `s ANTI JOIN m` filtered by the insert condition.
  *
  * The condition/expression TEXTS are shared verbatim modulo the target
  * alias (`t.` ↔ `m.`), so Spark's expression semantics are common by
  * construction and any divergence is the ENGINE path's fault. Source
  * ids are distinct per statement (the engine's cardinality rule —
  * multiple source matches per target row — is its own spec'd refusal,
  * not fuzzed here). 2 write modes × 2 seeds × 25 statements = 100
  * differential cases. */
class GraftMergeFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private lazy val catName = s"gm${System.nanoTime() % 100000}"
  private lazy val lh = {
    val wh = SparkFixture.tmpDir("graft-merge-fuzz-")
    val l = graft.Lakehouse.open(spark, wh.toString)
    spark.conf.set(s"spark.sql.catalog.$catName",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catName.warehouse", wh.toString)
    graft.GraftExtensions.register(spark)
    l
  }

  // fixed flat schema: id key + three typed extras (the DML fuzz spec
  // randomizes schemas; here the randomness budget goes to clause shapes)
  private val extras = Seq(("ca", "long"), ("cb", "double"), ("cs", "string"))
  private val schema = StructType(
    StructField("id", LongType, nullable = false) +:
      extras.map { case (n, t) => StructField(n, t match {
        case "long" => LongType
        case "double" => DoubleType
        case "string" => StringType
      }) })
  // source columns mirror the target types under different names
  private val srcSchema = StructType(
    StructField("id", LongType, nullable = false) +:
      Seq(StructField("ma", LongType), StructField("mb", DoubleType),
        StructField("ms", StringType)))

  private def rowVal(t: String, rng: scala.util.Random): Any =
    if (rng.nextInt(8) == 0) null
    else t match {
      case "long" => rng.nextInt(100).toLong
      case "double" => rng.nextInt(400) / 4.0
      case "string" => s"s${rng.nextInt(30)}"
    }

  private def toDf(rows: Seq[Row], s: StructType): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), s)

  /** Random condition text over `t.`-prefixed target cols and `s.`-
    * prefixed source cols; the model replays it with `t.` → `m.`. */
  private def cond(rng: scala.util.Random): String = rng.nextInt(6) match {
    case 0 => s"t.ca ${Seq("<", ">=", "=")(rng.nextInt(3))} ${rng.nextInt(100)}"
    case 1 => s"s.ma ${Seq("<", ">")(rng.nextInt(2))} ${rng.nextInt(100)}"
    case 2 => "t.cs IS NULL"
    case 3 => "s.ms IS NOT NULL"
    case 4 => s"t.cb < s.mb"
    case 5 => s"(t.ca < ${rng.nextInt(100)} OR s.ma IS NULL)"
  }

  private def fuzz(mode: String, props: Map[String, String], seed: Long,
      nStmts: Int): Unit = {
    val rng = new scala.util.Random(seed)
    val tbl = s"mf_${mode}_$seed"
    lh.catalog.createTable(s"default.$tbl",
      Seq("id" -> "long") ++ extras, Nil, props)
    val t = lh.catalog.loadTable(s"default.$tbl")
    var nextId = 0L
    def freshRows(n: Int): Seq[Row] = (0 until n).map { _ =>
      nextId += 1
      Row.fromSeq(nextId +: extras.map { case (_, ty) => rowVal(ty, rng) })
    }
    var model: Seq[Row] = freshRows(50)
    t.append(toDf(model, schema).coalesce(2))
    val modelView = s"mf_model_$tbl"
    val srcView = s"mf_src_$tbl"
    for (stmt <- 1 to nStmts) {
      toDf(model, schema).createOrReplaceTempView(modelView)
      // source: distinct ids, mixing existing targets and fresh ids
      val srcIds = rng.shuffle((1L to nextId).toList)
        .take(rng.nextInt(10)) ++ (1 to rng.nextInt(8))
        .map(i => nextId + 100 + i * 3 + rng.nextInt(3))
      val src = srcIds.distinct.map(i => Row.fromSeq(Seq[Any](i,
        rowVal("long", rng), rowVal("double", rng), rowVal("string", rng))))
      toDf(src, srcSchema).createOrReplaceTempView(srcView)
      val updCond = if (rng.nextBoolean()) cond(rng) else "true"
      // NOT MATCHED conditions may reference the SOURCE row only
      val insCond = rng.nextInt(4) match {
        case 0 => s"s.ma ${Seq("<", ">=")(rng.nextInt(2))} ${rng.nextInt(100)}"
        case 1 => "s.ms IS NOT NULL"
        case 2 => s"(s.mb < ${rng.nextInt(100)} OR s.ma IS NULL)"
        case _ => "true"
      }
      val withDelete = rng.nextBoolean()
      // SET: ca from source/arith, cb literal-or-source, cs concat —
      // every value reads the OLD target row or the source row
      val setCa = rng.nextInt(3) match {
        case 0 => "s.ma"
        case 1 => "coalesce(t.ca, 0) + 1"
        case 2 => s"${rng.nextInt(50)}"
      }
      val setCs = rng.nextInt(2) match {
        case 0 => "concat(coalesce(t.cs, '_'), coalesce(s.ms, '?'))"
        case 1 => "s.ms"
      }
      val deleteClause =
        if (withDelete) "WHEN MATCHED THEN DELETE " else ""
      spark.sql(
        s"""MERGE INTO $catName.default.$tbl t USING $srcView s
           |ON t.id = s.id
           |WHEN MATCHED AND $updCond THEN UPDATE SET ca = $setCa, cs = $setCs
           |${deleteClause}WHEN NOT MATCHED AND $insCond THEN
           |  INSERT (id, ca, cb, cs) VALUES (s.id, s.ma, s.mb, s.ms)"""
          .stripMargin)
      // model replay: same texts, target alias m
      val mUpdCond = updCond.replace("t.", "m.")
      val kept = spark.sql(
        s"""SELECT
           |  m.id,
           |  CASE WHEN s.id IS NOT NULL AND coalesce(($mUpdCond), false)
           |    THEN CAST((${setCa.replace("t.", "m.")}) AS LONG) ELSE m.ca END AS ca,
           |  m.cb,
           |  CASE WHEN s.id IS NOT NULL AND coalesce(($mUpdCond), false)
           |    THEN (${setCs.replace("t.", "m.")}) ELSE m.cs END AS cs
           |FROM $modelView m LEFT JOIN $srcView s ON m.id = s.id
           |WHERE s.id IS NULL OR coalesce(($mUpdCond), false)
           |  ${if (withDelete) "" else "OR NOT coalesce((" + mUpdCond + "), false)"}"""
          .stripMargin)
      val inserted = spark.sql(
        s"""SELECT s.id, s.ma AS ca, s.mb AS cb, s.ms AS cs
           |FROM $srcView s LEFT ANTI JOIN $modelView m ON m.id = s.id
           |WHERE coalesce(($insCond), false)""".stripMargin)
      model = kept.unionByName(inserted).collect().toSeq
      val engine = lh.catalog.loadTable(s"default.$tbl").read()
        .select("id", "ca", "cb", "cs")
        .collect().map(_.mkString("|")).sorted.toSeq
      val expect = model.map(_.mkString("|")).sorted
      assert(engine == expect,
        s"divergence after merge $stmt (mode=$mode seed=$seed " +
          s"updCond=[$updCond] insCond=[$insCond] del=$withDelete " +
          s"setCa=[$setCa] setCs=[$setCs]):\n engine=${engine.take(5)}…" +
          s"\n model=${expect.take(5)}…")
      // the fuzz must keep REAL overlap: grow nextId so later sources
      // keep mixing fresh and existing ids
      nextId = math.max(nextId, srcIds.maxOption.getOrElse(nextId))
    }
  }

  test("fuzz: 50 random MERGE statements on copy-on-write tables match " +
      "the pure-SELECT first-match-wins model exactly") {
    fuzz("cow", Map.empty, seed = 18101L, nStmts = 25)
    fuzz("cow", Map.empty, seed = 18102L, nStmts = 25)
  }

  test("fuzz: 50 random MERGE statements on merge-on-read tables match " +
      "the pure-SELECT first-match-wins model exactly") {
    val mor = Map("write.merge.mode" -> "merge-on-read")
    fuzz("mor", mor, seed = 18103L, nStmts = 25)
    fuzz("mor", mor, seed = 18104L, nStmts = 25)
  }
}
