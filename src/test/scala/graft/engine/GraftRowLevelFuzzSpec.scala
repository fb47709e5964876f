package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.SparkFixture

/** Property fuzz of the SQL row-level surface ([[GraftRowLevelStrategy]]):
  * random flat schemas, random UPDATE/DELETE statements (literal
  * comparisons, NULL tests, conjunctions, IN-subqueries, correlated
  * EXISTS, simultaneous multi-column SET) executed against the ENGINE
  * (strategy → victim discovery → CoW/MoR commit → manifest read-back)
  * and replayed against an INDEPENDENT model: the same condition/SET text
  * applied to a plain in-memory temp view as a pure SELECT rewrite
  * (`DELETE` ≡ keep `NOT coalesce(cond,false)`; `UPDATE` ≡ per-column
  * `CASE WHEN coalesce(cond,false) THEN expr ELSE col END` over the OLD
  * row). Spark's own expression semantics (three-valued logic, numeric
  * rules) are shared by construction, so any divergence is a bug in the
  * ENGINE path — the strategy, rebinding, victim discovery, commit shape
  * or read — not in the oracle. 2 random schemas × 2 write modes × 50
  * statements = 200 differential cases, deterministic seed. */
class GraftRowLevelFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private lazy val catName = s"gf${System.nanoTime() % 100000}"
  private lazy val lh = {
    val wh = SparkFixture.tmpDir("graft-rowlevel-fuzz-")
    val l = graft.Lakehouse.open(spark, wh.toString)
    spark.conf.set(s"spark.sql.catalog.$catName",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catName.warehouse", wh.toString)
    graft.GraftExtensions.register(spark)
    l
  }

  private case class Col(name: String, typ: String) // long | double | string

  /** Random flat schema: `id` (long, never NULL, subquery anchor) plus
    * 2–3 typed extras that may hold NULLs. */
  private def randomSchema(rng: scala.util.Random): Seq[Col] = {
    val extras = 2 + rng.nextInt(2)
    Col("id", "long") +: (0 until extras).map { i =>
      Col(s"c${i}_${rng.alphanumeric.filter(_.isLetter).take(3).mkString.toLowerCase}",
        Seq("long", "double", "string")(rng.nextInt(3)))
    }
  }

  private def sparkType(t: String): DataType = t match {
    case "long" => LongType
    case "double" => DoubleType
    case "string" => StringType
  }

  private def randomValue(c: Col, rng: scala.util.Random): Any =
    if (c.name != "id" && rng.nextInt(10) == 0) null
    else c.typ match {
      case "long" => rng.nextInt(200).toLong
      case "double" => rng.nextInt(1000) / 4.0
      case "string" => s"s${rng.nextInt(50)}"
    }

  private def lit(c: Col, rng: scala.util.Random): String = c.typ match {
    case "long" => rng.nextInt(200).toString
    case "double" => (rng.nextInt(1000) / 4.0).toString
    case "string" => s"'s${rng.nextInt(50)}'"
  }

  /** A random deterministic condition over `cols`, as SQL text shared
    * verbatim by the engine statement and the model rewrite. `keysView`
    * is a registered random key set for the subquery shapes. */
  private def randomCond(cols: Seq[Col], keysView: String,
      rng: scala.util.Random, depth: Int = 0): String = {
    val c = cols(rng.nextInt(cols.size))
    val simple = rng.nextInt(7) match {
      case 0 => s"${c.name} ${Seq("<", "<=", "=", ">", ">=", "<>")(rng.nextInt(6))} ${lit(c, rng)}"
      case 1 => s"${c.name} IS NULL"
      case 2 => s"${c.name} IS NOT NULL"
      case 3 => s"id % ${2 + rng.nextInt(5)} = ${rng.nextInt(3)}"
      case 4 => s"id IN (SELECT vid FROM $keysView)"
      case 5 => s"EXISTS (SELECT 1 FROM $keysView k WHERE k.vid = id)"
      case 6 => s"NOT EXISTS (SELECT 1 FROM $keysView k WHERE k.vid = id)"
    }
    if (depth < 1 && rng.nextInt(3) == 0)
      s"($simple ${if (rng.nextBoolean()) "AND" else "OR"} " +
        s"${randomCond(cols, keysView, rng, depth + 1)})"
    else simple
  }

  /** Random SET expressions (old-row semantics) for 1–2 non-id columns.
    * Includes CORRELATED scalar subqueries over the key view (executed
    * via the analysis-time capture, [[GraftCaptureUpdateRule]]) — among
    * them `count(*)`, whose zero-tuple value is 0 rather than NULL (the
    * decorrelation count-bug shape). */
  private def randomSet(cols: Seq[Col], keysView: String,
      rng: scala.util.Random): Seq[(String, String)] = {
    val targets = rng.shuffle(cols.filter(_.name != "id").toList)
      .take(1 + rng.nextInt(2))
    targets.map { c =>
      val e = (c.typ, rng.nextInt(6)) match {
        case (_, 0) => lit(c, rng)
        case (_, 1) => s"CAST(NULL AS ${c.typ})"
        case ("long", 2) =>
          s"(SELECT max(k.w) FROM $keysView k WHERE k.vid = id)"
        case ("long", 3) =>
          s"(SELECT count(*) FROM $keysView k WHERE k.vid = id)"
        case ("double", 2 | 3) =>
          s"(SELECT sum(k.w) * 0.5 FROM $keysView k WHERE k.vid = id)"
        case ("string", 2 | 3) =>
          s"CAST((SELECT min(k.w) FROM $keysView k WHERE k.vid = id) " +
            "AS string)"
        case ("string", _) => s"concat(coalesce(${c.name}, '_'), 'u')"
        case (_, _) => s"coalesce(${c.name}, ${lit(c, rng)}) + 1"
      }
      c.name -> e
    }
  }

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  private def fuzz(mode: String, props: Map[String, String], seed: Long,
      nStmts: Int): Unit = {
    val rng = new scala.util.Random(seed)
    val cols = randomSchema(rng)
    val schema = StructType(cols.map(c =>
      StructField(c.name, sparkType(c.typ), nullable = c.name != "id")))
    val tbl = s"fz_${mode}_$seed"
    lh.catalog.createTable(s"default.$tbl",
      cols.map(c => c.name -> c.typ), Nil, props)
    val t = lh.catalog.loadTable(s"default.$tbl")
    var nextId = 0L
    def freshRows(n: Int): Seq[Row] = {
      val rows = (0 until n).map { _ =>
        nextId += 1
        Row.fromSeq(cols.map(c =>
          if (c.name == "id") nextId else randomValue(c, rng)))
      }
      rows
    }
    def toDf(rows: Seq[Row]): DataFrame = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
    val seedRows = freshRows(60)
    t.append(toDf(seedRows).coalesce(2))
    val modelView = s"fz_model_$tbl"
    val keysView = s"fz_keys_$tbl"
    var model: Seq[Row] = seedRows
    var applied = 0
    while (applied < nStmts) {
      toDf(model).createOrReplaceTempView(modelView)
      // a fresh random key set per statement (may be empty); `w` feeds
      // the correlated scalar SET shapes (duplicate vids are deliberate —
      // aggregated subqueries stay single-valued per key)
      val keys = (0 until rng.nextInt(8)).map(_ =>
        (rng.nextLong(nextId + 5) + 1, rng.nextInt(100).toLong))
      spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(keys.map(k => Row(k._1: Any, k._2: Any))).asJava),
        StructType(Seq(StructField("vid", LongType),
          StructField("w", LongType))))
        .createOrReplaceTempView(keysView)
      val cond = randomCond(cols, keysView, rng)
      rng.nextInt(5) match {
        case 0 => // interleaved append keeps the table multi-file and grows it
          val more = freshRows(5 + rng.nextInt(10))
          t.append(toDf(more).coalesce(1))
          model = model ++ more
        case 1 | 2 =>
          spark.sql(s"DELETE FROM $catName.default.$tbl WHERE $cond")
          model = spark.sql(s"SELECT * FROM $modelView " +
            s"WHERE NOT coalesce(($cond), false)").collect().toSeq
        case _ =>
          val sets = randomSet(cols, keysView, rng)
          spark.sql(s"UPDATE $catName.default.$tbl SET " +
            sets.map { case (c, e) => s"$c = $e" }.mkString(", ") +
            s" WHERE $cond")
          val proj = cols.map { c =>
            sets.find(_._1 == c.name) match {
              case Some((_, e)) =>
                s"CASE WHEN coalesce(($cond), false) THEN ($e) " +
                  s"ELSE ${c.name} END AS ${c.name}"
              case None => c.name
            }
          }
          model = spark.sql(
            s"SELECT ${proj.mkString(", ")} FROM $modelView").collect().toSeq
      }
      applied += 1
      val engine = sorted(
        lh.catalog.loadTable(s"default.$tbl").read()
          .select(cols.map(c => org.apache.spark.sql.functions.col(c.name)): _*))
      val expect = model.map(_.mkString("|")).sorted
      assert(engine == expect,
        s"divergence after stmt $applied (mode=$mode seed=$seed " +
          s"cond=[$cond]):\n engine=${engine.take(5)}…\n model=${expect.take(5)}…")
    }
  }

  test("fuzz: 100 random UPDATE/DELETE statements on copy-on-write " +
      "tables match the pure-SELECT model exactly") {
    fuzz("cow", Map.empty, seed = 18001L, nStmts = 50)
    fuzz("cow", Map.empty, seed = 18002L, nStmts = 50)
  }

  test("fuzz: 100 random UPDATE/DELETE statements on merge-on-read " +
      "tables match the pure-SELECT model exactly") {
    val mor = Map("write.update.mode" -> "merge-on-read",
      "write.delete.mode" -> "merge-on-read")
    fuzz("mor", mor, seed = 18003L, nStmts = 50)
    fuzz("mor", mor, seed = 18004L, nStmts = 50)
  }
}
