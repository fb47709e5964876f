package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkFixture

/** Fuzz of schema evolution × DML composition: random sequences of
  * ADD / RENAME / DROP column interleaved with appends (always written
  * under the CURRENT schema), MoR position deletes, MoR updates and
  * compactions — against an in-memory model that tracks rows keyed by
  * the CURRENT column names. Every checkpoint asserts the engine read
  * (which must resolve every file through its own write-era schema by
  * FIELD-ID: renamed columns keep their values, dropped ones disappear,
  * added ones read NULL from older files) equals the model exactly.
  * The hand-written specs pin each evolution step alone; the fuzz pins
  * their COMPOSITION over multi-era file layouts. Deterministic seeds. */
class EvolutionFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def fuzz(seed: Long, nOps: Int): Unit = {
    val rng = new scala.util.Random(seed)
    val cat = Catalog.open(spark,
      SparkFixture.tmpDir(s"graft-evofuzz-$seed-").toString)
    val tbl = cat.createTable(s"ev$seed",
      Seq("id" -> "long", "c0" -> "string"), Nil, Map.empty)
    // model: column list (name -> type) + rows as name-keyed maps
    var cols = Vector("id" -> "long", "c0" -> "string")
    var rows = Vector.empty[Map[String, Any]]
    var nextId = 0L
    var nextCol = 0
    def colNames = cols.map(_._1)
    def randVal(t: String): Any =
      if (rng.nextInt(8) == 0) null
      else t match {
        case "long" => rng.nextInt(100).toLong
        case "string" => s"v${rng.nextInt(40)}"
      }
    def sparkType(t: String): DataType =
      if (t == "long") LongType else StringType
    def appendBatch(n: Int): Unit = {
      val schema = StructType(cols.map { case (c, t) =>
        StructField(c, sparkType(t), nullable = c != "id") })
      val fresh = (0 until n).map { _ =>
        nextId += 1
        cols.map { case (c, t) =>
          c -> (if (c == "id") nextId else randVal(t)) }.toMap
      }
      val df = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(fresh.map(m =>
            Row.fromSeq(colNames.map(m)))).asJava), schema)
      tbl.append(df.coalesce(1))
      rows ++= fresh
    }
    def check(): Unit = {
      val got = tbl.read().select(colNames.map(col): _*).collect()
        .map(_.mkString("|")).sorted.toSeq
      val want = rows.map(m => colNames.map(c =>
        m.getOrElse(c, null)).mkString("|")).sorted
      assert(got == want,
        s"evolution divergence (seed=$seed cols=$colNames): " +
          s"got=${got.take(4)}… want=${want.take(4)}…")
      // the engine's CURRENT schema must list exactly the model's columns
      assert(tbl.schema.fieldNames.toSeq == colNames,
        s"schema drift: ${tbl.schema.fieldNames.toSeq} vs $colNames")
    }
    appendBatch(12)
    var sinceCheck = 0
    for (_ <- 1 to nOps) {
      rng.nextInt(10) match {
        case 0 | 1 | 2 => appendBatch(2 + rng.nextInt(5))
        case 3 => // ADD a fresh column: old rows read NULL
          nextCol += 1
          val t = if (rng.nextBoolean()) "long" else "string"
          val name = s"a$nextCol"
          tbl.addColumn(name, t)
          cols :+= (name -> t)
          rows = rows.map(_ + (name -> null))
        case 4 => // RENAME a non-id column: values follow the field-id
          val extras = colNames.filter(_ != "id")
          if (extras.nonEmpty) {
            nextCol += 1
            val from = extras(rng.nextInt(extras.length))
            val to = s"r$nextCol"
            tbl.renameColumn(from, to)
            cols = cols.map { case (c, t) =>
              if (c == from) (to, t) else (c, t) }
            rows = rows.map(m => (m - from) + (to -> m(from)))
          }
        case 5 => // DROP a non-id column (keep at least one extra)
          val extras = colNames.filter(_ != "id")
          if (extras.size > 1) {
            val victim = extras(rng.nextInt(extras.length))
            tbl.dropColumn(victim)
            cols = cols.filterNot(_._1 == victim)
            rows = rows.map(_ - victim)
          }
        case 6 | 7 => // MoR position delete by id slice
          if (rows.nonEmpty) {
            val k = 2 + rng.nextInt(4)
            tbl.deleteWhereMor(col("id") % k === 0)
            rows = rows.filterNot(m => m("id").asInstanceOf[Long] % k == 0)
          }
        case 8 => // MoR update of a random extra column on a random row
          val extras = cols.filter(_._1 != "id")
          if (rows.nonEmpty && extras.nonEmpty) {
            val (c, t) = extras(rng.nextInt(extras.length))
            val target = rows(rng.nextInt(rows.length))("id")
              .asInstanceOf[Long]
            val v = randVal(t)
            val n = tbl.updateWhereMor(col("id") === target,
              Map(c -> lit(v).cast(sparkType(t))))
            assert(n == 1L, s"update of live id $target matched $n")
            rows = rows.map(m =>
              if (m("id") == target) m + (c -> v) else m)
          }
        case 9 => tbl.compact(targetFiles = 1 + rng.nextInt(2))
      }
      sinceCheck += 1
      if (sinceCheck >= 3) { check(); sinceCheck = 0 }
    }
    check()
  }

  test("random ADD/RENAME/DROP interleaved with appends, MoR deletes, " +
      "MoR updates and compactions: field-id reads match the model at " +
      "every checkpoint (seed 18301)") {
    fuzz(seed = 18301L, nOps = 28)
  }

  test("random ADD/RENAME/DROP interleaved with appends, MoR deletes, " +
      "MoR updates and compactions: field-id reads match the model at " +
      "every checkpoint (seed 18302)") {
    fuzz(seed = 18302L, nOps = 28)
  }

  test("same fuzz THROUGH the merged single-scan read: with the era " +
      "threshold forced to 2, every multi-era checkpoint takes " +
      "assembleMerged (or its guarded fallback) and must still match " +
      "the model (seed 18303)") {
    graft.SparkFixture.withMergedThreshold(2) {
      fuzz(seed = 18303L, nOps = 36)
    }
  }
}
