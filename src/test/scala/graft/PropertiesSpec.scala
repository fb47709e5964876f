package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.core.{IceTable, PartitionTransform}

/** Property-based checks (ScalaCheck) for the parsing/coercion seams. */
class PropertiesSpec extends AnyFunSuite {
  /** Plain-ScalaCheck property driver (no scalatestplus bridge in the
    * offline cache): evaluate the body over 100 generated samples. */
  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(100).foreach(body)

  lazy val spark = SparkFixture.spark
  lazy val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-prop-").toString)

  test("partition transform spec round-trips through parse") {
    val genName = Gen.identifier.suchThat(_.nonEmpty).map(_.take(12))
    val genN = Gen.choose(1, 1024)
    val genSpec = Gen.oneOf(
      genName.map(c => s"identity($c)"),
      genName.map(c => s"year($c)"),
      genName.map(c => s"month($c)"),
      genName.map(c => s"day($c)"),
      genName.map(c => s"hour($c)"),
      Gen.zip(genN, genName).map { case (n, c) => s"bucket($n,$c)" },
      Gen.zip(genN, genName).map { case (n, c) => s"truncate($n,$c)" })
    forAll(genSpec) { spec =>
      assert(PartitionTransform.parse(spec).spec == spec)
    }
  }

  test("coerce round-trips longs, doubles, dates, timestamps from strings") {
    import org.apache.spark.sql.types._
    forAll(Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)) { (n: Long) =>
      assert(lh.dml.coerce(n.toString, LongType) == n)
      assert(lh.dml.coerce(n, LongType) == n)
    }
    forAll(Gen.choose(-1e12, 1e12)) { (d: Double) =>
      assert(lh.dml.coerce(d.toString, DoubleType) == d)
    }
    forAll(Gen.choose(0L, 20000L)) { (days: Long) =>
      val date = java.time.LocalDate.ofEpochDay(days)
      assert(lh.dml.coerce(date.toString, DateType) ==
        java.sql.Date.valueOf(date))
    }
    forAll(Gen.choose(0L, 4102444800000L)) { (ms: Long) =>
      val got = lh.dml.coerce(java.time.Instant.ofEpochMilli(ms).toString,
        TimestampType).asInstanceOf[java.sql.Timestamp]
      assert(got.getTime == ms)
    }
    // None/null preserved
    assert(lh.dml.coerce(null, LongType) == null)
    assert(lh.dml.coerce(None, StringType) == null)
  }

  test("expire cutoff parses durations and ISO forms") {
    forAll(Gen.choose(1, 10000)) { (n: Int) =>
      val now = System.currentTimeMillis()
      val cutoff = IceTable.parseCutoffMs(s"${n}h")
      val expect = now - n.toLong * 3600000L
      assert(math.abs(cutoff - expect) < 5000)
    }
    assert(IceTable.parseCutoffMs("2026-01-01") ==
      java.time.LocalDate.parse("2026-01-01").atStartOfDay
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
  }

  test("sample fixtures match the reference shapes") {
    val lh2 = Lakehouse.open(spark, SparkFixture.tmpDir("graft-fix-").toString)
    Fixtures.createSampleTables(lh2)
    Fixtures.insertSampleData(lh2)
    assert(lh2.catalog.listTables() ==
      List("default.expenses", "default.health", "default.notes"))
    assert(lh2.catalog.loadTable("expenses").read().count() == 5)
    assert(lh2.catalog.loadTable("health").read().count() == 4)
    assert(lh2.catalog.loadTable("notes").read().count() == 2)
    // expenses partitioned by month(date) → two month dirs
    assert(lh2.catalog.loadTable("expenses").partitionStats.keySet ==
      Set("_p_date_month=2025-11", "_p_date_month=2025-12"))
    // suggest_joins finds the shared id column
    assert(lh2.engine.suggestJoins().exists { case (a, b, c, _) =>
      a == "default.expenses" && b == "default.health" && c == "id" })
  }
}
