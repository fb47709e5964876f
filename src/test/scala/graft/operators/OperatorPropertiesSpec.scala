package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._

import graft.SparkFixture

/** Property-based checks for the round-7 distributed operators against
  * independent Scala reference implementations on generated inputs. */
class OperatorPropertiesSpec extends AnyFunSuite {
  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(25).foreach(body)

  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("Intervals.coalesce == brute-force union-find on random intervals") {
    val genIv = Gen.listOfN(40, Gen.zip(Gen.choose(0L, 60L), Gen.choose(0L, 25L)))
    forAll(genIv) { raw =>
      val rows = raw.zipWithIndex.map { case ((s, len), i) =>
        ("k", s, s + len, i.toLong) }
      val got = Intervals.coalesce(rows.toDF("k", "s", "e", "id"),
        Seq("k"), "s", "e", "id")
        .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1).toSeq
      // reference: sort, sweep, merge on start <= running max end
      val sorted = rows.map(t => (t._2, t._3)).sortBy(identity)
      val merged = sorted.foldLeft(List.empty[(Long, Long, Long)]) {
        case (acc, (s, e)) => acc match {
          case (ms, me, n) :: rest if s <= me =>
            (ms, math.max(me, e), n + 1) :: rest
          case _ => (s, e, 1L) :: acc
        }
      }.reverse
      assert(got == merged, s"input: $rows")
    }
  }

  test("stratifiedAssign sizes are ceil-exact for random strata and fractions") {
    val gen = Gen.zip(Gen.choose(1, 5), Gen.choose(10, 120),
      Gen.choose(1, 9))
    forAll(gen) { case (nStrata, nRows, tenths) =>
      val f = tenths / 10.0
      val df = spark.range(0, nRows)
        .select(col("id"), (col("id") % nStrata).as("g"))
      val counts = HashSplit.stratifiedAssign(df, Seq(col("g")), col("id"),
        Seq("a" -> f, "b" -> (1.0 - f)), seed = nRows)
        .groupBy("g", "split").count()
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
        .toMap
      (0 until nStrata).foreach { g =>
        val n = (0 until nRows).count(_ % nStrata == g)
        if (n > 0) {
          val a = math.ceil(f * n - 1e-9).toLong
          assert(counts.getOrElse((g.toLong, "a"), 0L) == a, s"g=$g n=$n f=$f")
          assert(counts.getOrElse((g.toLong, "b"), 0L) == n - a)
        }
      }
    }
  }

  test("stratifiedAssign survives the integer-boundary ceil overshoot") {
    // 3/17 · 85 = 15 exactly, but IEEE (3/17)·85 = 15.000000000000002 —
    // an unguarded ceil hands split 'a' a 16th row
    val df = spark.range(0, 85).select(col("id"), lit("g").as("g"))
    val counts = HashSplit.stratifiedAssign(df, Seq(col("g")), col("id"),
      Seq("a" -> 3.0 / 17, "b" -> 14.0 / 17))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a") == 15L, counts.toString)
    assert(counts("b") == 70L)
  }

  test("Binning bin sizes differ by <= 1 and concatenate in order, any (n, k)") {
    forAll(Gen.zip(Gen.choose(1, 200), Gen.choose(1, 12))) { case (n, k) =>
      val df = spark.range(0, n)
        .select((col("id") * 37 % 101).as("v"), col("id"))
      val rows = Binning.equalFrequency(df, Seq(col("v"), col("id")), k)
        .groupBy("bin").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows.values.sum == n)
      if (n >= k) assert(rows.keySet == (0L until k).toSet)
      if (rows.nonEmpty)
        assert(rows.values.max - rows.values.min <= 1, s"n=$n k=$k $rows")
    }
  }

  test("dyadic EMA closed form tracks the sequential recurrence (random)") {
    val gen = Gen.zip(Gen.choose(1, 3),
      Gen.listOfN(30, Gen.choose(-1000, 1000)))
    forAll(gen) { case (m, raw) =>
      val xs = raw.map(_ / 7.0)
      val alpha = 1.0 - 1.0 / (1L << m)
      val seqEma = xs.tail.foldLeft(xs.head)((e, x) => alpha * x + (1 - alpha) * e)
      val df = xs.zipWithIndex
        .map { case (v, i) => ("u", i.toLong, i.toLong, v) }
        .toDF("user_id", "ts", "event_id", "value")
      val got = graft.analytics.Ema.dyadicEmaFinal(df, Seq("user_id"),
        "ts", "event_id", "value", m).collect()(0).getLong(2)
      // each term's micro-rounding contributes <= 0.5 micro-units
      assert(math.abs(got - seqEma * 1e6) <= xs.size,
        s"m=$m got=$got seq=${seqEma * 1e6}")
    }
  }
}
