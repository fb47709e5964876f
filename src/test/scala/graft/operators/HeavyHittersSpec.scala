package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def exact(items: Seq[String], minShare: Double): Set[(String, Long)] = {
    val thr = math.ceil(minShare * items.size).toLong
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= thr).toSet
  }

  test("equals GROUP BY HAVING on a skewed corpus, any partitioning") {
    val rnd = new scala.util.Random(3)
    // zipf-ish: few hot items + a long tail of near-unique ones
    val hot = Seq.fill(400)("hot" + rnd.nextInt(3))
    val warm = Seq.fill(300)("warm" + rnd.nextInt(20))
    val tail = Seq.tabulate(300)(i => "tail" + i)
    val items = rnd.shuffle(hot ++ warm ++ tail)
    val exp = exact(items, 1.0 / 32)
    for (parts <- Seq(1, 3, 7)) {
      val df = spark.createDataset(items).repartition(parts).toDF("item")
      val got = HeavyHitters.frequentItems(df, "item", 1.0 / 32)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == exp, s"parts=$parts")
    }
  }

  test("uniform data with no hitters returns empty") {
    val df = (1 to 1000).map(i => s"u$i").toDF("item")
    assert(HeavyHitters.frequentItems(df, "item", 1.0 / 64).count() == 0)
  }

  test("nulls are dropped, not counted") {
    val df = (Seq.fill(50)(Some("a")) ++ Seq.fill(50)(Option.empty[String]))
      .toDF("item")
    val got = HeavyHitters.frequentItems(df, "item", 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // N = 50 non-null rows; "a" has all 50 (threshold ceil(25) = 25)
    assert(got == Set(("a", 50L)))
  }

  test("Misra-Gries ingest keeps every item above n/cap (survival law)") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 20) {
      val n = 500 + rnd.nextInt(500)
      val cap = 4 + rnd.nextInt(12)
      val items = Seq.fill(n)("i" + rnd.nextInt(1 + rnd.nextInt(60)))
      val sketch = HeavyHitters.mgIngest(items.iterator, cap)
      assert(sketch.size <= cap)
      val counts = items.groupBy(identity).view.mapValues(_.size).toMap
      val mustSurvive = counts.filter(_._2 > n.toDouble / cap).keySet
      assert(mustSurvive.subsetOf(sketch.keySet),
        s"lost ${mustSurvive -- sketch.keySet} n=$n cap=$cap")
      // undercount-only: sketch never overcounts
      sketch.foreach { case (k, v) => assert(v <= counts(k)) }
    }
  }

  test("mgMerge preserves the survival law across random splits") {
    val rnd = new scala.util.Random(29)
    for (_ <- 1 to 20) {
      val n = 600
      val cap = 8 + rnd.nextInt(8)
      val items = Seq.fill(n)("i" + rnd.nextInt(1 + rnd.nextInt(40)))
      val chunks = items.grouped(1 + rnd.nextInt(200)).toSeq
      val merged = chunks.map(c => HeavyHitters.mgIngest(c.iterator, cap))
        .reduce((a, b) => HeavyHitters.mgMerge(a, b, cap))
      assert(merged.size <= cap)
      val counts = items.groupBy(identity).view.mapValues(_.size).toMap
      // merged MG error < n/cap => share >= 2/cap always survives
      val mustSurvive = counts.filter(_._2 >= 2.0 * n / cap).keySet
      assert(mustSurvive.subsetOf(merged.keySet),
        s"lost ${mustSurvive -- merged.keySet} cap=$cap")
    }
  }
}
