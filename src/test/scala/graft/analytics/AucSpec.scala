package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class AucSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** Brute-force AUC numerator: 2U = 2·#{s_p > s_n} + #{s_p = s_n}. */
  private def bruteU2(rows: Seq[(Double, Boolean)]): (Long, Long, Long) = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val u2 = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    (u2, pos.size.toLong, neg.size.toLong)
  }

  test("matches the brute-force pair count, including score ties") {
    val rows = Seq(
      (0.9, true), (0.8, true), (0.8, false), (0.7, false), (0.7, true),
      (0.5, false), (0.5, false), (0.5, true), (0.3, false), (0.1, false))
    val got = Auc.aucCounts(rows.toDF("s", "y"), col("s"), col("y"))
      .collect()(0)
    val (u2, np, nn) = bruteU2(rows)
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((u2, np, nn)))
  }

  test("perfect separation gives AUC 1, inverted gives 0") {
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
    val g1 = Auc.aucCounts(perfect.toDF("s", "y"), col("s"), col("y"))
      .collect()(0)
    assert(g1.getLong(0) == 2L * g1.getLong(1) * g1.getLong(2))
    val inverted = perfect.map { case (s, y) => (s, !y) }
    val g0 = Auc.aucCounts(inverted.toDF("s", "y"), col("s"), col("y"))
      .collect()(0)
    assert(g0.getLong(0) == 0L)
  }

  test("random labels on random scores agree with brute force") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300)((rnd.nextInt(20) / 10.0, rnd.nextBoolean()))
    val got = Auc.aucCounts(rows.toDF("s", "y").repartition(5),
      col("s"), col("y")).collect()(0)
    val (u2, np, nn) = bruteU2(rows)
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((u2, np, nn)))
  }

  test("null scores and labels are excluded") {
    val df = Seq[(Option[Double], Option[Boolean])](
      (Some(0.9), Some(true)), (None, Some(false)), (Some(0.5), None),
      (Some(0.1), Some(false))).toDF("s", "y")
    val got = Auc.aucCounts(df, col("s"), col("y")).collect()(0)
    assert((got.getLong(1), got.getLong(2)) == ((1L, 1L)))
    assert(got.getLong(0) == 2L)
  }

  test("prefix sum is partition-local: no global sort, windows keyed by pid") {
    // the FINAL single-row reduce is a legitimate SinglePartition exchange
    // over 3 longs; the scale requirement is that the cumulative-negatives
    // window never runs unpartitioned and nothing globally sorts the data
    val df = spark.range(0, 1000)
      .select((col("id") % 97).cast("double").as("s"),
        (col("id") % 3 === 0).as("y"))
    val plan = Auc.aucCounts(df, col("s"), col("y"))
      .queryExecution.executedPlan.toString
    assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined, plan)
    assert(!plan.contains("Window ["
      ) || plan.contains("], [__pid"), plan)
  }

  test("calibration bins: sizes, positives and score mass are exact") {
    val rows = (1 to 100).map(i => (i / 100.0, i % 3 == 0, i.toLong))
    val got = Auc.calibrationBins(rows.toDF("s", "y", "id"),
      col("s"), col("y"), Seq(col("id")), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(got.map(_._2).sum == 100)
    assert(got.map(_._3).sum == rows.count(_._2))
    // bin 0 holds ranks 1..25 → scores .01...25 → mass Σ i·1e4 for 1..25
    assert(got(0) == ((0L, 25L, (3 to 24 by 3).size.toLong,
      (1 to 25).map(_ * 10000L).sum)))
  }
}
