package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkFixture

class GlobalOrderSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def sample = spark.range(0, 500).select(
    col("id"),
    (col("id") * 37 % 11).as("k"), // duplicate sort values force tie-breaks
    (col("id") % 7 + 1).as("v"))

  test("rank + prefix sum equal the single-task global window reference") {
    val got = GlobalOrder.rankWithPrefixSum(sample,
      sortCols = Seq(col("k"), col("id")), rankCol = "r",
      sumOf = Some((col("v"), "cum")), numPartitions = 5)
    val w = Window.orderBy(col("k"), col("id"))
    val ref = sample
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val a = got.select("id", "r", "cum").as[(Long, Long, Long)].collect().sorted.toSeq
    val b = ref.select("id", "r", "cum").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("result is independent of the partition count") {
    def run(n: Int) = GlobalOrder.rankWithPrefixSum(
      sample.repartition(3), Seq(col("k").desc, col("id")), "r",
      Some((col("v"), "cum")), numPartitions = n)
      .select("id", "r", "cum").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(run(2) == run(13))
  }

  test("no single-task stage: the plan never collapses to SinglePartition") {
    val plan = GlobalOrder.rankWithPrefixSum(sample,
      Seq(col("k"), col("id")), "r", Some((col("v"), "cum")), numPartitions = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global-order primitive must not plan a single-partition exchange:\n$plan")
  }

  test("reserved helper names refuse instead of silently clobbering input " +
      "columns (case-insensitive, like analysis)") {
    val e = intercept[IllegalArgumentException](GlobalOrder.rankWithPrefixSum(
      sample.withColumnRenamed("v", "__PID"), Seq(col("k")), "r"))
    assert(e.getMessage.contains("__pid"), e.getMessage)
  }
}
