package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkFixture, Tables}

class BloomPruneSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("no false negatives: every dim key passes its own filter") {
    val dim = Tables.load(spark, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val bitmap = BloomPrune.build(dim, "c_custkey")
    val misses = dim
      .where(!BloomPrune.mightContain(bitmap, col("c_custkey")))
      .count()
    assert(misses == 0, s"$misses dim keys rejected by their own bloom filter")
  }

  test("pruned join is bit-identical to the plain join") {
    val dim = Tables.load(spark, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val fact = Tables.load(spark, dir, "orders")
    val pruned = BloomPrune.prunedJoin(fact, "o_custkey", dim, "c_custkey")
    val plain = fact.join(dim, col("o_custkey") === col("c_custkey"))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("filter is selective: non-matching fact rows are mostly dropped") {
    val dim = Tables.load(spark, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val fact = Tables.load(spark, dir, "orders")
    val bitmap = BloomPrune.build(dim, "c_custkey")
    val total = fact.count()
    val kept = fact
      .where(BloomPrune.mightContain(bitmap, col("o_custkey"))).count()
    val matched = fact.join(dim, col("o_custkey") === col("c_custkey"),
      "left_semi").count()
    // with 64k bits for a few hundred keys the false-positive rate is tiny:
    // kept must be >= the true matches and well under the total
    assert(kept >= matched, s"bloom dropped true matches: kept=$kept matched=$matched")
    assert(kept < total,
      s"bloom filter pruned nothing: kept=$kept of $total (matched=$matched)")
    assert(kept - matched <= (total - matched) / 10,
      s"false-positive rate too high: kept=$kept matched=$matched total=$total")
  }

  test("empty dim side rejects everything") {
    val dim = Seq.empty[Long].toDF("k")
    val bitmap = BloomPrune.build(dim, "k")
    assert(bitmap.forall(_ == 0L))
    val kept = spark.range(100)
      .where(BloomPrune.mightContain(bitmap, col("id"))).count()
    assert(kept == 0)
  }

  test("mismatched key types fail fast instead of silently dropping rows") {
    val fact = Seq(1, 2, 3).toDF("fk") // int
    val dim = Seq(1L, 2L).toDF("k")    // long — xxhash64 hashes differently
    val e = intercept[IllegalArgumentException] {
      BloomPrune.prunedJoin(fact, "fk", dim, "k")
    }
    assert(e.getMessage.contains("identical key types"))
  }

  test("membership test stays codegen-compiled (no UDF in the plan)") {
    val bitmap = BloomPrune.build(Seq(1L, 2L).toDF("k"), "k")
    val plan = spark.range(10)
      .where(BloomPrune.mightContain(bitmap, col("id")))
      .queryExecution.executedPlan.toString
    // "*(n)" prefix marks whole-stage-codegen'd operators in the plan string
    assert(plan.contains("*(1) Filter"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLFunction"), plan)
  }
}
