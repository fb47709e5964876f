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
    val bf = BloomPrune.build(dim, "c_custkey")
    val misses = dim
      .where(!BloomPrune.mightContain(bf, col("c_custkey")))
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
    val bf = BloomPrune.build(dim, "c_custkey")
    val total = fact.count()
    val kept = fact
      .where(BloomPrune.mightContain(bf, col("o_custkey"))).count()
    val matched = fact.join(dim, col("o_custkey") === col("c_custkey"),
      "left_semi").count()
    // auto-sized bitmap keeps the false-positive rate tiny: kept must be
    // >= the true matches and well under the total
    assert(kept >= matched, s"bloom dropped true matches: kept=$kept matched=$matched")
    assert(kept < total,
      s"bloom filter pruned nothing: kept=$kept of $total (matched=$matched)")
    assert(kept - matched <= (total - matched) / 10,
      s"false-positive rate too high: kept=$kept matched=$matched total=$total")
  }

  test("auto-sizing: FP rate stays bounded at n ~ capacity of the old fixed 64Kbit") {
    // 100k distinct keys — the dim size where a fixed 64 Kbit bitmap
    // saturates (fill -> 1, FP -> 1). Auto-sizing must keep the filter
    // useful: fill factor ~0.25, FP rate within 3x of the ~1.7%
    // theoretical value for 10 bits/key and 3 probes.
    val n = 100000L
    val dim = spark.range(0, n).select(col("id").as("k"))
    val bf = BloomPrune.build(dim, "k")
    assert(bf.numBits >= 10 * n, s"bitmap undersized: ${bf.numBits} bits for $n keys")
    assert(bf.fillFactor < 0.5, s"saturated: fill=${bf.fillFactor}")
    // probe 100k keys strictly disjoint from the built set
    val probes = spark.range(n, 2 * n).select(col("id").as("k"))
    val fp = probes.where(BloomPrune.mightContain(bf, col("k"))).count()
    val fpRate = fp.toDouble / n
    assert(fpRate < 0.05, s"FP rate $fpRate at n=$n (expected ~0.017)")
    // and the prune still drops rows: a fact side with 1% true matches
    // must lose the overwhelming majority of its rows
    val fact = spark.range(0, 100 * n, 100).select((col("id") / 100 + n - 1000).cast("long").as("k"))
    val kept = fact.where(BloomPrune.mightContain(bf, col("k"))).count()
    assert(kept < fact.count() / 2,
      s"prune is a no-op at 100k-key dim: kept $kept of ${fact.count()}")
  }

  test("sizedBits: power of two, >=10 bits/key, clamped to the cap") {
    assert(BloomPrune.sizedBits(0) == 1024)
    assert(BloomPrune.sizedBits(100) == 1024)
    assert(BloomPrune.sizedBits(15000) == 262144) // old 64Kbit cliff: 4x the keys, sized 4x up
    assert(BloomPrune.sizedBits(100000) == 1 << 20)
    assert(BloomPrune.sizedBits(1L << 40) == BloomPrune.MaxBits)
    val exact = BloomPrune.sizedBits(1 << 16, bitsPerKey = 16) // want is already a pow2
    assert(exact == 1 << 20)
  }

  test("empty dim side rejects everything") {
    val dim = Seq.empty[Long].toDF("k")
    val bf = BloomPrune.build(dim, "k")
    assert(bf.words.forall(_ == 0L))
    val kept = spark.range(100)
      .where(BloomPrune.mightContain(bf, col("id"))).count()
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
    val bf = BloomPrune.build(Seq(1L, 2L).toDF("k"), "k")
    val plan = spark.range(10)
      .where(BloomPrune.mightContain(bf, col("id")))
      .queryExecution.executedPlan.toString
    // "*(n)" prefix marks whole-stage-codegen'd operators in the plan string
    assert(plan.contains("*(1) Filter"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLFunction"), plan)
  }

  test("native sketch: no false negatives, bounded false positives") {
    val dim = spark.range(0, 100000, 2).toDF("k")
    val bloom = BloomPrune.buildNative(dim, "k", 50000, 500000)
    val probe = spark.range(0, 100000).toDF("k")
      .withColumn("hit", BloomPrune.mightContainNative(bloom, col("k")))
    val missedTrue = probe.where(col("k") % 2 === 0 && !col("hit")).count()
    assert(missedTrue == 0, s"$missedTrue true keys rejected")
    val fp = probe.where(col("k") % 2 === 1 && col("hit")).count()
    assert(fp < 5000, s"false-positive rate too high: $fp of 50000")
  }

  test("auto-sizing above the literal cap switches to the native sketch: " +
      "join stays bit-identical, plan carries no array-literal bitmap") {
    val dim = Tables.load(spark, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val fact = Tables.load(spark, dir, "orders")
    // cap forced tiny so this dim "exceeds" it — the decision logic is the
    // same one a >1.6M-key dim hits at the real MaxBits
    val pruned = BloomPrune.prunedJoin(fact, "o_custkey", dim, "c_custkey",
      literalBitsCap = 64)
    val plain = fact.join(dim, col("o_custkey") === col("c_custkey"))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    val hasNative = pruned.queryExecution.analyzed.exists(
      _.expressions.exists(_.exists(_.isInstanceOf[BloomFilterMightContain])))
    assert(hasNative, "expected the native BloomFilterMightContain probe")
    // the literal path's signature operator is element_at over the bitmap
    // array — absent on the native path
    assert(!pruned.queryExecution.analyzed.toString.contains("element_at"))
  }
}
