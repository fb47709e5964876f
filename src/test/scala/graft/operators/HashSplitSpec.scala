package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class HashSplitSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("assignment is deterministic and independent of partitioning") {
    val a = spark.range(0, 1000)
      .select(col("id"), HashSplit.assign(col("id"), fr).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = spark.range(0, 1000).repartition(7)
      .select(col("id"), HashSplit.assign(col("id"), fr).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("split sizes approximate the requested fractions") {
    val counts = spark.range(0, 10000)
      .select(HashSplit.assign(col("id"), fr).as("s"))
      .groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 8000) < 300, counts.toString)
    assert(math.abs(counts("val") - 1000) < 150, counts.toString)
    assert(math.abs(counts("test") - 1000) < 150, counts.toString)
  }

  test("keying on a group column keeps whole groups on one side") {
    val df = spark.range(0, 600).select(
      col("id"), (col("id") % 20).as("grp"))
    val n = df.select(col("grp"), HashSplit.assign(col("grp"), fr).as("s"))
      .groupBy("grp").agg(countDistinct("s").as("k"))
      .where(col("k") =!= 1).count()
    assert(n == 0, "a group was split across assignments")
  }

  test("fractions summing above 1 or non-positive are rejected") {
    intercept[IllegalArgumentException] {
      HashSplit.assign(col("id"), Seq("a" -> 0.9, "b" -> 0.2))
    }
    intercept[IllegalArgumentException] {
      HashSplit.assign(col("id"), Seq("a" -> 0.5, "b" -> -0.1))
    }
  }

  test("last split absorbs rounding remainder (total coverage, no nulls)") {
    val nulls = spark.range(0, 2000)
      .select(HashSplit.assign(col("id"), Seq("x" -> (1.0 / 3),
        "y" -> (1.0 / 3), "z" -> (1.0 / 3))).as("s"))
      .where(col("s").isNull).count()
    assert(nulls == 0)
  }

  test("null keys get a null assignment, not a silent last-split landing") {
    val df = Seq(Some(1L), None, Some(3L)).toDF("id")
    val got = df.select(col("id"), HashSplit.assign(col("id"), fr).as("s"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)))
        -> Option(r.getString(1))).toMap
    assert(got(None).isEmpty)
    assert(got(Some(1L)).nonEmpty && got(Some(3L)).nonEmpty)
  }

  test("assignSql stays valid SQL for a single split and quotes names") {
    val one = HashSplit.assignSql("k", Seq("all" -> 1.0))
    assert(!one.contains("CASE  ELSE"), one)
    assert(one.contains("'all'"), one)
    val quoted = HashSplit.assignSql("k", Seq("o'brien" -> 0.5, "rest" -> 0.5))
    assert(quoted.contains("'o''brien'"), quoted)
  }

  test("a fraction below 1/buckets is rejected, not silently unassignable") {
    // 0.00005 of 10000 buckets floors to a zero-width range: the split
    // name would never be assigned and assignSql would emit a dead WHEN
    val e = intercept[IllegalArgumentException] {
      HashSplit.assign(col("id"),
        Seq("train" -> 0.9, "tiny" -> 0.00005, "rest" -> 0.09))
    }
    assert(e.getMessage.contains("tiny") && e.getMessage.contains("1/buckets"), e.getMessage)
    // the same fraction is fine with enough buckets
    HashSplit.assign(col("id"),
      Seq("train" -> 0.9, "tiny" -> 0.00005, "rest" -> 0.09), buckets = 1 << 20)
  }

  test("split is a pure projection: no shuffle in the plan") {
    val plan = spark.range(0, 100)
      .select(HashSplit.assign(col("id"), fr))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("stratifiedAssign: per-stratum sizes are exact to the row") {
    // strata of deliberately awkward sizes: 7, 10, 23
    val df = spark.range(0, 40).select(col("id"),
      when(col("id") < 7, "a").when(col("id") < 17, "b").otherwise("c")
        .as("g"))
    val counts = HashSplit
      .stratifiedAssign(df, Seq(col("g")), col("id"),
        Seq("train" -> 0.8, "test" -> 0.2), seed = 3L)
      .groupBy("g", "split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    for ((g, n) <- Seq(("a", 7L), ("b", 10L), ("c", 23L))) {
      val tr = math.ceil(0.8 * n).toLong
      assert(counts((g, "train")) == tr, s"$g train")
      assert(counts.getOrElse((g, "test"), 0L) == n - tr, s"$g test")
    }
  }

  test("stratifiedAssign is invariant to partitioning and row order") {
    val df = spark.range(0, 300).select(col("id"), (col("id") % 5).as("g"))
    def run(d: org.apache.spark.sql.DataFrame) = HashSplit
      .stratifiedAssign(d, Seq(col("g")), col("id"),
        Seq("x" -> 0.5, "y" -> 0.5), seed = 11L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(run(df) == run(df.orderBy(rand(9)).repartition(13)))
  }

  test("stratifiedAssign: fractions summing below 1 hold out the tail") {
    val df = spark.range(0, 100).select(col("id"), lit("g").as("g"))
    val counts = HashSplit
      .stratifiedAssign(df, Seq(col("g")), col("id"),
        Seq("sample" -> 0.1))
      .groupBy("split").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(counts(Some("sample")) == 10L)
    assert(counts(None) == 90L)
  }

  test("kFold: full [0,k) range, balanced, seed-decorrelated, null-safe") {
    val folds = spark.range(0, 5000)
      .select(HashSplit.kFold(col("id"), k = 5, seed = 7L).as("f"))
      .groupBy("f").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folds.keySet == Set(0L, 1L, 2L, 3L, 4L))
    // md5-uniform: each fold within 20% of n/k
    folds.values.foreach(n => assert(math.abs(n - 1000) < 200, s"fold=$n"))
    // a different seed reassigns a nontrivial share of keys
    val moved = spark.range(0, 5000)
      .select(HashSplit.kFold(col("id"), 5, 7L).as("a"),
        HashSplit.kFold(col("id"), 5, 8L).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(moved > 3000, s"seeds correlated: only $moved/5000 moved")
    // null key -> null fold (concat_ws would silently hash the bare seed)
    val nf = Seq(Option(1L), None).toDF("id")
      .select(HashSplit.kFold(col("id"), 5).as("f")).collect()
    assert(nf.count(_.isNullAt(0)) == 1)
    intercept[IllegalArgumentException](HashSplit.kFold(col("id"), 1))
    ()
  }

  test("stratifiedAssign rejects bad fractions") {
    val df = spark.range(0, 10).select(col("id"), lit("g").as("g"))
    intercept[IllegalArgumentException] {
      HashSplit.stratifiedAssign(df, Seq(col("g")), col("id"),
        Seq("a" -> 0.9, "b" -> 0.2))
    }
    intercept[IllegalArgumentException] {
      HashSplit.stratifiedAssign(df, Seq(col("g")), col("id"), Seq.empty)
    }
  }
}
