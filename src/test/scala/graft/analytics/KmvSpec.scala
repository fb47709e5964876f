package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class KmvSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("bounded-heap path equals the naive distinct-sort-limit path") {
    val df = spark.range(0, 5000)
      .select((col("id") % 1300).cast("string").as("v")).repartition(7)
    val fast = Kmv.kSmallestDistinctHashes(df, col("v"), 64)
      .collect().map(_.getLong(0)).toSeq
    val naive = df.select(Kmv.hash52(col("v")).as("hv"))
      .distinct().orderBy("hv").limit(64)
      .collect().map(_.getLong(0)).toSeq
    assert(fast == naive)
    assert(fast.size == 64 && fast == fast.sorted && fast.distinct == fast)
  }

  test("sketch merges: k-min of a union == k-min of the two k-mins") {
    val a = spark.range(0, 800).select(col("id").cast("string").as("v"))
    val b = spark.range(500, 1500).select(col("id").cast("string").as("v"))
    val k = 32
    val whole = Kmv.kSmallestDistinctHashes(a.union(b), col("v"), k)
      .collect().map(_.getLong(0)).toSeq
    val merged = Kmv.kSmallestDistinctHashes(a, col("v"), k)
      .union(Kmv.kSmallestDistinctHashes(b, col("v"), k))
      .distinct().orderBy("hv").limit(k)
      .collect().map(_.getLong(0)).toSeq
    assert(whole == merged)
  }

  test("estimate is exact below k and within sampling error above") {
    val small = spark.range(0, 100).select(col("id").cast("string").as("v"))
    val rs = Kmv.distinctEstimate(small, col("v"), 256).collect()(0)
    assert(rs.getLong(0) == 100L && rs.getLong(2) == 100L)
    val big = spark.range(0, 20000)
      .select(col("id").cast("string").as("v"))
    val rb = Kmv.distinctEstimate(big, col("v"), 256).collect()(0)
    val est = rb.getLong(2)
    // stderr ~ 1/sqrt(254) ~ 6.3%; allow 4 sigma
    assert(math.abs(est - 20000) < 20000 * 0.25, s"est=$est")
  }

  test("estimate is a pure function of the value SET (duplicates ignored)") {
    val once = spark.range(0, 3000).select(col("id").cast("string").as("v"))
    val tripled = once.union(once).union(once).repartition(11)
    val e1 = Kmv.distinctEstimate(once, col("v"), 128).collect()(0).getLong(2)
    val e3 = Kmv.distinctEstimate(tripled, col("v"), 128).collect()(0).getLong(2)
    assert(e1 == e3)
  }

  test("intersection estimate tracks the true shared-key count") {
    // A = 0..4999, B = 3000..9999: true intersection 2000, union 10000
    val a = spark.range(0, 5000).select(col("id").cast("string").as("v"))
    val b = spark.range(3000, 10000).select(col("id").cast("string").as("v"))
    val r = Kmv.intersectionEstimate(a, col("v"), b, col("v"), 256)
      .collect()(0)
    val union = r.getLong(3); val inter = r.getLong(4)
    assert(math.abs(union - 10000) < 2500, s"union_est=$union")
    assert(math.abs(inter - 2000) < 900, s"inter_est=$inter")
  }

  test("intersection estimate is exact when both sides fit the sketch") {
    val a = spark.range(0, 60).select(col("id").cast("string").as("v"))
    val b = spark.range(40, 100).select(col("id").cast("string").as("v"))
    val r = Kmv.intersectionEstimate(a, col("v"), b, col("v"), 256)
      .collect()(0)
    assert(r.getLong(0) == 100L)  // union fill
    assert(r.getLong(2) == 20L)   // matches = exact intersection
    assert(r.getLong(3) == 100L && r.getLong(4) == 20L)
  }

  test("disjoint key sets estimate zero intersection") {
    val a = spark.range(0, 5000).select(concat(lit("a"), col("id")).as("v"))
    val b = spark.range(0, 5000).select(concat(lit("b"), col("id")).as("v"))
    val r = Kmv.intersectionEstimate(a, col("v"), b, col("v"), 128)
      .collect()(0)
    assert(r.getLong(2) == 0L && r.getLong(4) == 0L)
  }

  test("group aggregator equals the window-rank formulation per group") {
    val df = spark.range(0, 6000)
      .select((col("id") % 4).cast("string").as("g"),
        (col("id") % 700).cast("string").as("v")).repartition(9)
    val got = Kmv.groupDistinctEstimate(df, Seq("g"), col("v"), 32)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // reference: per-group k smallest distinct hashes via plain ops
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("hv")
    val ref = df.select(col("g"), Kmv.hash52(col("v")).as("hv")).distinct()
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 32)
      .groupBy("g").agg(count(lit(1)).as("n"), max("hv").as("kth"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (g, (n, kth, _)) =>
      assert((n, kth) == ref(g), s"group $g") }
  }

  test("group aggregator: small groups are exact, estimates track truth") {
    val df = spark.range(0, 10000).select(
      when(col("id") < 20, "tiny").otherwise("big").as("g"),
      col("id").cast("string").as("v"))
    val got = Kmv.groupDistinctEstimate(df, Seq("g"), col("v"), 128)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got("tiny") == 20L)
    assert(math.abs(got("big") - 9980) < 9980 * 0.35, got("big").toString)
  }

  test("group aggregator property: random partitions/merges == TreeSet reference") {
    // the sorted-array reduce/merge is the most intricate low-level code
    // here; drive it through real partitioned aggregation on random data
    // and compare against an independent driver-side TreeSet k-min
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 5) {
      val k = Seq(2, 3, 8, 33, 64)(trial - 1)
      val n = 200 + rnd.nextInt(2000)
      val vals = Seq.fill(n)(rnd.nextInt(300).toString)
      val df = vals.toDF("v").repartition(1 + rnd.nextInt(12))
      val got = Kmv.groupDistinctEstimate(df.withColumn("g", lit("x")),
        Seq("g"), col("v"), k).collect()(0)
      val hashes = vals.distinct.map { s =>
        val md = java.security.MessageDigest.getInstance("MD5")
        java.lang.Long.parseLong(md.digest(s.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(13), 16)
      }.distinct.sorted.take(k)
      assert(got.getLong(1) == hashes.size.toLong, s"trial $trial fill")
      assert(got.getLong(2) == hashes.last, s"trial $trial kth")
    }
  }

  test("nulls are skipped; k < 2 rejected") {
    val df = Seq(Some("a"), None, Some("b")).toDF("v")
    assert(Kmv.distinctEstimate(df, col("v"), 16).collect()(0).getLong(0) == 2L)
    intercept[IllegalArgumentException] {
      Kmv.kSmallestDistinctHashes(df, col("v"), 1)
    }
  }
}
