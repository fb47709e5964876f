package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkFixture, Tables}

class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("co-bucketed join plans with zero shuffle Exchanges and matches plain join") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_orderpriority")
    val base = SparkFixture.tmpDir("graft-buckets-").toString
    Bucketing.writeBucketed(li, "bk_lineitem", s"$base/li",
      Seq("l_orderkey"), numBuckets = 4)
    Bucketing.writeBucketed(o, "bk_orders", s"$base/o",
      Seq("o_orderkey"), numBuckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val orderingConf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prevOrdering = spark.conf.get(orderingConf)
    try {
      // force the sort-merge path: with broadcast on, the small sf fixture
      // would broadcast and the no-Exchange assert would pass vacuously
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def plan = Bucketing.read(spark, "bk_lineitem")
        .join(Bucketing.read(spark, "bk_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      val p1 = plan
      assert(p1.contains("SortMergeJoin"), p1)
      assert(!"Exchange (hash|range|single)partitioning".r
        .findFirstIn(p1).isDefined,
        s"co-bucketed join must not shuffle either side:\n$p1")
      // with bucket-scan ordering reporting on (off by default since 3.0 —
      // it lists files at planning time), the single-file-per-bucket sorted
      // layout writeBucketed produces also elides the merge-join Sorts
      spark.conf.set(orderingConf, "true")
      val p2 = plan
      assert(!p2.contains("Sort "),
        s"bucket-sorted single-file buckets must make the SMJ sort-free:\n$p2")
      val joined = Bucketing.read(spark, "bk_lineitem")
        .join(Bucketing.read(spark, "bk_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val expect = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set(orderingConf, prevOrdering)
      Bucketing.drop(spark, "bk_lineitem", purge = true)
      Bucketing.drop(spark, "bk_orders", purge = true)
    }
  }

  test("groupBy on the bucket key aggregates without an Exchange") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val base = SparkFixture.tmpDir("graft-buckets-agg-").toString
    Bucketing.writeBucketed(li, "bk_li_agg", s"$base/li",
      Seq("l_orderkey"), numBuckets = 4)
    try {
      val agg = Bucketing.read(spark, "bk_li_agg")
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!"Exchange (hash|range|single)partitioning".r
        .findFirstIn(plan).isDefined,
        s"bucket-keyed aggregation must not shuffle:\n$plan")
      assert(agg.count() == li.select("l_orderkey").distinct().count())
    } finally Bucketing.drop(spark, "bk_li_agg", purge = true)
  }

  test("drop purge removes catalog entry and files") {
    import spark.implicits._
    val base = SparkFixture.tmpDir("graft-buckets-drop-").toString
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    Bucketing.writeBucketed(df, "bk_tmp", s"$base/t", Seq("k"), 2)
    assert(spark.catalog.tableExists("bk_tmp"))
    Bucketing.drop(spark, "bk_tmp", purge = true)
    assert(!spark.catalog.tableExists("bk_tmp"))
    assert(!new java.io.File(s"$base/t").exists()
      || new java.io.File(s"$base/t").list().isEmpty)
  }
}
