package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A/B: does an explicit hash-repartition after the single-row-group base
  * table read (guide §2.5 "input skew — repartition immediately after the
  * read") beat the current single-task fused scan at bench scale?
  * Interleaved min-of-N in ONE JVM. Variants share identical downstream
  * logic; only the spread differs.
  */
object SpreadProf {
  private val D = DecimalType(18, 2)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def load(name: String) = graft.Tables.load(spark, sfDir, name)
    def spread(df: DataFrame, key: String) = df.repartition(cpus, col(key))

    def discPrice: org.apache.spark.sql.Column =
      col("l_extendedprice").cast(D) * (lit(1).cast(D) - col("l_discount").cast(D))

    // q1 shape: pure aggregation over lineitem
    def q1(li: DataFrame): Long =
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"),
          sum(discPrice).cast("double").as("sum_disc_price"),
          count(lit(1)).as("n")).count()

    // q2 shape: join + agg + topN
    def q2(li: DataFrame, o: DataFrame, c: DataFrame): Long =
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(sum(discPrice).cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(10).count()

    // q20 shape: exact jaccard pairs over documents
    def q20(docs: DataFrame): Long =
      graft.text.NearDup.jaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8, maxShingleFreq = 100).count()

    // q112 shape: blocked fuzzy matching over customer names
    def q112(c: DataFrame): Long =
      graft.text.FuzzyJoin.pairDistanceCounts(c, "c_custkey", "c_name",
        substring(col("c_name"), 1, 16), maxDist = 2).count()

    // q85 shape: one-pass text-expression aggregation over documents
    def q85(docs: DataFrame): Long = {
      val ta = graft.text.TextAnalysis
      docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("n_chars"),
          sum(ta.tokenCount(col("text"))).cast("long").as("n_tokens"),
          sum(floor(ta.qualityScore(col("text")) * lit(1000000.0) + lit(0.5))
            .cast("long")).as("quality_micro"))
        .count()
    }

    def timed(f: => Unit): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val variants: Seq[(String, () => Double)] = Seq(
      "q1_plain" -> (() => timed(q1(load("lineitem")))),
      "q1_spread" -> (() => timed(q1(spread(load("lineitem"), "l_orderkey")))),
      "q2_plain" -> (() => timed(q2(load("lineitem"), load("orders"), load("customer")))),
      "q2_spread" -> (() => timed(q2(spread(load("lineitem"), "l_orderkey"),
        spread(load("orders"), "o_orderkey"), load("customer")))),
      "q20_plain" -> (() => timed(q20(load("documents")))),
      "q20_spread" -> (() => timed(q20(spread(load("documents"), "doc_id")))),
      "q112_plain" -> (() => timed(q112(load("customer")))),
      "q112_spread" -> (() => timed(q112(spread(load("customer"), "c_custkey")))),
      "q85_plain" -> (() => timed(q85(load("documents")))),
      "q85_spread" -> (() => timed(q85(spread(load("documents"), "doc_id")))))

    // warmup every variant once
    variants.foreach { case (_, f) => f() }
    val rounds = 4
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to rounds; (name, f) <- variants)
      times(name) = f() :: times(name)
    println("variant,min_s,med_s,runs")
    for ((name, _) <- variants) {
      val ts = times(name).sorted
      println(f"$name,${ts.head}%.3f,${ts(ts.size / 2)}%.3f," +
        ts.map(t => f"$t%.2f").mkString("|"))
    }
    spark.stop()
  }
}
