package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch A/B profiling harness. The box's timings are ±50% noisy, so
  * variants must interleave in ONE JVM — never compare across runs. */
object Prof {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")

    import graft.text.{NearDup, TextAnalysis}

    // A: the funnel's PRE-round-4 shape — exact stage recomputed per
    // consumer. Hand-built: the shipped Curation.funnel now checkpoints
    // this stage itself, so calling it here would A/B two identical plans.
    def funnelA(): Long = {
      val text = col("text")
      val lang = docs.where(TextAnalysis.langId(text).isInCollection(Seq("en")))
      val quality = lang.where(TextAnalysis.qualityScore(text) >= 0.3)
      val exact = quality
        .withColumn("__fp", TextAnalysis.fingerprint(text))
        .withColumn("__keep", min(col("doc_id")).over(Window.partitionBy("__fp")))
        .where(col("doc_id") === col("__keep"))
        .drop("__fp", "__keep")
      val pairs = NearDup.jaccardPairs(exact, "doc_id", "text", 3, 0.8, 100)
      val nonReps = NearDup.duplicateComponents(pairs)
        .where(col("doc_id") =!= col("component"))
        .select(col("doc_id"))
      exact.join(nonReps, Seq("doc_id"), "left_anti").count()
    }

    // B: identical logic, but the post-filter `exact` frame is
    // checkpointed once so lang/quality/md5/window don't recompute for
    // the pair stage, the sizes, and the anti-join left side
    def funnelB(): Long = {
      val text = col("text")
      val lang = docs.where(TextAnalysis.langId(text).isInCollection(Seq("en")))
      val quality = lang.where(TextAnalysis.qualityScore(text) >= 0.3)
      val exact = quality
        .withColumn("__fp", TextAnalysis.fingerprint(text))
        .withColumn("__keep", min(col("doc_id")).over(Window.partitionBy("__fp")))
        .where(col("doc_id") === col("__keep"))
        .drop("__fp", "__keep")
        .localCheckpoint()
      val pairs = NearDup.jaccardPairs(exact, "doc_id", "text", 3, 0.8, 100)
      val nonReps = NearDup.duplicateComponents(pairs)
        .where(col("doc_id") =!= col("component"))
        .select(col("doc_id"))
      exact.join(nonReps, Seq("doc_id"), "left_anti").count()
    }

    time("warm A")(funnelA())
    time("warm B")(funnelB())
    for (r <- 1 to 3) {
      time(s"r$r funnel recompute")(funnelA())
      time(s"r$r funnel checkpointed")(funnelB())
    }
    spark.stop()
  }
}
