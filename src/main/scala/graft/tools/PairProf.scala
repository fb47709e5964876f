package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Size/time decomposition of the exact-Jaccard pair pipeline (q20/q44/
  * q59 family) at bench scale: row counts of each intermediate and
  * noop-timed sub-pipelines, to locate the CPU (guide §1.4).
  */
object PairProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    val docs = graft.Tables.load(spark, sfDir, "documents")
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val sh = graft.text.NearDup.shingleTable(docs, "doc_id", "text", 3)
    // warm
    noop(sh)
    timed("shingleTable rows")(println("  n=" + sh.count()))
    timed("shingleTable noop")(noop(sh))
    val sh0 = graft.operators.Spread.byKey(sh, col("s"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("s")))
    timed("window df noop")(noop(sh0))
    val capped = sh0.where(col("df") <= 100)
    val spine = capped.where(col("df") >= 2).select("doc_id", "s")
    timed("spine rows")(println("  n=" + spine.count()))
    val joined = spine.alias("a").join(spine.alias("b"),
      col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
    timed("candidate join rows")(println("  n=" + joined.count()))
    val pairs = joined
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    timed("grouped pairs rows")(println("  n=" + pairs.count()))
    timed("full jaccardPairs noop")(noop(graft.text.NearDup.jaccardPairs(
      docs, "doc_id", "text", 3, 0.8, 100)))
    timed("full jaccardPairs noop again")(noop(graft.text.NearDup.jaccardPairs(
      docs, "doc_id", "text", 3, 0.8, 100)))
    spark.stop()
  }
}
