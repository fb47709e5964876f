package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness for plan iteration (not part of the library
  * surface): times labelled stages of the slow bench queries in one JVM so
  * A/B comparisons aren't poisoned by this box's noisy single-run timings. */
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

    // warmup
    time("warmup count")(docs.count())

    for (round <- 1 to 3) {
      val pairs = time(s"r$round jaccardPairs") {
        val p = graft.text.NearDup.jaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.8, maxShingleFreq = 100)
        p.count(); p
      }
      time(s"r$round duplicateComponents") {
        graft.text.NearDup.duplicateComponents(pairs).count()
      }
      time(s"r$round admitIncremental") {
        graft.text.Curation.admitIncremental(
          docs.where(col("doc_id") % 2 === 0),
          docs.where(col("doc_id") % 2 === 1),
          "doc_id", "text").select("doc_id").count()
      }
    }
    spark.stop()
  }
}
