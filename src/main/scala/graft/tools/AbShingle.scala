package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B: hashed (long) vs string shingle keys through the full
  * Jaccard pair pipeline — the only trustworthy comparison on this noisy
  * box (single runs swing ±50%; interleaving in one JVM cancels drift). */
object AbShingle {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text"))

    def shString: DataFrame = docs.select(col("doc_id"),
      explode(graft.text.TextAnalysis.shingles(col("text"), 3)).as("s"))
    def shHashed: DataFrame = shString
      .select(col("doc_id"), xxhash64(col("s")).as("s"))

    def run(sh: DataFrame): Long =
      graft.text.NearDup.jaccardPairsFromShingles(sh, 0.8, 100).count()

    // warmup both
    run(shString); run(shHashed)
    val n = 4
    val times = Array.fill(2)(List.empty[Double])
    (0 until n).foreach { _ =>
      Seq(("string", () => run(shString), 0), ("hashed", () => run(shHashed), 1))
        .foreach { case (_, f, i) =>
          spark.catalog.clearCache(); System.gc()
          val t0 = System.nanoTime(); f(); val dt = (System.nanoTime() - t0) / 1e9
          times(i) = times(i) :+ dt
        }
    }
    println(f"string: ${times(0).map(t => f"$t%.2f").mkString(" ")} median=${times(0).sorted.apply(n / 2)}%.2f")
    println(f"hashed: ${times(1).map(t => f"$t%.2f").mkString(" ")} median=${times(1).sorted.apply(n / 2)}%.2f")
    spark.stop()
  }
}
