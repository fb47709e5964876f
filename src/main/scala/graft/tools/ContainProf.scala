package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ContainProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    def timed(l: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$l: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val cands = graft.text.PrefixFilterJoin.containmentCandidates(
      docs, "doc_id", "text", 3, 0.9)
    noop(cands) // warm
    timed("cand rows")(println("  n=" + cands.count()))
    timed("cand noop")(noop(cands))
    timed("full containmentPairs")(noop(
      graft.text.PrefixFilterJoin.containmentPairs(docs, "doc_id", "text", 3, 0.9)))
    timed("full again")(noop(
      graft.text.PrefixFilterJoin.containmentPairs(docs, "doc_id", "text", 3, 0.9)))
    spark.stop()
  }
}
