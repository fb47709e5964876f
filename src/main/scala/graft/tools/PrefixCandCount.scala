package graft.tools

import org.apache.spark.sql.SparkSession

/** Candidate-count evidence for the r22 PPJoin positional filter. */
object PrefixCandCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val sh = graft.text.NearDup.shingleTable(docs, "doc_id", "text", 3)
    println("jaccard_candidates=" +
      graft.text.PrefixFilterJoin.candidatePairs(sh, 0.8).count())
    spark.stop()
  }
}
