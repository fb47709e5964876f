package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump the CANDIDATE-stage plans of the prefix-filter joins (r22 plan
  * evidence): the gates lazily checkpoint the candidate frame, so the
  * gate-level dump shows only a LogicalRDD where the positional filter
  * lives — this dumps the candidate subplans themselves.
  *
  * Usage: runMain graft.tools.PrefixPlanDump <outDir> <tag>
  */
object PrefixPlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r22")
    val tag = args.lift(1).getOrElse("after")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val sh = graft.text.NearDup.shingleTable(docs, "doc_id", "text", 3)
    val dumps = Seq(
      "q102_prefix_candidates" ->
        graft.text.PrefixFilterJoin.candidatePairs(sh, 0.8),
      "q124_containment_candidates" ->
        graft.text.PrefixFilterJoin.containmentCandidates(
          docs, "doc_id", "text", 3, 0.9))
    dumps.foreach { case (name, df) =>
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"OK   $name")
    }
    spark.stop()
  }
}
