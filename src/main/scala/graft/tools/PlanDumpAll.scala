package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for SparkEntry gates to files — the
  * optimization-round plan evidence (`plans/r21/<name>_<tag>.txt`).
  *
  * Usage: runMain graft.tools.PlanDumpAll <outDir> <tag> [names...]
  * No names = every declared query. Runs at the bench sf (env
  * SPARK_GRAFT_SF_DIR, default sf0.1) with the bench session shape so the
  * dumped plans are the ones the bench times. Queries whose construction
  * is eager (streaming gates, fixture builders) execute that part once —
  * same as any bench warmup pass.
  */
object PlanDumpAll {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r21")
    val tag = args.lift(1).getOrElse("before")
    val names = if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
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
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"SKIP unknown query $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
              plan.getBytes("UTF-8"))
            println(s"OK   $name")
          } catch {
            case e: Throwable =>
              println(s"FAIL $name: ${e.getMessage.take(200)}")
          }
      }
    }
    spark.stop()
  }
}
