package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the executed plan of one SparkEntry gate.
  * `runMain graft.tools.PlanDump <queryName> [sfDir]` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_pricing_summary")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    println(df.queryExecution.executedPlan.toString)
  }
}
