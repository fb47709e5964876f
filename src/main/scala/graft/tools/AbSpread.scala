package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B of the r22 row-aware Spread floor against the r21
  * pin-at-cap behavior, in ONE JVM (this host's single-thread speed drifts
  * ±50%, so alternating variants round-robin is the only trustworthy
  * comparison). Variant flip = `spark.graft.spread.rowsPerTask` (−1
  * restores pin-at-cap; default = row-aware), read per Spread call, so the
  * exact same gate closures run under both floors.
  *
  * Usage: runMain graft.tools.AbSpread <rounds> <gate names...>
  */
object AbSpread {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = args.headOption.flatMap(_.toIntOption).getOrElse(4)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gates = names.map(n => n -> graft.SparkEntry.queries(n))

    def timeOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    def setVariant(rowAware: Boolean): Unit =
      spark.conf.set("spark.graft.spread.rowsPerTask",
        if (rowAware) "32768" else "-1")

    // warm both variants once
    for (ra <- Seq(true, false); (_, fn) <- gates) { setVariant(ra); timeOne(fn) }
    val t = scala.collection.mutable.Map[(String, Boolean), List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to rounds; (name, fn) <- gates; ra <- Seq(true, false)) {
      setVariant(ra)
      t((name, ra)) = timeOne(fn) :: t((name, ra))
    }
    println("gate,rowaware_min,pincap_min,delta,ra_runs,cap_runs")
    for ((name, _) <- gates) {
      val a = t((name, true)).min; val b = t((name, false)).min
      println(f"$name,$a%.3f,$b%.3f,${a - b}%+.3f," +
        t((name, true)).reverse.map(x => f"$x%.2f").mkString("|") + "," +
        t((name, false)).reverse.map(x => f"$x%.2f").mkString("|"))
    }
    spark.stop()
  }
}
