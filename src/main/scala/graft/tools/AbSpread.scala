package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B of the r22 row-aware Spread floor against the r21
  * pin-at-cap behavior, in ONE JVM (this host's single-thread speed drifts
  * ±50%, so alternating variants round-robin is the only trustworthy
  * comparison). Variant flip = `spark.graft.spread.rowsPerTask` (−1
  * restores pin-at-cap; default = row-aware), read per Spread call, so the
  * exact same gate closures run under both floors.
  *
  * A third kind of arm: a HUGE rowsPerTask drives every target to 1,
  * which for wideScan sites exactly reproduces the no-spread REVERT
  * (passthrough) — used to re-A/B the kept lineitem wideScan family
  * against its removal (VERDICT r21 item 2).
  *
  * Usage: runMain graft.tools.AbSpread <rounds> <rpt1,rpt2,...> <gates...>
  */
object AbSpread {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = args.headOption.flatMap(_.toIntOption).getOrElse(4)
    val variantsRpt: Seq[String] = args.lift(1)
      .map(_.split(',').toSeq).getOrElse(Seq("32768", "-1"))
    val names = args.drop(2).toSeq
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
    def setVariant(rpt: String): Unit =
      spark.conf.set("spark.graft.spread.rowsPerTask", rpt)

    // warm every variant once
    for (v <- variantsRpt; (_, fn) <- gates) { setVariant(v); timeOne(fn) }
    val t = scala.collection.mutable.Map[(String, String), List[Double]]()
      .withDefaultValue(Nil)
    // rotate the variant order each round: a fixed order hands the later
    // variant a warmer JIT/page cache (measured ~10-20% on this host)
    for (r <- 1 to rounds; (name, fn) <- gates;
        v <- variantsRpt.drop(r % variantsRpt.size) ++
          variantsRpt.take(r % variantsRpt.size)) {
      setVariant(v)
      t((name, v)) = timeOne(fn) :: t((name, v))
    }
    println("gate," + variantsRpt.map(v => s"min@$v").mkString(",") + ",runs")
    for ((name, _) <- gates) {
      val mins = variantsRpt.map(v => t((name, v)).min)
      println(f"$name," + mins.map(m => f"$m%.3f").mkString(",") + "," +
        variantsRpt.map(v =>
          t((name, v)).reverse.map(x => f"$x%.2f").mkString("|")).mkString(";"))
    }
    spark.stop()
  }
}
