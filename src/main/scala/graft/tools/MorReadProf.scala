package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B cost of the DSv2 engine-read FALLBACK (`EngineReadScanBuilder`'s
  * `V1Scan`/`buildScan().rdd` bridge — row-based, loses columnar
  * batching) vs the engine's own read of the SAME merge-on-read snapshot
  * (columnar parquet scans under the delete anti-join). Decides verdict
  * item "native DSv2 MoR scan": if the bridge penalty is small, the V1
  * fallback stays; if large, the scan needs a native DSv2 Batch.
  *
  * Interleaved A/B in one JVM, min-of-N per variant (this host drifts
  * ±50% across runs); wide-aggregate and narrow-projection shapes. */
object MorReadProf {
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
    val wh = java.nio.file.Files.createTempDirectory("graft-morread-").toString
    val lh = graft.Lakehouse.open(spark, wh)
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
    lh.catalog.createTable("default.li_mor", li.schema, Nil, Map.empty)
    val t = lh.catalog.loadTable("default.li_mor")
    t.append(li.repartition(cpus.toInt))
    t.deleteWhereMor(col("l_orderkey") % 1000 === 7) // MoR state -> fallback scan
    val cat = "gmorprof"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.engine.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)

    val SubstConf = "spark.graft.engineReadSubstitution"
    def subst[T](on: Boolean)(f: => T): T = {
      spark.conf.set(SubstConf, on.toString)
      try f finally spark.conf.set(SubstConf, "true")
    }
    def engineWide() = t.read()
      .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
        count(lit(1))).head()
    // substituted: GraftEngineReadRule inlines the engine's columnar plan
    def dsv2Wide() = subst(on = true)(spark.table(s"$cat.default.li_mor")
      .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
        count(lit(1))).head())
    // bridge: the rule disabled -> EngineReadScanBuilder's V1Scan path
    def v1Wide() = subst(on = false)(spark.table(s"$cat.default.li_mor")
      .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
        count(lit(1))).head())
    def engineNarrow() = t.read()
      .groupBy(col("l_returnflag")).agg(count(lit(1))).collect()
    def dsv2Narrow() = subst(on = true)(spark.table(s"$cat.default.li_mor")
      .groupBy(col("l_returnflag")).agg(count(lit(1))).collect())
    def v1Narrow() = subst(on = false)(spark.table(s"$cat.default.li_mor")
      .groupBy(col("l_returnflag")).agg(count(lit(1))).collect())

    def time(f: => Unit): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warmup all paths (codegen)
    engineWide(); dsv2Wide(); v1Wide(); engineNarrow(); dsv2Narrow(); v1Narrow()
    val n = 5
    var eW, dW, vW, eN, dN, vN = List.empty[Double]
    for (_ <- 1 to n) { // interleaved: host phase hits all variants equally
      eW ::= time(engineWide()); dW ::= time(dsv2Wide()); vW ::= time(v1Wide())
      eN ::= time(engineNarrow()); dN ::= time(dsv2Narrow()); vN ::= time(v1Narrow())
    }
    def mn(xs: List[Double]) = xs.min
    def line(k: String, xs: List[Double]): Unit =
      println(f"PROF $k%-14s min=${mn(xs)}%.3f s samples=${xs.map(x => f"$x%.3f").mkString(",")}")
    line("engine_wide", eW); line("subst_wide", dW); line("v1_wide", vW)
    line("engine_narrow", eN); line("subst_narrow", dN); line("v1_narrow", vN)
    println(f"PROF subst_penalty_wide=${(mn(dW) / mn(eW) - 1) * 100}%.1f%% " +
      f"v1_penalty_wide=${(mn(vW) / mn(eW) - 1) * 100}%.1f%% " +
      f"subst_penalty_narrow=${(mn(dN) / mn(eN) - 1) * 100}%.1f%% " +
      f"v1_penalty_narrow=${(mn(vN) / mn(eN) - 1) * 100}%.1f%%")
    spark.stop()
  }
}
