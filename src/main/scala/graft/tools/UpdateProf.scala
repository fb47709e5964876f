package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B cost of a SMALL update on a large table: merge-on-read
  * (`updateWhereMor` — one delete file + one data file) vs copy-on-write
  * (read + when/otherwise + overwrite — rewrites every data file).
  * Interleaved in one JVM (this host's timings are ±50% across runs);
  * each round updates a disjoint key slice so no round benefits from a
  * previous round's work. */
object UpdateProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files.createTempDirectory("graft-updprof-").toString
    val cat = graft.core.Catalog.open(spark, wh)
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"))
    for (name <- Seq("default.mor", "default.cow")) {
      cat.createTable(name, li.schema, Nil, Map.empty)
      cat.loadTable(name).append(li.repartition(16))
    }
    val mor = cat.loadTable("default.mor")
    val cow = cat.loadTable("default.cow")
    val total = mor.read().count()
    def rows(k: Int) = col("l_orderkey") % 1000 === k // ~0.1% of rows
    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PROF $label%-12s $s%.3f s"); s
    }
    // bytes WRITTEN by a commit = its new files (data + position deletes):
    // the scale-invariant cost — read volume is column/filter-pruned on
    // both paths, but CoW's write volume is the whole table
    def newBytes(t: graft.core.IceTable, parentFiles: Set[String]): Long = {
      val s = t.currentSnapshot.get
      (s.files ++ s.deleteFiles).filterNot(f => parentFiles(f.path))
        .map(_.bytes).sum
    }
    var morT, cowT = List.empty[Double]
    var morB, cowB = 0L
    for (round <- 1 to 3) {
      val morBefore = (mor.currentSnapshot.get.files ++
        mor.currentSnapshot.get.deleteFiles).map(_.path).toSet
      morT :+= time(s"mor-$round") {
        mor.updateWhereMor(rows(round), Map("l_quantity" -> lit(0.0)))
      }
      morB = newBytes(mor, morBefore)
      val cowBefore = (cow.currentSnapshot.get.files ++
        cow.currentSnapshot.get.deleteFiles).map(_.path).toSet
      cowT :+= time(s"cow-$round") {
        val df = cow.read()
        cow.overwrite(df.withColumn("l_quantity",
          when(rows(round), lit(0.0)).otherwise(col("l_quantity"))))
      }
      cowB = newBytes(cow, cowBefore)
    }
    println(f"rows=$total updated/round≈${total / 1000} " +
      f"mor_min=${morT.min}%.3f s cow_min=${cowT.min}%.3f s | " +
      f"bytes/update: mor=$morB cow=$cowB " +
      f"(write-amplification ${cowB.toDouble / morB}%.0fx)")
    spark.stop()
  }
}
