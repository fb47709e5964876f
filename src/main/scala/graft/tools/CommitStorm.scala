package graft.tools

import org.apache.spark.sql.SparkSession

/** Multi-process commit exerciser: append `count` single-row commits to an
  * existing table from THIS process. Run several instances concurrently on
  * the same warehouse dir to drive the cross-process optimistic commit
  * protocol ([[graft.core.IceTable]] commitLog/casLog) with real process
  * boundaries — no shared JVM lock, no test hook; every interleaving is
  * the genuine filesystem race. CrossProcessCommitSpec launches two of
  * these and asserts no commit was lost and the snapshot chain is linear
  * and dense.
  *
  * Args: warehouseDir tableIdent startId count
  */
object CommitStorm {
  def main(args: Array[String]): Unit = {
    val Array(whDir, table, start, count) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      import spark.implicits._
      val cat = graft.core.Catalog.open(spark, whDir)
      val tbl = cat.loadTable(table)
      val s = start.toLong
      (0 until count.toInt).foreach { i =>
        tbl.append(Seq((s + i, s"p$s-$i")).toDF("id", "name"))
      }
    } finally spark.stop()
  }
}
