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
  * Args: warehouseDir tableIdent startId count [mode]
  * mode `append` (default): `count` single-row appends starting at
  * `startId`; mode `addcols`: `count` addColumn evolutions named
  * `c<startId>_<i>` — drives the metadata CAS instead of the log CAS.
  */
object CommitStorm {
  def main(args: Array[String]): Unit = {
    val (whDir, table, start, count, mode) = args match {
      case Array(w, t, s, c) => (w, t, s, c, "append")
      case Array(w, t, s, c, m) => (w, t, s, c, m)
      case _ => sys.error("args: warehouseDir table startId count [mode]")
    }
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
      mode match {
        case "append" =>
          (0 until count.toInt).foreach { i =>
            tbl.append(Seq((s + i, s"p$s-$i")).toDF("id", "name"))
          }
        case "addcols" =>
          (0 until count.toInt).foreach { i =>
            tbl.addColumn(s"c${s}_$i", "long")
          }
        case other => sys.error(s"unknown mode: $other")
      }
    } finally spark.stop()
  }
}
