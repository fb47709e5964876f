package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession

/** MULTI-WRITER commit throughput curve: CommitStormFuzzSpec proves
  * correctness under contention; this measures it. K writer threads
  * (separate IceTable instances — coordination is the on-disk CAS only,
  * exactly as across processes) each land a fixed number of small
  * appends; we report landed commits/sec and the mean CAS retries per
  * landed commit at K = 1/2/4/8.
  *
  * The design claim: the retry loop re-reads + re-CASes O(metadata)
  * per collision, so aggregate throughput should stay roughly FLAT as
  * writers are added (the log is a single serialization point — adding
  * writers adds retries, not parallel commit capacity) and must not
  * COLLAPSE (retries are cheap; the data write happens once, outside
  * the CAS loop, and is never repeated on retry).
  *
  * Run: java … graft.tools.CommitThroughput */
object CommitThroughput {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val commitsPerWriter =
      sys.env.getOrElse("SPARK_GRAFT_COMMITS_PER_WRITER", "24").toInt
    val ks = sys.env.getOrElse("SPARK_GRAFT_WRITERS", "1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq

    // warmup OUTSIDE any measurement: the first Spark job pays JVM/codegen
    // init (~30s) that would otherwise be billed to the first writer count
    locally {
      val wh = java.nio.file.Files.createTempDirectory("graft-cthr-warm-")
      val cat = graft.core.Catalog.open(spark, wh.toString)
      cat.createTable("w", Seq("id" -> "long", "v" -> "string"),
        Nil, Map.empty)
      val t = cat.loadTable("w")
      (1 to 5).foreach { i =>
        t.append(Seq((i.toLong, "w")).toDF("id", "v").coalesce(1))
      }
    }

    for (k <- ks) {
      val wh = java.nio.file.Files.createTempDirectory(s"graft-cthr-$k-")
      val cat = graft.core.Catalog.open(spark, wh.toString)
      cat.createTable("t", Seq("id" -> "long", "v" -> "string"),
        Nil, Map.empty)
      val retries = new AtomicLong(0)
      val errors =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      graft.core.IceTable.casRetryCounter.set(0)
      val t0 = System.nanoTime()
      val writers = (0 until k).map { ti =>
        new Thread(() => {
          try {
            val tbl = cat.loadTable("t") // own instance: on-disk CAS only
            var next = ti * 1000000L
            for (_ <- 1 to commitsPerWriter) {
              val b = (0 until 50).map { _ => next += 1; (next, s"w$ti") }
              tbl.append(b.toDF("id", "v").coalesce(1))
            }
          } catch { case e: Throwable => errors.add(e) }
        })
      }
      writers.foreach(_.start()); writers.foreach(_.join())
      val wallSec = (System.nanoTime() - t0) / 1e9
      require(errors.isEmpty, s"writer error: ${errors.peek()}")
      retries.set(graft.core.IceTable.casRetryCounter.get())
      val landed = cat.loadTable("t").rawLog.size
      require(landed == k * commitsPerWriter,
        s"expected ${k * commitsPerWriter} commits, found $landed")
      println(s"""{"tool":"CommitThroughput","writers":$k,""" +
        s""""landed":$landed,"wall_sec":$wallSec,""" +
        s""""commits_per_sec":${landed / wallSec},""" +
        s""""mean_retries_per_commit":${retries.get().toDouble / landed}}""")
    }
    spark.stop()
  }
}
