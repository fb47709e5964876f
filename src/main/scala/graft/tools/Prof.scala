package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B profiling harness. The box's timings are ±50% noisy, so
  * variants must interleave in ONE JVM — never compare across runs. */
object Prof {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // build the stream DIRECTLY (not via the q35 gate closure, which pins
    // its own partition count internally and would make the A/B a no-op)
    def q35(parts: Int): Long = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(graft.Tables.path(sfDir, "events"))
        val stream = spark.readStream.schema(raw.schema)
          .option("pathGlobFilter", "events.parquet").parquet(sfDir)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        graft.streaming.Streaming.runToMemory(
          graft.streaming.Streaming.windowedStats(stream), "prof_q35").count()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    // warm both shapes once (state-store + streaming-thread init)
    time("warm q35 parts=32")(q35(32))
    time("warm q35 parts=8")(q35(8))
    for (r <- 1 to 4) {
      time(s"r$r q35 parts=32")(q35(32))
      time(s"r$r q35 parts=8")(q35(8))
      time(s"r$r q35 parts=4")(q35(4))
    }
    spark.stop()
  }
}
