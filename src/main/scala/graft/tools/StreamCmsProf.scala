package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Where does q150_stream_cms_hh's time go, and is any of it shaveable?
  * The gate is 3× the next-slowest bench query (~5.8 s at sf0.1). This
  * decomposes it — streaming CMS build vs heavy-hitter probe join — and
  * A/Bs the knobs Spark offers for stateful micro-batches (shuffle
  * partition count for the state store, RocksDB vs HDFS-backed state
  * provider) plus the batch-equivalent CMS build as the no-streaming
  * floor. Interleaved min-of-N in ONE JVM (this host drifts ±50%). */
object StreamCmsProf {
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

    val src = java.nio.file.Files.createTempDirectory("graft-scp-").toString
    graft.Tables.load(spark, sfDir, "events")
      .select(col("ts"), col("user_id")).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val probes = spark.read.schema(schema).parquet(src).select(col("user_id"))
    probes.count() // warm FS cache for the batch side

    var n = 0
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def withConf(k: String, v: String)(f: => Double): Double = {
      val prev = spark.conf.getOption(k)
      spark.conf.set(k, v)
      try f finally prev match {
        case Some(p) => spark.conf.set(k, p)
        case None => spark.conf.unset(k)
      }
    }
    def streamBuild(shuffle: String, rocks: Boolean): Double =
      withConf("spark.sql.shuffle.partitions", shuffle) {
        val inner = () => timed {
          n += 1
          graft.streaming.Streaming.runToMemory(
            graft.streaming.Streaming.windowedCmsStream(
              graft.streaming.Streaming.eventsStream(spark, src, schema),
              "ts", col("user_id"), "1 hour", "2 hours",
              depth = 4, width = 512),
            s"scp_sink_$n",
            org.apache.spark.sql.streaming.OutputMode.Complete())
            .count()
          ()
        }
        if (rocks)
          withConf("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")(
            inner())
        else inner()
      }
    // the same CMS content as ONE batch aggregation — the no-streaming floor
    def batchBuild(): Double = timed {
      spark.read.schema(schema).parquet(src)
        .where(col("user_id").isNotNull)
        .select(col("ts"), posexplode(array((0 until 4).map(j =>
          graft.analytics.Cms.bucket(col("user_id"), j, 512)): _*))
          .as(Seq("j", "bucket")))
        .groupBy(window(col("ts"), "1 hour"), col("j"), col("bucket"))
        .agg(count(lit(1)).as("cnt")).count()
      ()
    }
    // the gate's second half: probe join over the finished sketch
    val sketch = graft.streaming.Streaming.runToMemory(
      graft.streaming.Streaming.windowedCmsStream(
        graft.streaming.Streaming.eventsStream(spark, src, schema),
        "ts", col("user_id"), "1 hour", "2 hours", depth = 4, width = 512),
      "scp_sketch", org.apache.spark.sql.streaming.OutputMode.Complete())
      .cache()
    sketch.count()
    def hhJoin(): Double = timed {
      graft.analytics.Cms.windowedHeavyHitters(sketch, probes, "user_id",
        denom = 8, depth = 4, width = 512).count()
      ()
    }
    // the pre-round-17 probe-join shape (join against ALL occupied cells,
    // threshold applied after the group-by) — the A side of the A/B
    def hhJoinAllCells(): Double = timed {
      val n = {
        val n0 = sketch.where(col("j") === 0)
          .groupBy("window").agg(sum("cnt").as("n"))
        n0.sparkSession.createDataFrame(n0.toJavaRDD, n0.schema)
      }
      probes.select(col("user_id").as("key")).where(col("key").isNotNull)
        .distinct()
        .select(col("key"), posexplode(array((0 until 4).map(j =>
          graft.analytics.Cms.bucket(col("key"), j, 512)): _*))
          .as(Seq("j", "bucket")))
        .join(broadcast(sketch), Seq("j", "bucket"))
        .groupBy("window", "key")
        .agg(count(lit(1)).as("__cells"), min(col("cnt")).as("est"))
        .where(col("__cells") === 4)
        .join(broadcast(n), "window")
        .where(expr("est >= (n + 7) div 8"))
        .count()
      ()
    }

    val variants: Seq[(String, () => Double)] = Seq(
      "stream_shuffle8_hdfs" -> (() => streamBuild("8", rocks = false)),
      "stream_shuffle4_hdfs" -> (() => streamBuild("4", rocks = false)),
      "stream_shuffle32_hdfs" -> (() => streamBuild("32", rocks = false)),
      "stream_shuffle8_rocksdb" -> (() => streamBuild("8", rocks = true)),
      "batch_cms_build" -> (() => batchBuild()),
      "hh_probe_join_hotcells" -> (() => hhJoin()),
      "hh_probe_join_allcells" -> (() => hhJoinAllCells()))
    val rounds = 4
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to rounds; (name, f) <- variants)
      times(name) = f() :: times(name)
    println("variant,min_s,med_s,runs")
    for ((name, _) <- variants) {
      val ts = times(name).sorted
      println(f"$name,${ts.head}%.3f,${ts(ts.size / 2)}%.3f," +
        ts.map(t => f"$t%.2f").mkString("|"))
    }
    spark.stop()
  }
}
