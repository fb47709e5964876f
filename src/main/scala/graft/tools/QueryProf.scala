package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Guide §1 empirical decomposition without the UI: run selected gates with
  * a SparkListener and report, per gate, wall seconds vs the cluster-work
  * decomposition — #jobs, #stages, #tasks, summed task run time, summed
  * executor CPU time, shuffle bytes read/written, and the scheduling gap
  * (wall − max-concurrent task work is not directly observable here; the
  * job-count × launch overhead is the proxy the r17/r18 floor analyses
  * used). Interleaved min-of-N in ONE JVM.
  *
  * Usage: runMain graft.tools.QueryProf <rounds> <name> [name...]
  */
object QueryProf {
  private val jobs = new AtomicInteger
  private val stages = new AtomicInteger
  private val tasks = new AtomicInteger
  private val taskTimeMs = new AtomicLong
  private val cpuTimeNs = new AtomicLong
  private val shuffleReadB = new AtomicLong
  private val shuffleWriteB = new AtomicLong
  private val inputB = new AtomicLong
  private val gcMs = new AtomicLong

  private def reset(): Unit = {
    jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0)
    cpuTimeNs.set(0); shuffleReadB.set(0); shuffleWriteB.set(0)
    inputB.set(0); gcMs.set(0)
  }

  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q5_distinct_counts", "q2_revenue_topn", "q151_tpch_q11")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          cpuTimeNs.addAndGet(m.executorCpuTime)
          shuffleReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          inputB.addAndGet(m.inputMetrics.bytesRead)
          gcMs.addAndGet(m.jvmGCTime)
        }
        ()
      }
    })

    // warm each gate once (codegen/JIT + aux fixtures)
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }

    println("round,name,wall_s,jobs,stages,tasks,task_time_s,cpu_s,gc_s," +
      "input_mb,shuf_read_mb,shuf_write_mb")
    for (r <- 1 to rounds; n <- names) {
      spark.catalog.clearCache(); System.gc()
      reset()
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable => println(s"FAIL $n: ${e.getMessage.take(120)}") }
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; give them a beat
      Thread.sleep(200)
      println(f"$r,$n,$wall%.3f,${jobs.get},${stages.get},${tasks.get}," +
        f"${taskTimeMs.get / 1e3}%.2f,${cpuTimeNs.get / 1e9}%.2f," +
        f"${gcMs.get / 1e3}%.2f,${inputB.get / 1e6}%.1f," +
        f"${shuffleReadB.get / 1e6}%.1f,${shuffleWriteB.get / 1e6}%.1f")
    }
    spark.stop()
  }
}
