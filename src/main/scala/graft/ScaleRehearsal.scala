package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Scale rehearsal for the dedup/ANN family: measures — not projects —
  * how CANDIDATE-PAIR counts and shuffle volume grow when the corpus
  * grows 10× (sf0.01 → sf0.1, the driver's own generator at two real
  * scales, same distribution). The families' Σ block² bounds predict
  * sub-quadratic growth (≈10–30× for 10× docs); all-pairs would grow
  * 100×. Results land in SCALING.md.
  *
  * Run: SPARK_GRAFT_SF_BASE=/root/testdata java ... graft.ScaleRehearsal */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_BASE", "/root/testdata")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // shuffle-write bytes across all stages of one measured block
    @volatile var shuffleBytes = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleBytes += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    })
    def measured(f: => Long): (Long, Long, Double) = {
      spark.catalog.clearCache(); System.gc()
      val b0 = shuffleBytes; val t0 = System.nanoTime()
      val n = f
      (n, shuffleBytes - b0, (System.nanoTime() - t0) / 1e9)
    }

    val out = new StringBuilder("[")
    var first = true
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"$base/$sf"
      val docs = Tables.load(spark, dir, "documents")
      val emb = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val nDocs = docs.count(); val nVecs = emb.count()

      // q22 family: MinHash+LSH band-bucket candidates (pre-verify)
      val lsh = measured {
        val sig = text.MinHashLSH.signatures(docs, "doc_id", "text",
          n = 3, numHashes = 128)
        text.MinHashLSH.candidatePairs(sig, numHashes = 128, bands = 32).count()
      }
      // q102 family: prefix-filter Jaccard candidates (pre-verify)
      val ppj = measured {
        val sh = text.NearDup.shingleTable(docs, "doc_id", "text", 3)
        text.PrefixFilterJoin.candidatePairs(sh, 0.8).count()
      }
      // q124 family: one-sided containment candidates (pre-verify)
      val cont = measured {
        text.PrefixFilterJoin.containmentCandidates(
          docs, "doc_id", "text", 3, 0.9).count()
      }
      // q57/q93 family: Σ cluster² candidate bound from k-means IVF cells
      val ivf = measured {
        val centroids = vector.KMeansIvf.train(emb, "vec_id", "embedding",
          k = 8, dims = 64, iters = 3)
        vector.KMeansIvf.assign(emb, "embedding", centroids)
          .groupBy("cluster").agg(count(lit(1)).as("m"))
          .agg(sum(col("m") * (col("m") - 1) / 2)).head.getLong(0)
      }
      // q66 family documented baseline: hyperplane-LSH bucket pair bound
      val hyp = measured {
        vector.IvfIndex.bucketed(emb, "embedding", nPlanes = 12, dims = 64)
          .groupBy("bucket").agg(count(lit(1)).as("m"))
          .agg(sum(col("m") * (col("m") - 1) / 2)).head.getLong(0)
      }
      for (((name, m)) <- Seq("lsh_q22" -> lsh, "ppjoin_q102" -> ppj,
          "containment_q124" -> cont, "kmeans_ivf_q57_q93" -> ivf,
          "hyperplane_q66" -> hyp)) {
        if (!first) out.append(",")
        first = false
        out.append(s"""{"sf":"$sf","docs":$nDocs,"vecs":$nVecs,""" +
          s""""family":"$name","candidates":${m._1},""" +
          s""""shuffle_bytes":${m._2},"sec":${f"${m._3}%.2f"}}""")
      }
    }
    out.append("]")
    println(out.toString)
    spark.stop()
  }
}
