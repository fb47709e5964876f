package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does q185_lsh_bucket_cap's 4.6 s go, and is any of it shaveable?
  * The gate plants a 60-replica mega-bucket into `documents`, runs
  * capped MinHash-LSH near-dup detection (128 hashes / 32 bands,
  * maxBucketSize=30), verifies candidates exactly, and closes connected
  * components. Decomposition + A/B, interleaved min-of-N in ONE JVM
  * (this host drifts ±50%):
  *  - gate shape end-to-end (128/32, cap 30)
  *  - signature/verify sizing leg: 64 hashes / 16 bands (same band rows
  *    r=4 → same threshold curve shape, half the signature work)
  *  - split: LSH+verify pair production alone vs the components closure
  *    alone (pointer-jumping = several chained jobs over a tiny graph —
  *    job-launch overhead, not data)
  */
object LshCapProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val seedText = docs.orderBy("doc_id").select("text").head.getString(0)
    val planted = spark.range(60).select((col("id") + 900000L).as("doc_id"),
      lit(seedText).as("text"))
    val corpus = docs.unionByName(planted)
    corpus.count() // warm

    def timed(f: => Long): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def gate(numHashes: Int, bands: Int): Long = {
      val pairs = graft.text.MinHashLSH.nearDuplicates(corpus, "doc_id",
        "text", n = 3, numHashes = numHashes, bands = bands,
        threshold = 0.8, maxBucketSize = 30).localCheckpoint(eager = false)
      pairs.where(col("id_a") >= 900000L || col("id_b") >= 900000L).count()
      graft.text.NearDup.duplicateComponents(pairs)
        .groupBy(col("component")).agg(count(lit(1)).as("n_docs")).count()
    }
    def pairsOnly(numHashes: Int, bands: Int): Long =
      graft.text.MinHashLSH.nearDuplicates(corpus, "doc_id", "text",
        n = 3, numHashes = numHashes, bands = bands, threshold = 0.8,
        maxBucketSize = 30).count()
    def componentsOnly(): Double = {
      // pairs materialized OUTSIDE the timed section: this leg isolates
      // the pointer-jumping closure over the already-produced pair set
      val pairs = graft.text.MinHashLSH.nearDuplicates(corpus, "doc_id",
        "text", n = 3, numHashes = 128, bands = 32, threshold = 0.8,
        maxBucketSize = 30).localCheckpoint(eager = true)
      timed {
        graft.text.NearDup.duplicateComponents(pairs)
          .groupBy(col("component")).agg(count(lit(1)).as("n_docs")).count()
      }
    }

    val reps = 4
    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    // warmup one full pass, then interleaved reps
    gate(128, 32)
    for (_ <- 1 to reps) {
      acc("gate_128_32") ::= timed(gate(128, 32))
      acc("gate_64_16") ::= timed(gate(64, 16))
      acc("pairs_only_128_32") ::= timed(pairsOnly(128, 32))
      acc("pairs_only_64_16") ::= timed(pairsOnly(64, 16))
      acc("components_only") ::= componentsOnly()
    }
    // result-equivalence check for the sizing leg: same verified pairs
    val p128 = graft.text.MinHashLSH.nearDuplicates(corpus, "doc_id", "text",
      3, 128, 32, 0.8, 30).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p64 = graft.text.MinHashLSH.nearDuplicates(corpus, "doc_id", "text",
      3, 64, 16, 0.8, 30).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(acc.toSeq.sortBy(_._1).map { case (k, vs) =>
      f"""\"$k\":{\"min\":${vs.min}%.2f,\"med\":${vs.sorted.apply(vs.size / 2)}%.2f}"""
    }.mkString("{", ",", s""","pairs_equal":${p128 == p64},"n128":${p128.size},"n64":${p64.size}}"""))
    spark.stop()
  }
}
