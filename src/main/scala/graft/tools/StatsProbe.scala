package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Validation harness for Spread's row estimator (r22): for the frames the
  * operators actually pin, print estimated rows (input statistics only) vs
  * the true count, plus the estimator's own wall cost — the estimate only
  * has to be order-of-magnitude right for the row-aware floor to land in
  * the fast band, and this is the evidence. */
object StatsProbe {
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
    def load(name: String) = graft.Tables.load(spark, sfDir, name)

    def probe(tag: String, df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val est = graft.operators.Spread.estRows(df)
      val estMs = (System.nanoTime() - t0) / 1e6
      val actual = df.count()
      val ratio = if (actual > 0) est.toDouble / actual else Double.NaN
      println(f"$tag%-38s est=$est%12d actual=$actual%10d ratio=$ratio%8.2f est_ms=$estMs%7.1f")
    }

    val docs = load("documents")
    val cust = load("customer")
    val li = load("lineitem")
    val emb = load("embeddings")

    probe("leaf:documents", docs)
    probe("leaf:customer", cust)
    probe("leaf:lineitem", li)
    probe("leaf:embeddings", emb)
    probe("leaf:orders", load("orders"))

    // shingle table (Generate over docs)
    val sh = graft.text.NearDup.shingleTable(docs, "doc_id", "text", 3)
    probe("shingles(docs,n=3)", sh)

    // jaccard spine: window-annotated shingles (what byKey(s) pins)
    probe("fuzzy side (customer projected)",
      cust.select(col("c_custkey").as("id"), col("c_name").as("s"),
        substring(col("c_name"), 1, 16).as("blk")))

    // winnow fingerprints
    probe("winnow fp (docs)", graft.text.NearDup
      .winnowFingerprintTable(docs, "doc_id", "text", 5, 4, 50))

    // minhash signatures + buckets
    val sig = graft.text.MinHashLSH.signatures(docs, "doc_id", "text", 3, 128)
    probe("minhash signatures", sig)

    // LSH candidates (above localCheckpoint lazily) — est before exec
    val cands = graft.text.MinHashLSH.candidatePairs(sig, 128, 32)
    probe("lsh candidate pairs (join output)", cands)

    // a lazily localCheckpointed frame: does est see through it?
    val ck = cands.localCheckpoint(false)
    probe("localCheckpoint(lazy) of cands", ck)
    probe("frame above materialized ckpt", ck.select(col("id_a")).distinct())

    // post-join verify input shape
    val candIds = cands.select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()
    probe("docs semi-joined to candIds",
      docs.select(col("doc_id"), col("text")).join(candIds, "doc_id"))

    spark.stop()
  }
}
