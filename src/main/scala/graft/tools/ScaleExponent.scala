package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Empirical SCALING-EXPONENT rehearsal for the heaviest operator
  * families: instead of arguing "the Σ block² bound keeps it
  * sub-quadratic", run each family at the driver's sf0.1 and at a
  * synthesized ~10× input and record the measured wall-time ratio.
  * 10× data → ratio ≈ 10 is linear scaling; similarity families whose
  * true-pair count itself grows may legitimately run above that; a ratio
  * approaching 100 would expose an all-pairs blowup to fix.
  *
  * The 10× corpus is STRUCTURE-PRESERVING replication, not naive row
  * copying: each replica is a disjoint copy of the base distribution —
  * document tokens are tagged per replica so no shingle (and hence no
  * similarity candidate) ever crosses replicas, and every key column is
  * offset so joins/groups/graphs never collide. Naive copying would
  * instead multiply every LSH bucket and dup cluster by the replica
  * count (candidate pairs ×R² inside each bucket), which models "the
  * same corpus ingested R times", not "an R× bigger corpus from the same
  * distribution". Replica 0 keeps the original rows verbatim, so the x1
  * leg is a strict subset of the x10 leg.
  *
  * Both legs read from freshly-written /tmp parquet through the same
  * path (32 files each) so the comparison isolates operator cost, not
  * source-layout differences.
  *
  * Run: java … graft.tools.ScaleExponent [sfDir]
  * Prints one JSON line per (family, scale) plus a ratio summary;
  * results land in SCALING.md. */
object ScaleExponent {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // measured scales (replica counts). The x1→x10 step at sf0.1 turned
    // out fixed-overhead-dominated on every family (ratios 0.8–3.1 for
    // 10× data — job setup dwarfs per-row cost at 5k docs), so the
    // default includes an x100 leg (500k docs / 60M lineitem rows / 10M
    // events): the x10→x100 ratio is the one taken in the data-bound
    // regime, i.e. the actual scaling exponent.
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft-scalexp-")

    // ---- synthesize the two legs ------------------------------------
    def replicate(base: DataFrame, reps: Int)(one: Int => DataFrame)
        : DataFrame =
      (0 until reps).map(one).reduce(_.unionByName(_))

    val docs0 = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def docsRep(reps: Int): DataFrame = replicate(docs0, reps) { r =>
      if (r == 0) docs0
      else docs0.select(
        (col("doc_id") + lit(r * 1000000L)).as("doc_id"),
        // per-replica token tag: intra-replica similarity structure is
        // preserved exactly, cross-replica shingles never match
        array_join(transform(split(col("text"), "\\s+"),
          w => concat(w, lit("_" + r))), " ").as("text"))
    }
    val ev0 = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    def evRep(reps: Int): DataFrame = replicate(ev0, reps) { r =>
      ev0.select((col("event_id") + lit(r * 100000000L)).as("event_id"),
        col("ts"), (col("user_id") + lit(r * 10000000L)).as("user_id"),
        col("event_type"))
    }
    val li0 = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
    def liRep(reps: Int): DataFrame = replicate(li0, reps) { r =>
      li0.select((col("l_orderkey") + lit(r * 100000000L)).as("l_orderkey"),
        (col("l_partkey") + lit(r * 10000000L)).as("l_partkey"),
        col("l_extendedprice"))
    }
    for (s <- scales; (name, df) <- Seq(s"docs_x$s" -> docsRep(s),
        s"ev_x$s" -> evRep(s), s"li_x$s" -> liRep(s)))
      df.repartition(cpus.toInt).write.mode("overwrite")
        .parquet(s"$work/$name")

    def rd(name: String): DataFrame = spark.read.parquet(s"$work/$name")

    // ---- the measured families --------------------------------------
    def lsh(docs: DataFrame, cap: Int): Long =
      graft.text.MinHashLSH.nearDuplicates(docs, "doc_id", "text",
        n = 3, numHashes = 128, bands = 32, threshold = 0.8,
        maxBucketSize = cap).count()
    def ppjoin(docs: DataFrame): Long =
      graft.text.PrefixFilterJoin.jaccardPairs(docs, "doc_id", "text",
        3, 0.8).count()
    def triangles(li: DataFrame): Long = {
      val pe = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val edges = pe.alias("a").join(pe.alias("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("u"), col("b.p").as("v"))
        .agg(count(lit(1)).as("w"))
        .where(col("w") >= 2)
      graft.operators.Triangles.triangles(edges, "u", "v").count()
    }
    def pagerank(ev: DataFrame): Long = {
      val edges = graft.analytics.Funnel.transitions(ev,
        "user_id", "ts", "event_type", "event_id")
      graft.operators.PageRank.ranks(edges, "prev_type", "next_type", "n",
        iters = 3, damping = 0.85).count()
    }
    def globalOrder(li: DataFrame): Long =
      graft.operators.GlobalOrder.rankWithPrefixSum(li,
        Seq(col("l_extendedprice"), col("l_orderkey"), col("l_partkey")),
        "rank", Some((col("l_extendedprice") * 100).cast("long"), "run_sum"))
        .where(col("rank") % 100000L === 0L).count()
    def cmsStream(dir: String): Long = {
      val ckpt = java.nio.file.Files.createTempDirectory("graft-scalexp-ck-")
      val src = spark.readStream.schema(rd(dir).schema)
        .parquet(s"$work/$dir")
      val q = graft.streaming.Streaming.windowedCmsStream(src, "ts",
          col("user_id"), windowLen = "1 hour", watermark = "2 hours")
        .writeStream.format("noop").outputMode("complete")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(); 1L
    }

    def timed(f: => Long): (Long, Double) = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }

    val out = new StringBuilder("[")
    var first = true
    def emit(family: String, scale: String, m: (Long, Double)): Unit = {
      if (!first) out.append(",")
      first = false
      out.append(s"""{"family":"$family","scale":"$scale",""" +
        s""""result":${m._1},"sec":${f"${m._2}%.2f"}}""")
    }
    // interleave the scales per family so host drift hits all legs alike
    for (s <- scales) emit("lsh_uncapped", s"x$s", timed(lsh(rd(s"docs_x$s"), 0)))
    for (s <- scales) emit("lsh_capped30", s"x$s", timed(lsh(rd(s"docs_x$s"), 30)))
    for (s <- scales) emit("ppjoin", s"x$s", timed(ppjoin(rd(s"docs_x$s"))))
    for (s <- scales) emit("triangles", s"x$s", timed(triangles(rd(s"li_x$s"))))
    for (s <- scales) emit("pagerank", s"x$s", timed(pagerank(rd(s"ev_x$s"))))
    for (s <- scales) emit("global_order", s"x$s", timed(globalOrder(rd(s"li_x$s"))))
    for (s <- scales) emit("cms_stream", s"x$s", timed(cmsStream(s"ev_x$s")))
    out.append("]")
    println(out.toString)
    spark.stop()
  }
}
