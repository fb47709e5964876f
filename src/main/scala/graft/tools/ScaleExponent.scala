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
    // shuffle partitioning must scale with DATA, not core count: an
    // x1000 leg at 16 partitions sorts ~37M rows per task (the classic
    // under-partitioning cliff — every task spills, the wall ratio
    // measures disk bandwidth, not the operator). Default stays the
    // core count for the small legs; big-leg runs pass e.g. 256.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft-scalexp-")

    // optional family subset (e.g. "ppjoin,global_order" for the x1000
    // leg — running every family at 1000× would synthesize and scan
    // tens of GB for families whose exponent is already settled)
    val families = sys.env.get("SPARK_GRAFT_FAMILIES")
      .map(_.split(",").map(_.trim).toSet)
    def enabled(f: String): Boolean = families.forall(_.contains(f))

    // ---- synthesize the legs -----------------------------------------
    // CROSS-JOIN replication (replica id as a column), not an N-branch
    // union: a 1000-way unionByName would hand Catalyst a thousand-branch
    // plan to analyze per leg. Replica 0 keeps the original rows VERBATIM
    // (the x1 leg stays a strict subset of every larger leg); every other
    // replica offsets its keys and tags its tokens so no shingle, join
    // key or graph edge ever crosses replicas — an R× corpus from the
    // same distribution, never "the same corpus ingested R times".
    def reps(n: Int): DataFrame =
      spark.range(n.toLong).select(col("id").as("__r"))

    // pre-spread the base tables: sf0.1 reads as a single parquet split,
    // and the cross join broadcasts the replica range — without this one
    // task would produce (and shuffle-write) the entire replicated leg
    val par = cpus.toInt
    val docs0 = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).repartition(par)
    def docsRep(n: Int): DataFrame = docs0.crossJoin(reps(n)).select(
      (col("doc_id") + col("__r") * 1000000L).as("doc_id"),
      when(col("__r") === 0L, col("text")).otherwise(
        array_join(transform(split(col("text"), "\\s+"),
          w => concat(w, lit("_"), col("__r"))), " ")).as("text"))
    val ev0 = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .repartition(par)
    def evRep(n: Int): DataFrame = ev0.crossJoin(reps(n)).select(
      (col("event_id") + col("__r") * 100000000L).as("event_id"),
      col("ts"), (col("user_id") + col("__r") * 10000000L).as("user_id"),
      col("event_type"))
    val li0 = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
      .repartition(par)
    def liRep(n: Int): DataFrame = li0.crossJoin(reps(n)).select(
      (col("l_orderkey") + col("__r") * 100000000L).as("l_orderkey"),
      (col("l_partkey") + col("__r") * 10000000L).as("l_partkey"),
      col("l_extendedprice"))

    // synthesize only what the selected families read — the x1000 legs
    // are GBs each
    val needDocs = Seq("lsh_uncapped", "lsh_capped30", "ppjoin").exists(enabled)
    val needLi = Seq("triangles", "global_order").exists(enabled)
    val needEv = Seq("pagerank", "cms_stream").exists(enabled)
    for (s <- scales;
         (name, df) <- Seq(s"docs_x$s" -> (if (needDocs) Some(docsRep(s)) else None),
           s"ev_x$s" -> (if (needEv) Some(evRep(s)) else None),
           s"li_x$s" -> (if (needLi) Some(liRep(s)) else None))
           .collect { case (n, Some(d)) => (n, d) })
      // the cross-join output is already spread over the base's `par`
      // partitions — write directly, no second table-sized shuffle
      df.write.mode("overwrite").parquet(s"$work/$name")

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
    if (enabled("lsh_uncapped"))
      for (s <- scales) emit("lsh_uncapped", s"x$s", timed(lsh(rd(s"docs_x$s"), 0)))
    if (enabled("lsh_capped30"))
      for (s <- scales) emit("lsh_capped30", s"x$s", timed(lsh(rd(s"docs_x$s"), 30)))
    if (enabled("ppjoin"))
      for (s <- scales) emit("ppjoin", s"x$s", timed(ppjoin(rd(s"docs_x$s"))))
    if (enabled("triangles"))
      for (s <- scales) emit("triangles", s"x$s", timed(triangles(rd(s"li_x$s"))))
    if (enabled("pagerank"))
      for (s <- scales) emit("pagerank", s"x$s", timed(pagerank(rd(s"ev_x$s"))))
    if (enabled("global_order"))
      for (s <- scales) emit("global_order", s"x$s", timed(globalOrder(rd(s"li_x$s"))))
    if (enabled("cms_stream"))
      for (s <- scales) emit("cms_stream", s"x$s", timed(cmsStream(s"ev_x$s")))
    out.append("]")
    println(out.toString)
    spark.stop()
  }
}
