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
      // q102 family: prefix-filter Jaccard candidates (pre-verify) AND the
      // verified true pairs — candidate growth only means something
      // relative to how fast the TRUE pair count grows (template corpora
      // grow near-dup clusters with corpus size, so true pairs are not
      // linear either)
      val ppj = measured {
        val sh = text.NearDup.shingleTable(docs, "doc_id", "text", 3)
        text.PrefixFilterJoin.candidatePairs(sh, 0.8).count()
      }
      val ppjTrue = measured {
        text.PrefixFilterJoin.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
          .count()
      }
      // q124 family: one-sided containment candidates (pre-verify) + true
      val cont = measured {
        text.PrefixFilterJoin.containmentCandidates(
          docs, "doc_id", "text", 3, 0.9).count()
      }
      val contTrue = measured {
        text.PrefixFilterJoin.containmentPairs(docs, "doc_id", "text", 3, 0.9)
          .count()
      }
      // q57/q93 family: Σ cluster² candidate bound from k-means IVF cells.
      // k is the scale knob: fixed k makes Σ cluster² ≈ N²/k (quadratic);
      // k ∝ N (bounded cell size) keeps it linear. Measure both.
      def ivfBound(k: Int): Long = {
        val centroids = vector.KMeansIvf.train(emb, "vec_id", "embedding",
          k = k, dims = 64, iters = 3)
        vector.KMeansIvf.assign(emb, "embedding", centroids)
          .groupBy("cluster").agg(count(lit(1)).as("m"))
          .agg((sum(col("m") * (col("m") - 1)) / 2).cast("long")).head().getLong(0)
      }
      val ivf = measured { ivfBound(8) } // the gates' fixed k=8
      val ivfScaled = measured { ivfBound(math.max(8, (nVecs / 60).toInt)) }
      // q66 family baseline: hyperplane-LSH bucket pair bound; planes are
      // its scale knob (buckets = 2^planes)
      val hyp = measured {
        vector.IvfIndex.bucketed(emb, "embedding", nPlanes = 12, dims = 64)
          .groupBy("bucket").agg(count(lit(1)).as("m"))
          .agg((sum(col("m") * (col("m") - 1)) / 2).cast("long")).head().getLong(0)
      }
      // q147 family: batched RRF — Q queries, ONE corpus pass. The claim
      // to verify by measurement: cost grows with the corpus (10× step),
      // NOT with Q (4× more queries must cost far less than 4×).
      val vocab = Seq("hash", "join", "spark", "scan", "filter", "merge",
        "column", "vector", "data", "index", "sort", "cache")
      def rrfQueries(q: Int) = (1 to q).map(i => (i.toLong,
        Seq(vocab(i % 12), vocab((i + 3) % 12), vocab((i + 7) % 12)),
        i.toLong))
      val rrf4 = measured {
        text.Search.hybridRrfBatch(docs, emb.toDF("vec_id", "embedding"),
          "doc_id", "text", "vec_id", "embedding", rrfQueries(4)).count()
      }
      val rrf16 = measured {
        text.Search.hybridRrfBatch(docs, emb.toDF("vec_id", "embedding"),
          "doc_id", "text", "vec_id", "embedding", rrfQueries(16)).count()
      }
      // q150 family: streaming CMS heavy-hitter STATE — rows a naive
      // exact per-(window, key) state would hold vs the CMS grid's
      // occupied cells (bounded by windows × depth × width regardless of
      // key cardinality). Measured on the same batch data the stream
      // would see.
      val ev = Tables.load(spark, dir, "events")
      val naiveState = measured {
        ev.groupBy(window(col("ts"), "1 hour"), col("user_id"))
          .agg(count(lit(1))).count()
      }
      val cmsState = measured {
        ev.where(col("user_id").isNotNull)
          .select(col("ts"), posexplode(array((0 until 4).map(j =>
            analytics.Cms.bucket(col("user_id"), j, 512)): _*))
            .as(Seq("j", "bucket")))
          .groupBy(window(col("ts"), "1 hour"), col("j"), col("bucket"))
          .agg(count(lit(1))).count()
      }
      // ---- changelog + WAP write-path families (round-15/16) -----------
      // Claims to MEASURE, not argue:
      //  (a) append-commit replay reads only the ADDED files — near-zero
      //      shuffle at any table size;
      //  (a') a pure MoR delete commit replays from its OWN delete files
      //      (O(deleted): touched-files scan + broadcast identity
      //      semi-join, core/IceTable.morDelta); a COMPACTION replays
      //      empty and scan-free (live-rows-preserved contract); a
      //      ROLLBACK replays at O(rolled-back) — shared files cancel
      //      out of the diff (core/IceTable.rewriteDelta); only a FULL
      //      overwrite still pays the table-sized exceptAll diff;
      //  (b) incremental rollup maintenance folds the DELTA against
      //      state, vs a full recompute scanning the table;
      //  (c) WAP publish is O(metadata) — flat time / zero shuffle while
      //      the staged data grows 10×.
      val li = Tables.load(spark, dir, "lineitem").select(col("l_orderkey"),
        col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      val wh = java.nio.file.Files.createTempDirectory("graft-rehearsal-")
      val lhR = Lakehouse.open(spark, wh.toString)
      lhR.catalog.createTable("default.cl", li.schema, Nil, Map.empty)
      val tb = lhR.catalog.loadTable("default.cl")
      tb.append(li.where(col("l_orderkey") % 4 === 0)) // commits 1-3
      tb.append(li.where(col("l_orderkey") % 4 === 1))
      tb.append(li.where(col("l_orderkey") % 4 === 2))
      val ckpt = java.nio.file.Files.createTempDirectory("graft-rehearsal-ck-")
      streaming.Changelog.maintainRollup(lhR, "default.cl", "default.cl_ru",
        Seq("l_returnflag"), "l_extendedprice", ckpt) // state through c3
      tb.deleteWhereMor(col("l_quantity") < 2.0) // commit 4 (MoR delete)
      val clAppend = measured {
        streaming.Changelog.changesBetween(tb, None, 3L).count()
      }
      val clDelete = measured {
        streaming.Changelog.changesBetween(tb, Some(3L), 4L).count()
      }
      val ruInc = measured {
        streaming.Changelog.maintainRollup(lhR, "default.cl",
          "default.cl_ru", Seq("l_returnflag"), "l_extendedprice", ckpt)
        lhR.catalog.loadTable("default.cl_ru").read().count()
      }
      val ruFull = measured {
        tb.read().groupBy(col("l_returnflag"))
          .agg(count(lit(1)), sum((col("l_extendedprice") * 1e6)
            .cast("long"))).count()
      }
      tb.append(li.where(col("l_orderkey") % 4 === 3)) // commit 5
      tb.rollbackTo("4") // commit 6: rewrite sharing commits 1-4's files
      val clRollback = measured {
        streaming.Changelog.changesBetween(tb, Some(5L), 6L).count()
      }
      tb.compact(targetFiles = cpus.toInt) // commit 7 (compaction rewrite)
      val clCompact = measured {
        streaming.Changelog.changesBetween(tb, Some(6L), 7L).count()
      }
      // commit 8: a FULL overwrite shares nothing — the honest remaining
      // worst case, a both-directions table-sized diff
      tb.overwrite(li.withColumn("l_quantity", col("l_quantity") + 1.0))
      val clDiff = measured {
        streaming.Changelog.changesBetween(tb, Some(7L), 8L).count()
      }
      lhR.catalog.createTable("default.wap", li.schema, Nil, Map.empty)
      val tw = lhR.catalog.loadTable("default.wap")
      val wapStage = measured { tw.stageAppend(li, "batch").rows }
      val wapPublish = measured { tw.publishWap("batch"); 1L }
      // ---- MERGE families: MoR O(touched) vs CoW partial rewrite ----
      // Claims to MEASURE: (a) the same small SQL MERGE (1% of keys
      // updated) against a merge-on-read table costs O(touched) — one
      // position-delete file + a 1%-sized append; (b) a SCATTERED-key
      // CoW merge still writes the whole table (the touched rows live in
      // every file — inherent, the reason MoR mode exists); (c) a
      // KEY-CLUSTERED CoW merge writes only the files holding the keys
      // (file-level partial CoW: carried files move by reference), so
      // its write volume grows with the SOURCE, not the table.
      val ord = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val nOrd = ord.count()
      // "~1% of keys", floored at 1 so tiny scale factors (nOrd < 100)
      // never produce limit(0) frames whose max()/min() aggregates NPE
      val onePct = math.max(1, (nOrd / 100).toInt)
      GraftExtensions.register(spark)
      val cat = s"gsr_${sf.replace(".", "_")}"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[engine.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
      ord.where(col("o_orderkey") % 100 === 7)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
        .createOrReplaceTempView("sr_merge_src")
      // contiguous ~1% key range: what a time/key-partitioned upsert
      // looks like — the shape file-level partial CoW is built for
      ord.orderBy("o_orderkey").limit(onePct)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
        .createOrReplaceTempView("sr_merge_src_range")
      def mergeSql(table: String, src: String = "sr_merge_src") =
        s"""MERGE INTO $cat.default.$table t USING $src s
           |ON t.o_orderkey = s.o_orderkey
           |WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin
      def addedRows(t: graft.core.IceTable): Long =
        t.currentSnapshot.flatMap(_.summary.get("added-rows"))
          .map(_.toLong).getOrElse(0L)
      lhR.catalog.createTable("default.mg_mor", ord.schema, Nil,
        Map("write.merge.mode" -> "merge-on-read"))
      val tmMor = lhR.catalog.loadTable("default.mg_mor")
      tmMor.append(ord)
      lhR.catalog.createTable("default.mg_cow", ord.schema, Nil, Map.empty)
      val tmCow = lhR.catalog.loadTable("default.mg_cow")
      tmCow.append(ord)
      // key-clustered table: range-partitioned files, bounds disjoint
      lhR.catalog.createTable("default.mg_cowc", ord.schema, Nil, Map.empty)
      val tmCowC = lhR.catalog.loadTable("default.mg_cowc")
      tmCowC.append(ord.repartitionByRange(cpus.toInt, col("o_orderkey")))
      val mergeMor = measured {
        spark.sql(mergeSql("mg_mor"))
        // touched = the position-delete rows this ONE commit wrote
        tmMor.currentSnapshot.map(_.deleteFiles.map(_.rows).sum).getOrElse(0L)
      }
      // rows actually WRITTEN by the commit (new files only — carried
      // files move by reference and cost nothing)
      val mergeCow = measured { spark.sql(mergeSql("mg_cow")); addedRows(tmCow) }
      val mergeCowClustered = measured {
        spark.sql(mergeSql("mg_cowc", "sr_merge_src_range"))
        addedRows(tmCowC)
      }
      // partial CoW DELETE of the top ~1% key range on the clustered
      // table: manifest bounds admit one victim file; the rest carry by
      // reference — written rows ≈ one file's kept remainder, not the table
      val hiCut = ord.orderBy(col("o_orderkey").desc)
        .limit(onePct).agg(min("o_orderkey")).head.getLong(0)
      val cowDeleteClustered = measured {
        lhR.dml.delete("default.mg_cowc", s"o_orderkey >= $hiCut")
        addedRows(tmCowC)
      }
      // ---- round-17 SQL row-level families (GraftRowLevelStrategy) ----
      // Claims to MEASURE: (a) a subquery DELETE (non-pushable IN
      // condition — the shape `SupportsDelete` refused before round 17)
      // against a MoR table stages position deletes that grow with the
      // MATCHED KEYS, not the table; (b) the bare SQL UPDATE statement on
      // a key-clustered CoW table rides runtime victim discovery and
      // writes only the files that hold matches — both statements cost
      // O(touched) at any table size.
      // bottom ~1% keys, materialized ONCE (the view and the loCut both
      // consume it)
      val delKeys = ord.orderBy(col("o_orderkey")).limit(onePct)
        .select(col("o_orderkey")).cache()
      delKeys.createOrReplaceTempView("sr_del_keys")
      val loCut = delKeys.agg(max("o_orderkey")).head.getLong(0)
      lhR.catalog.createTable("default.mg_mord", ord.schema, Nil,
        Map("write.delete.mode" -> "merge-on-read"))
      val tmMorD = lhR.catalog.loadTable("default.mg_mord")
      tmMorD.append(ord)
      val sqlSubqDeleteMor = measured {
        spark.sql(s"DELETE FROM $cat.default.mg_mord WHERE o_orderkey IN " +
          "(SELECT o_orderkey FROM sr_del_keys)")
        // fresh table: the commit's position-delete rows ARE the state
        tmMorD.currentSnapshot.map(_.deleteFiles.map(_.rows).sum).getOrElse(0L)
      }
      val sqlUpdateClustered = measured {
        spark.sql(s"UPDATE $cat.default.mg_cowc SET " +
          s"o_totalprice = o_totalprice + 1.0 WHERE o_orderkey <= $loCut")
        addedRows(tmCowC)
      }

      for (((name, m)) <- Seq("lsh_q22" -> lsh, "ppjoin_q102" -> ppj,
          "ppjoin_q102_true" -> ppjTrue, "containment_q124" -> cont,
          "containment_q124_true" -> contTrue, "kmeans_ivf_k8" -> ivf,
          "kmeans_ivf_kscaled" -> ivfScaled, "hyperplane_q66" -> hyp,
          "rrf_batch_q4" -> rrf4, "rrf_batch_q16" -> rrf16,
          "cms_state_naive" -> naiveState, "cms_state_grid" -> cmsState,
          "changelog_append_replay" -> clAppend,
          "changelog_mor_delete_replay" -> clDelete,
          "changelog_rollback_replay" -> clRollback,
          "changelog_compact_replay" -> clCompact,
          "changelog_full_overwrite_diff" -> clDiff,
          "rollup_incremental" -> ruInc, "rollup_full_recompute" -> ruFull,
          "wap_stage" -> wapStage, "wap_publish" -> wapPublish,
          "merge_mor_touched" -> mergeMor,
          "merge_cow_rewrite" -> mergeCow,
          "merge_cow_clustered" -> mergeCowClustered,
          "cow_delete_clustered" -> cowDeleteClustered,
          "sql_subquery_delete_mor" -> sqlSubqDeleteMor,
          "sql_update_cow_clustered" -> sqlUpdateClustered)) {
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
