package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class NearDupSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  val docsDir = "/root/testdata/sf0.001"
  lazy val docs = graft.Tables.load(spark, docsDir, "documents").cache()

  test("tokenCount / fingerprint / langId basics") {
    val df = Seq(
      (1L, "The quick brown fox and the lazy dog"),
      (2L, "the  QUICK   brown fox and the lazy dog"), // same after normalize? no — double spaces collapse, case folds
      (3L, "der hund und die katze ist nicht da"),
      (4L, "xyzzy plugh")).toDF("id", "text")
    val by = df.select($"id",
      TextAnalysis.tokenCount($"text").as("tc"),
      TextAnalysis.fingerprint($"text").as("fp"),
      TextAnalysis.langId($"text").as("lang")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2), r.getString(3)))).toMap
    assert(by(1L)._1 == 8)
    // rows 1 and 2 normalize to the same fingerprint
    assert(by(1L)._2 == by(2L)._2)
    assert(by(1L)._3 == "en")
    assert(by(3L)._3 == "de")
    assert(by(4L)._3 == "unknown")
  }

  test("bpeTokenCount: letter runs at ceil(len/4), digits and punct at 1") {
    val df = Seq(
      (1L, "hello world"),              // 2+3/4 runs: ceil(5/4)*2 = 4
      (2L, "internationalization 42!"), // ceil(20/4)=5 + 2 digits + 1 punct = 8
      (3L, ""),                         // 0
      (4L, "x,y;z 12.5"),               // 3 letters + 2 punct(,;) + 3 digits + 1 punct(.) = 9
      (5L, "ABCDEFGH"),                 // ceil(8/4) = 2
      (6L, "hi 😀😀") // non-BMP: 1 run + 2 emoji CODEPOINTS = 3
    ).toDF("id", "text")
    val got = df.select($"id", TextAnalysis.bpeTokenCount($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 4L, 2L -> 8L, 3L -> 0L, 4L -> 9L, 5L -> 2L, 6L -> 3L))
    // SQL registration path
    graft.GraftExtensions.register(spark)
    df.createOrReplaceTempView("bpe_docs")
    val viaSql = spark.sql(
      "SELECT sum(graft_bpe_tokens(text)) AS s FROM bpe_docs").head().getLong(0)
    assert(viaSql == 26L)
  }

  test("repetitionRatio: max n-gram share, NULL below n tokens") {
    val df = Seq(
      (1L, "spam spam spam spam"),        // 3 bigrams, all "spam spam" -> 1.0
      (2L, "a b c d"),                    // 3 distinct bigrams -> 1/3
      (3L, "buy now buy now buy now"),    // 5 bigrams: "buy now"x3,"now buy"x2 -> 0.6
      (4L, "single"),                     // < 2 tokens -> NULL
      (5L, "")                            // split("") = [""] -> NULL
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id",
      TextAnalysis.repetitionRatio($"text", 2).as("r")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got(1L).contains(1.0))
    assert(got(2L).contains(1.0 / 3))
    assert(got(3L).contains(0.6))
    assert(got(4L).isEmpty && got(5L).isEmpty)
  }

  test("crossJaccardPairs: bipartite only — finds A→B contamination") {
    val trainDocs = Seq(
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "one two three four five six seven eight nine ten"),
      (6L, "totally unrelated training content goes here now")
    ).toDF("doc_id", "text")
    val evalDocs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),   // copy of 2
      (3L, "one two three four five six seven eight nine"),    // near-copy of 4
      (5L, "pristine evaluation prompt with no overlap at all")
    ).toDF("doc_id", "text")
    val pairs = graft.text.NearDup.crossJaccardPairs(trainDocs, evalDocs,
      "doc_id", "text", n = 3, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(pairs.keySet == Set((2L, 1L), (4L, 3L)))
    assert(pairs((2L, 1L)) == 1.0)
    // within-corpus duplicates must NOT pair: plant one and re-check
    val withDup = trainDocs.unionByName(
      Seq((8L, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text"))
    val p2 = graft.text.NearDup.crossJaccardPairs(withDup, evalDocs,
      "doc_id", "text", n = 3, threshold = 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p2 == Set((2L, 1L), (4L, 3L), (8L, 1L)), "2~8 (both in A) must not pair")
  }

  test("duplicateComponents: transitive closure with min-id components") {
    // chain 1-2-3 (1~2, 2~3 but NOT 1~3), isolated pair 10-11,
    // plus a 4-cycle 20-21-22-23 to force >1 propagation round
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 20L))
      .toDF("id_a", "id_b")
    val comp = NearDup.duplicateComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
    // a long path exercises multi-round convergence (diameter 6)
    val path = (30L until 36L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val pc = NearDup.duplicateComponents(path).collect()
      .map(r => r.getLong(1)).distinct
    assert(pc.toSeq == Seq(30L))
  }

  test("duplicateComponents matches driver-side union-find on random graphs") {
    // property check against an independent reference implementation:
    // min-label union-find (linking the larger root under the smaller
    // keeps every tree's root = its component minimum)
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val ids = Seq.fill(8 + rnd.nextInt(25))(rnd.nextInt(1000).toLong).distinct
      val edges = Seq.fill(1 + 2 * ids.size) {
        (ids(rnd.nextInt(ids.size)), ids(rnd.nextInt(ids.size)))
      }.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      if (edges.nonEmpty) {
        val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
        def find(x: Long): Long = {
          var r = x; while (parent(r) != r) r = parent(r); r
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .map(i => i -> find(i)).toMap
        val got = NearDup.duplicateComponents(edges.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"trial $trial over ${edges.size} edges")
      }
    }
  }

  test("duplicateComponents releases superseded checkpoints (storage-stable fixpoint)") {
    val sc = spark.sparkContext
    // a 51-node path needs several pointer-jumping rounds, each of which
    // checkpoints a new labels frame; superseded rounds' storage must be
    // released or a long fixpoint accumulates dead blocks in executors
    val pairs = (0L until 50L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val before = sc.getPersistentRDDs.keySet
    val comp = NearDup.duplicateComponents(pairs, maxIter = 30)
    assert(comp.collect().map(_.getLong(1)).distinct.toSeq == Seq(0L))
    val leftover = sc.getPersistentRDDs.keySet -- before
    assert(leftover.size <= 1,
      s"fixpoint leaked ${leftover.size} checkpointed RDDs (only the final " +
        s"labels frame may stay persisted): $leftover")
  }

  test("releaseResultCheckpoints leaves caller-owned checkpointed inputs alive") {
    // a caller pre-checkpoints their corpus, runs a graft operator over it,
    // materializes the result, releases the operator's internal checkpoints
    // — the caller's own checkpoint must survive (release is ownership-
    // tracked, not pattern-matched over every LogicalRDD in the plan)
    val callerOwned = (0L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      .localCheckpoint()
    val comp = NearDup.duplicateComponents(callerOwned, maxIter = 30)
    assert(comp.count() == 21L)
    NearDup.releaseResultCheckpoints(comp)
    // the operator's final labels checkpoint is gone, but the caller's
    // input frame must still be fully evaluable — a localCheckpoint's
    // lineage is truncated, so if release had wrongly unpersisted it this
    // count would throw, not recompute
    assert(callerOwned.count() == 20L)
  }

  test("duplicateComponents with a checkpoint dir: reliable files released per round") {
    import scala.jdk.CollectionConverters._
    val sc = spark.sparkContext
    val ckDir = java.nio.file.Files.createTempDirectory("graft-ck-").toString
    sc.setCheckpointDir(ckDir)
    try {
      val pairs = (0L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val comp = NearDup.duplicateComponents(pairs, maxIter = 30)
      assert(comp.collect().map(_.getLong(1)).distinct.toSeq == Seq(0L))
      // unpersist alone does NOT delete reliable checkpoint files — every
      // superseded round's rdd-* dir must be gone; only the final labels
      // checkpoint may remain on disk
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
      val rddDirs =
        try walk.iterator().asScala
          .count(p => p.getFileName.toString.startsWith("rdd-"))
        finally walk.close()
      assert(rddDirs <= 1, s"leaked reliable checkpoint dirs: $rddDirs")
    } finally {
      // the fixture session is shared and ckpt() keys off dir presence, so
      // reset the (private) checkpointDir to keep other suites on the
      // executor-local path. Reflection is version-fragile: fail LOUDLY if
      // the field moves (a silent miss would flip every later suite to
      // reliable checkpoints), without masking the assertion above.
      val reset = scala.util.Try {
        val f = sc.getClass.getDeclaredField("checkpointDir")
        f.setAccessible(true)
        f.set(sc, None)
      }
      val cleanup = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
      try cleanup.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally cleanup.close()
      assert(reset.isSuccess && sc.getCheckpointDir.isEmpty,
        s"could not reset SparkContext.checkpointDir (Spark internals " +
          s"changed?): $reset")
    }
  }

  test("LSH bucket-size guard chains a planted mega-bucket, keeps small ones") {
    // Adversarial corpus: 30 identical docs land every band hash in one
    // 30-doc bucket (unguarded: 435 = B²/2 candidates); 2 other identical
    // docs form small buckets that must survive untouched.
    val rows = (1L to 30L).map(i => (i, "common repeated text body")) ++
      Seq((100L, "rare pair text alpha beta"), (101L, "rare pair text alpha beta"))
    val df = rows.toDF("doc_id", "text")
    val sig = MinHashLSH.signatures(df, "doc_id", "text", n = 3, numHashes = 16)
    val unguarded = MinHashLSH.candidatePairs(sig, 16, 4).count()
    assert(unguarded >= 30L * 29 / 2) // mega-bucket candidates present
    val guarded = MinHashLSH.candidatePairs(sig, 16, 4, maxBucketSize = 10)
    val pairs = guarded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // candidate count bounded: B-1 chain links, not B²/2 all-pairs
    val chain = (1L to 29L).map(i => (i, i + 1)).toSet
    assert(pairs == chain + ((100L, 101L)))
    // recall preserved through verify + components: the chain links all
    // pass exact verification (identical docs), and the component stage
    // recovers the full 30-doc cluster from the spanning chain
    val verified = NearDup.verifyPairs(df, "doc_id", "text", n = 3,
      cands = guarded, threshold = 0.8)
    val compDf = NearDup.duplicateComponents(verified.select("id_a", "id_b"))
    val comps = compDf.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 30L).map(comps).toSet.size == 1) // one cluster, all 30
    assert(comps(100L) == comps(101L))
    NearDup.releaseResultCheckpoints(compDf)
  }

  test("exactDupGroups finds planted duplicates deterministically") {
    val df = Seq(
      (10L, "alpha beta gamma"), (11L, "ALPHA  beta   GAMMA"),
      (12L, "unique text here")).toDF("doc_id", "text")
    val groups = NearDup.exactDupGroups(df, "doc_id", "text").collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("cnt") == 2)
    assert(groups.head.getAs[Long]("keep_id") == 10L)
  }

  test("MinHash LSH finds the high-jaccard pairs the exact method finds") {
    val exact = NearDup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    val lsh = MinHashLSH.nearDuplicates(docs, "doc_id", "text",
      n = 3, numHashes = 128, bands = 32, threshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification step makes LSH precise: no false positives
    assert(lsh.subsetOf(exact))
    // banded LSH at b=32,r=4 has >99.9% recall at j≈0.99 (planted pairs)
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.95, s"LSH recall too low: $recall (${lsh.size}/${exact.size})")
  }

  test("MinHash LSH output EQUALS exact Jaccard on the gate corpus (sf0.01)") {
    // q22's oracle is the exact-Jaccard SQL; this asserts the premise —
    // recall 1.0 at 128 hashes / 32 bands on the corpus the driver gates.
    val gateDocs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val exact = NearDup.jaccardPairs(gateDocs, "doc_id", "text", n = 3, threshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = MinHashLSH.nearDuplicates(gateDocs, "doc_id", "text",
      n = 3, numHashes = 128, bands = 32, threshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"LSH missed ${(exact diff lsh).size} / extra ${(lsh diff exact).size}")
  }

  test("SimHash banded Hamming join is complete vs brute force") {
    val fp = SimHash.fingerprints(docs, "doc_id", "text").cache()
    val banded = SimHash.hammingPairs(fp, maxDist = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = fp.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ida, ha) <- rows; (idb, hb) <- rows
      if ida < idb && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ida, idb)).toSet
    assert(banded == brute)
  }

  test("winnowing fingerprints: shared-substring guarantee + near-dup recall") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "THE QUICK  brown fox jumps over the lazy dog near the river bank"),
      (3L, "completely different words xyz qqq zzz vvv www uuu ttt sss")).toDF("doc_id", "text")
    // normalized-identical docs have identical fingerprint sets
    val fps = df.select($"doc_id",
      TextExpressions.winnow($"text", 5, 4).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L) == fps(2L) && fps(1L).nonEmpty)
    assert((fps(1L) intersect fps(3L)).size < fps(1L).size / 2)
    val pairs = NearDup.winnowPairs(df, "doc_id", "text", minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    // planted near-dups in the testdata are found too
    val planted = NearDup.jaccardPairs(docs, "doc_id", "text", threshold = 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val winnowed = NearDup.winnowPairs(docs, "doc_id", "text", minShared = 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = planted.count(winnowed.contains).toDouble / math.max(planted.size, 1)
    assert(recall >= 0.9, s"winnowing recall too low: $recall")
  }

  test("SimHash hamming pairs are supersets of near-identical docs") {
    val fp = SimHash.fingerprints(docs, "doc_id", "text").cache()
    assert(fp.count() == docs.count())
    // near-identical planted pairs should mostly collide within distance 3
    val exact = NearDup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = SimHash.hammingPairs(fp, maxDist = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = exact.count(sim.contains).toDouble / math.max(exact.size, 1)
    assert(hit >= 0.8, s"simhash hit rate too low: $hit")
  }
}
