package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.{NearDup, TextAnalysis}

/** End-to-end training-data curation pipeline over the documents table —
  * the composition story: language gate → quality gate → exact dedup →
  * near-dup clustering → keep-one-per-group → token budgeting. Every
  * stage is one of the library's oracle-checked operators; this spec
  * asserts they compose and the funnel is monotone. */
class TrainingPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("curation funnel: lang -> quality -> exact dedup -> near-dup -> budget") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val total = docs.count()

    // 1. language gate (compiled marker heuristic)
    val english = docs.where(TextAnalysis.langId($"text") === "en")
    val nLang = english.count()
    assert(nLang > 0 && nLang <= total)

    // 2. quality gate
    val quality = english.where(TextAnalysis.qualityScore($"text") >= 0.3)
    val nQuality = quality.count()
    assert(nQuality > 0 && nQuality <= nLang)

    // 3. exact dedup: drop all but the lowest doc_id per content fingerprint
    val withFp = quality.withColumn("fp", TextAnalysis.fingerprint($"text"))
    val keepExact = withFp
      .withColumn("keep_id", min("doc_id")
        .over(org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .where($"doc_id" === $"keep_id").drop("fp", "keep_id")
    val nExact = keepExact.count()
    assert(nExact <= nQuality)

    // 4. near-dup clustering: jaccard pairs -> components -> keep min id
    val pairs = NearDup.jaccardPairs(keepExact, "doc_id", "text",
      n = 3, threshold = 0.8, maxShingleFreq = 100)
    val comps = NearDup.duplicateComponents(pairs)
    val dropNearDups = keepExact.join(
      comps.where($"doc_id" =!= $"component").select("doc_id"),
      Seq("doc_id"), "left_anti")
    val nFinal = dropNearDups.count()
    assert(nFinal <= nExact)
    // every surviving component representative is present
    val reps = comps.select($"component").distinct().count()
    val droppedNearDups = nExact - nFinal
    assert(droppedNearDups == comps.count() - reps)

    // 5. token budget of the final corpus (whitespace + BPE-ish)
    val budget = dropNearDups.agg(
      sum(TextAnalysis.tokenCount($"text").cast("long")).as("ws"),
      sum(TextAnalysis.bpeTokenCount($"text")).as("bpe")).head()
    assert(budget.getLong(0) > 0 && budget.getLong(1) > 0)

    // funnel is strictly a filter chain: nothing was duplicated back in
    assert(dropNearDups.select("doc_id").distinct().count() == nFinal)
    info(s"funnel: $total -> lang $nLang -> quality $nQuality -> " +
      s"exact $nExact -> nearDup $nFinal; tokens ws=${budget.getLong(0)} " +
      s"bpe=${budget.getLong(1)}")

    // the packaged operator reproduces the hand-built funnel exactly
    val (curated, stats) = graft.text.Curation.funnel(docs, "doc_id", "text")
    assert(stats.get == graft.text.Curation.FunnelStats(
      total, nLang, nQuality, nExact, nFinal))
    assert(curated.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      dropNearDups.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("rankedClusterMembers picks the HIGHEST-score representative, id tiebreak") {
    // two near-dup clusters; the injectable score column makes the
    // selection policy testable independent of the quality formula
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val other = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val docs = Seq(
      (1L, base), (2L, base), (5L, base), // cluster A
      (3L, other), (4L, other),           // cluster B
      (9L, "a lonely unclustered document with completely unique words here")
    ).toDF("doc_id", "text")
    // score = doc_id: rep must be the MAX id (desc order), proving the
    // policy is best-score-first, not min-id
    val ranked = graft.text.Curation.rankedClusterMembers(
      docs, "doc_id", "text", col("doc_id").cast("double"))
    val reps = ranked.where(col("rnk") === 1)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(reps.values.toSet == Set(5L, 4L), reps.toString)
    // unclustered doc 9 never appears (components only cover clustered docs)
    assert(ranked.where(col("doc_id") === 9L).count() == 0)
    // every cluster member is ranked, ties impossible with distinct scores
    assert(ranked.count() == 5)
    NearDup.releaseResultCheckpoints(ranked)
  }

  test("admitIncrementalFromShingles: materialized kept side == recompute path, fewer shingle passes") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val kept = docs.where($"doc_id" % 2 === 0)
    val batch = docs.where($"doc_id" % 2 === 1)
    val cfg = graft.text.Curation.Config()
    val expected = graft.text.Curation.admitIncremental(kept, batch,
      "doc_id", "text", cfg).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq

    // production shape: kept-side shingles live as a materialized table
    val tmp = java.nio.file.Files.createTempDirectory("graft-keptsh-").toString
    NearDup.shingleTable(kept, "doc_id", "text", cfg.shingleN)
      .write.mode("overwrite").parquet(tmp)
    val matSh = spark.read.parquet(tmp)
    val got = graft.text.Curation.admitIncrementalFromShingles(
      kept.select($"doc_id"), matSh, batch, "doc_id", "text", cfg)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expected)

    // plan audit: the pair stage over (materialized kept ∪ shingled batch)
    // evaluates the compiled shingle expression only on the batch subtree —
    // the kept side is a parquet read, not a recompute
    def planOf(sh: org.apache.spark.sql.DataFrame): String =
      NearDup.jaccardPairsFromShingles(sh, cfg.jaccardThreshold,
        cfg.maxShingleFreq).queryExecution.executedPlan.toString
    val matPlan = planOf(matSh.unionByName(
      NearDup.shingleTable(batch, "doc_id", "text", cfg.shingleN)))
    val fullPlan = planOf(NearDup.shingleTable(
      kept.unionByName(batch), "doc_id", "text", cfg.shingleN))
    assert(matPlan.contains("graft_shingles"),
      "batch side must still be shingled by the compiled expression")
    assert(matPlan.contains(tmp),
      "kept side must come from the materialized parquet, not a recompute")
    // each pair-stage consumer scans documents once (batch) in the
    // materialized plan vs twice (kept + batch) when recomputing
    def docScans(p: String): Int =
      "documents\\.parquet".r.findAllIn(p).size
    assert(docScans(matPlan) * 2 == docScans(fullPlan),
      s"kept-side corpus scans must disappear from the pair stage " +
        s"(${docScans(matPlan)} vs ${docScans(fullPlan)})")
  }

  test("incremental admission rejects cross-batch and within-batch near-dups") {
    val base = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    val kept = Seq((1L, base),
      (2L, "completely different content about cooking pasta with garlic and olive oil"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, base + " today"),                         // near-dup of kept doc 1
      (11L, "fresh unique article about mountain hiking trails and alpine weather patterns"),
      (12L, "another brand new text on deep sea creatures and their glowing light organs"),
      (13L, "another brand new text on deep sea creatures and their glowing light organ"))
      .toDF("doc_id", "text")                         // 13 near-dups 12
    val admitted = graft.text.Curation.admitIncremental(kept, batch,
      "doc_id", "text",
      graft.text.Curation.Config(jaccardThreshold = 0.6))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 10 blocked by kept; 13 loses to 12 within the batch; 11, 12 admitted
    assert(admitted == Set(11L, 12L))
    // admission is idempotent: re-offering the same batch after appending
    // the admitted docs admits nothing new
    val grown = kept.unionByName(batch.where($"doc_id".isin(11L, 12L)))
    val again = graft.text.Curation.admitIncremental(grown, batch,
      "doc_id", "text", graft.text.Curation.Config(jaccardThreshold = 0.6))
      .collect()
    assert(again.isEmpty)
  }
}
