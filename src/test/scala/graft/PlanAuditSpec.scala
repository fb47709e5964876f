package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards for the scale claims in SCALING.md:
  * filters reach the parquet scan, projections prune the read schema,
  * top-k never global-sorts, aggregation is partial map-side. Plans are
  * inspected at sf0.001 — the SHAPE is scale-invariant.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q6: filter pushed to parquet scan, read schema pruned") {
    val p = planOf("q6_filtered_revenue")
    assert(p.contains("PushedFilters: ["), "expected parquet filter pushdown")
    assert(p.contains("l_shipdate"), "shipdate range must reach the scan")
    assert(!p.contains("l_comment"),
      "untouched wide column must be pruned from ReadSchema")
  }

  test("q2: top-k via TakeOrderedAndProject, never a global sort") {
    val p = planOf("q2_revenue_topn")
    assert(p.contains("TakeOrderedAndProject"),
      "limit+order must fuse into top-k, not materialize a global sort")
  }

  test("q1: aggregation is partial (map-side combine before the shuffle)") {
    val p = planOf("q1_pricing_summary")
    val hashAggs = "HashAggregate".r.findAllIn(p).size
    assert(hashAggs >= 2, s"expected partial+final HashAggregate, got $hashAggs")
  }

  test("q16: text analysis is a narrow scan + aggregate — no joins") {
    val p = planOf("q16_token_stats")
    assert(!p.contains("Join"), "token stats must not join")
  }

  test("q187: PPS sampling never sorts globally — range partition + " +
      "partition-local windows only") {
    val p = planOf("q187_pps_sample")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"quadratic strategy:\n$p")
    // every Sort must be partition-local (prints "…], false, 0"); a
    // global sort ("…], true, 0") would mean the prefix sum degenerated
    // into one ordered pass
    assert(!"Sort \\[[^\\]]*\\], true".r.unanchored.matches(p),
      s"global sort in the sampler plan:\n$p")
    // the running sum must be a __pid-partitioned window (no single-task
    // window over the whole corpus), fed by the broadcast offsets join
    assert(p.contains("], [__pid"), s"window not partition-local:\n$p")
    assert(p.contains("BroadcastHashJoin [__pid"),
      s"offsets must broadcast, not shuffle:\n$p")
  }

  test("q52: packing is ONE shuffle — the groupBy reuses the window's partitioning") {
    val p = planOf("q52_sequence_packing")
    // count SHUFFLE exchanges only ("Exchange hashpartitioning/range...");
    // a broadcast exchange would also match a bare "Exchange" substring
    val shuffles = "Exchange (hash|range|single)partitioning".r.findAllIn(p).size
    // window shuffles by source; the (source, seq_no) groupBy is satisfied
    // by source partitioning, so no second exchange
    assert(shuffles == 1, s"expected exactly 1 shuffle Exchange, got $shuffles:\n$p")
  }

  test("q66: quantize + integer dot stay compiled — no interpreted HOF lambdas") {
    // regression guard for the 40× blowup: CollapseProject once inlined the
    // absMax aggregate into every transform lambda element, and the pair
    // stage interpreted aggregate(zip_with(...)) per pair
    val p = planOf("q66_quantized_dup_pairs")
    assert(p.contains("graft_qdot"), p)
    assert(p.contains("graft_int8_quantize"), p)
    assert(!p.contains("lambdafunction"),
      s"interpreted HOF lambda leaked into the q66 hot path:\n$p")
  }

  test("q87: OR-of-ANDs predicate keeps the equi-key hash join, never a cross product") {
    val p = planOf("q87_brand_predicate_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"OR-of-ANDs predicate degraded the join strategy:\n$p")
  }

  test("q58 tfidf pair stage: inverted-index equi-join, never a quadratic strategy") {
    val docs = Tables.load(spark, dir, "documents")
    val p = graft.text.TokenSimilarity.tfidfPairs(docs, "doc_id", "text",
      threshold = 0.5, maxTokenFreq = 100, quantizeScale = 6)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "tfidf pairs must not cross join")
    assert(!p.contains("BroadcastNestedLoop"),
      "tfidf pairs must not nested-loop join")
  }

  test("q57 pair stage: cluster-restricted equi-join, not all-pairs") {
    import org.apache.spark.sql.functions.col
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cents = graft.vector.KMeansIvf.train(e, "vec_id", "embedding",
      k = 8, dims = 64, iters = 1)
    val p = graft.vector.KMeansIvf.dupPairsFromClusters(
      graft.vector.KMeansIvf.assign(e, "embedding", cents),
      "vec_id", "embedding", threshold = 0.45)
      .queryExecution.executedPlan.toString
    assert(p.contains("cluster"), "join must be keyed on the cluster column")
    assert(!p.contains("CartesianProduct"), "cluster pairs must not cross join")
    assert(!p.contains("BroadcastNestedLoop"),
      "cluster pairs must not nested-loop join")
  }

  test("q63 range join: bin equi-join, never a quadratic strategy") {
    val p = planOf("q63_range_join")
    assert(!p.contains("CartesianProduct"),
      "banded range join must not cross join")
    assert(!p.contains("BroadcastNestedLoop"),
      "banded range join must not nested-loop join — the bin key makes it " +
        "a hash/sort-merge join")
  }

  test("q61: span-hash joins are hash-keyed, never quadratic") {
    val p = planOf("q61_repeated_spans")
    assert(!p.contains("CartesianProduct"), "span join must not cross join")
    assert(!p.contains("BroadcastNestedLoop"),
      "span join must not nested-loop join")
  }

  test("q64: token scoring join is a hash join (1-row total broadcast aside)") {
    val p = planOf("q64_unigram_logprob")
    assert(!p.contains("CartesianProduct"))
    // the corpus-total rides in as a broadcast SINGLE ROW (planner lowers
    // that cross join to a 1-row BroadcastNestedLoop — constant work, the
    // same shape Mixture uses); the token join itself must be hash-keyed
    assert(p.contains("HashJoin"), "tok->lp join must be a hash join")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"only the 1-row total broadcast may nested-loop: $p")
  }

  test("minhash signature stage is narrow — compiled expression, no explode") {
    // inspect the signatures stage directly: in the full q22 frame the
    // candidate set is localCheckpoint'ed, which hides this subtree
    val docs = Tables.load(spark, dir, "documents")
    val p = graft.text.MinHashLSH.signatures(docs, "doc_id", "text", 3, 128)
      .queryExecution.executedPlan.toString
    assert(p.contains("graft_minhash") || p.toLowerCase.contains("minhashsignature"),
      "compiled MinHashSignature expression expected in the plan")
    assert(!p.contains("Generate"), "no explode in the signature pass")
    // the input-skew spread (Spread.wideScan, r21) may ROUND-ROBIN the
    // narrow one-row-group scan; the signature computation itself must
    // stay a narrow map — a hash/range exchange would mean the exploded
    // k-wide aggregation formulation crept back in
    val exchangeKinds =
      "Exchange (\\w+)".r.findAllMatchIn(p).map(_.group(1)).toList
    assert(exchangeKinds.forall(_ == "RoundRobinPartitioning"),
      s"signature pass may only carry the input spread, got $exchangeKinds")
  }

  test("q95/q96: global ordering never plans a single-partition exchange") {
    // the GlobalOrder primitive replaces the classic Window.orderBy (one
    // task sorts everything) with range partition + offsets — the gates
    // themselves must keep that shape
    for (q <- Seq("q95_epoch_shuffle", "q96_token_budget",
        "q98_global_rank")) {
      val p = planOf(q)
      assert(!p.contains("SinglePartition"),
        s"$q collapsed to a single-partition exchange:\n$p")
    }
  }

  test("q100: line dedup joins stay hash-based — no nested-loop anywhere") {
    val p = planOf("q100_line_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"line dedup must never plan a quadratic join:\n$p")
  }

  test("q101: heavy-hitter verify joins the bounded candidate set broadcast") {
    // the whole point of the MG pass: only candidate rows shuffle; the
    // candidate set itself (<= capacity entries) rides a broadcast, so a
    // sort-merge join against the corpus would defeat the design
    val p = planOf("q101_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"),
      s"candidate filter must be a broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus-side sort-merge join defeats the candidate design:\n$p")
  }

  test("q102: prefix join and verify stay equi-keyed — no quadratic strategy") {
    val p = planOf("q102_prefix_jaccard")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"prefix-filtered join must never plan a quadratic join:\n$p")
  }

  test("q106: oriented wedge + closure joins are hash-keyed, no cartesian") {
    val p = planOf("q106_triangles")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"triangle enumeration must never plan a quadratic join:\n$p")
  }

  test("q109: sorted-neighborhood keeps GlobalOrder's shape — no single-partition sort, no quadratic join") {
    val p = planOf("q109_sorted_neighborhood")
    assert(!p.contains("SinglePartition"),
      s"blocking sort must not collapse to one partition:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"rank-distance join must stay an adjacent-bucket equi-join:\n$p")
  }

  test("q110: KL terms join by token/slice keys; only the 1-row total broadcasts") {
    val p = planOf("q110_kl_drift")
    assert(!p.contains("CartesianProduct"),
      s"KL drift must not plan a cartesian product:\n$p")
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnl <= 1, s"only the corpus-total scalar may nested-loop:\n$p")
  }

  test("q104/q105: grid join is equi-keyed; only the 1-row span broadcasts") {
    for (q <- Seq("q104_gap_fill", "q105_moving_avg")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"),
        s"$q must not plan a cartesian product:\n$p")
      // the span crossJoin is a broadcast of ONE aggregated row; the
      // grid-to-actual join itself must be hash-keyed on (grp, bucket)
      assert(p.contains("BroadcastNestedLoopJoin") ||
        p.contains("BroadcastHashJoin"),
        s"$q: span scalar must ride a broadcast:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
        p.contains("ShuffledHashJoin"),
        s"$q: grid-actual join must be equi-keyed:\n$p")
    }
  }

  test("q112 fuzzy join: block equi-join, never a cartesian product") {
    val p = planOf("q112_fuzzy_match")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"fuzzy blocking must equi-join on the block key:\n$p")
  }

  test("q113/q120 binning: no unpartitioned window, no global sort") {
    for (q <- Seq("q113_eqfreq_bins", "q120_calibration")) {
      val p = planOf(q)
      // the only windows are partition-local (__pid-keyed); a global
      // ntile would show a windowspecdefinition without partition keys
      assert(!"Window \\[[^\\]]*windowspecdefinition\\((?!__pid)"
        .r.findFirstIn(p).isDefined, s"$q: unpartitioned window:\n$p")
    }
  }

  test("q122 incremental agg: delta aggregates partially before the state join") {
    val p = planOf("q122_incremental_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("Join"), "state merge must be a join")
  }

  test("q126 paths: the cap window and the path groupBy share the key shuffle") {
    val p = planOf("q126_event_paths")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected the user-key shuffle (+path count), got $exchanges:\n$p")
  }

  test("q134 correlated subquery decorrelates: joins, no per-row subquery") {
    val p = planOf("q134_min_cost_supplier")
    assert(!p.contains("ScalarSubquery"),
      s"correlated MIN must decorrelate to aggregate+join:\n$p")
    assert(p.contains("Join"), p)
  }

  test("q160-q163 TPC-H joins: broadcast dims, equi-keys, no quadratic strategy") {
    for (q <- Seq("q160_tpch_q5", "q161_tpch_q8", "q162_tpch_q9",
        "q163_tpch_q10")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"$q degraded to a non-equi join strategy:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"$q: small dimension sides must broadcast:\n$p")
    }
  }

  test("q162: substring part filter pushed into the parquet scan") {
    val p = planOf("q162_tpch_q9")
    assert(p.contains("StringContains(p_name,widget)"),
      s"LIKE '%widget%' must reach the part scan as StringContains:\n$p")
  }

  test("q163: returnflag pushed to lineitem scan; top-20 fuses, no global sort") {
    val p = planOf("q163_tpch_q10")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      s"returnflag filter must reach the lineitem scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"ORDER BY + LIMIT 20 must fuse into top-k:\n$p")
  }
}
