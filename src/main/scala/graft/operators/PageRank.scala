package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank over an edge list, as DataFrame join iterations —
  * the corpus-curation ranking primitive (rank domains by who links to
  * whom, rank sources by citation, order a crawl frontier). Classic
  * power iteration (Page et al. 1999; same shape as GraphX's
  * `staticPageRank`, expressed on DataFrames so Catalyst/AQE handle the
  * physical join strategy).
  *
  * Scale posture: each iteration is one `ranks ⋈ edges` shuffle on the
  * source key plus a groupBy on the destination — no adjacency is ever
  * collected, node and edge tables stay distributed, and the per-round
  * lineage is cut with a localCheckpoint exactly like the
  * connected-components fixpoint (NearDup.connectedComponents). The only
  * driver-side value per iteration is the dangling-mass SCALAR (one
  * aggregated double — bounded regardless of graph size). Iterations are
  * a fixed count (rank deltas, not plan depth, decide convergence).
  *
  * Dangling nodes (no out-edges) redistribute their mass uniformly, the
  * standard stochastic-matrix completion, so total rank stays 1 and
  * results are independent of how many sink nodes the graph has.
  *
  * Determinism: given fixed iterations the result is a pure function of
  * the edge multiset, up to floating-point summation order (~1e-15
  * relative); gates compare micro-rounded ranks.
  */
object PageRank {

  /** Ranks after `iters` power iterations.
    *
    * @param edges   (srcCol, dstCol, weightCol) edge list; parallel edges
    *                allowed (weights add)
    * @return (node, rank) summing to ~1.0
    */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters >= 1: $iters")
    require(damping > 0 && damping < 1, s"damping in (0,1): $damping")
    // pin the edge list once: it feeds nodes, outW and EVERY iteration's
    // join — without this an expensive upstream (e.g. a transition
    // window over the raw event log) re-executes 2 + iters times
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("double").as("w"))
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(eager = false)
    val n = nodes.count().toDouble
    val outW = e.groupBy("src").agg(sum("w").as("ow"))
      .localCheckpoint(eager = false)
    var ranks = nodes.withColumn("r", lit(1.0 / n))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iters) {
      val contrib = ranks.join(e, ranks("node") === e("src"))
        .join(outW, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("r") * col("w") / col("ow")).as("c"))
      // dangling mass: rank held by nodes with no out-edges (one scalar)
      val dangling = ranks.join(outW, ranks("node") === outW("src"),
          "left_anti")
        .agg(coalesce(sum("r"), lit(0.0))).head().getDouble(0)
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("c"), lit(0.0)) +
              lit(dangling / n))).as("r"))
      val prev = ranks
      ranks = next.localCheckpoint(eager = false)
      ranks.count() // materialize before releasing the superseded round
      prev.unpersist()
    }
    ranks.select(col("node"), col("r").as("rank"))
  }
}
