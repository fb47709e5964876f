package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle enumeration via degree-ordered edge orientation
  * (Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
  * Reducer", WWW'11) — the graph primitive behind community detection
  * and link-spam scoring on crawl/co-occurrence graphs.
  *
  * The naive wedge join groups every pair of neighbors around every
  * node: a single hub of degree d contributes d²/2 wedges, and on
  * power-law graphs (every web/co-occurrence graph) the top hub
  * dominates the whole job — the "curse of the last reducer". Orienting
  * each edge from its lower-(degree, id) endpoint to the higher one
  * fixes this: every triangle is generated exactly once (from its
  * minimum corner in the degree total order), and out-degrees are
  * bounded near sqrt(maxWedges) because a hub's edges point INTO it, so
  * no reducer sees the hub's full neighborhood.
  *
  * Plan: canonicalize (2 narrow ops + distinct), one degree groupBy, a
  * self-join of the oriented edges on the wedge center, and one closure
  * join against the canonical edge set — all equi-joins, no cartesian.
  *
  * Output: one row per triangle, corners sorted by node id (a < b < c)
  * so results are engine-portable regardless of the internal
  * orientation order.
  */
object Triangles {

  /** Canonical undirected edge set (u < v), self-loops and duplicates
    * dropped. */
  def canonicalEdges(edges: DataFrame, uCol: String, vCol: String): DataFrame =
    edges.select(least(col(uCol), col(vCol)).as("u"),
      greatest(col(uCol), col(vCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

  /** All triangles (a, b, c), a < b < c by node id. */
  def triangles(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    val e0 = canonicalEdges(edges, uCol, vCol)
      .localCheckpoint(eager = false) // reused by degrees, wedges, closure
    val deg = e0.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("d"))
    // orient each edge from the smaller (degree, id) endpoint
    val oriented = e0
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
    // wedges around each center s (out-degree bounded by orientation),
    // then close the wedge against the canonical edge set. Both joins'
    // exchanges are pinned: wedge generation and closure are row-volume
    // CPU, which byte-based AQE coalescing would serialize.
    val keyed = Spread.byKey(oriented, col("s"))
    val wedges = Spread.byKey(keyed.alias("e1")
      .join(keyed.alias("e2"),
        col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
      .select(col("e1.s").as("x"), col("e1.t").as("lo"),
        col("e2.t").as("hi")), col("lo"), col("hi"))
    wedges
      .join(Spread.byKey(e0, col("u"), col("v")),
        wedges("lo") === e0("u") && wedges("hi") === e0("v"))
      .select(array_sort(array(col("x"), col("lo"), col("hi"))).as("tr"))
      .select(element_at(col("tr"), 1).as("a"),
        element_at(col("tr"), 2).as("b"),
        element_at(col("tr"), 3).as("c"))
  }

  /** Per-node triangle participation counts (node, n_triangles) — the
    * clustering-coefficient numerator. Nodes in no triangle are absent. */
  def triangleCounts(edges: DataFrame, uCol: String, vCol: String): DataFrame =
    triangles(edges, uCol, vCol)
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
}
