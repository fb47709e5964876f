package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking (Hernández & Stolfo, "The Merge/Purge
  * Problem for Large Databases", SIGMOD'95): sort the corpus by a
  * blocking key, then consider only pairs within `window` positions of
  * each other — the third classic dedup-blocking family next to LSH
  * (NearDup) and prefix filtering (PrefixFilterJoin). It shines when
  * near-duplicates share a PREFIX-like key (url, title, normalized
  * leading text) rather than global token overlap.
  *
  * Scale shape: the global sort rides [[GlobalOrder.rankWithPrefixSum]]
  * (range partition + offsets — never a single-partition window), and
  * the rank-distance theta join is rewritten as an ADJACENT-BUCKET
  * equi-join: ranks bucket by `window`, every row is also keyed into
  * its successor bucket, and |rank_a - rank_b| <= window can only pair
  * rows sharing a key — so the join stays hash-partitioned with bucket
  * fanout 2, no quadratic strategy at any scale.
  */
object SortedNeighborhood {

  /** Candidate pairs with global-rank distance in (0, window], ordered
    * (id_a earlier in sort order). Result: (id_a, id_b), distinct. */
  def candidatePairs(df: DataFrame, idCol: String, sortCols: Seq[Column],
      window: Int): DataFrame = {
    require(window >= 1, s"window >= 1: $window")
    // materialize the sort expressions so ranking sees stable columns
    val base = df.select(col(idCol).as("__id") +:
      sortCols.zipWithIndex.map { case (c, i) => c.as(s"__s$i") }: _*)
    val ranked = GlobalOrder.rankWithPrefixSum(base,
      sortCols.indices.map(i => col(s"__s$i")), rankCol = "__rn")
      .select(col("__id"), col("__rn"),
        floor((col("__rn") - 1) / window).cast("long").as("__b"))
    // each row joins under its home bucket and its successor bucket; the
    // bucket-key exchange is pinned (shared by both self-join sides) so
    // the candidate join keeps full width under AQE coalescing
    val keyed = Spread.byKey(ranked.select(col("__id"), col("__rn"),
      explode(array(col("__b"), col("__b") + 1)).as("__k")), col("__k"))
    keyed.alias("a")
      .join(keyed.alias("b"),
        col("a.__k") === col("b.__k") &&
          col("b.__rn") > col("a.__rn") &&
          col("b.__rn") <= col("a.__rn") + window)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
  }

  /** Sorted-neighborhood near-dup pairs: block by `sortCols`, verify
    * candidates with exact n-gram Jaccard ([[graft.text.NearDup
    * .verifyPairs]]). Deliberately lossy OUTSIDE the window (that is the
    * method); exact within it. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      sortCols: Seq[Column], window: Int, n: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val cands = candidatePairs(df, idCol, sortCols, window)
      .localCheckpoint(eager = false)
    graft.text.NearDup.verifyPairs(df, idCol, textCol, n, cands, threshold)
  }
}
