package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (binned) range join: point-in-interval joins as shuffle
  * EQUI-joins. Spark plans a bare `p >= lo AND p < hi` join condition as
  * BroadcastNestedLoopJoin or CartesianProduct — O(|points| × |intervals|)
  * comparisons, the classic 100 TB killer. Binning both sides by a fixed
  * width turns it into a hash join: an interval [lo, hi] covers
  * ceil(len/width)+1 bins, a point sits in exactly ONE bin, so joining on
  * the bin and re-checking the inequality produces each qualifying pair
  * exactly once (the point's single bin is among the interval's covered
  * bins) — no dedup step needed.
  *
  * Cost model: shuffle volume is |points| + Σ_intervals (len/width + 1)
  * rows; choose `binWidth` near the TYPICAL interval length so most
  * intervals land in O(1) bins. Skew from one giant interval degrades
  * gracefully (it fans out to len/width rows, each a cheap probe, spread
  * across partitions by bin — the opposite of a hot key). The same shape
  * Flink/Databricks ship as "range join optimization"; composes with AQE
  * (the interval side often broadcasts after fan-out).
  */
object RangeJoin {

  /** Join `points` to every row of `intervals` whose [loCol, hiCol) range
    * contains `pointCol` (hi inclusive when `inclusiveHi`). Columns from
    * both inputs are kept (internal bin columns dropped). Numeric point /
    * bound columns; `binWidth` > 0 in the same units. */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double, inclusiveHi: Boolean = false): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("__pbin",
      floor(col(pointCol).cast("double") / binWidth).cast("long"))
    val iv = intervals.withColumn("__ibin",
      explode(sequence(
        floor(col(loCol).cast("double") / binWidth).cast("long"),
        floor(col(hiCol).cast("double") / binWidth).cast("long"))))
    val bounds = col(pointCol) >= col(loCol) &&
      (if (inclusiveHi) col(pointCol) <= col(hiCol)
       else col(pointCol) < col(hiCol))
    p.join(iv, p("__pbin") === iv("__ibin") && bounds)
      .drop("__pbin", "__ibin")
  }

  /** Interval×interval overlap join (half-open [lo, hi) semantics:
    * overlap iff a.lo < b.hi AND b.lo < a.hi), as a bin equi-join. Both
    * sides explode to covered bins; the extra predicate `bin ==
    * floor(max(a.lo, b.lo) / width)` pins each overlapping pair to its
    * FIRST SHARED bin — the overlap region's start lies inside both
    * envelopes, so every qualifying pair matches exactly once with no
    * dedup pass. Same cost model as [[pointInInterval]], with both sides
    * fanning out by len/width. */
  def intervalOverlapJoin(left: DataFrame, lloCol: String, lhiCol: String,
      right: DataFrame, rloCol: String, rhiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, lo: String, hi: String, out: String) =
      df.withColumn(out, explode(sequence(
        floor(col(lo).cast("double") / binWidth).cast("long"),
        floor(col(hi).cast("double") / binWidth).cast("long"))))
    val l = binned(left, lloCol, lhiCol, "__lbin")
    val r = binned(right, rloCol, rhiCol, "__rbin")
    l.join(r,
        col("__lbin") === col("__rbin") &&
        col("__lbin") === floor(greatest(col(lloCol), col(rloCol))
          .cast("double") / binWidth).cast("long") &&
        col(lloCol) < col(rhiCol) && col(rloCol) < col(lhiCol))
      .drop("__lbin", "__rbin")
  }
}
