package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order primitives: global 1-based rank and inclusive
  * prefix sum in a given sort order, WITHOUT the single-task global window
  * (`Window.orderBy(...)` with no partition keys sorts the entire input on
  * ONE task — the canonical 100 TB killer).
  *
  * Shape: range-repartition by the sort key (Spark's range partitioner
  * guarantees partition i's keys all precede partition i+1's), sort within
  * partitions, then assemble global positions zipWithIndex-style: per-
  * partition counts/sums (one row per partition) become cumulative offsets
  * on the driver — the same bounded driver step `RDD.zipWithIndex`
  * performs — and a partition-local window adds the within-partition
  * running index/sum. Two distributed shuffles total (range + the window's
  * hash-by-partition-id), each over the data once; driver state is bounded
  * by the partition count, never the row count.
  */
object GlobalOrder {

  /** Adds `rankCol` = global 1-based rank in `sortCols` order and, when
    * `sumOf = Some((value, name))`, a `name` column holding the inclusive
    * running sum of `value` in that order. Ties in `sortCols` get an
    * arbitrary-but-deterministic order only if the caller includes a
    * tie-break column — pass one (e.g. the row id) for reproducibility. */
  /** As [[rankWithPrefixSum]], plus `totalCol` = the grand total as a
    * literal column: the row count when no `sumOf` is given, the summed
    * value's corpus total otherwise — free either way, because the
    * per-partition totals the offset step already collects sum to it;
    * callers needing `rank` and `n` together (equal-frequency binning,
    * vocabulary coverage, percentile normalization) save a full extra
    * scan over the input. */
  def rankWithTotal(df: DataFrame, sortCols: Seq[Column], rankCol: String,
      totalCol: String, numPartitions: Int = 0): DataFrame =
    rankWithPrefixSum(df, sortCols, rankCol, None, numPartitions,
      totalCol = totalCol)

  def rankWithPrefixSum(df: DataFrame, sortCols: Seq[Column],
      rankCol: String = "rank", sumOf: Option[(Column, String)] = None,
      numPartitions: Int = 0, totalCol: String = null): DataFrame = {
    require(sortCols.nonEmpty, "need at least one sort column")
    // the helper columns below are added with withColumn, which REPLACES
    // same-named input columns and would silently destroy user data —
    // refuse the collision loudly (case-insensitive, matching analysis)
    Seq("__val", "__pid", "__coff", "__soff").foreach { r =>
      require(!df.columns.exists(_.equalsIgnoreCase(r)),
        s"input already has a '$r' column (reserved by rankWithPrefixSum)")
    }
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val valued = sumOf match {
      case Some((v, _)) => df.withColumn("__val", v.cast("long"))
      case None => df.withColumn("__val", lit(1L))
    }
    // range partition: partition ids are ordered by the sort key ranges
    val sorted = valued
      .repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      // pinned layout: the per-partition totals job and the final job must
      // see the SAME row placement (see Sampling.systematicSample)
      .localCheckpoint(eager = false)
    val totals = sorted.groupBy("__pid")
      .agg(count(lit(1)).as("__c"), sum(col("__val")).as("__s"))
      .orderBy("__pid").collect()
    // cumulative EXCLUSIVE offsets per partition (driver rows = partitions)
    val offsets = totals.scanLeft((0, 0L, 0L)) { case ((_, cAcc, sAcc), r) =>
      (r.getInt(0), cAcc + r.getLong(1), sAcc + (if (r.isNullAt(2)) 0L else r.getLong(2)))
    }
    val prior = totals.map(_.getInt(0)).zip(offsets.dropRight(1).map(t => (t._2, t._3)))
      .map { case (pid, (c, s)) => (pid, c, s) }
    import df.sparkSession.implicits._
    val offDf = prior.toSeq.toDF("__pid", "__coff", "__soff")
    // partition-LOCAL window: partitioned by __pid, so no single reducer
    // ever sees more than one partition's rows
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    val withPos = sorted
      .join(broadcast(offDf), "__pid")
      .withColumn(rankCol, col("__coff") + row_number().over(w))
    val withSum = sumOf match {
      case Some((_, name)) => withPos.withColumn(name,
        col("__soff") + sum(col("__val")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      case None => withPos
    }
    // grand total of __val: row count when sumOf is None (__val = 1),
    // the summed value's corpus total otherwise — the per-partition
    // totals are already on the driver, so either is free
    val withTotal = if (totalCol == null) withSum
      else withSum.withColumn(totalCol,
        lit(totals.map(r => if (r.isNullAt(2)) 0L else r.getLong(2)).sum))
    withTotal.drop("__pid", "__coff", "__soff", "__val")
  }
}
