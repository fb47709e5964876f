package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** KMV (k-minimum-values) distinct-count sketch — DETERMINISTIC approximate
  * COUNT(DISTINCT) whose result is a pure function of the value set: the k
  * smallest distinct 52-bit `md5` hashes. Unlike HLL (whose estimate
  * depends on library internals), every engine that can compute `md5` can
  * reproduce this sketch bit-for-bit, so it oracle-verifies exactly AND
  * merges associatively (k-min of a union = k-min of the k-mins) — the
  * property that lets 1000 executors each keep an O(k) heap and ship k
  * rows to a union instead of shuffling every distinct value the way exact
  * COUNT(DISTINCT) must.
  *
  * Estimator: with `u_k` = the kth smallest hash normalized to (0,1],
  * `est = (k-1)/u_k` (Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations", SIGMOD'07); relative error
  * ≈ 1/√(k−2). Emitted as the INTEGER `(k-1)·2⁵² div h_k` so the gate
  * compares integers, never floats. Below k distinct values the sketch IS
  * the value set and the count is exact. */
object Kmv {

  /** 52-bit md5 hash (13 hex chars), the shared engine-portable uniform. */
  def hash52(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 13), 16, 10).cast("long")

  /** The k smallest distinct hashes of `valueCol` as a one-column frame
    * (`hv`). Each partition keeps a bounded O(k) tree (never more than k
    * live entries), so only `k · numPartitions` rows reach the final
    * merge — the sketch's whole point at scale. Null values are skipped
    * (they have no hash). */
  def kSmallestDistinctHashes(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val hashes = df.select(hash52(valueCol).as("hv"))
      .where(col("hv").isNotNull).as[Long]
    val local = hashes.mapPartitions { it =>
      val set = new java.util.TreeSet[java.lang.Long]()
      it.foreach { v =>
        if (set.size < k) set.add(v)
        else if (v < set.last) { if (set.add(v)) { set.pollLast(); () } }
      }
      set.iterator.asScala.map(_.longValue())
    }
    // <= k rows per partition survive; dedup across partitions then the
    // global k-min is a TakeOrdered heap, not a sort
    local.toDF("hv").distinct().orderBy("hv").limit(k)
  }

  /** One row: `n_kept` (sketch fill), `kth_hash` (largest kept hash),
    * `est` (integer distinct-count estimate; exact when n_kept < k). */
  def distinctEstimate(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    val twoPow52 = 4503599627370496L
    kSmallestDistinctHashes(df, valueCol, k)
      .agg(count(lit(1)).as("n_kept"), max(col("hv")).as("kth_hash"))
      .withColumn("est",
        when(col("n_kept") < k, col("n_kept")).otherwise(
          expr(s"CAST(${k - 1}L * ${twoPow52}L div kth_hash AS BIGINT)")))
  }

  /** Join-cardinality estimation from two sketches (Beyer et al. §5, the
    * multiset-operation payoff): how many DISTINCT keys two tables share,
    * estimated from 2·k hashes instead of a full distinct-join — the
    * planner input for "will this join explode / is the dim side really
    * small". `K(A∪B)` is the k-min of the two sketches' union, and the
    * fraction of it present in BOTH sketches estimates the Jaccard of the
    * key sets, so `inter_est = matches · union_est div n_kept` — integer
    * end-to-end, deterministic, engine-reproducible. Exact when both key
    * sets fit their sketches (n_kept < k). */
  def intersectionEstimate(dfA: DataFrame, colA: Column,
      dfB: DataFrame, colB: Column, k: Int): DataFrame = {
    val twoPow52 = 4503599627370496L
    val sa = kSmallestDistinctHashes(dfA, colA, k)
    val sb = kSmallestDistinctHashes(dfB, colB, k)
    val union = sa.union(sb).distinct().orderBy("hv").limit(k)
    union
      .join(sa.withColumn("__ina", lit(1)), Seq("hv"), "left")
      .join(sb.withColumn("__inb", lit(1)), Seq("hv"), "left")
      .agg(count(lit(1)).as("n_kept"), max(col("hv")).as("kth_hash"),
        sum(when(col("__ina").isNotNull && col("__inb").isNotNull, 1L)
          .otherwise(0L)).as("matches"))
      .withColumn("union_est",
        when(col("n_kept") < k, col("n_kept")).otherwise(
          expr(s"CAST(${k - 1}L * ${twoPow52}L div kth_hash AS BIGINT)")))
      .withColumn("inter_est",
        expr("CAST(matches * union_est div n_kept AS BIGINT)"))
  }

  /** The sketch as a typed [[Aggregator]] — the per-GROUP form: map-side
    * partial aggregation keeps one bounded sorted array per (partition,
    * group), merges are sorted-array unions trimmed to k, and only k
    * hashes per group ever shuffle. This is the shape that makes
    * "approx distinct users per segment" a one-shuffle bounded-memory
    * aggregation at 100 TB, where exact count-distinct shuffles every
    * distinct value per group. Input hashes come from [[hash52]]. */
  private class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(buf: Array[Long], v: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, v)
      if (pos >= 0) buf // already present
      else {
        val ins = -pos - 1
        if (buf.length >= k && ins >= k) buf // larger than the kth smallest
        else {
          val out = new Array[Long](math.min(buf.length + 1, k))
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = v
          System.arraycopy(buf, ins, out, ins + 1,
            math.min(buf.length, k - 1) - ins)
          out
        }
      }
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // sorted-array union, deduped, trimmed to k
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      var last = 0L; var first = true
      while (n < out.length && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
        val v = if (takeA) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (first || v != last) { out(n) = v; n += 1; last = v; first = false }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The bounded sketch as a reusable UDAF column function — also valid
    * as a STREAMING aggregate (its merge is associative and the buffer is
    * bounded, exactly what incremental state maintenance needs). */
  def sketchUdaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(k >= 2, s"k must be >= 2, got $k")
    udaf(new KmvAgg(k))
  }

  /** Expands a sketch array column into (n_kept, kth_hash, est). */
  def estimateFromSketch(df: DataFrame, sketchCol: String, k: Int): DataFrame = {
    val twoPow52 = 4503599627370496L
    df.withColumn("n_kept", size(col(sketchCol)).cast("long"))
      .withColumn("kth_hash", element_at(col(sketchCol), -1))
      .withColumn("est",
        when(col("n_kept") < k, col("n_kept")).otherwise(
          expr(s"CAST(${k - 1}L * ${twoPow52}L div kth_hash AS BIGINT)")))
      .drop(sketchCol)
  }

  /** Per-group distinct estimate via the bounded [[KmvAgg]] aggregator:
    * (groupCols..., n_kept, kth_hash, est) with the same integer
    * estimator as [[distinctEstimate]]. */
  def groupDistinctEstimate(df: DataFrame, groupCols: Seq[String],
      valueCol: Column, k: Int): DataFrame = {
    val agg = sketchUdaf(k)
    estimateFromSketch(
      df.select(groupCols.map(col) :+ hash52(valueCol).as("__hv"): _*)
        .where(col("__hv").isNotNull)
        .groupBy(groupCols.map(col): _*)
        .agg(agg(col("__hv")).as("__sk")),
      "__sk", k)
  }
}
