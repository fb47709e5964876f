package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact frequent-item mining WITHOUT a full-cardinality groupBy — the
  * scale path for "which tokens/domains/urls exceed x% of a 100 TB
  * corpus" when the distinct-item space (trillions of tokens, billions of
  * URLs) is far too large to shuffle whole.
  *
  * Two passes:
  *
  *   1. Candidates: per-partition Misra-Gries summaries (bounded
  *      `capacity` counters each) merged associatively into one summary.
  *      The merged summary's undercount is < N/capacity, so with
  *      capacity >= 2/minShare every item of global share >= minShare is
  *      GUARANTEED present — the candidate set is a provable superset.
  *      Driver state: one map of <= capacity entries, never the item
  *      cardinality.
  *   2. Verify: exact counts of candidate items only (broadcast semi
  *      filter — only candidate rows shuffle), filtered to
  *      count >= ceil(minShare * N).
  *
  * The output is therefore EXACT — identical to
  * `GROUP BY item HAVING count(*) >= ceil(minShare * N)` — and
  * deterministic regardless of partitioning (Misra-Gries summaries vary
  * with layout, but any valid superset yields the same verified result).
  * Prefer `minShare` an exact binary fraction (e.g. 1/512) so the
  * threshold arithmetic is bit-identical across engines.
  *
  * vs `df.stat.freqItems`: same sketch family, but freqItems returns the
  * UNVERIFIED candidate set (false positives included, no counts); this
  * returns exact counts with no false positives.
  */
object HeavyHitters {

  /** Misra-Gries ingest: at most `cap` counters. */
  private[operators] def mgIngest(items: Iterator[String],
      cap: Int): Map[String, Long] = {
    val m = scala.collection.mutable.Map.empty[String, Long]
    items.foreach { x =>
      if (m.contains(x)) m(x) += 1L
      else if (m.size < cap) m(x) = 1L
      else {
        // decrement-all step, dropping zeros; amortized O(1) per item
        val dead = m.iterator.collect { case (k, 1L) => k }.toList
        m.mapValuesInPlace((_, v) => v - 1L)
        dead.foreach(m.remove)
      }
    }
    m.toMap
  }

  /** Associative, commutative merge of two Misra-Gries summaries back to
    * <= cap counters: sum shared keys, then subtract the (cap+1)-th
    * largest count from everything (the standard mergeable-summaries
    * construction; error stays < N/cap). */
  private[operators] def mgMerge(a: Map[String, Long], b: Map[String, Long],
      cap: Int): Map[String, Long] = {
    val sum = scala.collection.mutable.Map.empty[String, Long] ++= a
    b.foreach { case (k, v) => sum(k) = sum.getOrElse(k, 0L) + v }
    if (sum.size <= cap) sum.toMap
    else {
      val d = sum.values.toArray.sorted(Ordering[Long].reverse).apply(cap)
      sum.iterator.map { case (k, v) => (k, v - d) }
        .filter(_._2 > 0L).toMap
    }
  }

  /** Items (cast to string, nulls dropped) whose exact count is
    * >= ceil(minShare * N). Output: (itemCol, cnt) with exact long
    * counts — equal to the full GROUP BY HAVING, shuffling only candidate
    * rows. */
  def frequentItems(df: DataFrame, itemCol: String,
      minShare: Double): DataFrame = {
    require(minShare > 0 && minShare < 1, s"minShare in (0,1): $minShare")
    val spark = df.sparkSession
    val items = df.select(col(itemCol).cast("string").as(itemCol)).na.drop()
    val cap = math.max(2, math.ceil(2.0 / minShare).toInt)
    // pass 1: bounded-memory candidate sketch + exact N in the same scan
    // (imperative per-partition logic — one of the few places an RDD is
    // the right tool)
    val (candMap, total) = items.rdd.map(_.getString(0))
      .mapPartitions { it =>
        var n = 0L
        val counted = it.map { x => n += 1L; x }
        val m = mgIngest(counted, cap) // consumes the iterator fully
        Iterator.single((m, n))
      }
      .treeReduce { case ((m1, n1), (m2, n2)) =>
        (mgMerge(m1, m2, cap), n1 + n2)
      }
    val cands = candMap.keys.toSeq
    val threshold = math.ceil(minShare * total).toLong
    import spark.implicits._
    val candDf = broadcast(cands.toDF(itemCol))
    // pass 2: exact verify over candidate rows only
    items.join(candDf, Seq(itemCol))
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= threshold)
  }
}
