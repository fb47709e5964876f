package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project}

/** Scale-adaptive parallelism floors for CPU-bound stages (optimization
  * guide §2.5 "input skew … repartition immediately after the read",
  * §2.2/§2.4 scale-adaptive partitioning and exchange sharing).
  *
  * Two pathologies motivate this, both measured at bench scale
  * (tools/QueryProf, tools/SpreadProf — OPTIMIZATION_r21.md):
  *
  *  - every base table here is ONE parquet row group, which is
  *    unsplittable, so the scan — and everything Catalyst fuses into it
  *    (shingling, signature hashing, quality scoring) — runs as ONE task
  *    regardless of core count;
  *  - AQE's partition coalescing sizes post-shuffle partitions by BYTES,
  *    which serializes downstream stages whose cost is CPU per row/pair,
  *    not bytes (a 0.4 MB shuffle feeding a quadratic edit-distance
  *    verify coalesces to one task: q112 measured 3.5 s single-task vs
  *    0.9 s spread).
  *
  * [[byKey]] pins the SAME exchange the downstream join/window inserts
  * anyway (same key), so no new shuffle exists at any scale; the explicit
  * partition count only stops AQE's byte-based coalescing from collapsing
  * a CPU-bound stage. [[wideScan]] is the guide's input-skew fix and is a
  * conditional no-op: it only fires when the scan really is narrower than
  * the session's parallelism target, so at production scale (many splits)
  * it adds nothing. Both counts derive from the session
  * (defaultParallelism / shuffle.partitions), never a constant, so the
  * same code scales with the cluster and with the bench driver's
  * lower-core runs.
  */
object Spread {

  /** Session-derived parallelism floor: the larger of the scheduler's
    * core-derived default parallelism and the configured shuffle
    * partition count. */
  def target(df: DataFrame): Int = {
    val sc = df.sparkSession.sparkContext
    math.max(sc.defaultParallelism,
      df.sparkSession.sessionState.conf.numShufflePartitions)
  }

  /** Hash-partition `df` by `keys` into the floor count. Use immediately
    * before an equi-join / window clustered on exactly `keys`: the
    * downstream operator's required distribution is satisfied by this
    * exchange, so it REPLACES the one Catalyst would insert — with the
    * count pinned against byte-based coalescing. */
  def byKey(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(target(df), keys: _*)

  /** Round-robin spread of an unsplittable/narrow scan so per-row CPU
    * work (shingling, hashing, scoring) fused above it parallelizes.
    * Fires only when (a) the frame is a narrow chain over leaf scans —
    * project/filter over files or an in-memory/checkpointed RDD — so
    * computing its partition count is free (no exchange below means no
    * AQE stage materialization), and (b) that count is below the session
    * target. Anything wider is returned unchanged: a frame with a join or
    * shuffle upstream already had its parallelism decided at that
    * exchange, and probing it could trigger eager execution under AQE. */
  def wideScan(df: DataFrame): DataFrame = {
    def narrow(p: LogicalPlan): Boolean = p match {
      case _: LeafNode => true
      case pr: Project => narrow(pr.child)
      case f: Filter => narrow(f.child)
      case _ => false
    }
    // a streaming frame cannot be probed via .rdd (and its parallelism is
    // the source's concern) — pass it through untouched
    if (df.isStreaming) df
    else if (!narrow(df.queryExecution.analyzed)) df
    else {
      val n = target(df)
      if (df.rdd.getNumPartitions >= n) df else df.repartition(n)
    }
  }
}
