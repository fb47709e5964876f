package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan, "An Improved Data Stream
  * Summary: The Count-Min Sketch and its Applications", J. Algorithms
  * 2005) — fixed-size frequency summaries for point lookups and heavy-
  * hitter screens over streams too large to count exactly.
  *
  * The sketch is a depth×width counter grid; row j buckets a key by an
  * independent hash, a point estimate is the MIN of the key's depth
  * counters, and the guarantee is one-sided: est ≥ true count always,
  * est ≤ true + ε·N with probability 1−δ for width = ⌈e/ε⌉, depth =
  * ⌈ln 1/δ⌉. Unlike a hashmap the state NEVER grows with cardinality —
  * the property that lets 1000 executors each hold the full grid.
  *
  * Determinism (the [[Kmv]] discipline): row hashes are md5-derived
  * (`md5("j:" ++ value)` → first 13 hex digits → mod width), so the
  * whole sketch is a pure function of the multiset and any engine
  * reproduces it bit-for-bit — the DuckDB oracle verifies construction
  * AND estimation exactly (gate q143), which no library HLL/CMS with
  * private seeds can offer.
  *
  * Scale posture: construction is ONE scan (posexplode of the depth
  * bucket ids per row — no self-union re-scan) and one groupBy whose
  * key space is bounded by depth×width, so partial aggregation
  * collapses every partition to ≤ depth×width rows before the shuffle;
  * the materialized sketch is ≤ depth×width rows regardless of input
  * size. Merging sketches of two corpora is counter addition (the grid
  * is linear in the multiset), proven in CmsSpec. Estimation broadcasts
  * the grid — never a corpus-sized side.
  */
object Cms {

  /** Row-j bucket of `value` in [0, width): 52-bit prefix of
    * md5("j:" ++ value), mod width. Seeding by the row index makes the
    * depth hashes pairwise-independent in the only sense the CMS proof
    * needs (distinct md5 inputs). */
  def bucket(value: Column, j: Int, width: Int): Column =
    pmod(conv(substring(md5(concat_ws(":", lit(j), value.cast("string"))),
      1, 13), 16, 10).cast("long"), lit(width.toLong))

  /** Build the sketch of `valueCol`'s multiset: one row per non-empty
    * grid cell, (j, bucket, cnt). Null values carry no hash and are
    * skipped (as in exact COUNT of a column). */
  def sketch(df: DataFrame, valueCol: Column, depth: Int = 4,
      width: Int = 512): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 2 && width <= (1 << 20), s"width out of range: $width")
    df.where(valueCol.isNotNull)
      .select(posexplode(array((0 until depth).map(j =>
        bucket(valueCol, j, width)): _*)).as(Seq("j", "bucket")))
      .groupBy("j", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes`' keys against a materialized sketch:
    * (key, est) with est = min over rows of the key's counter (0 when a
    * cell is empty — only possible if the key never occurred). The
    * sketch side is ≤ depth×width rows and rides a broadcast; the probe
    * side streams. Estimates are exact for keys whose every cell is
    * collision-free and overestimates otherwise — never under. */
  def estimates(sketchDf: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 512): DataFrame =
    probes.select(col(keyCol).as("key"))
      // null probes carry no hash (concat_ws would silently drop the null
      // and hash the bare row index) — skipped, like null values in sketch
      .where(col("key").isNotNull)
      .select(col("key"), posexplode(array((0 until depth).map(j =>
        bucket(col("key"), j, width)): _*)).as(Seq("j", "bucket")))
      .join(broadcast(sketchDf), Seq("j", "bucket"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Heavy-hitter screen over a WINDOWED sketch — `sketchDf` shaped
    * (window, j, bucket, cnt) as produced by
    * [[graft.streaming.Streaming.windowedCmsStream]]: estimate every
    * candidate key against every window's grid and keep (window, key)
    * pairs with est >= ceil(n/denom), where n is the window's exact event
    * count RECOVERED FROM THE SKETCH itself (every event increments
    * exactly one row-0 cell, so n = Σ cnt over j = 0 — no second
    * aggregation pass). The threshold is pure integer arithmetic
    * ((n + denom−1) div denom), so any engine reproduces the screen
    * bit-for-bit. One-sided CMS error means the result is a GUARANTEED
    * SUPERSET of the true ≥1/denom-share keys per window; exact-verify
    * the survivors (they are few) when false positives matter —
    * [[graft.operators.HeavyHitters.frequentItems]] is the batch
    * equivalent of screen+verify in one call.
    *
    * Scale posture: the sketch is ≤ windows×depth×width rows and rides a
    * broadcast; the candidate side streams — candidates × windows × depth
    * rows shuffle at most, never the event stream itself. */
  def windowedHeavyHitters(sketchDf: DataFrame, probes: DataFrame,
      keyCol: String, denom: Int, depth: Int = 4,
      width: Int = 512): DataFrame = {
    require(denom >= 2, s"denom must be >= 2: $denom")
    // attribute-fresh copy: the n-per-window frame and the probe join both
    // descend from sketchDf (a self-join); streaming memory-sink views
    // break Catalyst's automatic reference dedup, so give the tiny n side
    // (≤ #windows rows) its own expression ids via an RDD round-trip
    val n = {
      val n0 = sketchDf.where(col("j") === 0)
        .groupBy("window").agg(sum("cnt").as("n"))
      n0.sparkSession.createDataFrame(n0.toJavaRDD, n0.schema)
    }
    // Join the candidates' cells against the HOT sketch cells only: a key
    // passes the screen iff est = min over its `depth` cells >= the
    // per-window ceil threshold, which requires EVERY cell to be at or
    // above it — so cells below threshold can be dropped from the join's
    // build side entirely (a key hashing into one is dead either way, and
    // it then surfaces as a (window, key) group with fewer than `depth`
    // joined cells). The joined row count scales with candidates ×
    // HEAVY cells — not candidates × windows, and not even candidates ×
    // occupied cells: for a skewed stream almost every cell is below
    // threshold, so the group-by input collapses to the few true-heavy
    // cells. `div` is integer division on longs — the ceil threshold
    // never routes through a double.
    val hot = sketchDf.join(broadcast(n), "window")
      .where(col("cnt") >= expr(s"(n + ${denom - 1}) div $denom"))
    val pe = probes.select(col(keyCol).as("key")).where(col("key").isNotNull)
      .distinct()
      .select(col("key"), posexplode(array((0 until depth).map(j =>
        bucket(col("key"), j, width)): _*)).as(Seq("j", "bucket")))
      .join(broadcast(hot), Seq("j", "bucket"))
      .groupBy("window", "key")
      .agg(count(lit(1)).as("__cells"), min(col("cnt")).as("est"),
        max(col("n")).as("n"))
      .where(col("__cells") === depth)
    // est = min over cells all >= threshold, so the screen is implied —
    // kept explicit so the contract never silently relaxes
    pe.where(expr(s"est >= (n + ${denom - 1}) div $denom"))
      .select(col("window"), col("key"), col("n"), col("est"))
  }
}
