package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k without sorting the corpus. The window form
  * (`row_number().over(partitionBy(g).orderBy(...))`) shuffles EVERY row
  * to its group's partition and sorts it — at 100 TB that is a full-data
  * shuffle for an output of k rows per group. This operator keeps a
  * bounded heap per group inside each input partition (O(n log k) scan,
  * no shuffle, no sort), so at most k rows per (group × partition)
  * survive to the exact final window over the pruned remnant. The prune
  * is lossless: a row outside its partition's per-group top-k cannot be
  * in the global top-k.
  *
  * Shuffle volume drops from |rows| to ≤ k · |groups| · |partitions|.
  * Memory per task is k rows × groups-seen-in-partition — bounded by
  * k·|groups|; for very-high-cardinality groups (where that product
  * approaches partition size) the plain window form is the right tool,
  * as pruning would remove nothing.
  *
  * Determinism: callers should make `orderCols` a TOTAL order (add a
  * unique tiebreak column) — same requirement the window form has for
  * stable results.
  */
object TopK {

  /** Top `k` rows per `groupCols` group, best-first by `orderCols`
    * ((column, ascending) pairs, compared in order; nulls first when
    * ascending, last when descending — Spark's defaults). Output schema =
    * input schema + `rnk` (1-based within group). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(groupCols.nonEmpty && orderCols.nonEmpty)
    val schema = df.schema
    // fail fast on the driver: the heap prune compares EXTERNAL row values,
    // which are java.lang Comparables only for atomic non-binary types.
    // (The window form sorts binary/array/struct fine — use it for those.)
    orderCols.foreach { case (c, _) =>
      import org.apache.spark.sql.types._
      val dt = schema(c).dataType
      val comparable = dt match {
        case _: NumericType => true
        case StringType | BooleanType | DateType | TimestampType
            | TimestampNTZType => true
        // external type java.time.Duration is Comparable (YearMonthInterval's
        // java.time.Period is NOT — excluded)
        case _: DayTimeIntervalType => true
        case _ => false
      }
      require(comparable,
        s"topKPerGroup order column '$c' has type $dt, which the heap prune " +
          "cannot compare — use the plain window form for binary/complex keys")
    }
    val gIdx = groupCols.map(schema.fieldIndex).toArray
    val oIdx = orderCols.map { case (c, asc) => (schema.fieldIndex(c), asc) }
    // best-first lexicographic row ordering over the order columns;
    // java.lang types in external Rows are Comparable (Double.compareTo
    // places NaN greatest, matching Spark's sort semantics)
    val ord: Ordering[Row] = (x: Row, y: Row) => {
      var i = 0
      var r = 0
      while (r == 0 && i < oIdx.length) {
        val (idx, asc) = oIdx(i)
        val c = cmp(x.get(idx), y.get(idx))
        r = if (asc) c else -c
        i += 1
      }
      r
    }
    val pruned = df.mapPartitions { it =>
      // max-heap by ord dequeues the WORST retained row first, so insert
      // then evict keeps the k best
      val heaps = mutable.HashMap.empty[Seq[Any], mutable.PriorityQueue[Row]]
      it.foreach { r =>
        val key: Seq[Any] = gIdx.map(r.get).toSeq
        val h = heaps.getOrElseUpdate(key, mutable.PriorityQueue.empty(ord))
        if (h.size < k) h.enqueue(r)
        else if (ord.lt(r, h.head)) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(Encoders.row(schema))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(oIdx.map { case (i, asc) =>
        if (asc) col(schema(i).name).asc else col(schema(i).name).desc }: _*)
    pruned.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }

  /** Top `fraction` of rows per group (ceil(n·fraction), never below 1 row
    * per non-empty group), best-first by `orderCols` — the "keep the best
    * quarter of documents per source" curation shape. The group count and
    * the rank share ONE window partitioning, so the whole selection is a
    * single shuffle; no heap prune applies here because the cutoff depends
    * on the group's total count, unknown until the group is assembled.
    * Output schema = input schema + `rnk` (1-based within group). */
  def topFractionPerGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], fraction: Double): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0,1], got $fraction")
    require(groupCols.nonEmpty && orderCols.nonEmpty)
    val wOrd = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderCols.map { case (c, asc) =>
        if (asc) col(c).asc else col(c).desc }: _*)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("rnk", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .where(col("rnk") <= greatest(ceil(col("__n") * fraction), lit(1)))
      .drop("__n")
  }

  /** Null-safe comparable compare: nulls sort FIRST ascending (Spark's
    * default; the asc/desc flip in the caller makes them last when
    * descending). */
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    // Strings must compare in UTF-8 BINARY order (what Spark's sort and the
    // final window use), not java.lang.String's UTF-16 order — the two
    // disagree on supplementary-plane characters (a surrogate pair sorts
    // below U+E000 in UTF-16 but above it in UTF-8), which would make the
    // heap prune lossy for such rows
    case (x: String, y: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y))
    case (x: Comparable[Any] @unchecked, y) => x.compareTo(y)
    case (x, y) => throw new IllegalArgumentException(
      s"unorderable order-column values: $x (${x.getClass}) vs $y")
  }
}
