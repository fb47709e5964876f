package graft.analytics

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Lakehouse
import graft.core.Jsons

case class ColumnProfile(
    name: String,
    dataType: String,
    nullCount: Long,
    distinctCount: Long,
    min: Option[String] = None,
    max: Option[String] = None,
    mean: Option[Double] = None,
    stddev: Option[Double] = None,
    p25: Option[Double] = None,
    p50: Option[Double] = None,
    p75: Option[Double] = None,
    topValues: List[(String, Long)] = Nil)

case class TableProfile(table: String, rowCount: Long, columns: List[ColumnProfile])

case class TableStats(
    table: String,
    rowCount: Long,
    fileCount: Long,
    totalBytes: Long,
    snapshotCount: Int,
    snapshotIdAtCache: Long,
    lastModifiedMs: Long,
    columnNullCounts: Map[String, Long])

/** Column profiling + cached table stats (reference catalog.py:1820-1953,
  * stats.py:29-150).
  *
  * All numeric/null/distinct/percentile aggregates for every column run in a
  * SINGLE `select(aggExprs)` pass over the table (one scan); only string
  * top-10 needs one groupBy per string column. The reference instead
  * materializes the table and issues per-column SQL — one scan per column.
  */
class Profile(lh: Lakehouse) {

  def profileDf(df: DataFrame, table: String = ""): TableProfile = {
    val fields = df.schema.fields.toSeq
    def isNum(t: DataType) = t.isInstanceOf[NumericType]
    def isTemporal(t: DataType) = t == DateType || t == TimestampType

    val aggs: Seq[Column] = Seq(count(lit(1)).as("_rows")) ++ fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        sum(c.isNull.cast("long")).as(s"${f.name}__nulls"),
        countDistinct(c).as(s"${f.name}__distinct"))
      val typed =
        if (isNum(f.dataType)) Seq(
          min(c).cast("double").as(s"${f.name}__min"),
          max(c).cast("double").as(s"${f.name}__max"),
          avg(c).as(s"${f.name}__mean"),
          stddev(c).as(s"${f.name}__std"),
          // backticks: column names may be reserved words or contain
          // non-identifier characters
          expr(s"percentile(`${f.name}`, 0.25)").as(s"${f.name}__p25"),
          expr(s"percentile(`${f.name}`, 0.5)").as(s"${f.name}__p50"),
          expr(s"percentile(`${f.name}`, 0.75)").as(s"${f.name}__p75"))
        else if (isTemporal(f.dataType)) Seq(
          min(c).cast("string").as(s"${f.name}__min"),
          max(c).cast("string").as(s"${f.name}__max"))
        else Nil
      base ++ typed
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def opt[T](n: String): Option[T] =
      if (row.schema.fieldNames.contains(n) && !row.isNullAt(row.fieldIndex(n)))
        Some(row.getAs[T](n))
      else None

    val topValues: Map[String, List[(String, Long)]] = fields
      .filter(_.dataType == StringType).map { f =>
        f.name -> df.groupBy(col(f.name)).agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), col(f.name))
          .limit(10).collect()
          .map(r => (Option(r.get(0)).map(_.toString).orNull, r.getLong(1))).toList
      }.toMap

    val cols = fields.map { f =>
      ColumnProfile(
        name = f.name,
        dataType = f.dataType.typeName,
        nullCount = row.getAs[Long](s"${f.name}__nulls"),
        distinctCount = row.getAs[Long](s"${f.name}__distinct"),
        min = opt[Any](s"${f.name}__min").map(_.toString),
        max = opt[Any](s"${f.name}__max").map(_.toString),
        mean = opt[Double](s"${f.name}__mean"),
        stddev = opt[Double](s"${f.name}__std"),
        p25 = opt[Double](s"${f.name}__p25"),
        p50 = opt[Double](s"${f.name}__p50"),
        p75 = opt[Double](s"${f.name}__p75"),
        topValues = topValues.getOrElse(f.name, Nil))
    }
    TableProfile(table, row.getAs[Long]("_rows"), cols.toList)
  }

  def profileTable(table: String): TableProfile =
    profileDf(lh.catalog.loadTable(table).read(), table)

  // ---- cached stats (stats.py) -------------------------------------------

  private def statsPath = lh.metaDir.resolve("stats_cache.json")

  private def loadCache(): Map[String, TableStats] =
    if (Files.exists(statsPath)) Jsons.readFile[Map[String, TableStats]](statsPath)
    else Map.empty

  def computeStats(table: String): TableStats = {
    val stats = statsNoCache(table)
    synchronized { Jsons.writeFile(statsPath, loadCache() + (table -> stats)) }
    stats
  }

  /** Compute without touching the cache — used by anomaly detection, which
    * must not overwrite the baseline it is comparing against. */
  def statsNoCache(table: String): TableStats = {
    val tbl = lh.catalog.loadTable(table)
    val df = tbl.read()
    val fields = df.schema.fieldNames.toSeq
    val aggs = count(lit(1)).as("_rows") +:
      fields.map(f => sum(col(f).isNull.cast("long")).as(s"n_$f"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val snap = tbl.currentSnapshot
    TableStats(
      table = table,
      rowCount = row.getAs[Long]("_rows"),
      fileCount = snap.map(_.files.size.toLong).getOrElse(0L),
      totalBytes = snap.map(_.totalBytes).getOrElse(0L),
      snapshotCount = tbl.snapshots.size,
      snapshotIdAtCache = snap.map(_.id).getOrElse(0L),
      lastModifiedMs = snap.map(_.timestampMs).getOrElse(0L),
      columnNullCounts = fields.map(f => f -> row.getAs[Long](s"n_$f")).toMap)
  }

  def cachedStats(table: String): Option[TableStats] = loadCache().get(table)

  /** All cached stats (reference stats.py get_all_cached_stats). */
  def allCachedStats(): Map[String, TableStats] = loadCache()

  /** Stale iff cached snapshot-id ≠ current (stats.py:211-237). */
  def isStatsStale(table: String): Boolean = {
    val current = lh.catalog.loadTable(table).currentSnapshot.map(_.id).getOrElse(0L)
    cachedStats(table).forall(_.snapshotIdAtCache != current)
  }
}

object Profile {

  /** Per-column completeness/uniqueness report as a DataFrame:
    * (column_name, n_rows, n_nulls, n_distinct, completeness). The
    * completeness and uniqueness inputs of [[Quality.computeScore]]
    * (quality.py:28-159), exposed table-free so it runs on any frame.
    *
    * One scan: every column's null and distinct aggregates evaluate in a
    * single `agg` pass (countDistinct expands the aggregate buffers, not
    * the scan count), then the one-row result is unpivoted driver-free via
    * a struct-array explode. Ratios are one long/long division — exact and
    * engine-independent. */
  def columnCompleteness(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = count(lit(1)).as("_rows") +: cols.flatMap { c => Seq(
      // coalesce: sum over ZERO rows is null, not 0
      coalesce(sum(col(c).isNull.cast("long")), lit(0L)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct"))
    }
    val entries = cols.map { c =>
      struct(lit(c).as("column_name"), col("_rows").as("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        // empty table = vacuously complete (Quality.computeScore convention)
        when(col("_rows") === 0, lit(1.0))
          .otherwise((col("_rows") - col(s"${c}__nulls")).cast("double") /
            col("_rows"))
          .as("completeness"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(entries: _*)).as("e"))
      .select(col("e.column_name"), col("e.n_rows"), col("e.n_nulls"),
        col("e.n_distinct"), col("e.completeness"))
  }

  /** Approximate quantiles via Spark's Greenwald-Khanna sketch — the
    * 100 TB percentile path. The exact form (gate q9's `percentile`)
    * buffers every value per group; this streams one mergeable sketch of
    * O(1/relativeError) size through the scan, at the cost of rank error
    * ≤ relativeError·n (AnalyticsSpec bounds it against the exact answer).
    * Use exact for gated correctness, this for production profiling. */
  def approxQuantiles(df: DataFrame, valueCol: String, probs: Seq[Double],
      relativeError: Double = 0.01): Seq[Double] =
    df.stat.approxQuantile(valueCol, probs.toArray, relativeError).toSeq

  /** Approximate distinct counts per column via HyperLogLog++ — the scale
    * twin of the exact `countDistinct` in [[columnCompleteness]]: exact
    * distinct shuffles every distinct value; the HLL sketch is fixed-size
    * mergeable state per column with relative error ~rsd. One pass, all
    * columns at once. */
  def approxDistinct(df: DataFrame, rsd: Double = 0.05): DataFrame = {
    // MapType is unhashable — one map column would fail the WHOLE
    // aggregate at analysis time. Profile the hashable columns and skip
    // the rest (mirroring what columnCompleteness supports).
    def hashable(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType)).map(_.name).toSeq
    require(cols.nonEmpty, "no hashable columns to profile")
    val aggs = cols.map(c => approx_count_distinct(col(c), rsd).as(c))
    val entries = cols.map(c =>
      struct(lit(c).as("column_name"), col(c).as("approx_distinct")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(entries: _*)).as("e"))
      .select(col("e.column_name"), col("e.approx_distinct"))
  }

  /** Fixed-width histogram of a numeric column: bin i covers
    * [origin + i·width, origin + (i+1)·width). The bin is derived per-row
    * with floor arithmetic — no global min/max pre-pass, so the histogram
    * is one single-pass groupBy (map-side combined) and works unchanged on
    * a stream. Empty bins are simply absent (sparse output). */
  def histogram(df: DataFrame, valueCol: String, binWidth: Double,
      origin: Double = 0.0): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    df.where(col(valueCol).isNotNull)
      .groupBy(floor((col(valueCol) - origin) / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .cast("double").as("sum_value"))
      .withColumn("bin_lo", col("bin") * binWidth + origin)
  }
}
