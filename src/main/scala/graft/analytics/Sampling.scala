package graft.analytics

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Lakehouse

/** Sampling operators (reference sampling.py).
  *
  * Seeded and deterministic per (seed, data): `rand(seed)` is a fixed
  * per-partition stream, so the same data + seed + partitioning reproduces
  * the same sample — the Spark analogue of the reference's `setseed`.
  */
class Sampling(lh: Lakehouse) {

  /** Bernoulli row sample (sampling.py:12-60) — exact match to
    * `USING SAMPLE p PERCENT (bernoulli)` semantics. */
  def randomSample(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Per-stratum sample of ceil(count×fraction), ≥1 row per stratum
    * (sampling.py:63-131) — preserves the reference's ≥1-row guarantee
    * that `sampleBy` (approximate) would not.
    *
    * SKEW-SAFE by construction: the obvious
    * `row_number().over(Window.partitionBy(stratum).orderBy(rand))`
    * funnels a hot stratum's entire group through ONE window task (90%
    * of a 100 TB table through one executor). Instead, a global
    * row_number over the COMPOSITE (stratum, uniform key) order rides
    * the range-partitioned [[graft.operators.GlobalOrder]] primitive —
    * the range partitioner splits a hot stratum across MANY partitions
    * on the key — and each row's per-stratum position is its global
    * rank minus the stratum's first rank (one per-stratum aggregate +
    * a null-safe join). No stratum-keyed window anywhere; the only
    * window is GlobalOrder's partition-local one. */
  def stratifiedSample(df: DataFrame, stratCol: String, fraction: Double,
      seed: Long = 42L): DataFrame = {
    Seq("__sk", "__grank", "__strat", "__n", "__start").foreach { r =>
      require(!df.columns.exists(_.equalsIgnoreCase(r)),
        s"input already has a '$r' column (reserved by stratifiedSample)")
    }
    val keyed = df.withColumn("__sk", rand(seed))
    val ranked = graft.operators.GlobalOrder.rankWithPrefixSum(keyed,
      Seq(col(stratCol), col("__sk")), "__grank")
    // a null stratum is still a stratum — <=> keeps it; min(__grank) is
    // the stratum's first global rank, so rank − start is the 0-based
    // per-stratum position in rand order
    val counts = ranked.groupBy(col(stratCol).as("__strat"))
      .agg(count(lit(1)).as("__n"), min(col("__grank")).as("__start"))
    ranked.join(counts, col(stratCol) <=> col("__strat"))
      .where(col("__grank") - col("__start") <
        greatest(ceil(col("__n") * fraction), lit(1)))
      .drop("__sk", "__grank", "__strat", "__n", "__start")
  }

  /** Every Nth row by ROW_NUMBER (sampling.py:134-178). Order follows the
    * scan order, as in the reference (no ORDER BY).
    *
    * Scale shape: a global `Window.orderBy` would sort the whole input on
    * one task. Instead the global row number is assembled zipWithIndex-
    * style: `monotonically_increasing_id()` is (partitionId << 33) +
    * within-partition index, so ordering by it equals ordering by
    * (partition, index). Per-partition counts (one row per partition —
    * bounded by the partition count, the same driver-side step
    * RDD.zipWithIndex performs) become cumulative offsets, broadcast-
    * joined back; every stage over the data itself is narrow. */
  def systematicSample(df: DataFrame, everyN: Int): DataFrame = {
    require(everyN >= 1)
    val spark = df.sparkSession
    // localCheckpoint: the id column is evaluated by TWO jobs (the counts
    // collect and the final join). If df's lineage holds a shuffle or other
    // nondeterministic stage, re-evaluation could lay rows out differently
    // and misalign the cumulative offsets — checkpointing pins one layout.
    val withId = df
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftrightunsigned(col("__mid"), 33))
      .withColumn("__idx", col("__mid").bitwiseAND(lit((1L << 33) - 1)))
      .localCheckpoint(eager = false)
    val counts = withId.groupBy("__pid").agg(count(lit(1)).as("__c"))
      .orderBy("__pid").collect()
    val offsets = counts.scanLeft((-1L, 0L)) { case ((_, acc), r) =>
      (r.getLong(0), acc + r.getLong(1))
    }.tail.map { case (pid, cum) => (pid, cum) }
    val prior = offsets.zip(0L +: offsets.map(_._2).dropRight(1))
      .map { case ((pid, _), before) => (pid, before) }
    import spark.implicits._
    val offDf = prior.toSeq.toDF("__pid", "__off")
    withId
      .join(broadcast(offDf), "__pid")
      .where(((col("__off") + col("__idx")) % everyN) === 0)
      .drop("__mid", "__pid", "__idx", "__off")
  }

  /** Materialize a sample into a table (sampling.py:181-220). */
  def sampleToTable(sourceTable: String, targetTable: String, fraction: Double,
      seed: Long = 42L): Long = {
    val src = lh.catalog.loadTable(sourceTable)
    val sample = randomSample(src.read(), fraction, seed)
    if (!lh.catalog.tableExists(targetTable))
      lh.catalog.createTable(targetTable, src.schema, Nil, Map.empty)
    val snap = lh.catalog.loadTable(targetTable).overwrite(sample)
    lh.audit.log(targetTable, "sample_to_table",
      Map("source" -> sourceTable, "fraction" -> fraction.toString))
    snap.totalRows
  }

  /** Compare mean/std/min/max of numeric columns, full vs sample
    * (sampling.py:223-308). Returns (column, metric) → (full, sample). */
  def sampleStats(full: DataFrame, sample: DataFrame)
      : Map[(String, String), (Double, Double)] = {
    val numCols = full.schema.fields
      .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      .map(_.name).toSeq
    def statsOf(df: DataFrame): Map[(String, String), Double] = {
      if (numCols.isEmpty) return Map.empty
      val aggs = numCols.flatMap { c => Seq(
        avg(col(c)).as(s"${c}__mean"), stddev(col(c)).as(s"${c}__std"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      numCols.flatMap { c =>
        Seq("mean", "std", "min", "max").flatMap { m =>
          val idx = row.fieldIndex(s"${c}__$m")
          if (row.isNullAt(idx)) None
          else Some((c, m) -> row.getDouble(idx))
        }
      }.toMap
    }
    val f = statsOf(full)
    val s = statsOf(sample)
    f.keySet.intersect(s.keySet).map(k => k -> ((f(k), s(k)))).toMap
  }
}

/** Table-level dedup API (reference dedup.py:12-253), complementing the
  * content-hash dedup in [[graft.text.NearDup]]. */
class Dedup(lh: Lakehouse) {

  /** Duplicate key groups ordered by count (dedup.py:41-48). */
  def findDuplicates(df: DataFrame, keys: Seq[String], limit: Int = 100): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("dup_count"))
      .where(col("dup_count") > 1)
      .orderBy(desc("dup_count"), col(keys.head))
      .limit(limit)

  /** total rows, unique key rows, duplicate excess (dedup.py:84-117). */
  def dedupSummary(df: DataFrame, keys: Seq[String]): Map[String, Long] = {
    val total = df.count()
    val unique = df.select(keys.map(col): _*).distinct().count()
    Map("total_rows" -> total, "unique_rows" -> unique,
      "duplicate_rows" -> (total - unique))
  }

  /** One surviving row per key group, picked by min/max of a monotonic
    * scan-order id via `min_by`/`max_by` STRUCT aggregation. Deliberately
    * NOT `row_number().over(Window.partitionBy(keys))`: a window funnels
    * each key's entire group through one task, so one hot key (90% of a
    * 100 TB table) serializes into a single executor — the canonical
    * skew killer. min_by/max_by is a partial-aggregable hash aggregate:
    * hot keys reduce map-side to one candidate row per input partition
    * before the shuffle, so the hot key's reduce side sees O(partitions)
    * rows, not O(group). Identical keep-first/last semantics (the
    * scan-order id is unique, so the pick is total). */
  private[graft] def keepOneFrame(df: DataFrame, keys: Seq[String],
      keep: String): DataFrame = {
    require(keep == "first" || keep == "last",
      s"keep must be first|last: $keep")
    require(keys.nonEmpty, "dedup keys must be non-empty")
    val lower = df.columns.map(_.toLowerCase).toSet
    def fresh(base: String) = Iterator.iterate(base)(_ + "_")
      .dropWhile(c => lower.contains(c.toLowerCase)).next()
    val ordCol = fresh("__graft_ord")
    val rowCol = fresh("__graft_row")
    val cols = df.columns.toSeq
    val packed = struct(cols.map(col): _*)
    val picked =
      if (keep == "first") min_by(packed, col(ordCol))
      else max_by(packed, col(ordCol))
    df.withColumn(ordCol, monotonically_increasing_id())
      .groupBy(keys.map(col): _*)
      .agg(picked.as(rowCol))
      .select(cols.map(c => col(rowCol).getField(c).as(c)): _*)
  }

  /** Remove duplicate-keyed rows keeping first/last; "first"/"last" are
    * positionally arbitrary in the reference (no ORDER BY, dedup.py:147-160)
    * — here they are deterministic over the scan order. Overwrites the
    * table; returns removed count. Skew-safe: see [[keepOneFrame]]. */
  def removeDuplicates(table: String, keys: Seq[String],
      keep: String = "first"): Long = {
    val tbl = lh.catalog.loadTable(table)
    val df = tbl.read()
    val before = df.count()
    val deduped = keepOneFrame(df, keys, keep)
    tbl.overwrite(deduped)
    val removed = before - tbl.currentSnapshot.map(_.totalRows).getOrElse(0L)
    lh.audit.log(table, "remove_duplicates",
      Map("keys" -> keys.mkString(","), "removed" -> removed.toString))
    removed
  }

  /** Per-column uniqueness ratio + suggested key columns (>80% unique,
    * dedup.py:234) + estimated bytes saved by full dedup. */
  def dedupReport(table: String, keys: Seq[String]): Map[String, Any] = {
    val tbl = lh.catalog.loadTable(table)
    val df = tbl.read()
    val cols = df.columns.toSeq
    val aggs = count(lit(1)).as("_rows") +:
      cols.map(c => countDistinct(col(c)).as(s"d_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getAs[Long]("_rows")
    val uniqueness = cols.map(c =>
      c -> (if (total == 0) 0.0 else row.getAs[Long](s"d_$c").toDouble / total)).toMap
    val suggested = cols.filter(c => uniqueness(c) > 0.8)
    val summary = dedupSummary(df, keys)
    val bytes = tbl.currentSnapshot.map(_.totalBytes).getOrElse(0L)
    val savings =
      if (total == 0) 0L
      else bytes * summary("duplicate_rows") / math.max(total, 1)
    Map("uniqueness" -> uniqueness, "suggested_keys" -> suggested,
      "summary" -> summary, "estimated_savings_bytes" -> savings)
  }
}
