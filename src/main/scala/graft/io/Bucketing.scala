package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed materialization — Spark's storage-level answer to the
  * repeated large×large shuffle join. A table written with `bucketBy(n,
  * keys)` carries HashPartitioning(keys, n) as scan-time metadata: an
  * equi-join of two tables co-bucketed on the join keys (same n), or a
  * groupBy on the bucket keys, plans with NO shuffle Exchange — at 100 TB
  * that converts the dominant per-query cost of a hot join into a
  * one-time write cost amortized over every subsequent query.
  *
  * Spark only attaches bucket metadata through the session catalog
  * (`saveAsTable`; a bare `.parquet(path)` cannot carry it — Spark API
  * constraint, see SPARK-19256), so these helpers manage bucketed COPIES
  * of hot join inputs as catalog tables with an explicit storage path.
  * With the default in-memory catalog the table ENTRY is session-scoped
  * while the files persist; a cluster deployment backs the same calls
  * with a shared metastore.
  *
  * Pair `sortBy` with the bucket keys: sorted single-file buckets (which
  * [[writeBucketed]] guarantees) let the sort-merge join skip its
  * per-partition Sort too, leaving a pure streamed merge — Spark only
  * reports the scan's output ORDERING when
  * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (off by
  * default since 3.0 because it lists files at planning time; cheap when
  * reads are fewer, larger queries — exactly the bucketed-table regime).
  */
object Bucketing {

  /** Write `df` as a bucketed (optionally bucket-sorted) catalog table at
    * `path`. `numBuckets` should be sized so one bucket of the LARGER
    * join side fits an executor core's working set (e.g. ~128–512 MB of
    * parquet per bucket); both join sides must use the same keys and
    * bucket count to join shuffle-free. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      keys: Seq[String], numBuckets: Int, sortKeys: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(keys.nonEmpty, "bucket keys must be non-empty")
    val sorted = if (sortKeys.isEmpty) keys else sortKeys
    // one writer task per bucket => one FILE per bucket: Spark only elides
    // the merge-join Sort over a sorted bucket when the bucket is a single
    // file (multi-file buckets are only sorted per-file). repartition uses
    // the same murmur3 hash as the bucket assignment, so this colocates
    // exactly each bucket's rows.
    df.repartition(numBuckets, keys.map(df.col): _*)
      .write.mode(mode)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .option("path", path)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (scan reports the bucket partitioning, so
    * downstream joins/aggs on the keys skip their Exchange). */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Drop the catalog entry; `purge` deletes the files too. */
  def drop(spark: SparkSession, table: String, purge: Boolean = false): Unit = {
    val loc =
      if (purge)
        scala.util.Try(spark.sql(s"DESCRIBE TABLE EXTENDED $table")
          .where("col_name = 'Location'").head().getString(1)).toOption
      else None
    spark.sql(s"DROP TABLE IF EXISTS $table")
    loc.foreach { l =>
      val p = new org.apache.hadoop.fs.Path(l)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}
