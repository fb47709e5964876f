package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-key skew diagnostics — the report you run BEFORE a 100 TB join
  * melts one reducer: per-key frequencies summarized into the handful of
  * numbers that decide the shuffle strategy (broadcast? salt? AQE skew
  * threshold?), plus the salt factor [[SkewJoin.saltedJoin]] would need to
  * level the hottest key across partitions.
  *
  * One groupBy(key) shuffle; every statistic after it runs on the
  * key-count frame (rows = distinct keys, already a reduction), and the
  * final assembly cross-joins two one-row frames. The p99 interpolation
  * is the shared `a + (idx−⌊idx⌋)·(b−a)` formula every engine evaluates
  * identically on the same doubles (the q9 percentile convention); the
  * salt factor is pure integer arithmetic. */
object SkewReport {

  /** One row: `n_keys`, `total_rows`, `max_count`, `p99_count`
    * (99th-percentile key count, interpolated), `top_key` (hottest key,
    * ties broken by key string), `salt_factor` (= ceil(max_count ·
    * partitions / total): 1 means no salting needed). Null keys count as
    * a key (they hash to one partition too — the classic skew source). */
  def keySkew(df: DataFrame, keyCol: Column, partitions: Int = 32): DataFrame = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    val counts = df.groupBy(keyCol.cast("string").as("k"))
      .agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("total_rows"),
      max(col("cnt")).as("max_count"),
      expr("percentile(cnt, 0.99)").as("p99_count"))
    val top = counts.orderBy(desc("cnt"), col("k")).limit(1)
      .select(col("k").as("top_key"))
    stats.crossJoin(top)
      .withColumn("salt_factor", expr(
        s"(max_count * ${partitions}L + total_rows - 1L) div total_rows"))
  }
}
