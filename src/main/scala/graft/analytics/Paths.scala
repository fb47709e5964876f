package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-path mining: each key's ordered event-type sequence becomes one
  * path string ("signup>view>purchase"), counted across keys — the journey
  * analysis behind funnel discovery (which paths actually happen, how
  * often), the inverse of [[Funnel]] (which checks ONE prescribed path).
  *
  * Scale guard: paths are capped at the key's first `maxLen` events (a
  * window row_number, same shuffle as the path assembly) — an unbounded
  * per-key collect is the one thing this operator must not do, since a
  * single bot key with 10⁸ events would otherwise materialize a 10⁸-element
  * array on one executor. Within the cap, `collect_list` of (ts, tie,
  * type) structs + `array_sort` gives a deterministic order (struct
  * comparison is field-by-field), so the path string is engine-exact. */
object Paths {

  /** Top `k` paths by key count: (path, n_keys), ordered by count desc then
    * path; each key contributes exactly one path (its first `maxLen`
    * events in (ts, tie) order joined with `>`). */
  def topPaths(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      typeCol: String, k: Int, maxLen: Int = 50): DataFrame = {
    require(k >= 1 && maxLen >= 1, s"k and maxLen must be >= 1")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxLen)
      .groupBy(col(keyCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col(tsCol), col(tieCol),
            col(typeCol).as("__t")))),
          x => x.getField("__t")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_keys"))
      .orderBy(desc("n_keys"), col("path"))
      .limit(k)
  }
}
