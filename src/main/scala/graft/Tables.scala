package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided deterministic parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's table-registration step (reference
  * `src/lakehouse/query.py:52-75` registers every catalog table as a DuckDB
  * view) — here registration is lazy temp views over parquet, so Catalyst
  * prunes columns and pushes filters into the scan instead of materializing
  * the whole table the way the reference does.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects; read as long nanos and truncate to microseconds
      // (Spark's native timestamp precision).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path(dir, name))
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(path(dir, name))

  def loadAll(spark: SparkSession, dir: String): Map[String, DataFrame] =
    names.map(n => n -> load(spark, dir, n)).toMap

  /** Register every table as a temp view under its short name. */
  def register(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
