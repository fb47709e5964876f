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
      // events.ts has varied across driver generations: TIMESTAMP(NANOS)
      // (rejected by the vectorized reader unless read as long nanos) and
      // TIMESTAMP(MICROS, isAdjustedToUTC=false) (resolves as
      // TIMESTAMP_NTZ). Branch on the RESOLVED type so both generations
      // load to the same session-UTC TimestampType at micro precision:
      // long nanos floor-truncate to micros; NTZ micros cast 1:1. The NTZ
      // cast interprets the wall clock in the session timezone, so pin it
      // to UTC HERE — not just in Verify/Cli — so Bench/Prof/ScaleRehearsal
      // sessions on a non-UTC host load the same instants as the
      // correctness run.
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path(dir, name))
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        case _ => raw
      }
    } else spark.read.parquet(path(dir, name))

  def loadAll(spark: SparkSession, dir: String): Map[String, DataFrame] =
    names.map(n => n -> load(spark, dir, n)).toMap

  /** Register every table as a temp view under its short name. */
  def register(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
