package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data layout,
  * beyond-reference.
  *
  * Sorting 100 TB of files by one key makes min/max file skipping perfect
  * on that key and useless on every other. Interleaving the bits of two
  * keys into one z-value and range-partitioning on it gives every
  * interleaved dimension locality, so parquet min/max stats prune scans
  * filtered on either key.
  *
  * The interleave is a fold of builtin shift/mask expressions (all shift
  * amounts are literals), so the z-value computation stays in whole-stage
  * codegen, and [[zvalue2Sql]] emits the identical unrolled arithmetic as
  * ANSI SQL so an external engine can verify it term for term (gate q75).
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative integer
    * columns: bit i of `x` lands at even position 2i, bit i of `y` at odd
    * position 2i+1. Values wider than `bits` bits are masked down first.
    */
  def zvalue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1
    val xs = x.cast("bigint").bitwiseAND(lit(mask))
    val ys = y.cast("bigint").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_.bitwiseOR(_))
  }

  /** ANSI-SQL twin of [[zvalue2]] — same unrolled expression over column
    * names, for oracle engines. */
  def zvalue2Sql(x: String, y: String, bits: Int = 16): String = {
    val mask = (1L << bits) - 1
    val xs = s"(CAST($x AS BIGINT) & $mask)"
    val ys = s"(CAST($y AS BIGINT) & $mask)"
    (0 until bits).map { i =>
      s"(((($xs >> $i) & 1) << ${2 * i}) | ((($ys >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")
  }

  /** Re-layout `df` into `numPartitions` files clustered by the z-value of
    * (xCol, yCol): range-partition on z so each output file owns a compact
    * z-interval (tight min/max on BOTH dimensions), then sort within
    * partitions so row groups inherit the same locality.
    */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int, bits: Int = 16): DataFrame = {
    val z = zvalue2(col(xCol), col(yCol), bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
