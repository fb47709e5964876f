package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — an operator the reference lacks and Spark has no
  * built-in for: for each left row, attach the single right row with the
  * greatest `rightTime <= leftTime` within the same key.
  *
  * Implemented by COMPOSITION (preference (a) of the custom-operator ladder):
  * union both sides tagged, one window pass ordered by (time, side) with
  * `last(payload, ignoreNulls)` over an unbounded-preceding frame. Cost is a
  * single shuffle on the key + a sort within partitions — linear at 100 TB,
  * with none of the range-cross-join blowup a naive `l.t >= r.t` join gets,
  * and no per-key driver loop. Equal timestamps match (right sorts before
  * left), mirroring DuckDB's `ASOF JOIN ... ON l.t >= r.t`.
  *
  * Right rows must be unique per (key, time) for deterministic output —
  * pre-aggregate the right side otherwise.
  */
object AsOfJoin {

  def asofBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rPayloadCols = right.columns.toSeq.filterNot(_ == rightKey)
    val rStruct = struct(rPayloadCols.map(col): _*)

    val rTagged = right.select(
      col(rightKey).as("__k"),
      col(rightTime).cast("timestamp").as("__t"),
      lit(0).as("__side"),
      lit(null).cast("struct<" + lCols.map(c =>
        s"`$c`:${left.schema(c).dataType.sql}").mkString(",") + ">").as("__l"),
      rStruct.as("__r"))

    val lTagged = left.select(
      col(leftKey).as("__k"),
      col(leftTime).cast("timestamp").as("__t"),
      lit(1).as("__side"),
      struct(lCols.map(col): _*).as("__l"),
      lit(null).cast("struct<" + rPayloadCols.map(c =>
        s"`$c`:${right.schema(c).dataType.sql}").mkString(",") + ">").as("__r"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rTagged.unionByName(lTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(lCols.map(c => col(s"__l.`$c`").as(c)) ++
        rPayloadCols.map(c => col(s"__match.`$c`")
          // right-side names colliding with left columns get a suffix
          .as(if (lCols.contains(c)) s"${c}_right" else c)): _*)
  }
}
