package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-path analytics over an event log: ordered funnels, cohort
  * retention, and transition matrices. Beyond-reference additions for the
  * events table (the reference has no event-sequence operators).
  *
  * All three operators shuffle exactly once on the user key (the window /
  * groupBy partitioning); the final summary aggregations run on partial
  * (map-side combined) aggregates. At 100 TB the per-user state is a
  * handful of timestamps, so nothing here materializes per-user event
  * arrays.
  */
object Funnel {

  /** Ordered funnel: for each user, the earliest time each step was reached
    * where step i must occur strictly after step i-1 was reached.
    *
    * Returns one row per user: the key, one `step_N_ts` per step, and
    * `reached` = number of consecutive steps completed. Stacked window
    * aggregates over the same partitioning plan as chained Window nodes
    * behind a single Exchange — one shuffle regardless of step count.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(userCol))
    val withSteps = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val gate: Column =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col(tsCol) > col(s"step_${i - 1}_ts")
      df.withColumn(s"step_${i}_ts", min(when(gate, col(tsCol))).over(w))
    }
    val stepCols = steps.indices.map(i => col(s"step_${i}_ts"))
    val reached = stepCols.map(c => when(c.isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    // every column is constant within a user after the window pass, so
    // one-row-per-user via dropDuplicates on the user key alone — keyed on
    // the window's partitioning, it collapses without a second Exchange
    // (a full-row distinct would re-shuffle on all columns)
    withSteps
      .select((col(userCol) +: stepCols) :+ reached.as("reached"): _*)
      .dropDuplicates(Seq(userCol))
  }

  /** Step-count summary of [[funnel]]: one row per step with how many users
    * reached it (users reaching step i+1 are a subset of step i). */
  def funnelSummary(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    val f = funnel(events, userCol, tsCol, typeCol, steps)
    val perStep = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1).as("step_no"), lit(step).as("step"),
        when(col(s"step_${i}_ts").isNotNull, 1L).otherwise(0L).as("hit"))
    }
    f.select(explode(array(perStep: _*)).as("s"))
      .groupBy(col("s.step_no").as("step_no"), col("s.step").as("step"))
      .agg(sum(col("s.hit")).as("n_users"))
  }

  /** Cohort retention: users are grouped by the day of their first event,
    * and counted once per (cohort_day, day_offset) they were active on.
    *
    * Two shuffles: min-date per user, then the (cohort, offset) count. The
    * first-seen frame joins back to events on the user key — at scale that
    * is a shuffle join reusing the user partitioning, never a collect.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstSeen = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    events.select(col(userCol), to_date(col(tsCol)).as("day"))
      .join(firstSeen, userCol)
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Markov transition counts: for each user's event sequence ordered by
    * (ts, tiebreak), count (previous event type → event type) pairs. */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    // project to the columns the window needs BEFORE its exchange
    // (guide §2.3) and pin the by-user exchange so the per-user sort
    // doesn't coalesce to one task; distinct so a caller reusing one
    // column in two roles (e.g. tie == ts) doesn't hit an ambiguous name
    graft.operators.Spread.byKey(
        events.select(
          Seq(userCol, tsCol, typeCol, tieCol).distinct.map(col): _*),
        col(userCol))
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
  }
}
