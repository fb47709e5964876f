package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.Lakehouse

case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

case class SessionState(count: Long, firstTs: Long, lastTs: Long)

case class UserSession(user_id: Long, events: Long, startMs: Long, endMs: Long,
    durationMs: Long)

/** Per-user funnel progress: stepTsMicros(i) = earliest qualifying event
  * time for step i (µs since epoch), -1 while unreached. */
case class FunnelProgress(user_id: Long, stepTsMicros: Seq[Long], reached: Int)

/** Per-user streaming EMA: `ema_micro` = current EMA · 10⁶ (rounded),
  * `n_events` processed, `last_ts_micros` of the newest folded event. */
case class EmaProgress(user_id: Long, n_events: Long, ema_micro: Long,
    last_ts_micros: Long)

/** Structured Streaming facade. The reference has no continuous streaming —
  * its "incremental" is snapshot-diff micro-batch (SURVEY §2.10), which
  * [[graft.analytics.Incremental]] covers. This module is the Spark-native
  * upgrade path: the same events schema processed as a real stream with
  * event-time watermarks, windowed aggregation, gap-based sessionization via
  * flatMapGroupsWithState, and a foreachBatch sink that commits each
  * micro-batch as an IceLite snapshot (exactly-once per batch via the
  * snapshot log's atomic append).
  */
object Streaming {

  /** File stream over a directory of event parquet (schema must be given
    * for streaming reads). */
  def eventsStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Tumbling-window counts + sums with an event-time watermark. The sum is
    * computed in exact decimal so the result is identical regardless of
    * micro-batch boundaries and partial-aggregation order. */
  def windowedStats(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours", slide: Option[String] = None): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide.getOrElse(windowLen)),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Execute a streaming aggregation to completion over a bounded source and
    * return the final result: memory-sink + AvailableNow harness, the
    * standard way to assert a streaming plan's output equals its batch
    * equivalent. Gate/test scale only — a production sink is
    * [[writeToTable]]. */
  def runToMemory(df: DataFrame, name: String): DataFrame =
    runToMemory(df, name, OutputMode.Complete())

  /** As [[runToMemory]] but with an explicit output mode: stream-stream
    * joins only support Append (Complete would have to retain both full
    * streams), and an Append aggregation emits only watermark-closed
    * windows. With a bounded single-directory source and no
    * maxFilesPerTrigger, AvailableNow processes everything in one
    * micro-batch, so an Append inner join emits the complete batch-join
    * result deterministically. */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val spark = df.sparkSession
    spark.streams.active.filter(q => Option(q.name).contains(name)).foreach(_.stop())
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Gap-based sessionization with custom state: a session closes when no
    * event arrives for `gapMs` in processing time (KeyValueGroupedDataset
    * .flatMapGroupsWithState, the reference-free §2.10 scale path). */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserSession(userId, s.count, s.firstTs, s.lastTs,
              s.lastTs - s.firstTs))
          } else {
            val events = rows.toSeq
            val tss = events.map(_.ts.getTime)
            val prev = state.getOption
            val next = prev match {
              case Some(s) => SessionState(s.count + events.size,
                s.firstTs, math.max(s.lastTs, tss.max))
              case None => SessionState(events.size, tss.min, tss.max)
            }
            state.update(next)
            state.setTimeoutDuration(gapMs)
            Iterator.empty
          }
      }
  }

  /** Streaming ordered funnel — the real-time twin of
    * [[graft.analytics.Funnel.funnel]]: per-user state is one timestamp
    * per step (earliest event of step i strictly after step i-1 was
    * reached), updated as events arrive, emitted whenever it advances
    * (Update mode). State size = steps × 8 bytes per ACTIVE user — and
    * BOUNDED: a user idle for `idleGap` past the event-time watermark is
    * evicted (EventTimeTimeout), so on an unbounded user population the
    * state store holds only the working set, not every user ever seen.
    * An event arriving after its user was evicted restarts that funnel
    * from scratch — the same late-data contract as every watermarked
    * stateful operator here ([[dedupStream]], sessionization).
    *
    * Ordering caveat (inherent to incremental funnels): events are
    * processed in event-time order WITHIN each micro-batch; a late event
    * arriving in a later batch can only advance, never rewind, the state.
    * With a single AvailableNow batch the result is exactly the batch
    * funnel (StreamingSpec asserts equality; also across batch splits
    * where later batches carry later event times). */
  def funnelStream(events: Dataset[Event], steps: Seq[String],
      watermark: String = "2 hours", idleGapMs: Long = 24L * 3600 * 1000)
      : Dataset[FunnelProgress] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import events.sparkSession.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Array[Long], FunnelProgress](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[Array[Long]]) =>
          if (state.hasTimedOut) {
            // idle past the horizon: the funnel can no longer legally
            // advance within the late-data contract — drop the state row
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq
            val st = state.getOption.getOrElse(Array.fill(steps.size)(-1L))
            val before = st.clone()
            // full microsecond precision: getTime is millis-truncated, the
            // sub-milli part lives in getNanos — dropping it would diverge
            // from the batch operator's µs timestamp comparisons
            def micros(e: Event): Long =
              math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
            batch.sortBy(e => (micros(e), e.event_id)).foreach { e =>
              stepIdx.get(e.event_type).foreach { i =>
                val tsMicros = micros(e)
                val prevOk = i == 0 || (st(i - 1) >= 0 && tsMicros > st(i - 1))
                if (st(i) < 0 && prevOk) st(i) = tsMicros
              }
            }
            val advanced = !st.sameElements(before)
            if (advanced) state.update(st)
            if (state.exists) {
              // refresh the eviction horizon on any activity: evict once
              // the watermark passes idleGapMs beyond the user's newest
              // event (clamped ahead of the current watermark, which
              // setTimeoutTimestamp requires)
              val maxMs = batch.iterator.map(_.ts.getTime).max
              state.setTimeoutTimestamp(
                math.max(maxMs + idleGapMs, state.getCurrentWatermarkMs() + 1))
            }
            if (advanced)
              Iterator.single(FunnelProgress(userId, st.toSeq,
                st.count(_ >= 0)))
            else Iterator.empty
          }
      }
  }

  /** Streaming per-key EMA (α = 1 − 2⁻ᵐ, the dyadic family of
    * [[graft.analytics.Ema]]): state is ONE (ts, tie, ema, n) tuple per
    * user — O(keys), not O(events) — folded with the exact sequential
    * recurrence `ema ← α·x + (1−α)·ema`. Within a micro-batch events sort
    * by (event-time µs, event_id); ACROSS batches an event at or before
    * the already-folded frontier is dropped (an order-sensitive recurrence
    * cannot retro-correct without buffering the history — the same caveat
    * as [[funnelStream]]; with AvailableNow or time-ordered batches the
    * result equals the batch recurrence exactly). Idle keys evict via
    * EventTimeTimeout once the watermark passes `idleGapMs` beyond their
    * newest event, so state is bounded under key churn; an evicted key's
    * next event restarts its EMA from scratch. Emits Update-mode rows only
    * when a batch advances the key. */
  def emaStream(events: Dataset[Event], m: Int = 1,
      watermark: String = "2 hours", idleGapMs: Long = 24L * 3600 * 1000)
      : Dataset[EmaProgress] = {
    require(m >= 1 && m <= 30, s"m in [1,30], got $m")
    import events.sparkSession.implicits._
    val alpha = 1.0 - 1.0 / (1L << m).toDouble
    // state: (lastTsMicros, lastTie, ema, n)
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Double, Long), EmaProgress](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event],
            state: GroupState[(Long, Long, Double, Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            def micros(e: Event): Long =
              math.floorDiv(e.ts.getTime, 1000L) * 1000000L +
                e.ts.getNanos / 1000L
            val batch = rows.toSeq
            var (lastTs, lastTie, ema, n) =
              state.getOption.getOrElse((Long.MinValue, Long.MinValue, 0.0, 0L))
            val before = n
            batch.sortBy(e => (micros(e), e.event_id)).foreach { e =>
              val ts = micros(e)
              // frontier guard: only strictly-later (ts, tie) events fold
              if (ts > lastTs || (ts == lastTs && e.event_id > lastTie)) {
                ema = if (n == 0) e.value else alpha * e.value + (1 - alpha) * ema
                n += 1; lastTs = ts; lastTie = e.event_id
              }
            }
            if (n != before) state.update((lastTs, lastTie, ema, n))
            if (state.exists) {
              val maxMs = batch.iterator.map(_.ts.getTime).max
              state.setTimeoutTimestamp(
                math.max(maxMs + idleGapMs, state.getCurrentWatermarkMs() + 1))
            }
            if (n != before)
              Iterator.single(EmaProgress(userId, n,
                math.round(ema * 1e6), lastTs))
            else Iterator.empty
          }
      }
  }

  /** Streaming exact deduplication — the ingestion-side dedup of a training
    * pipeline: drop rows whose `keyCols` were already seen, with state
    * bounded by the event-time watermark (`dropDuplicatesWithinWatermark`:
    * two duplicates arriving within the watermark interval dedupe; state
    * for keys older than the watermark is evicted, so memory is bounded by
    * the watermark window, not the full stream history).
    *
    * For content-level dedup (not id-level), pass a fingerprint column
    * built with [[graft.text.TextAnalysis.fingerprint]] as the key. */
  def dedupStream(events: DataFrame, keyCols: Seq[String], tsCol: String = "ts",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-STREAM interval correlation: pair each `lead` event with the
    * `follow` events of the same key whose timestamp lands in
    * [lead_ts, lead_ts + within] — click→purchase attribution, request→
    * error correlation, impression→conversion joins.
    *
    * Both sides carry an event-time watermark and the join condition
    * time-bounds follow_ts relative to lead_ts; together these let the
    * engine EVICT buffered rows once the watermark passes their legal
    * match interval — the Structured Streaming requirement for
    * stream-stream joins with bounded state (state size ~ events inside
    * one watermark window per side, not stream history).
    *
    * Inner join ⇒ Append output mode; result rows are final and equal
    * the batch interval join over the same data regardless of
    * micro-batch boundaries. */
  def correlateStreams(lead: DataFrame, follow: DataFrame, keyCol: String,
      tsCol: String = "ts", within: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val l = lead.select(col(keyCol).as("k"), col(tsCol).as("lead_ts"))
      .withWatermark("lead_ts", watermark)
    val f = follow.select(col(keyCol).as("__fk"), col(tsCol).as("follow_ts"))
      .withWatermark("follow_ts", watermark)
    l.join(f,
        col("k") === col("__fk") &&
          col("follow_ts") >= col("lead_ts") &&
          col("follow_ts") <= col("lead_ts") + expr(s"INTERVAL $within"))
      .select(col("k").as(keyCol), col("lead_ts"), col("follow_ts"))
  }

  /** Snapshot-summary key recording the last streaming batch id folded
    * into a sink table. foreachBatch is at-least-once: a crash between
    * the IceLite commit and the checkpoint offset commit replays the
    * batch. Recording the batch id IN the snapshot summary (same atomic
    * write as the data) and skipping already-applied ids makes the sink
    * exactly-once — the standard idempotent-foreachBatch pattern. */
  private[graft] val BatchIdKey = "graft.stream.batch-id"

  /** Snapshot-summary key recording WHICH streaming query stamped
    * [[BatchIdKey]]. Batch ids are monotone only within one checkpoint:
    * a wiped/migrated checkpoint restarts them at 0, so a watermark
    * keyed by batch id alone would silently skip every micro-batch of
    * the new incarnation until its ids catch up — data loss, not
    * idempotency. Scoping the watermark by the streaming query id
    * (stable across restarts of the same checkpoint, fresh when the
    * checkpoint is) is exactly how Iceberg's Spark streaming sink
    * scopes its epoch watermark. */
  private[graft] val QueryIdKey = "graft.stream.query-id"

  /** The streaming query id of the current foreachBatch invocation, read
    * from the local property the stream execution thread sets; None when
    * called outside a streaming query (tests driving batches by hand). */
  private[graft] def currentQueryId(spark: SparkSession): Option[String] =
    Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))

  /** True iff `batchId` has already been committed to `table` BY THE SAME
    * streaming query — i.e. the latest snapshot carrying a batch-id stamp
    * belongs to this query id and is >= this batch. Batch ids are
    * monotone per checkpoint, so one watermark suffices (no set). A
    * stamp from a DIFFERENT query id (fresh checkpoint into an existing
    * sink) never matches, so the new incarnation's batches all apply.
    * Malformed stamps (hand-edited metadata) are treated as absent, not
    * fatal. */
  private[graft] def batchAlreadyApplied(lh: Lakehouse, table: String,
      queryId: Option[String], batchId: Long): Boolean =
    lh.catalog.tableExists(table) && {
      val stamped = lh.catalog.loadTable(table).snapshots.reverseIterator
        .filter(_.summary.contains(BatchIdKey)).take(1).toSeq.headOption
      stamped.exists { s =>
        s.summary.get(QueryIdKey) == queryId &&
          s.summary.get(BatchIdKey)
            .flatMap(v => scala.util.Try(v.toLong).toOption)
            .exists(_ >= batchId)
      }
    }

  /** Summary stamps for one micro-batch commit: batch id plus the owning
    * query id when running inside a real streaming query. */
  private def batchStamp(spark: SparkSession, batchId: Long)
      : Map[String, String] =
    Map(BatchIdKey -> batchId.toString) ++
      currentQueryId(spark).map(QueryIdKey -> _)

  /** One micro-batch of [[writeToTable]]; package-visible so the replay
    * spec can re-drive a batch id and assert no duplicate rows. */
  private[graft] def appendBatch(lh: Lakehouse, table: String)(
      batch: DataFrame, batchId: Long): Unit = {
    if (!lh.catalog.tableExists(table))
      lh.catalog.createTable(table, batch.schema, Nil,
        Map("graft.streaming" -> "true"))
    val qid = currentQueryId(batch.sparkSession)
    if (!batchAlreadyApplied(lh, table, qid, batchId)) {
      lh.catalog.loadTable(table)
        .append(batch, batchStamp(batch.sparkSession, batchId))
      ()
    }
  }

  /** Sink each micro-batch into an IceLite table: one snapshot per batch,
    * so replays/time travel work on streamed data too. Idempotent under
    * at-least-once replay via the snapshot-summary batch-id watermark. */
  def writeToTable(df: DataFrame, lh: Lakehouse, table: String,
      checkpointDir: String, trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) => appendBatch(lh, table)(b, id) }
      .start()

  /** Streaming windowed approximate distinct — "distinct users per hour"
    * over an unbounded stream with BOUNDED state: the KMV sketch
    * ([[graft.analytics.Kmv]]) is an associative bounded-buffer
    * aggregate, so it slots into a watermarked window aggregation as
    * incremental state of at most k longs per window (exact streaming
    * COUNT(DISTINCT) would hold every distinct value per window — the
    * thing that OOMs on high-cardinality keys). Append mode emits each
    * window once its watermark closes; the estimate is the same
    * deterministic integer as the batch sketch, so stream == batch is
    * asserted in the spec, not hoped. */
  def windowedDistinctStream(events: DataFrame, tsCol: String,
      valueCol: Column, windowLen: String = "1 hour",
      watermark: String = "2 hours", k: Int = 256): DataFrame = {
    val agg = graft.analytics.Kmv.sketchUdaf(k)
    graft.analytics.Kmv.estimateFromSketch(
      events.withWatermark(tsCol, watermark)
        .select(col(tsCol), graft.analytics.Kmv.hash52(valueCol).as("__hv"))
        .where(col("__hv").isNotNull)
        .groupBy(window(col(tsCol), windowLen))
        .agg(agg(col("__hv")).as("__sk")),
      "__sk", k)
  }

  /** Streaming Count-Min sketch per tumbling window: the incremental
    * stateful count over exploded (window, row, bucket) cells IS the CMS
    * merge law — the grid is linear in the multiset ([[graft.analytics
    * .Cms]], merge law proven in CmsSpec), so per-batch counter addition
    * by Spark's windowed aggregation reconstructs exactly the sketch a
    * batch build over the same data would produce (asserted stream ==
    * batch in StreamingSpec). State per window is AT MOST depth×width
    * counters REGARDLESS of key cardinality — the streaming heavy-hitter
    * screen over trillion-token streams where exact per-key windowed
    * counts would hold every distinct key in the state store. Output
    * rows: (window, j, bucket, cnt); feed to [[graft.analytics.Cms
    * .windowedHeavyHitters]] (or Cms.estimates per window) to screen. */
  def windowedCmsStream(events: DataFrame, tsCol: String, valueCol: Column,
      windowLen: String = "1 hour", watermark: String = "2 hours",
      depth: Int = 4, width: Int = 512): DataFrame =
    events.withWatermark(tsCol, watermark)
      .where(valueCol.isNotNull)
      .select(col(tsCol), posexplode(array((0 until depth).map(j =>
        graft.analytics.Cms.bucket(valueCol, j, width)): _*))
        .as(Seq("j", "bucket")))
      .groupBy(window(col(tsCol), windowLen), col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Streaming rollup maintenance: each micro-batch folds into a per-key
    * (n, sum_micro) IceLite state table via
    * [[graft.analytics.IncrementalAgg.maintain]] — the streaming face of
    * the same delta-merge the batch CDC path uses, so a 100 TB rollup
    * stays fresh for the cost of each batch, not a recompute. Work per
    * batch: aggregate the BATCH (map-side combined), one key join against
    * the state table; the state table is only ever state-sized. Each
    * commit is an IceLite snapshot — the rollup time-travels like any
    * other table, and a crashed query resumes from the checkpoint with
    * at-least-once batch replay folding idempotently per batch id via the
    * snapshot-summary watermark ([[BatchIdKey]]): a replayed id is a
    * no-op, so double-folding cannot corrupt counts/sums (StreamingSpec
    * asserts both stream == batch recompute and replay == no-op). */
  def maintainCountSumStream(df: DataFrame, lh: Lakehouse, table: String,
      keyCols: Seq[String], valCol: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        foldCountSumBatch(lh, table, keyCols, valCol)(b, id)
      }
      .start()

  /** One micro-batch of [[maintainCountSumStream]]; package-visible so
    * the replay spec can re-drive a batch id and assert the fold is
    * skipped (state unchanged). */
  private[graft] def foldCountSumBatch(lh: Lakehouse, table: String,
      keyCols: Seq[String], valCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    if (batchAlreadyApplied(lh, table,
        currentQueryId(batch.sparkSession), batchId)) return
    val updated =
      if (lh.catalog.tableExists(table))
        graft.analytics.IncrementalAgg.maintain(
          lh.catalog.loadTable(table).read(),
          batch.withColumn("__op", lit("I")),
          keyCols, valCol, "__op")
      else
        graft.analytics.IncrementalAgg.countSumState(batch, keyCols, valCol)
    // safe to read-while-overwriting: commits write a NEW commit dir
    // and prior snapshot files persist for time travel, so the lazy
    // plan over the old state keeps valid inputs during the write
    if (!lh.catalog.tableExists(table))
      lh.catalog.createTable(table, updated.schema, Nil,
        Map("graft.streaming" -> "true"))
    lh.catalog.loadTable(table)
      .overwrite(updated, batchStamp(batch.sparkSession, batchId))
    ()
  }
}
