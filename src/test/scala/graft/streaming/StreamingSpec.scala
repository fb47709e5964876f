package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Lakehouse, SparkFixture}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def eventsDir(): String = {
    // stream source: a dir of parquet with µs timestamps (streaming reader
    // rejects TIMESTAMP(NANOS) like the batch one)
    val dir = SparkFixture.tmpDir("graft-st-").toString
    graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .limit(200).coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed stats with watermark over a file stream (AvailableNow)") {
    val dir = eventsDir()
    val schema = spark.read.parquet(dir).schema
    val stats = Streaming.windowedStats(
      Streaming.eventsStream(spark, dir, schema), "1 hour", "2 hours")
    val q = stats.writeStream.outputMode("append").format("memory")
      .queryName("winstats").option("checkpointLocation",
        SparkFixture.tmpDir("graft-ck-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("winstats")
    // append mode emits only watermark-closed windows; with AvailableNow all
    // but the trailing windows close
    assert(got.count() > 0)
    val batch = spark.read.parquet(dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
    // every emitted row matches the batch computation
    val j = got.join(batch.select($"window.start".as("window_start"),
      $"event_type", $"n".as("batch_n")), Seq("window_start", "event_type"))
    assert(j.where($"n" =!= $"batch_n").count() == 0)
  }

  test("sliding windowed stats stream matches the batch sliding aggregation") {
    val dir = eventsDir()
    val schema = spark.read.parquet(dir).schema
    val stats = Streaming.windowedStats(
      Streaming.eventsStream(spark, dir, schema), "1 hour", "2 hours",
      slide = Some("15 minutes"))
    val q = stats.writeStream.outputMode("append").format("memory")
      .queryName("slidestats").option("checkpointLocation",
        SparkFixture.tmpDir("graft-ck-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("slidestats")
    assert(got.count() > 0)
    val batch = spark.read.parquet(dir)
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val j = got.join(batch.select($"window.start".as("window_start"),
      $"event_type", $"n".as("batch_n")), Seq("window_start", "event_type"))
    assert(j.where($"n" =!= $"batch_n").count() == 0)
    // sliding: each event contributes to 4 windows, so window rows for a
    // given type outnumber the tumbling equivalent
    val tumbling = spark.read.parquet(dir)
      .groupBy(window($"ts", "1 hour"), $"event_type").agg(count(lit(1)))
    assert(batch.count() > tumbling.count())
  }

  test("funnelStream final state equals the batch funnel") {
    val dir = eventsDir()
    val schema = spark.read.parquet(dir).schema
    val steps = Seq("signup", "view", "purchase")
    val stream = Streaming.eventsStream(spark, dir, schema).as[Event]
    val q = Streaming.funnelStream(stream, steps)
      .writeStream.outputMode("update").format("memory")
      .queryName("funnelst").option("checkpointLocation",
        SparkFixture.tmpDir("graft-ck-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // update mode emits one row per state advance; the final state per
    // user is the row with the highest reached count
    val fin = spark.table("funnelst")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(desc("reached"))))
      .where($"rn" === 1)
      .select($"user_id", $"stepTsMicros", $"reached")
    val batch = graft.analytics.Funnel.funnel(
      spark.read.parquet(dir), "user_id", "ts", "event_type", steps)
    val batchN = batch.select($"user_id",
      array(steps.indices.map(i =>
        coalesce(unix_micros(col(s"step_${i}_ts")), lit(-1L))): _*)
        .as("stepTsMicros"),
      $"reached".cast("int").as("reached"))
    // streamed rows exist only for users who advanced at least one step
    val batchReached = batchN.where($"reached" > 0)
    assert(batchReached.count() > 0)
    assert(fin.count() == batchReached.count())
    val joined = fin.alias("s").join(batchN.alias("b"), "user_id")
    val diff = joined.where(
      col("s.reached") =!= col("b.reached") ||
        col("s.stepTsMicros") =!= col("b.stepTsMicros")).count()
    assert(diff == 0, "streaming funnel state diverged from batch funnel")
  }

  test("funnelStream across two micro-batches: monotone advance, final state equals batch") {
    // batch 2 carries strictly later event times than batch 1, so the
    // incremental funnel's ordering caveat does not bite and the final
    // state must equal the batch funnel over the union
    val b1 = Seq(
      Event(1, new Timestamp(1000), 1, "signup", 0.0),
      Event(2, new Timestamp(2000), 1, "view", 0.0),
      Event(3, new Timestamp(1500), 2, "signup", 0.0))
    val b2 = Seq(
      Event(4, new Timestamp(9000), 1, "purchase", 0.0),
      Event(5, new Timestamp(9500), 2, "view", 0.0),
      Event(6, new Timestamp(9700), 3, "signup", 0.0))
    val steps = Seq("signup", "view", "purchase")
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    val q = Streaming.funnelStream(ms.toDS(), steps)
      .writeStream.outputMode("update").format("memory")
      .queryName("funnel2b").option("checkpointLocation",
        SparkFixture.tmpDir("graft-ck-").toString)
      .start()
    ms.addData(b1: _*); q.processAllAvailable()
    val afterB1 = spark.table("funnel2b").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    ms.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val rows = spark.table("funnel2b")
    // monotone: user 1 advanced 2 -> 3, user 2 advanced 1 -> 2; no rewind
    assert(afterB1 == Map(1L -> 2, 2L -> 1))
    val fin = rows
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(desc("reached"))))
      .where($"rn" === 1)
      .select($"user_id", $"stepTsMicros", $"reached")
    val all = (b1 ++ b2).toDF()
    val batch = graft.analytics.Funnel.funnel(all, "user_id", "ts", "event_type", steps)
    val batchN = batch.select($"user_id",
      array(steps.indices.map(i =>
        coalesce(unix_micros(col(s"step_${i}_ts")), lit(-1L))): _*)
        .as("stepTsMicros"),
      $"reached".cast("int").as("reached"))
      .where($"reached" > 0)
    assert(fin.count() == batchN.count())
    val diff = fin.alias("s").join(batchN.alias("b"), "user_id")
      .where(col("s.reached") =!= col("b.reached") ||
        col("s.stepTsMicros") =!= col("b.stepTsMicros")).count()
    assert(diff == 0, "two-batch streaming funnel diverged from batch funnel")
  }

  test("funnelStream evicts idle users' state once the watermark passes the idle gap") {
    val steps = Seq("signup", "view")
    val ckpt = SparkFixture.tmpDir("graft-ck-").toString
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    // zero-delay watermark + 150s idle gap: user 7 (t=1s, horizon 151s) is
    // evicted once the watermark reaches 200s; users 8 (horizon 250s) and
    // 9 (horizon 350s) survive. Spark fires expired timers in the no-data
    // batch it runs after each watermark advance.
    val q = Streaming.funnelStream(ms.toDS(), steps,
      watermark = "0 seconds", idleGapMs = 150000L)
      .writeStream.outputMode("update").format("memory")
      .queryName("funnelev").option("checkpointLocation", ckpt)
      .start()
    ms.addData(Event(1, new Timestamp(1000), 7, "signup", 0.0))
    q.processAllAvailable()
    ms.addData(Event(2, new Timestamp(100000), 8, "signup", 0.0))
    q.processAllAvailable()
    ms.addData(Event(3, new Timestamp(200000), 9, "signup", 0.0))
    q.processAllAvailable() // watermark -> 200s: user 7's timer fires, state removed
    // a view for user 7 after eviction must NOT advance (state restarted),
    // so no new emission for user 7 appears
    ms.addData(Event(4, new Timestamp(210000), 7, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("funnelev").where($"user_id" === 7)
    assert(emitted.count() == 1, "evicted user must not advance from forgotten state")
    assert(emitted.select(max($"reached")).head.getInt(0) == 1)
    // state-store assertion: user 7's row is physically gone
    val stateKeys = spark.read.format("statestore").load(ckpt)
      .select("key.*").collect().map(_.getLong(0)).toSet
    assert(!stateKeys.contains(7L), s"user 7 still in state store: $stateKeys")
    assert(stateKeys.contains(8L) && stateKeys.contains(9L))
  }

  test("stream-static join: streaming events enrich against a static dim") {
    val dir = eventsDir()
    val schema = spark.read.parquet(dir).schema
    val dim = Seq(("signup", 5.0), ("view", 1.0), ("purchase", 10.0),
      ("click", 0.5), ("error", 0.0)).toDF("event_type", "weight")
    val enriched = Streaming.eventsStream(spark, dir, schema)
      .join(dim, "event_type") // static side broadcast per micro-batch
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), max($"weight").as("w"))
    val q = enriched.writeStream.outputMode("complete").format("memory")
      .queryName("enriched").option("checkpointLocation",
        SparkFixture.tmpDir("graft-ck-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("enriched")
    val batch = spark.read.parquet(dir).join(dim, "event_type")
      .groupBy($"event_type").agg(count(lit(1)).as("bn"))
    val j = got.join(batch, Seq("event_type"))
    assert(j.count() > 0)
    assert(j.where($"n" =!= $"bn").count() == 0)
  }

  test("correlateStreams: stream-stream interval join equals batch join") {
    val dir = eventsDir()
    val schema = spark.read.parquet(dir).schema
    val mkLead = (df: org.apache.spark.sql.DataFrame) =>
      df.where($"event_type" === "click")
    val mkFollow = (df: org.apache.spark.sql.DataFrame) =>
      df.where($"event_type" === "purchase")
    val streamed = Streaming.correlateStreams(
      mkLead(Streaming.eventsStream(spark, dir, schema)),
      mkFollow(Streaming.eventsStream(spark, dir, schema)),
      keyCol = "user_id", tsCol = "ts", within = "1 hour")
    val q = streamed.writeStream.outputMode("append").format("memory")
      .queryName("corr_stream").option("checkpointLocation",
        SparkFixture.tmpDir("graft-ck3-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("corr_stream")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      .toSet
    val ev = spark.read.parquet(dir)
    val batch = mkLead(ev).select($"user_id".as("k"), $"ts".as("lead_ts"))
      .join(mkFollow(ev).select($"user_id".as("fk"), $"ts".as("follow_ts")),
        $"k" === $"fk" && $"follow_ts" >= $"lead_ts" &&
          $"follow_ts" <= $"lead_ts" + expr("INTERVAL 1 hour"))
      .select($"k", $"lead_ts", $"follow_ts")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      .toSet
    assert(batch.nonEmpty, "fixture must contain click->purchase pairs")
    assert(got == batch)
  }

  test("dedupStream drops duplicate keys within the watermark, state bounded") {
    val dir = SparkFixture.tmpDir("graft-dd-").toString
    val base = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .limit(100)
    // plant duplicates: every event twice
    base.unionByName(base).coalesce(1).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val deduped = Streaming.dedupStream(
      Streaming.eventsStream(spark, dir, schema), Seq("event_id"), "ts")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream").option("checkpointLocation",
        SparkFixture.tmpDir("graft-ck2-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("dedup_stream")
    assert(got.count() == 100, "each duplicated event must survive exactly once")
    assert(got.select("event_id").distinct().count() == 100)
  }

  test("sessionize closes gap-separated sessions via state timeout") {
    val events = Seq(
      Event(1, new Timestamp(1000), 7, "click", 1.0),
      Event(2, new Timestamp(3000), 7, "click", 1.0),
      Event(3, new Timestamp(1000), 8, "view", 1.0)).toDS()
    // batch Datasets can't run flatMapGroupsWithState with timeouts; use a
    // memory stream to drive it
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    ms.addData(events.collect().toSeq: _*)
    val sessions = Streaming.sessionize(ms.toDS(), gapMs = 100)
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sessions").option("checkpointLocation",
        SparkFixture.tmpDir("graft-ck2-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
      .start()
    // first batch ingests events; later empty batches fire the timeout
    val deadline = System.currentTimeMillis() + 60000
    while (spark.table("sessions").count() < 2 && System.currentTimeMillis() < deadline) {
      Thread.sleep(200)
    }
    q.stop()
    val got = spark.table("sessions").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(got(7L) == ((2L, 2000L))) // 2 events, 2s span
    assert(got(8L)._1 == 1L)
  }

  test("emaStream: single batch equals the sequential recurrence exactly") {
    val events = Seq(
      Event(1, new Timestamp(1000), 1, "view", 10.0),
      Event(2, new Timestamp(2000), 1, "view", 20.0),
      Event(3, new Timestamp(3000), 1, "view", 30.0),
      Event(4, new Timestamp(1000), 2, "view", 5.0),
      Event(5, new Timestamp(4000), 2, "view", -7.5))
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    val q = Streaming.emaStream(ms.toDS(), m = 1)
      .writeStream.outputMode("update").format("memory")
      .queryName("ema1b").option("checkpointLocation",
        SparkFixture.tmpDir("graft-ck-").toString).start()
    ms.addData(events: _*); q.processAllAvailable(); q.stop()
    val got = spark.table("ema1b").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def seqEma(xs: Seq[Double]): Long =
      math.round(xs.tail.foldLeft(xs.head)((e, x) => 0.5 * x + 0.5 * e) * 1e6)
    assert(got(1L) == ((3L, seqEma(Seq(10.0, 20.0, 30.0)))))
    assert(got(2L) == ((2L, seqEma(Seq(5.0, -7.5)))))
    // and within n micro-units of the batch closed form
    val batch = graft.analytics.Ema.dyadicEmaFinal(events.toDF(),
      Seq("user_id"), "ts", "event_id", "value", m = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(math.abs(got(1L)._2 - batch(1L)) <= 3)
    assert(math.abs(got(2L)._2 - batch(2L)) <= 2)
  }

  test("emaStream across time-ordered batches equals the one-batch run") {
    val b1 = Seq(Event(1, new Timestamp(1000), 1, "view", 10.0),
      Event(2, new Timestamp(2000), 1, "view", 20.0))
    val b2 = Seq(Event(3, new Timestamp(9000), 1, "view", 30.0),
      Event(4, new Timestamp(9500), 1, "view", 40.0))
    def run(batches: Seq[Seq[Event]], name: String): Map[Long, (Long, Long)] = {
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
      val q = Streaming.emaStream(ms.toDS(), m = 2)
        .writeStream.outputMode("update").format("memory")
        .queryName(name).option("checkpointLocation",
          SparkFixture.tmpDir("graft-ck-").toString).start()
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect()
        .groupBy(_.getLong(0)).map { case (u, rs) =>
          val last = rs.maxBy(_.getLong(1))
          u -> ((last.getLong(1), last.getLong(2)))
        }
    }
    assert(run(Seq(b1, b2), "ema2b") == run(Seq(b1 ++ b2), "emaall"))
  }

  test("emaStream evicts idle keys; a post-eviction event restarts the EMA") {
    val ckpt = SparkFixture.tmpDir("graft-ck-").toString
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    val q = Streaming.emaStream(ms.toDS(), m = 1,
      watermark = "0 seconds", idleGapMs = 150000L)
      .writeStream.outputMode("update").format("memory")
      .queryName("emaev").option("checkpointLocation", ckpt).start()
    ms.addData(Event(1, new Timestamp(1000), 7, "view", 100.0))
    q.processAllAvailable()
    ms.addData(Event(2, new Timestamp(200000), 8, "view", 1.0))
    q.processAllAvailable() // watermark 200s > 7's horizon 151s: evicted
    ms.addData(Event(3, new Timestamp(210000), 7, "view", 50.0))
    q.processAllAvailable()
    q.stop()
    val u7 = spark.table("emaev").where($"user_id" === 7)
      .orderBy($"last_ts_micros").collect()
    // restart: second emission has n_events == 1 and ema == 50, not a
    // continuation of the forgotten 100-seeded state
    assert(u7.length == 2)
    assert(u7(1).getLong(1) == 1L && u7(1).getLong(2) == 50000000L)
  }

  test("windowedDistinctStream: bounded-state sketch equals batch per window") {
    val dir = eventsDir()
    val schema = spark.read.parquet(dir).schema
    val q = Streaming.windowedDistinctStream(
      Streaming.eventsStream(spark, dir, schema), "ts", $"user_id",
      windowLen = "1 hour", k = 16)
      .writeStream.outputMode("append").format("memory")
      .queryName("wdist").option("checkpointLocation",
        SparkFixture.tmpDir("graft-ck5-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("wdist")
      .select($"window.start", $"n_kept", $"kth_hash", $"est")
      .collect().map(r => r.getTimestamp(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // batch reference: the deterministic sketch over the same windows
    val batch = graft.analytics.Kmv.estimateFromSketch(
      spark.read.parquet(dir)
        .select(window($"ts", "1 hour").as("w"),
          graft.analytics.Kmv.hash52($"user_id").as("__hv"))
        .groupBy("w").agg(graft.analytics.Kmv.sketchUdaf(16)($"__hv").as("__sk")),
      "__sk", 16)
      .select($"w.start", $"n_kept", $"kth_hash", $"est")
      .collect().map(r => r.getTimestamp(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.nonEmpty)
    // append mode withholds the trailing windows still inside the
    // watermark; every CLOSED window must match the batch sketch exactly,
    // and only trailing windows may be missing
    got.foreach { case (w, v) =>
      assert(batch(w) == v, s"window $w diverged from batch") }
    val missing = batch.keySet -- got.keySet
    val closedMax = got.keys.max((a: java.sql.Timestamp, b: java.sql.Timestamp)
      => a.compareTo(b))
    assert(missing.forall(_.after(closedMax)),
      s"non-trailing windows missing: $missing")
  }

  test("windowedCmsStream: per-batch counter addition equals the batch " +
      "sketch; screen+verify equals HeavyHitters.frequentItems per window") {
    val dir = eventsDir()
    val schema = spark.read.parquet(dir).schema
    // Complete mode: every window's final grid is emitted (the sketch is
    // the incremental sum of all batches — CMS linearity)
    val got = Streaming.runToMemory(
      Streaming.windowedCmsStream(
        Streaming.eventsStream(spark, dir, schema), "ts", $"user_id",
        "1 hour", "2 hours", depth = 4, width = 64),
      "wcms", org.apache.spark.sql.streaming.OutputMode.Complete())
      .select($"window.start".as("ws"), $"j", $"bucket", $"cnt")
    val batchEvents = spark.read.parquet(dir)
    val batch = batchEvents.where($"user_id".isNotNull)
      .select(window($"ts", "1 hour").as("window"),
        posexplode(array((0 until 4).map(j =>
          graft.analytics.Cms.bucket($"user_id", j, 64)): _*))
          .as(Seq("j", "bucket")))
      .groupBy($"window", $"j", $"bucket").agg(count(lit(1)).as("cnt"))
      .select($"window.start".as("ws"), $"j", $"bucket", $"cnt")
    assert(got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "stream sketch must equal the batch sketch cell-for-cell")

    // heavy-hitter screen: one-sided CMS error -> per-window SUPERSET of
    // the exact >=1/8-share keys; exact verify of the survivors == the
    // exact answer (HeavyHitters.frequentItems, per window)
    val sketch = Streaming.runToMemory(
      Streaming.windowedCmsStream(
        Streaming.eventsStream(spark, dir, schema), "ts", $"user_id",
        "1 hour", "2 hours", depth = 4, width = 64),
      "wcms2", org.apache.spark.sql.streaming.OutputMode.Complete())
    val screened = graft.analytics.Cms.windowedHeavyHitters(
      sketch, batchEvents.select($"user_id"), "user_id", denom = 8,
      depth = 4, width = 64)
      .select($"window.start".as("ws"), $"key", $"n", $"est")
    val windows = batchEvents.select(window($"ts", "1 hour")("start").as("ws"))
      .distinct().collect().map(_.getTimestamp(0))
    windows.foreach { w =>
      val perWin = batchEvents
        .where(window($"ts", "1 hour")("start") === w && $"user_id".isNotNull)
      val exact = graft.operators.HeavyHitters
        .frequentItems(perWin, "user_id", 1.0 / 8)
        .collect().map(r => r.getString(0).toLong -> r.getLong(1)).toMap
      val cand = screened.where($"ws" === w)
        .collect().map(_.getLong(1)).toSet
      assert(exact.keySet.subsetOf(cand),
        s"window $w: screen must be a superset of the exact heavy hitters")
      // exact verify of the screened candidates recovers exactly the
      // frequentItems answer (false positives die on their true count)
      val n = perWin.count()
      val verified = perWin.groupBy($"user_id")
        .agg(count(lit(1)).as("cnt"))
        .where($"user_id".isInCollection(cand) &&
          $"cnt" >= math.ceil(n / 8.0).toLong)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(verified == exact, s"window $w: verify(screen) != exact")
    }
  }

  test("maintainCountSumStream: streamed rollup equals batch recompute") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-stlh2-").toString)
    val b1 = Seq(Event(1, new Timestamp(1000), 1, "view", 10.0),
      Event(2, new Timestamp(2000), 2, "view", 2.5),
      Event(3, new Timestamp(3000), 1, "view", -4.0))
    val b2 = Seq(Event(4, new Timestamp(9000), 1, "view", 1.0),
      Event(5, new Timestamp(9500), 3, "view", 7.0))
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    val q = Streaming.maintainCountSumStream(ms.toDF(), lh, "rollup",
      Seq("user_id"), "value",
      SparkFixture.tmpDir("graft-ck4-").toString,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    ms.addData(b1: _*); q.processAllAvailable()
    val mid = lh.catalog.loadTable("rollup").read().collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(mid == Map(1L -> ((2L, 6000000L)), 2L -> ((1L, 2500000L))))
    ms.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val fin = lh.catalog.loadTable("rollup").read().collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val batch = graft.analytics.IncrementalAgg.countSumState(
      (b1 ++ b2).toDF(), Seq("user_id"), "value")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(fin == batch)
    // each micro-batch is a snapshot: the rollup time-travels
    assert(lh.catalog.loadTable("rollup").snapshots.size >= 2)
  }

  test("at-least-once replay of a batch id is a no-op (idempotent fold)") {
    // foreachBatch replays a batch after a crash between the table commit
    // and the checkpoint offset commit; the snapshot-summary batch-id
    // watermark must make the second delivery a no-op.
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-stlh3-").toString)
    val b0 = Seq(Event(1, new Timestamp(1000), 1, "view", 10.0),
      Event(2, new Timestamp(2000), 2, "view", 2.5)).toDF()
    val b1 = Seq(Event(3, new Timestamp(3000), 1, "view", -4.0)).toDF()
    val fold = Streaming.foldCountSumBatch(lh, "rollup_r", Seq("user_id"), "value") _
    fold(b0, 0L)
    fold(b1, 1L)
    val before = lh.catalog.loadTable("rollup_r").read().collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val snapsBefore = lh.catalog.loadTable("rollup_r").snapshots.size
    fold(b1, 1L) // replay: must not double-fold
    fold(b0, 0L) // stale replay: must not fold either
    val after = lh.catalog.loadTable("rollup_r").read().collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(after == before)
    assert(lh.catalog.loadTable("rollup_r").snapshots.size == snapsBefore)
    // a NEW batch id still folds
    fold(Seq(Event(4, new Timestamp(4000), 3, "view", 1.0)).toDF(), 2L)
    assert(lh.catalog.loadTable("rollup_r").read().count() == 3)

    // same contract for the append sink
    val app = Streaming.appendBatch(lh, "events_r") _
    app(b0, 0L); app(b1, 1L)
    app(b1, 1L); app(b0, 0L) // replays: no duplicate rows
    assert(lh.catalog.loadTable("events_r").read().count() == 3)
  }

  test("fresh checkpoint (new query id) restarts batch ids without data loss") {
    // Batch ids restart at 0 when the checkpoint is wiped/migrated; the
    // idempotency watermark is scoped by streaming query id so the new
    // incarnation's batches APPLY instead of being skipped until its ids
    // pass the stale watermark (silent data loss).
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-stlh4-").toString)
    val b0 = Seq(Event(1, new Timestamp(1000), 1, "view", 10.0),
      Event(2, new Timestamp(2000), 2, "view", 2.5)).toDF()
    val b1 = Seq(Event(3, new Timestamp(3000), 1, "view", -4.0)).toDF()
    val sc = spark.sparkContext
    val app = Streaming.appendBatch(lh, "events_q") _
    def n() = lh.catalog.loadTable("events_q").read().count()
    sc.setLocalProperty("sql.streaming.queryId", "query-A")
    try {
      app(b0, 0L); app(b1, 1L)
      assert(n() == 3)
      app(b1, 1L) // replay inside query A: no-op
      assert(n() == 3)
      // checkpoint wiped -> Spark assigns a NEW query id, ids restart at 0
      sc.setLocalProperty("sql.streaming.queryId", "query-B")
      app(b0, 0L) // stale watermark (A, 1) must NOT swallow (B, 0)
      assert(n() == 5)
      app(b0, 0L) // replay inside query B: no-op again
      assert(n() == 5)
    } finally sc.setLocalProperty("sql.streaming.queryId", null)
  }

  test("malformed batch-id stamp is treated as absent, not fatal") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-stlh5-").toString)
    val b0 = Seq(Event(1, new Timestamp(1000), 1, "view", 10.0)).toDF()
    lh.catalog.createTable("events_m", b0.schema, Nil, Map.empty)
    // simulate a hand-edited/foreign stamp that does not parse as Long
    lh.catalog.loadTable("events_m")
      .append(b0, Map(Streaming.BatchIdKey -> "not-a-number"))
    assert(!Streaming.batchAlreadyApplied(lh, "events_m", None, 0L))
    Streaming.appendBatch(lh, "events_m")(b0, 0L) // must not throw
    assert(lh.catalog.loadTable("events_m").read().count() == 2)
  }

  test("foreachBatch sink commits micro-batches as IceLite snapshots") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-stlh-").toString)
    val dir = eventsDir()
    val schema = spark.read.parquet(dir).schema
    val q = Streaming.writeToTable(
      Streaming.eventsStream(spark, dir, schema), lh, "events_sink",
      SparkFixture.tmpDir("graft-ck3-").toString)
    q.awaitTermination(60000)
    val tbl = lh.catalog.loadTable("events_sink")
    assert(tbl.read().count() == 200)
    assert(tbl.snapshots.nonEmpty)
    assert(tbl.meta.properties("graft.streaming") == "true")
  }
}
