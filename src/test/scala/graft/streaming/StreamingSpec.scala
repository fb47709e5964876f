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
