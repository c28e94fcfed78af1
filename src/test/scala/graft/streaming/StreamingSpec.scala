package graft.streaming

import graft.SparkSpec
import graft.workflow._
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  val sfDir = "/root/testdata/sf0.001"

  test("streaming Misra-Gries candidates cover every true in-window heavy hitter") {
    val k = 50
    val cands = Streaming.runToCompletion(
      spark,
      Streaming.windowedHeavyHitters(Streaming.eventStream(spark, sfDir),
        col("user_id"), "1 day", "1 day", k),
      "stream_spec_hh")
      .select(col("window_start"), col("item"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1))).toSet
    // truth: items with frequency > n/(k+1) within their window
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(date_trunc("day", col("ts")).as("w"), col("user_id").cast("string").as("item"))
    val truth = ev.groupBy(col("w")).agg(count(lit(1)).as("n"))
      .join(ev.groupBy(col("w"), col("item")).agg(count(lit(1)).as("c")), "w")
      .where(col("c") > col("n") / (k + 1))
      .select(col("w"), col("item"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1))).toSet
    assert(truth.nonEmpty && truth.subsetOf(cands))
  }

  test("windowed aggregation over a file stream equals the batch answer") {
    val streamed = Streaming.runToCompletion(
      spark,
      Streaming.windowedAgg(Streaming.eventStream(spark, sfDir), "1 day", "1 day"),
      "stream_spec_agg")
    val batch = graft.sources.Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("foreachBatch scores micro-batches with a fitted workflow model") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val value = Feature.raw("value", FeatureKind.RealK)
    val stage = ColumnStage("double", Seq(value), "value_x2", FeatureKind.RealK)(c => c.head * 2)
    val model = new Workflow(stage.outputFeatures).fit(events)

    val scored = new java.util.concurrent.atomic.AtomicLong(0)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val q = Streaming.scoreStream(
      Streaming.eventStream(spark, sfDir), model, keep = Seq("event_id"), ckpt) {
      (batch, _) => scored.addAndGet(batch.count())
    }
    q.awaitTermination()
    assert(scored.get() == events.count())
  }

  test("sessionize over a watermarked stream equals the batch answer") {
    val streamed = Streaming.runToCompletion(
      spark,
      Streaming.sessionize(
        Streaming.eventStream(spark, sfDir).withWatermark("ts", "1 day"), "8 hours"),
      "stream_spec_sessions", shufflePartitions = Some(8))
    val batch = Streaming.sessionize(
      graft.sources.Tables.events(spark, sfDir), "8 hours")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("nearDupSuppressStream drops later docs with identical minhash signature") {
    val s = spark; import s.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, String)]
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    // doc 2 has the same shingle SET as doc 1 (same word 3-grams in a
    // cycle); doc 3 is different; doc 4 is a tiny doc (< k tokens)
    mem.addData(
      (1L, t(0), "alpha beta gamma delta"),
      (2L, t(1), "alpha beta gamma delta"),
      (3L, t(2), "one two three four"),
      (4L, t(3), "tiny"), (5L, t(4), "tiny"), (6L, t(5), "other"))
    val deduped = Streaming.nearDupSuppressStream(
      mem.toDF.toDF("doc_id", "ts", "text"), "text", "ts",
      k = 3, numHashes = 8, lateness = "1 hour")
    val out = Streaming.runToCompletion(s, deduped.select("doc_id"),
      "stream_spec_neardup", outputMode = "append", shufflePartitions = Some(4))
    assert(out.collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L, 6L))
  }

  test("sessionize merges events within the gap and splits across it") {
    val s = spark; import s.implicits._
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    // user 1: events at 0, 20, 70 min (gap 30m splits 20->70);
    // user 2: one event — singleton session
    val events = Seq(
      (1L, t(0), 1.0), (1L, t(20), 2.0), (1L, t(70), 4.0),
      (2L, t(5), 8.0)).toDF("user_id", "ts", "value")
    val out = graft.streaming.Streaming.sessionize(events, "30 minutes")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(out == Set(
      (1L, t(0), t(50), 2L, 3.0),   // [0, 20] closes at 20+30
      (1L, t(70), t(100), 1L, 4.0),
      (2L, t(5), t(35), 1L, 8.0)))
  }

  test("cdcApply: last-op-wins, tombstones survive out-of-order upserts across batches") {
    val s = spark; import s.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    // batch 1: key 1 upsert then DELETE (ts 10); key 2 upsert
    mem.addData(
      (1L, t(0), 100L, "purchase", 5.0),
      (1L, t(10), 101L, "view", 0.0),
      (2L, t(0), 102L, "purchase", 7.0))
    // batch 2: a LATE upsert for key 1 (ts 5 < the delete at ts 10) must
    // NOT resurrect the key; key 2 gets a newer upsert that wins
    mem.addData(
      (1L, t(5), 103L, "purchase", 9.0),
      (2L, t(20), 104L, "purchase", 11.0))
    val ds = Streaming.cdcApply(s,
      mem.toDF.toDF("user_id", "ts", "event_id", "event_type", "value"))
    val q = ds.toDF().writeStream.format("memory").queryName("cdc_spec")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // update sink appends one row per key per batch that touched it;
    // the LAST row per key is the converged state
    val finalState = s.table("cdc_spec")
      .collect().zipWithIndex
      .groupBy(_._1.getLong(0))
      .map { case (k, rows) => k -> rows.maxBy(_._2)._1 }
    assert(finalState(1L).getBoolean(3), "late upsert resurrected a tombstoned key")
    assert(!finalState(2L).getBoolean(3) && finalState(2L).getDouble(4) == 11.0)
    assert(finalState(2L).getLong(2) == 104L)
  }
}
