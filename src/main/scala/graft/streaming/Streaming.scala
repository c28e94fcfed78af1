package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger
import graft.workflow.WorkflowModel

/** Structured Streaming layer (SURVEY §2.9). The reference only has
  * stateless DStream micro-batch scoring
  * (readers/.../StreamingReader.scala:40-54,
  * core/.../OpWorkflowRunner.scala:232-263 — foreachRDD + score + save);
  * we re-express it on Structured Streaming and add the event-time
  * machinery the reference lacks: watermarks + windowed aggregation,
  * the streaming analog of the batch cutoff aggregations (§2.3).
  *
  * Scale notes: file-source streams list + split work across executors
  * exactly like batch scans; windowed aggregation state is partitioned
  * by (key, window) across executors and pruned by the watermark, so
  * state size is bounded by (#active keys × windows inside the
  * watermark), not by stream length.
  */
object Streaming {

  /** Open events as a file-source stream with a proper event-time column.
    * File streams require a directory: point at the sf dir and glob the
    * one table (new matching files would be picked up incrementally).
    *
    * File streams need an explicit schema; we take it from the batch
    * footer (one bounded driver-side metadata read) so the stream stays
    * in lockstep with whatever timestamp encoding the data carries —
    * TIMESTAMP(NANOS) arrives as Long under
    * spark.sql.legacy.parquet.nanosAsLong and is converted to a micros
    * timestamp exactly like [[graft.sources.Tables.events]]; a plain
    * TIMESTAMP column passes through. A schema drifting between the
    * batch and stream paths silently shifts every watermark/window, so
    * deriving one from the other is a correctness contract, not a
    * convenience. */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val s = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    if (schema("ts").dataType == LongType)
      s.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else s
  }

  /** Watermarked tumbling-window aggregation over an event stream:
    * per (window, event_type) count + sum. Late data beyond `lateness`
    * is dropped and its state reclaimed. */
  def windowedAgg(stream: DataFrame, windowLen: String, lateness: String): DataFrame =
    stream
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Event-time sessionization: per-user sessions closed by `gap` of
    * inactivity, via `session_window` — the same expression works over
    * a watermarked stream (merging windows as events arrive) and a
    * batch frame; the oracle replays the batch form with
    * gaps-and-islands SQL. Session end = last event + gap, and an event
    * landing EXACTLY at last + gap still merges (verified empirically —
    * so the oracle splits only on strictly-greater gaps). One shuffle
    * keyed on user_id; decimal sum for an order-independent total. */
  def sessionize(events: DataFrame, gap: String): DataFrame =
    events.groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Streaming heavy-hitter CANDIDATES per tumbling window: the same
    * Misra-Gries aggregator the batch path uses
    * ([[graft.aggregators.Sketches]]) dropped into a watermarked window
    * aggregation — a mergeable sketch is streaming-compatible by
    * construction: per-window state is ONE bounded buffer (<= k
    * counters) regardless of stream length, merge order never breaks
    * the superset guarantee, and the watermark reclaims each window's
    * sketch. Emits (window_start, item, lower_bound); any item with
    * in-window frequency >= 1/(k+1) is guaranteed present. Candidate
    * counts are merge-order-dependent — pair with an exact recount for
    * a deterministic final answer (the q132 sketch-then-verify shape). */
  def windowedHeavyHitters(stream: DataFrame, item: org.apache.spark.sql.Column,
                           windowLen: String, lateness: String, k: Int): DataFrame = {
    val agg = udaf(new graft.aggregators.Sketches.MisraGriesAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[String]())
    stream.withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen))
      .agg(agg(item.cast("string")).as("__mg"))
      .select(col("window.start").as("window_start"),
        explode(col("__mg")).as(Seq("item", "lower_bound")))
  }

  /** Stream-static enrichment join: attach dimension attributes to a
    * stream before aggregating. Stateless (the static side is re-read
    * per micro-batch, no state store involved) and broadcast by
    * construction — at 100 TB/day of events the per-batch cost is the
    * dim broadcast, never a stream shuffle; for dims too big to
    * broadcast, pre-bucket the dim on the join key instead
    * (sources/Bucketing) so the stream side alone shuffles. */
  def enrichStream(stream: DataFrame, dim: DataFrame,
                   joinExpr: org.apache.spark.sql.Column): DataFrame =
    stream.join(broadcast(dim), joinExpr)

  /** Run a streaming aggregation to completion over the (finite) file
    * source and return the result as a batch DataFrame — Trigger
    * .AvailableNow processes everything then stops, giving batch
    * semantics through the streaming engine. */
  /** `shufflePartitions`: stateful streaming cost is dominated by state
    * stores — one per shuffle partition per stateful operator, each
    * paying checkpoint/commit I/O every batch. A stream-stream join at
    * the session default (= cores) opens 4x that many stores; capping
    * the stream's partitions (restored after the run) cuts the constant
    * cost without touching results. On a real cluster size this to the
    * stream's key cardinality, not the batch default. */
  private val confLock = new Object
  def runToCompletion(spark: SparkSession, agg: DataFrame, name: String,
                      outputMode: String = "complete",
                      shufflePartitions: Option[Int] = None): DataFrame = {
    // serialized: concurrent runs would interleave the set/restore of the
    // session-wide shuffle-partition conf and leak the override
    confLock.synchronized {
      // per-run conf overrides, all restored in the finally:
      // - shuffle partitions (state-store count, see scaladoc above)
      // - minBatchesToRetain: the default keeps 100 checkpoint versions
      //   per store; a finite AvailableNow run needs only the last
      //   couple, and every retained version is snapshot/cleanup I/O on
      //   the commit path
      val overrides: Seq[(String, String)] =
        shufflePartitions.map(n => "spark.sql.shuffle.partitions" -> n.toString).toSeq ++
          Seq("spark.sql.streaming.minBatchesToRetain" -> "2")
      val prevs = overrides.map { case (k, _) => k -> spark.conf.getOption(k) }
      overrides.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val q = agg.writeStream
          .format("memory").queryName(name)
          .outputMode(outputMode)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      } finally {
        prevs.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
        // the run is complete: unload every loaded state-store provider
        // and stop the 60 s maintenance pool. Left alive, each completed
        // query's providers keep running periodic maintenance (against
        // an already-deleted temp checkpoint) for the JVM's lifetime —
        // in a resident multi-query driver that background churn taxes
        // whatever runs next. The pool restarts lazily on the next
        // stateful stream.
        org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      }
      spark.table(name)
    }
  }

  /** Streaming exact dedup — the streaming face of the batch dedup
    * pipeline (operators/Dedup.exact): emit the first row per dedup key,
    * with per-key state reclaimed once the watermark passes
    * (dropDuplicatesWithinWatermark), so state is bounded by the keys
    * seen inside the lateness horizon, not by stream length. Project
    * the dedup keys afterwards for a deterministic result (WHICH
    * duplicate arrives first is ingestion-order-dependent; the key set
    * is not). */
  def dedupStream(stream: DataFrame, keys: Seq[String], tsCol: String,
                  lateness: String): DataFrame =
    stream.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming near-duplicate suppression — the streaming face of the
    * batch MinHash pipeline: a document whose full MinHash SIGNATURE
    * matches an earlier document's inside the watermark horizon is
    * dropped. Signature equality is the high-precision corner of
    * near-dup (identical signature ≈ very high Jaccard); band-level OR
    * matching would need a second stateful operator (explode bands →
    * dedup → re-aggregate survival) and stays with the batch pipeline.
    * State: one row per distinct signature seen within the lateness
    * horizon, reclaimed by the watermark.
    *
    * The signature builds across three projections so each intermediate
    * (shingles, then their md5 hashes) is referenced twice in its
    * consumer — CollapseProject then cannot re-inline the md5 pass into
    * the per-slot lambda (the documented no-CSE-across-lambdas trap,
    * which would multiply the md5 cost numHashes-fold). */
  def nearDupSuppressStream(stream: DataFrame, textCol: String, tsCol: String,
                            k: Int, numHashes: Int, lateness: String): DataFrame = {
    import graft.operators.Dedup
    val keep = stream.columns.map(col)
    val p = lit(Dedup.MinHashP)
    stream
      .withColumn("__sh", Dedup.wordShinglesOf(
        graft.functions.TextAnalysis.tokens(col(textCol)), k))
      .select(keep :+ when(size(col("__sh")) >= 0,
        transform(col("__sh"), s => graft.functions.TextAnalysis.hash60(s) % p))
        .as("__hmod"): _*)
      // docs with fewer than k tokens have no shingles and thus no
      // signal — fall back to exact-text identity instead of letting
      // them all collapse onto the empty signature
      .select(keep :+ when(size(col("__hmod")) > 0,
        concat_ws(",", Dedup.minHashSignatureFromHashes(col("__hmod"), numHashes)))
        .otherwise(concat(lit("raw:"), col(textCol)))
        .as("__sig"): _*)
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(Seq("__sig"))
      .drop("__sig")
  }

  /** Per-key running state (beyond the reference, which has no stateful
    * streaming): event count + decimal-exact value sum + last event time
    * per user, maintained with flatMapGroupsWithState. State is
    * partitioned by key across executors. When `idleTimeout` is set
    * (e.g. "30 minutes"), keys idle past it are dropped — state is then
    * bounded by ACTIVE keys; with None it grows with total distinct keys
    * (fine for bounded key domains, not for unbounded ones). */
  case class UserState(userId: Long, n: Long, sumValueCents: Long, lastTsMicros: Long)
  def runningUserState(spark: SparkSession, stream: DataFrame,
                       idleTimeout: Option[String] = None)
      : org.apache.spark.sql.Dataset[UserState] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    stream.select(col("user_id").as[Long],
        (col("value") * 100).cast("long").as[Long],
        unix_micros(col("ts")).as[Long])
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserState, UserState](OutputMode.Update(), timeoutConf) {
        (key, rows, state) =>
          if (state.hasTimedOut) { // idle past the timeout: reclaim
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserState(key, 0L, 0L, Long.MinValue))
            val next = rows.foldLeft(prev) { case (s, (_, cents, ts)) =>
              UserState(key, s.n + 1, s.sumValueCents + cents, math.max(s.lastTsMicros, ts))
            }
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator.single(next)
          }
      }
  }

  /** CDC (change-data-capture) APPLY over a keyed changelog stream:
    * each event is an upsert or a delete for its key (here: event_type
    * "view" = delete, anything else upserts the event's value), applied
    * in (ts, event_id) order; the emitted update rows converge to
    * last-op-wins per key — exactly the MERGE a warehouse applies when
    * replaying a Debezium/binlog feed, expressed as bounded per-key
    * state (ONE tuple: the latest op seen). Batch equivalence: key
    * present iff its latest op is an upsert, value = that op's value —
    * the SQL the oracle replays. Deletes must keep a TOMBSTONE (not
    * state.remove()): dropping state would resurrect the key if a
    * LATER batch carries an out-of-order earlier upsert. */
  case class CdcState(userId: Long, tsMicros: Long, eventId: Long,
                      deleted: Boolean, value: Double)
  def cdcApply(spark: SparkSession, stream: DataFrame)
      : org.apache.spark.sql.Dataset[CdcState] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    // coalesce: the value column is nullable, and a primitive-Double
    // decode would throw on the first null-valued changelog row
    stream.select(col("user_id").as[Long], unix_micros(col("ts")).as[Long],
        col("event_id").as[Long], (col("event_type") === "view").as[Boolean],
        coalesce(col("value"), lit(0.0)).as[Double])
      .as[(Long, Long, Long, Boolean, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CdcState, CdcState](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) { (key, rows, state) =>
        val prev = state.getOption
        // apply this batch's ops for the key in changelog order; keep
        // the op with the max (ts, event_id) — last-op-wins
        val next = rows.foldLeft(prev) { case (acc, (_, ts, eid, isDel, v)) =>
          val cand = CdcState(key, ts, eid, isDel, if (isDel) 0.0 else v)
          acc match {
            case Some(s) if s.tsMicros > ts ||
              (s.tsMicros == ts && s.eventId >= eid) => acc
            case _ => Some(cand)
          }
        }
        next.foreach(state.update)
        next.iterator
      }
  }

  /** Per-key event-TRANSITION extraction over a stream (the streaming
    * feed for a Markov/behavior model): every consecutive
    * (current -> next) state pair per user, in (ts, event_id) order.
    * State per key is ONE tuple — the key's last-seen event — so memory
    * is bounded by active keys; each micro-batch's rows for a key are
    * sorted in memory before folding (per-key-per-batch bounded, the
    * same contract as the batch sequence assembly), and the saved last
    * event stitches transitions across batch boundaries. Late events
    * that sort before the saved state are a stream-ordering reality;
    * bound them upstream with a watermark + sorted replay if exactness
    * across disordered batches matters. */
  case class LastEvent(userId: Long, tsMicros: Long, eventId: Long, etype: String)
  case class Transition(userId: Long, cur: String, nxt: String)
  def transitionStream(spark: SparkSession, stream: DataFrame)
      : org.apache.spark.sql.Dataset[Transition] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    stream.select(col("user_id").as[Long], unix_micros(col("ts")).as[Long],
        col("event_id").as[Long], col("event_type").as[String])
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) { (key, rows, state) =>
        val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
        val initial = state.getOption
        val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
        var last = initial
        sorted.foreach { case (_, ts, eid, et) =>
          last.foreach(prev => out += Transition(key, prev.etype, et))
          last = Some(LastEvent(key, ts, eid, et))
        }
        last.foreach(state.update)
        out.iterator
      }
  }

  /** Stream-stream event-time interval join (beyond the reference —
    * stateless DStream scoring was its ceiling): views matched to the
    * same user's purchases within `window` after the view. Both sides
    * carry watermarks, so join state on each side is bounded by the
    * watermark horizon + window, not by stream length; the join itself
    * is hash-partitioned on user_id across executors. */
  def viewPurchaseJoin(spark: SparkSession, dir: String,
                       window: String, lateness: String): DataFrame = {
    val views = eventStream(spark, dir).where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
      .withWatermark("view_ts", lateness)
    val purchases = eventStream(spark, dir).where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      .withWatermark("p_ts", lateness)
    views.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("view_ts") &&
          col("p_ts") <= col("view_ts") + expr(s"INTERVAL $window"))
      .select(col("user_id"), col("view_id"), col("p_id"))
  }

  /** LEFT OUTER stream-stream interval join: every view, with its
    * in-window purchase when one exists and NULL when the watermark
    * has proven none can arrive. Outer stream-stream joins are the
    * watermark machinery's hardest contract: the null-padded row for
    * an unmatched left row is emitted only once the watermark passes
    * the end of that row's join window (otherwise a late match could
    * still arrive), and rows whose window the final watermark never
    * passes are HELD in state when a finite run terminates — the
    * oracle replays exactly that semantics analytically (q521's probed
    * pattern). */
  def viewPurchaseLeftJoin(spark: SparkSession, dir: String,
                           window: String, lateness: String): DataFrame = {
    val views = eventStream(spark, dir).where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
      .withWatermark("view_ts", lateness)
    val purchases = eventStream(spark, dir).where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      .withWatermark("p_ts", lateness)
    views.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("view_ts") &&
          col("p_ts") <= col("view_ts") + expr(s"INTERVAL $window"),
        "leftOuter")
      .select(col("user_id"), col("view_id"), col("p_id"))
  }

  /** Micro-batch model scoring (reference streamingScore,
    * OpWorkflowRunner.scala:232-263): score each micro-batch with a
    * fitted workflow model and hand it to a sink callback (parquet
    * writer, Kafka producer, …). Empty batches are skipped like the
    * reference does. */
  def scoreStream(
      stream: DataFrame, model: WorkflowModel, keep: Seq[String],
      checkpoint: String)(sink: (DataFrame, Long) => Unit) =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) sink(model.score(batch, keep), id)
      }
      .start()
}
