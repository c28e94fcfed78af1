package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time sessionization and rolling-window features — the
  * per-entity temporal feature family a training-data pipeline derives
  * from raw event logs (the reference builds these by hand from its
  * aggregated readers; here they are first-class window operators).
  *
  * Scale: both operators are ONE shuffle on the entity key followed by
  * window functions over that partitioning — no self-joins, no
  * per-entity driver work. Entities are assumed numerous (user-grained),
  * so the hash partitioning spreads; a single pathological entity is a
  * skew problem to salt upstream ([[Skew]]), not a reason to change the
  * plan shape.
  */
object TimeSeries {

  /** Gap-based sessionization: within an entity's timeline (ordered by
    * event time, tiebroken by `order` for determinism) a new session
    * starts whenever the gap to the previous event exceeds
    * `gapSeconds`. Emits the input plus `session_idx` — the entity's
    * 1-based running session number; (entity, session_idx) is the
    * session key.
    *
    * Both windows (the lag and the running sum) share one partitioning
    * and sort, so Catalyst plans a single Exchange + Sort. */
  def sessionize(df: DataFrame, entity: Column, ts: Column, order: Column,
                 gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val w = Window.partitionBy(entity).orderBy(unix_micros(ts), order)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(unix_micros(ts), 1).over(w)
    val isNew = when(
      prev.isNull || unix_micros(ts) - prev > gapSeconds * 1000000L, 1).otherwise(0)
    df.withColumn("session_idx", sum(isNew).over(run))
  }

  /** Per-session summary: event count, first/last event time, duration
    * seconds, and the value sum — one groupBy over the session key. */
  def sessionSummary(df: DataFrame, entity: Column, ts: Column, order: Column,
                     value: Column, gapSeconds: Long): DataFrame =
    sessionize(df, entity, ts, order, gapSeconds)
      .groupBy(entity.as("entity"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(ts).as("t_start"), max(ts).as("t_end"),
        ((unix_micros(max(ts)) - unix_micros(min(ts))) / 1e6).as("duration_sec"),
        round(sum(value), 6).as("sum_value"))

  /** Pairwise co-occurrence lift between item types across entities
    * (market-basket association): for each unordered type pair,
    * support = P(both in one entity's set), lift = support /
    * (P(a)·P(b)). Entities' distinct item sets self-join on the entity
    * key (each entity contributes O(|set|²) pairs — bounded by the type
    * domain, not the event count), marginals broadcast. */
  def cooccurrenceLift(df: DataFrame, entity: Column, item: Column): DataFrame = {
    val sets = df.select(entity.as("e"), item.as("i")).distinct()
    val nEnt = sets.select(col("e")).distinct().agg(count(lit(1)).as("n_entities"))
    val marg = sets.groupBy(col("i")).agg(count(lit(1)).as("cnt"))
    val pairs = sets.as("x").join(sets.as("y"), "e")
      .where(col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("item_a"), col("y.i").as("item_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(marg.select(col("i").as("item_a"), col("cnt").as("n_a"))), "item_a")
      .join(broadcast(marg.select(col("i").as("item_b"), col("cnt").as("n_b"))), "item_b")
      .crossJoin(broadcast(nEnt))
      .select(col("item_a"), col("item_b"), col("n_both"),
        round(col("n_both") / col("n_entities"), 6).as("support"),
        round((col("n_both") * col("n_entities")).cast("double") /
          (col("n_a") * col("n_b")), 6).as("lift"))
  }

  /** Rolling z-score anomaly flags per entity: an event is anomalous
    * when its value leaves mean ± k·stddev of the TRAILING window
    * (current event excluded — an outlier must not mask itself).
    * Same single entity-partitioned Exchange as [[rollingStats]];
    * windows with fewer than `minPoints` priors never flag (a z-score
    * against two points is noise). */
  def rollingAnomalies(df: DataFrame, entity: Column, ts: Column, order: Column,
                       value: Column, windowSeconds: Long, k: Double = 3.0,
                       minPoints: Int = 5): DataFrame = {
    val byTime = Window.partitionBy(col("entity")).orderBy(col("__tus"))
      .rangeBetween(-windowSeconds * 1000000L, -1)
    val src = df.select(order.as("id"), entity.as("entity"),
      unix_micros(ts).as("__tus"), value.as("value"))
    src.select(col("id"), col("entity"), col("value"),
        count(col("value")).over(byTime).as("n_prior"),
        avg(col("value")).over(byTime).as("mu"),
        stddev_samp(col("value")).over(byTime).as("sigma"))
      .select(col("id"), col("entity"), col("value"), col("n_prior"),
        round(col("mu"), 6).as("mu"),
        when(col("n_prior") >= minPoints && col("sigma") > 0,
          when(abs(col("value") - col("mu")) > lit(k) * col("sigma"), 1).otherwise(0))
          .otherwise(0).as("is_anomaly"))
  }

  /** Ordered funnel per entity: the earliest time each stage is reached
    * STRICTLY AFTER the previous stage (first `stages.head`, then the
    * first `stages(1)` after it, and so on). Emits one row per entity
    * that entered the funnel: `t_1..t_k` (event-time micros, null once
    * the chain breaks) and `reached` = deepest stage index.
    *
    * The whole cascade is k stacked whole-partition window minima over
    * ONE entity partitioning — a single Exchange, no joins; stage i+1's
    * condition reads stage i's window result inside the same frame. */
  def funnel(df: DataFrame, entity: Column, ts: Column, stage: Column,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(col("entity"))
    val tus = unix_micros(ts)
    val staged = stages.zipWithIndex.foldLeft(
      df.select(entity.as("entity"), tus.as("__t"), stage.as("__s"))) {
      case (acc, (st, i)) =>
        val cond =
          if (i == 0) col("__s") === st
          else col("__s") === st && col("__t") > col(s"t_$i")
        acc.withColumn(s"t_${i + 1}", min(when(cond, col("__t"))).over(w))
    }
    val aggs = stages.indices.map(i => first(col(s"t_${i + 1}")).as(s"t_${i + 1}"))
    staged.groupBy(col("entity"))
      .agg(aggs.head, aggs.tail: _*)
      .where(col("t_1").isNotNull)
      .withColumn("reached",
        stages.indices.map(i => when(col(s"t_${i + 1}").isNotNull, 1).otherwise(0))
          .reduce(_ + _))
  }

  /** Rolling event-time features per entity: over the trailing
    * `windowSeconds` (RANGE frame on event-time micros, inclusive of
    * the current event) — event count, value sum and mean; plus the
    * previous event's value and the seconds elapsed since it (lag
    * features). One Exchange; the range and row windows share the
    * entity partitioning and time sort. */
  def rollingStats(df: DataFrame, entity: Column, ts: Column, order: Column,
                   value: Column, windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be positive, got $windowSeconds")
    val byTime = Window.partitionBy(entity).orderBy(unix_micros(ts))
    val trailing = byTime.rangeBetween(-windowSeconds * 1000000L, 0)
    val byRow = Window.partitionBy(entity).orderBy(unix_micros(ts), order)
    df.select(order.as("id"), entity.as("entity"), ts.as("ts"),
        count(lit(1)).over(trailing).as("n_trail"),
        round(sum(value).over(trailing), 6).as("sum_trail"),
        round(avg(value).over(trailing), 6).as("avg_trail"),
        lag(value, 1).over(byRow).as("prev_value"),
        round((unix_micros(ts) - lag(unix_micros(ts), 1).over(byRow)) / 1e6, 6)
          .as("secs_since_prev"))
  }
}
