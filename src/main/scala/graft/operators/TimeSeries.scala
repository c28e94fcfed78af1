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

  /** Retention cohort grid — the product-analytics staple: entities
    * cohort by their FIRST active period (day or week), and each
    * (cohort, period-offset) cell counts how many of the cohort were
    * active then, plus the retention ratio. Three hash aggregations on
    * entity/cohort keys (distinct activity, cohort assignment, cell
    * counts) and one broadcast-sized join of cohort sizes — no windows,
    * no self-join of the raw events. Emits (cohort, period_idx,
    * n_active, n_cohort, retention); period_idx 0 is the cohort period
    * itself (retention 1.0 by construction). */
  def retentionCohorts(df: DataFrame, entity: Column, ts: Column,
                       granularity: String = "week"): DataFrame = {
    val periodDays = granularity match {
      case "day" => 1
      case "week" => 7
      case other => throw new IllegalArgumentException(
        s"granularity must be day|week, got $other")
    }
    val act = df.select(entity.as("e"), date_trunc(granularity, ts).as("p"))
      .distinct()
    val coh = act.groupBy(col("e")).agg(min(col("p")).as("cohort"))
    val sizes = coh.groupBy(col("cohort")).agg(count(lit(1)).as("n_cohort"))
    act.join(coh, "e")
      .groupBy(col("cohort"),
        (datediff(col("p"), col("cohort")) / periodDays).cast("int").as("period_idx"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort")
      .select(col("cohort"), col("period_idx"), col("n_active"), col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort"), 6).as("retention"))
  }

  /** Top user journeys: gap-sessionize, assemble each session's first
    * `maxLen` items in event order (the cap enforced pre-shuffle by
    * [[assembleSequences]]'s bounded TopK), then count identical paths
    * and keep the `k` most frequent (ties to the lexicographically
    * smaller path). The global top-k also runs through the bounded
    * aggregator — path cardinality can approach session cardinality,
    * and a single-partition ORDER BY over it is the trap. Emits
    * (path, n_sessions, rank). */
  def topPaths(df: DataFrame, entity: Column, ts: Column, order: Column,
               item: Column, gapSeconds: Long, maxLen: Int, k: Int): DataFrame = {
    val sess = sessionize(df.select(entity.as("e"), ts.as("ts"),
      order.as("ord"), item.as("item")), col("e"), col("ts"), col("ord"), gapSeconds)
    val seqs = assembleSequences(sess,
      concat_ws(":", col("e"), col("session_idx")), col("ts"), col("ord"),
      col("item"), maxLen, sep = ">")
    val counts = seqs.groupBy(col("seq"))
      .agg(count(lit(1)).cast("double").as("n"))
      .withColumn("__g", lit(1))
    graft.aggregators.TopK.topKPerKeyStr(counts, "__g", "seq", "n", k,
        descending = true)
      .select(col("seq").as("path"), col("n").cast("long").as("n_sessions"),
        col("rank"))
  }

  /** Gaps-and-islands: collapse each key's distinct active DAYS into
    * maximal consecutive-day STREAK intervals (the retention/habit
    * metric "longest run of daily activity"). The classic anchor trick,
    * distributed: day − row_number(day) is constant exactly within a
    * consecutive run, so one per-key window + one hash agg on (key,
    * anchor) emits every island — no self-joins, no iteration. Emits
    * (key, streak_start, streak_end, streak_len, streak_idx) with
    * islands numbered in time order per key. */
  def streaks(df: DataFrame, key: Column, day: Column): DataFrame = {
    val days = df.select(key.as("k"), day.cast("date").as("d")).distinct()
    val w = Window.partitionBy(col("k")).orderBy(col("d"))
    val isl = days
      .withColumn("anchor", date_sub(col("d"), row_number().over(w)))
      .groupBy(col("k"), col("anchor"))
      .agg(min(col("d")).as("streak_start"), max(col("d")).as("streak_end"),
        count(lit(1)).as("streak_len"))
    val wi = Window.partitionBy(col("k")).orderBy(col("streak_start"))
    isl.withColumn("streak_idx", row_number().over(wi))
      .drop("anchor")
  }

  /** Date-spine gap filling: densify each key's daily series over its
    * own [min, max] day range, zero-filling missing days (the
    * sparse-to-dense step every rolling/seasonal operator upstream
    * assumes). The spine generates ROW-LOCALLY per key
    * (sequence + explode — no join against a global calendar table) and
    * left-joins the actuals back on (key, day); spine size is bounded
    * by keys × time domain, not row count. Emits (key, day, value,
    * is_filled). */
  def fillDailyGaps(df: DataFrame, key: Column, day: Column,
                    value: Column): DataFrame = {
    val actual = df.select(key.as("k"), day.cast("date").as("d"),
      value.as("v"))
    val spine = actual.groupBy(col("k"))
      .agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select(col("k"),
        explode(sequence(col("lo"), col("hi"),
          expr("interval 1 day"))).as("d"))
    spine.join(actual, Seq("k", "d"), "left")
      .select(col("k"), col("d"),
        coalesce(col("v"), lit(0.0)).as("value"),
        when(col("v").isNull, 1).otherwise(0).as("is_filled"))
  }

  /** LOCF (last-observation-carried-forward) densification: the same
    * per-key [min, max] date spine as [[fillDailyGaps]], but gaps carry
    * the latest preceding observation instead of zero — the stateful
    * imputation a point-in-time feature store needs (yesterday's price
    * stands until a new tick). One per-key ordered window with an
    * ignore-nulls last(); the spine starts at each key's first
    * observation, so the carried value is never null. */
  def fillForward(df: DataFrame, key: Column, day: Column,
                  value: Column): DataFrame = {
    val actual = df.select(key.as("k"), day.cast("date").as("d"),
      value.as("v"))
    val spine = actual.groupBy(col("k"))
      .agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select(col("k"),
        explode(sequence(col("lo"), col("hi"),
          expr("interval 1 day"))).as("d"))
    val w = Window.partitionBy(col("k")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(actual, Seq("k", "d"), "left")
      .select(col("k"), col("d"),
        last(col("v"), ignoreNulls = true).over(w).as("value"),
        when(col("v").isNull, 1).otherwise(0).as("is_filled"))
  }

  /** Mann-Kendall trend test per series: S = Σ_{i<j} sign(y_j − y_i)
    * over the time-ordered values and Kendall's tau = S / (n(n−1)/2) —
    * the nonparametric "is this metric trending" answer that needs no
    * linearity or normality (the robust companion to the OLS trend).
    *
    * Per-series values collect into ONE row-local array (bounded by the
    * TIME DOMAIN — a daily series is ~365·years long regardless of row
    * count, the same bound the ACF/backtest operators document) and the
    * O(n²) pair scan runs inside a codegen'd nested fold — integer S,
    * no cross-row float folds, so the gate hashes. */
  def mannKendall(df: DataFrame, key: Column, order: Column,
                  value: Column): DataFrame = {
    val arr = df
      .select(key.as("k"),
        struct(order.as("o"), value.cast("double").as("y")).as("st"))
      .groupBy(col("k"))
      .agg(transform(sort_array(collect_list(col("st"))),
        x => x.getField("y")).as("ys"))
    arr.select(col("k"), size(col("ys")).as("n"),
        // guard n < 2: sequence(0, -1) would count DOWN, not empty
        when(size(col("ys")) >= 2, expr(
          """aggregate(sequence(0, size(ys) - 2), 0L, (acc, i) ->
               acc + aggregate(sequence(i + 1, size(ys) - 1), 0L, (a, j) ->
                 a + cast(signum(ys[j] - ys[i]) as long)))"""))
          .otherwise(0L).as("s"))
      .withColumn("tau", round(col("s").cast("double") /
        (col("n").cast("double") * (col("n").cast("double") - 1) / 2.0), 6))
  }

  /** Point-in-time (as-of) join — the feature-store correctness
    * primitive: each left row (id, key, ts) picks up the value of the
    * LATEST right row with the same key and right-ts <= ts (inclusive,
    * so a feature stamped at the query instant is visible). Implemented
    * as the union-and-window plan, not an inequality join: both sides
    * are tagged, unioned, and scanned once under a single (key)-keyed
    * window ordered by (ts, side, value) — right rows sort before left
    * rows at equal ts, and `last(value, ignoreNulls)` carries the most
    * recent right value forward. ONE shuffle on the key, O(1) state per
    * row, no theta-join explosion — at 100 TB an inequality range join
    * on (key, ts) is the classic plan-killer this shape replaces.
    * Among right duplicates at the same (key, ts) the greatest value
    * wins (value is the final sort column) — deterministic, and the
    * oracle replays it. Left rows with no prior right row get null.
    * Emits (id, key, ts, asof). */
  def asOfJoin(left: DataFrame, lId: Column, lKey: Column, lTs: Column,
               right: DataFrame, rKey: Column, rTs: Column,
               rVal: Column): DataFrame = {
    val idType = left.select(lId.as("id")).schema("id").dataType
    val vType = right.select(rVal.as("v")).schema("v").dataType
    val r = right.select(lit(null).cast(idType).as("id"), rKey.as("k"),
      rTs.as("ts"), lit(0).as("side"), rVal.as("v"))
    val l = left.select(lId.as("id"), lKey.as("k"), lTs.as("ts"),
      lit(1).as("side"), lit(null).cast(vType).as("v"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("ts"), col("side"), col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("asof", last(col("v"), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(col("id"), col("k"), col("ts"), col("asof"))
  }

  /** [[asOfJoin]] with a DIRECTION and a staleness TOLERANCE — the full
    * pandas-merge_asof surface (sensor alignment wants "next reading
    * within 5 min", feature stores want "latest feature, but never
    * older than a day"). Same union-and-window plan (one shuffle, O(1)
    * state per row, no inequality-join explosion): the right row's
    * (ts, value) rides a struct through `last(_, ignoreNulls)`, and the
    * tolerance is a post-filter on the carried timestamp. Forward = the
    * backward scan under (ts DESC) ordering; at equal ts the right row
    * is still visible to the left row (inclusive), and among right
    * duplicates at one (key, ts) the greatest value wins — backward's
    * exact conventions, mirrored. Emits (id, k, ts, asof, asof_lag_sec)
    * with both null when no right row lands inside the tolerance. */
  def asOfJoinDirected(left: DataFrame, lId: Column, lKey: Column, lTs: Column,
                       right: DataFrame, rKey: Column, rTs: Column,
                       rVal: Column, forward: Boolean,
                       toleranceSec: Long): DataFrame = {
    require(toleranceSec >= 0, s"toleranceSec must be >= 0: $toleranceSec")
    val idType = left.select(lId.as("id")).schema("id").dataType
    val vType = right.select(rVal.as("v")).schema("v").dataType
    val r = right.select(lit(null).cast(idType).as("id"), rKey.as("k"),
      rTs.as("ts"), lit(0).as("side"), rVal.as("v"))
    val l = left.select(lId.as("id"), lKey.as("k"), lTs.as("ts"),
      lit(1).as("side"), lit(null).cast(vType).as("v"))
    val ord =
      if (forward) Seq(col("ts").desc, col("side").asc, col("v").asc)
      else Seq(col("ts").asc, col("side").asc, col("v").asc)
    val w = Window.partitionBy(col("k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = when(col("side") === 0,
      struct(col("ts").as("rts"), col("v").as("rv")))
    val lag = abs(col("ts").cast("long") - col("c.rts").cast("long"))
    r.unionByName(l)
      .withColumn("c", last(carried, ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(col("id"), col("k"), col("ts"),
        when(col("c").isNotNull && lag <= toleranceSec, col("c.rv"))
          .as("asof"),
        when(col("c").isNotNull && lag <= toleranceSec, lag)
          .as("asof_lag_sec"))
  }

  /** SCD type-2 snapshot build from a keyed changelog: per key, rows
    * ordered by (ts, `order`) collapse into validity intervals — a row
    * opens an interval iff its tracked value differs from the previous
    * row's (or it is the key's first), `valid_to` is the next OPENING
    * row's ts (null while current). The dimension-table construction
    * every warehouse derives from a change stream. One shuffle on the
    * key; two window passes (change detection, then lead) share the
    * same partitioning and sort, so Catalyst plans a single Exchange.
    * Emits (key, value, valid_from, valid_to, is_current). */
  def scd2(changes: DataFrame, key: Column, ts: Column, order: Column,
           value: Column): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("ts"), col("ord"))
    val opened = changes
      .select(key.as("k"), ts.as("ts"), order.as("ord"), value.as("value"))
      .withColumn("__prev", lag(col("value"), 1).over(w))
      .where(col("__prev").isNull || !(col("__prev") <=> col("value")))
    val w2 = Window.partitionBy(col("k")).orderBy(col("ts"), col("ord"))
    opened
      .withColumn("valid_to", lead(col("ts"), 1).over(w2))
      .select(col("k"), col("value"), col("ts").as("valid_from"),
        col("valid_to"),
        when(col("valid_to").isNull, 1).otherwise(0).as("is_current"))
  }

  /** Expanding-window backtest folds — the time-series cross-validation
    * harness (never shuffle-split a time series): the last
    * nFolds·horizon days tile into consecutive test windows; fold f
    * trains on everything up to its window and tests on the window.
    * Emits per (key, fold) the boundary, train/test row counts, and
    * exact train/test means — the frame a forecast evaluator joins
    * predictions against. One small per-key boundary frame exploded
    * nFolds ways and joined back; never a per-fold pass over the data. */
  def backtestFolds(daily: DataFrame, key: Column, day: Column, y: Column,
                    nFolds: Int, horizonDays: Int): DataFrame = {
    require(nFolds >= 1 && horizonDays >= 1,
      s"bad backtest shape: $nFolds folds x $horizonDays days")
    val base = daily.select(key.as("k"), day.as("d"),
      y.cast("decimal(18,6)").as("y"))
    val bounds = base.groupBy(col("k")).agg(max(col("d")).as("maxd"))
      .select(col("k"), col("maxd"),
        explode(sequence(lit(1), lit(nFolds))).as("fold"))
      .select(col("k"), col("fold"),
        date_sub(col("maxd"),
          (lit(nFolds) - col("fold") + 1) * horizonDays).as("train_end"),
        date_sub(col("maxd"),
          (lit(nFolds) - col("fold")) * horizonDays).as("test_end"))
    base.join(broadcast(bounds), "k")
      .groupBy(col("k"), col("fold"), col("train_end"))
      .agg(
        sum(when(col("d") <= col("train_end"), 1L).otherwise(0L)).as("n_train"),
        sum(when(col("d") > col("train_end") && col("d") <= col("test_end"), 1L)
          .otherwise(0L)).as("n_test"),
        (sum(when(col("d") <= col("train_end"), col("y"))).cast("double") /
          sum(when(col("d") <= col("train_end"), 1L).otherwise(0L))
            .cast("double")).as("train_mean"),
        (sum(when(col("d") > col("train_end") && col("d") <= col("test_end"),
          col("y"))).cast("double") /
          sum(when(col("d") > col("train_end") && col("d") <= col("test_end"), 1L)
            .otherwise(0L)).cast("double")).as("test_mean"))
      .select(col("k"), col("fold"), col("train_end"),
        col("n_train"), col("n_test"),
        round(col("train_mean"), 6).as("train_mean"),
        round(col("test_mean"), 6).as("test_mean"))
  }

  /** Engagement scorecard over gap-sessionized traffic: per entity
    * segment (or globally with a constant segment), session count,
    * bounce rate (1-event sessions), exact mean/median session dwell
    * seconds, and events per session — the product-analytics rollup a
    * warehouse derives nightly. One sessionize pass (single Exchange on
    * the entity), one session-grain aggregation, one segment-grain
    * aggregation; medians via the same exact interpolated percentile
    * the oracle replays with quantile_cont. */
  def sessionEngagement(df: DataFrame, entity: Column, ts: Column,
                        order: Column, segment: Column,
                        gapSeconds: Long): DataFrame = {
    val sess = sessionize(
      df.select(entity.as("e"), ts.as("ts"), order.as("ord"), segment.as("seg")),
      col("e"), col("ts"), col("ord"), gapSeconds)
    val perSession = sess.groupBy(col("seg"), col("e"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .as("dwell_us"))
    perSession.groupBy(col("seg"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"),
        sum(col("n_events")).as("n_events"),
        sum(col("dwell_us")).as("dwell_us_total"),
        percentile(col("dwell_us"), lit(0.5)).as("dwell_us_median"))
      .select(col("seg"), col("n_sessions"),
        round(col("n_bounces").cast("double") / col("n_sessions"), 6)
          .as("bounce_rate"),
        round(col("n_events").cast("double") / col("n_sessions"), 6)
          .as("events_per_session"),
        round(col("dwell_us_total").cast("double") /
          col("n_sessions").cast("double") / 1e6, 6).as("mean_dwell_sec"),
        round(col("dwell_us_median") / 1e6, 6).as("median_dwell_sec"))
  }

  /** Inter-arrival burstiness per series: rate (events/sec over the
    * observed span), mean/CV of inter-event gaps, and the
    * Goh-Barabási burstiness score B = (σ−μ)/(σ+μ) ∈ [−1, 1]
    * (−1 periodic, 0 Poisson, → 1 bursty). Gaps from one lag pass;
    * moments from exact integer-microsecond sums in DECIMAL, so the
    * doubles the closed forms run on replay exactly. */
  def interEventStats(df: DataFrame, key: Column, ts: Column,
                      order: Column): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("tus"), col("ord"))
    val gaps = df.select(key.as("k"), unix_micros(ts).as("tus"), order.as("ord"))
      .withColumn("gap", col("tus") - lag(col("tus"), 1).over(w))
      .where(col("gap").isNotNull)
    gaps.groupBy(col("k"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap").cast("decimal(38,0)")).cast("double").as("sg"),
        sum((col("gap").cast("decimal(19,0)") * col("gap").cast("decimal(19,0)")))
          .cast("double").as("sgg"))
      .select(col("k"), col("n_gaps"),
        round(col("n_gaps").cast("double") / (col("sg") / 1e6), 6)
          .as("rate_per_sec"),
        round(col("sg") / col("n_gaps").cast("double") / 1e6, 6)
          .as("mean_gap_sec"),
        round(
          sqrt(col("sgg") / col("n_gaps").cast("double") -
            (col("sg") / col("n_gaps").cast("double")) *
            (col("sg") / col("n_gaps").cast("double"))) /
          (col("sg") / col("n_gaps").cast("double")), 6).as("cv"),
        round(
          (sqrt(col("sgg") / col("n_gaps").cast("double") -
            (col("sg") / col("n_gaps").cast("double")) *
            (col("sg") / col("n_gaps").cast("double"))) -
            col("sg") / col("n_gaps").cast("double")) /
          (sqrt(col("sgg") / col("n_gaps").cast("double") -
            (col("sg") / col("n_gaps").cast("double")) *
            (col("sg") / col("n_gaps").cast("double"))) +
            col("sg") / col("n_gaps").cast("double")), 6).as("burstiness"))
  }

  /** Point-in-time (PIT) lookup against a stored SCD2 dimension: each
    * fact row picks the dimension interval covering its timestamp
    * (valid_from <= ts < valid_to, open-ended current rows match
    * everything after valid_from). The feature-store join that
    * prevents label leakage — a fact must see the dim state AS OF its
    * own time, never the current one. Plan shape: ONE equi-join on the
    * key with the interval predicate as a residual condition (never a
    * range/theta join) — per-key interval lists are small (bounded by
    * that key's change count), so the residual scan is per-key-local;
    * intervals partition time, so cardinality is preserved (<= 1 match
    * per fact; facts before the first interval keep a null state). */
  def scd2Lookup(facts: DataFrame, factId: Column, factKey: Column,
                 factTs: Column, dim: DataFrame): DataFrame = {
    val f = facts.select(factId.as("id"), factKey.as("k"), factTs.as("ts"))
    val d = dim.select(col("k").as("__dk"), col("value").as("state"),
      col("valid_from"), col("valid_to"))
    f.join(d,
        col("k") === col("__dk") && col("valid_from") <= col("ts") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")),
        "left")
      .select(col("id"), col("k"), col("ts"), col("state"),
        col("valid_from").as("state_since"))
  }

  /** Per-key two-regressor ordinary least squares with intercept
    * (y ~ b0 + b1·x1 + b2·x2): the multivariate extension of
    * [[trendPerSeries]]. One hash aggregation of the nine exact
    * DECIMAL sufficient statistics, then the 3x3 normal equations
    * solved in closed form (Cramer) on the aggregate row — no per-key
    * fit loop, no matrix library, scale-free in series count, and
    * bit-replayable since every double derives from an exact sum. */
  def trend2PerSeries(df: DataFrame, key: Column, x1: Column, x2: Column,
                      y: Column): DataFrame = {
    // INTEGER regressors (epoch day / flags — the trendPerSeries
    // contract) at scale 0 and y at scale 6 keep every product at
    // scale <= 6, so the exact decimal sums stay under 2^53 unscaled
    // and BOTH engines' decimal->double casts are exact (a scale-12
    // product sum tripped a double-rounding in the replaying engine);
    // 19+19 = 38 also keeps the products inside the 38-digit cap.
    val x1d = x1.cast("long").cast("decimal(19,0)")
    val x2d = x2.cast("long").cast("decimal(19,0)")
    val yd = y.cast("decimal(19,6)")
    val agg = df.where(x1.isNotNull && x2.isNotNull && y.isNotNull)
      .groupBy(key.as("key")).agg(
        count(lit(1)).as("n"),
        sum(x1d).cast("double").as("s1"),
        sum(x2d).cast("double").as("s2"),
        sum(yd).cast("double").as("sy"),
        sum(x1d * x1d).cast("double").as("s11"),
        sum(x2d * x2d).cast("double").as("s22"),
        sum(x1d * x2d).cast("double").as("s12"),
        sum(x1d * yd).cast("double").as("s1y"),
        sum(x2d * yd).cast("double").as("s2y"))
    // centered normal equations: [[a11 a12][a12 a22]]·[b1 b2] = [c1 c2]
    val n = col("n").cast("double")
    val a11 = col("s11") - col("s1") * col("s1") / n
    val a22 = col("s22") - col("s2") * col("s2") / n
    val a12 = col("s12") - col("s1") * col("s2") / n
    val c1 = col("s1y") - col("s1") * col("sy") / n
    val c2 = col("s2y") - col("s2") * col("sy") / n
    val det = a11 * a22 - a12 * a12
    val b1 = (c1 * a22 - c2 * a12) / det
    val b2 = (c2 * a11 - c1 * a12) / det
    val b0 = col("sy") / n - b1 * (col("s1") / n) - b2 * (col("s2") / n)
    agg.select(col("key"), col("n"),
      round(b0, 6).as("intercept"),
      round(b1, 6).as("beta1"),
      round(b2, 6).as("beta2"))
  }

  /** Ordered per-key sequence assembly (conversation/session building
    * for SFT-style training data): the FIRST `maxLen` items of each
    * key's timeline, ordered by (epoch-micros, event id), assembled
    * into one delimited string per key plus the key's total event
    * count.
    *
    * Scale: the cap is enforced BEFORE any per-key buffer exists — the
    * bounded [[graft.aggregators.TopK]] aggregator (ascending, keyed on
    * epoch-micros with the event id as tiebreak) forwards at most ~2k
    * candidates per mapper, so a key with millions of events costs the
    * shuffle maxLen rows, not its history; only then does the final
    * collect build the (<= maxLen)-element array. A plain
    * `collect_list` + sort would buffer unbounded timelines, and a
    * window row_number would sort them — both are the traps this shape
    * avoids. Epoch-micros (< 2^53) are exact as the TopK double score.
    * Emits (key, n_total, n_kept, seq). */
  def assembleSequences(df: DataFrame, key: Column, ts: Column,
                        eventId: Column, item: Column, maxLen: Int,
                        sep: String = "|"): DataFrame = {
    val base = df.select(key.as("k"), unix_micros(ts).cast("double").as("score"),
      eventId.as("eid"), item.as("item"))
    val kept = graft.aggregators.TopK.topKPerKey(
      base.select(col("k"), col("eid"), col("score")),
      "k", "eid", "score", maxLen, descending = false)
    val totals = base.groupBy(col("k")).agg(count(lit(1)).as("n_total"))
    kept
      .join(base.select(col("k"), col("eid"), col("item")), Seq("k", "eid"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("rank"), col("item")))),
            x => x.getField("item")), sep).as("seq"))
      .join(totals, "k")
      .select(col("k"), col("n_total"), col("n_kept"), col("seq"))
  }

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

  /** Window funnel (the ClickHouse `windowFunnel` shape): deepest
    * stage level reached where the whole chain fits inside
    * `windowMicros` of the entity's FIRST stage-1 event, each stage
    * strictly after the previous one. Deterministic by construction
    * (chained per-entity minima anchored at t₁ — no greedy re-anchor),
    * which is what makes it exactly SQL-replayable, unlike the
    * re-anchoring variants. Same single-Exchange chained-window shape
    * as [[funnel]]; emits (entity, level, t_first_us, duration_sec of
    * the deepest reached stage). Entities that never hit stage 1 are
    * absent (level-0 rows carry no information at 100 TB). */
  def windowFunnel(df: DataFrame, entity: Column, ts: Column, stage: Column,
                   stages: Seq[String], windowMicros: Long): DataFrame = {
    require(stages.size >= 2, "windowFunnel needs at least two stages")
    require(windowMicros > 0, s"window must be positive: $windowMicros")
    val w = Window.partitionBy(col("entity"))
    val tus = unix_micros(ts)
    val staged = stages.zipWithIndex.foldLeft(
      df.select(entity.as("entity"), tus.as("__t"), stage.as("__s"))) {
      case (acc, (st, i)) =>
        val cond =
          if (i == 0) col("__s") === st
          else col("__s") === st && col("__t") > col(s"t_$i") &&
            col("__t") <= col("t_1") + windowMicros
        acc.withColumn(s"t_${i + 1}", min(when(cond, col("__t"))).over(w))
    }
    val aggs = stages.indices.map(i => first(col(s"t_${i + 1}")).as(s"t_${i + 1}"))
    staged.groupBy(col("entity"))
      .agg(aggs.head, aggs.tail: _*)
      .where(col("t_1").isNotNull)
      .withColumn("level",
        stages.indices.map(i => when(col(s"t_${i + 1}").isNotNull, 1).otherwise(0))
          .reduce(_ + _))
      .select(col("entity"), col("level"), col("t_1").as("t_first_us"),
        round((coalesce(stages.indices.reverse.map(i => col(s"t_${i + 1}")): _*)
          - col("t_1")).cast("double") / 1e6, 6).as("duration_sec"))
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

  /** Exponential smoothing: the current EWMA level per series,
    * `l_t = (1-alpha)·l_{t-1} + alpha·x_t` folded left-to-right over the
    * series history (init `l_1 = x_1`). Inherently sequential per
    * series, embarrassingly parallel across series — each key's history
    * is assembled with ONE grouped sort (collect + array_sort inside
    * the aggregate, no window shuffle on top) and folded by a
    * sequential `aggregate`, so double rounding is order-stable and the
    * DuckDB oracle (`list_reduce` over the same ordered list) replays
    * it exactly. State per task = one series in memory; series length
    * is bounded by the key's history (cap upstream for unbounded keys
    * the way [[assembleSequences]] does). */
  def ewmaLevel(df: DataFrame, key: Column, ts: Column, order: Column,
                value: Column, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1]: $alpha")
    val seq = df.groupBy(key.as("key"))
      .agg(array_sort(collect_list(struct(ts.as("t"), order.as("o"),
        value.cast("double").as("x")))).as("arr"))
    seq.select(col("key"), size(col("arr")).as("n"),
      round(aggregate(
        expr("slice(arr, 2, size(arr) - 1)"),
        element_at(col("arr"), 1).getField("x"),
        (acc, e) => acc * lit(1.0 - alpha) + e.getField("x") * lit(alpha)), 6)
        .as("ewma"))
  }

  /** Kleinberg two-state burst detection per series: a Viterbi fold
    * over inter-arrival gaps with a base-rate state (r0 = 1/mean gap,
    * from exact integer sums) and a burst state (r1 = factor * r0),
    * exponential emission costs -ln r + r*g and an entry toll gamma.
    * The DP state (cost0, cost1, bursts-into-0, bursts-into-1) rides
    * the same struct-state `aggregate` fold as [[kalmanLevel]] —
    * burst-step counts travel WITH the best path, so no backtrack pass
    * is needed. Per-series -ln(r) constants quantize to
    * DECIMAL(18,12), after which every fold op is +,*,min on
    * engine-identical doubles — the oracle replays the full DP. */
  def kleinbergBursts(df: DataFrame, key: Column, ts: Column,
                      gamma: Double = 1.0,
                      burstFactor: Double = 2.0): DataFrame = {
    require(gamma > 0 && burstFactor > 1, s"bad params: $gamma $burstFactor")
    val w = Window.partitionBy(col("k")).orderBy(col("t"))
    val gaps = df.select(key.as("k"), ts.cast("long").as("t"))
      .withColumn("g", col("t") - lag(col("t"), 1).over(w))
      .where(col("g").isNotNull && col("g") > 0)
    val st = gaps.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("g")).as("sg"),
        array_sort(collect_list(struct(col("t"), col("g")))).as("arr"))
      .where(col("n") >= 2)
      .withColumn("r0", col("n").cast("double") / col("sg").cast("double"))
      .withColumn("r1", lit(burstFactor) * col("r0"))
      .withColumn("ln0", (-log(col("r0"))).cast("decimal(18,12)")
        .cast("double"))
      .withColumn("ln1", (-log(col("r1"))).cast("decimal(18,12)")
        .cast("double"))
    val folded = aggregate(
      col("arr"),
      struct(lit(0.0).as("c0"), lit(1e18).as("c1"),
        lit(0L).as("b0"), lit(0L).as("b1")),
      (acc, e) => {
        val g = e.getField("g").cast("double")
        val e0 = col("ln0") + col("r0") * g
        val e1 = col("ln1") + col("r1") * g
        val enter = acc.getField("c0") + lit(gamma)
        struct(
          (least(acc.getField("c0"), acc.getField("c1")) + e0).as("c0"),
          (least(enter, acc.getField("c1")) + e1).as("c1"),
          when(acc.getField("c0") <= acc.getField("c1"),
            acc.getField("b0")).otherwise(acc.getField("b1")).as("b0"),
          (when(enter <= acc.getField("c1"), acc.getField("b0"))
            .otherwise(acc.getField("b1")) + 1).as("b1"))
      })
    st.select(col("k").as("key"), col("n").as("n_gaps"),
      round(least(folded.getField("c0"), folded.getField("c1")), 6)
        .as("path_cost"),
      when(folded.getField("c0") <= folded.getField("c1"),
        folded.getField("b0")).otherwise(folded.getField("b1"))
        .as("n_burst_steps"))
  }

  /** Longest strictly-increasing subsequence length per series via the
    * patience (tails-array) fold: each value replaces the FIRST tail
    * >= it (the [[graft.operators.Layout.ffdBinPack]] first-fit
    * primitive) or extends the array — O(n * L) per series on pure
    * integers, sequential per series, parallel across series. The
    * LIS/n ratio is a robust "sortedness" score for a trajectory. */
  def lisLength(df: DataFrame, key: Column, order: Column,
                value: Column): DataFrame = {
    val seq = df.select(key.as("k"), order.as("o"),
        value.cast("long").as("v"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        array_sort(collect_list(struct(col("o"), col("v")))).as("arr"))
    val tails = aggregate(
      expr("slice(arr, 2, size(arr) - 1)"),
      array(element_at(col("arr"), 1).getField("v")),
      (acc, e) => {
        val x = e.getField("v")
        val pos = array_position(transform(acc, t => t >= x), true)
        when(pos > 0,
          transform(acc, (t, i) =>
            when(i.cast("long") === pos - 1, x).otherwise(t)))
          .otherwise(concat(acc, array(x)))
      })
    seq.select(col("k").as("key"), col("n"),
      size(tails).cast("long").as("lis_len"),
      round(size(tails).cast("double") / col("n").cast("double"), 6)
        .as("sortedness"))
  }

  /** 1-D Kalman level filter per series (random-walk state, noisy
    * observations): x' = x + K (z - x), p' = (1-K)(p+q) with the
    * time-varying gain K = (p+q)/(p+q+r). A genuinely sequential
    * recurrence no window prefix can express — folded with the same
    * grouped-sort + `aggregate` struct-state shape as
    * [[clampedBalance]] (sequential per series, parallel across
    * series). Pure +,*,/ double arithmetic in a fixed op order, so the
    * DuckDB oracle's list_reduce replays the trajectory bit-for-bit.
    * Initialized at x = first observation, p = 1. */
  def kalmanLevel(df: DataFrame, key: Column, order: Column, value: Column,
                  qVar: Double, rVar: Double): DataFrame = {
    require(qVar > 0 && rVar > 0, s"variances must be positive: $qVar $rVar")
    val seq = df.select(key.as("k"), order.as("o"),
        value.cast("double").as("z"))
      .groupBy(col("k"))
      .agg(array_sort(collect_list(struct(col("o"), col("z")))).as("arr"))
    val folded = aggregate(
      expr("slice(arr, 2, size(arr) - 1)"),
      struct(element_at(col("arr"), 1).getField("z").as("x"),
        lit(1.0).as("p")),
      (acc, e) => {
        val pq = acc.getField("p") + lit(qVar)
        val gain = pq / (pq + lit(rVar))
        struct(
          (acc.getField("x") + gain * (e.getField("z") - acc.getField("x")))
            .as("x"),
          ((lit(1.0) - gain) * pq).as("p"))
      })
    seq.select(col("k").as("key"), size(col("arr")).cast("long").as("n"),
      round(folded.getField("x"), 6).as("level"),
      round(folded.getField("p"), 6).as("p_var"),
      round((folded.getField("p") + lit(qVar)) /
        (folded.getField("p") + lit(qVar) + lit(rVar)), 6).as("gain_next"))
  }

  /** Dynamic-time-warping distance between two numeric arrays as a pure
    * Column expression: the full O(n·m) DP runs as a nested fold —
    * outer `aggregate` over `as` carrying the previous DP row, inner
    * `aggregate` over `bs` growing the current row — so warping
    * distance between bounded per-key series is row-local arithmetic
    * (parallel across pairs, no shuffle beyond building the pair
    * frame). Cost is L1; every cell is abs/`least`/+ on doubles in a
    * fixed order, so a DuckDB nested list_reduce replays the exact
    * bits. Intended for SERIES-length arrays (days, weeks — n·m cells
    * per row); for corpus-scale sequence matching use the LCS/LIS
    * kernels (q438) instead. */
  def dtw(as_ : Column, bs: Column): Column = {
    val inf = lit(1e18)
    val initRow = concat(array(lit(0.0)), transform(bs, _ => inf))
    val folded = aggregate(as_, initRow, (prev, a) =>
      aggregate(bs, array(inf), (cur, b) => {
        val j = size(cur)
        concat(cur, array(abs(a - b) +
          least(element_at(prev, j), element_at(prev, j + 1),
            element_at(cur, j))))
      }))
    element_at(folded, size(bs) + 1)
  }

  /** Page-Hinkley change-point detector per series: the sequential
    * cumulative-deviation test m_t = Σ_{i≤t} (x_i - x̄_i - δ) with x̄_i
    * the running mean, alarming at the first t where m_t - min_{i≤t}
    * m_i > λ. Same grouped-sort + sequential `aggregate` fold as
    * [[kalmanLevel]] — sequential per series, parallel across series,
    * never a global sort — and every update is an IEEE +/-/÷ chain on
    * exact inputs, so a list-state oracle replays it step-for-step.
    * Emits (key, n, m_end, min_m, alarm_idx, alarm_at); alarm_idx 0 =
    * never fired. The reference has no drift detector (its
    * SanityChecker is batch-only); this is the standard streaming
    * change test the q191 EWMA family feeds. */
  def pageHinkley(df: DataFrame, key: Column, order: Column, value: Column,
                  delta: Double, lambda: Double): DataFrame = {
    require(lambda > 0, s"lambda must be positive: $lambda")
    val seq = df.select(key.as("k"), order.as("o"),
        value.cast("double").as("x"))
      .groupBy(col("k"))
      .agg(array_sort(collect_list(struct(col("o"), col("x")))).as("arr"))
    val init = struct(lit(0.0).as("i"), lit(0.0).as("s"), lit(0.0).as("m"),
      lit(0.0).as("mn"), lit(0.0).as("al"))
    val folded = aggregate(
      expr("transform(arr, e -> e.x)"), init,
      (acc, x) => {
        val i = acc.getField("i") + lit(1.0)
        val sNew = acc.getField("s") + x
        val m = acc.getField("m") + (x - sNew / i - lit(delta))
        val mn = least(acc.getField("mn"), m)
        val al = when(acc.getField("al") === 0.0 && m - mn > lit(lambda), i)
          .otherwise(acc.getField("al"))
        struct(i.as("i"), sNew.as("s"), m.as("m"), mn.as("mn"), al.as("al"))
      })
    seq.select(col("k").as("key"), size(col("arr")).cast("long").as("n"),
      round(folded.getField("m"), 6).as("m_end"),
      round(folded.getField("mn"), 6).as("min_m"),
      folded.getField("al").cast("long").as("alarm_idx"),
      when(folded.getField("al") > 0,
        element_at(expr("transform(arr, e -> e.o)"),
          folded.getField("al").cast("int")))
        .as("alarm_at"))
  }

  /** Croston's method for intermittent demand (+ the Syntetos-Boylan
    * bias-corrected variant): per series, one EWMA over the NONZERO
    * demand sizes and one over the inter-demand intervals, folded in
    * period order with the same grouped-sort + sequential `aggregate`
    * shape as [[ewmaLevel]] — sequential per series, parallel across
    * series, never a global sort. Emits the demand level z, the mean
    * interval p, and the demand-rate forecasts z/p and (1-a/2)*z/p.
    * Series with fewer than two demand events are dropped (no interval
    * estimate exists). */
  def croston(df: DataFrame, key: Column, period: Column, demand: Column,
              alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1]: $alpha")
    val w = Window.partitionBy(col("k")).orderBy(col("p"))
    val base = df.select(key.as("k"), period.cast("long").as("p"),
        demand.cast("double").as("d"))
      .where(col("d") > 0)
      .withColumn("gap", col("p") - lag(col("p"), 1).over(w))
    val seq = base.groupBy(col("k"))
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(struct(col("p"), col("d")))).as("da"),
        // collect_list drops the null produced for the first event, so
        // ga holds the n-1 inter-demand gaps in period order
        array_sort(collect_list(when(col("gap").isNotNull,
          struct(col("p"), col("gap"))))).as("ga"))
      .where(col("n_events") >= 2)
    val a = lit(alpha)
    val b = lit(1.0 - alpha)
    val zf = aggregate(expr("slice(da, 2, size(da) - 1)"),
      element_at(col("da"), 1).getField("d"),
      (acc, e) => acc * b + e.getField("d") * a)
    val pf = aggregate(expr("slice(ga, 2, size(ga) - 1)"),
      element_at(col("ga"), 1).getField("gap").cast("double"),
      (acc, e) => acc * b + e.getField("gap").cast("double") * a)
    seq.select(col("k").as("key"), col("n_events"),
      round(zf, 6).as("z_level"), round(pf, 6).as("p_interval"),
      round(zf / pf, 6).as("croston_rate"),
      round(lit(1.0 - alpha / 2.0) * (zf / pf), 6).as("sba_rate"))
  }

  /** Two-piece segmented-trend fit per series: the single breakpoint
    * that minimizes total OLS SSE of independent left/right linear
    * fits. Every candidate split is scored from ONE pass of per-series
    * prefix sufficient statistics (DECIMAL(38,0) folds of integer
    * x/cents, so no overflow and no order sensitivity); right-segment
    * stats are total-minus-prefix, never a second scan. The argmin is
    * a per-series row_number over (sse, day) — both engines derive
    * identical SSE doubles from identical exact integers, so the pick
    * is engine-independent. Slopes are reported in value-units/day
    * (cents folded, /100 at readout). */
  def segmentedTrend(df: DataFrame, key: Column, day: Column,
                     valueCents: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.select(key.as("k"), day.as("day"),
      datediff(day, to_date(lit("1970-01-01"))).cast("long").as("x"),
      valueCents.cast("long").as("y"))
    val wp = Window.partitionBy(col("k")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wa = Window.partitionBy(col("k"))
    val pre = base
      .withColumn("nl", count(lit(1)).over(wp))
      .withColumn("sxl", sum(dec(col("x"))).over(wp))
      .withColumn("syl", sum(dec(col("y"))).over(wp))
      .withColumn("sxyl", sum(dec(col("x")) * col("y")).over(wp))
      .withColumn("sxxl", sum(dec(col("x")) * col("x")).over(wp))
      .withColumn("syyl", sum(dec(col("y")) * col("y")).over(wp))
      .withColumn("nt", count(lit(1)).over(wa))
      .withColumn("sxt", sum(dec(col("x"))).over(wa))
      .withColumn("syt", sum(dec(col("y"))).over(wa))
      .withColumn("sxyt", sum(dec(col("x")) * col("y")).over(wa))
      .withColumn("sxxt", sum(dec(col("x")) * col("x")).over(wa))
      .withColumn("syyt", sum(dec(col("y")) * col("y")).over(wa))
      .where(col("nl") >= 2 && col("nt") - col("nl") >= 2)
    def fit(n: Column, sx: Column, sy: Column, sxy: Column, sxx: Column,
            syy: Column): (Column, Column) = {
      val nd = n.cast("double")
      val sxd = sx.cast("double")
      val syd = sy.cast("double")
      val sxyc = sxy.cast("double") - sxd * syd / nd
      val sxxc = sxx.cast("double") - sxd * sxd / nd
      val syyc = syy.cast("double") - syd * syd / nd
      (sxyc / sxxc, syyc - sxyc * sxyc / sxxc)
    }
    val (sl, el) = fit(col("nl"), col("sxl"), col("syl"), col("sxyl"),
      col("sxxl"), col("syyl"))
    val (sr, er) = fit(col("nt") - col("nl"), col("sxt") - col("sxl"),
      col("syt") - col("syl"), col("sxyt") - col("sxyl"),
      col("sxxt") - col("sxxl"), col("syyt") - col("syyl"))
    val scored = pre.withColumn("slope_l", sl).withColumn("slope_r", sr)
      .withColumn("sse_tot", el + er)
    val wr = Window.partitionBy(col("k")).orderBy(col("sse_tot"), col("day"))
    scored.withColumn("rn", row_number().over(wr)).where(col("rn") === 1)
      .select(col("k").as("key"), col("day").cast("string").as("split_day"),
        col("nl").as("n_left"), (col("nt") - col("nl")).as("n_right"),
        round(col("slope_l") / lit(100.0), 6).as("slope_left"),
        round(col("slope_r") / lit(100.0), 6).as("slope_right"),
        round(col("sse_tot") / lit(1e4), 6).as("sse_total"))
  }

  /** Syntetos-Boylan demand-pattern classification (the companion
    * diagnostic that tells you when [[croston]] applies): per series,
    * ADI (mean inter-demand interval) and CV^2 (squared coefficient of
    * variation of nonzero demand sizes) from one sufficient-stats pass
    * over integer-quantized demands, with the quadrant thresholds
    * (1.32, 0.49) decided by EXACT integer cross-multiplication so the
    * class labels are engine-independent. smooth / intermittent /
    * erratic / lumpy. */
  def intermittencyClass(df: DataFrame, key: Column, period: Column,
                         demandCents: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val st = df.select(key.as("k"), period.cast("long").as("p"),
        demandCents.cast("long").as("q"))
      .where(col("q") > 0)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_events"), min(col("p")).as("minp"),
        max(col("p")).as("maxp"), sum(dec(col("q"))).as("sd"),
        sum(dec(col("q")) * col("q")).as("sdd"))
      .where(col("n_events") >= 2)
    val nDec = dec(col("n_events"))
    val varNum = nDec * col("sdd") - col("sd") * col("sd")
    val adiGe = (col("maxp") - col("minp")) * 100 >=
      lit(132L) * (col("n_events") - 1)
    val cv2Ge = dec(lit(100L)) * varNum >= dec(lit(49L)) * (col("sd") * col("sd"))
    st.select(col("k").as("key"), col("n_events"),
      round((col("maxp") - col("minp")).cast("double") /
        (col("n_events") - 1).cast("double"), 6).as("adi"),
      round(varNum.cast("double") /
        (col("sd") * col("sd")).cast("double"), 6).as("cv2"),
      when(adiGe && cv2Ge, "lumpy").when(adiGe, "intermittent")
        .when(cv2Ge, "erratic").otherwise("smooth").as("pattern"))
  }

  /** Clamped running balance per key (inventory/credit semantics): the
    * balance folds deltas in (ts, order) sequence but FLOORS at zero —
    * a non-linear recurrence no window prefix-sum can express, folded
    * with the same grouped-sort + sequential `aggregate` shape as
    * [[ewmaLevel]] (per-series sequential, parallel across series;
    * deltas fold as exact integer cents so the clamp decision is
    * engine-independent). Emits each key's final balance and how many
    * deltas the floor absorbed. */
  def clampedBalance(df: DataFrame, key: Column, ts: Column, order: Column,
                     delta: Column): DataFrame = {
    val seq = df.groupBy(key.as("key"))
      .agg(array_sort(collect_list(struct(ts.as("t"), order.as("o"),
        (delta.cast("decimal(18,2)") * 100).cast("long").as("d")))).as("arr"))
    val folded = aggregate(
      col("arr"),
      struct(lit(0L).as("bal"), lit(0L).as("floored")),
      (acc, e) => {
        val next = acc.getField("bal") + e.getField("d")
        struct(greatest(next, lit(0L)).as("bal"),
          (acc.getField("floored") +
            when(next < 0, 1L).otherwise(0L)).as("floored"))
      })
    seq.select(col("key"), size(col("arr")).as("n"),
      (folded.getField("bal").cast("double") / 100.0).as("balance"),
      folded.getField("floored").as("n_floored"))
  }

  /** Additive seasonal decomposition (STL-lite) of per-period series
    * totals: value = trend + seasonal + residual, where trend is the
    * centered length-`period` moving average (null at the edges where
    * the window is short) and seasonal is the per-phase mean of the
    * detrended values. All three passes are windows/aggregates over the
    * (series, bucket) frame — at scale the heavy input is reduced to
    * one row per (series, period bucket) by the caller's aggregation
    * BEFORE any window runs, so window partitions are tiny regardless
    * of raw row count. Determinism: the window sum folds rows in sort
    * order (both engines ascending by bucket); the per-phase mean runs
    * over DECIMAL so the groupBy order can't perturb the double. */
  def decompose(series: DataFrame, key: Column, bucket: Column,
                value: Column, period: Int, phase: Column): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"period must be odd and >= 3 (centered window): $period")
    val half = period / 2
    val w = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(-half, half)
    val trended = series.select(key.as("key"), bucket.as("bucket"),
        value.cast("double").as("value"), phase.as("phase"))
      .withColumn("trend",
        when(count(lit(1)).over(w) === period,
          sum(col("value").cast("decimal(28,6)")).over(w).cast("double") / period))
    val seasonal = trended.where(col("trend").isNotNull)
      .groupBy(col("key").as("skey"), col("phase").as("sphase"))
      .agg((sum((col("value") - col("trend")).cast("decimal(28,12)")).cast("double") /
        count(lit(1))).as("seasonal"))
    trended.join(seasonal,
        col("key") === col("skey") && col("phase") === col("sphase"), "left")
      .select(col("key"), col("bucket"), round(col("value"), 6).as("value"),
        round(col("trend"), 6).as("trend"),
        round(col("seasonal"), 6).as("seasonal"),
        round(col("value") - col("trend") - col("seasonal"), 6).as("residual"))
  }

  /** Per-series ordinary-least-squares trend: slope / intercept / r2 of
    * y against an integer x (e.g. epoch day) for every key, closed-form
    * from ONE hash aggregation of the five sufficient statistics — no
    * window, no per-series fit loop, scale-free in series count.
    * Determinism: sums run over exact integers/decimals; the closed
    * form is evaluated on the (identical) doubles those exact sums cast
    * to, so any engine replaying the same formula reproduces the bits. */
  def trendPerSeries(df: DataFrame, key: Column, x: Column, y: Column): DataFrame = {
    // x*x at epoch-second/milli scale (~3e18+) would wrap a silent
    // LongType sum in non-ANSI mode: fold the x moments in DECIMAL(38,0)
    // (exact, order-invariant) and only cast the totals to double.
    val xd = x.cast("long").cast("decimal(38,0)")
    val yd = y.cast("decimal(18,6)")
    val agg = df.groupBy(key.as("key")).agg(
      count(lit(1)).as("n"),
      sum(xd).as("sx"), sum(xd * xd).as("sxx"),
      sum(yd).cast("double").as("sy"),
      sum(xd * yd).cast("double").as("sxy"),
      sum(yd * yd).cast("double").as("syy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sxx = col("sxx").cast("double")
    val num = col("sxy") - sx * col("sy") / n
    val denX = sxx - sx * sx / n
    val denY = col("syy") - col("sy") * col("sy") / n
    val slope = num / denX
    agg.select(col("key"), col("n"),
      round(slope, 6).as("slope"),
      round(col("sy") / n - slope * (sx / n), 6).as("intercept"),
      round(num * num / (denX * denY), 6).as("r2"))
  }

  /** Per-series autocorrelation at lags 1..maxLag (full-series mean and
    * variance in the denominator — the standard ACF estimator). One
    * window pass computes all lags, one aggregation reduces them:
    * per-row state is `maxLag` lagged values, never the series. The
    * expanded-form sufficient statistics (sum x·x_lag, head/tail sums)
    * accumulate over exact decimals so the cross-partition fold order
    * cannot perturb the doubles the closed form runs on. */
  def acf(df: DataFrame, key: Column, bucket: Column, y: Column,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 20, s"maxLag out of range: $maxLag")
    val w = Window.partitionBy(col("key")).orderBy(col("bucket"))
    val base = df.select(key.as("key"), bucket.as("bucket"),
      y.cast("decimal(18,6)").as("x"))
    val lagged = base.select(
      col("key") +: col("x") +:
        (1 to maxLag).map(k => lag(col("x"), k).over(w).as(s"x_$k")): _*)
    val perLag = lagged.select(col("key"), col("x"),
        explode(array((1 to maxLag).map(k =>
          struct(lit(k).as("lag"), col(s"x_$k").as("xl"))): _*)).as("e"))
      .select(col("key"), col("x"), col("e.lag").as("lag"), col("e.xl").as("xl"))
    val stats = perLag.groupBy(col("key"), col("lag")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("x") * col("x")).cast("double").as("sxx"),
      count(col("xl")).as("np"),
      sum(when(col("xl").isNotNull, col("x") * col("xl"))).cast("double").as("sxy"),
      sum(when(col("xl").isNotNull, col("x"))).cast("double").as("sh"),
      sum(col("xl")).cast("double").as("st"))
    val m = col("sx") / col("n").cast("double")
    val den = col("sxx") - col("sx") * col("sx") / col("n").cast("double")
    val num = col("sxy") - m * (col("sh") + col("st")) +
      col("np").cast("double") * m * m
    stats.select(col("key"), col("lag"), col("np").as("n_pairs"),
      round(num / den, 6).as("acf"))
  }

  /** CUSUM changepoint scan per series: S_t = cumulative sum of
    * (x - series mean); reports the maximum |S_t| and the earliest
    * bucket attaining it (the level-shift location candidate). One
    * shuffle on the key; the cumulative sum folds exact decimals in
    * bucket order, the mean divides an exact total — every row's S_t is
    * the same double in any engine that replays the formula, so the
    * max/argmax comparisons are reproducible. */
  def cusum(df: DataFrame, key: Column, bucket: Column, y: Column): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("key"))
    val scored = df.select(key.as("key"), bucket.as("bucket"),
        y.cast("decimal(18,6)").as("x"))
      .withColumn("cum", sum(col("x")).over(w).cast("double"))
      .withColumn("idx", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("bucket"))))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("mean", sum(col("x")).over(wAll).cast("double") /
        col("n").cast("double"))
      .withColumn("s_abs", abs(col("cum") - col("idx").cast("double") * col("mean")))
    val top = scored.groupBy(col("key")).agg(max(col("s_abs")).as("max_dev"))
    scored.join(top, Seq("key"))
      .where(col("s_abs") === col("max_dev"))
      .groupBy(col("key"))
      .agg(max(col("n")).as("n"), round(max(col("max_dev")), 6).as("max_dev"),
        min(col("bucket")).as("at_bucket"),
        round(max(col("mean")), 6).as("mean"))
  }

  /** Theil-Sen robust trend per series: the median of all pairwise
    * slopes (y_j - y_i)/(x_j - x_i), i < j — the estimator that shrugs
    * off outliers OLS ([[trendPerSeries]]) chases. Pairwise is O(n^2)
    * PER SERIES by definition, so the operator guards series length
    * loudly (`maxSeriesLength`) — the scale contract is many short
    * series (aggregate to coarser buckets to shorten a series, or
    * sample pairs for the approximate variant). One within-key
    * self-join + one exact interpolated median per key. */
  def theilSenSlope(df: DataFrame, key: Column, x: Column, y: Column,
                    maxSeriesLength: Int = 2000): DataFrame = {
    val base = df.select(key.as("key"), x.cast("long").as("x"),
        y.cast("decimal(18,6)").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val oversized = base.groupBy(col("key")).agg(count(lit(1)).as("n"))
      .where(col("n") > maxSeriesLength).limit(1).collect() // bounded: 1 row
    require(oversized.isEmpty,
      s"theilSenSlope: series over maxSeriesLength=$maxSeriesLength " +
        s"(${oversized.mkString}); aggregate to coarser buckets first")
    val a = base.select(col("key"), col("x").as("xi"), col("y").as("yi"))
    val b = base.select(col("key"), col("x").as("xj"), col("y").as("yj"))
    val out = a.join(b, Seq("key")).where(col("xi") < col("xj"))
      .select(col("key"),
        ((col("yj") - col("yi")).cast("double") /
          (col("xj") - col("xi")).cast("double")).as("slope"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_pairs"),
        round(percentile(col("slope"), lit(0.5)), 6).as("ts_slope"))
    val res = out.localCheckpoint(true)
    base.unpersist(blocking = false)
    res
  }

  /** Exponential-decay engagement score per entity:
    * sum over events of value * 2^(-(T - t) / halflife), T the global
    * reference instant — the recency-weighted activity feature that
    * replaces "count of events in the last N days" with a smooth decay.
    * Each per-event term is rounded to DECIMAL(18,12) BEFORE the
    * per-entity sum, so the hash aggregation's fold order cannot
    * perturb the score and a replaying engine matches it exactly. One
    * hash aggregation; the reference instant is a plan literal the
    * caller fixes (never now()). */
  def decayScore(df: DataFrame, entity: Column, ts: Column, value: Column,
                 refInstant: String, halflifeDays: Double): DataFrame = {
    require(halflifeDays > 0, s"halflife must be positive: $halflifeDays")
    val ageDays = (unix_micros(lit(refInstant).cast("timestamp")) -
      unix_micros(ts)).cast("double") / lit(86400000000.0)
    val term = (value.cast("double") *
      pow(lit(2.0), -ageDays / lit(halflifeDays))).cast("decimal(18,12)")
    df.groupBy(entity.as("entity"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(term).cast("double"), 6).as("decay_score"))
  }

  /** Exact distinct-entity counts over SLIDING day windows (the
    * "7-day active users" series): distinct counts do not merge across
    * window panes, so instead of per-pane sketches each (entity, day)
    * activity row is re-keyed to every window END it belongs to — a
    * bounded windowDays-fold expand — and one hash aggregation counts
    * distinct entities per end. Flat cost, no ordered state, no sketch
    * error; window ends are restricted to days that actually occur. */
  def slidingDistinct(df: DataFrame, entity: Column, ts: Column,
                      windowDays: Int): DataFrame = {
    require(windowDays >= 1 && windowDays <= 370,
      s"windowDays out of range: $windowDays")
    val ud = df.select(entity.as("e"), to_date(ts).as("day")).distinct()
    val ends = ud.select(col("day").as("window_end")).distinct()
    ud.withColumn("window_end",
        explode(sequence(col("day"), date_add(col("day"), windowDays - 1))))
      .join(ends, Seq("window_end"))
      .groupBy(col("window_end"))
      .agg(countDistinct(col("e")).as("n_active"))
  }

  /** Kaplan-Meier survival estimator over (duration, event-observed)
    * pairs: S(t) = prod over event times t_i <= t of (1 - d_i / n_i),
    * with d_i deaths at t_i and n_i the at-risk count (standard
    * right-censoring: censored subjects leave the risk set but
    * contribute no factor). Rows collapse to the DURATION domain first
    * (one groupBy), so the ordered pass runs over distinct durations —
    * bounded by the time resolution, not the population. The product is
    * folded as a running sum of per-step log factors, each rounded to
    * DECIMAL(18,12) before the cumulative sum so the fold is exact and
    * engine-independent; the final exp is one libm call absorbed by the
    * 6-decimal gate. Emits (duration, n_at_risk, d_events, n_censored,
    * survival). */
  /** Nelson-Aalen cumulative hazard H(t) = Σ_{t_i <= t} d_i / n_i — the
    * additive companion to [[kaplanMeier]]'s product-limit estimator
    * (H is what hazard-regression diagnostics plot; exp(-H) is the
    * Breslow survival alternative). Same event-table reduction: one
    * groupBy to distinct durations, the at-risk counts from one ordered
    * pass over the bounded duration domain. Each increment d/n is cast
    * to DECIMAL(18,12) before the cumulative sum so the fold is exact
    * and engine-independent. Emits (duration, n_at_risk, d_events,
    * cum_hazard). */
  def nelsonAalen(df: DataFrame, duration: Column, observed: Column): DataFrame = {
    val risk = survivalRiskTable(df, duration, observed)
    val cumInc = DataQuality.cumulativeDecimalByValueAuto(
      risk.select(col("v"), (col("d").cast("double") /
        col("n_at_risk").cast("double")).cast("decimal(18,12)").as("inc")),
      Seq("inc"))
    risk.join(cumInc, Seq("v"))
      .select(col("v").as("duration"), col("n_at_risk"),
        col("d").as("d_events"),
        round(col("cum_inc").cast("double"), 6).as("cum_hazard"))
  }

  /** Shared event-table reduction for the survival estimators: collapse
    * to the distinct-duration domain (one groupBy), then derive each
    * duration's at-risk count WITHOUT an unpartitioned window — the
    * duration domain is usually resolution-bounded, but a caller
    * feeding ms-resolution durations would make `Window.orderBy(t)` a
    * row-sized single-partition sort, so the running "subjects departed
    * before t" count goes through [[DataQuality.cumulativeByValue]]'s
    * two-level prefix sum and the grand total rides a 1-row broadcast
    * frame. Emits one row per duration `v` with (d, c, m, n_at_risk)
    * [+ d1/m1 group-1 splits when `inGroup1` is given]. */
  private def survivalRiskTable(df: DataFrame, duration: Column,
                                observed: Column,
                                inGroup1: Option[Column] = None): DataFrame = {
    val groupAggs = Seq(
      sum(when(observed, 1L).otherwise(0L)).as("d"),
      sum(when(observed, 0L).otherwise(1L)).as("c"),
      count(lit(1)).as("m")) ++ inGroup1.toSeq.flatMap(g => Seq(
      sum(when(observed && g, 1L).otherwise(0L)).as("d1"),
      sum(when(g, 1L).otherwise(0L)).as("m1")))
    val counts = df.where(duration.isNotNull)
      .groupBy(duration.cast("long").as("v"))
      .agg(groupAggs.head, groupAggs.tail: _*)
      .localCheckpoint(false)
    val cumCols = Seq("m") ++ (if (inGroup1.isDefined) Seq("m1") else Nil)
    val cum = DataQuality.cumulativeByValueAuto(
      counts.select(col("v") +: cumCols.map(col): _*), cumCols)
    val totalAggs = sum(col("m")).as("total") +:
      inGroup1.toSeq.map(_ => sum(col("m1")).as("total1"))
    val total = counts.agg(totalAggs.head, totalAggs.tail: _*)
    val base = counts.join(cum, Seq("v")).crossJoin(broadcast(total))
      .withColumn("n_at_risk", col("total") - (col("cum_m") - col("m")))
    if (inGroup1.isDefined)
      base.withColumn("n1_at_risk", col("total1") - (col("cum_m1") - col("m1")))
    else base
  }

  def kaplanMeier(df: DataFrame, duration: Column, observed: Column): DataFrame = {
    val risk = survivalRiskTable(df, duration, observed)
    val lnf =
      when(col("d") === 0, lit(0.0).cast("decimal(18,12)"))
        // everyone at risk dies: ln(0) would be -inf (null after the
        // decimal cast, which a sum would silently SKIP) — a -999
        // floor keeps the fold total, and exp underflows it to an
        // exact 0.0 in every engine
        .when(col("d") === col("n_at_risk"), lit(-999.0).cast("decimal(18,12)"))
        .otherwise(log(lit(1.0) - col("d").cast("double") /
          col("n_at_risk").cast("double")).cast("decimal(18,12)"))
    val cumLnf = DataQuality.cumulativeDecimalByValueAuto(
      risk.select(col("v"), lnf.as("lnf")), Seq("lnf"))
    risk.join(cumLnf, Seq("v"))
      .select(col("v").as("duration"), col("n_at_risk"),
        col("d").as("d_events"), col("c").as("n_censored"),
        round(exp(col("cum_lnf").cast("double")), 6).as("survival"))
  }

  /** Two-group log-rank test: do two cohorts' survival curves differ?
    * The hypothesis-test companion to [[kaplanMeier]] — the same
    * duration-domain reduction (one groupBy to distinct durations, an
    * ordered pass over the bounded duration domain for the at-risk
    * counts), with each event time's hypergeometric expected-count and
    * variance increments quantized to DECIMAL(28,12) before the fold
    * so the sum is exact and engine-independent.
    * chi2 = (O1 - E1)^2 / V. */
  def logRank(df: DataFrame, duration: Column, observed: Column,
              inGroup1: Column): DataFrame = {
    val terms = survivalRiskTable(df, duration, observed, Some(inGroup1))
      .withColumnRenamed("n_at_risk", "n_t")
      .withColumnRenamed("n1_at_risk", "n1_t")
      .where(col("d") > 0)
      .withColumn("e1", (col("d").cast("double") *
        col("n1_t").cast("double") / col("n_t").cast("double"))
        .cast("decimal(28,12)"))
      .withColumn("vt", when(col("n_t") > 1,
        (col("d").cast("double") * col("n1_t").cast("double") /
          col("n_t").cast("double") *
          (col("n_t") - col("n1_t")).cast("double") /
          col("n_t").cast("double") *
          (col("n_t") - col("d")).cast("double") /
          (col("n_t") - 1).cast("double")).cast("decimal(28,12)"))
        .otherwise(lit(0.0).cast("decimal(28,12)")))
    terms.agg(sum(col("d1")).as("observed_1"),
        sum(col("d")).as("observed_total"),
        sum(col("e1")).cast("double").as("e1s"),
        sum(col("vt")).cast("double").as("vs"))
      .select(col("observed_1"), col("observed_total"),
        round(col("e1s"), 6).as("expected_1"),
        round((col("observed_1").cast("double") - col("e1s")) *
          (col("observed_1").cast("double") - col("e1s")) / col("vs"), 6)
          .as("chi2_logrank"))
  }

  /** First-order Markov transition matrix of a per-entity event-state
    * sequence: counts and MLE probabilities P(next | current) over
    * consecutive (ts, order)-ordered states. One shuffle on the entity
    * + one window lead + one pair aggregation; the row-marginal join is
    * broadcast (state-domain sized). The behavioral-model summary
    * (and anomaly baseline) for event streams. */
  def markovTransitions(df: DataFrame, entity: Column, ts: Column,
                        order: Column, state: Column): DataFrame = {
    val w = Window.partitionBy(col("e")).orderBy(col("ts"), col("ord"))
    val pairs = df.select(entity.as("e"), ts.as("ts"), order.as("ord"),
        state.as("cur"))
      .withColumn("nxt", lead(col("cur"), 1).over(w))
      .where(col("nxt").isNotNull)
      .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
    val marginals = pairs.groupBy(col("cur")).agg(sum(col("n")).as("rt"))
    pairs.join(broadcast(marginals), Seq("cur"))
      .select(col("cur"), col("nxt"), col("n"),
        round(col("n").cast("double") / col("rt").cast("double"), 6).as("p"))
  }

  /** Upsert/merge to a latest-row snapshot: one row per key, the row
    * with the greatest (ts, order) — the CDC compaction every
    * changelog-backed table needs before serving. ONE hash aggregation
    * (max_by over the full row struct), no window, no sort: at 100 TB
    * this is a single shuffle on the key with map-side combine, the
    * cheapest possible dedup-to-latest plan. `order` breaks same-ts
    * ties deterministically. */
  def upsertLatest(changes: DataFrame, key: Column, ts: Column,
                   order: Column, values: Seq[Column]): DataFrame = {
    val payload = struct(ts.as("ts") +: values: _*)
    changes.groupBy(key.as("k"))
      .agg(max_by(payload, struct(ts, order)).as("__p"))
      .select(col("k") +: col("__p.ts").as("ts") +:
        values.indices.map(i => col(s"__p.${values(i).toString()}")): _*)
  }

  /** Rolling Pearson correlation between two aligned per-bucket series
    * over a trailing window of `windowLen` buckets (drift/co-movement
    * monitoring between two metrics). Input: one row per bucket with
    * both values. One window pass accumulates the five sufficient sums
    * over exact decimals; the closed form runs on the per-row doubles.
    * Emits null until the window is full — a partial-window correlation
    * is statistically meaningless and the oracle replays the rule. */
  def rollingCorr(df: DataFrame, bucket: Column, x: Column, y: Column,
                  windowLen: Int): DataFrame = {
    require(windowLen >= 3, s"windowLen must be >= 3: $windowLen")
    val w = Window.orderBy(col("bucket")).rowsBetween(-(windowLen - 1), 0)
    val base = df.select(bucket.as("bucket"),
      x.cast("decimal(25,6)").as("x"), y.cast("decimal(25,6)").as("y"))
    val nd = lit(windowLen.toDouble)
    val sx = sum(col("x")).over(w).cast("double")
    val sy = sum(col("y")).over(w).cast("double")
    val sxx = sum(col("x") * col("x")).over(w).cast("double")
    val syy = sum(col("y") * col("y")).over(w).cast("double")
    val sxy = sum(col("x") * col("y")).over(w).cast("double")
    base.withColumn("__n", count(lit(1)).over(w))
      .withColumn("corr", when(col("__n") === windowLen,
        round((nd * sxy - sx * sy) /
          sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 6)))
      .select(col("bucket"), col("x").cast("double").as("x"),
        col("y").cast("double").as("y"), col("corr"))
  }
}
