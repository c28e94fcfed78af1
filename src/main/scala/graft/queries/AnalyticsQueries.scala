package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.TimeSeries

/** Product-analytics battery composed from the engine's primitives:
  * cohort LTV curves, RFM segmentation, seasonally-adjusted anomaly
  * flags, funnel conversion timing, and Pareto concentration — each an
  * oracle-gated composition (no new physical machinery; the point is
  * that the primitives compose into the reports a warehouse actually
  * ships).
  */
object AnalyticsQueries {

  type Q = (SparkSession, String) => DataFrame

  private def money(c: Column): Column = c.cast("decimal(18,2)")

  val queries: Map[String, Q] = Map(
    // exact Shapley-value channel attribution over the 16-subset
    // characteristic function v(mask) = conversion rate of users whose
    // touched-channel set is mask — factorial weights carried 24x, the
    // rates 1e9-quantized, so every marginal contribution is an exact
    // integer; the marginality axiom's answer to q283's rule-based
    // attribution models
    "q432_shapley_attribution" -> ((s, d) => {
      val s2 = s; import s2.implicits._
      val chanBit = when(col("event_type") === "view", 1)
        .when(col("event_type") === "click", 2)
        .when(col("event_type") === "signup", 4)
        .when(col("event_type") === "error", 8).otherwise(0)
      val users = Tables.events(s, d).groupBy(col("user_id"))
        .agg(bit_or(chanBit).as("mask"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
      val vmask = users.groupBy(col("mask"))
        .agg(count(lit(1)).as("n_u"), sum(col("conv")).as("n_conv"))
      val grid = s.range(16).select(col("id").cast("int").as("mask"))
      val v = grid.join(vmask, Seq("mask"), "left")
        .select(col("mask"), coalesce(
          round(col("n_conv").cast("double") / col("n_u").cast("double") *
            lit(1e9)).cast("long"), lit(0L)).as("vq"))
      val channels = Seq((1, "view"), (2, "click"), (4, "signup"),
        (8, "error")).toDF("bit", "channel")
      val w24 = when(bit_count(col("mask")) === 1, 6L)
        .when(bit_count(col("mask")) === 2, 2L)
        .when(bit_count(col("mask")) === 3, 2L).otherwise(6L)
      channels.crossJoin(v)
        .where(col("mask").bitwiseAND(col("bit")) =!= 0)
        .join(v.select(col("mask").as("m0"), col("vq").as("vq0")),
          col("mask") - col("bit") === col("m0"))
        .select(col("channel"), (w24 * (col("vq") - col("vq0"))).as("t"))
        .groupBy(col("channel"))
        .agg(sum(col("t")).as("phi24q"))
        .select(col("channel"),
          round(col("phi24q").cast("double") / lit(24.0) / lit(1e9), 6)
            .as("shapley"))
    }),
    // storage-layout audit: zigzag+varint encoded size of each series'
    // delta-encoded daily cents — the compression-estimate pass a
    // columnar layout optimizer (sort-key / encoding chooser) runs
    // before rewriting files. Per-series lag + exact integer byte-size
    // CASE chain; one window per series, one agg. raw_bytes assumes
    // 8-byte plain int64 storage.
    "q344_varint_size" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg((sum(money(col("value"))) * 100).cast("long").as("cents"))
      val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val delta = daily
        .withColumn("delta", col("cents") -
          coalesce(lag(col("cents"), 1).over(wOrd), lit(0L)))
        .withColumn("z", when(col("delta") >= 0, col("delta") * 2)
          .otherwise(-col("delta") * 2 - 1))
        .withColumn("vb",
          when(col("z") < 128L, 1L)
            .when(col("z") < 16384L, 2L)
            .when(col("z") < 2097152L, 3L)
            .when(col("z") < 268435456L, 4L)
            .when(col("z") < 34359738368L, 5L)
            .when(col("z") < 4398046511104L, 6L)
            .when(col("z") < 562949953421312L, 7L)
            .when(col("z") < 72057594037927936L, 8L)
            .otherwise(9L))
      delta.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          (count(lit(1)) * 8).as("raw_bytes"),
          sum(col("vb")).as("varint_bytes"))
        .withColumn("ratio", round(col("varint_bytes").cast("double") /
          col("raw_bytes"), 6))
    }),

    // ABC/XYZ inventory segmentation: parts classed by cumulative
    // revenue concentration (A <= 80%, B <= 95%, C) and weekly demand
    // variability (CV via the EXACT integer test 4(n*Sqq - Sq^2) < Sq^2
    // — no float std anywhere). The revenue ranking rides the two-level
    // cumulativeByValue prefix sum + a per-value row_number, never a
    // single-partition sort over the parts; ALL class decisions are
    // integer cross-multiplications.
    "q367_abc_xyz" -> ((s, d) => {
      val lines = Tables.lineitem(s, d).select(col("l_partkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("cents"),
        (col("l_quantity").cast("decimal(18,2)") * 100).cast("long").as("q"),
        date_trunc("week", col("l_shipdate")).as("wk"))
      val rev = lines.groupBy(col("l_partkey"))
        .agg(sum(col("cents")).as("cents"))
      val xyz = lines.groupBy(col("l_partkey"), col("wk"))
        .agg(sum(col("q")).as("wq"))
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("nw"), sum(col("wq")).as("sq"),
          sum(col("wq") * col("wq")).as("sqq"))
        .select(col("l_partkey"),
          when((col("nw") * col("sqq") - col("sq") * col("sq")) * 4 <
               col("sq") * col("sq"), "X")
            .when(col("nw") * col("sqq") - col("sq") * col("sq") <
               col("sq") * col("sq"), "Y")
            .otherwise("Z").as("class_xyz"))
      val counts = rev.groupBy((-col("cents")).as("v"))
        .agg(count(lit(1)).as("c"), sum(col("cents")).as("s"))
      val cum = graft.operators.DataQuality
        .cumulativeByValue(counts, Seq("c", "s")).join(counts, Seq("v"))
      val tot = rev.agg(sum(col("cents")).as("tot"))
      val abc = rev.withColumn("v", -col("cents"))
        .join(cum, Seq("v"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("v")).orderBy(col("l_partkey"))))
        .withColumn("row_cum",
          col("cum_s") - (col("c") - col("rn")) * col("cents"))
        .crossJoin(broadcast(tot))
        .select(col("l_partkey"), col("cents"), col("tot"),
          when(col("row_cum") * 100 <= col("tot") * 80, "A")
            .when(col("row_cum") * 100 <= col("tot") * 95, "B")
            .otherwise("C").as("class_abc"))
      abc.join(xyz, Seq("l_partkey"))
        .groupBy(col("class_abc"), col("class_xyz"))
        .agg(count(lit(1)).as("n_parts"),
          round(sum(col("cents")).cast("double") / max(col("tot")), 6)
            .as("revenue_share"))
    }),

    // audience-overlap matrix: Jaccard of the user sets behind every
    // event-type pair — distinct (user, type) once, one self-join on
    // the user key (5 types -> 10 pairs), set sizes joined back;
    // exact integer intersection counts, one mirrored double division
    "q366_audience_overlap" -> ((s, d) => {
      val ut = Tables.events(s, d)
        .select(col("user_id"), col("event_type")).distinct()
      val sizes = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val inter = ut.as("a")
        .join(ut.as("b"), col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_both"))
      inter
        .join(broadcast(sizes.select(col("event_type").as("type_a"),
          col("n").as("n_a"))), Seq("type_a"))
        .join(broadcast(sizes.select(col("event_type").as("type_b"),
          col("n").as("n_b"))), Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
          col("n_both"),
          round(col("n_both").cast("double") /
            (col("n_a") + col("n_b") - col("n_both")), 6).as("jaccard"))
    }),

    // tumbling-window OHLC bars per (event_type, day): open/close are
    // the first/last event values in (ts, event_id) order — argmin/
    // argmax via two row_numbers over ONE partitioning (no min_by
    // struct-comparator dependence, which DuckDB lacks) — plus exact
    // high/low/volume and a decimal-folded amount.
    "q349_ohlc_bars" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wAsc = Window.partitionBy(col("event_type"), to_date(col("ts")))
        .orderBy(col("ts"), col("event_id"))
      val wDesc = Window.partitionBy(col("event_type"), to_date(col("ts")))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"),
          col("value"), row_number().over(wAsc).as("ra"),
          row_number().over(wDesc).as("rd"))
        .groupBy(col("event_type"), col("day"))
        .agg(max(when(col("ra") === 1, col("value"))).as("open"),
          max(col("value")).as("high"), min(col("value")).as("low"),
          max(when(col("rd") === 1, col("value"))).as("close"),
          count(lit(1)).as("volume"),
          sum(money(col("value"))).cast("double").as("amount"))
        .withColumn("day", col("day").cast("string"))
    }),

    // growth accounting (user lifecycle state machine): per active
    // (user, week), classify new / retained (active the week before) /
    // resurrected (gap >= 2 weeks); a churn event posts to week+7 when
    // the next active week is not consecutive. One per-user ordered
    // window + one week-level agg; churn rows for the week after the
    // observed horizon are the PROJECTED churn of the last active week
    // (documented semantic — no global-max scalar join needed).
    "q351_growth_accounting" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val uw = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("wk"))
      val st = uw.select(col("user_id"), col("wk"),
        lag(col("wk"), 1).over(w).as("prev"), lead(col("wk"), 1).over(w).as("nxt"))
      val status = st.select(col("wk"),
        when(col("prev").isNull, lit("new"))
          .when(datediff(col("wk"), col("prev")) === 7, lit("retained"))
          .otherwise(lit("resurrected")).as("status"))
        .groupBy(col("wk"), col("status")).agg(count(lit(1)).as("n"))
      val churn = st.where(col("nxt").isNull ||
          datediff(col("nxt"), col("wk")) > 7)
        .select(date_add(col("wk"), 7).as("wk"), lit("churned").as("status"))
        .groupBy(col("wk"), col("status")).agg(count(lit(1)).as("n"))
      status.unionByName(churn)
        .groupBy(col("wk"))
        .agg(sum(when(col("status") === "new", col("n")).otherwise(0L)).as("n_new"),
          sum(when(col("status") === "retained", col("n")).otherwise(0L)).as("n_retained"),
          sum(when(col("status") === "resurrected", col("n")).otherwise(0L)).as("n_resurrected"),
          sum(when(col("status") === "churned", col("n")).otherwise(0L)).as("n_churned"))
        .withColumn("wk", col("wk").cast("string"))
    }),

    // cohort LTV curve: per signup-week cohort, cumulative spend per
    // cohort member through each week offset — three hash aggs + one
    // domain-bounded cumulative window (cohorts x offsets)
    "q228_ltv_curve" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val coh = ev.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort"))
      val sizes = coh.groupBy(col("cohort")).agg(count(lit(1)).as("n_cohort"))
      val spend = ev.join(coh, Seq("user_id"))
        .groupBy(col("cohort"),
          floor(datediff(to_date(col("ts")), to_date(col("cohort"))) / 7)
            .cast("int").as("week_idx"))
        .agg(sum(money(col("value"))).as("rev"))
      val w = Window.partitionBy(col("cohort")).orderBy(col("week_idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spend.join(broadcast(sizes), Seq("cohort"))
        .withColumn("cum_rev", sum(col("rev")).over(w))
        .select(col("cohort").cast("date").cast("string").as("cohort"),
          col("week_idx"), col("n_cohort"),
          col("rev").cast("double").as("week_rev"),
          round(col("cum_rev").cast("double") / col("n_cohort").cast("double"), 6)
            .as("ltv_per_user"))
    }),

    // RFM segmentation: recency/frequency/monetary quintiles per
    // customer from order history, exact percent-rank quintiles
    "q229_rfm" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val maxD = o.agg(max(to_date(col("o_orderdate"))).as("mx"))
      val rfm = o.groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("last_d"),
          count(lit(1)).as("f"), sum(money(col("o_totalprice"))).as("m"))
        .crossJoin(broadcast(maxD))
        .select(col("o_custkey"),
          datediff(col("mx"), col("last_d")).as("recency_days"),
          col("f"), col("m"))
      def quintile(c: String, asc: Boolean) = {
        val q = graft.operators.Vectorizers.quantileRank(
          rfm, col("o_custkey"), col(c))
        val score =
          if (asc) (lit(5.0) - least(floor(col("q") * 5), lit(4.0))).cast("int")
          else (least(floor(col("q") * 5), lit(4.0)) + 1).cast("int")
        q.select(col("id").as("o_custkey"), score.as(s"${c}_q"))
      }
      // recency: LOW days = best (5); frequency/monetary: HIGH = 5
      rfm.join(quintile("recency_days", asc = true), Seq("o_custkey"))
        .join(quintile("f", asc = false), Seq("o_custkey"))
        .join(quintile("m", asc = false), Seq("o_custkey"))
        .select(col("o_custkey"), col("recency_days"), col("f"),
          col("m").cast("double").as("m"),
          col("recency_days_q").as("r_score"), col("f_q").as("f_score"),
          col("m_q").as("m_score"),
          concat(col("recency_days_q"), col("f_q"), col("m_q")).as("segment"))
    }),

    // seasonally-adjusted anomalies: flag days whose decomposition
    // residual exceeds 2.5 robust z (residual / per-series residual IQR)
    "q230_seasonal_anomaly" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(money(col("value"))).cast("double").as("spend"))
      val dec = TimeSeries.decompose(daily, col("event_type"), col("day"),
        col("spend"), period = 7, phase = dayofweek(col("day")))
      val iqr = dec.where(col("residual").isNotNull)
        .groupBy(col("key").as("k2"))
        .agg((percentile(col("residual"), lit(0.75)) -
          percentile(col("residual"), lit(0.25))).as("riqr"))
      dec.join(broadcast(iqr), col("key") === col("k2"))
        .where(col("residual").isNotNull)
        .select(col("key"), col("bucket").cast("string").as("day"),
          col("value"), col("residual"),
          round(col("residual") / col("riqr"), 6).as("robust_z"),
          (abs(col("residual") / col("riqr")) > 2.5).cast("int").as("is_anomaly"))
    }),

    // funnel conversion timing: distribution of view -> purchase delay
    // per converting user (median/p90 over the per-user first-pair)
    "q231_conversion_time" -> ((s, d) => {
      val f = TimeSeries.funnel(Tables.events(s, d), col("user_id"),
        col("ts"), col("event_type"), Seq("view", "purchase"))
      val conv = f.where(col("t_2").isNotNull)
        .select((col("t_2") - col("t_1")).cast("double").as("delay_us"))
      conv.agg(count(lit(1)).as("n_converted"),
        round(percentile(col("delay_us"), lit(0.5)) / 1000000.0, 6)
          .as("median_sec"),
        round(percentile(col("delay_us"), lit(0.9)) / 1000000.0, 6)
          .as("p90_sec"))
    }),

    // video scene-cut detection over the stub codec: per sampled frame
    // a perceptual dHash, consecutive-frame hamming distance, cuts
    // where the distance clears the threshold — the shot-segmentation
    // plumbing (explode, per-doc ordered window, bit ops) is real;
    // only the pixel source is the deterministic fake
    "q234_scene_cuts" -> ((s, d) => {
      import graft.operators.Multimodal
      val docs = Multimodal.withPayload(Tables.documents(s, d), "text")
      val frames = Multimodal.sampleFrames(
        Multimodal.decodeFeatures(docs, "doc_id"), everyK = 2)
      val withPay = frames.join(docs.select(col("doc_id"), col("payload")),
        Seq("doc_id"))
      val framePayload = concat(col("payload"),
        to_binary(concat(lit(":f"), col("frame_idx")), lit("utf-8")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      withPay
        .select(col("doc_id"), col("frame_idx"),
          Multimodal.dHash56(framePayload).as("fh"))
        .withColumn("ham", when(lag(col("fh"), 1).over(w).isNotNull,
          bit_count(col("fh").bitwiseXOR(lag(col("fh"), 1).over(w)))))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(when(col("ham") > 32, 1L).otherwise(0L)).as("n_cuts"),
          round(avg(col("ham")), 6).as("mean_hamming"))
    }),

    // per-group exact percentile bands (p10/p50/p90) of order totals
    "q251_percentile_bands" -> ((s, d) => {
      Tables.orders(s, d).groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(percentile(col("o_totalprice"), lit(0.1)), 6).as("p10"),
          round(percentile(col("o_totalprice"), lit(0.5)), 6).as("p50"),
          round(percentile(col("o_totalprice"), lit(0.9)), 6).as("p90"))
    }),

    // order-to-ship cycle time per priority: exact mean (decimal sums)
    // and interpolated median days from order date to first ship date
    "q252_cycle_time" -> ((s, d) => {
      val firstShip = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey")).agg(min(col("l_shipdate")).as("ship"))
      Tables.orders(s, d)
        .join(firstShip, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority"),
          datediff(to_date(col("ship")), to_date(col("o_orderdate")))
            .cast("long").as("days"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("days")).cast("double") / count(lit(1)).cast("double"), 6)
            .as("mean_days"),
          round(percentile(col("days"), lit(0.5)), 6).as("median_days"))
    }),

    // clamped running balance: a per-user "wallet" where purchases add
    // value and other events drain a quarter of theirs, floored at 0 —
    // the non-linear sequential fold no window prefix-sum expresses
    "q249_running_balance" -> ((s, d) => {
      val delta = when(col("event_type") === "purchase", col("value"))
        .otherwise(-col("value") * 0.25)
      // n_floored stays spec-gated: DuckDB's struct-state list_reduce
      // evaluates the two result fields against inconsistent
      // accumulator values (balance right, counter spuriously fires),
      // so the oracle replays the scalar clamped fold only
      TimeSeries.clampedBalance(Tables.events(s, d), col("user_id"),
          col("ts"), col("event_id"), delta)
        .select(col("key").as("user_id"), col("n"),
          round(col("balance"), 2).as("balance"))
    }),

    // difference-in-differences: purchase value, odd-user "treatment"
    // vs even-user control, before/after the mid-window cutoff
    "q250_did" -> ((s, d) => {
      val ev = Tables.events(s, d).where(col("event_type") === "purchase")
        .select((pmod(col("user_id"), lit(2L)) === 1).as("treated"),
          (col("ts") >= lit("2024-01-16 00:00:00").cast("timestamp")).as("post"),
          col("value").cast("decimal(18,6)").as("v"))
      val cells = ev.groupBy(col("treated"), col("post"))
        .agg(count(lit(1)).as("n"), sum(col("v")).cast("double").as("sv"))
        .select(col("treated"), col("post"),
          (col("sv") / col("n").cast("double")).as("m"), col("n"))
      def cell(t: Boolean, p: Boolean) = first(when(
        col("treated") === t && col("post") === p, col("m")), ignoreNulls = true)
      cells.agg(
          round(cell(true, false), 6).as("treat_pre"),
          round(cell(true, true), 6).as("treat_post"),
          round(cell(false, false), 6).as("ctrl_pre"),
          round(cell(false, true), 6).as("ctrl_post"),
          round((cell(true, true) - cell(true, false)) -
            (cell(false, true) - cell(false, false)), 6).as("did"))
    }),

    // per-group weighted sampling without replacement: 4 orders per
    // priority, Efraimidis-Spirakis keys through the bounded TopK
    "q245_group_weighted_sample" -> ((s, d) => {
      graft.operators.Curation.weightedSamplePerGroup(Tables.orders(s, d),
        col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        nPerGroup = 4)
    }),

    // X-bar control chart over daily spend per event type: global
    // 3-sigma limits, out-of-control flags
    "q246_control_chart" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("spend"))
      graft.operators.DataQuality.controlChart(daily, col("event_type"),
          col("day"), col("spend"), k = 3.0)
        .withColumn("bucket", col("bucket").cast("string"))
    }),

    // duplicate-column detection by order-independent content digest
    // (qty_alias is planted as an exact copy of l_quantity)
    "q248_column_fingerprint" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .withColumn("qty_alias", col("l_quantity"))
      graft.operators.DataQuality.columnFingerprints(li,
        Seq("l_quantity", "qty_alias", "l_discount", "l_tax", "l_extendedprice"))
    }),

    // keyed snapshot diff: orders with totalprice > 200k "masked" in
    // the old version simulate a changed load; the reconciliation
    // scoreboard counts added/changed/unchanged per order priority
    "q242_snapshot_diff" -> ((s, d) => {
      import graft.operators.Incremental
      val cur = Tables.orders(s, d)
      val old = cur.where(pmod(col("o_orderkey"), lit(13L)) =!= 0)
        .withColumn("o_totalprice",
          when(col("o_totalprice") > 200000, 0.0).otherwise(col("o_totalprice")))
      val diff = Incremental.snapshotDiff(old, col("o_orderkey"),
        cur, col("o_orderkey"),
        Seq(col("o_orderstatus"), col("o_totalprice").cast("decimal(18,2)")))
      diff.join(cur.select(col("o_orderkey").as("key"), col("o_orderpriority")),
          Seq("key"), "left")
        .groupBy(col("o_orderpriority"), col("status"))
        .agg(count(lit(1)).as("n"))
    }),

    // column-level drill-down of the snapshot diff: WHICH columns moved
    // on the changed keys (nulls injected to exercise the null-safe
    // comparison)
    "q269_snapshot_column_diff" -> ((s, d) => {
      import graft.operators.Incremental
      val cur = Tables.orders(s, d)
      val old = cur.where(pmod(col("o_orderkey"), lit(13L)) =!= 0)
        .withColumn("o_totalprice",
          when(col("o_totalprice") > 200000, 0.0).otherwise(col("o_totalprice")))
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("o_orderstatus")))
      Incremental.snapshotColumnDiff(old, col("o_orderkey"),
        cur, col("o_orderkey"),
        Seq("o_orderstatus", "o_totalprice", "o_orderpriority"))
    }),

    // recency-weighted engagement: half-life-decayed event value per
    // user (terms decimal-rounded so the fold is order-exact)
    "q243_decay_score" -> ((s, d) => {
      TimeSeries.decayScore(Tables.events(s, d), col("user_id"), col("ts"),
        col("value"), refInstant = "2024-02-01 00:00:00", halflifeDays = 7.0)
    }),

    // data-contract validation: per-rule violation counts over lineitem
    // (range, enum, positivity, temporal-window expectations)
    "q244_data_contract" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val rules = Seq(
        ("qty_in_range", col("l_quantity").between(0, 60)),
        ("price_positive", col("l_extendedprice") > 0),
        ("discount_unit_interval", col("l_discount").between(0, 1)),
        ("returnflag_enum", col("l_returnflag").isin("A", "N", "R")),
        ("shipdate_window",
          col("l_shipdate").between("1992-01-01", "2000-01-01")))
      li.select(explode(array(rules.map { case (name, ok) =>
          struct(lit(name).as("rule"),
            when(ok, 0L).otherwise(1L).as("viol")) }: _*)).as("r"))
        .groupBy(col("r.rule").as("rule"))
        .agg(count(lit(1)).as("n_rows"), sum(col("r.viol")).as("n_violations"),
          round(lit(1.0) - sum(col("r.viol")).cast("double") /
            count(lit(1)).cast("double"), 6).as("pass_rate"))
    }),

    // streaming Markov-transition extraction: per-user consecutive
    // event pairs via one-tuple-per-key state, aggregated to the same
    // transition matrix the batch q218 produces (same oracle)
    // STREAMING process conformance: transitions extracted by the
    // stateful per-key stream (q239's flatMapGroupsWithState extractor,
    // cross-batch stitching included), validated against the broadcast
    // allowed-transition set — the live variant of q329's audit; the
    // oracle replays it batch-side because the finite source stitches
    // to the identical transition multiset
    "q332_stream_conformance" -> ((s, d) => {
      import graft.streaming.Streaming
      val t = Streaming.transitionStream(s, Streaming.eventStream(s, d))
      val rows = Streaming.runToCompletion(s, t.toDF(), "q332_conf",
        outputMode = "append", shufflePartitions = Some(8))
      val allowed = Seq(
        "signup" -> "view", "signup" -> "signup",
        "view" -> "view", "view" -> "click",
        "click" -> "click", "click" -> "purchase", "click" -> "error",
        "purchase" -> "purchase", "purchase" -> "error",
        "purchase" -> "view", "error" -> "view")
      val s2 = s; import s2.implicits._
      val allowedDf = allowed.toDF("cur", "nxt").withColumn("ok", lit(1))
      rows.join(broadcast(allowedDf), Seq("cur", "nxt"), "left")
        .groupBy(col("userId").as("user_id"))
        .agg(count(lit(1)).as("n_transitions"),
          sum(coalesce(col("ok"), lit(0))).cast("long").as("n_conforming"))
        .withColumn("n_violations",
          col("n_transitions") - col("n_conforming"))
        .withColumn("conformance",
          round(col("n_conforming").cast("double") / col("n_transitions"), 6))
    }),

    "q239_stream_markov" -> ((s, d) => {
      import graft.streaming.Streaming
      val t = Streaming.transitionStream(s, Streaming.eventStream(s, d))
      val rows = Streaming.runToCompletion(s, t.toDF(), "q239_markov",
        outputMode = "append", shufflePartitions = Some(8))
      val p = rows.groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
      // derived-from-self join: rename the marginal's key to avoid
      // conflicting attribute references
      val m = p.select(col("cur").as("cur2"), col("n"))
        .groupBy(col("cur2")).agg(sum(col("n")).as("rt"))
      p.join(broadcast(m), col("cur") === col("cur2"))
        .select(col("cur"), col("nxt"), col("n"),
          round(col("n").cast("double") / col("rt").cast("double"), 6).as("p"))
    }),

    // exact 7-day sliding distinct actives (re-keyed expand, no sketch)
    "q240_sliding_distinct" -> ((s, d) => {
      TimeSeries.slidingDistinct(Tables.events(s, d), col("user_id"),
          col("ts"), windowDays = 7)
        .withColumn("window_end", col("window_end").cast("string"))
    }),

    // join-cardinality pre-flight for the lineitem self-join on
    // partkey: exact output size + dominating keys
    "q241_join_cardinality" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      graft.operators.DataQuality.joinCardinality(li, col("l_partkey"),
        li, col("l_partkey"), topK = 5)
    }),

    // Pareto concentration: smallest customer count covering >= 80% of
    // revenue, plus the top-decile revenue share — descending cumulative
    // share over the (customer-total) domain via the two-level prefix sum
    "q233_pareto" -> ((s, d) => {
      val per = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(sum(money(col("o_totalprice"))).as("rev"))
      // descending revenue order = ascending on the negated value;
      // revenue folds as exact integer cents so BOTH cumulative columns
      // ride the two-level prefix sum (no single-partition sort)
      val counts = per.groupBy((-col("rev")).as("v"))
        .agg(count(lit(1)).as("c"),
          (sum(col("rev")) * 100).cast("long").as("cents"))
      val cum = graft.operators.DataQuality.cumulativeByValue(
        counts, Seq("c", "cents"))
      val tot = per.agg((sum(col("rev")) * 100).cast("long").as("tcents"),
        count(lit(1)).as("tn"))
      cum.crossJoin(broadcast(tot)).agg(
        min(when(col("cum_cents").cast("double") >=
          col("tcents").cast("double") * 0.8, col("cum_c"))).as("n_for_80pct"),
        max(col("tn")).as("n_customers"),
        round(max(when(col("cum_c") <= (col("tn").cast("double") / 10.0)
            .cast("long"),
          col("cum_cents").cast("double") / col("tcents").cast("double"))), 6)
          .as("top_decile_share"))
    }),

    // cumulative reach curve: EXACT distinct-users-ever per week via
    // first-seen-week (one agg) + a weeks-domain cumulative window — no
    // sketch, no week-over-week distinct recount
    "q322_cumulative_reach" -> ((s, d) => {
      val firstW = Tables.events(s, d).groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("wk"))
      val weekly = firstW.groupBy(col("wk")).agg(count(lit(1)).as("n_new"))
      val w = Window.orderBy(col("wk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      weekly.select(col("wk").cast("date").cast("string").as("week"),
        col("n_new"), sum(col("n_new")).over(w).as("cum_reach"))
    }),

    // multi-touch attribution: each converting user's pre-conversion
    // view/click touches share the conversion credit under four models
    // at once (first / last / linear / halving time-decay). Credits are
    // integer parts-per-million — 10^6 div n and div 2^(p-1) are exact
    // integer folds in both engines, so the per-channel sums hash-match
    // regardless of shuffle order (no double credit splitting).
    // One user-partitioned window pass + one hash agg; at 100 TB the
    // journey windows stay per-user (no global sort anywhere).
    "q283_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val conv = ev.where(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("ts")).as("cts"))
      val touches = ev.join(conv, Seq("user_id"))
        .where(col("ts") < col("cts") &&
          col("event_type").isin("view", "click"))
        .select(col("user_id"), col("event_type").as("channel"),
          col("ts"), col("event_id"))
      val byUser = Window.partitionBy(col("user_id"))
      val asc = byUser.orderBy(col("ts"), col("event_id"))
      val desc = byUser.orderBy(col("ts").desc, col("event_id").desc)
      touches
        .withColumn("n", count(lit(1)).over(byUser))
        .withColumn("ra", row_number().over(asc))
        .withColumn("rd", row_number().over(desc))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_touches"),
          sum(when(col("ra") === 1, 1000000L).otherwise(0L))
            .as("first_touch_ppm"),
          sum(when(col("rd") === 1, 1000000L).otherwise(0L))
            .as("last_touch_ppm"),
          sum(expr("1000000 div n")).as("linear_ppm"),
          sum(when(col("rd") >= 21, 0L)
            .otherwise(expr("1000000 div (shiftleft(1, rd - 1))")))
            .as("decay_ppm"))
    }),

    // VWAP / TWAP per brand-month: volume-weighted vs unweighted average
    // price. price*qty folds as DECIMAL(37,4) (exact; scale <= 6 keeps
    // the DuckDB HUGEINT->DOUBLE cast lossless), divided as double at
    // readout. One broadcast dim join + one hash agg.
    "q284_vwap" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"),
          date_trunc("month", col("l_shipdate")).cast("date").cast("string")
            .as("month"))
        .agg(count(lit(1)).as("n_lines"),
          sum(money(col("l_extendedprice")) * money(col("l_quantity")))
            .cast("double").as("pq"),
          sum(money(col("l_quantity"))).cast("double").as("q"),
          sum(money(col("l_extendedprice"))).cast("double").as("p"))
        .select(col("p_brand"), col("month"), col("n_lines"),
          round(col("pq") / col("q"), 6).as("vwap"),
          round(col("p") / col("n_lines"), 6).as("twap"))
    }),

    // per-nation Gini coefficient of customer revenue concentration:
    // G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) with x ascending
    // (ties broken by custkey). Revenue folds as exact integer cents, so
    // the rank-weighted sums are bigint-exact; the only window is
    // partitioned by nation — no single-partition pass.
    "q285_gini" -> ((s, d) => {
      val per = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg((sum(money(col("o_totalprice"))) * 100).cast("long").as("cents"))
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("cents"), col("o_custkey"))
      per.withColumn("i", row_number().over(w))
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("cents")).as("s"),
          sum(col("i") * col("cents")).as("ws"))
        .select(col("nationkey"), col("n_cust"),
          round((lit(2.0) * col("ws").cast("double") -
            (col("n_cust") + 1).cast("double") * col("s").cast("double")) /
            (col("n_cust").cast("double") * col("s").cast("double")), 6)
            .as("gini"))
    }),

    // MATCH_RECOGNIZE-style event-sequence pattern matching: per user,
    // the time-ordered journey string of event-type initials is scanned
    // for non-overlapping funnel motifs view->(signup|click|error)*->
    // purchase plus the direct view->purchase bigram. The journey builds
    // as ONE ordered-concat aggregation (sort_array over (ts, event_id)
    // structs — the q07 concatByTime shape); the regex scan is row-local.
    // Alternation-free patterns make Java (Spark) and RE2 (DuckDB)
    // agree on leftmost non-overlapping matches.
    "q286_event_pattern" -> ((s, d) => {
      val j = Tables.events(s, d)
        .select(col("user_id"),
          struct(col("ts"), col("event_id"),
            substring(col("event_type"), 1, 1).as("ch")).as("st"))
        .groupBy(col("user_id"))
        .agg(concat_ws("", transform(sort_array(collect_list(col("st"))),
          x => x.getField("ch"))).as("journey"))
      j.select(col("user_id"), length(col("journey")).as("journey_len"),
        size(expr("regexp_extract_all(journey, 'v[sce]*p', 0)"))
          .cast("long").as("n_funnels"),
        size(expr("regexp_extract_all(journey, 'vp', 0)"))
          .cast("long").as("n_direct"))
    })
  )

  /** dHash-of-frame SQL macro: pixel (r, c) = hex byte c of
    * md5(<textExpr> || ':r'); mirrors Multimodal.dHash56 over the
    * frame-augmented payload bit-exactly. */
  private def dhashSql(textExpr: String): String = {
    def pix(r: Int, c: Int) =
      s"CAST(('0x' || substr(md5($textExpr || ':$r'), ${2 * c + 1}, 2)) AS BIGINT)"
    (for { r <- 0 until 7; c <- 0 until 8 } yield
      s"CASE WHEN ${pix(r, c + 1)} > ${pix(r, c)} THEN ${1L << (r * 8 + c)} ELSE 0 END")
      .mkString("\n             + ")
  }

  val oracles: Map[String, String] = Map(
    "q432_shapley_attribution" ->
      """WITH ch AS (SELECT user_id,
                       CASE event_type WHEN 'view' THEN 1
                         WHEN 'click' THEN 2 WHEN 'signup' THEN 4
                         WHEN 'error' THEN 8 ELSE 0 END AS c,
                       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                         AS p
                     FROM events),
          users AS (SELECT user_id, bit_or(c) AS mask,
                           CAST(max(p) AS BIGINT) AS conv
                    FROM ch GROUP BY 1),
          vm AS (SELECT mask, count(*) AS n_u,
                        CAST(sum(conv) AS BIGINT) AS n_conv
                 FROM users GROUP BY 1),
          grid AS (SELECT unnest(generate_series(0, 15)) AS mask),
          v AS (SELECT g.mask,
                       coalesce(CAST(round(CAST(n_conv AS DOUBLE) /
                         CAST(n_u AS DOUBLE) * 1e9) AS BIGINT), 0) AS vq
                FROM grid g LEFT JOIN vm ON g.mask = vm.mask),
          chans AS (SELECT * FROM (VALUES (1, 'view'), (2, 'click'),
                      (4, 'signup'), (8, 'error')) t(bit, channel)),
          pairs AS (SELECT c.channel,
                           (CASE bit_count(s.mask) WHEN 1 THEN 6
                             WHEN 2 THEN 2 WHEN 3 THEN 2 ELSE 6 END) *
                             (s.vq - s0.vq) AS t
                    FROM chans c
                    CROSS JOIN v s
                    JOIN v s0 ON s.mask - c.bit = s0.mask
                    WHERE (s.mask & c.bit) <> 0)
         SELECT channel,
                ROUND(CAST(sum(t) AS DOUBLE) / 24.0 / 1e9, 6) AS shapley
         FROM pairs GROUP BY 1""",
    "q367_abc_xyz" ->
      """WITH lines AS (
           SELECT l_partkey,
                  CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT) AS cents,
                  CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS q,
                  date_trunc('week', l_shipdate) AS wk
           FROM lineitem),
          rev AS (SELECT l_partkey, CAST(sum(cents) AS BIGINT) AS cents
                  FROM lines GROUP BY 1),
          wq AS (SELECT l_partkey, wk, CAST(sum(q) AS BIGINT) AS wq
                 FROM lines GROUP BY 1, 2),
          xyz AS (SELECT l_partkey, count(*) AS nw,
                         CAST(sum(wq) AS BIGINT) AS sq,
                         CAST(sum(wq * wq) AS BIGINT) AS sqq
                  FROM wq GROUP BY 1),
          xc AS (SELECT l_partkey,
                        CASE WHEN (nw * sqq - sq * sq) * 4 < sq * sq
                               THEN 'X'
                             WHEN nw * sqq - sq * sq < sq * sq THEN 'Y'
                             ELSE 'Z' END AS class_xyz
                 FROM xyz),
          ranked AS (SELECT l_partkey, cents,
                            sum(cents) OVER (ORDER BY cents DESC, l_partkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND
                              CURRENT ROW) AS row_cum,
                            sum(cents) OVER () AS tot
                     FROM rev),
          ac AS (SELECT l_partkey, cents, CAST(tot AS BIGINT) AS tot,
                        CASE WHEN row_cum * 100 <= tot * 80 THEN 'A'
                             WHEN row_cum * 100 <= tot * 95 THEN 'B'
                             ELSE 'C' END AS class_abc
                 FROM ranked)
         SELECT class_abc, class_xyz, count(*) AS n_parts,
                ROUND(CAST(sum(cents) AS DOUBLE) / max(tot), 6)
                  AS revenue_share
         FROM ac JOIN xc USING (l_partkey)
         GROUP BY 1, 2""",

    "q366_audience_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
          sizes AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
          inter AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                           count(*) AS n_both
                    FROM ut a JOIN ut b ON a.user_id = b.user_id
                                       AND a.event_type < b.event_type
                    GROUP BY 1, 2)
         SELECT type_a, type_b,
                sa.n AS n_a, sb.n AS n_b, n_both,
                ROUND(CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both), 6)
                  AS jaccard
         FROM inter
         JOIN sizes sa ON sa.event_type = type_a
         JOIN sizes sb ON sb.event_type = type_b""",

    "q349_ohlc_bars" ->
      """WITH r AS (
           SELECT event_type, CAST(ts AS DATE) AS day, value,
                  row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                     ORDER BY ts, event_id) AS ra,
                  row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                     ORDER BY ts DESC, event_id DESC) AS rd
           FROM events)
         SELECT event_type, CAST(day AS VARCHAR) AS day,
                max(CASE WHEN ra = 1 THEN value END) AS open,
                max(value) AS high, min(value) AS low,
                max(CASE WHEN rd = 1 THEN value END) AS close,
                count(*) AS volume,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS amount
         FROM r GROUP BY event_type, day""",

    "q351_growth_accounting" ->
      """WITH uw AS (SELECT DISTINCT user_id,
                            CAST(date_trunc('week', ts) AS DATE) AS wk
                     FROM events),
          st AS (SELECT user_id, wk,
                        lag(wk) OVER w AS prev, lead(wk) OVER w AS nxt
                 FROM uw WINDOW w AS (PARTITION BY user_id ORDER BY wk)),
          status AS (SELECT wk,
                            CASE WHEN prev IS NULL THEN 'new'
                                 WHEN date_diff('day', prev, wk) = 7
                                   THEN 'retained'
                                 ELSE 'resurrected' END AS status,
                            count(*) AS n
                     FROM st GROUP BY 1, 2),
          churn AS (SELECT wk + 7 AS wk, 'churned' AS status, count(*) AS n
                    FROM st
                    WHERE nxt IS NULL OR date_diff('day', wk, nxt) > 7
                    GROUP BY 1, 2),
          u AS (SELECT * FROM status UNION ALL SELECT * FROM churn)
         SELECT CAST(wk AS VARCHAR) AS wk,
                CAST(sum(CASE WHEN status = 'new' THEN n ELSE 0 END)
                  AS BIGINT) AS n_new,
                CAST(sum(CASE WHEN status = 'retained' THEN n ELSE 0 END)
                  AS BIGINT) AS n_retained,
                CAST(sum(CASE WHEN status = 'resurrected' THEN n ELSE 0 END)
                  AS BIGINT) AS n_resurrected,
                CAST(sum(CASE WHEN status = 'churned' THEN n ELSE 0 END)
                  AS BIGINT) AS n_churned
         FROM u GROUP BY wk""",

    "q344_varint_size" ->
      """WITH daily AS (
           SELECT event_type AS et, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                    AS cents
           FROM events GROUP BY 1, 2),
          dl AS (SELECT et,
                        cents - coalesce(lag(cents, 1) OVER
                          (PARTITION BY et ORDER BY day), 0) AS delta
                 FROM daily),
          zz AS (SELECT et, CASE WHEN delta >= 0 THEN delta * 2
                                 ELSE -delta * 2 - 1 END AS z
                 FROM dl),
          vb AS (SELECT et,
                        CASE WHEN z < 128 THEN 1
                             WHEN z < 16384 THEN 2
                             WHEN z < 2097152 THEN 3
                             WHEN z < 268435456 THEN 4
                             WHEN z < 34359738368 THEN 5
                             WHEN z < 4398046511104 THEN 6
                             WHEN z < 562949953421312 THEN 7
                             WHEN z < 72057594037927936 THEN 8
                             ELSE 9 END AS b
                 FROM zz)
         SELECT et AS event_type, count(*) AS n_days,
                CAST(count(*) * 8 AS BIGINT) AS raw_bytes,
                CAST(sum(b) AS BIGINT) AS varint_bytes,
                ROUND(CAST(sum(b) AS DOUBLE) / (count(*) * 8), 6) AS ratio
         FROM vb GROUP BY et""",

    // identical to q329's batch replay: the finite stream stitches to
    // the same per-user transition multiset as a batch lag
    "q332_stream_conformance" ->
      """WITH t AS (SELECT user_id, event_type AS curr,
                      lag(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS prev
                    FROM events),
          f AS (SELECT * FROM t WHERE prev IS NOT NULL),
          al AS (SELECT prev, curr, 1 AS ok FROM (VALUES
                   ('signup', 'view'), ('signup', 'signup'),
                   ('view', 'view'), ('view', 'click'),
                   ('click', 'click'), ('click', 'purchase'),
                   ('click', 'error'),
                   ('purchase', 'purchase'), ('purchase', 'error'),
                   ('purchase', 'view'), ('error', 'view')) v(prev, curr))
         SELECT user_id, count(*) AS n_transitions,
                CAST(sum(coalesce(ok, 0)) AS BIGINT) AS n_conforming,
                count(*) - CAST(sum(coalesce(ok, 0)) AS BIGINT)
                  AS n_violations,
                ROUND(CAST(sum(coalesce(ok, 0)) AS DOUBLE) / count(*), 6)
                  AS conformance
         FROM f LEFT JOIN al USING (prev, curr)
         GROUP BY user_id""",

    "q322_cumulative_reach" ->
      """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS wk
                    FROM events GROUP BY user_id),
          g AS (SELECT wk, count(*) AS n_new FROM f GROUP BY wk)
         SELECT CAST(CAST(wk AS DATE) AS VARCHAR) AS week, n_new,
                CAST(sum(n_new) OVER (ORDER BY wk) AS BIGINT) AS cum_reach
         FROM g""",

    "q283_attribution" ->
      """WITH conv AS (SELECT user_id, min(ts) AS cts FROM events
                       WHERE event_type = 'purchase' GROUP BY user_id),
          t AS (SELECT e.user_id, e.event_type AS channel, e.ts, e.event_id
                FROM events e JOIN conv ON e.user_id = conv.user_id
                WHERE e.ts < conv.cts AND e.event_type IN ('view', 'click')),
          r AS (SELECT channel,
                  count(*) OVER (PARTITION BY user_id) AS n,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS ra,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rd
                FROM t)
         SELECT channel, count(*) AS n_touches,
           CAST(sum(CASE WHEN ra = 1 THEN 1000000 ELSE 0 END) AS BIGINT)
             AS first_touch_ppm,
           CAST(sum(CASE WHEN rd = 1 THEN 1000000 ELSE 0 END) AS BIGINT)
             AS last_touch_ppm,
           CAST(sum(1000000 // n) AS BIGINT) AS linear_ppm,
           CAST(sum(CASE WHEN rd >= 21 THEN 0
                         ELSE 1000000 // (1 << (rd - 1)) END) AS BIGINT)
             AS decay_ppm
         FROM r GROUP BY channel""",

    "q284_vwap" ->
      """SELECT p_brand,
                CAST(CAST(date_trunc('month', l_shipdate) AS DATE) AS VARCHAR)
                  AS month,
                count(*) AS n_lines,
                ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                               CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) /
                      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6)
                  AS vwap,
                ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                      / count(*), 6) AS twap
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY 1, 2""",

    "q285_gini" ->
      """WITH per AS (SELECT o_custkey,
                             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                               AS BIGINT) AS cents
                      FROM orders GROUP BY o_custkey),
          r AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey, cents,
                  row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY cents, o_custkey) AS i
                FROM per JOIN customer ON o_custkey = c_custkey)
         SELECT nationkey, count(*) AS n_cust,
                ROUND((2.0 * CAST(sum(i * cents) AS DOUBLE) -
                       (count(*) + 1) * CAST(sum(cents) AS DOUBLE)) /
                      (count(*) * CAST(sum(cents) AS DOUBLE)), 6) AS gini
         FROM r GROUP BY nationkey""",

    "q286_event_pattern" ->
      """WITH j AS (SELECT user_id,
                           string_agg(substr(event_type, 1, 1), ''
                             ORDER BY ts, event_id) AS journey
                    FROM events GROUP BY user_id)
         SELECT user_id, CAST(length(journey) AS INT) AS journey_len,
                len(regexp_extract_all(journey, 'v[sce]*p')) AS n_funnels,
                len(regexp_extract_all(journey, 'vp')) AS n_direct
         FROM j""",

    "q228_ltv_curve" ->
      """WITH coh AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
                      FROM events GROUP BY user_id),
          sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_cohort
                 FROM coh GROUP BY cohort),
          sp AS (SELECT cohort,
                        CAST(floor(date_diff('day', CAST(cohort AS DATE),
                          CAST(ts AS DATE)) / 7) AS INT) AS week_idx,
                        sum(CAST(value AS DECIMAL(18,2))) AS rev
                 FROM events JOIN coh USING (user_id)
                 GROUP BY 1, 2),
          cw AS (SELECT cohort, week_idx, rev,
                        sum(rev) OVER (PARTITION BY cohort ORDER BY week_idx)
                          AS cum_rev
                 FROM sp)
          SELECT CAST(CAST(cohort AS DATE) AS VARCHAR) AS cohort, week_idx,
                 n_cohort, CAST(rev AS DOUBLE) AS week_rev,
                 ROUND(CAST(cum_rev AS DOUBLE) / CAST(n_cohort AS DOUBLE), 6)
                   AS ltv_per_user
          FROM cw JOIN sz USING (cohort)""",

    "q229_rfm" ->
      """WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS mx FROM orders),
          rfm AS (SELECT o_custkey,
                         date_diff('day', max(CAST(o_orderdate AS DATE)), mx)
                           AS recency_days,
                         CAST(count(*) AS BIGINT) AS f,
                         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS m
                  FROM orders, mx GROUP BY o_custkey, mx),
          q AS (SELECT o_custkey, recency_days, f, m,
                       ROUND(percent_rank() OVER (ORDER BY recency_days), 6) AS qr,
                       ROUND(percent_rank() OVER (ORDER BY f), 6) AS qf,
                       ROUND(percent_rank() OVER (ORDER BY m), 6) AS qm
                FROM rfm),
          sc AS (SELECT o_custkey, recency_days, f, CAST(m AS DOUBLE) AS m,
                        CAST(5 - least(floor(qr * 5), 4) AS INT) AS r_score,
                        CAST(least(floor(qf * 5), 4) + 1 AS INT) AS f_score,
                        CAST(least(floor(qm * 5), 4) + 1 AS INT) AS m_score
                 FROM q)
          SELECT o_custkey, recency_days, f, m, r_score, f_score, m_score,
                 CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                   || CAST(m_score AS VARCHAR) AS segment
          FROM sc""",

    "q230_seasonal_anomaly" ->
      """WITH s AS (SELECT event_type, CAST(ts AS DATE) AS day,
                           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS spend
                    FROM events GROUP BY 1, 2),
          t AS (SELECT event_type, day, spend,
                       CASE WHEN count(*) OVER w = 7
                            THEN CAST(sum(CAST(spend AS DECIMAL(28,6))) OVER w AS DOUBLE) / 7
                       END AS trend,
                       dayofweek(day) AS phase
                FROM s
                WINDOW w AS (PARTITION BY event_type ORDER BY day
                             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
          se AS (SELECT event_type, phase,
                        CAST(sum(CAST(spend - trend AS DECIMAL(28,12))) AS DOUBLE)
                          / count(*) AS seasonal
                 FROM t WHERE trend IS NOT NULL GROUP BY 1, 2),
          d AS (SELECT t.event_type AS key, t.day, ROUND(t.spend, 6) AS value,
                       ROUND(t.spend - t.trend - se.seasonal, 6) AS residual
                FROM t LEFT JOIN se
                  ON t.event_type = se.event_type AND t.phase = se.phase),
          iqr AS (SELECT key, quantile_cont(residual, 0.75)
                         - quantile_cont(residual, 0.25) AS riqr
                  FROM d WHERE residual IS NOT NULL GROUP BY key)
          SELECT d.key, CAST(d.day AS VARCHAR) AS day, d.value, d.residual,
                 ROUND(d.residual / iqr.riqr, 6) AS robust_z,
                 CAST(abs(d.residual / iqr.riqr) > 2.5 AS INT) AS is_anomaly
          FROM d JOIN iqr ON d.key = iqr.key
          WHERE d.residual IS NOT NULL""",

    "q231_conversion_time" ->
      """WITH f AS (SELECT user_id,
                           min(CASE WHEN event_type = 'view' THEN ts END) AS tv
                    FROM events GROUP BY user_id),
          p AS (SELECT f.user_id, tv,
                       min(CASE WHEN e.event_type = 'purchase'
                                AND epoch_us(e.ts) > epoch_us(tv)
                           THEN epoch_us(e.ts) END) AS tp
                FROM f JOIN events e ON f.user_id = e.user_id
                WHERE tv IS NOT NULL
                GROUP BY f.user_id, tv),
          c AS (SELECT CAST(tp - epoch_us(tv) AS DOUBLE) AS delay_us
                FROM p WHERE tp IS NOT NULL)
          SELECT CAST(count(*) AS BIGINT) AS n_converted,
                 ROUND(quantile_cont(delay_us, 0.5) / 1000000.0, 6) AS median_sec,
                 ROUND(quantile_cont(delay_us, 0.9) / 1000000.0, 6) AS p90_sec
          FROM c""",

    "q251_percentile_bands" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                ROUND(quantile_cont(o_totalprice, 0.1), 6) AS p10,
                ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
                ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90
         FROM orders GROUP BY o_orderpriority""",

    "q252_cycle_time" ->
      """WITH fs AS (SELECT l_orderkey, min(l_shipdate) AS ship
                     FROM lineitem GROUP BY l_orderkey),
          j AS (SELECT o_orderpriority,
                       CAST(date_diff('day', CAST(o_orderdate AS DATE),
                         CAST(ship AS DATE)) AS BIGINT) AS days
                FROM orders JOIN fs ON o_orderkey = l_orderkey)
          SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                 ROUND(CAST(sum(days) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                   AS mean_days,
                 ROUND(quantile_cont(days, 0.5), 6) AS median_days
          FROM j GROUP BY o_orderpriority""",

    "q249_running_balance" ->
      """WITH seqd AS (
           SELECT user_id,
                  list(CAST(CAST(CASE WHEN event_type = 'purchase'
                           THEN value ELSE -value * 0.25 END
                           AS DECIMAL(18,2)) * 100 AS BIGINT)
                       ORDER BY ts, event_id) AS arr
           FROM events GROUP BY user_id),
          f AS (SELECT user_id, len(arr) AS n,
                       list_reduce(list_prepend(CAST(0 AS BIGINT), arr),
                         (acc, e) -> greatest(acc + e, CAST(0 AS BIGINT))) AS bal
                FROM seqd)
          SELECT user_id, CAST(n AS INT) AS n,
                 ROUND(CAST(bal AS DOUBLE) / 100.0, 2) AS balance
          FROM f""",

    "q250_did" ->
      """WITH ev AS (SELECT (user_id % 2 = 1) AS treated,
                            (ts >= TIMESTAMP '2024-01-16 00:00:00') AS post,
                            CAST(value AS DECIMAL(18,6)) AS v
                     FROM events WHERE event_type = 'purchase'),
          cells AS (SELECT treated, post,
                           CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m
                    FROM ev GROUP BY 1, 2),
          w AS (SELECT
                  max(CASE WHEN treated AND NOT post THEN m END) AS tp,
                  max(CASE WHEN treated AND post THEN m END) AS tq,
                  max(CASE WHEN NOT treated AND NOT post THEN m END) AS cp,
                  max(CASE WHEN NOT treated AND post THEN m END) AS cq
                FROM cells)
          SELECT ROUND(tp, 6) AS treat_pre, ROUND(tq, 6) AS treat_post,
                 ROUND(cp, 6) AS ctrl_pre, ROUND(cq, 6) AS ctrl_post,
                 ROUND((tq - tp) - (cq - cp), 6) AS did
          FROM w""",

    "q245_group_weighted_sample" ->
      """WITH k AS (SELECT o_orderpriority AS g, o_orderkey AS id,
                           ln(CAST(CAST(('0x' || substr(md5('wsample:'
                               || CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) + 1
                               AS DOUBLE) / 1152921504606846976.0)
                             / o_totalprice AS sample_key
                    FROM orders),
          r AS (SELECT g, id, sample_key,
                       ROW_NUMBER() OVER (PARTITION BY g
                         ORDER BY sample_key DESC, id) AS rank
                FROM k)
          SELECT g, id, ROUND(sample_key, 6) + 0 AS sample_key, CAST(rank AS INT) AS rank
          FROM r WHERE rank <= 4""",

    "q246_control_chart" ->
      """WITH s0 AS (SELECT event_type AS g, CAST(ts AS DATE) AS day,
                           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,6)) AS x
                    FROM events GROUP BY 1, 2),
          s AS (SELECT * FROM s0 WHERE x IS NOT NULL),
          st AS (SELECT g, count(*) AS n, CAST(sum(x) AS DOUBLE) AS sx,
                        CAST(sum(CAST(x AS DECIMAL(25,6)) * CAST(x AS DECIMAL(25,6)))
                             AS DOUBLE) AS sxx
                 FROM s GROUP BY g),
          f AS (SELECT g, sx / CAST(n AS DOUBLE) AS mean,
                       sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
                         / (CAST(n AS DOUBLE) - 1.0)) AS sigma
                FROM st)
          SELECT s.g, CAST(day AS VARCHAR) AS bucket, CAST(x AS DOUBLE) AS value,
                 ROUND(mean, 6) AS mean, ROUND(sigma, 6) AS sigma,
                 CAST(abs(CAST(x AS DOUBLE) - mean) > 3.0 * sigma AS INT)
                   AS out_of_control
          FROM s JOIN f ON s.g = f.g""",

    "q248_column_fingerprint" ->
      """WITH p AS (
           SELECT 'l_quantity' AS col_name,
                  CAST(CAST(l_quantity AS DECIMAL(18,6)) AS VARCHAR) AS v FROM lineitem
           UNION ALL SELECT 'qty_alias',
                  CAST(CAST(l_quantity AS DECIMAL(18,6)) AS VARCHAR) FROM lineitem
           UNION ALL SELECT 'l_discount',
                  CAST(CAST(l_discount AS DECIMAL(18,6)) AS VARCHAR) FROM lineitem
           UNION ALL SELECT 'l_tax',
                  CAST(CAST(l_tax AS DECIMAL(18,6)) AS VARCHAR) FROM lineitem
           UNION ALL SELECT 'l_extendedprice',
                  CAST(CAST(l_extendedprice AS DECIMAL(18,6)) AS VARCHAR) FROM lineitem),
          ph AS (SELECT col_name,
                        CAST(('0x' || substr(md5('c:' || v), 1, 15)) AS BIGINT) AS h
                 FROM p WHERE v IS NOT NULL),
          prof AS (SELECT col_name, CAST(count(h) AS BIGINT) AS n_nonnull,
                          CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
                          sum(h) AS digest
                   FROM ph GROUP BY col_name),
          g AS (SELECT digest AS d2, n_nonnull AS nn2, min(col_name) AS dup_group
                FROM prof GROUP BY 1, 2)
          SELECT col_name, n_nonnull, n_distinct, dup_group
          FROM prof JOIN g ON prof.digest = g.d2 AND prof.n_nonnull = g.nn2""",

    "q242_snapshot_diff" ->
      """WITH old AS (SELECT o_orderkey,
                             md5('1' || chr(1) || o_orderstatus || chr(1) ||
                                 '1' || chr(1) ||
                                 CAST(CAST(CASE WHEN o_totalprice > 200000 THEN 0.0
                                      ELSE o_totalprice END AS DECIMAL(18,2)) AS VARCHAR))
                               AS h_old
                      FROM orders WHERE o_orderkey % 13 <> 0),
          nw AS (SELECT o_orderkey,
                        md5('1' || chr(1) || o_orderstatus || chr(1) ||
                            '1' || chr(1) ||
                            CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)) AS h_new
                 FROM orders),
          diff AS (SELECT coalesce(old.o_orderkey, nw.o_orderkey) AS key,
                          CASE WHEN old.o_orderkey IS NULL THEN 'added'
                               WHEN nw.o_orderkey IS NULL THEN 'removed'
                               WHEN h_old = h_new THEN 'unchanged'
                               ELSE 'changed' END AS status
                   FROM old FULL OUTER JOIN nw ON old.o_orderkey = nw.o_orderkey)
          SELECT o_orderpriority, status, CAST(count(*) AS BIGINT) AS n
          FROM diff LEFT JOIN orders ON diff.key = orders.o_orderkey
          GROUP BY 1, 2""",

    "q269_snapshot_column_diff" ->
      """WITH old AS (
            SELECT o_orderkey,
              CASE WHEN o_orderkey % 7 = 0 THEN NULL
                   ELSE o_orderstatus END AS o_st,
              CASE WHEN o_totalprice > 200000 THEN 0.0
                   ELSE o_totalprice END AS o_tp,
              o_orderpriority AS o_pr
            FROM orders WHERE o_orderkey % 13 <> 0),
          j AS (SELECT old.o_st, old.o_tp, old.o_pr,
                  n.o_orderstatus AS n_st, n.o_totalprice AS n_tp,
                  n.o_orderpriority AS n_pr
                FROM old JOIN orders n USING (o_orderkey)),
          a AS (SELECT count(*) AS n_common,
                  CAST(sum(CASE WHEN o_st IS DISTINCT FROM n_st
                       THEN 1 ELSE 0 END) AS BIGINT) AS c_st,
                  CAST(sum(CASE WHEN o_tp IS DISTINCT FROM n_tp
                       THEN 1 ELSE 0 END) AS BIGINT) AS c_tp,
                  CAST(sum(CASE WHEN o_pr IS DISTINCT FROM n_pr
                       THEN 1 ELSE 0 END) AS BIGINT) AS c_pr
                FROM j)
          SELECT 'o_orderstatus' AS "column", n_common AS n_common_keys,
            c_st AS n_changed,
            ROUND(CAST(c_st AS DOUBLE) / CAST(greatest(n_common, 1) AS DOUBLE), 6)
              AS changed_ratio FROM a
          UNION ALL
          SELECT 'o_totalprice', n_common, c_tp,
            ROUND(CAST(c_tp AS DOUBLE) / CAST(greatest(n_common, 1) AS DOUBLE), 6)
            FROM a
          UNION ALL
          SELECT 'o_orderpriority', n_common, c_pr,
            ROUND(CAST(c_pr AS DOUBLE) / CAST(greatest(n_common, 1) AS DOUBLE), 6)
            FROM a""",

    "q243_decay_score" ->
      """SELECT user_id AS entity, CAST(count(*) AS BIGINT) AS n_events,
                ROUND(CAST(sum(CAST(value * pow(2.0,
                    -(CAST(epoch_us(TIMESTAMP '2024-02-01 00:00:00')
                       - epoch_us(ts) AS DOUBLE) / 86400000000.0) / 7.0)
                  AS DECIMAL(18,12))) AS DOUBLE), 6) AS decay_score
         FROM events GROUP BY user_id""",

    "q244_data_contract" ->
      """WITH v AS (
           SELECT 'qty_in_range' AS rule,
                  CASE WHEN l_quantity BETWEEN 0 AND 60 THEN 0 ELSE 1 END AS viol
           FROM lineitem
           UNION ALL
           SELECT 'price_positive', CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END
           FROM lineitem
           UNION ALL
           SELECT 'discount_unit_interval',
                  CASE WHEN l_discount BETWEEN 0 AND 1 THEN 0 ELSE 1 END
           FROM lineitem
           UNION ALL
           SELECT 'returnflag_enum',
                  CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 0 ELSE 1 END
           FROM lineitem
           UNION ALL
           SELECT 'shipdate_window',
                  CASE WHEN l_shipdate BETWEEN TIMESTAMP '1992-01-01 00:00:00'
                       AND TIMESTAMP '2000-01-01 00:00:00' THEN 0 ELSE 1 END
           FROM lineitem)
          SELECT rule, CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(viol) AS BIGINT) AS n_violations,
                 ROUND(1.0 - CAST(sum(viol) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                   AS pass_rate
          FROM v GROUP BY rule""",

    "q239_stream_markov" ->
      """WITH seq AS (SELECT user_id, event_type AS cur,
                             lead(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS nxt
                      FROM events),
          p AS (SELECT cur, nxt, count(*) AS n FROM seq
                WHERE nxt IS NOT NULL GROUP BY 1, 2),
          m AS (SELECT cur, CAST(sum(n) AS BIGINT) AS rt FROM p GROUP BY cur)
          SELECT p.cur, p.nxt, p.n,
                 ROUND(CAST(p.n AS DOUBLE) / CAST(m.rt AS DOUBLE), 6) AS p
          FROM p JOIN m ON p.cur = m.cur""",

    "q240_sliding_distinct" ->
      """WITH ud AS (SELECT DISTINCT user_id AS e, CAST(ts AS DATE) AS day
                     FROM events),
          ends AS (SELECT DISTINCT day AS window_end FROM ud)
          SELECT CAST(window_end AS VARCHAR) AS window_end,
                 CAST(count(DISTINCT e) AS BIGINT) AS n_active
          FROM ends JOIN ud
            ON ud.day <= ends.window_end AND ud.day >= ends.window_end - 6
          GROUP BY ends.window_end""",

    "q241_join_cardinality" ->
      """WITH c AS (SELECT l_partkey AS k, count(*) AS c FROM lineitem
                    WHERE l_partkey IS NOT NULL GROUP BY 1),
          j AS (SELECT k, c * c AS contrib FROM c),
          t AS (SELECT CAST(sum(contrib) AS DOUBLE) AS est_rows,
                       CAST(count(*) AS BIGINT) AS n_joint_keys FROM j),
          r AS (SELECT k, contrib,
                       ROW_NUMBER() OVER (ORDER BY contrib DESC, k) AS rank
                FROM j)
          SELECT k AS key, CAST(contrib AS BIGINT) AS contrib,
                 CAST(rank AS INT) AS rank,
                 ROUND(CAST(contrib AS DOUBLE) / est_rows, 6) AS share,
                 CAST(est_rows AS BIGINT) AS est_rows, n_joint_keys
          FROM r, t WHERE rank <= 5""",

    "q234_scene_cuts" ->
      s"""WITH m AS (SELECT doc_id, text,
                            1 + CAST(('0x' || substr(md5(text), 9, 2)) AS INT) % 16
                              AS n_frames
                     FROM documents),
          fr AS (SELECT doc_id, text, CAST(unnest(range(0, n_frames, 2)) AS INT)
                          AS frame_idx
                 FROM m),
          h AS (SELECT doc_id, frame_idx,
                       ${dhashSql("text || ':f' || CAST(frame_idx AS VARCHAR)")}
                         AS fh
                FROM fr),
          l AS (SELECT doc_id, fh,
                       lag(fh) OVER (PARTITION BY doc_id ORDER BY frame_idx)
                         AS prev
                FROM h),
          d AS (SELECT doc_id,
                       CASE WHEN prev IS NOT NULL
                            THEN bit_count(xor(fh, prev)) END AS ham
                FROM l)
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sampled,
                 CAST(sum(CASE WHEN ham > 32 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_cuts,
                 ROUND(avg(ham), 6) AS mean_hamming
          FROM d GROUP BY doc_id""",

    "q233_pareto" ->
      """WITH per AS (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
                      FROM orders GROUP BY o_custkey),
          c AS (SELECT -rev AS v, count(*) AS c,
                       CAST(sum(rev) * 100 AS BIGINT) AS cents
                FROM per GROUP BY 1),
          cw AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum_c,
                        sum(cents) OVER (ORDER BY v) AS cum_cents
                 FROM c),
          t AS (SELECT CAST(sum(rev) * 100 AS BIGINT) AS tcents,
                       CAST(count(*) AS BIGINT) AS tn FROM per)
          SELECT CAST(min(CASE WHEN CAST(cum_cents AS DOUBLE)
                                    >= CAST(tcents AS DOUBLE) * 0.8
                          THEN cum_c END) AS BIGINT) AS n_for_80pct,
                 max(tn) AS n_customers,
                 ROUND(max(CASE WHEN cum_c <= CAST(CAST(tn AS DOUBLE) / 10.0 AS BIGINT)
                           THEN CAST(cum_cents AS DOUBLE) / CAST(tcents AS DOUBLE)
                           END), 6) AS top_decile_share
          FROM cw, t"""
  )
}
