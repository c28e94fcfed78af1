package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Itemsets, TimeSeries}

/** Oracle-gated pattern-mining and time-series-modeling queries:
  * FP-growth frequent itemsets (replayed exactly by a self-join
  * oracle), EWMA smoothing (list_reduce oracle), additive seasonal
  * decomposition (window-function oracle), and the ALS recommender
  * (rows-only; structural spec).
  */
object MiningQueries {

  type Q = (SparkSession, String) => DataFrame

  private def money(c: Column): Column = c.cast("decimal(18,2)")

  val queries: Map[String, Q] = Map(
    // Kleinberg two-state burst segmentation of each user's event
    // stream: Viterbi fold over inter-arrival seconds (base vs 2x
    // rate, entry toll 1.0) — emits best-path cost + burst-step count
    "q423_kleinberg_bursts" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        col("ts").cast("long").as("sec"))
      TimeSeries.kleinbergBursts(ev, col("user_id"), col("sec"),
        gamma = 1.0, burstFactor = 2.0)
        .withColumnRenamed("key", "user_id")
    }),

    // Markov entropy rate per state (how predictable is the next event
    // given the current one): per-state outgoing entropy with each
    // -p ln p term quantized to DECIMAL(18,12), plus the stationary
    // weight pi from transition marginals — q218's behavioral summary
    // condensed to a predictability score
    "q436_markov_entropy" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .where(col("nxt").isNotNull)
        .groupBy(col("event_type").as("cur"), col("nxt"))
        .agg(count(lit(1)).as("n_st"))
      val marg = pairs.groupBy(col("cur")).agg(sum(col("n_st")).as("n_s"))
      val tot = pairs.agg(sum(col("n_st")).as("n_tot"))
      val p = col("n_st").cast("double") / col("n_s").cast("double")
      val terms = pairs.join(broadcast(marg), Seq("cur"))
        .select(col("cur"), col("n_s"),
          (-(p * log(p))).cast("decimal(18,12)").as("e"))
      terms.groupBy(col("cur"), col("n_s"))
        .agg(round(sum(col("e")).cast("double"), 6).as("h_state"))
        .crossJoin(broadcast(tot))
        .select(col("cur").as("state"), col("n_s"),
          round(col("n_s").cast("double") / col("n_tot").cast("double"), 6)
            .as("pi"),
          col("h_state"))
    }),

    // association rules over per-order brand baskets (q193's input):
    // directed a->b confidence + lift from exact basket counts, with
    // the confidence >= 0.3 cut decided by integer cross-mult
    "q427_association_rules" -> ((s, d) => {
      val b = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("bid"), col("p_brand").as("item"))
        .distinct()
      val nb = b.agg(count_distinct(col("bid")).as("nb"))
      val singles = b.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
      val pairs = b.as("x").join(b.as("y"),
          col("x.bid") === col("y.bid") && col("x.item") =!= col("y.item"))
        .groupBy(col("x.item").as("ante"), col("y.item").as("cons"))
        .agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(singles.select(col("item").as("ante"),
          col("n_item").as("n_a"))), Seq("ante"))
        .join(broadcast(singles.select(col("item").as("cons"),
          col("n_item").as("n_c"))), Seq("cons"))
        .crossJoin(broadcast(nb))
        .where(col("n_ab") * 10 >= col("n_a") * 3 && col("n_ab") >= 30)
        .select(col("ante"), col("cons"), col("n_ab"),
          round(col("n_ab").cast("double") / col("n_a").cast("double"), 6)
            .as("confidence"),
          round(col("n_ab").cast("double") * col("nb").cast("double") /
            (col("n_a").cast("double") * col("n_c").cast("double")), 6)
            .as("lift"))
    }),

    // longest increasing subsequence of each customer's order-value
    // trajectory (patience fold) — the "sortedness" of spending growth
    "q424_lis_sortedness" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_custkey"),
        concat_ws("#", col("o_orderdate"),
          lpad(col("o_orderkey").cast("string"), 12, "0")).as("ord"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
          .as("cents"))
      TimeSeries.lisLength(o, col("o_custkey"), col("ord"), col("cents"))
        .withColumnRenamed("key", "o_custkey")
    }),
    // sequential pattern mining (PrefixSpan, ml.fpm): frequent event-type
    // subsequences of length <= 3 over per-(user, week) event sequences,
    // minSupport 0.5. The distributed fit is Spark's parallel PrefixSpan
    // (prefix-projected databases sharded across executors — the
    // sequence-dimension sibling of q193's parallel FP-growth). The
    // oracle replays support counts exactly via the min/max-position
    // dominance identities: t1<t2 in a sequence iff min_pos(t1) <
    // max_pos(t2), and t1<t2<t3 iff some occurrence p of t2 has
    // min_pos(t1) < p < max_pos(t3) — no positional self-join blowup.
    "q336_prefixspan" -> ((s, d) => {
      val seqs = Tables.events(s, d)
        .groupBy(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .agg(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))),
          x => array(x.getField("event_type"))).as("sequence"))
      new org.apache.spark.ml.fpm.PrefixSpan()
        .setMinSupport(0.5).setMaxPatternLength(3)
        .setSequenceCol("sequence")
        .findFrequentSequentialPatterns(seqs.select(col("sequence")))
        .select(array_join(flatten(col("sequence")), ">").as("pattern"),
          col("freq"))
    }),

    // additive Holt-Winters (triple exponential smoothing, period 7,
    // alpha=0.3 beta=0.1 gamma=0.2): level+trend+7 seasonal slots fold
    // sequentially per series as ONE struct accumulator over the
    // ordinal-indexed day array; the oracle carries the same 9 doubles
    // through a recursive CTE, every arithmetic op written in the same
    // order — the strongest differential in the time-series family.
    // Emits final level/trend, the 1-step forecast, and the seasonal
    // amplitude. Sequential per series, parallel across series.
    "q361_holt_winters" -> ((s, d) => {
      val a = 0.3; val be = 0.1; val g = 0.2
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(money(col("value"))).cast("double").as("y"))
      val seqd = daily.groupBy(col("event_type"))
        .agg(array_sort(collect_list(struct(col("day").as("t"),
          col("y").as("x")))).as("arr"))
        .withColumn("arr2", transform(col("arr"),
          (e, i) => struct(i.as("i"), e.getField("x").as("x"))))
      def sfield(acc: Column, j: Int): Column = acc.getField(s"s$j")
      val folded = aggregate(
        expr("slice(arr2, 2, size(arr2) - 1)"),
        struct(
          (element_at(col("arr"), 1).getField("x").as("l") +:
           lit(0.0).as("b") +:
           (0 to 6).map(j => lit(0.0).as(s"s$j"))): _*),
        (acc, e) => {
          val p = e.getField("i") % 7
          val sp = (1 to 6).foldLeft(sfield(acc, 0))((c, j) =>
            when(p === j, sfield(acc, j)).otherwise(c))
          val lp = lit(a) * (e.getField("x") - sp) +
            lit(1.0 - a) * (acc.getField("l") + acc.getField("b"))
          val bp = lit(be) * (lp - acc.getField("l")) +
            lit(1.0 - be) * acc.getField("b")
          val snew = lit(g) * (e.getField("x") - lp) + lit(1.0 - g) * sp
          struct(
            (lp.as("l") +: bp.as("b") +:
             (0 to 6).map(j =>
               when(p === j, snew).otherwise(sfield(acc, j)).as(s"s$j"))): _*)
        })
      val withSt = seqd.select(col("event_type"),
        size(col("arr")).as("n"), folded.as("st"))
      val nextP = col("n") % 7
      val sNext = (1 to 6).foldLeft(sfield(col("st"), 0))((c, j) =>
        when(nextP === j, sfield(col("st"), j)).otherwise(c))
      withSt.select(col("event_type"), col("n"),
        round(col("st").getField("l"), 6).as("level"),
        round(col("st").getField("b"), 6).as("trend"),
        round(col("st").getField("l") + col("st").getField("b") + sNext, 6)
          .as("forecast1"),
        round(greatest((0 to 6).map(j => sfield(col("st"), j)): _*) -
          least((0 to 6).map(j => sfield(col("st"), j)): _*), 6)
          .as("seas_amplitude"))
    }),

    // forecast-difficulty audit (MASE denominators): per-series mean
    // absolute error of the naive lag-1 and seasonal-naive lag-7
    // forecasts over daily cents — the scale factors every forecast
    // metric normalizes by. Diffs are exact integer cents; one window
    // per series, one agg.
    "q355_mase_baseline" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg((sum(money(col("value"))) * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      daily
        .withColumn("d1", abs(col("cents") - lag(col("cents"), 1).over(w)))
        .withColumn("d7", abs(col("cents") - lag(col("cents"), 7).over(w)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("d1")).as("s1"), count(col("d1")).as("n1"),
          sum(col("d7")).as("s7"), count(col("d7")).as("n7"))
        .select(col("event_type"), col("n_days"),
          round(col("s1").cast("double") / col("n1") / 100.0, 6)
            .as("mae_lag1"),
          round(col("s7").cast("double") / col("n7") / 100.0, 6)
            .as("mae_lag7"),
          round((col("s7").cast("double") / col("n7")) /
            (col("s1").cast("double") / col("n1")), 6).as("ratio"))
    }),

    // single change-point detection per series (binary-segmentation
    // step): the split k maximizing the CUSUM deviation |S_k|, computed
    // as the INTEGER |n*cum_k - k*tot| on exact cent sums (the same
    // argmax as the float k/n-normalized statistic, cross-multiplied to
    // dodge float ties), deterministic tiebreak on the earliest k. Two
    // windows over ONE per-series partitioning; no global sort.
    "q342_changepoint" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg((sum(money(col("value"))) * 100).cast("long").as("cents"))
      val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val wAll = Window.partitionBy(col("event_type"))
      daily.select(col("event_type"), col("day"),
          row_number().over(wOrd).as("k"),
          sum(col("cents")).over(wOrd.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)).as("cum"),
          count(lit(1)).over(wAll).as("n"),
          sum(col("cents")).over(wAll).as("tot"))
        .where(col("k") < col("n"))
        .withColumn("s", abs(col("n") * col("cum") - col("k") * col("tot")))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("event_type")).orderBy(col("s").desc, col("k"))))
        .where(col("rn") === 1)
        .select(col("event_type"), col("n").as("n_days"),
          col("k").as("split_idx"),
          col("day").cast("string").as("split_day"), col("s").as("stat"),
          round(col("cum").cast("double") / (col("k") * 100), 6)
            .as("pre_mean"),
          round((col("tot") - col("cum")).cast("double") /
            ((col("n") - col("k")) * 100), 6).as("post_mean"))
    }),

    // SAX-style symbolic series discretization: each event type's daily
    // spend series is PAA-compressed into 8 segments (seg = i*8 div n
    // over the day index) and each segment mean is classified against
    // the series mean into symbols a/b/c (<0.8x, ~, >1.2x). All
    // threshold decisions are integer CROSS-MULTIPLICATIONS on exact
    // cent sums (seg_sum*n_tot*5 vs tot_sum*n_seg*4|6) — no float
    // division anywhere, so the symbol string is engine- and
    // shuffle-order-exact. Windows partition per series only.
    "q337_sax_symbols" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg((sum(money(col("value"))) * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val seg = daily.select(col("event_type"), col("cents"),
          (row_number().over(w) - 1).as("i"),
          count(lit(1)).over(Window.partitionBy(col("event_type"))).as("n"))
        .withColumn("seg", expr("(i * 8) div n"))
      val segs = seg.groupBy(col("event_type"), col("seg"))
        .agg(sum(col("cents")).as("seg_cents"), count(lit(1)).as("seg_n"))
      val tot = seg.groupBy(col("event_type"))
        .agg(sum(col("cents")).as("tot_cents"), count(lit(1)).as("tot_n"))
      segs.join(tot, Seq("event_type"))
        .withColumn("sym",
          when(col("seg_cents") * col("tot_n") * 5 <
               col("tot_cents") * col("seg_n") * 4, lit("a"))
          .when(col("seg_cents") * col("tot_n") * 5 >
                col("tot_cents") * col("seg_n") * 6, lit("c"))
          .otherwise(lit("b")))
        .groupBy(col("event_type"))
        .agg(max(col("tot_n")).as("n_days"),
          array_join(transform(
            array_sort(collect_list(struct(col("seg"), col("sym")))),
            x => x.getField("sym")), "").as("sax"))
    }),

    // Holt linear-trend smoothing (double exponential, alpha=0.3
    // beta=0.2) of each event type's daily spend: level and trend fold
    // sequentially per series via the grouped-sort + aggregate() shape
    // of ewmaLevel, with a STRUCT accumulator (l, b); the oracle unrolls
    // the same recurrence op-for-op in a recursive CTE over the day
    // index, so every double operation happens in the same order in
    // both engines. Emits the final level/trend and a 3-step-ahead
    // forecast. Sequential per series, parallel across series.
    "q338_holt_linear" -> ((s, d) => {
      val a = 0.3; val be = 0.2
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(money(col("value"))).cast("double").as("y"))
      val seqd = daily.groupBy(col("event_type"))
        .agg(array_sort(collect_list(struct(col("day").as("t"),
          col("y").as("x")))).as("arr"))
      val folded = aggregate(
        expr("slice(arr, 2, size(arr) - 1)"),
        struct(element_at(col("arr"), 1).getField("x").as("l"),
          lit(0.0).as("b")),
        (acc, e) => {
          val lp = lit(a) * e.getField("x") +
            lit(1.0 - a) * (acc.getField("l") + acc.getField("b"))
          struct(lp.as("l"),
            (lit(be) * (lp - acc.getField("l")) +
             lit(1.0 - be) * acc.getField("b")).as("b"))
        })
      seqd.select(col("event_type"), size(col("arr")).as("n"),
          folded.as("st"))
        .select(col("event_type"), col("n"),
          round(col("st").getField("l"), 6).as("level"),
          round(col("st").getField("b"), 6).as("trend"),
          round(col("st").getField("l") + lit(3.0) * col("st").getField("b"), 6)
            .as("forecast3"))
    }),

    // per-user EWMA level of event values (alpha=0.3), folded in
    // (ts, event_id) order — sequential per series, parallel across
    "q191_ewma_level" -> ((s, d) => {
      TimeSeries.ewmaLevel(Tables.events(s, d), col("user_id"), col("ts"),
        col("event_id"), col("value"), alpha = 0.3)
    }),

    // STL-lite weekly decomposition of daily spend per event type:
    // trend = centered 7-day MA, seasonal = day-of-week mean of the
    // detrended series, residual = the rest
    "q192_seasonal_decompose" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(money(col("value"))).cast("double").as("spend"))
      TimeSeries.decompose(daily, col("event_type"), col("day"),
          col("spend"), period = 7, phase = dayofweek(col("day")))
        .withColumn("day", col("bucket").cast("string")).drop("bucket")
    }),

    // seasonal-strength readout per series: 1 − var(residual) /
    // var(seasonal+residual) over the decomposition — "how much of the
    // non-trend variation the weekly cycle explains". The rounded
    // decompose outputs are exact 6-decimal values, so the decimal
    // sufficient-stat folds are order-invariant.
    "q326_seasonal_strength" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(money(col("value"))).cast("double").as("spend"))
      val dec = TimeSeries.decompose(daily, col("event_type"), col("day"),
        col("spend"), period = 7, phase = dayofweek(col("day")))
      val r = dec.where(col("residual").isNotNull)
        .select(col("key"), col("residual").cast("decimal(18,6)").as("r"),
          (col("seasonal") + col("residual")).cast("decimal(18,6)").as("sr"))
      r.groupBy(col("key"))
        .agg(count(lit(1)).as("n"),
          sum(col("r")).as("s1"), sum(col("r") * col("r")).as("s2"),
          sum(col("sr")).as("t1"), sum(col("sr") * col("sr")).as("t2"))
        .select(col("key"), col("n"),
          round(greatest(lit(0.0), lit(1.0) -
            ((col("s2").cast("double") -
              col("s1").cast("double") * col("s1").cast("double") / col("n")) /
             (col("t2").cast("double") -
              col("t1").cast("double") * col("t1").cast("double") / col("n")))),
            6).as("seasonal_strength"))
    }),

    // frequent brand itemsets (size <= 2) across order baskets at 2%
    // support — PFP mines them, the oracle recounts singles + pairs
    "q193_frequent_itemsets" -> ((s, d) => {
      val basket = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("bid"), col("p_brand").as("item"))
      Itemsets.frequentItemsets(basket, col("bid"), col("item"),
        minSupport = 0.02, maxSize = 2)
    }),

    // k-means cluster assignments over the embedding corpus
    // (rows-only: cluster geometry is an iterative fit; canonicalized
    // labels + blob-recovery spec make the shape deterministic —
    // q530 is the exact hash-gated Lloyd companion)
    "q195_kmeans_assign" -> ((s, d) => {
      graft.operators.Clustering.kmeansAssign(Tables.embeddings(s, d),
        col("vec_id"), col("embedding"), k = 8)
    }),

    // ONE exact Lloyd round, bit-replayable (q195's hash-gated
    // companion): deterministic smallest-id seeds, integer argmin
    // assignment over 1e6-quantized coordinates, exact per-(cell,dim)
    // mean refit with a single HALF_UP re-quantization, re-assignment
    "q530_kmeans_lloyd_exact" -> ((s, d) => {
      graft.operators.Clustering.kmeansLloydExact(Tables.embeddings(s, d),
        col("vec_id"), col("embedding"), k = 8)
    }),

    // sequential-pattern support (GSP length-2): for every ordered
    // event-type pair (a then b), the fraction of users with some
    // a-event strictly before some b-event. "Exists a before b" needs
    // only each user's min(ts) per type vs max(ts) per type — one
    // (user,type)-keyed agg, then a user-co-keyed self-join whose
    // per-user fan-out is bounded by the type domain², never by event
    // count. Min-support 0.1 mirrors the itemset queries.
    "q538_seq_pattern_support" -> ((s, d) => {
      val ut = Tables.events(s, d).groupBy(col("user_id"), col("event_type"))
        .agg(min(col("ts")).as("tmin"), max(col("ts")).as("tmax"))
      val pairs = ut.as("a").join(ut.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") =!= col("b.event_type") &&
            col("a.tmin") < col("b.tmax"))
        .select(col("a.event_type").as("first_type"),
          col("b.event_type").as("then_type"))
      val nu = Tables.events(s, d)
        .agg(countDistinct(col("user_id")).as("n_users"))
      val raw = col("n_pattern_users").cast("double") /
        col("n_users").cast("double")
      pairs.groupBy(col("first_type"), col("then_type"))
        .agg(count(lit(1)).as("n_pattern_users"))
        .crossJoin(broadcast(nu))
        .where(raw >= 0.1) // filter on the UNROUNDED ratio, like the oracle
        .select(col("first_type"), col("then_type"),
          col("n_pattern_users"), col("n_users"),
          round(raw, 6).as("support"))
    }),

    // preference-consistency audit over q533's pairwise outcomes: how
    // many decided brand triads are CYCLIC (a beats b beats c beats a)
    // vs transitive — the intransitivity rate that tells an RLHF/eval
    // pipeline whether its pairwise judgments support a total ranking
    // at all. Decided edges (strict win majority) live on the bounded
    // brand domain, so the triangle joins are tiny equi-joins; each
    // cycle canonicalizes at its smallest node (counted once).
    "q554_preference_cycles" -> ((s, d) => {
      val pl = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("b"),
          col("l_quantity").cast("decimal(12,2)").as("q"))
      val dw = pl.as("a").join(pl.as("b"),
          col("a.ok") === col("b.ok") && col("a.b") =!= col("b.b") &&
            col("a.q") > col("b.q"))
        .groupBy(col("a.b").as("wi"), col("b.b").as("lo"))
        .agg(count(lit(1)).as("w"))
      // decided edge i -> j iff wins(i over j) > wins(j over i)
      val dec = dw.as("x").join(dw.as("y"),
          col("x.wi") === col("y.lo") && col("x.lo") === col("y.wi"), "left")
        .where(col("x.w") > coalesce(col("y.w"), lit(0L)))
        .select(col("x.wi").as("u"), col("x.lo").as("v"))
      val cyc = dec.as("e1")
        .join(dec.as("e2"), col("e1.v") === col("e2.u"))
        .join(dec.as("e3"), col("e2.v") === col("e3.u") &&
          col("e3.v") === col("e1.u"))
        .where(col("e1.u") < col("e1.v") && col("e1.u") < col("e2.v"))
        .agg(count(lit(1)).as("n_cyclic"))
      // transitive triads: a->b, b->c, a->c (each counted once as-is)
      val tr = dec.as("e1")
        .join(dec.as("e2"), col("e1.v") === col("e2.u"))
        .join(dec.as("e3"), col("e1.u") === col("e3.u") &&
          col("e2.v") === col("e3.v"))
        .agg(count(lit(1)).as("n_transitive"))
      val nd = dec.agg(count(lit(1)).as("n_decided"))
      cyc.crossJoin(tr).crossJoin(nd)
        .select(col("n_decided"), col("n_cyclic"), col("n_transitive"),
          round(col("n_cyclic").cast("double") /
            (col("n_cyclic") + col("n_transitive")).cast("double"), 6)
            .as("cycle_rate"))
    }),

    // Gonzalez farthest-point k-center coreset: the diverse-subset /
    // clustering-seed picker (2-approx to the optimal k-center cover);
    // deterministic smallest-id start, 7 argmax rounds over exact
    // integer distances, ties to the smaller id — every round unrolled
    // in the oracle
    "q550_kcenter_coreset" -> ((s, d) => {
      graft.operators.Clustering.kCenterGreedy(Tables.embeddings(s, d),
        col("vec_id"), col("embedding"), k = 8)
    }),

    // Bradley-Terry preference strengths from pairwise outcomes — the
    // aggregation an LLM-eval pipeline runs over judge votes. Games:
    // same-order lineitem pairs of different brands, higher quantity
    // wins, ties dropped. Two Hunter-MM rounds from uniform strengths:
    // p_i' = W_i / Σ_j n_ij/(p_i+p_j), every per-opponent term
    // 1e9-quantized to a long before the (order-free) sum, strengths
    // re-quantized each round, so the oracle unrolls both rounds
    // bit-for-bit. The only row-scaled pass is the order-keyed pair
    // count; the MM fold runs on the collected brand-domain²-bounded
    // wins matrix (≤ 625 rows — a fit scalar, the q455 pattern).
    "q533_bradley_terry" -> ((s, d) => {
      def halfUp(x: Double): Long =
        BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val pl = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("b"),
          col("l_quantity").cast("decimal(12,2)").as("q"))
      val dwRows = pl.as("a").join(pl.as("b"),
          col("a.ok") === col("b.ok") && col("a.b") =!= col("b.b") &&
            col("a.q") > col("b.q"))
        .groupBy(col("a.b").as("wi"), col("b.b").as("lo"))
        .agg(count(lit(1)).as("w"))
        .collect()
      require(dwRows.length <= 10000,
        s"bradley-terry item domain too large: ${dwRows.length} win pairs")
      val dw = dwRows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val n = scala.collection.mutable.HashMap.empty[(String, String), Long]
        .withDefaultValue(0L)
      dw.foreach { case ((i, j), w) => n((i, j)) += w; n((j, i)) += w }
      val items = n.keysIterator.map(_._1).toSeq.distinct.sorted
      val wins = items.map(i =>
        i -> dw.collect { case ((a, _), w) if a == i => w }.sum).toMap
      val games = items.map(i =>
        i -> n.collect { case ((a, _), g) if a == i => g }.sum).toMap
      var pq: Map[String, Long] = items.map(_ -> 1000000000L).toMap
      for (_ <- 1 to 2) {
        pq = items.map { i =>
          val pi = pq(i).toDouble / 1e9
          var s = 0L
          items.foreach { j =>
            val nij = n((i, j))
            if (j != i && nij > 0)
              s += halfUp(nij.toDouble / (pi + pq(j).toDouble / 1e9) * 1e9)
          }
          i -> halfUp(wins(i).toDouble / (s.toDouble / 1e9) * 1e9)
        }.toMap
      }
      import s.implicits._
      items.map(i => (i, wins(i), games(i), pq(i)))
        .toDF("brand", "wins", "games", "p2_q9")
    }),

    // ALS top-3 brand recommendations per customer from purchase
    // quantities (rows-only: factor values carry float jitter)
    "q194_als_recommend" -> ((s, d) => {
      val ratings = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy(col("o_custkey").as("user"),
          regexp_extract(col("p_brand"), "\\d+", 0).cast("int").as("item"))
        .agg(sum(col("l_quantity")).as("rating"))
      graft.workflow.MLTuning.alsRecommend(ratings, col("user"), col("item"),
        col("rating"), rank = 6, topK = 3)
    })
  )

  /** Shared decompose CTE chain (q192 + the q326 strength readout):
    * daily series -> centered 7-day trend -> per-phase seasonal ->
    * rounded output table `o`. */
  private val DECOMP_CTES =
    """s AS (SELECT event_type, CAST(ts AS DATE) AS day,
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
       o AS (SELECT t.event_type AS key, CAST(t.day AS VARCHAR) AS day,
                    ROUND(t.spend, 6) AS value, ROUND(t.trend, 6) AS trend,
                    ROUND(se.seasonal, 6) AS seasonal,
                    ROUND(t.spend - t.trend - se.seasonal, 6) AS residual
             FROM t LEFT JOIN se
               ON t.event_type = se.event_type AND t.phase = se.phase)"""

  val oracles: Map[String, String] = Map(
    "q550_kcenter_coreset" -> {
      val k = 8
      def dSql(ref: String) =
        s"""list_sum(list_transform(range(1, len(q.xq) + 1), i ->
           (q.xq[CAST(i AS INT)] - $ref.xq[CAST(i AS INT)]) *
           (q.xq[CAST(i AS INT)] - $ref.xq[CAST(i AS INT)])))"""
      val rounds = (2 to k).map { r =>
        val prev = (1 until r).map(i => if (i == 1) "c1" else s"r$i")
        val dm = if (prev.size == 1) dSql(prev.head)
                 else "least(" + prev.map(dSql).mkString(", ") + ")"
        s"""r$r AS (SELECT q.id, q.xq, CAST($dm AS BIGINT) AS dm
            FROM q ${prev.map(p => s"CROSS JOIN $p").mkString(" ")}
            ORDER BY dm DESC, q.id LIMIT 1)"""
      }.mkString(",\n          ")
      val sel = (Seq(
        "SELECT 1 AS round, id AS center_id, CAST(0 AS BIGINT) AS dmin_q FROM c1") ++
        (2 to k).map(r => s"SELECT $r, id, dm FROM r$r"))
        .mkString("\n         UNION ALL ")
      s"""WITH q AS (SELECT vec_id AS id,
                       list_transform(embedding, x ->
                         CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))
                         AS xq
                     FROM embeddings),
          c1 AS (SELECT id, xq FROM q ORDER BY id LIMIT 1),
          $rounds
         $sel"""
    },

    "q530_kmeans_lloyd_exact" ->
      """WITH q AS (SELECT vec_id,
                      list_transform(embedding, x ->
                        CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS xq
                    FROM embeddings),
          seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                           xq AS cq
                    FROM q ORDER BY vec_id LIMIT 8),
          d0 AS (SELECT q.vec_id, s.cell,
                   list_sum(list_transform(range(1, len(q.xq) + 1), i ->
                     (q.xq[CAST(i AS INT)] - s.cq[CAST(i AS INT)]) *
                     (q.xq[CAST(i AS INT)] - s.cq[CAST(i AS INT)]))) AS dd
                 FROM q CROSS JOIN seeds s),
          a0 AS (SELECT vec_id, cell AS cell0
                 FROM (SELECT vec_id, cell, ROW_NUMBER() OVER (
                         PARTITION BY vec_id ORDER BY dd, cell) AS rn
                       FROM d0) WHERE rn = 1),
          ex AS (SELECT a.cell0 AS cell, u.i AS dim, u.x AS xq
                 FROM a0 a JOIN q USING (vec_id),
                   LATERAL (SELECT unnest(list_transform(q.xq,
                     (x, i) -> {'i': i, 'x': x})) AS u)),
          mn AS (SELECT cell, dim,
                   CAST(round(CAST(sum(xq) AS DOUBLE) /
                     CAST(count(*) AS DOUBLE)) AS BIGINT) AS cq
                 FROM ex GROUP BY 1, 2),
          -- empty cells keep their seed coordinate
          cent1 AS (SELECT s.cell,
                      list(coalesce(m.cq, s.cq[CAST(g.dim AS INT)])
                           ORDER BY g.dim) AS cq
                    FROM seeds s
                    CROSS JOIN (SELECT unnest(range(1, 65)) AS dim) g
                    LEFT JOIN mn m ON m.cell = s.cell AND m.dim = g.dim
                    GROUP BY s.cell),
          d1 AS (SELECT q.vec_id, c.cell,
                   list_sum(list_transform(range(1, len(q.xq) + 1), i ->
                     (q.xq[CAST(i AS INT)] - c.cq[CAST(i AS INT)]) *
                     (q.xq[CAST(i AS INT)] - c.cq[CAST(i AS INT)]))) AS dd
                 FROM q CROSS JOIN cent1 c),
          a1 AS (SELECT vec_id, cell AS cell1,
                        CAST(dd AS BIGINT) AS dist1_q
                 FROM (SELECT vec_id, cell, dd, ROW_NUMBER() OVER (
                         PARTITION BY vec_id ORDER BY dd, cell) AS rn
                       FROM d1) WHERE rn = 1)
         SELECT a0.vec_id AS id, CAST(a0.cell0 AS INT) AS cell0,
                CAST(a1.cell1 AS INT) AS cell1, a1.dist1_q
         FROM a0 JOIN a1 USING (vec_id)""",

    "q538_seq_pattern_support" ->
      """WITH ut AS (SELECT user_id, event_type,
                       min(ts) AS tmin, max(ts) AS tmax
                     FROM events GROUP BY 1, 2),
          pr AS (SELECT a.event_type AS first_type,
                        b.event_type AS then_type
                 FROM ut a JOIN ut b
                   ON a.user_id = b.user_id
                     AND a.event_type <> b.event_type
                     AND a.tmin < b.tmax),
          nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
                 FROM events)
         SELECT first_type, then_type,
                CAST(count(*) AS BIGINT) AS n_pattern_users, n_users,
                ROUND(CAST(count(*) AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
                  AS support
         FROM pr CROSS JOIN nu
         GROUP BY 1, 2, 4
         HAVING CAST(count(*) AS DOUBLE) / CAST(n_users AS DOUBLE) >= 0.1""",

    "q554_preference_cycles" ->
      """WITH pl AS (SELECT l_orderkey AS ok, p_brand AS b,
                       CAST(l_quantity AS DECIMAL(12,2)) AS q
                     FROM lineitem JOIN part ON l_partkey = p_partkey),
          mt AS (SELECT a.b AS wi, b.b AS lo FROM pl a JOIN pl b
                 ON a.ok = b.ok AND a.b <> b.b AND a.q > b.q),
          dw AS (SELECT wi, lo, CAST(count(*) AS BIGINT) AS w
                 FROM mt GROUP BY 1, 2),
          dec AS (SELECT x.wi AS u, x.lo AS v
                  FROM dw x LEFT JOIN dw y
                    ON x.wi = y.lo AND x.lo = y.wi
                  WHERE x.w > coalesce(y.w, 0)),
          cyc AS (SELECT CAST(count(*) AS BIGINT) AS n_cyclic
                  FROM dec e1 JOIN dec e2 ON e1.v = e2.u
                    JOIN dec e3 ON e2.v = e3.u AND e3.v = e1.u
                  WHERE e1.u < e1.v AND e1.u < e2.v),
          tr AS (SELECT CAST(count(*) AS BIGINT) AS n_transitive
                 FROM dec e1 JOIN dec e2 ON e1.v = e2.u
                   JOIN dec e3 ON e1.u = e3.u AND e2.v = e3.v),
          nd AS (SELECT CAST(count(*) AS BIGINT) AS n_decided FROM dec)
         SELECT n_decided, n_cyclic, n_transitive,
                ROUND(CAST(n_cyclic AS DOUBLE) /
                  CAST(n_cyclic + n_transitive AS DOUBLE), 6) AS cycle_rate
         FROM cyc CROSS JOIN tr CROSS JOIN nd""",

    "q533_bradley_terry" ->
      """WITH pl AS (SELECT l_orderkey AS ok, p_brand AS b,
                       CAST(l_quantity AS DECIMAL(12,2)) AS q
                     FROM lineitem JOIN part ON l_partkey = p_partkey),
          mt AS (SELECT a.b AS wi, b.b AS lo FROM pl a JOIN pl b
                 ON a.ok = b.ok AND a.b <> b.b AND a.q > b.q),
          dw AS (SELECT wi, lo, count(*) AS w FROM mt GROUP BY 1, 2),
          un AS (SELECT i, j, CAST(sum(w) AS BIGINT) AS n FROM (
                   SELECT wi AS i, lo AS j, w FROM dw
                   UNION ALL SELECT lo, wi, w FROM dw) GROUP BY 1, 2),
          wt AS (SELECT wi AS i, CAST(sum(w) AS BIGINT) AS wins
                 FROM dw GROUP BY 1),
          it AS (SELECT i, CAST(sum(n) AS BIGINT) AS games
                 FROM un GROUP BY 1),
          s1 AS (SELECT i, CAST(sum(CAST(round(
                   CAST(n AS DOUBLE) / (1.0 + 1.0) * 1e9) AS BIGINT))
                   AS BIGINT) AS s
                 FROM un GROUP BY 1),
          p1 AS (SELECT s1.i, CAST(round(
                   CAST(coalesce(wins, 0) AS DOUBLE) /
                   (CAST(s AS DOUBLE) / 1e9) * 1e9) AS BIGINT) AS pq
                 FROM s1 LEFT JOIN wt ON wt.i = s1.i),
          s2 AS (SELECT un.i, CAST(sum(CAST(round(CAST(n AS DOUBLE) /
                   (CAST(pa.pq AS DOUBLE) / 1e9 +
                    CAST(pb.pq AS DOUBLE) / 1e9) * 1e9) AS BIGINT))
                   AS BIGINT) AS s
                 FROM un JOIN p1 pa ON pa.i = un.i
                   JOIN p1 pb ON pb.i = un.j
                 GROUP BY 1),
          p2 AS (SELECT s2.i, CAST(round(
                   CAST(coalesce(wins, 0) AS DOUBLE) /
                   (CAST(s AS DOUBLE) / 1e9) * 1e9) AS BIGINT) AS pq
                 FROM s2 LEFT JOIN wt ON wt.i = s2.i)
         SELECT p2.i AS brand, coalesce(wt.wins, 0) AS wins,
                it.games, p2.pq AS p2_q9
         FROM p2 JOIN it ON it.i = p2.i LEFT JOIN wt ON wt.i = p2.i""",

    "q423_kleinberg_bursts" ->
      """WITH ev AS (SELECT user_id AS k,
                            CAST(floor(epoch(ts)) AS BIGINT) AS t
                     FROM events),
          gp AS (SELECT k, t,
                        t - lag(t) OVER (PARTITION BY k ORDER BY t) AS g
                 FROM ev),
          gf AS (SELECT k, t, g FROM gp WHERE g IS NOT NULL AND g > 0),
          st AS (SELECT k, count(*) AS n, CAST(sum(g) AS BIGINT) AS sg,
                        list(CAST(g AS DOUBLE) ORDER BY t) AS gl
                 FROM gf GROUP BY k),
          pr AS (SELECT k, n, gl,
                        CAST(n AS DOUBLE) / CAST(sg AS DOUBLE) AS r0,
                        CAST(2.0 AS DOUBLE) *
                          (CAST(n AS DOUBLE) / CAST(sg AS DOUBLE)) AS r1,
                        CAST(CAST(-ln(CAST(n AS DOUBLE) /
                          CAST(sg AS DOUBLE)) AS DECIMAL(18,12)) AS DOUBLE)
                          AS ln0,
                        CAST(CAST(-ln(CAST(2.0 AS DOUBLE) *
                          (CAST(n AS DOUBLE) / CAST(sg AS DOUBLE)))
                          AS DECIMAL(18,12)) AS DOUBLE) AS ln1
                 FROM st WHERE n >= 2),
          f AS (SELECT k, n,
                  -- LIST state [c0, c1, b0, b1]: DuckDB's list_reduce
                  -- rebinds STRUCT accumulator fields in place from the
                  -- second step on, so a struct state would read
                  -- partially-updated values; list construction reads
                  -- the old accumulator throughout (probed behavior)
                  list_reduce(
                    list_prepend([CAST(0.0 AS DOUBLE),
                        CAST(1e18 AS DOUBLE), CAST(0.0 AS DOUBLE),
                        CAST(0.0 AS DOUBLE)],
                      list_transform(gl, v -> [v])),
                    (a, b) -> [
                      least(a[1], a[2]) + (ln0 + r0 * b[1]),
                      least(a[1] + 1.0, a[2]) + (ln1 + r1 * b[1]),
                      CASE WHEN a[1] <= a[2] THEN a[3] ELSE a[4] END,
                      (CASE WHEN a[1] + 1.0 <= a[2] THEN a[3]
                        ELSE a[4] END) + 1.0]) AS s
                FROM pr)
         SELECT k AS user_id, n AS n_gaps,
                ROUND(least(s[1], s[2]), 6) AS path_cost,
                CAST(CASE WHEN s[1] <= s[2] THEN s[3] ELSE s[4] END
                  AS BIGINT) AS n_burst_steps
         FROM f""",

    "q436_markov_entropy" ->
      """WITH pr AS (SELECT event_type AS cur,
                       lead(event_type) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS nxt
                     FROM events),
          pairs AS (SELECT cur, nxt, count(*) AS n_st
                    FROM pr WHERE nxt IS NOT NULL GROUP BY 1, 2),
          marg AS (SELECT cur, CAST(sum(n_st) AS BIGINT) AS n_s
                   FROM pairs GROUP BY 1),
          tot AS (SELECT CAST(sum(n_st) AS BIGINT) AS n_tot FROM pairs),
          terms AS (SELECT p.cur, m.n_s,
                      CAST(-(CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE) *
                        ln(CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE)))
                        AS DECIMAL(18,12)) AS e
                    FROM pairs p JOIN marg m USING (cur)),
          ps AS (SELECT cur, n_s,
                        ROUND(CAST(sum(e) AS DOUBLE), 6) AS h_state
                 FROM terms GROUP BY 1, 2)
         SELECT cur AS state, n_s,
                ROUND(CAST(n_s AS DOUBLE) / CAST(n_tot AS DOUBLE), 6)
                  AS pi,
                h_state
         FROM ps, tot""",

    "q427_association_rules" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bid, p_brand AS item
                    FROM lineitem JOIN part ON l_partkey = p_partkey),
          nb AS (SELECT CAST(count(DISTINCT bid) AS BIGINT) AS nb FROM b),
          singles AS (SELECT item, count(*) AS n_item FROM b GROUP BY 1),
          pairs AS (SELECT x.item AS ante, y.item AS cons,
                           count(*) AS n_ab
                    FROM b x JOIN b y ON x.bid = y.bid
                      AND x.item <> y.item
                    GROUP BY 1, 2)
         SELECT ante, cons, n_ab,
                ROUND(CAST(n_ab AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
                  AS confidence,
                ROUND(CAST(n_ab AS DOUBLE) * CAST(nb AS DOUBLE) /
                      (CAST(n_a AS DOUBLE) * CAST(n_c AS DOUBLE)), 6)
                  AS lift
         FROM pairs
         JOIN (SELECT item AS ante, n_item AS n_a FROM singles)
           USING (ante)
         JOIN (SELECT item AS cons, n_item AS n_c FROM singles)
           USING (cons), nb
         WHERE n_ab * 10 >= n_a * 3 AND n_ab >= 30""",

    "q424_lis_sortedness" ->
      """WITH o AS (SELECT o_custkey AS k,
                           CAST(o_orderdate AS VARCHAR) || '#' ||
                             lpad(CAST(o_orderkey AS VARCHAR), 12, '0')
                             AS ord,
                           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                             AS BIGINT) AS v
                    FROM orders),
          s AS (SELECT k, count(*) AS n, list(v ORDER BY ord) AS vs
                FROM o GROUP BY k),
          f AS (SELECT k, n, list_reduce(list_transform(vs, x -> [x]),
                  (a, b) -> CASE WHEN list_position(list_transform(a,
                      t -> t >= b[1]), true) > 0
                    THEN list_transform(a, (t, i) -> CASE WHEN i =
                      list_position(list_transform(a, t2 -> t2 >= b[1]),
                        true) THEN b[1] ELSE t END)
                    ELSE list_append(a, b[1]) END) AS tails
                FROM s)
         SELECT k AS o_custkey, n, CAST(len(tails) AS BIGINT) AS lis_len,
                ROUND(CAST(len(tails) AS DOUBLE) / CAST(n AS DOUBLE), 6)
                  AS sortedness
         FROM f""",
    "q336_prefixspan" ->
      """WITH pos AS (
           SELECT user_id, date_trunc('week', ts) AS wk, event_type AS t,
                  row_number() OVER (PARTITION BY user_id, date_trunc('week', ts)
                                     ORDER BY ts, event_id) AS p
           FROM events),
          nu AS (SELECT count(*) AS n
                 FROM (SELECT DISTINCT user_id, wk FROM pos)),
          mm AS (SELECT user_id, wk, t, min(p) AS mn, max(p) AS mx
                 FROM pos GROUP BY 1, 2, 3),
          p1 AS (SELECT t AS pattern, count(*) AS freq FROM mm GROUP BY t),
          p2 AS (SELECT a.t || '>' || b.t AS pattern, count(*) AS freq
                 FROM mm a JOIN mm b
                   ON a.user_id = b.user_id AND a.wk = b.wk AND a.mn < b.mx
                 GROUP BY 1),
          trip AS (SELECT DISTINCT c.user_id, c.wk, m1.t AS t1, c.t AS t2,
                          m3.t AS t3
                   FROM pos c
                   JOIN mm m1 ON m1.user_id = c.user_id AND m1.wk = c.wk
                             AND m1.mn < c.p
                   JOIN mm m3 ON m3.user_id = c.user_id AND m3.wk = c.wk
                             AND m3.mx > c.p),
          p3 AS (SELECT t1 || '>' || t2 || '>' || t3 AS pattern,
                        count(*) AS freq
                 FROM trip GROUP BY 1),
          u AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2
                UNION ALL SELECT * FROM p3)
         SELECT pattern, CAST(freq AS BIGINT) AS freq
         FROM u, nu WHERE freq >= CAST(ceil(0.5 * n) AS BIGINT)""",

    "q361_holt_winters" ->
      """WITH RECURSIVE
          p2 AS (SELECT CAST(0.3 AS DOUBLE) AS a, CAST(0.1 AS DOUBLE) AS be,
                        CAST(0.2 AS DOUBLE) AS g),
          daily AS (SELECT event_type AS k, CAST(ts AS DATE) AS day,
                           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                             AS y
                    FROM events GROUP BY 1, 2),
          seqd AS (SELECT k, y,
                          row_number() OVER (PARTITION BY k ORDER BY day) - 1
                            AS i,
                          count(*) OVER (PARTITION BY k) AS n
                   FROM daily),
          st AS (
            SELECT k, i, n, y AS l, CAST(0 AS DOUBLE) AS b,
                   CAST(0 AS DOUBLE) AS s0, CAST(0 AS DOUBLE) AS s1,
                   CAST(0 AS DOUBLE) AS s2, CAST(0 AS DOUBLE) AS s3,
                   CAST(0 AS DOUBLE) AS s4, CAST(0 AS DOUBLE) AS s5,
                   CAST(0 AS DOUBLE) AS s6
            FROM seqd WHERE i = 0
            UNION ALL
            SELECT k, i, n, lp AS l,
                   be * (lp - pl) + (1 - be) * pb AS b,
                   CASE WHEN p = 0 THEN g * (y - lp) + (1 - g) * sp
                        ELSE s0 END AS s0,
                   CASE WHEN p = 1 THEN g * (y - lp) + (1 - g) * sp
                        ELSE s1 END AS s1,
                   CASE WHEN p = 2 THEN g * (y - lp) + (1 - g) * sp
                        ELSE s2 END AS s2,
                   CASE WHEN p = 3 THEN g * (y - lp) + (1 - g) * sp
                        ELSE s3 END AS s3,
                   CASE WHEN p = 4 THEN g * (y - lp) + (1 - g) * sp
                        ELSE s4 END AS s4,
                   CASE WHEN p = 5 THEN g * (y - lp) + (1 - g) * sp
                        ELSE s5 END AS s5,
                   CASE WHEN p = 6 THEN g * (y - lp) + (1 - g) * sp
                        ELSE s6 END AS s6
            FROM (
              SELECT x.*, a * (y - sp) + (1 - a) * (pl + pb) AS lp
              FROM (
                SELECT st.k, s.i, s.n, s.y, st.l AS pl, st.b AS pb,
                       st.s0, st.s1, st.s2, st.s3, st.s4, st.s5, st.s6,
                       s.i % 7 AS p,
                       CASE s.i % 7 WHEN 1 THEN st.s1 WHEN 2 THEN st.s2
                            WHEN 3 THEN st.s3 WHEN 4 THEN st.s4
                            WHEN 5 THEN st.s5 WHEN 6 THEN st.s6
                            ELSE st.s0 END AS sp,
                       p2.a, p2.be, p2.g
                FROM st JOIN seqd s ON s.k = st.k AND s.i = st.i + 1, p2
              ) x
            ) y2
          )
         SELECT k AS event_type, CAST(n AS INT) AS n,
                ROUND(l, 6) AS level, ROUND(b, 6) AS trend,
                ROUND(l + b + CASE n % 7 WHEN 1 THEN s1 WHEN 2 THEN s2
                      WHEN 3 THEN s3 WHEN 4 THEN s4 WHEN 5 THEN s5
                      WHEN 6 THEN s6 ELSE s0 END, 6) AS forecast1,
                ROUND(greatest(s0, s1, s2, s3, s4, s5, s6) -
                      least(s0, s1, s2, s3, s4, s5, s6), 6)
                  AS seas_amplitude
         FROM st WHERE i = n - 1""",

    "q355_mase_baseline" ->
      """WITH daily AS (
           SELECT event_type AS et, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                    AS cents
           FROM events GROUP BY 1, 2),
          dd AS (SELECT et,
                        abs(cents - lag(cents, 1) OVER w) AS d1,
                        abs(cents - lag(cents, 7) OVER w) AS d7
                 FROM daily WINDOW w AS (PARTITION BY et ORDER BY day)),
          ag AS (SELECT et, count(*) AS n_days,
                        sum(d1) AS s1, count(d1) AS n1,
                        sum(d7) AS s7, count(d7) AS n7
                 FROM dd GROUP BY et)
         SELECT et AS event_type, n_days,
                ROUND(CAST(s1 AS DOUBLE) / n1 / 100.0, 6) AS mae_lag1,
                ROUND(CAST(s7 AS DOUBLE) / n7 / 100.0, 6) AS mae_lag7,
                ROUND((CAST(s7 AS DOUBLE) / n7) /
                      (CAST(s1 AS DOUBLE) / n1), 6) AS ratio
         FROM ag""",

    "q342_changepoint" ->
      """WITH daily AS (
           SELECT event_type AS et, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                    AS cents
           FROM events GROUP BY 1, 2),
          st AS (SELECT et, day,
                        row_number() OVER w AS k,
                        sum(cents) OVER (PARTITION BY et ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS cum,
                        count(*) OVER (PARTITION BY et) AS n,
                        sum(cents) OVER (PARTITION BY et) AS tot
                 FROM daily
                 WINDOW w AS (PARTITION BY et ORDER BY day)),
          sc AS (SELECT *, abs(n * cum - k * tot) AS s
                 FROM st WHERE k < n),
          r AS (SELECT *, row_number() OVER (PARTITION BY et
                            ORDER BY s DESC, k) AS rn
                FROM sc)
         SELECT et AS event_type, CAST(n AS BIGINT) AS n_days,
                CAST(k AS INT) AS split_idx, CAST(day AS VARCHAR) AS split_day,
                CAST(s AS BIGINT) AS stat,
                ROUND(CAST(cum AS DOUBLE) / (k * 100), 6) AS pre_mean,
                ROUND(CAST(tot - cum AS DOUBLE) / ((n - k) * 100), 6)
                  AS post_mean
         FROM r WHERE rn = 1""",

    "q337_sax_symbols" ->
      """WITH daily AS (
           SELECT event_type AS k, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                    AS cents
           FROM events GROUP BY 1, 2),
          idx AS (SELECT k, cents,
                         row_number() OVER (PARTITION BY k ORDER BY day) - 1
                           AS i,
                         count(*) OVER (PARTITION BY k) AS n
                  FROM daily),
          seg AS (SELECT k, cents, (i * 8) // n AS seg FROM idx),
          segs AS (SELECT k, seg, sum(cents) AS seg_cents,
                          count(*) AS seg_n
                   FROM seg GROUP BY 1, 2),
          tot AS (SELECT k, sum(cents) AS tot_cents, count(*) AS tot_n
                  FROM seg GROUP BY 1),
          sym AS (SELECT s.k, s.seg, t.tot_n,
                         CASE WHEN s.seg_cents * t.tot_n * 5 <
                                   t.tot_cents * s.seg_n * 4 THEN 'a'
                              WHEN s.seg_cents * t.tot_n * 5 >
                                   t.tot_cents * s.seg_n * 6 THEN 'c'
                              ELSE 'b' END AS sym
                  FROM segs s JOIN tot t ON s.k = t.k)
         SELECT k AS event_type, max(tot_n) AS n_days,
                string_agg(sym, '' ORDER BY seg) AS sax
         FROM sym GROUP BY k""",

    "q338_holt_linear" ->
      """WITH RECURSIVE
          p AS (SELECT CAST(0.3 AS DOUBLE) AS a, CAST(0.2 AS DOUBLE) AS be),
          daily AS (SELECT event_type AS k, CAST(ts AS DATE) AS day,
                           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                             AS y
                    FROM events GROUP BY 1, 2),
          seqd AS (SELECT k, y,
                          row_number() OVER (PARTITION BY k ORDER BY day)
                            AS i,
                          count(*) OVER (PARTITION BY k) AS n
                   FROM daily),
          st AS (
            SELECT k, i, n, y AS l, CAST(0 AS DOUBLE) AS b
            FROM seqd WHERE i = 1
            UNION ALL
            SELECT s.k, s.i, s.n,
                   p.a * s.y + (1 - p.a) * (st.l + st.b),
                   p.be * ((p.a * s.y + (1 - p.a) * (st.l + st.b)) - st.l)
                     + (1 - p.be) * st.b
            FROM st JOIN seqd s ON s.k = st.k AND s.i = st.i + 1, p
          )
         SELECT k AS event_type, CAST(n AS INT) AS n,
                ROUND(l, 6) AS level, ROUND(b, 6) AS trend,
                ROUND(l + 3.0 * b, 6) AS forecast3
         FROM st WHERE i = n""",

    "q191_ewma_level" ->
      """SELECT user_id AS key, count(*) AS n,
                ROUND(list_reduce(list(CAST(value AS DOUBLE) ORDER BY ts, event_id),
                  (acc, x) -> acc * (1.0 - 0.3) + x * 0.3), 6) AS ewma
         FROM events GROUP BY user_id""",

    "q192_seasonal_decompose" ->
      s"""WITH $DECOMP_CTES
          SELECT key, day, value, trend, seasonal, residual FROM o""",

    "q326_seasonal_strength" ->
      s"""WITH $DECOMP_CTES,
          r AS (SELECT key, CAST(residual AS DECIMAL(25,6)) AS r,
                       CAST(seasonal + residual AS DECIMAL(25,6)) AS sr
                FROM o WHERE residual IS NOT NULL)
          SELECT key, count(*) AS n,
            ROUND(greatest(0.0, 1.0 -
              ((CAST(sum(r * r) AS DOUBLE) -
                CAST(sum(r) AS DOUBLE) * CAST(sum(r) AS DOUBLE) / count(*)) /
               (CAST(sum(sr * sr) AS DOUBLE) -
                CAST(sum(sr) AS DOUBLE) * CAST(sum(sr) AS DOUBLE) / count(*)))),
              6) AS seasonal_strength
          FROM r GROUP BY key""",

    "q193_frequent_itemsets" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bid, p_brand AS item
                    FROM lineitem JOIN part ON l_partkey = p_partkey),
          tot AS (SELECT CAST(ceil(0.02 * count(DISTINCT bid)) AS BIGINT) AS minc FROM b),
          singles AS (SELECT item AS itemset, 1 AS k, count(*) AS n_baskets
                      FROM b GROUP BY item),
          pairs AS (SELECT x.item || '|' || y.item AS itemset, 2 AS k,
                           count(*) AS n_baskets
                    FROM b x JOIN b y ON x.bid = y.bid AND x.item < y.item
                    GROUP BY 1)
          SELECT itemset, k, n_baskets
          FROM (SELECT * FROM singles UNION ALL SELECT * FROM pairs), tot
          WHERE n_baskets >= minc"""
  )
}
