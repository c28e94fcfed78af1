package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{Tables, AggregateReader, ConditionalReader, JoinedReader, AggSpec, CutOff, TimeStampToKeep}
import graft.aggregators.MonoidAggregators
import graft.functions.{MathFunctions => M, DateFunctions => D}

/** Oracle-gated queries for the relational core of SURVEY §2: scans &
  * projections (§2.1-2.2), monoid aggregations with event-time cutoffs
  * (§2.3), joins incl. secondary aggregation (§2.4), and the scalar math /
  * date function library (§2.5).
  *
  * Float determinism convention (both here and in the DuckDB oracle):
  * money-like sums run over DECIMAL(18,2) (exact, order-independent) and
  * are cast to DOUBLE at the end; irrational scalar outputs are rounded
  * to a fixed number of digits.
  */
object RelationalQueries {

  private def money(c: Column): Column = c.cast("decimal(18,2)")
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // revenue recognition proration: each line's net revenue is spread
    // across the calendar months between order and ship month with
    // largest-remainder integer apportionment (base = cents div n,
    // the first cents%n months get +1) — allocations are exact longs,
    // sum(alloc) == cents per line by construction, so the fold is
    // shuffle-order-proof with no decimal division anywhere. The month
    // spine is a per-row sequence() explode (bounded by the order->ship
    // span, ~months), never a calendar cross join.
    "q335_revenue_proration" -> ((s, d) => {
      val li = broadcast(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderdate")))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .cast("long").as("cents"),
          trunc(least(col("o_orderdate"), col("l_shipdate")).cast("date"),
            "month").as("m0"),
          trunc(greatest(col("o_orderdate"), col("l_shipdate")).cast("date"),
            "month").as("m1"))
        .withColumn("n", months_between(col("m1"), col("m0")).cast("long") + 1L)
      // regroup BEFORE the explode: lines sharing (start month, span,
      // cents mod n) prorate identically up to their base sums, so the
      // month fan-out runs over the |months|^2-bounded group table —
      // never cents-per-line rows x span months (a 20M-row explode at
      // sf0.1, unbounded at 100 TB)
      val g = li.groupBy(col("m0"), col("n"),
          (col("cents") % col("n")).as("r"))
        .agg(sum(expr("cents div n")).as("sb"), count(lit(1)).as("c"))
      g.select(col("m0"), col("n"), col("r"), col("sb"), col("c"),
          posexplode(sequence(lit(0), (col("n") - 1).cast("int"))))
        .select(add_months(col("m0"), col("col")).cast("string").as("month"),
          (col("sb") + when(col("col") < col("r"), col("c")).otherwise(0L))
            .as("rc"),
          col("c"))
        .groupBy(col("month"))
        .agg(sum(col("rc")).as("recognized_cents"),
          sum(col("c")).as("n_lines"))
    }),

    // popularity-backfill recommender (the cold-start baseline next to
    // q194's ALS): each customer gets the top-3 parts popular in their
    // NATION that they have not bought. Nation top-10 candidate lists
    // come from per-nation windows (25 bounded partitions), the
    // already-bought exclusion is one composite-key anti-join, and the
    // final per-customer rank re-ranks at most 10 candidate rows each.
    "q368_popularity_recs" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val custNation = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))
      // bought is referenced twice (popularity rollup + the already-
      // bought anti-join): cache it, or the orders⋈lineitem build and
      // its distinct run twice
      val bought = broadcast(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey")))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c_custkey"), col("l_partkey")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pop = bought.join(broadcast(custNation), Seq("c_custkey"))
        .groupBy(col("c_nationkey"), col("l_partkey"))
        .agg(count(lit(1)).as("cnt"))
      val cand = pop.withColumn("r", row_number().over(
          Window.partitionBy(col("c_nationkey"))
            .orderBy(col("cnt").desc, col("l_partkey"))))
        .where(col("r") <= 10)
      custNation.join(cand, Seq("c_nationkey"))
        .join(bought, Seq("c_custkey", "l_partkey"), "left_anti")
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("c_custkey"))
            .orderBy(col("cnt").desc, col("l_partkey"))))
        .where(col("rank") <= 3)
        .select(col("c_custkey"), col("rank"),
          col("l_partkey").as("rec_part"), col("cnt").as("popularity"))
    }),

    // global-customer audit (TPC-H Q22 shape): customers with an
    // above-positive-average balance and NO orders, per nation — the
    // correlated-average scalar rides a 1-row broadcast frame, the
    // "no orders" NOT EXISTS is one anti-join
    "q369_idle_rich_customers" -> ((s, d) => {
      val avgPos = Tables.customer(s, d).where(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_bal"))
      Tables.customer(s, d)
        .join(Tables.orders(s, d).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .crossJoin(broadcast(avgPos))
        .where(col("c_acctbal") > col("avg_bal"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("total_bal"))
    }),

    // nested-aggregate semi-join (TPC-H Q20 shape): suppliers that
    // DOMINATE at least one part (>30% of that part's total shipped
    // quantity). Two stacked aggregates on the same key prefix — the
    // (part, supp) rollup feeds the part totals, so the second agg
    // reuses the first's shuffle — and the share test is an exact
    // integer cross-multiplication (sq*10 > tq*3).
    "q372_dominant_suppliers" -> ((s, d) => {
      val ps = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg((sum(col("l_quantity").cast("decimal(18,2)")) * 100)
          .cast("long").as("sq"))
      val pt = ps.groupBy(col("l_partkey")).agg(sum(col("sq")).as("tq"))
      ps.join(pt, Seq("l_partkey"))
        .where(col("sq") * 10 > col("tq") * 3)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_dominant_parts"),
          sum(col("sq")).as("dominant_qty_cents"))
    }),

    // null-safe equality join (<=> / IS NOT DISTINCT FROM): the return
    // flag nulled for 'N' joins a dim that carries an explicit NULL
    // row — null keys MATCH the null dim row instead of dropping, the
    // SQL-surface semantics an outer-join rewrite gets wrong
    "q373_nullsafe_join" -> ((s, d) => {
      val s2 = s; import s2.implicits._
      val dim = Seq((Option("A"), "accepted"), (Option("R"), "returned"),
        (Option.empty[String], "pending")).toDF("flag", "status")
      Tables.lineitem(s, d)
        .select(nullif(col("l_returnflag"), lit("N")).as("lflag"),
          money(col("l_extendedprice")).as("rev"))
        .join(broadcast(dim), col("lflag") <=> dim("flag"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("rev")).cast("double").as("revenue"))
    }),

    // correlated scalar-subquery decorrelation (TPC-H Q17 shape): lines
    // whose quantity is below half their PART's average quantity, with
    // per-part small-order revenue. Spark-first the correlation is a
    // keyed aggregate joined back on the part key — two shuffles on the
    // same key, no per-row subquery; at 100 TB both sides stay keyed on
    // l_partkey so AQE can pick sort-merge vs broadcast by stats.
    "q339_small_order_revenue" -> ((s, d) => {
      val avgq = Tables.lineitem(s, d).groupBy(col("l_partkey"))
        .agg((sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_qty"))
      Tables.lineitem(s, d).join(avgq, Seq("l_partkey"))
        .where(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_small"),
          sum(money(col("l_extendedprice"))).cast("double")
            .as("small_revenue"))
    }),

    // EXISTS / NOT-EXISTS chain (TPC-H Q21 shape): per supplier, the
    // number of multi-supplier orders where THEY were the only late
    // shipper (>90 days after the order date). Spark-first the
    // correlated exists-pair collapses into ONE per-order aggregate
    // (distinct suppliers, distinct late suppliers, the sole late key)
    // — a single shuffle on the order key instead of two correlated
    // semi/anti probes; the oracle keeps the classic EXISTS/NOT EXISTS
    // formulation as the differential.
    "q340_sole_late_supplier" -> ((s, d) => {
      val li = broadcast(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderdate")))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey").as("ok"), col("l_suppkey").as("sk"),
          (col("l_shipdate").cast("date") >
           date_add(col("o_orderdate").cast("date"), 90)).as("late"))
      li.groupBy(col("ok"))
        .agg(count_distinct(col("sk")).as("n_supp"),
          count_distinct(when(col("late"), col("sk"))).as("n_late_supp"),
          min(when(col("late"), col("sk"))).as("late_supp"))
        .where(col("n_supp") > 1 && col("n_late_supp") === 1)
        .groupBy(col("late_supp").as("s_suppkey"))
        .agg(count(lit(1)).as("numwait"))
    }),

    // ---- §2.1/§2.2 scan + projection + row filter -----------------------
    "q01_scan_filter_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .where(col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"),
          (money(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - money(col("l_discount"))))
            .cast("double").as("revenue"))
    }),

    // per-row conditional projection: filter-with-default / exists /
    // replace / occurs (reference RichFeature.scala:61-179)
    "q02_row_transforms" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") > 25, col("l_quantity")).otherwise(lit(0.0)).as("qty_filtered"),
        (col("l_discount") > 0.05).as("has_big_discount"),
        when(col("l_returnflag") === "N", lit("NONE")).otherwise(col("l_returnflag")).as("flag_replaced"),
        when(col("l_tax") > 0.03, 1.0).otherwise(0.0).as("high_tax_occurs"))
    }),

    // ---- §2.3 monoid aggregations ---------------------------------------
    "q03_agg_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(money(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - money(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (sum(money(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    "q04_agg_minmax_mean" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          MonoidAggregators.minOf(col("value")).as("min_value"),
          MonoidAggregators.maxOf(col("value")).as("max_value"),
          sum(money(col("value"))).cast("double").as("sum_value"),
          count(lit(1)).as("n"))
    }),

    "q05_agg_logical" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.groupBy(col("user_id")).agg(
        MonoidAggregators.logicalOr(col("value") > 400).as("any_big"),
        MonoidAggregators.logicalAnd(col("value") > 1).as("all_over_one"),
        MonoidAggregators.logicalXor(col("event_type") === "purchase").as("odd_purchases"))
    }),

    "q06_agg_first_last" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.groupBy(col("user_id")).agg(
        MonoidAggregators.firstByTime(col("event_type"), col("ts")).as("first_event"),
        MonoidAggregators.lastByTime(col("event_type"), col("ts")).as("last_event"),
        MonoidAggregators.firstByTime(col("value"), col("ts")).as("first_value"),
        MonoidAggregators.lastByTime(col("value"), col("ts")).as("last_value"))
    }),

    "q07_agg_concat_by_time" -> ((s, d) => {
      Tables.events(s, d)
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(MonoidAggregators.concatByTime(col("event_type"), col("ts")).as("purchase_trail"))
    }),

    "q08_agg_mode" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(MonoidAggregators.modeString(col("event_type")).as("mode_event"))
    }),

    "q09_agg_set_union" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(array_join(MonoidAggregators.unionSet(col("event_type")), ",").as("event_types"))
    }),

    // event-time cutoff aggregation (reference FeatureAggregator.scala:105-130)
    "q10_agg_cutoff" -> ((s, d) => {
      AggregateReader.aggregateWithCutoff(
        Tables.events(s, d),
        key = col("user_id"), ts = col("ts"),
        cutoff = CutOff.At("2024-01-15 00:00:00"),
        predictors = Seq(
          AggSpec("pred_sum_value", sum, money(col("value"))),
          AggSpec("pred_n", count, lit(1))),
        responses = Seq(
          AggSpec("resp_n_purchases", count, when(col("event_type") === "purchase", lit(1)))))
        .withColumn("pred_sum_value", col("pred_sum_value").cast("double"))
    }),

    // conditional / as-of aggregation (reference DataReader.scala:303-384)
    "q11_agg_asof_conditional" -> ((s, d) => {
      ConditionalReader.aggregateAsOf(
        Tables.events(s, d),
        key = col("user_id"), ts = col("ts"),
        targetCondition = col("event_type") === "purchase",
        keep = TimeStampToKeep.Min,
        predictors = Seq(
          AggSpec("pred_sum_value", sum, money(col("value"))),
          AggSpec("pred_n_events", count, lit(1))),
        responses = Seq(
          AggSpec("resp_n_events", count, lit(1))))
        .withColumn("pred_sum_value", col("pred_sum_value").cast("double"))
    }),

    // ---- §2.4 joins ------------------------------------------------------
    "q12_join_broadcast_agg" -> ((s, d) => {
      val o = Tables.orders(s, d); val c = Tables.customer(s, d)
      JoinedReader.join(o, c, col("o_custkey"), col("c_custkey"), "inner", broadcastRight = true)
        .groupBy(col("c_mktsegment"))
        .agg(sum(money(col("o_totalprice"))).cast("double").as("segment_revenue"),
             count(lit(1)).as("n_orders"))
    }),

    "q13_join_left_outer" -> ((s, d) => {
      val c = Tables.customer(s, d); val o = Tables.orders(s, d)
      JoinedReader.join(c, o, col("c_custkey"), col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
             coalesce(sum(money(col("o_totalprice"))).cast("double"), lit(0.0)).as("total_spend"))
    }),

    "q14_join_multiway" -> ((s, d) => {
      val c = Tables.customer(s, d); val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d); val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d); val r = Tables.region(s, d)
      // two key-partitioned shuffles (c⋈o on custkey, ⋈l on orderkey);
      // supplier/nation/region are true dimensions — broadcast, so the
      // fact side never reshuffles on suppkey
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(money(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - money(col("l_discount"))))
          .cast("double").as("revenue"))
    }),

    // post-join secondary (windowed) aggregation
    // (reference JoinedDataReader.scala:234-347)
    "q15_join_secondary_agg" -> ((s, d) => {
      val o = Tables.orders(s, d); val l = Tables.lineitem(s, d)
      val joined = JoinedReader.join(o, l, col("o_orderkey"), col("l_orderkey"), "inner")
      JoinedReader.secondaryAggregate(
        joined,
        key = col("o_orderkey"),
        parentSide = Seq("o_totalprice" -> col("o_totalprice")),
        manySide = Seq(
          AggSpec("early_ship_revenue", sum, money(col("l_extendedprice"))),
          AggSpec("early_ship_items", count, lit(1))),
        ts = col("l_shipdate"),
        cutoff = col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        window = Some(expr("INTERVAL 30 DAYS")))
        .withColumn("early_ship_revenue", col("early_ship_revenue").cast("double"))
    }),

    // ---- §2.5 scalar math / date functions -------------------------------
    "q16_math_functions" -> ((s, d) => {
      val p = Tables.part(s, d)
      p.select(
        col("p_partkey"),
        M.absOf(col("p_retailprice") - 1000).as("abs_centered"),
        M.ceilOf(col("p_retailprice")).cast("long").as("ceil_price"),
        M.floorOf(col("p_retailprice")).cast("long").as("floor_price"),
        M.roundTo(M.sqrtOf(col("p_retailprice")), 6).as("sqrt_price"),
        M.roundTo(M.expOf(col("p_size") / 25.0), 6).as("exp_size"),
        M.roundTo(M.logBase(10.0, col("p_retailprice")), 6).as("log10_price"),
        M.roundTo(M.powerOf(col("p_size").cast("double"), 1.5), 6).as("size_pow"),
        M.divide(col("p_retailprice"), col("p_size").cast("double") - 1).as("price_per_sizem1"))
        .withColumn("price_per_sizem1", M.roundTo(col("price_per_sizem1"), 6))
    }),

    "q17_date_functions" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val month = D.timePeriod(col("o_orderdate"), "MonthOfYear")
      val (msin, mcos) = D.unitCircle(month - 1, 12)
      o.select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("order_year"),
        month.as("order_month"),
        D.timePeriod(col("o_orderdate"), "DayOfMonth").as("order_dom"),
        D.timePeriod(col("o_orderdate"), "DayOfWeek").as("order_dow"),
        D.timePeriod(col("o_orderdate"), "DayOfYear").as("order_doy"),
        D.timePeriod(col("o_orderdate"), "WeekOfMonth").as("order_wom"),
        round(msin, 6).as("month_sin"),
        round(mcos, 6).as("month_cos"))
    }),

    // bloom-prefiltered fact-dim join: fit BloomFilterAggregate on the
    // dim keys, probe with codegen'd might_contain BEFORE the fact's
    // shuffle, exact join removes the false positives — result is
    // byte-identical to the plain join the oracle runs. The pattern a
    // 100 TB fact joins a selective 100M-key dim with: shuffle bytes
    // scale with dim selectivity, not fact size
    "q123_join_bloom_prefilter" -> ((s, d) => {
      val dim = Tables.customer(s, d).where(col("c_nationkey") < 5)
        .select(col("c_custkey"), col("c_nationkey"))
      val pre = JoinedReader.bloomPrefilteredFact(
        Tables.orders(s, d), col("o_custkey"), dim, col("c_custkey"),
        expectedKeys = 200000L)
      JoinedReader.join(pre, dim, col("o_custkey"), col("c_custkey"), "inner")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"),
             sum(money(col("o_totalprice"))).cast("double").as("nation_revenue"))
    }),

    // z-order (Morton) key over (customer, order-day): the multi-dim
    // layout key — gate aggregates per coarse z-cell so the differential
    // check covers every interleaved bit of every row; the physical
    // relayout itself (repartitionByRange + sort) is plan-asserted in
    // LayoutSpec since sampled range bounds aren't SQL-replayable
    "q124_zorder_key" -> ((s, d) => {
      val day = datediff(col("o_orderdate"), lit("1992-01-01"))
      val z = graft.operators.Layout.zValue(col("o_custkey"), day)
      Tables.orders(s, d)
        .select(col("o_orderkey"), z.as("zval"))
        .groupBy(shiftright(col("zval"), 18).as("zcell"))
        .agg(count(lit(1)).as("n"),
          min(col("zval")).as("min_z"), max(col("zval")).as("max_z"),
          max(col("o_orderkey")).cast("long").as("max_key"))
    }),

    // weighted interval scheduling per supplier: the max-value set of
    // non-overlapping shipping jobs (ship-date + quantity-day spans,
    // H1-1995 window bounds the per-key DP) via the exact [end, best]
    // prefix fold — emits the optimal value and kept fraction
    "q425_weighted_intervals" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") <= lit("1995-06-30"))
        .select(col("l_suppkey"),
          datediff(col("l_shipdate"), to_date(lit("1970-01-01")))
            .cast("long").as("sd"),
          col("l_quantity").cast("decimal(12,2)").cast("long").as("q"),
          (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
            .as("w"))
        .select(col("l_suppkey"), col("sd"), (col("sd") + col("q")).as("ed"),
          col("w"))
      graft.operators.Layout.weightedIntervalBest(li, col("l_suppkey"),
          col("sd"), col("ed"), col("w"))
        .withColumnRenamed("key", "l_suppkey")
    }),

    // first-fit-decreasing compaction planner per brand: per-part
    // row-volumes packed into capacity-2000 bins through the exact
    // integer array-state fold — bins, utilization, oversize audit
    "q421_ffd_bin_packing" -> ((s, d) => {
      val items = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_partkey"))
        .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("long")
          .as("sz"))
      graft.operators.Layout.ffdBinPack(items, col("p_brand"),
          col("l_partkey"), col("sz"), 2000L)
        .withColumnRenamed("key", "p_brand")
    }),

    // distributed global row numbers by (orderdate, orderkey) — the
    // range-partition + zipWithIndex shape that replaces the
    // single-partition ORDER BY window at scale; gate checks a sample
    // slice of the full numbering
    "q272_global_row_number" -> ((s, d) => {
      graft.operators.Layout.globalRowNumber(
          Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
          Seq(col("o_orderdate"), col("o_orderkey")))
        .where(pmod(col("o_orderkey"), lit(97L)) === 0)
        .select(col("o_orderkey"), col("rn"))
    }),

    // batch interval join WITHOUT an equi-key, as a bucket-expansion
    // equi-join (Spark's planner would pick BroadcastNestedLoopJoin for
    // the bare BETWEEN): every ~97th order opens a 5-day audit window;
    // count the orders landing in each window
    "q126_join_interval_bucketed" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val day = datediff(col("o_orderdate"), lit("1970-01-01"))
      val points = o.select(col("o_orderkey").as("p_key"),
        col("o_totalprice").as("p_price"), day.as("p_day"))
      val windows = o.where(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("window_id"),
          day.as("w_lo"), (day + 5).as("w_hi"))
      JoinedReader.bucketedIntervalJoin(
          points, col("p_day"), windows, col("w_lo"), col("w_hi"),
          bucketWidth = 7)
        .groupBy(col("window_id"))
        .agg(count(lit(1)).as("n_in_window"),
          sum(money(col("p_price"))).cast("double").as("window_revenue"))
    })
  )

  private val MONEY_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  val oracles: Map[String, String] = Map(
    "q425_weighted_intervals" ->
      """WITH li AS (SELECT l_suppkey AS k,
                       CAST(date_diff('day', DATE '1970-01-01', l_shipdate)
                         AS BIGINT) AS sd,
                       CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT)
                         AS q,
                       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                         AS BIGINT) AS w
                     FROM lineitem
                     WHERE l_shipdate >= DATE '1995-01-01'
                       AND l_shipdate <= DATE '1995-06-30'),
          iv AS (SELECT k, sd AS s, sd + q AS e, w FROM li WHERE sd + q >= sd),
          sq AS (SELECT k, count(*) AS n, CAST(sum(w) AS BIGINT) AS total_w,
                        list([CAST(e AS DOUBLE), CAST(s AS DOUBLE),
                          CAST(w AS DOUBLE)] ORDER BY e, s, w) AS items
                 FROM iv GROUP BY k),
          f AS (SELECT k, n, total_w,
                  list_reduce(
                    list_prepend(CAST([] AS DOUBLE[][]),
                      list_transform(items, v -> [v])),
                    (a, b) -> list_append(a, [b[1][1],
                      greatest(coalesce(a[-1][2], CAST(0.0 AS DOUBLE)),
                        coalesce(list_max(list_transform(
                          list_filter(a, p -> p[1] <= b[1][2]),
                          p -> p[2])), CAST(0.0 AS DOUBLE)) + b[1][3])]))
                    AS st
                FROM sq)
         SELECT k AS l_suppkey, n, total_w,
                CAST(coalesce(st[-1][2], CAST(0.0 AS DOUBLE)) AS BIGINT)
                  AS best_w,
                ROUND(coalesce(st[-1][2], CAST(0.0 AS DOUBLE)) /
                  CAST(total_w AS DOUBLE), 6) AS kept_frac
         FROM f""",

    "q421_ffd_bin_packing" ->
      """WITH items AS (SELECT p_brand AS g, l_partkey AS it,
                          CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
                            AS BIGINT) AS sz
                        FROM lineitem JOIN part ON l_partkey = p_partkey
                        GROUP BY 1, 2),
          s AS (SELECT g, count(*) AS n_items,
                       CAST(sum(sz) AS BIGINT) AS total,
                       CAST(sum(CASE WHEN sz > 2000 THEN 1 ELSE 0 END)
                         AS BIGINT) AS n_oversize,
                       list(sz ORDER BY -sz, it) AS szs
                FROM items GROUP BY g),
          packed AS (SELECT *, list_reduce(list_transform(szs, v -> [v]),
                       (a, b) -> CASE WHEN list_position(list_transform(a,
                           e -> e + b[1] <= 2000), true) > 0
                         THEN list_transform(a, (e, i) -> CASE WHEN i =
                           list_position(list_transform(a,
                             x -> x + b[1] <= 2000), true)
                           THEN e + b[1] ELSE e END)
                         ELSE list_append(a, b[1]) END) AS bins
                     FROM s)
         SELECT g AS p_brand, n_items, total, n_oversize,
                CAST(len(bins) AS BIGINT) AS n_bins,
                CAST(list_max(bins) AS BIGINT) AS max_bin,
                ROUND(CAST(total AS DOUBLE) /
                  (CAST(len(bins) AS DOUBLE) * 2000.0), 6) AS utilization
         FROM packed""",
    "q335_revenue_proration" ->
      """WITH li AS (
           SELECT CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT) AS cents,
                  CAST(date_trunc('month', least(o_orderdate, l_shipdate))
                    AS DATE) AS m0,
                  CAST(date_trunc('month', greatest(o_orderdate, l_shipdate))
                    AS DATE) AS m1
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          x AS (
           SELECT cents, datediff('month', m0, m1) + 1 AS n,
                  CAST(gs AS DATE) AS month,
                  datediff('month', m0, CAST(gs AS DATE)) AS idx
           FROM li, unnest(generate_series(CAST(m0 AS TIMESTAMP),
                  CAST(m1 AS TIMESTAMP), INTERVAL 1 MONTH)) t(gs))
         SELECT CAST(month AS VARCHAR) AS month,
                CAST(sum(cents // n +
                  CASE WHEN idx < cents % n THEN 1 ELSE 0 END) AS BIGINT)
                  AS recognized_cents,
                count(*) AS n_lines
         FROM x GROUP BY month""",

    "q01_scan_filter_project" ->
      s"""SELECT l_orderkey, l_linenumber, CAST($MONEY_REV AS DOUBLE) AS revenue
         FROM lineitem WHERE l_quantity > 45""",

    "q372_dominant_suppliers" ->
      """WITH ps AS (SELECT l_partkey, l_suppkey,
                            CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100
                              AS BIGINT) AS sq
                     FROM lineitem GROUP BY 1, 2),
          pt AS (SELECT l_partkey, CAST(sum(sq) AS BIGINT) AS tq
                 FROM ps GROUP BY 1)
         SELECT l_suppkey, count(*) AS n_dominant_parts,
                CAST(sum(sq) AS BIGINT) AS dominant_qty_cents
         FROM ps JOIN pt USING (l_partkey)
         WHERE sq * 10 > tq * 3
         GROUP BY l_suppkey""",

    "q373_nullsafe_join" ->
      """WITH dim(flag, status) AS (VALUES ('A', 'accepted'),
             ('R', 'returned'), (NULL, 'pending')),
          f AS (SELECT nullif(l_returnflag, 'N') AS flag,
                       CAST(l_extendedprice AS DECIMAL(18,2)) AS rev
                FROM lineitem)
         SELECT status, count(*) AS n_lines,
                CAST(sum(rev) AS DOUBLE) AS revenue
         FROM f JOIN dim ON f.flag IS NOT DISTINCT FROM dim.flag
         GROUP BY status""",

    "q368_popularity_recs" ->
      """WITH cn AS (SELECT c_custkey, c_nationkey FROM customer),
          bought AS (SELECT DISTINCT o_custkey AS c_custkey, l_partkey
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          pop AS (SELECT c_nationkey, l_partkey, count(*) AS cnt
                  FROM bought JOIN cn USING (c_custkey) GROUP BY 1, 2),
          cand AS (SELECT *, row_number() OVER (PARTITION BY c_nationkey
                     ORDER BY cnt DESC, l_partkey) AS r
                   FROM pop),
          c10 AS (SELECT * FROM cand WHERE r <= 10),
          ex AS (SELECT cn.c_custkey, c10.l_partkey, c10.cnt
                 FROM cn JOIN c10 USING (c_nationkey)
                 WHERE NOT EXISTS (SELECT 1 FROM bought b
                                   WHERE b.c_custkey = cn.c_custkey
                                     AND b.l_partkey = c10.l_partkey)),
          rk AS (SELECT c_custkey, l_partkey, cnt,
                        row_number() OVER (PARTITION BY c_custkey
                          ORDER BY cnt DESC, l_partkey) AS rank
                 FROM ex)
         SELECT c_custkey, CAST(rank AS INT) AS rank,
                l_partkey AS rec_part, CAST(cnt AS BIGINT) AS popularity
         FROM rk WHERE rank <= 3""",

    "q369_idle_rich_customers" ->
      """WITH ap AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                       AS DOUBLE) / count(*) AS avg_bal
                     FROM customer WHERE c_acctbal > 0)
         SELECT c_nationkey, count(*) AS n_cust,
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                  AS total_bal
         FROM customer, ap
         WHERE c_acctbal > ap.avg_bal
           AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY c_nationkey""",

    "q339_small_order_revenue" ->
      """WITH avgq AS (
           SELECT l_partkey,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    / count(*) AS avg_qty
           FROM lineitem GROUP BY l_partkey)
         SELECT l.l_partkey, count(*) AS n_small,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS small_revenue
         FROM lineitem l JOIN avgq a ON l.l_partkey = a.l_partkey
         WHERE l.l_quantity < CAST(0.5 AS DOUBLE) * a.avg_qty
         GROUP BY l.l_partkey""",

    "q340_sole_late_supplier" ->
      """WITH l AS (
           SELECT o_orderkey AS ok, l_suppkey AS sk,
                  CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 90
                    AS late
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          cand AS (SELECT DISTINCT ok, sk FROM l WHERE late),
          w AS (SELECT c.ok, c.sk FROM cand c
                WHERE EXISTS (SELECT 1 FROM l o
                              WHERE o.ok = c.ok AND o.sk <> c.sk)
                  AND NOT EXISTS (SELECT 1 FROM l o
                                  WHERE o.ok = c.ok AND o.sk <> c.sk
                                    AND o.late))
         SELECT sk AS s_suppkey, count(*) AS numwait
         FROM w GROUP BY sk""",

    "q02_row_transforms" ->
      """SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity > 25 THEN l_quantity ELSE 0.0 END AS qty_filtered,
           l_discount > 0.05 AS has_big_discount,
           CASE WHEN l_returnflag = 'N' THEN 'NONE' ELSE l_returnflag END AS flag_replaced,
           CASE WHEN l_tax > 0.03 THEN 1.0 ELSE 0.0 END AS high_tax_occurs
         FROM lineitem""",

    "q03_agg_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM($MONEY_REV) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "q04_agg_minmax_mean" ->
      """SELECT event_type, MIN(value) AS min_value, MAX(value) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           COUNT(*) AS n
         FROM events GROUP BY event_type""",

    "q05_agg_logical" ->
      """SELECT user_id,
           BOOL_OR(value > 400) AS any_big,
           BOOL_AND(value > 1) AS all_over_one,
           (COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) % 2 = 1) AS odd_purchases
         FROM events GROUP BY user_id""",

    "q06_agg_first_last" ->
      """SELECT user_id,
           ARG_MIN(event_type, ts) AS first_event, ARG_MAX(event_type, ts) AS last_event,
           ARG_MIN(value, ts) AS first_value, ARG_MAX(value, ts) AS last_value
         FROM events GROUP BY user_id""",

    "q07_agg_concat_by_time" ->
      """SELECT user_id, STRING_AGG(event_type, ',' ORDER BY ts) AS purchase_trail
         FROM events WHERE event_type = 'purchase' GROUP BY user_id""",

    "q08_agg_mode" ->
      """WITH c AS (SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2),
         r AS (SELECT user_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, event_type ASC) AS rn
               FROM c)
         SELECT user_id, event_type AS mode_event FROM r WHERE rn = 1""",

    "q09_agg_set_union" ->
      """SELECT user_id, STRING_AGG(DISTINCT event_type, ',' ORDER BY event_type) AS event_types
         FROM events GROUP BY user_id""",

    "q10_agg_cutoff" ->
      """SELECT user_id,
           CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
                THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS pred_sum_value,
           COUNT(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN 1 END) AS pred_n,
           COUNT(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
                 AND event_type = 'purchase' THEN 1 END) AS resp_n_purchases
         FROM events GROUP BY user_id""",

    "q11_agg_asof_conditional" ->
      """WITH cut AS (
           SELECT user_id AS k, MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS cutoff
           FROM events GROUP BY user_id)
         SELECT user_id,
           CAST(SUM(CASE WHEN ts < cutoff THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS pred_sum_value,
           COUNT(CASE WHEN ts < cutoff THEN 1 END) AS pred_n_events,
           COUNT(CASE WHEN ts >= cutoff THEN 1 END) AS resp_n_events
         FROM events JOIN cut ON user_id = k
         WHERE cutoff IS NOT NULL
         GROUP BY user_id""",

    "q12_join_broadcast_agg" ->
      """SELECT c_mktsegment,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS segment_revenue,
           COUNT(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",

    "q13_join_left_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
           COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spend
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey""",

    "q14_join_multiway" ->
      s"""SELECT r_name, n_name, CAST(SUM($MONEY_REV) AS DOUBLE) AS revenue
         FROM customer
           JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON o_orderkey = l_orderkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",

    "q15_join_secondary_agg" ->
      """SELECT o_orderkey, ANY_VALUE(o_totalprice) AS o_totalprice,
           CAST(SUM(CASE WHEN l_shipdate >= o_orderdate
                          AND l_shipdate < o_orderdate + INTERVAL 30 DAY
                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS early_ship_revenue,
           COUNT(CASE WHEN l_shipdate >= o_orderdate
                       AND l_shipdate < o_orderdate + INTERVAL 30 DAY THEN 1 END) AS early_ship_items
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_orderkey""",

    "q16_math_functions" ->
      """SELECT p_partkey,
           ABS(p_retailprice - 1000) AS abs_centered,
           CAST(CEIL(p_retailprice) AS BIGINT) AS ceil_price,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS floor_price,
           ROUND(SQRT(p_retailprice), 6) AS sqrt_price,
           ROUND(EXP(p_size / 25.0), 6) AS exp_size,
           ROUND(LOG10(p_retailprice), 6) AS log10_price,
           ROUND(POW(CAST(p_size AS DOUBLE), 1.5), 6) AS size_pow,
           ROUND(p_retailprice / (CAST(p_size AS DOUBLE) - 1), 6) AS price_per_sizem1
         FROM part""",

    "q17_date_functions" ->
      """SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(DAYOFMONTH(o_orderdate) AS INT) AS order_dom,
           CAST(DAYOFWEEK(o_orderdate) + 1 AS INT) AS order_dow,
           CAST(DAYOFYEAR(o_orderdate) AS INT) AS order_doy,
           CAST(CEIL(DAYOFMONTH(o_orderdate) / 7.0) AS INT) AS order_wom,
           ROUND(SIN((MONTH(o_orderdate) - 1) * 2 * PI() / 12), 6) + 0 AS month_sin,
           ROUND(COS((MONTH(o_orderdate) - 1) * 2 * PI() / 12), 6) + 0 AS month_cos
         FROM orders""",

    // the bloom prefilter is invisible to semantics: plain join oracle
    "q123_join_bloom_prefilter" ->
      """SELECT c_nationkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS nation_revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_nationkey < 5
         GROUP BY c_nationkey""",

    "q272_global_row_number" ->
      """WITH r AS (SELECT o_orderkey,
              row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
            FROM orders)
          SELECT o_orderkey, rn FROM r WHERE o_orderkey % 97 = 0""",

    "q124_zorder_key" -> {
      val zsql = graft.operators.Layout.zValueSql(
        "o_custkey", "date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))")
      s"""WITH z AS (SELECT o_orderkey, $zsql AS zval FROM orders)
         SELECT zval >> 18 AS zcell, COUNT(*) AS n,
           MIN(zval) AS min_z, MAX(zval) AS max_z,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
         FROM z GROUP BY 1"""
    },

    // the bucketing is invisible to semantics: plain BETWEEN-join oracle
    "q126_join_interval_bucketed" ->
      """SELECT w.o_orderkey AS window_id, COUNT(*) AS n_in_window,
           CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS window_revenue
         FROM orders w JOIN orders o2
           ON date_diff('day', DATE '1970-01-01', CAST(o2.o_orderdate AS DATE))
              BETWEEN date_diff('day', DATE '1970-01-01', CAST(w.o_orderdate AS DATE))
                  AND date_diff('day', DATE '1970-01-01', CAST(w.o_orderdate AS DATE)) + 5
         WHERE w.o_orderkey % 97 = 0
         GROUP BY 1"""
  )
}
