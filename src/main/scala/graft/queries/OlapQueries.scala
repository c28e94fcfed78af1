package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Dedup, Projection}

/** Oracle-gated OLAP-core queries: multi-level aggregation
  * (rollup / cube / grouping sets), reshaping (pivot / unpivot), set
  * operations (intersect / except, bag variants), the analytic window
  * function battery, semi/anti joins as user-facing filters,
  * edit-distance record linkage, and deterministic random-projection
  * dimensionality reduction.
  *
  * All of these are declarative Spark relational operators — Catalyst
  * plans rollup/cube as a single Expand + hash-aggregate pass (one
  * shuffle regardless of how many grouping levels), pivot as one
  * hash-aggregate over (key, pivot-value) with the pivot columns
  * resolved at plan time (values are given explicitly — no extra
  * distinct job), and semi/anti joins without materializing the right
  * side's payload.
  */
object OlapQueries {

  private def money(c: Column): Column = c.cast("decimal(18,2)")
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- multi-level aggregation ---------------------------------------
    // ROLLUP (flag, status): per-pair, per-flag subtotal, grand total in
    // ONE pass (Expand × 3 grouping ids → single hash aggregate). NULL
    // grouping slots are labelled 'ALL' (the source columns are non-null)
    // so the three levels stay distinguishable under the hash compare.
    // percent-of-parent hierarchy readout: nation sales as a share of
    // its region and of the grand total — two window sums over the
    // ALREADY-AGGREGATED 25-row nation frame (domain-bounded, like the
    // q178 readouts), sales folded in decimal, shares mirrored as one
    // double division each.
    "q353_pct_of_parent" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val rev = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)
          .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"), col("r_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(money(col("o_totalprice"))).as("sales"))
      val wR = Window.partitionBy(col("r_name"))
      val wT = Window.partitionBy()
      rev.select(col("r_name"), col("n_name"),
        col("sales").cast("double").as("sales"),
        round(col("sales").cast("double") /
          sum(col("sales")).over(wR).cast("double"), 6).as("pct_of_region"),
        round(col("sales").cast("double") /
          sum(col("sales")).over(wT).cast("double"), 6).as("pct_of_total"))
    }),

    // COUNT(DISTINCT) under ROLLUP — the hard grouping-sets case: the
    // Expand pass multiplies rows per grouping level and the distinct
    // dedup shuffles each level on its own keys (Spark's expand +
    // partial-dedup plan). Exact here; at 100 TB the re-aggregatable
    // alternative is the HLL-sketch rollup the q-gate suite covers
    // separately. Dims ride broadcast joins.
    "q352_distinct_rollup" -> ((s, d) => {
      val geo = broadcast(Tables.nation(s, d)
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name")))
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(geo, col("c_nationkey") === col("n_nationkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count_distinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n_customers"), col("n_orders"))
    }),

    "q178_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
    }),

    // CUBE (status, priority) over orders: all four grouping levels in
    // one Expand pass; money sums over DECIMAL so order-independent.
    "q179_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(money(col("o_totalprice"))).cast("double").as("sum_price"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("sum_price"), col("n"))
    }),

    // explicit GROUPING SETS ((flag), (status), ()): the sparse subset
    // a cube would over-compute — still one Expand + one aggregate.
    "q180_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(sum(money(col("l_extendedprice"))).cast("double").as("sum_price"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_price"), col("n"))
    }),

    // ---- reshaping ------------------------------------------------------
    // long->wide: per-user spend by event type. Pivot values are given
    // explicitly, so the plan is a single hash aggregate — no
    // pre-distinct job, and the output schema is fixed at plan time
    // (the only form that scales: a data-driven column set would both
    // scan twice and make downstream schemas nondeterministic).
    "q181_pivot" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .agg(sum(money(col("value"))).cast("double"))
    }),

    // wide->long: unpivot/melt is a zero-shuffle Expand (each input row
    // emits one row per measure) — the lakehouse "melt" primitive.
    "q182_unpivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "metric", "value")
    }),

    // ---- set operations -------------------------------------------------
    // DISTINCT set algebra over customer key sets: one hash
    // aggregate per side + one shuffle join each (Spark plans
    // INTERSECT/EXCEPT as left-semi/left-anti over distinct inputs).
    "q183_set_ops" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val urgent = o.where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val big = o.where(col("o_totalprice") > 150000.0)
        .select(col("o_custkey"))
      urgent.intersect(big).withColumn("tag", lit("urgent_and_big"))
        .unionByName(urgent.except(big).withColumn("tag", lit("urgent_only")))
    }),

    // bag (ALL) variants — multiplicity-preserving difference and
    // intersection of the quantity multisets of two return flags;
    // duplicates survive, which the sorted-rows hash compare verifies.
    "q184_bag_ops" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val a = li.where(col("l_returnflag") === "A").select(col("l_quantity"))
      val r = li.where(col("l_returnflag") === "R").select(col("l_quantity"))
      a.exceptAll(r).withColumn("tag", lit("a_minus_r_all"))
        .unionByName(a.intersectAll(r).withColumn("tag", lit("a_and_r_all")))
    }),

    // ---- analytic window battery ---------------------------------------
    // lag/lead/ntile/cume_dist/rank over each customer's order history.
    // One shuffle on the partition key; the sort key
    // (o_orderdate, o_orderkey) is unique per partition, so every rank
    // and distribution value is deterministic.
    "q185_window_battery" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
        round(lead(col("o_totalprice"), 1).over(w), 2).as("next_price"),
        ntile(4).over(w).as("quartile"),
        round(cume_dist().over(w), 6).as("cdist"),
        rank().over(w).as("rnk"))
    }),

    // ---- semi / anti joins ----------------------------------------------
    // EXISTS / NOT EXISTS as left-semi / left-anti: the right side's
    // payload is never materialized into the output, and the urgent
    // key set is small enough to broadcast — no shuffle of customer.
    "q188_semi_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_custkey"))
      val urgent = Tables.orders(s, d)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      c.join(broadcast(urgent), col("c_custkey") === col("o_custkey"), "left_semi")
        .withColumn("tag", lit("has_urgent"))
        .unionByName(
          c.join(broadcast(urgent), col("c_custkey") === col("o_custkey"), "left_anti")
            .withColumn("tag", lit("no_urgent")))
    }),

    // ---- edit-distance record linkage -----------------------------------
    // Levenshtein pairs inside (brand, size) blocks: equi-join blocking
    // + codegen'd edit distance, the classic linkage shape.
    "q186_levenshtein_pairs" -> ((s, d) => {
      val p = Tables.part(s, d)
      Dedup.editDistancePairs(p, col("p_partkey"), col("p_name"),
        Seq(col("p_brand"), col("p_size")), maxDist = 5)
    }),

    // ---- random-projection dimensionality reduction ----------------------
    // 64-dim embeddings -> 8 sign-projection coordinates; the md5 sign
    // family is replayed verbatim by the oracle.
    "q187_random_projection" -> ((s, d) => {
      Projection.signProjection(Tables.embeddings(s, d),
        col("vec_id"), col("embedding"), inDim = 64, outDim = 8)
    }),

    // PCA to the top-4 components (rows-only: eigenvector signs are an
    // SVD convention; the variance contract is spec-gated)
    "q189_pca" -> ((s, d) => {
      Projection.pca(Tables.embeddings(s, d), col("vec_id"), col("embedding"), k = 4)
    }),

    // ---- recursive queries (WITH RECURSIVE analog) -----------------------
    // hierarchy flatten: parent(p) = p div 7 over the part keys builds a
    // depth-4 tree; pointer doubling settles it in ceil(log2 4) = 2
    // co-partitioned self-joins (vs 4 per-level descents) — the oracle
    // replays it with DuckDB's native WITH RECURSIVE
    "q281_hierarchy_flatten" -> ((s, d) => {
      val parents = Tables.part(s, d).select(col("p_partkey").as("k"),
        floor(col("p_partkey") / 7).cast("long").as("par"))
      graft.operators.Graph.flattenHierarchy(parents, col("k"), col("par"))
        .select(col("key"), col("root_key"), col("depth"))
    }),

    // multi-source BFS: min hop distance (<= 4) from the seed customers
    // (custkey % 50 = 0) over the bipartite customer<->supplier trade
    // graph — frontier expansion, each edge traversed once; the oracle
    // replays it as a WITH RECURSIVE over (node, dist) states, dedup'd
    // by UNION so cycles can't blow up the recursion
    // degree assortativity of the trade graph: Pearson correlation of
    // endpoint degrees over the (symmetrized) edge list — do high-degree
    // nodes attach to high-degree nodes? Sufficient statistics are
    // EXACT integer sums (degrees are counts), assembled into the
    // correlation with DECIMAL(38) cross-products so the 2.4M-edge
    // moments can't overflow a long; only the final formula touches
    // doubles. Two keyed joins (edge->deg) + one agg.
    "q346_degree_assortativity" -> ((s, d) => {
      val trade = broadcast(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey")))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").cast("long").as("c"),
          (col("l_suppkey") + 1000000L).cast("long").as("p"))
        .distinct()
      val edges = trade.select(col("c").as("src"), col("p").as("dst"))
        .unionByName(trade.select(col("p").as("src"), col("c").as("dst")))
      val deg = edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
      val pairs = edges
        .join(deg.select(col("node").as("src"), col("deg").as("dx")), Seq("src"))
        .join(deg.select(col("node").as("dst"), col("deg").as("dy")), Seq("dst"))
      val dec = (c: Column) => c.cast("decimal(38,0)")
      pairs.agg(count(lit(1)).as("m"), sum(col("dx")).as("sx"),
          sum(col("dy")).as("sy"), sum(col("dx") * col("dy")).as("sxy"),
          sum(col("dx") * col("dx")).as("sxx"),
          sum(col("dy") * col("dy")).as("syy"))
        .select(col("m").as("m_pairs"),
          round((dec(col("m")) * dec(col("sxy")) -
              dec(col("sx")) * dec(col("sy"))).cast("double") /
            (sqrt((dec(col("m")) * dec(col("sxx")) -
              dec(col("sx")) * dec(col("sx"))).cast("double")) *
             sqrt((dec(col("m")) * dec(col("syy")) -
              dec(col("sy")) * dec(col("sy"))).cast("double"))), 6)
            .as("assortativity"))
    }),

    // 2-D skyline / Pareto frontier (parts minimizing price AND size):
    // a part survives iff no other part is <= on both axes with one
    // strict. Distributed shape: reduce to the per-price min-size table
    // (one groupBy), then an EXCLUSIVE prefix min over the price domain
    // via the two-level cumulativeMinByValue scheme — per-partition
    // mins + an O(#partitions) offsets collect — never a global sort;
    // the dominance test is then a keyed join back to the parts.
    "q343_skyline" -> ((s, d) => {
      val parts = Tables.part(s, d)
        .select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast("long").as("sz"))
      val pm = parts.groupBy(col("p_retailprice").as("v"))
        .agg(min(col("sz")).as("m"))
      val excl = graft.operators.DataQuality.cumulativeMinByValue(pm, Seq("m"))
      parts
        .join(pm, col("p_retailprice") === pm("v")).drop("v")
        .join(excl, col("p_retailprice") === excl("v")).drop("v")
        .where(col("sz") === col("m") && col("sz") < col("excl_min_m"))
        .select(col("p_partkey"), col("p_retailprice"),
          col("sz").cast("int").as("p_size"))
    }),

    // time-respecting reachability (contagion/provenance tracking):
    // suppliers seeded as "exposed" on 1996-01-01; a dated trade edge
    // (shipdate) propagates exposure only when it occurs strictly AFTER
    // the current exposure date, over at most 3 hops. The operator keeps
    // one (node -> min exposure date) state per node — min-date
    // dominance, see Graph.temporalReachMinDate — while the oracle
    // enumerates the FULL (node, date, hop) state space in a recursive
    // CTE and takes the same min: a differential proof of the dominance.
    "q334_temporal_reach" -> ((s, d) => {
      val trade = broadcast(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey")))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").cast("long").as("c"),
          (col("l_suppkey") + 1000000L).cast("long").as("p"),
          col("l_shipdate").cast("date").as("dt"))
      val edges = trade.select(col("c").as("src"), col("p").as("dst"), col("dt"))
        .unionByName(trade.select(col("p").as("src"), col("c").as("dst"), col("dt")))
      val seeds = Tables.supplier(s, d).where(col("s_suppkey") % 37 === 0)
        .select((col("s_suppkey") + 1000000L).cast("long").as("node"),
          lit("1996-01-01").cast("date").as("d0"))
      graft.operators.Graph.temporalReachMinDate(edges, col("src"), col("dst"),
          col("dt"), seeds, col("node"), col("d0"), maxHops = 3)
        .select(col("node"), col("exp_d").cast("string").as("exposed_on"))
    }),

    "q282_bfs_khop" -> ((s, d) => {
      val trade = broadcast(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey")))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("p"))
      val edges = trade.select(col("c").as("src"), col("p").as("dst"))
        .unionByName(trade.select(col("p").as("src"), col("c").as("dst")))
      val seeds = Tables.customer(s, d)
        .where(col("c_custkey") % 50 === 0)
        .select(col("c_custkey").cast("long").as("node"))
      graft.operators.Graph.bfsDistances(edges, col("src"), col("dst"),
        seeds, col("node"), maxHops = 4)
    }),

    // ---- time-RANGE window frames ----------------------------------------
    // trailing 7-DAY (not 7-row) per-user event count/sum: RANGE frame
    // over epoch seconds — the frame a warehouse "rolling 7d actives"
    // report actually means. Per-user windows only; values fold as
    // decimal so tie-order inside the frame can't perturb the sum.
    "q287_time_range_rolling" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("sec"), money(col("value")).as("v"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
        .rangeBetween(-7L * 86400L, 0L)
      ev.select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_7d"),
        sum(col("v")).over(w).cast("double").as("sum_7d"))
    }),

    // ---- Lorenz curve without a global sort ------------------------------
    // decile-level Lorenz curve of customer revenue: exact per-row ranks
    // ride the two-level prefix sum (cumulativeByValue) + a per-VALUE
    // row_number for ties — never a single-partition sort of the
    // customers; only the final 10-row decile frame uses an ordered
    // window (domain-bounded, q221's shape).
    "q288_lorenz_curve" -> ((s, d) => {
      val per = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg((sum(money(col("o_totalprice"))) * 100).cast("long").as("cents"))
      val counts = per.groupBy(col("cents").as("v")).agg(count(lit(1)).as("c"))
      val cum = graft.operators.DataQuality.cumulativeByValue(counts, Seq("c"))
        .join(counts, Seq("v"))
      val ranked = per.join(cum, col("cents") === col("v"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("cents")).orderBy(col("o_custkey"))))
        .withColumn("rank", col("cum_c") - col("c") + col("rn"))
      val tot = per.agg(count(lit(1)).as("n"), sum(col("cents")).as("totc"))
      val dec = ranked.crossJoin(broadcast(tot))
        .withColumn("decile", expr("((rank - 1) * 10) div n"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("dcents"))
      val w10 = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dec.crossJoin(broadcast(tot))
        .withColumn("cumc", sum(col("dcents")).over(w10))
        .select(col("decile"), col("n_cust"),
          round(col("dcents").cast("double") / col("totc").cast("double"), 6)
            .as("share"),
          round(col("cumc").cast("double") / col("totc").cast("double"), 6)
            .as("cum_share"))
    }),

    // ---- hierarchical (BOM) rollup ---------------------------------------
    // subtree totals at EVERY node of the part hierarchy via the
    // ancestor transitive closure: closure join (Θ(n·depth) rows) + one
    // hash agg — the distributed answer to "roll this measure up a
    // category tree"; oracle replays the closure with WITH RECURSIVE
    "q289_bom_rollup" -> ((s, d) => {
      val parents = Tables.part(s, d).select(col("p_partkey").as("k"),
        floor(col("p_partkey") / 7).cast("long").as("par"))
      val cl = graft.operators.Graph.ancestorClosure(
        parents, col("k"), col("par"))
      val vals = Tables.part(s, d).select(col("p_partkey").as("key"),
        (money(col("p_retailprice")) * 100).cast("long").as("cents"))
      cl.join(vals, Seq("key"))
        .groupBy(col("anc").as("p_partkey"))
        .agg(count(lit(1)).as("subtree_n"),
          sum(col("cents")).as("subtree_cents"),
          max(col("hops")).as("subtree_height"))
    }),

    // materialized hierarchy paths: every node's root-to-self "/" path
    // from the ancestor closure (one ordered-concat agg over the
    // Θ(n·depth) closure rows) — the adjacency-list -> materialized-path
    // conversion a warehouse runs once so later queries are prefix scans
    "q313_hierarchy_paths" -> ((s, d) => {
      val parents = Tables.part(s, d).select(col("p_partkey").as("k"),
        floor(col("p_partkey") / 7).cast("long").as("par"))
      val cl = graft.operators.Graph.ancestorClosure(
        parents, col("k"), col("par"))
      cl.groupBy(col("key"))
        .agg(concat_ws("/", transform(sort_array(collect_list(
          struct((-col("hops")).as("nh"), col("anc")))),
          x => x.getField("anc"))).as("path"),
          max(col("hops")).as("depth"))
    }),

    // interval concurrency without a day explode: +1/-1 boundary deltas
    // per interval endpoint, per-day delta agg, then the two-level
    // prefix sum -> active-interval count at every boundary day. The
    // "how many orders were open on day X" curve computed in two
    // shuffles regardless of interval lengths.
    "q314_interval_concurrency" -> ((s, d) => {
      val o = Tables.orders(s, d).select(
        to_date(col("o_orderdate")).as("start"),
        (col("o_orderkey") % 14 + 1).cast("int").as("dur"))
      val deltas = o.select(explode(array(
          struct(col("start").as("v"), lit(1L).as("delta")),
          struct(date_add(col("start"), col("dur") + 1).as("v"),
            lit(-1L).as("delta")))).as("b"))
        .select(col("b.v"), col("b.delta"))
        .groupBy(col("v")).agg(sum(col("delta")).as("delta"))
      graft.operators.DataQuality.cumulativeByValue(deltas, Seq("delta"))
        .select(col("v").cast("string").as("day"),
          col("cum_delta").as("active"))
    }),

    // ---- bounded top-k per group -----------------------------------------
    // top-3 orders per customer via the bounded TopK aggregator (O(k)
    // state per group, partial+final merge) — the scale-right
    // replacement for the window-rank idiom, which sorts EVERY group's
    // full row set; ties to the smaller orderkey, replayed by the
    // oracle's row_number
    "q297_topk_per_group" -> ((s, d) => {
      val scored = Tables.orders(s, d).select(col("o_custkey").as("key"),
        col("o_orderkey").as("id"), col("o_totalprice").cast("double").as("score"))
      graft.aggregators.TopK.topKPerKey(scored, "key", "id", "score", k = 3)
        .select(col("key").as("o_custkey"), col("id").as("o_orderkey"),
          round(col("score"), 2).as("price"), col("rank"))
    }),

    // trending top-k: daily brand revenue -> trailing 7-day revenue per
    // brand (per-brand RANGE frame over day epochs, integer cents) ->
    // top-3 brands per day via the bounded string-keyed TopK aggregator.
    // Composition stays two shuffles (daily agg, per-day top-k); the
    // per-brand window rides the daily-agg partitioning.
    "q298_trending_topk" -> ((s, d) => {
      val daily = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), to_date(col("l_shipdate")).as("day"))
        .agg((sum(money(col("l_extendedprice"))) * 100).cast("long").as("cents"))
        .withColumn("sec", col("day").cast("timestamp").cast("long"))
      val w = Window.partitionBy(col("p_brand")).orderBy(col("sec"))
        .rangeBetween(-6L * 86400L, 0L)
      val scored = daily.withColumn("rev7", sum(col("cents")).over(w))
        .select(col("day").cast("string").as("day"), col("p_brand").as("id"),
          col("rev7").cast("double").as("score"))
      graft.aggregators.TopK.topKPerKeyStr(scored, "day", "id", "score", k = 3)
        .select(col("day"), col("id").as("p_brand"),
          round(col("score") / 100, 2).as("rev7"), col("rank"))
    }),

    // interval union (merge overlapping intervals): per customer, the
    // classic running-max island detection collapses overlapping order
    // intervals into disjoint coverage islands — total covered days
    // without exploding days. Two window passes over ONE per-key
    // partitioning + two hash aggs.
    "q324_interval_merge" -> ((s, d) => {
      val iv = Tables.orders(s, d).select(col("o_custkey").as("k"),
        to_date(col("o_orderdate")).as("s"),
        date_add(to_date(col("o_orderdate")),
          (col("o_orderkey") % 14 + 1).cast("int")).as("e"))
      val wOrd = Window.partitionBy(col("k")).orderBy(col("s"), col("e"))
      val runPrev = max(col("e")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1))
      val marked = iv.withColumn("newisl",
        when(runPrev.isNull || col("s") > runPrev, 1L).otherwise(0L))
      val isl = marked
        .withColumn("isl", sum(col("newisl")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("k"), col("isl"))
        .agg(count(lit(1)).as("n_iv"), min(col("s")).as("ms"),
          max(col("e")).as("me"))
      isl.groupBy(col("k").as("o_custkey"))
        .agg(sum(col("n_iv")).as("n_intervals"),
          count(lit(1)).as("n_islands"),
          sum(datediff(col("me"), col("ms")) + 1).as("covered_days"))
    }),

    // nested JSON export: per customer, the time-stable JSON array of
    // (orderkey, status) structs — the denormalized document shape an
    // API/search index consumes; one hash agg, ordered inside the array
    // so the string is deterministic
    "q318_nested_export" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_custkey"), struct(col("o_orderkey").as("k"),
          col("o_orderstatus").as("s")).as("st"))
        .groupBy(col("o_custkey"))
        .agg(to_json(sort_array(collect_list(col("st")))).as("orders_json"),
          count(lit(1)).as("n_orders"))
    }),

    // 2-D histogram (heatmap binning) of quantity x discount with the
    // joint share — one hash agg over the bin keys, 1-row total crossed
    // back; the binned scatter a dashboard renders over billions of rows
    "q312_hist2d" -> ((s, d) => {
      val g = Tables.lineitem(s, d)
        .select(floor(col("l_quantity") / 5).cast("long").as("qty_bin"),
          floor(col("l_discount") / 0.02).cast("long").as("disc_bin"))
        .groupBy(col("qty_bin"), col("disc_bin")).agg(count(lit(1)).as("n"))
      val tot = g.agg(sum(col("n")).as("tot"))
      g.crossJoin(broadcast(tot))
        .select(col("qty_bin"), col("disc_bin"), col("n"),
          round(col("n").cast("double") / col("tot").cast("double"), 6)
            .as("share"))
    })
  )

  // DuckDB oracles ---------------------------------------------------------

  private val RP_SIGN = // sign(i,j): parity of the 60-bit md5 prefix
    "CASE WHEN CAST(('0x' || substr(md5('rp|' || CAST(i AS VARCHAR) || '|' || CAST(j AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END"

  val oracles: Map[String, String] = Map(
    "q178_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                coalesce(l_linestatus, 'ALL') AS linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                count(*) AS n
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",

    "q179_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
                coalesce(o_orderpriority, 'ALL') AS priority,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
                count(*) AS n
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",

    "q180_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                coalesce(l_linestatus, 'ALL') AS linestatus,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
                count(*) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",

    "q181_pivot" ->
      """SELECT user_id,
                CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view,
                CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
                CAST(sum(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
                CAST(sum(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error
         FROM events GROUP BY user_id""",

    "q182_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem""",

    "q183_set_ops" ->
      """WITH urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
              big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0)
         SELECT o_custkey, 'urgent_and_big' AS tag
         FROM (SELECT o_custkey FROM urgent INTERSECT SELECT o_custkey FROM big)
         UNION ALL
         SELECT o_custkey, 'urgent_only'
         FROM (SELECT o_custkey FROM urgent EXCEPT SELECT o_custkey FROM big)""",

    "q184_bag_ops" ->
      """WITH a AS (SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A'),
              r AS (SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R')
         SELECT l_quantity, 'a_minus_r_all' AS tag
         FROM (SELECT l_quantity FROM a EXCEPT ALL SELECT l_quantity FROM r)
         UNION ALL
         SELECT l_quantity, 'a_and_r_all'
         FROM (SELECT l_quantity FROM a INTERSECT ALL SELECT l_quantity FROM r)""",

    "q185_window_battery" ->
      """SELECT o_custkey, o_orderkey,
                ROUND(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
                ROUND(lead(o_totalprice, 1) OVER w, 2) AS next_price,
                ntile(4) OVER w AS quartile,
                ROUND(cume_dist() OVER w, 6) AS cdist,
                rank() OVER w AS rnk
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",

    "q188_semi_anti_join" ->
      """SELECT c_custkey, 'has_urgent' AS tag FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
         UNION ALL
         SELECT c_custkey, 'no_urgent' FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""",

    "q186_levenshtein_pairs" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
                levenshtein(a.p_name, b.p_name) AS edit_dist
         FROM part a JOIN part b
           ON a.p_brand = b.p_brand AND a.p_size = b.p_size
          AND a.p_partkey < b.p_partkey
         WHERE levenshtein(a.p_name, b.p_name) <= 5""",

    "q187_random_projection" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                     FROM embeddings)
          SELECT vec_id AS id, j AS dim,
                 ROUND(list_sum(list_transform(range(0, len(emb)),
                   i -> emb[CAST(i AS INT) + 1] * ($RP_SIGN))) / sqrt(8), 6) AS value
          FROM e, range(0, 8) t(j)""",

    "q281_hierarchy_flatten" ->
      """WITH RECURSIVE r AS (
           SELECT p_partkey AS key, p_partkey AS root_key, CAST(0 AS BIGINT) AS depth
           FROM part WHERE p_partkey // 7 = p_partkey
           UNION ALL
           SELECT p.p_partkey, r.root_key, r.depth + 1
           FROM part p JOIN r ON p.p_partkey // 7 = r.key
           WHERE p.p_partkey // 7 <> p.p_partkey
         )
         SELECT key, root_key, depth FROM r""",

    "q353_pct_of_parent" ->
      """WITH rev AS (
           SELECT r_name, n_name,
                  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sales
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY r_name, n_name)
         SELECT r_name, n_name, CAST(sales AS DOUBLE) AS sales,
                ROUND(CAST(sales AS DOUBLE) /
                  CAST(sum(sales) OVER (PARTITION BY r_name) AS DOUBLE), 6)
                  AS pct_of_region,
                ROUND(CAST(sales AS DOUBLE) /
                  CAST(sum(sales) OVER () AS DOUBLE), 6) AS pct_of_total
         FROM rev""",

    "q352_distinct_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
                coalesce(n_name, 'ALL') AS nation,
                CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
                count(*) AS n_orders
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)""",

    "q346_degree_assortativity" ->
      """WITH t AS (SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS p
                    FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          e AS (SELECT c AS src, p AS dst FROM t
                UNION ALL SELECT p AS src, c AS dst FROM t),
          deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY src),
          pairs AS (SELECT dx.deg AS dx, dy.deg AS dy
                    FROM e JOIN deg dx ON e.src = dx.node
                           JOIN deg dy ON e.dst = dy.node),
          st AS (SELECT count(*) AS m, sum(dx) AS sx, sum(dy) AS sy,
                        sum(dx * dy) AS sxy, sum(dx * dx) AS sxx,
                        sum(dy * dy) AS syy
                 FROM pairs)
         SELECT CAST(m AS BIGINT) AS m_pairs,
                ROUND(CAST(m * sxy - sx * sy AS DOUBLE) /
                      (sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) *
                       sqrt(CAST(m * syy - sy * sy AS DOUBLE))), 6)
                  AS assortativity
         FROM st""",

    "q343_skyline" ->
      """WITH pm AS (SELECT p_retailprice AS v, min(CAST(p_size AS BIGINT))
                            AS m
                     FROM part GROUP BY 1),
          cm AS (SELECT v, m,
                        min(m) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                          PRECEDING AND 1 PRECEDING) AS excl
                 FROM pm)
         SELECT p.p_partkey, p.p_retailprice, p.p_size
         FROM part p JOIN cm ON p.p_retailprice = cm.v
         WHERE CAST(p.p_size AS BIGINT) = cm.m
           AND (cm.excl IS NULL OR CAST(p.p_size AS BIGINT) < cm.excl)""",

    "q334_temporal_reach" ->
      """WITH RECURSIVE
          t AS (SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS p,
                       CAST(l_shipdate AS DATE) AS dt
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          e AS (SELECT c AS src, p AS dst, dt FROM t
                UNION SELECT p AS src, c AS dst, dt FROM t),
          st AS (
            SELECT CAST(s_suppkey + 1000000 AS BIGINT) AS node,
                   DATE '1996-01-01' AS d, 0 AS hop
            FROM supplier WHERE s_suppkey % 37 = 0
            UNION
            SELECT e.dst, e.dt, st.hop + 1
            FROM st JOIN e ON e.src = st.node
            WHERE e.dt > st.d AND st.hop < 3
          )
         SELECT node, CAST(min(d) AS VARCHAR) AS exposed_on
         FROM st GROUP BY node""",

    "q282_bfs_khop" ->
      """WITH RECURSIVE
          t AS (SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS p
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          e AS (SELECT c AS src, p AS dst FROM t
                UNION SELECT p AS src, c AS dst FROM t),
          d AS (
            SELECT CAST(c_custkey AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
            FROM customer WHERE c_custkey % 50 = 0
            UNION
            SELECT e.dst, d.dist + 1 FROM d JOIN e ON e.src = d.node
            WHERE d.dist < 4
          )
          SELECT node, min(dist) AS dist FROM d GROUP BY node""",

    "q287_time_range_rolling" ->
      """SELECT user_id, event_id,
                count(*) OVER w AS n_7d,
                CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                  AS sum_7d
         FROM (SELECT user_id, event_id,
                      CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
               FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY sec
                      RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)""",

    "q288_lorenz_curve" ->
      """WITH per AS (SELECT o_custkey,
                             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                               AS BIGINT) AS cents
                      FROM orders GROUP BY o_custkey),
          r AS (SELECT cents,
                  row_number() OVER (ORDER BY cents, o_custkey) AS rank,
                  count(*) OVER () AS n,
                  sum(cents) OVER () AS totc
                FROM per),
          d AS (SELECT ((rank - 1) * 10) // n AS decile, cents, totc FROM r),
          g AS (SELECT decile, count(*) AS n_cust,
                       CAST(sum(cents) AS BIGINT) AS dcents,
                       CAST(max(totc) AS BIGINT) AS totc
                FROM d GROUP BY decile)
         SELECT decile, n_cust,
                ROUND(CAST(dcents AS DOUBLE) / totc, 6) AS share,
                ROUND(CAST(sum(dcents) OVER (ORDER BY decile) AS DOUBLE)
                      / totc, 6) AS cum_share
         FROM g""",

    "q289_bom_rollup" ->
      """WITH RECURSIVE cl AS (
           SELECT p_partkey AS key, p_partkey AS anc, CAST(0 AS BIGINT) AS hops
           FROM part
           UNION ALL
           SELECT cl.key, a.p_partkey // 7, cl.hops + 1
           FROM cl JOIN part a ON a.p_partkey = cl.anc
           WHERE a.p_partkey // 7 <> a.p_partkey
         ),
         v AS (SELECT p_partkey AS key,
                      CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                        AS cents
               FROM part)
         SELECT anc AS p_partkey, count(*) AS subtree_n,
                CAST(sum(cents) AS BIGINT) AS subtree_cents,
                max(hops) AS subtree_height
         FROM cl JOIN v USING (key) GROUP BY anc""",

    "q313_hierarchy_paths" ->
      """WITH RECURSIVE r AS (
           SELECT p_partkey AS key, CAST(p_partkey AS VARCHAR) AS path,
                  CAST(0 AS BIGINT) AS depth
           FROM part WHERE p_partkey // 7 = p_partkey
           UNION ALL
           SELECT p.p_partkey,
                  r.path || '/' || CAST(p.p_partkey AS VARCHAR), r.depth + 1
           FROM part p JOIN r ON p.p_partkey // 7 = r.key
           WHERE p.p_partkey // 7 <> p.p_partkey
         )
         SELECT key, path, depth FROM r""",

    "q314_interval_concurrency" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS s,
                           CAST(o_orderkey % 14 + 1 AS INT) AS dur
                    FROM orders),
          b AS (SELECT s AS v, 1 AS delta FROM o
                UNION ALL SELECT s + (dur + 1), -1 FROM o),
          g AS (SELECT v, CAST(sum(delta) AS BIGINT) AS delta
                FROM b GROUP BY v)
         SELECT CAST(v AS VARCHAR) AS day,
                CAST(sum(delta) OVER (ORDER BY v) AS BIGINT) AS active
         FROM g""",

    "q297_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price,
                CAST(rn AS INT) AS rank
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
               FROM orders)
         WHERE rn <= 3""",

    "q298_trending_topk" ->
      """WITH daily AS (
           SELECT p_brand, CAST(l_shipdate AS DATE) AS day,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS cents
           FROM lineitem JOIN part ON l_partkey = p_partkey
           GROUP BY 1, 2),
          tr AS (
           SELECT day, p_brand,
                  sum(cents) OVER (PARTITION BY p_brand
                    ORDER BY CAST(epoch(CAST(day AS TIMESTAMP)) AS BIGINT)
                    RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW) AS rev7
           FROM daily),
          rk AS (
           SELECT CAST(day AS VARCHAR) AS day, p_brand,
                  CAST(rev7 AS DOUBLE) AS rev7d,
                  row_number() OVER (PARTITION BY day
                    ORDER BY rev7 DESC, p_brand) AS rn
           FROM tr)
         SELECT day, p_brand, ROUND(rev7d / 100, 2) AS rev7,
                CAST(rn AS INT) AS rank
         FROM rk WHERE rn <= 3""",

    "q324_interval_merge" ->
      """WITH iv AS (SELECT o_custkey AS k, CAST(o_orderdate AS DATE) AS s,
                            CAST(o_orderdate AS DATE) +
                              CAST(o_orderkey % 14 + 1 AS INT) AS e
                     FROM orders),
          m AS (SELECT k, s, e,
                  CASE WHEN max(e) OVER (PARTITION BY k ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       IS NULL
                    OR s > max(e) OVER (PARTITION BY k ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS newisl
                FROM iv),
          isl AS (SELECT k, s, e,
                    sum(newisl) OVER (PARTITION BY k ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS isl
                  FROM m),
          g AS (SELECT k, isl, count(*) AS n_iv, min(s) AS ms, max(e) AS me
                FROM isl GROUP BY k, isl)
         SELECT k AS o_custkey, CAST(sum(n_iv) AS BIGINT) AS n_intervals,
                count(*) AS n_islands,
                CAST(sum(me - ms + 1) AS BIGINT) AS covered_days
         FROM g GROUP BY k""",

    "q318_nested_export" ->
      """SELECT o_custkey,
                '[' || string_agg(CAST(json_object('k', o_orderkey,
                  's', o_orderstatus) AS VARCHAR), ',' ORDER BY o_orderkey)
                || ']' AS orders_json,
                count(*) AS n_orders
         FROM orders GROUP BY o_custkey""",

    "q312_hist2d" ->
      """WITH g AS (SELECT CAST(floor(l_quantity / 5) AS BIGINT) AS qty_bin,
                           CAST(floor(l_discount / 0.02) AS BIGINT) AS disc_bin,
                           count(*) AS n
                    FROM lineitem GROUP BY 1, 2),
          t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM g)
         SELECT qty_bin, disc_bin, n,
                ROUND(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share
         FROM g CROSS JOIN t"""
  )
}
