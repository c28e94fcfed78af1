package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Robust, TimeSeries}
import graft.functions.TextAnalysis.hash60

/** Oracle-gated statistical-inference and calibration queries added in
  * round 6: Durbin-Watson serial-correlation diagnostic, Benjamini-
  * Hochberg FDR control, fixed-bin Hosmer-Lemeshow calibration,
  * exact isotonic (PAVA) calibration, AR(2) Yule-Walker, Breusch-Pagan
  * heteroskedasticity, survival concordance (c-index), and a seeded
  * Laplace-noise private release. Determinism contract as elsewhere:
  * every sum is exact (BIGINT / DECIMAL), libm outputs cross engine
  * boundaries only after ROUND(...,6), and md5 seeds every draw.
  */
object InferenceQueries {

  type Q = (SparkSession, String) => DataFrame

  private def money(c: Column): Column = c.cast("decimal(18,2)")

  /** Daily spend per event type (shared per-series frame, = StatsQueries). */
  private def dailySpend(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(money(col("value"))).as("spend"))

  private val dailySql =
    """SELECT event_type AS key, CAST(ts AS DATE) AS day,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(25,6)) AS y
       FROM events GROUP BY 1, 2"""

  private val H60 = (x: String) => s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"

  /** OLS (a,b) per key from exact sums, both rounded to 6 — the shared
    * preamble of the residual diagnostics (DW, BP). */
  private def olsFit(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
    val idx = daily.select(col("event_type").as("key"), col("day"),
        col("spend").cast("decimal(25,6)").as("y"))
      .withColumn("x", row_number().over(w).cast("long"))
    val t = idx.groupBy(col("key")).agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
      sum(col("y")).as("sy"), sum(col("y") * col("x")).as("sxy"))
    val nd = col("n").cast("double"); val sxd = col("sx").cast("double")
    val b = (nd * col("sxy").cast("double") - sxd * col("sy").cast("double")) /
      (nd * col("sxx").cast("double") - sxd * sxd)
    val fit = t.select(col("key"), col("n"), col("sx"), col("sy"),
        round(b, 6).as("b"))
      .select(col("key"), col("n"), col("b"),
        round((col("sy").cast("double") - col("b") * col("sx").cast("double")) /
          col("n").cast("double"), 6).as("a"))
    idx.join(broadcast(fit), Seq("key"))
      .withColumn("e", round(col("y").cast("double") - col("a") -
        col("b") * col("x").cast("double"), 6))
  }

  /** Shared oracle preamble mirroring [[olsFit]]: per-key rounded (a,b)
    * plus the rounded residual e at each x. */
  private val olsSql =
    s"""s AS ($dailySql),
        i AS (SELECT key, day, y,
                CAST(row_number() OVER (PARTITION BY key ORDER BY day) AS BIGINT) AS x
              FROM s),
        t AS (SELECT key, count(*) AS n, sum(x) AS sx, sum(x*x) AS sxx,
                sum(y) AS sy, sum(y*x) AS sxy
              FROM i GROUP BY 1),
        cb AS (SELECT key, n, sx, sy,
                ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS b
               FROM t),
        ca AS (SELECT key, n, b,
                ROUND((CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
                  / CAST(n AS DOUBLE), 6) AS a
               FROM cb),
        r AS (SELECT i.key, i.day, i.x, ca.n, ca.a, ca.b,
                ROUND(CAST(i.y AS DOUBLE) - ca.a - ca.b * CAST(i.x AS DOUBLE), 6) AS e
              FROM i JOIN ca ON i.key = ca.key)"""

  val queries: Map[String, Q] = Map(

    // pass@k (k=5) unbiased estimator per problem — the eval-harness
    // aggregation for n-sample generation benchmarks (Chen et al. 2021,
    // arXiv:2107.03374 §2.1): problems = parts, samples = that part's
    // lineitems, "correct" = returnflag R. pass@5 =
    // 1 − C(n−c,5)/C(n,5), computed as the left-to-right product of
    // five exact-integer ratios (n−c−i)/(n−i) — overflow-free at ANY n
    // (no factorials), hits an exact 0 factor whenever n−c < 5, and
    // replays as the identical IEEE product in the oracle. One hash
    // agg over lineitem, row-local arithmetic after — scales.
    "q534_pass_at_k" -> ((s, d) => {
      val st = Tables.lineitem(s, d).groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("c"))
        .where(col("n") >= 5)
      val factor = (i: Int) =>
        (col("n") - col("c") - lit(i)).cast("double") /
          (col("n") - lit(i)).cast("double")
      val prod = (1 to 4).map(factor).foldLeft(factor(0))(_ * _)
      st.select(col("l_partkey").as("problem"), col("n"), col("c"),
        round(lit(1.0) - prod, 6).as("pass_at_5"))
    }),

    // Durbin-Watson serial-correlation statistic of the per-series OLS
    // residuals: DW = sum (e_t - e_{t-1})^2 / sum e_t^2. Residuals come
    // off the ROUNDED (a,b) fit so both engines square identical
    // doubles; each squared term crosses into DECIMAL(32,12) so the
    // sums are order-free — the associativity contract every
    // distributed sum here obeys
    // Page-Hinkley sequential drift detector per daily-spend series:
    // cumulative deviation from the RUNNING mean (delta=0), alarm when
    // it rises lambda=5000 above its running minimum — the online
    // changepoint alarm (the streaming-monitor companion to q508's
    // offline binary segmentation). Per-step deviations quantized to
    // DECIMAL(18,6) so the stacked cumulative folds are exact; all
    // three windows share ONE (key, day) partitioning
    "q522_page_hinkley" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wk = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val runMean = sum(col("spend")).over(wk).cast("double") /
        count(lit(1)).over(wk).cast("double")
      dailySpend(s, d)
        .withColumn("t",
          (col("spend").cast("double") - runMean).cast("decimal(18,6)"))
        .withColumn("ph", sum(col("t")).over(wk))
        .withColumn("mn", min(col("ph")).over(wk))
        .select(col("event_type"), col("day").cast("string").as("day"),
          round(col("ph").cast("double"), 6).as("ph"),
          ((col("ph") - col("mn")).cast("double") > lit(5000.0))
            .cast("int").as("alarm"))
    }),

    "q460_durbin_watson" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("key")).orderBy(col("x"))
      val r = olsFit(dailySpend(s, d))
        .withColumn("el", lag(col("e"), 1).over(w))
      r.groupBy(col("key"))
        .agg(count(lit(1)).as("n"),
          sum((col("e") * col("e")).cast("decimal(32,12)")).as("se2"),
          sum(when(col("el").isNotNull,
            ((col("e") - col("el")) * (col("e") - col("el")))
              .cast("decimal(32,12)"))).as("sd2"))
        .select(col("key").as("event_type"), col("n"),
          round(col("sd2").cast("double") / col("se2").cast("double"), 6)
            .as("dw"))
    }),

    // Benjamini-Hochberg FDR control over the 35 (event_type, weekday)
    // mean-shift hypotheses: Welch z from exact decimal sums, a
    // rounded closed-form normal-tail p proxy, then the BH step-up rule
    // at alpha=0.2. Rank is a broadcast self-join count (35 post-agg
    // rows), never a single-partition window — the shape that holds
    // when the hypothesis table is 35 rows carved out of 100 TB
    "q461_bh_fdr" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type").as("key"),
        pmod(datediff(to_date(col("ts")), lit("1970-01-01")), lit(7))
          .cast("long").as("dow"),
        money(col("value")).as("v"))
      val g = ev.groupBy(col("key"), col("dow"))
        .agg(count(lit(1)).as("n1"), sum(col("v")).as("s1"),
          sum(col("v") * col("v")).as("q1"))
      val t = ev.groupBy(col("key"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("st"),
          sum(col("v") * col("v")).as("qt"))
      val j = g.join(broadcast(t), Seq("key"))
      val n1d = col("n1").cast("double"); val n2d = (col("n") - col("n1")).cast("double")
      val s1d = col("s1").cast("double"); val q1d = col("q1").cast("double")
      val s2d = (col("st") - col("s1")).cast("double")
      val q2d = (col("qt") - col("q1")).cast("double")
      val m1 = s1d / n1d; val m2 = s2d / n2d
      val v1 = (q1d - s1d * s1d / n1d) / (n1d - lit(1.0))
      val v2 = (q2d - s2d * s2d / n2d) / (n2d - lit(1.0))
      val zc = round((m1 - m2) / sqrt(v1 / n1d + v2 / n2d), 6)
      val scored = j.select(col("key"), col("dow"), zc.as("z"))
        .withColumn("p", round(least(lit(1.0),
          lit(2.0) * exp(lit(-0.717) * abs(col("z")) -
            lit(0.416) * col("z") * col("z"))), 6))
      val a = scored.select(col("key").as("ka"), col("dow").as("da"),
        col("z"), col("p").as("pa"))
      val b = scored.select(col("key").as("kb"), col("dow").as("db"),
        col("p").as("pb"))
      val ranked = a.join(broadcast(b),
          col("pb") < col("pa") ||
            (col("pb") === col("pa") && (col("kb") < col("ka") ||
              (col("kb") === col("ka") && col("db") <= col("da")))),
          "left")
        .groupBy(col("ka"), col("da"), col("z"), col("pa"))
        .agg(count(col("kb")).as("rank"))
      // #hypotheses rides a 1-row broadcast frame (house standard)
      val m = scored.agg(count(lit(1)).as("m"))
      val kmax = ranked.crossJoin(broadcast(m))
        .where(col("pa") <=
          lit(0.2) * col("rank").cast("double") / col("m").cast("double"))
        .agg(coalesce(max(col("rank")), lit(0L)).as("kmax"))
      ranked.crossJoin(broadcast(kmax))
        .select(col("ka").as("event_type"), col("da").as("dow"),
          col("z"), col("pa").as("p"), col("rank"),
          (col("rank") <= col("kmax")).cast("int").as("discovered"))
    }),

    // fixed-bin Hosmer-Lemeshow calibration table for a seeded
    // synthetic scorer over orders: observed vs expected positives per
    // 0.1-wide score bin with the per-bin chi-square term. Value-based
    // binning (no ntile) so there is no global sort — bins are a local
    // map-side expression at any scale
    "q462_hosmer_lemeshow" -> ((s, d) => {
      // score lives in integer MICRO-units (p_micro = 1e6 * p) so the
      // per-bin expected count is an exact BIGINT sum — no double
      // rounding ever crosses the engine boundary
      val o = Tables.orders(s, d).select(
        (col("o_orderstatus") === "F").cast("long").as("label"),
        (lit(100000L) +
          floor(pmod(hash60(concat(lit("hl:"), col("o_orderkey"))),
            lit(1000000L)).cast("double") / lit(2.0)) +
          when(col("o_orderstatus") === "F", lit(250000L)).otherwise(lit(0L)))
          .as("p_micro"))
      val b = o.withColumn("bin",
        least(floor(col("p_micro").cast("double") / lit(100000.0)), lit(9L))
          .cast("int"))
      val e1d = col("e1m").cast("double") / lit(1000000.0)
      b.groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("label")).as("o1"),
          sum(col("p_micro")).as("e1m"))
        .select(col("bin"), col("n"), col("o1"),
          round(e1d, 6).as("e1"),
          round(pow(col("o1").cast("double") - e1d, 2) /
            (e1d * (lit(1.0) - e1d / col("n").cast("double"))), 6)
            .as("hl_term"))
    }),

    // exact isotonic (PAVA) calibration of each daily-spend series:
    // the minimax closed form replayed by the oracle — gates the
    // IsotonicRegressionCalibrator semantics that were spec-only
    "q463_isotonic_pava" -> ((s, d) => {
      Robust.isotonicPava(dailySpend(s, d), col("event_type"), col("day"),
          col("spend"))
        .select(col("key").as("event_type"), col("idx"), col("y"),
          col("fitted"))
    }),

    // AR(2) Yule-Walker fit per series from the ROUNDED lag-1/2
    // autocorrelations: phi1 = r1(1-r2)/(1-r1^2), phi2 = (r2-r1^2)/
    // (1-r1^2) — the closed 2x2 solve, identical doubles both engines
    "q464_ar2_yule_walker" -> ((s, d) => {
      val rr = TimeSeries.acf(dailySpend(s, d), col("event_type"),
          col("day"), col("spend"), maxLag = 2)
        .groupBy(col("key"))
        .agg(max(when(col("lag") === 1, col("acf"))).as("r1"),
          max(when(col("lag") === 2, col("acf"))).as("r2"))
      val den = lit(1.0) - col("r1") * col("r1")
      rr.select(col("key").as("event_type"), col("r1"), col("r2"),
        round(col("r1") * (lit(1.0) - col("r2")) / den, 6).as("phi1"),
        round((col("r2") - col("r1") * col("r1")) / den, 6).as("phi2"))
    }),

    // Breusch-Pagan heteroskedasticity test per series: regress the
    // SQUARED OLS residuals back on x and report n*R² of the auxiliary
    // fit. Residuals come off the shared rounded (a,b); each auxiliary
    // sufficient stat crosses into DECIMAL so the sums are order-free
    "q465_breusch_pagan" -> ((s, d) => {
      val z = (col("e") * col("e")).as("z")
      val r = olsFit(dailySpend(s, d)).select(col("key"), col("x"), z)
      val t = r.groupBy(col("key")).agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
        sum(col("z").cast("decimal(32,12)")).as("sz"),
        sum((col("x").cast("double") * col("z")).cast("decimal(32,10)"))
          .as("sxz"),
        sum((col("z") * col("z")).cast("decimal(38,8)")).as("szz"))
      val nd = col("n").cast("double"); val sxd = col("sx").cast("double")
      val szd = col("sz").cast("double")
      val num = nd * col("sxz").cast("double") - sxd * szd
      val denx = nd * col("sxx").cast("double") - sxd * sxd
      val denz = nd * col("szz").cast("double") - szd * szd
      val r2 = num * num / (denx * denz)
      t.select(col("key").as("event_type"), col("n"),
        round(r2, 6).as("r2_aux"), round(nd * r2, 6).as("bp"))
    }),

    // first-order Markov removal-effect attribution over per-user
    // channel journeys (truncated at first purchase): transition
    // probabilities, 12 unrolled absorption steps for the base chain
    // and for each remove-one-channel chain, removal effect
    // 1 - P(conv|without c)/P(conv), normalized to shares. Mass is
    // re-quantized to DECIMAL(14,12) every step so the engines walk
    // identical numbers; the only row-scaled work is the transition
    // groupBy — everything after runs on the (channels+3)² frame
    "q466_markov_removal" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val sess = s; import sess.implicits._
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"),
        col("event_id"))
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"),
        col("event_id"),
        when(col("event_type") === "purchase", lit("CONV"))
          .otherwise(col("event_type")).as("state"))
      val kept = ev.withColumn("cb", coalesce(
          sum(when(col("state") === "CONV", 1).otherwise(0))
            .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
        .where(col("cb") === 0)
      val wDesc = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val trans = kept.select(
        coalesce(lag(col("state"), 1).over(w), lit("START")).as("f"),
        col("state").as("t"))
      val ends = kept.withColumn("rn", row_number().over(wDesc))
        .where(col("rn") === 1 && col("state") =!= "CONV")
        .select(col("state").as("f"), lit("END").as("t"))
      // cut lineage at the chain frame: the event-window subtree would
      // otherwise re-execute once per unrolled absorption step
      val tc = trans.unionByName(ends)
        .groupBy(col("f"), col("t")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint(false)
      val channels = Seq("click", "error", "signup", "view")
      val scenarios = "base" +: channels
      val ec = scenarios.map { scn =>
        val redirected =
          (if (scn == "base") tc else tc.where(col("f") =!= scn))
            .withColumn("t2",
              when(col("t") === scn, lit("END")).otherwise(col("t")))
        redirected.groupBy(col("f"), col("t2").as("t"))
          .agg(sum(col("cnt")).as("cnt"))
          .select(lit(scn).as("scn"), col("f"), col("t"), col("cnt"))
      }.reduce(_ unionByName _)
      val wf = Window.partitionBy(col("scn"), col("f"))
      val absorbers = scenarios
        .flatMap(scn => Seq((scn, "CONV", "CONV"), (scn, "END", "END")))
        .toDF("scn", "f", "t")
        .select(col("scn"), col("f"), col("t"),
          lit(1.0).cast("decimal(8,6)").as("p"))
      val pm = ec.select(col("scn"), col("f"), col("t"),
          round(col("cnt").cast("double") / sum(col("cnt")).over(wf), 6)
            .cast("decimal(8,6)").as("p"))
        .unionByName(absorbers)
        .localCheckpoint(false) // ~40-row chain matrix, referenced 12x
      var v = scenarios.toDF("scn")
        .select(col("scn"), lit("START").as("f"),
          lit(1.0).cast("decimal(14,12)").as("mass"))
      for (_ <- 1 to 12) {
        v = v.join(pm, Seq("scn", "f"))
          .groupBy(col("scn"), col("t"))
          .agg(round(sum(col("mass") * col("p")), 12)
            .cast("decimal(14,12)").as("mass"))
          .select(col("scn"), col("t").as("f"), col("mass"))
      }
      val pc = v.where(col("f") === "CONV")
        .select(col("scn"), col("mass").cast("double").as("pconv"))
      val base = pc.where(col("scn") === "base")
        .select(col("pconv").as("pb"))
      val re = pc.where(col("scn") =!= "base").crossJoin(broadcast(base))
        .select(col("scn").as("channel"),
          round(col("pb"), 6).as("p_conv_base"),
          round(col("pconv"), 6).as("p_removed"),
          round(lit(1.0) - col("pconv") / col("pb"), 6).as("removal_effect"))
      val tot = re.agg(sum(col("removal_effect").cast("decimal(10,6)"))
        .as("tot"))
      re.crossJoin(broadcast(tot))
        .select(col("channel"), col("p_conv_base"), col("p_removed"),
          col("removal_effect"),
          round(col("removal_effect") / col("tot").cast("double"), 6)
            .as("share"))
    }),

    // harmonic closeness centrality on the nation trade graph (edge =
    // customer-nation pairs with >= 280 trades): all-pairs BFS on the
    // 25-node AGGREGATED entity graph — the rollup join is the only
    // row-scaled stage; 1/d terms quantize to DECIMAL(12,9) so the
    // per-node sums are order-free
    "q467_closeness_centrality" -> ((s, d) => {
      val cnt = broadcast(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey")))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(least(col("c_nationkey"), col("s_nationkey")).as("a"),
          greatest(col("c_nationkey"), col("s_nationkey")).as("b"))
        .agg(count(lit(1)).as("n_trades"))
        .where(col("n_trades") >= 280)
      val edges = cnt.select(col("a").as("u"), col("b").as("v"))
        .unionByName(cnt.select(col("b").as("u"), col("a").as("v")))
      val dists = graft.operators.Graph.allPairsDistances(edges,
        col("u"), col("v"), maxHops = 4)
      dists.groupBy(col("s").as("node"))
        .agg(sum(when(col("dist") > 0, 1L).otherwise(0L)).as("n_reached"),
          sum(col("dist")).as("sum_dist"),
          round(sum(when(col("dist") > 0,
            round(lit(1.0) / col("dist").cast("double"), 9)
              .cast("decimal(12,9)"))).cast("double"), 6).as("harmonic"))
    }),

    // item-item collaborative filtering over brand co-purchases: cosine
    // on the order-level co-occurrence counts, top-3 neighbors per
    // brand. Vocabulary-bounded: the pair frame is (distinct brands)²
    // after the basket rollup, and the rank window partitions on the
    // brand — the CF shape that holds when baskets are 100 TB
    "q468_item_cf_topk" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val pres = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
        .distinct()
      val n = pres.groupBy(col("brand")).agg(count(lit(1)).as("n_orders"))
      val co = pres.as("x").join(pres.as("y"), Seq("ok"))
        .where(col("x.brand") < col("y.brand"))
        .groupBy(col("x.brand").as("ba"), col("y.brand").as("bb"))
        .agg(count(lit(1)).as("c"))
      val sym = co.select(col("ba"), col("bb"), col("c"))
        .unionByName(co.select(col("bb").as("ba"), col("ba").as("bb"), col("c")))
      val scored = sym
        .join(broadcast(n.select(col("brand").as("ba"), col("n_orders").as("na"))), Seq("ba"))
        .join(broadcast(n.select(col("brand").as("bb"), col("n_orders").as("nb"))), Seq("bb"))
        .select(col("ba").as("brand"), col("bb").as("neighbor"),
          round(col("c").cast("double") /
            sqrt(col("na").cast("double") * col("nb").cast("double")), 6)
            .as("cosine"))
      val wr = Window.partitionBy(col("brand"))
        .orderBy(col("cosine").desc, col("neighbor"))
      scored.withColumn("rank", row_number().over(wr).cast("long"))
        .where(col("rank") <= 3)
    }),

    // blocked sorted-neighborhood ER candidate generation: within each
    // market-segment block, order by the fuzzy key (coarse balance
    // band, then key), slide a w=3 window, and emit candidate pairs
    // with the agreement flag. The sort is per block — the window
    // partitions on the segment, so the pass range-partitions at scale
    "q469_sorted_neighborhood" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val c = Tables.customer(s, d).select(col("c_custkey"),
        col("c_mktsegment").as("seg"), col("c_nationkey").as("nat"),
        col("c_acctbal").cast("decimal(12,2)").as("bal"),
        floor(col("c_acctbal").cast("decimal(12,2)") / lit(100)).as("band"))
      val wseg = Window.partitionBy(col("seg"))
        .orderBy(col("band"), col("c_custkey"))
      // the w-1 neighbors come from lead(1..3) over the SAME window —
      // linear work per row, never an O(block^2) self-join keyed on the
      // 5-value segment (which would put a whole segment's pair square
      // on one join key)
      val withLeads = c.select(col("seg"), col("c_custkey").as("key_a"),
        col("nat").as("nat_a"), col("bal").as("bal_a"),
        array((1 to 3).map(i => struct(
          lead(col("c_custkey"), i).over(wseg).as("key_b"),
          lead(col("nat"), i).over(wseg).as("nat_b"),
          lead(col("bal"), i).over(wseg).as("bal_b"),
          lit(i.toLong).as("w_dist"))): _*).as("nb"))
      withLeads
        .select(col("seg"), col("key_a"), col("nat_a"), col("bal_a"),
          explode(col("nb")).as("n"))
        .where(col("n.key_b").isNotNull)
        .select(col("seg"), col("key_a"), col("n.key_b").as("key_b"),
          col("n.w_dist").as("w_dist"),
          (col("nat_a") === col("n.nat_b") &&
            abs(col("bal_a") - col("n.bal_b")) <= lit(50)).cast("int")
            .as("is_match"))
    }),

    // differentially-private style noisy count release per (nation,
    // segment): Laplace(1) noise from an md5-seeded inverse-CDF draw —
    // the noise is a pure row-local expression, so the release costs
    // one aggregation at any scale (n_true rides along only for the
    // gate; a real release drops it)
    "q470_dp_laplace_release" -> ((s, d) => {
      val g = Tables.customer(s, d)
        .groupBy(col("c_nationkey").as("nation"),
          col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n_true"))
      val u = (pmod(hash60(concat_ws(":", lit("dp"), col("nation"),
          col("seg"))), lit(1000000L)).cast("double") + lit(0.5)) /
        lit(1000000.0) - lit(0.5)
      g.withColumn("noise", round(
          -signum(u) * log(lit(1.0) - lit(2.0) * abs(u)), 6))
        .select(col("nation"), col("seg"), col("n_true"),
          col("noise"),
          round(col("n_true").cast("double") + col("noise"), 6)
            .as("n_noisy"))
    }),

    // survival concordance (c-index) per nation: order-span lifetime,
    // churn event = any 'F' order, risk score = account balance;
    // comparable pairs (t_i < t_j, i churned), concordant when the
    // shorter-lived customer carries the higher score. Pairs block on
    // the nation after the per-customer rollup — the O(pairs) frame is
    // entity-bounded, never raw-order-scaled
    "q471_cindex" -> ((s, d) => {
      val life = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(datediff(max(col("o_orderdate")), min(col("o_orderdate")))
          .cast("long").as("t"),
          max(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("ev"))
      val c = Tables.customer(s, d).select(col("c_custkey"),
          col("c_nationkey").as("nat"),
          col("c_acctbal").cast("decimal(12,2)").as("score"))
        .join(life, col("c_custkey") === col("o_custkey"))
      def side(t: String) = c.select(col("nat"),
        col("c_custkey").as(s"k$t"), col("t").as(s"t$t"),
        col("ev").as(s"ev$t"), col("score").as(s"s$t"))
      val pairs = side("a").join(side("b"), Seq("nat"))
        .where(col("ta") < col("tb") && col("eva") === 1)
      pairs.groupBy(col("nat"))
        .agg(count(lit(1)).as("n_comparable"),
          sum(when(col("sa") > col("sb"), 1L).otherwise(0L)).as("n_conc"),
          sum(when(col("sa") === col("sb"), 1L).otherwise(0L)).as("n_tie"))
        .select(col("nat").as("nation"), col("n_comparable"),
          col("n_conc"), col("n_tie"),
          round((col("n_conc").cast("double") +
            lit(0.5) * col("n_tie").cast("double")) /
            col("n_comparable").cast("double"), 6).as("c_index"))
    }),

    // Needleman-Wunsch global alignment score over probe-document token
    // sequences (match +2, mismatch/gap -1): the same row-local nested
    // DP fold as q454's DTW — one row of the matrix alive at a time,
    // all work inside a single projection, pairs from a bounded probe
    // set. Tokens pre-hash to 1e9 buckets so the fold carries doubles
    // whose integer values stay IEEE-exact in both engines
    "q472_needleman_wunsch" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .where(col("doc_id") % 37 === 0)
        .select(col("doc_id"), slice(split(lower(trim(col("text"))),
          "\\s+"), 1, 25).as("raw"))
        .where(size(col("raw")) > 0)
        .select(col("doc_id"), transform(col("raw"),
          t => pmod(hash60(t), lit(1000000000L)).cast("double")).as("xs"))
      val a = toks.select(col("doc_id").as("doc_a"), col("xs").as("xa"))
      val b = toks.select(col("doc_id").as("doc_b"), col("xs").as("xb"))
      val prs = a.crossJoin(b).where(col("doc_a") < col("doc_b"))
      val xa = col("xa"); val xb = col("xb")
      val initRow = concat(array(lit(0.0)),
        transform(xb, (x, j) => (lit(0) - (j + lit(1))).cast("double")))
      val folded = aggregate(xa, initRow, (prev, av) =>
        aggregate(xb, array(element_at(prev, 1) - lit(1.0)), (cur, bv) => {
          val j = size(cur)
          concat(cur, array(greatest(
            element_at(prev, j) +
              when(av === bv, lit(2.0)).otherwise(lit(-1.0)),
            element_at(prev, j + 1) - lit(1.0),
            element_at(cur, j) - lit(1.0))))
        }))
      prs.withColumn("score", element_at(folded, size(xb) + 1))
        .select(col("doc_a"), col("doc_b"),
          size(col("xa")).cast("long").as("n_a"),
          size(col("xb")).cast("long").as("n_b"),
          col("score").cast("long").as("nw_score"),
          round(col("score") /
            greatest(size(col("xa")), size(col("xb"))).cast("double"), 6)
            .as("nw_norm"))
    }),

    // Chatterjee's xi rank-correlation (2020) per event-type series:
    // the modern dependence coefficient that detects NON-monotone
    // association Pearson/Spearman (q41/q204) miss — xi = 1 −
    // 3·Σ|r_{i+1}−r_i| / (n²−1) with rows ordered by event time and r
    // the value-rank ("does value depend on time, monotone or not").
    // Ties broken deterministically by the unique event_id — the
    // documented stand-in for the estimator's random tiebreak. Two
    // group-partitioned windows + exact integer sums; the n²
    // denominator multiplies in DECIMAL(19,0) first so group sizes
    // past 2³¹ cannot overflow (the 100 TB guard).
    "q543_chatterjee_xi" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d).select(col("event_type").as("grp"),
        col("ts"), col("value").as("y"), col("event_id").as("eid"))
      val wy = Window.partitionBy(col("grp")).orderBy(col("y"), col("eid"))
      val wx = Window.partitionBy(col("grp")).orderBy(col("ts"), col("eid"))
      val ag = ev.withColumn("r", row_number().over(wy))
        .withColumn("pr", lag(col("r"), 1).over(wx))
        .where(col("pr").isNotNull)
        .groupBy(col("grp"))
        .agg(sum(abs(col("r") - col("pr"))).as("sd"),
          (count(lit(1)) + 1).as("n"))
      ag.select(col("grp"), col("n"), col("sd"),
        round(lit(1.0) - lit(3.0) * col("sd").cast("double") /
          (col("n").cast("decimal(19,0)") * col("n") - 1).cast("double"), 6)
          .as("xi"))
    }),

    // Rouge-L (LCS) F-score between sampled doc pairs — the
    // summarization-eval / clone-detection metric NW alignment (q472)
    // doesn't give: F = 2·LCS/(n_a+n_b), exactly the P/R harmonic
    // mean, so ONE IEEE division after the integer DP. Same bounded
    // probe-set shape and nested row-local fold as q472; tokens ride
    // as md5-hash values so the DP array stays double-typed in both
    // engines (a collision would replay identically anyway).
    "q541_rouge_l" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .where(col("doc_id") % 29 === 0)
        .select(col("doc_id"), slice(split(lower(trim(col("text"))),
          "\\s+"), 1, 40).as("raw"))
        .where(size(col("raw")) > 0)
        .select(col("doc_id"), transform(col("raw"),
          t => pmod(hash60(t), lit(1000000000L)).cast("double")).as("xs"))
      val a = toks.select(col("doc_id").as("doc_a"), col("xs").as("xa"))
      val b = toks.select(col("doc_id").as("doc_b"), col("xs").as("xb"))
      val prs = a.crossJoin(b).where(col("doc_a") < col("doc_b"))
      val xa = col("xa"); val xb = col("xb")
      val initRow = concat(array(lit(0.0)), transform(xb, _ => lit(0.0)))
      val folded = aggregate(xa, initRow, (prev, av) =>
        aggregate(xb, array(lit(0.0)), (cur, bv) => {
          val j = size(cur)
          concat(cur, array(
            when(av === bv, element_at(prev, j) + lit(1.0))
              .otherwise(greatest(element_at(prev, j + 1),
                element_at(cur, j)))))
        }))
      prs.withColumn("lcs", element_at(folded, size(xb) + 1))
        .select(col("doc_a"), col("doc_b"),
          size(col("xa")).cast("long").as("n_a"),
          size(col("xb")).cast("long").as("n_b"),
          col("lcs").cast("long").as("lcs"),
          round(lit(2.0) * col("lcs") /
            (size(col("xa")) + size(col("xb"))).cast("double"), 6)
            .as("rouge_l_f"))
    }),

    // seasonal-hybrid ESD anomaly rounds: deseasonalize daily spend by
    // the per-weekday median, then 3 unrolled ESD rounds — each removes
    // the largest |deviation| point and reports its Grubbs-style G
    // against the fixed 2.0 alarm line. Every stats pass is a per-key
    // groupBy over exact decimal sums; the argmax is a window
    // partitioned on the series key
    "q473_shesd_anomaly" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = dailySpend(s, d).select(col("event_type").as("key"),
        col("day"),
        pmod(datediff(col("day"), lit("1970-01-01")), lit(7)).as("dow"),
        col("spend").cast("double").as("y"))
      val med = daily.groupBy(col("key"), col("dow"))
        .agg(percentile(col("y"), lit(0.5)).as("med"))
      var cur = daily.join(broadcast(med), Seq("key", "dow"))
        .select(col("key"), col("day"), round(col("y") - col("med"), 6)
          .as("rd"))
        .localCheckpoint(false) // deseasonalized frame feeds 3 ESD rounds
      val out = (1 to 3).map { r =>
        val st = cur.groupBy(col("key")).agg(count(lit(1)).as("n"),
          sum(col("rd").cast("decimal(20,6)")).as("sm"),
          sum((col("rd") * col("rd")).cast("decimal(30,12)")).as("sq"))
        val nd = col("n").cast("double")
        val mean = col("sm").cast("double") / nd
        val sd = sqrt((col("sq").cast("double") - nd * mean * mean) /
          (nd - lit(1.0)))
        val scored = cur.join(broadcast(
            st.select(col("key"), mean.as("mu"), sd.as("sd"))), Seq("key"))
          .withColumn("dev", abs(col("rd") - col("mu")))
        val wk = Window.partitionBy(col("key"))
          .orderBy(col("dev").desc, col("day"))
        val ranked = scored.withColumn("rn", row_number().over(wk))
        val flagged = ranked.where(col("rn") === 1)
          .select(col("key").as("event_type"), lit(r).as("esd_round"),
            col("day").cast("string").as("day"),
            round(col("dev") / col("sd"), 6).as("g"),
            (col("dev") / col("sd") > lit(2.0)).cast("int").as("fired"))
        // lineage cut per round (house convention, q466/q508): without
        // it round 3 re-executes rounds 1-2's join+window from the base
        cur = ranked.where(col("rn") > 1)
          .select(col("key"), col("day"), col("rd"))
          .localCheckpoint(false)
        flagged
      }.reduce(_ unionByName _)
      out
    }),

    // hierarchical forecast reconciliation: naive-drift next-month
    // forecast per NATION (bottom-up) vs the REGION drift forecast
    // allocated top-down by historical revenue share — the coherence
    // check every rollup forecast pipeline reports. One monthly rollup
    // feeds both levels; drift forecasts are closed forms over exact
    // decimal month sums
    "q474_forecast_reconcile" -> ((s, d) => {
      val rev = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_nationkey").as("nation"),
          col("n_regionkey").as("region"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("mi"),
          col("o_totalprice").cast("decimal(18,2)").as("rev"))
      val natM = rev.groupBy(col("nation"), col("region"), col("mi"))
        .agg(sum(col("rev")).as("m_rev"))
      def drift(df: DataFrame, keys: Seq[String]): DataFrame = {
        val g = df.groupBy(keys.map(col): _*)
          .agg(min_by(col("m_rev"), col("mi")).as("first_rev"),
            max_by(col("m_rev"), col("mi")).as("last_rev"),
            min(col("mi")).as("mi0"), max(col("mi")).as("mi1"))
        g.withColumn("fc",
          col("last_rev").cast("double") +
            (col("last_rev").cast("double") - col("first_rev").cast("double")) /
            (col("mi1") - col("mi0")).cast("double"))
      }
      val natF = drift(natM, Seq("nation", "region"))
        .select(col("nation"), col("region"), col("fc").as("f_bu"))
      val regM = natM.groupBy(col("region"), col("mi"))
        .agg(sum(col("m_rev")).as("m_rev"))
      val regF = drift(regM, Seq("region"))
        .select(col("region"), col("fc").as("f_reg"))
      val natT = natM.groupBy(col("nation"))
        .agg(sum(col("m_rev")).as("tot_n"))
      val regT = regM.groupBy(col("region"))
        .agg(sum(col("m_rev")).as("tot_r"))
      natF.join(natT, Seq("nation"))
        .join(broadcast(regF), Seq("region"))
        .join(broadcast(regT), Seq("region"))
        .select(col("nation"), col("region"),
          round(col("f_bu"), 6).as("f_bu"),
          round(col("tot_n").cast("double") / col("tot_r").cast("double"), 6)
            .as("share"),
          round(col("f_reg") *
            (col("tot_n").cast("double") / col("tot_r").cast("double")), 6)
            .as("f_td"))
    }),

    // tokenizer fertility audit per language: whitespace words vs
    // BPE-style pre-tokens vs characters — the tokens-per-word and
    // chars-per-token ratios that decide how much of a 100 TB corpus a
    // fixed token budget actually buys per language. One scan, all
    // counters map-side
    "q475_tokenizer_fertility" -> ((s, d) => {
      import graft.functions.TextAnalysis
      val t = Tables.documents(s, d).select(col("lang"), col("n_chars"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("words"),
        TextAnalysis.bpeTokenCount(col("text")).cast("long").as("toks"))
      t.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"),
          sum(col("words")).as("words"), sum(col("toks")).as("toks"))
        .select(col("lang"), col("n_docs"), col("chars"), col("words"),
          col("toks"),
          round(col("toks").cast("double") / col("words").cast("double"), 6)
            .as("fertility"),
          round(col("chars").cast("double") / col("toks").cast("double"), 6)
            .as("chars_per_tok"))
    }),

    // strongly connected components of the DIRECTED nation trade graph
    // (edge a->b when customers of a bought >= 150 line items from
    // suppliers of b): mutual forward/backward reachability from the
    // same all-pairs BFS primitive, scc id = least mutual node. Runs on
    // the aggregated entity graph — the rollup is the row-scaled stage
    "q476_scc_mutual_reach" -> ((s, d) => {
      val cnt = broadcast(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey")))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(col("c_nationkey").as("a"), col("s_nationkey").as("b"))
        .agg(count(lit(1)).as("n_trades"))
        .where(col("n_trades") >= 150)
        .localCheckpoint(false) // rollup feeds both BFS directions
      val fwd = graft.operators.Graph.allPairsDistances(cnt,
        col("a"), col("b"), maxHops = 4)
      val bwd = graft.operators.Graph.allPairsDistances(cnt,
        col("b"), col("a"), maxHops = 4)
      val mutual = fwd.select(col("s"), col("node"))
        .join(bwd.select(col("s"), col("node")), Seq("s", "node"))
      val sccOf = mutual.groupBy(col("s").as("node"))
        .agg(min(col("node")).as("scc_id"))
      val sizes = sccOf.groupBy(col("scc_id"))
        .agg(count(lit(1)).as("scc_size"))
      sccOf.join(sizes, Seq("scc_id"))
        .select(col("node"), col("scc_id"), col("scc_size"))
    }),

    // sample-ratio-mismatch check per experiment stratum: md5-seeded
    // 50/50 assignment of orders, goodness-of-fit chi-square of the
    // observed split per market segment, alarm over the 3.84 line (the
    // first thing to audit before reading any A/B metric)
    "q477_srm_check" -> ((s, d) => {
      val a = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("seg"),
          pmod(hash60(concat(lit("srm:"), col("o_orderkey"))), lit(2L))
            .as("arm"))
      val g = a.groupBy(col("seg"))
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"))
      val e = (col("n0") + col("n1")).cast("double") / lit(2.0)
      val chi = (col("n0").cast("double") - e) * (col("n0").cast("double") - e) / e +
        (col("n1").cast("double") - e) * (col("n1").cast("double") - e) / e
      g.select(col("seg"), col("n0"), col("n1"),
        round(chi, 6).as("chi2"),
        (chi > lit(3.84)).cast("int").as("srm_alarm"))
    }),

    // A/B power analysis per segment: required sample size per arm for
    // a 5%-of-mean lift at alpha=.05 / power=.80 from the segment's own
    // variance — n = 2 sigma^2 (z_a + z_b)^2 / delta^2, every moment an
    // exact decimal sum
    "q478_power_analysis" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("seg"), col("o_totalprice").cast("decimal(18,2)").as("v"))
      val g = o.groupBy(col("seg")).agg(count(lit(1)).as("n"),
        sum(col("v")).as("sv"), sum(col("v") * col("v")).as("qv"))
      val nd = col("n").cast("double")
      val mean = col("sv").cast("double") / nd
      val sig2 = (col("qv").cast("double") -
        col("sv").cast("double") * col("sv").cast("double") / nd) /
        (nd - lit(1.0))
      val delta = lit(0.05) * mean
      val zsum2 = lit(7.84) // (z_.05 + z_.20)^2 = (1.96+0.84)^2, fixed literal
      g.select(col("seg"), col("n"), round(mean, 6).as("mean"),
        round(sig2, 6).as("sigma2"),
        ceil(lit(2.0) * sig2 * zsum2 / (delta * delta)).cast("long")
          .as("n_required"))
    }),

    // v-optimal histogram DP over the order-price domain: 25 equi-width
    // base cells (exact count/sum/sumsq each), then 6 unrolled DP
    // layers dp_b[i] = min_j dp_{b-1}[j] + SSE(j+1..i) — the optimizer
    // histogram construction. All DP work runs on the 25-cell frame;
    // the scan reduces to cells map-side at any scale
    "q479_voptimal_histogram" -> ((s, d) => {
      val sess = s; import sess.implicits._
      val cellsRaw = Tables.orders(s, d)
        .select(least(floor(col("o_totalprice").cast("decimal(18,2)")
          .cast("double") / lit(20000.0)), lit(24.0)).cast("int").as("c"),
          col("o_totalprice").cast("decimal(18,2)").as("v"))
        .groupBy(col("c")).agg(count(lit(1)).as("cn"),
          sum(col("v")).as("cs"), sum(col("v") * col("v")).as("cq"))
      val idx = s.range(25).select(col("id").cast("int").as("c"))
      val cells = idx.join(cellsRaw, Seq("c"), "left")
        .select((col("c") + 1).as("i"), coalesce(col("cn"), lit(0L)).as("cn"),
          coalesce(col("cs").cast("double"), lit(0.0)).as("cs"),
          coalesce(col("cq").cast("double"), lit(0.0)).as("cq"))
      import org.apache.spark.sql.expressions.Window
      val wp = Window.orderBy(col("i"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pre = cells.select(col("i"), sum(col("cn")).over(wp).as("pn"),
        sum(col("cs")).over(wp).as("ps"), sum(col("cq")).over(wp).as("pq"))
      val p0 = Seq((0, 0L, 0.0, 0.0)).toDF("i", "pn", "ps", "pq")
      val pall = pre.unionByName(p0)
      val lo = pall.select(col("i").as("j"), col("pn").as("nj"),
        col("ps").as("sj"), col("pq").as("qj"))
      val hi = pall.where(col("i") > 0).select(col("i"), col("pn").as("ni"),
        col("ps").as("si"), col("pq").as("qi"))
      val segs = lo.join(hi, col("j") < col("i"))
        .select(col("j"), col("i"),
          when(col("ni") - col("nj") === 0, lit(0.0)).otherwise(
            (col("qi") - col("qj")) -
              (col("si") - col("sj")) * (col("si") - col("sj")) /
              (col("ni") - col("nj")).cast("double")).as("sse"))
        .localCheckpoint(false)
      var dp = segs.where(col("j") === 0)
        .select(lit(1).as("b"), col("i"), col("sse").as("cost"))
      var out = dp
      for (b <- 2 to 6) {
        dp = dp.select(col("i").as("j"), col("cost").as("pc"))
          .join(segs, Seq("j"))
          .groupBy(col("i"))
          .agg(min(col("pc") + col("sse")).as("cost"))
          .select(lit(b).as("b"), col("i"), col("cost"))
        out = out.unionByName(dp)
      }
      // quantize to integer millions: cost ~ 1e13 sits far above the
      // double ulp at 4 decimals, so engines' ROUND(x,4) impls disagree
      // sub-ulp; ROUND(x/1e6) compares exactly
      out.select(col("b"), col("i"),
        round(col("cost") / lit(1000000.0)).cast("long").as("cost_m"))
    }),

    // 0/1 knapsack source selection under a token budget: weights are
    // each source's share of corpus chars (5% units), values its
    // quality-doc count, capacity 50% — the "which sources fit the
    // budget" mixing decision as an exact DP fold. The DP is row-local
    // over the source-count array; only the source rollup sees raw rows
    "q480_knapsack_select" -> ((s, d) => {
      val src = Tables.documents(s, d).groupBy(col("source"))
        .agg(sum(col("n_chars")).as("chars"),
          sum(when(col("n_chars") >= 300, 1L).otherwise(0L)).as("quality"))
      val tot = src.agg(sum(col("chars")).as("tot"))
      val items = src.crossJoin(broadcast(tot))
        .select(col("source"),
          ceil(col("chars").cast("double") * lit(20.0) /
            col("tot").cast("double")).cast("long").as("w"),
          col("quality").as("v"))
      val packed = items
        .agg(array_sort(collect_list(struct(col("source"), col("w"),
          col("v")))).as("arr"))
      val cap = 10
      val init = array((0 to cap).map(_ => lit(0L)): _*)
      val folded = aggregate(col("arr"), init, (acc, it) =>
        transform(sequence(lit(0), lit(cap)), c =>
          greatest(element_at(acc, c + 1),
            when(it.getField("w") <= c,
              element_at(acc, (c - it.getField("w")).cast("int") + 1) +
                it.getField("v")).otherwise(lit(0L)))))
      packed.select(folded.as("dp"), size(col("arr")).as("n_items"))
        .select(posexplode(col("dp")).as(Seq("capacity", "best_value")),
          col("n_items"))
        .select(col("capacity"), col("best_value"),
          col("n_items").cast("long").as("n_items"))
    }),

    // next-event prediction accuracy from the global first-order Markov
    // table: argmax transition per from-state (count desc, label asc),
    // scored against every actual next event — per-state accuracy, the
    // sanity readout of q218's transition extraction
    "q481_markov_next_accuracy" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"),
        col("event_id"))
      val pairs = Tables.events(s, d).select(col("user_id"), col("ts"),
          col("event_id"), col("event_type").as("f"))
        .withColumn("t", lead(col("f"), 1).over(w))
        .where(col("t").isNotNull)
        .select(col("f"), col("t"))
      val tc = pairs.groupBy(col("f"), col("t")).agg(count(lit(1)).as("cnt"))
      val wr = Window.partitionBy(col("f"))
        .orderBy(col("cnt").desc, col("t"))
      val pred = tc.withColumn("rn", row_number().over(wr))
        .where(col("rn") === 1).select(col("f"), col("t").as("pred"))
      pairs.join(broadcast(pred), Seq("f"))
        .groupBy(col("f"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("t") === col("pred"), 1L).otherwise(0L)).as("n_hit"))
        .select(col("f").as("from_state"), col("n"), col("n_hit"),
          round(col("n_hit").cast("double") / col("n").cast("double"), 6)
            .as("accuracy"))
    }),

    // squares (4-cycles) through each node of the q467 nation graph:
    // for every opposite-corner pair the common-neighbor count c gives
    // C(c,2) squares — two co-partitioned wedge joins on the entity
    // graph, the motif one step past q190's triangles
    "q482_square_count" -> ((s, d) => {
      val cnt = broadcast(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey")))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(least(col("c_nationkey"), col("s_nationkey")).as("a"),
          greatest(col("c_nationkey"), col("s_nationkey")).as("b"))
        .agg(count(lit(1)).as("n_trades"))
        .where(col("n_trades") >= 280)
      val e = cnt.select(col("a").as("u"), col("b").as("v"))
        .unionByName(cnt.select(col("b").as("u"), col("a").as("v")))
      val wedges = e.select(col("u"), col("v").as("m"))
        .join(e.select(col("u").as("w"), col("v").as("m")), Seq("m"))
        .where(col("u") =!= col("w"))
        .groupBy(col("u"), col("w")).agg(count(lit(1)).as("c"))
      wedges.groupBy(col("u").as("node"))
        .agg(sum(expr("c * (c - 1) div 2")).as("n_squares"),
          max(col("c")).as("max_common"))
    }),

    // audio decimation over the md5-stub codec: 3-tap moving-sum
    // anti-alias then take every 3rd interior window — q311's trim
    // sibling; entirely row-local codegen'd array work, the oracle
    // replays the stub's bytes
    "q483_audio_decimate" -> ((s, d) => {
      import graft.operators.Multimodal
      val docs = Multimodal.withPayload(Tables.documents(s, d), "text")
      Multimodal.decimateAudio(docs, col("doc_id"), col("payload"))
    }),

    // bitemporal as-of: versioned balances (valid time = order date,
    // transaction time = order date + md5 ingest lag) answered at a
    // (valid V, tx T) pair — the correction-aware warehouse lookup
    // SCD2's single time axis can't express. One window per entity key
    "q484_bitemporal_asof" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val v = Tables.orders(s, d).select(col("o_custkey").as("custkey"),
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("valid_from"),
        date_add(to_date(col("o_orderdate")),
          pmod(hash60(concat(lit("lag:"), col("o_orderkey"))), lit(6L))
            .cast("int")).as("tx_from"),
        col("o_totalprice").cast("decimal(18,2)").as("value"))
      val visible = v.where(col("valid_from") <= lit("1999-06-30") &&
        col("tx_from") <= lit("1999-09-30"))
      val w = Window.partitionBy(col("custkey"))
        .orderBy(col("valid_from").desc, col("tx_from").desc,
          col("o_orderkey").desc)
      visible.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("custkey"),
          col("valid_from").cast("string").as("valid_from"),
          col("tx_from").cast("string").as("tx_from"),
          col("value").cast("double").as("value"))
    }),

    // two-component 1-D Gaussian mixture by TWO unrolled EM rounds
    // (shared fixed variance, percentile-initialized means):
    // responsibilities quantize to DECIMAL(8,6) per row so the E-step
    // sums are exact and order-free — q306's EM determinism contract on
    // a continuous mixture
    "q485_gmm_em_1d" -> ((s, d) => {
      val xs = Tables.orders(s, d)
        .select((col("o_totalprice").cast("decimal(18,2)").cast("double") /
          lit(100000.0)).as("x"))
      val prm0 = xs.agg(count(lit(1)).as("n"),
          round(percentile(col("x"), lit(0.25)), 6).as("mu1"),
          round(percentile(col("x"), lit(0.75)), 6).as("mu2"),
          sum(col("x").cast("decimal(26,12)")).as("sx"),
          sum((col("x") * col("x")).cast("decimal(30,12)")).as("sxx"))
        .select(col("n"), col("mu1"), col("mu2"),
          round((col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double") /
              col("n").cast("double")) / (col("n").cast("double") - lit(1.0)),
            6).as("sig2"),
          lit(0.5).as("w1"))
        .localCheckpoint(false)
      var prm = prm0
      for (_ <- 1 to 2) {
        val j = xs.crossJoin(broadcast(prm))
        val dterm = ((col("x") - col("mu1")) * (col("x") - col("mu1")) -
          (col("x") - col("mu2")) * (col("x") - col("mu2"))) /
          (lit(2.0) * col("sig2"))
        val g = round(lit(1.0) / (lit(1.0) +
          ((lit(1.0) - col("w1")) / col("w1")) * exp(dterm)), 6)
          .cast("decimal(8,6)")
        prm = j.select(col("n"), col("sig2"), g.as("g"), col("x"))
          .agg(max(col("n")).as("n"), max(col("sig2")).as("sig2"),
            sum(col("g")).as("n1"),
            sum((col("g").cast("double") * col("x")).cast("decimal(26,12)"))
              .as("s1"),
            sum(((lit(1.0).cast("decimal(8,6)") - col("g")).cast("double") *
              col("x")).cast("decimal(26,12)")).as("s2"))
          .select(col("n"), col("sig2"),
            round(col("s1").cast("double") / col("n1").cast("double"), 6)
              .as("mu1"),
            round(col("s2").cast("double") /
              (col("n").cast("double") - col("n1").cast("double")), 6)
              .as("mu2"),
            round(col("n1").cast("double") / col("n").cast("double"), 6)
              .as("w1"))
          .localCheckpoint(false)
      }
      prm.select(col("n"), col("mu1"), col("mu2"), col("w1"), col("sig2"))
    }),

    // URL canonicalization for web-corpus dedup: synthetic crawl URLs
    // carry the real-world noise (case-varying host, default port,
    // scrambled query-param order, fragments, trailing slashes);
    // canonicalize = lower host, strip :443, sort params, drop
    // fragment/trailing slash. Reports raw-vs-canonical distincts per
    // host — the dedup-rate readout; all row-local string work
    "q486_url_canonicalize" -> ((s, d) => {
      val h = pmod(hash60(concat(lit("url:"), col("o_orderkey"))), lit(8L))
      val host = concat(lit("Shop"), pmod(col("o_custkey"), lit(20L)),
        lit(".Example.COM"))
      val port = when(h % 2 === 0, lit(":443")).otherwise(lit(""))
      val params = when(h % 4 < 2, lit("?a=1&b=2")).otherwise(lit("?b=2&a=1"))
      val frag = when(h < 4, lit("#top")).otherwise(lit(""))
      val raw = concat(lit("https://"), host, port,
        lit("/p/"), pmod(col("o_orderkey"), lit(100L)),
        when(h % 8 < 3, lit("/")).otherwise(lit("")), params, frag)
      val u = Tables.orders(s, d).select(col("o_orderkey"), raw.as("raw"))
      // canonicalize: drop fragment, split query, lower host, strip the
      // https default port, strip the trailing path slash, sort params
      val noFrag = split(col("raw"), "#").getItem(0)
      val base = split(noFrag, "\\?").getItem(0)
      val qs = split(noFrag, "\\?").getItem(1)
      val hostPath = substring(base, 9, 1000000)
      val hostRaw = split(hostPath, "/").getItem(0)
      val path = substring(hostPath, length(hostRaw) + 1, lit(1000000))
      val canonCol = concat(lit("https://"),
        regexp_replace(lower(hostRaw), ":443$", ""),
        regexp_replace(path, "/$", ""),
        lit("?"), concat_ws("&", array_sort(split(qs, "&"))))
      val canon = u.select(col("raw"), canonCol.as("canon"))
      canon.groupBy(regexp_extract(col("canon"),
          "https://([^/?]+)", 1).as("host"))
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("raw")).as("n_raw_distinct"),
          countDistinct(col("canon")).as("n_canon_distinct"))
    }),

    // dominant-script detection: Han-codepoint ratio per document,
    // averaged per labeled language — the script-level confusion check
    // ICU segmentation (q255) and the stopword lang-id (q20) both lean
    // on; one regexp count per row, map-side at any scale
    "q487_script_ratio" -> ((s, d) => {
      val han = size(split(col("text"), "[\\p{IsHan}]")) - 1
      val t = Tables.documents(s, d).select(col("lang"),
        col("n_chars"), han.cast("long").as("n_han"))
      t.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_han")).as("han_chars"),
          sum(col("n_chars")).as("chars"))
        .select(col("lang"), col("n_docs"), col("han_chars"),
          round(col("han_chars").cast("double") /
            col("chars").cast("double"), 6).as("han_ratio"))
    }),

    // theta-method forecast per series: SES (alpha=.4) over the series
    // plus half the drift term — the M3-winning baseline, folded
    // sequentially per key like q338's Holt
    "q488_theta_forecast" -> ((s, d) => {
      val a = 0.4
      val seqd = dailySpend(s, d)
        .select(col("event_type"), col("day"),
          col("spend").cast("double").as("y"))
        .groupBy(col("event_type"))
        .agg(array_sort(collect_list(struct(col("day").as("t"),
          col("y").as("x")))).as("arr"),
          count(lit(1)).as("n"),
          min_by(col("y"), col("day")).as("y0"),
          max_by(col("y"), col("day")).as("yn"))
      val ses = aggregate(
        expr("slice(arr, 2, size(arr) - 1)"),
        element_at(col("arr"), 1).getField("x"),
        (acc, e) => lit(a) * e.getField("x") + lit(1.0 - a) * acc)
      val drift = (col("yn") - col("y0")) /
        (col("n").cast("double") - lit(1.0))
      seqd.select(col("event_type"), col("n"),
        round(ses, 6).as("ses_level"),
        round(drift, 6).as("drift"),
        round(ses + lit(0.5) * drift, 6).as("theta_fc1"))
    }),

    // two-level variance decomposition of customer balances: within-
    // nation vs between-nation sum-of-squares per region — the ANOVA
    // partition as a rollup readout. Nation moments come off one exact
    // groupBy; every cross-level term quantizes to DECIMAL before the
    // region sum so the partition is order-free
    "q489_variance_decomposition" -> ((s, d) => {
      val nat = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_regionkey").as("region"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("region"), col("c_nationkey").as("nation"))
        .agg(count(lit(1)).as("nn"),
          sum(col("c_acctbal").cast("decimal(12,2)")).as("sn"),
          sum((col("c_acctbal").cast("decimal(12,2)") *
            col("c_acctbal").cast("decimal(12,2)"))).as("qn"))
      val reg = nat.groupBy(col("region"))
        .agg(sum(col("nn")).as("nr"), sum(col("sn")).as("sr"))
      val j = nat.join(broadcast(reg), Seq("region"))
      val mn = col("sn").cast("double") / col("nn").cast("double")
      val mr = col("sr").cast("double") / col("nr").cast("double")
      val within = (col("qn").cast("double") -
        col("sn").cast("double") * col("sn").cast("double") /
          col("nn").cast("double")).cast("decimal(30,10)")
      val between = (col("nn").cast("double") * (mn - mr) * (mn - mr))
        .cast("decimal(30,10)")
      j.select(col("region"), col("nn"), within.as("w"), between.as("b"))
        .groupBy(col("region"))
        .agg(sum(col("nn")).as("n"),
          round(sum(col("w")).cast("double"), 4).as("ss_within"),
          round(sum(col("b")).cast("double"), 4).as("ss_between"))
    }),

    // Hurst rescaled-range proxy per series: cumulative deviations off
    // the exact mean, R = range of the deviation walk, S = population
    // std, H ~ ln(R/S)/ln(n/2) — the long-memory diagnostic next to
    // q199's ACF. One ordered window per key, moments exact
    "q490_hurst_rs" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = dailySpend(s, d).select(col("event_type").as("key"),
        col("day"), col("spend").cast("decimal(25,6)").as("y"))
      val st = daily.groupBy(col("key")).agg(count(lit(1)).as("n"),
        sum(col("y")).as("sy"), sum(col("y") * col("y")).as("qy"))
      val mean = col("sy").cast("double") / col("n").cast("double")
      val wp = Window.partitionBy(col("key")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val z = daily.join(broadcast(st.select(col("key"), mean.as("mu"),
          col("n"), col("sy"), col("qy"))), Seq("key"))
        .withColumn("zt", sum(col("y").cast("double") - col("mu")).over(wp))
      z.groupBy(col("key"), col("n"), col("sy"), col("qy"), col("mu"))
        .agg(max(col("zt")).as("zmax"), min(col("zt")).as("zmin"))
        .select(col("key").as("event_type"), col("n"),
          round((col("zmax") - col("zmin")) /
            sqrt((col("qy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double") /
                col("n").cast("double")) / col("n").cast("double")), 6)
            .as("rs"),
          round(log((col("zmax") - col("zmin")) /
            sqrt((col("qy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double") /
                col("n").cast("double")) / col("n").cast("double"))) /
            log(col("n").cast("double") / lit(2.0)), 6).as("hurst"))
    }),

    // spectral entropy over the q381 periodogram periods {3,5,7,14,30}:
    // normalized-power Shannon entropy per series — flat spectrum ~ 1,
    // single dominant cycle ~ 0. Per-term p·ln p quantizes to DECIMAL
    // so the 5-term sum is order-free
    "q491_spectral_entropy" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("spend"))
        .select(col("event_type"),
          datediff(col("day"), lit("1970-01-01")).as("t"),
          col("spend").cast("double").as("y"))
      val periods = Seq(3, 5, 7, 14, 30).map(p =>
        daily.withColumn("period", lit(p))
          .withColumn("ang",
            pmod(col("t"), lit(p)).cast("double") * (lit(2.0) * lit(math.Pi)) /
              lit(p.toDouble))
          .withColumn("cq", round(col("y") * cos(col("ang")) * lit(1e6))
            .cast("long"))
          .withColumn("sq", round(col("y") * sin(col("ang")) * lit(1e6))
            .cast("long")))
      val pw = periods.reduce(_ unionByName _)
        .groupBy(col("event_type"), col("period"))
        .agg(count(lit(1)).as("nd"), sum(col("cq")).as("cqs"),
          sum(col("sq")).as("sqs"))
        .select(col("event_type"), col("period"),
          round((col("cqs").cast("double") / lit(1e6) *
            (col("cqs").cast("double") / lit(1e6)) +
            col("sqs").cast("double") / lit(1e6) *
            (col("sqs").cast("double") / lit(1e6))) /
            col("nd").cast("double"), 6).as("power"))
      val tot = pw.groupBy(col("event_type"))
        .agg(sum(col("power").cast("decimal(20,6)")).as("ptot"),
          count(lit(1)).as("k"))
      pw.join(broadcast(tot), Seq("event_type"))
        .select(col("event_type"), col("k"),
          (col("power") / col("ptot").cast("double")).as("p"))
        .select(col("event_type"), col("k"),
          when(col("p") > 0, round(-col("p") * log(col("p")), 9)
            .cast("decimal(12,9)")).otherwise(
            lit(0.0).cast("decimal(12,9)")).as("term"))
        .groupBy(col("event_type"), col("k"))
        .agg(sum(col("term")).as("tsum"))
        .select(col("event_type"),
          round(col("tsum").cast("double") /
            log(col("k").cast("double")), 6).as("spectral_entropy"))
    }),

    // QQ plot points: deciles of order value for two market segments
    // side by side — the distribution-shift readout a drift report
    // plots; one interpolated-quantile pass per segment
    "q492_qq_points" -> ((s, d) => {
      val ps = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
      val o = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
          col("o_custkey") === col("c_custkey"))
        .where(col("seg").isin("BUILDING", "MACHINERY"))
        .select(col("seg"),
          col("o_totalprice").cast("decimal(18,2)").cast("double").as("v"))
      val q = o.groupBy(col("seg"))
        .agg(percentile(col("v"), lit(ps.toArray)).as("qs"))
      val a = q.where(col("seg") === "BUILDING")
        .select(posexplode(col("qs")).as(Seq("i", "qa")))
      val b = q.where(col("seg") === "MACHINERY")
        .select(posexplode(col("qs")).as(Seq("i", "qb")))
      a.join(b, Seq("i"))
        .select(((col("i") + 1).cast("double") / lit(10.0)).as("p"),
          round(col("qa"), 6).as("q_building"),
          round(col("qb"), 6).as("q_machinery"),
          round(col("qb") - col("qa"), 6).as("qq_gap"))
    }),

    // exact two-sample energy distance on the bucketed price domain:
    // E|X-Y| terms from the O(domain) gap decomposition — each gap
    // (v_k, v_k+1) contributes width * (cumA*(nB-cumB) + cumB*(nA-cumA))
    // — all BIGINT-exact, never an O(n²) pair join. q400's Wasserstein
    // sibling with both cross and within terms
    "q493_energy_distance" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
          col("o_custkey") === col("c_custkey"))
        .where(col("seg").isin("BUILDING", "MACHINERY"))
        .select(col("seg"),
          floor(col("o_totalprice").cast("decimal(18,2)").cast("double") /
            lit(1000.0)).cast("long").as("v"))
      val dom = o.groupBy(col("v"))
        .agg(sum(when(col("seg") === "BUILDING", 1L).otherwise(0L)).as("na"),
          sum(when(col("seg") === "MACHINERY", 1L).otherwise(0L)).as("nb"))
      val wv = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pre = dom.select(col("v"), sum(col("na")).over(wv).as("ca"),
          sum(col("nb")).over(wv).as("cb"))
        .withColumn("nxt", lead(col("v"), 1).over(Window.orderBy(col("v"))))
      val tot = dom.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
      val gaps = pre.where(col("nxt").isNotNull).crossJoin(broadcast(tot))
        .select(((col("nxt") - col("v")) *
            (col("ca") * (col("tb") - col("cb")) +
             col("cb") * (col("ta") - col("ca")))).as("xy"),
          ((col("nxt") - col("v")) * col("ca") * (col("ta") - col("ca")))
            .as("xx"),
          ((col("nxt") - col("v")) * col("cb") * (col("tb") - col("cb")))
            .as("yy"),
          col("ta"), col("tb"))
      gaps.groupBy(col("ta"), col("tb"))
        .agg(sum(col("xy")).as("sxy"), sum(col("xx")).as("sxx"),
          sum(col("yy")).as("syy"))
        .select(col("ta").as("n_a"), col("tb").as("n_b"),
          round(lit(2.0) * col("sxy").cast("double") /
            (col("ta") * col("tb")).cast("double") -
            lit(2.0) * col("sxx").cast("double") /
            (col("ta") * col("ta")).cast("double") -
            lit(2.0) * col("syy").cast("double") /
            (col("tb") * col("tb")).cast("double"), 6)
            .as("energy_distance"))
    }),

    // exact 3x3 covariance matrix of the lineitem numeric features in
    // ONE aggregation pass (the sufficient-stats shape every feature-
    // correlation report runs): all nine moments are exact decimal sums
    "q494_covariance_matrix" -> ((s, d) => {
      // raw-value sums stay exact decimals; the k$-scale division
      // happens once in double space at the readout (decimal division
      // semantics differ across engines, double division does not)
      val li = Tables.lineitem(s, d).select(
        col("l_quantity").cast("decimal(12,2)").as("x"),
        col("l_extendedprice").cast("decimal(18,2)").as("y"),
        col("l_discount").cast("decimal(8,2)").as("z"))
      val g = li.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"), sum(col("z")).as("sz"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("z") * col("z")).as("szz"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("z")).as("sxz"),
        sum(col("y") * col("z")).as("syz"))
      def cvs(sab: Column, sa: Column, sb: Column, scale: Double): Column = {
        val nd = col("n").cast("double")
        round(((sab.cast("double") - sa.cast("double") * sb.cast("double") / nd)
          / (nd - lit(1.0))) / lit(scale), 6)
      }
      g.select(col("n"),
        cvs(col("sxx"), col("sx"), col("sx"), 1.0).as("var_qty"),
        cvs(col("syy"), col("sy"), col("sy"), 1e6).as("var_price_k2"),
        cvs(col("szz"), col("sz"), col("sz"), 1.0).as("var_disc"),
        cvs(col("sxy"), col("sx"), col("sy"), 1e3).as("cov_qty_price_k"),
        cvs(col("sxz"), col("sx"), col("sz"), 1.0).as("cov_qty_disc"),
        cvs(col("syz"), col("sy"), col("sz"), 1e3).as("cov_price_disc_k"))
    }),

    // closed-form 2-D PCA: eigen-decomposition of the exact 2x2
    // covariance (quantity, price/1000) — lambda = ((a+c) ± sqrt((a-c)²
    // + 4b²))/2, loadings normalized analytically. The oracle-gated
    // companion to the rows-only Spark-ML PCA gate (q189)
    "q495_pca2_closed_form" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_quantity").cast("decimal(12,2)").as("x"),
        col("l_extendedprice").cast("decimal(18,2)").as("y"))
      val g = li.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      val nd = col("n").cast("double")
      def cvr(sab: Column, sa: Column, sb: Column): Column =
        (sab.cast("double") - sa.cast("double") * sb.cast("double") / nd) /
          (nd - lit(1.0))
      // covariance of (x, y/1000) via end-scaling: cov scales linearly
      val a = round(cvr(col("sxx"), col("sx"), col("sx")), 6)
      val c = round(cvr(col("syy"), col("sy"), col("sy")) / lit(1e6), 6)
      val b = round(cvr(col("sxy"), col("sx"), col("sy")) / lit(1e3), 6)
      val w = g.select(col("n"), a.as("a"), b.as("b"), c.as("c"))
      val disc = sqrt((col("a") - col("c")) * (col("a") - col("c")) +
        lit(4.0) * col("b") * col("b"))
      val l1 = (col("a") + col("c") + disc) / lit(2.0)
      val l2 = (col("a") + col("c") - disc) / lit(2.0)
      val vx = col("b")
      val vy = l1 - col("a")
      val nrm = sqrt(vx * vx + vy * vy)
      w.select(col("n"), col("a"), col("b"), col("c"),
        round(l1, 6).as("lambda1"), round(l2, 6).as("lambda2"),
        round(l1 / (l1 + l2), 6).as("explained_ratio"),
        round(vx / nrm, 6).as("loading_x"),
        round(vy / nrm, 6).as("loading_y"))
    }),

    // Gaussian KDE read at 5 fixed eval points (h=0.5 on the 1e5-scaled
    // price axis): per-row kernel terms quantize to DECIMAL(12,9) so
    // the density sums are order-free — the smooth histogram companion
    // to q479's v-optimal bins, evaluated map-side with a row-local
    // explode (no join)
    "q496_kde_points" -> ((s, d) => {
      val sqrt2pi = math.sqrt(2.0 * math.Pi)
      val xs = Tables.orders(s, d)
        .select((col("o_totalprice").cast("decimal(18,2)").cast("double") /
          lit(100000.0)).as("x"))
      val pts = xs.select(col("x"),
        explode(array(lit(0.5), lit(1.5), lit(2.5), lit(3.5), lit(4.5)))
          .as("e"))
      val term = round(exp(-(col("x") - col("e")) * (col("x") - col("e")) /
        (lit(2.0) * lit(0.25))), 9).cast("decimal(12,9)")
      pts.select(col("e"), term.as("t"))
        .groupBy(col("e"))
        .agg(count(lit(1)).as("n"), sum(col("t")).as("ts"))
        .select(col("e"), col("n"),
          round(col("ts").cast("double") /
            (col("n").cast("double") * lit(0.5) * lit(sqrt2pi)), 6)
            .as("density"))
    }),

    // Weibull plot fit on the empirical customer-lifetime survival
    // curve: OLS of ln(-ln S(t)) on ln t over the duration DOMAIN
    // (value-bounded prefix ranks, q220's shape) gives the shape k and
    // scale lambda — the parametric summary Kaplan-Meier (q220) feeds
    "q497_weibull_fit" -> ((s, d) => {
      val life = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(datediff(max(col("o_orderdate")), min(col("o_orderdate")))
          .cast("long").as("t"))
        .where(col("t") > 0)
      // duration-DOMAIN table; prefix counts via the two-level prefix
      // sum and the grand total on a 1-row broadcast frame (house
      // standard: no driver-action scalars, no unpartitioned window)
      val dom = life.groupBy(col("t").as("v")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint(false)
      val cum = graft.operators.DataQuality.cumulativeByValue(dom, Seq("cnt"))
      val tot = dom.agg(sum(col("cnt")).as("n"))
      val surv = dom.join(cum, Seq("v")).crossJoin(broadcast(tot))
        .withColumn("s", (col("n") - col("cum_cnt")).cast("double") /
          col("n").cast("double"))
        .where(col("s") > 0 && col("s") < 1)
      val pt = surv.select(round(log(col("v").cast("double")), 6).as("lx"),
        round(log(-log(col("s"))), 6).as("ly"))
      val g = pt.agg(count(lit(1)).as("m"),
        sum(col("lx").cast("decimal(20,6)")).as("sx"),
        sum(col("ly").cast("decimal(20,6)")).as("sy"),
        sum((col("lx") * col("lx")).cast("decimal(28,12)")).as("sxx"),
        sum((col("lx") * col("ly")).cast("decimal(28,12)")).as("sxy"))
      val md = col("m").cast("double")
      val k = (md * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
        (md * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double"))
      val g2 = g.select(col("m"), round(k, 6).as("shape_k"),
        col("sx"), col("sy"))
      val intercept = (col("sy").cast("double") - col("shape_k") *
        col("sx").cast("double")) / col("m").cast("double")
      g2.select(col("m"), col("shape_k"),
        round(exp(-intercept / col("shape_k")), 6).as("scale_lambda"))
    }),

    // augmented-Dickey-Fuller-style unit-root check per series:
    // regress the first difference on the lagged level, report beta
    // and its t statistic — beta near 0 means a random walk. All
    // sufficient stats exact decimal sums off one lag window
    "q498_adf_unit_root" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("key")).orderBy(col("day"))
      val daily = dailySpend(s, d).select(col("event_type").as("key"),
        col("day"), col("spend").cast("decimal(25,6)").as("y"))
      val l = daily.withColumn("yl", lag(col("y"), 1).over(w))
        .where(col("yl").isNotNull)
        .select(col("key"), (col("y") - col("yl")).as("dy"), col("yl"))
      val g = l.groupBy(col("key")).agg(count(lit(1)).as("n"),
        sum(col("yl")).as("sx"), sum(col("dy")).as("sy"),
        sum(col("yl") * col("yl")).as("sxx"),
        sum(col("yl") * col("dy")).as("sxy"),
        sum(col("dy") * col("dy")).as("syy"))
      val nd = col("n").cast("double")
      val sxd = col("sx").cast("double"); val syd = col("sy").cast("double")
      val sxxd = col("sxx").cast("double")
      val sxyd = col("sxy").cast("double")
      val syyd = col("syy").cast("double")
      val sxxC = sxxd - sxd * sxd / nd
      val beta = (sxyd - sxd * syd / nd) / sxxC
      val alpha = (syd - beta * sxd) / nd
      val sse = syyd - syd * syd / nd - beta * beta * sxxC
      val se = sqrt((sse / (nd - lit(2.0))) / sxxC)
      g.select(col("key").as("event_type"), col("n"),
        round(beta, 6).as("beta"), round(beta / se, 6).as("t_stat"))
    }),

    // Laspeyres / Paasche / Fisher price indices between two years of
    // lineitem trade: per-part unit values off exact decimal sums,
    // quantity-weighted cross terms quantized to DECIMAL — the index-
    // number readout every pricing warehouse publishes
    "q499_price_indices" -> ((s, d) => {
      def yr(y: Int) = Tables.lineitem(s, d)
        .where(year(col("l_shipdate")) === y)
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("spend"),
          sum(col("l_quantity").cast("decimal(12,2)")).as("qty"))
        .select(col("l_partkey"),
          round(col("spend").cast("double") / col("qty").cast("double"), 6)
            .as(s"v$y"), col("qty").cast("double").as(s"q$y"))
      val j = yr(1996).join(yr(1999), Seq("l_partkey"))
      val g = j.select(
          (col("v1999") * col("q1996")).cast("decimal(28,10)").as("l_num"),
          (col("v1996") * col("q1996")).cast("decimal(28,10)").as("l_den"),
          (col("v1999") * col("q1999")).cast("decimal(28,10)").as("p_num"),
          (col("v1996") * col("q1999")).cast("decimal(28,10)").as("p_den"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("l_num")).as("ln"), sum(col("l_den")).as("ld"),
          sum(col("p_num")).as("pn"), sum(col("p_den")).as("pd"))
      val lasp = col("ln").cast("double") / col("ld").cast("double")
      val paas = col("pn").cast("double") / col("pd").cast("double")
      g.select(col("n_parts"), round(lasp, 6).as("laspeyres"),
        round(paas, 6).as("paasche"),
        round(sqrt(lasp * paas), 6).as("fisher"))
    }),

    // bucketed-table round-trip under the oracle gate: orders written
    // hash-bucketed+sorted on custkey, re-read through the catalog, and
    // aggregated on the bucket key — the groupBy consumes the bucket
    // layout with NO Exchange (BucketingSpec asserts the plan), which
    // at 100 TB is the shuffle-elimination path for every repeated
    // key-aligned pass; the oracle replays the same answer off raw
    // parquet
    "q500_bucketed_join" -> ((s, d) => {
      import graft.sources.Bucketing
      val path = "/root/repo/target/bucketed/orders_bkt_q500"
      Bucketing.writeBucketed(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice")),
        "orders_bkt_q500", "o_custkey", 8, path)
      val perCust = Bucketing.readBucketed(s, "orders_bkt_q500")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      perCust.join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n_cust"), sum(col("n_orders")).as("n_orders"),
          sum(col("rev")).cast("double").as("revenue"))
    }),

    // Atkinson inequality index (epsilon=1) per nation: 1 - geometric
    // mean / arithmetic mean of positive balances — the welfare-
    // weighted companion to q285's Gini; per-row ln quantizes to
    // DECIMAL so the log-sum is order-free
    "q501_atkinson_index" -> ((s, d) => {
      val x = Tables.customer(s, d)
        .where(col("c_acctbal") > 0)
        .select(col("c_nationkey").as("nation"),
          col("c_acctbal").cast("decimal(12,2)").as("v"))
      val g = x.groupBy(col("nation"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
          sum(round(log(col("v").cast("double")), 9)
            .cast("decimal(16,9)")).as("sl"))
      val mean = col("sv").cast("double") / col("n").cast("double")
      val gm = exp(col("sl").cast("double") / col("n").cast("double"))
      g.select(col("nation"), col("n"),
        round(mean, 6).as("mean_bal"), round(gm, 6).as("geo_mean"),
        round(lit(1.0) - gm / mean, 6).as("atkinson"))
    }),

    // Tukey median polish (2 full sweeps) of the event-type x weekday
    // spend matrix: alternately remove row and column medians — the
    // robust two-way decomposition ANOVA can't do under outliers. The
    // matrix is the 35-cell aggregation output; each sweep is one
    // groupBy-median + broadcast-subtract
    "q502_median_polish" -> ((s, d) => {
      val cell = Tables.events(s, d)
        .groupBy(col("event_type").as("k"),
          pmod(datediff(to_date(col("ts")), lit("1970-01-01")), lit(7))
            .cast("long").as("dow"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("spend"))
        .select(col("k"), col("dow"),
          col("spend").cast("double").as("y"))
      var cur = cell
      for (_ <- 1 to 2) {
        val rm = cur.groupBy(col("k"))
          .agg(percentile(col("y"), lit(0.5)).as("rmed"))
        val r1 = cur.join(broadcast(rm), Seq("k"))
          .select(col("k"), col("dow"),
            round(col("y") - col("rmed"), 6).as("y"))
        val cm = r1.groupBy(col("dow"))
          .agg(percentile(col("y"), lit(0.5)).as("cmed"))
        cur = r1.join(broadcast(cm), Seq("dow"))
          .select(col("k"), col("dow"),
            round(col("y") - col("cmed"), 6).as("y"))
      }
      cur.select(col("k").as("event_type"), col("dow"),
        col("y").as("residual"))
    }),

    // cross-correlation function between the click and purchase daily
    // spend series at lags -3..3: the lead-lag discovery readout next
    // to q199's ACF; one day-shifted equi-join per lag over the
    // aggregated series, Pearson from exact decimal sums
    "q503_cross_correlation" -> ((s, d) => {
      val daily = dailySpend(s, d)
      def ser(t: String) = daily.where(col("event_type") === t)
        .select(col("day"), col("spend").cast("decimal(25,6)").as(s"y$t"))
      val a = ser("click"); val b = ser("purchase")
      val lags = (-3 to 3).map { l =>
        a.join(b.select(date_add(col("day"), l).as("day"),
            col("ypurchase")), Seq("day"))
          .select(lit(l).as("lag"), col("yclick").as("x"),
            col("ypurchase").as("y"))
      }.reduce(_ unionByName _)
      val g = lags.groupBy(col("lag")).agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      val nd = col("n").cast("double")
      val num = nd * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")
      val den = sqrt(nd * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")) *
        sqrt(nd * col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double"))
      g.select(col("lag"), col("n"), round(num / den, 6).as("ccf"))
    }),

    // Hill diversity numbers per source: richness (q=0), exp-Shannon
    // (q=1), inverse-Simpson (q=2) over the token distribution — the
    // corpus-diversity profile a data-mixing decision reads. Simpson
    // stays fully BIGINT-exact (sum c² / N²); Shannon terms quantize
    "q504_hill_numbers" -> ((s, d) => {
      val tok = Tables.documents(s, d).select(col("source"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
        .where(length(col("t")) > 0)
      val tc = tok.groupBy(col("source"), col("t"))
        .agg(count(lit(1)).as("c"))
      val nt = tc.groupBy(col("source"))
        .agg(sum(col("c")).as("nn"), count(lit(1)).as("richness"),
          sum(col("c") * col("c")).as("sc2"))
      val tj = tc.join(broadcast(nt.select(col("source"), col("nn"))),
        Seq("source"))
      val p = col("c").cast("double") / col("nn").cast("double")
      val sh = tj.select(col("source"),
          round(-p * log(p), 9).cast("decimal(14,9)").as("term"))
        .groupBy(col("source")).agg(sum(col("term")).as("h"))
      nt.join(sh, Seq("source"))
        .select(col("source"), col("nn").as("n_tokens"), col("richness"),
          round(exp(col("h").cast("double")), 6).as("hill1"),
          round((col("nn") * col("nn")).cast("double") /
            col("sc2").cast("double"), 6).as("hill2"))
    }),

    // Heaps' law fit across sources: ln V ~ ln N regression over the
    // per-source (tokens, vocabulary) points gives the vocabulary
    // growth exponent beta and constant K — the scaling law that
    // predicts vocab size at 100x the corpus
    "q505_heaps_law" -> ((s, d) => {
      val tok = Tables.documents(s, d).select(col("source"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
        .where(length(col("t")) > 0)
      val sv = tok.groupBy(col("source"))
        .agg(count(lit(1)).as("nn"), countDistinct(col("t")).as("v"))
        .select(round(log(col("nn").cast("double")), 9).as("lx"),
          round(log(col("v").cast("double")), 9).as("ly"))
      val g = sv.agg(count(lit(1)).as("m"),
        sum(col("lx").cast("decimal(16,9)")).as("sx"),
        sum(col("ly").cast("decimal(16,9)")).as("sy"),
        sum((col("lx") * col("lx")).cast("decimal(24,12)")).as("sxx"),
        sum((col("lx") * col("ly")).cast("decimal(24,12)")).as("sxy"))
      val md = col("m").cast("double")
      val beta = (md * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
        (md * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double"))
      val g2 = g.select(col("m"), round(beta, 6).as("beta"),
        col("sx"), col("sy"))
      g2.select(col("m").as("n_sources"), col("beta"),
        round(exp((col("sy").cast("double") - col("beta") *
          col("sx").cast("double")) / col("m").cast("double")), 6)
          .as("k_const"))
    }),

    // Burrows' delta stylometry between sources: z-scores of the top-10
    // corpus words' relative frequencies, delta(a,b) = mean |z_a - z_b|
    // — the authorship/contamination distance over a vocabulary-bounded
    // frame (top-k via TakeOrdered, never a global sort of the corpus)
    "q506_burrows_delta" -> ((s, d) => {
      val tok = Tables.documents(s, d).select(col("source"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
        .where(length(col("t")) > 0)
      val top = tok.groupBy(col("t")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("t")).limit(10)
        .select(col("t"))
      val nsrc = tok.groupBy(col("source")).agg(count(lit(1)).as("nn"))
      val f = tok.join(broadcast(top), Seq("t"))
        .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
        .join(broadcast(nsrc), Seq("source"))
        .select(col("source"), col("t"),
          round(col("c").cast("double") / col("nn").cast("double"), 9)
            .cast("decimal(14,9)").as("f"))
      val st = f.groupBy(col("t")).agg(count(lit(1)).as("m"),
          sum(col("f")).as("sf"),
          sum((col("f").cast("double") * col("f").cast("double"))
            .cast("decimal(24,15)")).as("sff"))
        .select(col("t"),
          (col("sf").cast("double") / col("m").cast("double")).as("mu"),
          sqrt((col("sff").cast("double") -
            col("sf").cast("double") * col("sf").cast("double") /
              col("m").cast("double")) /
            (col("m").cast("double") - lit(1.0))).as("sd"))
      val z = f.join(broadcast(st), Seq("t"))
        .select(col("t"), col("source"),
          round((col("f").cast("double") - col("mu")) / col("sd"), 6)
            .as("z"))
      val za = z.select(col("t"), col("source").as("src_a"),
        col("z").as("za"))
      val zb = z.select(col("t"), col("source").as("src_b"),
        col("z").as("zb"))
      za.join(zb, Seq("t")).where(col("src_a") < col("src_b"))
        .select(col("src_a"), col("src_b"),
          round(abs(col("za") - col("zb")), 9).cast("decimal(14,9)")
            .as("dz"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_words"),
          round(sum(col("dz")).cast("double") / lit(10.0), 6).as("delta"))
    }),

    // two-way fixed-effects (within) regression: price-on-quantity
    // slope after demeaning by BOTH supplier and ship-month — the panel
    // workhorse that strips entity and time confounders OLS absorbs
    // into the slope. Entity/time means come off two exact rollups;
    // the demeaned cross-products quantize to DECIMAL before summing
    "q507_twfe_regression" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_suppkey").as("ent"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
          .cast("long").as("tm"),
        col("l_quantity").cast("decimal(12,2)").as("x"),
        col("l_extendedprice").cast("decimal(18,2)").as("y"))
      val gAll = li.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy")).localCheckpoint(false)
      val gEnt = li.groupBy(col("ent")).agg(count(lit(1)).as("ne"),
        sum(col("x")).as("sxe"), sum(col("y")).as("sye"))
      val gTm = li.groupBy(col("tm")).agg(count(lit(1)).as("nt"),
        sum(col("x")).as("sxt"), sum(col("y")).as("syt"))
      val j = li.join(broadcast(gEnt), Seq("ent"))
        .join(broadcast(gTm), Seq("tm"))
        .crossJoin(broadcast(gAll))
      val mxe = col("sxe").cast("double") / col("ne").cast("double")
      val mye = col("sye").cast("double") / col("ne").cast("double")
      val mxt = col("sxt").cast("double") / col("nt").cast("double")
      val myt = col("syt").cast("double") / col("nt").cast("double")
      val mx = col("sx").cast("double") / col("n").cast("double")
      val my = col("sy").cast("double") / col("n").cast("double")
      val xd = round(col("x").cast("double") - mxe - mxt + mx, 6)
      val yd = round(col("y").cast("double") - mye - myt + my, 6)
      val t = j.select((xd * yd).cast("decimal(34,10)").as("xy"),
          (xd * xd).cast("decimal(34,10)").as("xx"),
          col("x"), col("y"))
        .agg(count(lit(1)).as("n"),
          sum(col("xy")).as("sxy"), sum(col("xx")).as("sxx"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum((col("x") * col("x"))).as("sxx_raw"),
          sum((col("x") * col("y"))).as("sxy_raw"))
      val nd = col("n").cast("double")
      val betaOls = (nd * col("sxy_raw").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
        (nd * col("sxx_raw").cast("double") -
          col("sx").cast("double") * col("sx").cast("double"))
      t.select(col("n"),
        round(betaOls, 6).as("beta_ols"),
        round(col("sxy").cast("double") / col("sxx").cast("double"), 6)
          .as("beta_twfe"))
    }),

    // binary-segmentation changepoints (2 levels): the max-|CUSUM| day
    // splits each series, then each half splits again — the
    // hierarchical extension of q200's single scan. Per level one
    // ordered window per (key, segment) + an argmax row_number;
    // deviations come off exact per-segment decimal means
    "q508_binary_segmentation" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = dailySpend(s, d).select(col("event_type").as("key"),
        col("day"), col("spend").cast("decimal(25,6)").as("y"))
      def splitOnce(df: DataFrame, level: Int): (DataFrame, DataFrame) = {
        val st = df.groupBy(col("key"), col("seg"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
        val j = df.join(broadcast(st), Seq("key", "seg"))
          .withColumn("dev", col("y").cast("double") -
            col("sy").cast("double") / col("n").cast("double"))
        val wp = Window.partitionBy(col("key"), col("seg"))
          .orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cus = j.withColumn("cz", sum(col("dev")).over(wp))
        val wr = Window.partitionBy(col("key"), col("seg"))
          .orderBy(abs(col("cz")).desc, col("day"))
        val ranked = cus.withColumn("rn", row_number().over(wr))
        val bps = ranked.where(col("rn") === 1 && col("n") >= 4)
          .select(col("key"), lit(level).as("level"), col("seg"),
            col("day").cast("string").as("bp_day"),
            round(abs(col("cz")), 6).as("cusum_stat"))
        val next = ranked.join(
            bps.select(col("key"), col("seg"),
              col("bp_day").cast("date").as("bd")),
            Seq("key", "seg"))
          .select(col("key"), col("day"), col("y"),
            concat(col("seg"), when(col("day") <= col("bd"), "L")
              .otherwise("R")).as("seg"))
        (bps, next)
      }
      val base = daily.withColumn("seg", lit("0"))
      val (b1, n1) = splitOnce(base, 1)
      val (b2, _) = splitOnce(n1.localCheckpoint(false), 2)
      b1.unionByName(b2).select(col("key").as("event_type"), col("level"),
        col("seg"), col("bp_day"), col("cusum_stat"))
    }),

    // Fleiss' kappa inter-rater agreement: three md5-seeded pseudo-
    // raters label each document's language (75% faithful, 25% hash
    // noise); the agreement numerators stay BIGINT-exact all the way to
    // the final kappa ratio
    "q509_fleiss_kappa" -> ((s, d) => {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      val rated = (1 to 3).map { r =>
        val h = pmod(hash60(concat_ws(":", lit("rater"), lit(r),
          col("doc_id"))), lit(20L))
        val noisy = langs.zipWithIndex.foldLeft(lit(langs.head)) {
          case (acc, (l, i)) => when(h % 5 === i, lit(l)).otherwise(acc)
        }
        docs.select(col("doc_id"),
          when(h < 15, col("lang")).otherwise(noisy).as("cat"))
      }.reduce(_ unionByName _)
      val nic = rated.groupBy(col("doc_id"), col("cat"))
        .agg(count(lit(1)).as("c"))
      // per-item agreement numerator sum_c c^2 - 3 (n=3 raters)
      val items = nic.groupBy(col("doc_id"))
        .agg((sum(col("c") * col("c")) - lit(3L)).as("num"))
      val pi = items.agg(count(lit(1)).as("n_items"),
        sum(col("num")).as("snum"))
      val pc = rated.groupBy(col("cat")).agg(count(lit(1)).as("cc"))
        .agg(sum(col("cc") * col("cc")).as("sc2"), sum(col("cc")).as("tot"))
      val j = pi.crossJoin(broadcast(pc))
      val pbar = col("snum").cast("double") /
        (col("n_items").cast("double") * lit(6.0))
      val pe = col("sc2").cast("double") /
        (col("tot").cast("double") * col("tot").cast("double"))
      j.select(col("n_items"), round(pbar, 6).as("p_bar"),
        round(pe, 6).as("p_e"),
        round((pbar - pe) / (lit(1.0) - pe), 6).as("fleiss_kappa"))
    }),

    // Krippendorff's alpha (nominal) over the q509 rater panel made
    // UNBALANCED (rater 3 only rates even doc_ids, m_u in {2,3}) — the
    // reliability coefficient that, unlike Fleiss kappa, handles
    // missing ratings: coincidence diagonal o_cc = Σ_u n_uc(n_uc-1)/
    // (m_u-1) (exact halves in DECIMAL), marginals n_c over pairable
    // items, alpha = (A_o - A_e)/(1 - A_e)
    "q514_krippendorff_alpha" -> ((s, d) => {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      val rated = (1 to 3).map { r =>
        val h = pmod(hash60(concat_ws(":", lit("rater"), lit(r),
          col("doc_id"))), lit(20L))
        val noisy = langs.zipWithIndex.foldLeft(lit(langs.head)) {
          case (acc, (l, i)) => when(h % 5 === i, lit(l)).otherwise(acc)
        }
        val base = docs.select(col("doc_id"),
          when(h < 15, col("lang")).otherwise(noisy).as("cat"))
        if (r == 3) base.where(col("doc_id") % 2 === 0) else base
      }.reduce(_ unionByName _)
      val nuc = rated.groupBy(col("doc_id"), col("cat"))
        .agg(count(lit(1)).as("c"))
      val mu = rated.groupBy(col("doc_id")).agg(count(lit(1)).as("m"))
      val pairable = nuc.join(mu, Seq("doc_id")).where(col("m") >= 2)
      val occ = pairable.select(
        ((col("c") * (col("c") - 1)).cast("double") /
          (col("m") - 1).cast("double")).cast("decimal(18,6)").as("t"),
        col("c"), col("cat"))
      val diag = occ.agg(sum(col("t")).as("sa"), sum(col("c")).as("n"))
      val marg = occ.groupBy(col("cat")).agg(sum(col("c")).as("nc"))
        .agg(sum(col("nc") * (col("nc") - 1)).as("sc"))
      val j = diag.crossJoin(broadcast(marg))
      val ao = col("sa").cast("double") / col("n").cast("double")
      val ae = col("sc").cast("double") /
        (col("n").cast("double") * (col("n") - 1).cast("double"))
      j.select(col("n").as("n_pairable"),
        round(ao, 6).as("a_obs"), round(ae, 6).as("a_exp"),
        round((ao - ae) / (lit(1.0) - ae), 6).as("kripp_alpha"))
    }),

    // intraclass correlation ICC(1,1) of balances within nations: the
    // between/within mean squares off one exact rollup — how much of
    // the variance the grouping explains, q489's single-number summary
    "q510_icc" -> ((s, d) => {
      val g = Tables.customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("ng"),
          sum(col("c_acctbal").cast("decimal(12,2)")).as("sg"),
          sum(col("c_acctbal").cast("decimal(12,2)") *
            col("c_acctbal").cast("decimal(12,2)")).as("qg"))
      val w = g.agg(count(lit(1)).as("k"), sum(col("ng")).as("nn"),
        sum(col("sg")).as("st"),
        sum(col("qg")).as("qt"),
        sum((col("sg").cast("double") * col("sg").cast("double") /
          col("ng").cast("double")).cast("decimal(32,10)")).as("sb"),
        // Σn_i² in DECIMAL so a 100 TB group count can't overflow long —
        // cast ONE OPERAND before the multiply (a post-multiply cast would
        // still wrap in long first)
        sum(col("ng").cast("decimal(19,0)") * col("ng")).as("n2"))
      val nd = col("nn").cast("double"); val kd = col("k").cast("double")
      val ssb = col("sb").cast("double") -
        col("st").cast("double") * col("st").cast("double") / nd
      val ssw = col("qt").cast("double") - col("sb").cast("double")
      val msb = ssb / (kd - lit(1.0))
      val msw = ssw / (nd - kd)
      // textbook one-way random-effects coefficient for UNBALANCED
      // groups: n0 = (N - Σn_i²/N)/(k-1), not the mean group size
      val n0 = (nd - col("n2").cast("double") / nd) / (kd - lit(1.0))
      w.select(col("k"), col("nn").as("n"),
        round(msb, 6).as("msb"), round(msw, 6).as("msw"),
        round((msb - msw) / (msb + (n0 - lit(1.0)) * msw), 6).as("icc1"))
    })
  )

  val oracles: Map[String, String] = Map(

    "q534_pass_at_k" ->
      """WITH st AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1
                                     ELSE 0 END) AS BIGINT) AS c
                     FROM lineitem GROUP BY 1 HAVING count(*) >= 5)
         SELECT l_partkey AS problem, n, c,
           ROUND(1.0 -
             CAST(n - c - 0 AS DOUBLE) / CAST(n - 0 AS DOUBLE) *
             (CAST(n - c - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)) *
             (CAST(n - c - 2 AS DOUBLE) / CAST(n - 2 AS DOUBLE)) *
             (CAST(n - c - 3 AS DOUBLE) / CAST(n - 3 AS DOUBLE)) *
             (CAST(n - c - 4 AS DOUBLE) / CAST(n - 4 AS DOUBLE)), 6)
             AS pass_at_5
         FROM st""",

    "q522_page_hinkley" ->
      s"""WITH d AS ($dailySql),
          w1 AS (SELECT key, day, y,
                   CAST(CAST(y AS DOUBLE)
                     - CAST(sum(y) OVER wk AS DOUBLE)
                       / CAST(count(*) OVER wk AS DOUBLE)
                     AS DECIMAL(18,6)) AS t
                 FROM d
                 WINDOW wk AS (PARTITION BY key ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          w2 AS (SELECT key, day, sum(t) OVER wk AS ph
                 FROM w1
                 WINDOW wk AS (PARTITION BY key ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          w3 AS (SELECT key, day, ph, min(ph) OVER wk AS mn
                 FROM w2
                 WINDOW wk AS (PARTITION BY key ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          SELECT key AS event_type, CAST(day AS VARCHAR) AS day,
            ROUND(CAST(ph AS DOUBLE), 6) AS ph,
            CAST(CAST(ph - mn AS DOUBLE) > 5000.0 AS INT) AS alarm
          FROM w3""",

    "q460_durbin_watson" ->
      s"""WITH $olsSql,
          lg AS (SELECT key, n, e,
                   lag(e, 1) OVER (PARTITION BY key ORDER BY x) AS el
                 FROM r)
          SELECT key AS event_type, n,
                 ROUND(CAST(sum(CAST((e - el) * (e - el) AS DECIMAL(32,12)))
                         AS DOUBLE)
                   / CAST(sum(CAST(e * e AS DECIMAL(32,12))) AS DOUBLE), 6) AS dw
          FROM lg GROUP BY 1, 2""",

    "q461_bh_fdr" ->
      s"""WITH ev AS (SELECT event_type AS key,
                 (CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS dow,
                 CAST(value AS DECIMAL(18,2)) AS v
               FROM events),
          g AS (SELECT key, dow, count(*) AS n1, sum(v) AS s1,
                  sum(v*v) AS q1
                FROM ev GROUP BY 1, 2),
          t AS (SELECT key, count(*) AS n, sum(v) AS st, sum(v*v) AS qt
                FROM ev GROUP BY 1),
          z AS (SELECT g.key, g.dow,
                  ROUND((CAST(s1 AS DOUBLE) / n1
                         - CAST(st - s1 AS DOUBLE) / (n - n1))
                    / sqrt(((CAST(q1 AS DOUBLE)
                             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
                            / (n1 - 1.0)) / n1
                         + ((CAST(qt - q1 AS DOUBLE)
                             - CAST(st - s1 AS DOUBLE) * CAST(st - s1 AS DOUBLE)
                               / (n - n1)) / ((n - n1) - 1.0)) / (n - n1)), 6)
                    AS z
                FROM g JOIN t ON g.key = t.key),
          sc AS (SELECT key, dow, z,
                   ROUND(LEAST(1.0, 2.0 * exp(-0.717 * abs(z)
                     - 0.416 * z * z)), 6) AS p
                 FROM z),
          rk AS (SELECT a.key, a.dow, a.z, a.p,
                   (SELECT count(*) FROM sc b
                    WHERE b.p < a.p OR (b.p = a.p AND (b.key < a.key
                      OR (b.key = a.key AND b.dow <= a.dow)))) AS rank
                 FROM sc a),
          mm AS (SELECT count(*) AS m FROM sc),
          km AS (SELECT coalesce(max(rank), 0) AS kmax
                 FROM rk, mm WHERE p <= 0.2 * rank / m)
          SELECT key AS event_type, dow, z, p, rank,
                 CAST(rank <= kmax AS INT) AS discovered
          FROM rk, km""",

    "q462_hosmer_lemeshow" ->
      s"""WITH o AS (SELECT
                 CAST(o_orderstatus = 'F' AS BIGINT) AS label,
                 100000 + CAST(floor(CAST(
                     ${H60("'hl:' || CAST(o_orderkey AS VARCHAR)")} % 1000000
                   AS DOUBLE) / 2.0) AS BIGINT)
                 + CASE WHEN o_orderstatus = 'F' THEN 250000 ELSE 0 END
                   AS p_micro
               FROM orders),
          b AS (SELECT CAST(LEAST(floor(CAST(p_micro AS DOUBLE) / 100000.0),
                  9) AS INT) AS bin, label, p_micro
                FROM o),
          a AS (SELECT bin, count(*) AS n,
                  CAST(sum(label) AS BIGINT) AS o1,
                  CAST(sum(p_micro) AS BIGINT) AS e1m
                FROM b GROUP BY 1)
          SELECT bin, n, o1,
                 ROUND(CAST(e1m AS DOUBLE) / 1000000.0, 6) AS e1,
                 ROUND(pow(CAST(o1 AS DOUBLE) - CAST(e1m AS DOUBLE) / 1000000.0, 2)
                   / ((CAST(e1m AS DOUBLE) / 1000000.0)
                      * (1.0 - (CAST(e1m AS DOUBLE) / 1000000.0) / n)), 6)
                   AS hl_term
          FROM a""",

    "q463_isotonic_pava" ->
      s"""WITH s AS ($dailySql),
          b AS (SELECT key, day, y,
                  CAST(row_number() OVER w AS BIGINT) AS idx,
                  sum(y) OVER w AS pre
                FROM s WINDOW w AS (PARTITION BY key ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          p AS (SELECT lo.key, lo.idx AS j, hi.idx AS k,
                  CAST(hi.pre - (lo.pre - lo.y) AS DOUBLE)
                    / CAST(hi.idx - lo.idx + 1 AS DOUBLE) AS avgjk
                FROM b lo JOIN b hi
                  ON lo.key = hi.key AND lo.idx <= hi.idx),
          m AS (SELECT key, j, k,
                  min(avgjk) OVER (PARTITION BY key, j ORDER BY k DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mrev
                FROM p),
          f AS (SELECT key, k AS idx, max(mrev) AS fitted
                FROM m GROUP BY 1, 2)
          SELECT b.key AS event_type, b.idx,
                 ROUND(CAST(b.y AS DOUBLE), 6) AS y,
                 ROUND(f.fitted, 6) AS fitted
          FROM b JOIN f ON b.key = f.key AND b.idx = f.idx""",

    "q464_ar2_yule_walker" ->
      s"""WITH s AS ($dailySql),
          l AS (SELECT key, y AS x,
                  lag(y, 1) OVER w AS x1, lag(y, 2) OVER w AS x2
                FROM s WINDOW w AS (PARTITION BY key ORDER BY day)),
          e AS (SELECT key, 1 AS lag, x, x1 AS xl FROM l
                UNION ALL SELECT key, 2, x, x2 FROM l),
          a AS (SELECT key, lag, count(*) AS n,
                  CAST(sum(x) AS DOUBLE) AS sx,
                  CAST(sum(x * x) AS DOUBLE) AS sxx,
                  count(xl) AS np,
                  CAST(sum(CASE WHEN xl IS NOT NULL THEN x * xl END) AS DOUBLE) AS sxy,
                  CAST(sum(CASE WHEN xl IS NOT NULL THEN x END) AS DOUBLE) AS sh,
                  CAST(sum(xl) AS DOUBLE) AS st
                FROM e GROUP BY 1, 2),
          rr AS (SELECT key, lag,
                   ROUND((sxy - (sx / CAST(n AS DOUBLE)) * (sh + st)
                          + CAST(np AS DOUBLE) * (sx / CAST(n AS DOUBLE))
                            * (sx / CAST(n AS DOUBLE)))
                     / (sxx - sx * sx / CAST(n AS DOUBLE)), 6) AS acf
                 FROM a),
          pv AS (SELECT key,
                   max(CASE WHEN lag = 1 THEN acf END) AS r1,
                   max(CASE WHEN lag = 2 THEN acf END) AS r2
                 FROM rr GROUP BY 1)
          SELECT key AS event_type, r1, r2,
                 ROUND(r1 * (1.0 - r2) / (1.0 - r1 * r1), 6) AS phi1,
                 ROUND((r2 - r1 * r1) / (1.0 - r1 * r1), 6) AS phi2
          FROM pv""",

    "q465_breusch_pagan" ->
      s"""WITH $olsSql,
          zt AS (SELECT key, x, e * e AS z FROM r),
          ag AS (SELECT key, count(*) AS n, sum(x) AS sx,
                   sum(x * x) AS sxx,
                   sum(CAST(z AS DECIMAL(32,12))) AS sz,
                   sum(CAST(CAST(x AS DOUBLE) * z AS DECIMAL(32,10))) AS sxz,
                   sum(CAST(z * z AS DECIMAL(38,8))) AS szz
                 FROM zt GROUP BY 1)
          SELECT key AS event_type, n,
                 ROUND(pow(CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE), 2)
                   / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                         - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))), 6)
                   AS r2_aux,
                 ROUND(CAST(n AS DOUBLE)
                   * (pow(CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE), 2)
                      / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                            - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)))), 6)
                   AS bp
          FROM ag""",

    "q466_markov_removal" -> {
      val steps = (1 to 12).map { r =>
        s"""v$r AS (SELECT v.scn, p.t AS f,
                 CAST(ROUND(sum(v.mass * p.p), 12) AS DECIMAL(14,12)) AS mass
               FROM v${r - 1} v JOIN pm p
                 ON v.scn = p.scn AND v.f = p.f
               GROUP BY 1, 2)"""
      }.mkString(",\n          ")
      s"""WITH ev AS (SELECT user_id, ts, event_id,
                 CASE WHEN event_type = 'purchase' THEN 'CONV'
                      ELSE event_type END AS state
               FROM events),
          k AS (SELECT user_id, ts, event_id, state,
                  coalesce(sum(CASE WHEN state = 'CONV' THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS cb
                FROM ev),
          ke AS (SELECT * FROM k WHERE cb = 0),
          tr AS (SELECT coalesce(lag(state, 1) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id), 'START') AS f,
                   state AS t
                 FROM ke),
          en AS (SELECT state AS f, 'END' AS t
                 FROM (SELECT state, row_number() OVER (PARTITION BY user_id
                         ORDER BY ts DESC, event_id DESC) AS rn
                       FROM ke) le
                 WHERE rn = 1 AND state <> 'CONV'),
          tc AS (SELECT f, t, count(*) AS cnt
                 FROM (SELECT * FROM tr UNION ALL SELECT * FROM en) u
                 GROUP BY 1, 2),
          sc AS (SELECT * FROM (VALUES ('base'), ('click'), ('error'),
                   ('signup'), ('view')) s(scn)),
          ec AS (SELECT scn, f,
                   CASE WHEN t = scn THEN 'END' ELSE t END AS t,
                   sum(cnt) AS cnt
                 FROM sc, tc WHERE f <> scn GROUP BY 1, 2, 3),
          pm AS (SELECT scn, f, t,
                   CAST(ROUND(CAST(cnt AS DOUBLE)
                     / sum(cnt) OVER (PARTITION BY scn, f), 6)
                     AS DECIMAL(8,6)) AS p
                 FROM ec
                 UNION ALL
                 SELECT scn, ab.s, ab.s, CAST(1.0 AS DECIMAL(8,6))
                 FROM sc, (VALUES ('CONV'), ('END')) ab(s)),
          v0 AS (SELECT scn, 'START' AS f, CAST(1.0 AS DECIMAL(14,12)) AS mass
                 FROM sc),
          $steps,
          pc AS (SELECT scn, CAST(mass AS DOUBLE) AS pconv
                 FROM v12 WHERE f = 'CONV'),
          bs AS (SELECT pconv AS pb FROM pc WHERE scn = 'base'),
          re AS (SELECT scn AS channel, ROUND(pb, 6) AS p_conv_base,
                   ROUND(pconv, 6) AS p_removed,
                   ROUND(1.0 - pconv / pb, 6) AS removal_effect
                 FROM pc, bs WHERE scn <> 'base'),
          tt AS (SELECT sum(CAST(removal_effect AS DECIMAL(10,6))) AS tot
                 FROM re)
          SELECT channel, p_conv_base, p_removed, removal_effect,
                 ROUND(removal_effect / CAST(tot AS DOUBLE), 6) AS share
          FROM re, tt"""
    },

    "q467_closeness_centrality" ->
      """WITH RECURSIVE
          cnts AS (SELECT least(c.c_nationkey, s.s_nationkey) AS a,
                     greatest(c.c_nationkey, s.s_nationkey) AS b,
                     count(*) AS n_trades
                   FROM lineitem l
                   JOIN orders o ON l.l_orderkey = o.o_orderkey
                   JOIN customer c ON o.o_custkey = c.c_custkey
                   JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   WHERE c.c_nationkey <> s.s_nationkey
                   GROUP BY 1, 2
                   HAVING count(*) >= 280),
          e AS (SELECT a AS u, b AS v FROM cnts
                UNION ALL SELECT b, a FROM cnts),
          nodes AS (SELECT DISTINCT u AS node FROM e),
          walk(s, node, dist) AS (
            SELECT node, node, CAST(0 AS BIGINT) FROM nodes
            UNION
            SELECT w.s, e.v, w.dist + 1
            FROM walk w JOIN e ON w.node = e.u
            WHERE w.dist < 4),
          md AS (SELECT s, node, min(dist) AS dist
                 FROM walk GROUP BY 1, 2)
          SELECT s AS node,
                 CAST(sum(CASE WHEN dist > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_reached,
                 CAST(sum(dist) AS BIGINT) AS sum_dist,
                 ROUND(CAST(sum(CASE WHEN dist > 0 THEN
                     CAST(ROUND(1.0 / dist, 9) AS DECIMAL(12,9)) END)
                   AS DOUBLE), 6) AS harmonic
          FROM md GROUP BY 1""",

    "q468_item_cf_topk" ->
      """WITH pres AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
                       FROM lineitem JOIN part ON l_partkey = p_partkey),
          n AS (SELECT brand, count(*) AS n_orders FROM pres GROUP BY 1),
          co AS (SELECT x.brand AS ba, y.brand AS bb, count(*) AS c
                 FROM pres x JOIN pres y ON x.ok = y.ok
                 WHERE x.brand < y.brand GROUP BY 1, 2),
          sym AS (SELECT ba, bb, c FROM co
                  UNION ALL SELECT bb, ba, c FROM co),
          sc AS (SELECT sym.ba AS brand, sym.bb AS neighbor,
                   ROUND(CAST(c AS DOUBLE)
                     / sqrt(CAST(na.n_orders AS DOUBLE)
                            * CAST(nb.n_orders AS DOUBLE)), 6) AS cosine
                 FROM sym
                 JOIN n na ON sym.ba = na.brand
                 JOIN n nb ON sym.bb = nb.brand),
          rk AS (SELECT brand, neighbor, cosine,
                   row_number() OVER (PARTITION BY brand
                     ORDER BY cosine DESC, neighbor) AS rank
                 FROM sc)
          SELECT brand, neighbor, cosine, CAST(rank AS BIGINT) AS rank
          FROM rk WHERE rank <= 3""",

    "q469_sorted_neighborhood" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment AS seg,
                      c_nationkey AS nat,
                      CAST(c_acctbal AS DECIMAL(12,2)) AS bal,
                      floor(CAST(c_acctbal AS DECIMAL(12,2)) / 100) AS band
                    FROM customer),
          rn AS (SELECT *, CAST(row_number() OVER (PARTITION BY seg
                   ORDER BY band, c_custkey) AS BIGINT) AS rn
                 FROM c)
          SELECT a.seg, a.c_custkey AS key_a, b.c_custkey AS key_b,
                 b.rn - a.rn AS w_dist,
                 CAST(a.nat = b.nat AND abs(a.bal - b.bal) <= 50 AS INT)
                   AS is_match
          FROM rn a JOIN rn b
            ON a.seg = b.seg AND b.rn - a.rn BETWEEN 1 AND 3""",

    "q470_dp_laplace_release" ->
      s"""WITH g AS (SELECT c_nationkey AS nation, c_mktsegment AS seg,
                 count(*) AS n_true
               FROM customer GROUP BY 1, 2),
          u AS (SELECT nation, seg, n_true,
                  (CAST(${H60("'dp:' || CAST(nation AS VARCHAR) || ':' || seg")}
                     % 1000000 AS DOUBLE) + 0.5) / 1000000.0 - 0.5 AS uu
                FROM g)
          SELECT nation, seg, n_true,
                 ROUND(-sign(uu) * ln(1.0 - 2.0 * abs(uu)), 6) AS noise,
                 ROUND(CAST(n_true AS DOUBLE)
                   + ROUND(-sign(uu) * ln(1.0 - 2.0 * abs(uu)), 6), 6)
                   AS n_noisy
          FROM u""",

    "q471_cindex" ->
      """WITH life AS (SELECT o_custkey,
                 CAST(date_diff('day', CAST(min(o_orderdate) AS DATE),
                   CAST(max(o_orderdate) AS DATE)) AS BIGINT) AS t,
                 max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS ev
               FROM orders GROUP BY 1),
          c AS (SELECT c_nationkey AS nat, c_custkey,
                  CAST(c_acctbal AS DECIMAL(12,2)) AS score, t, ev
                FROM customer JOIN life ON c_custkey = o_custkey),
          p AS (SELECT a.nat, a.score AS sa, b.score AS sb
                FROM c a JOIN c b
                  ON a.nat = b.nat AND a.t < b.t AND a.ev = 1)
          SELECT nat AS nation, count(*) AS n_comparable,
                 CAST(sum(CASE WHEN sa > sb THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_conc,
                 CAST(sum(CASE WHEN sa = sb THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_tie,
                 ROUND((CAST(sum(CASE WHEN sa > sb THEN 1 ELSE 0 END) AS DOUBLE)
                        + 0.5 * sum(CASE WHEN sa = sb THEN 1 ELSE 0 END))
                   / count(*), 6) AS c_index
          FROM p GROUP BY 1""",

    "q472_needleman_wunsch" ->
      s"""WITH toks AS (SELECT doc_id,
                 list_transform(
                   regexp_split_to_array(lower(trim(text)), '\\s+')[1:25],
                   t -> CAST(${H60("t")} % 1000000000 AS DOUBLE)) AS xs
               FROM documents
               WHERE doc_id % 37 = 0
                 AND len(regexp_split_to_array(lower(trim(text)), '\\s+')) > 0),
          pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.xs AS xa, b.xs AS xb
                 FROM toks a JOIN toks b ON a.doc_id < b.doc_id),
          fl AS (SELECT doc_a, doc_b, len(xa) AS na, len(xb) AS nb,
                   list_reduce(
                     list_prepend(
                       list_prepend(CAST(0.0 AS DOUBLE),
                         [CAST(-i AS DOUBLE) for i in range(1, len(xb) + 1)]),
                       list_transform(xa, a -> [a])),
                     (acc, e) -> list_reduce(
                       list_prepend([acc[1] - 1.0],
                         list_transform(xb, b -> [b])),
                       (cur, eb) -> list_append(cur,
                         greatest(
                           acc[len(cur)] + CASE WHEN e[1] = eb[1]
                             THEN 2.0 ELSE -1.0 END,
                           acc[len(cur) + 1] - 1.0,
                           cur[len(cur)] - 1.0)))) AS row_
                 FROM pr)
          SELECT doc_a, doc_b, CAST(na AS BIGINT) AS n_a,
                 CAST(nb AS BIGINT) AS n_b,
                 CAST(row_[CAST(nb + 1 AS INT)] AS BIGINT) AS nw_score,
                 ROUND(row_[CAST(nb + 1 AS INT)]
                   / CAST(greatest(na, nb) AS DOUBLE), 6) AS nw_norm
          FROM fl""",

    "q543_chatterjee_xi" ->
      """WITH ev AS (SELECT event_type AS grp, ts, value AS y,
                       event_id AS eid
                     FROM events),
          r AS (SELECT grp, ts, eid,
                  row_number() OVER (PARTITION BY grp
                    ORDER BY y, eid) AS r
                FROM ev),
          df AS (SELECT grp, r, lag(r) OVER (PARTITION BY grp
                   ORDER BY ts, eid) AS pr FROM r),
          ag AS (SELECT grp, CAST(sum(abs(r - pr)) AS BIGINT) AS sd,
                   CAST(count(*) + 1 AS BIGINT) AS n
                 FROM df WHERE pr IS NOT NULL GROUP BY 1)
         SELECT grp, n, sd, ROUND(1.0 - 3.0 * CAST(sd AS DOUBLE) /
           CAST(CAST(n AS DECIMAL(19,0)) * n - 1 AS DOUBLE), 6) AS xi
         FROM ag""",

    "q541_rouge_l" ->
      s"""WITH toks AS (SELECT doc_id,
                 list_transform(
                   regexp_split_to_array(lower(trim(text)), '\\s+')[1:40],
                   t -> CAST(${H60("t")} % 1000000000 AS DOUBLE)) AS xs
               FROM documents
               WHERE doc_id % 29 = 0
                 AND len(regexp_split_to_array(lower(trim(text)), '\\s+')) > 0),
          pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.xs AS xa, b.xs AS xb
                 FROM toks a JOIN toks b ON a.doc_id < b.doc_id),
          fl AS (SELECT doc_a, doc_b, len(xa) AS na, len(xb) AS nb,
                   list_reduce(
                     list_prepend(
                       list_prepend(CAST(0.0 AS DOUBLE),
                         [CAST(0.0 AS DOUBLE) for i in range(1, len(xb) + 1)]),
                       list_transform(xa, a -> [a])),
                     (acc, e) -> list_reduce(
                       list_prepend([CAST(0.0 AS DOUBLE)],
                         list_transform(xb, b -> [b])),
                       (cur, eb) -> list_append(cur,
                         CASE WHEN e[1] = eb[1]
                           THEN acc[len(cur)] + 1.0
                           ELSE greatest(acc[len(cur) + 1], cur[len(cur)])
                         END))) AS row_
                 FROM pr)
          SELECT doc_a, doc_b, CAST(na AS BIGINT) AS n_a,
                 CAST(nb AS BIGINT) AS n_b,
                 CAST(row_[CAST(nb + 1 AS INT)] AS BIGINT) AS lcs,
                 ROUND(2.0 * row_[CAST(nb + 1 AS INT)]
                   / CAST(na + nb AS DOUBLE), 6) AS rouge_l_f
          FROM fl""",

    "q473_shesd_anomaly" -> {
      def esdRound(r: Int): String =
        s"""st$r AS (SELECT key, count(*) AS n,
                 sum(CAST(rd AS DECIMAL(20,6))) AS sm,
                 sum(CAST(rd * rd AS DECIMAL(30,12))) AS sq
               FROM cur${r - 1} GROUP BY 1),
            ms$r AS (SELECT key,
                 CAST(sm AS DOUBLE) / n AS mu,
                 sqrt((CAST(sq AS DOUBLE)
                   - n * (CAST(sm AS DOUBLE) / n) * (CAST(sm AS DOUBLE) / n))
                   / (n - 1.0)) AS sd
               FROM st$r),
            rk$r AS (SELECT c.key, c.day, c.rd,
                 abs(c.rd - m.mu) AS dev, m.sd,
                 row_number() OVER (PARTITION BY c.key
                   ORDER BY abs(c.rd - m.mu) DESC, c.day) AS rn
               FROM cur${r - 1} c JOIN ms$r m ON c.key = m.key),
            fl$r AS (SELECT key AS event_type, $r AS esd_round,
                 CAST(day AS VARCHAR) AS day,
                 ROUND(dev / sd, 6) AS g,
                 CAST(dev / sd > 2.0 AS INT) AS fired
               FROM rk$r WHERE rn = 1),
            cur$r AS (SELECT key, day, rd FROM rk$r WHERE rn > 1)"""
      s"""WITH s AS ($dailySql),
          daily AS (SELECT key, day,
                 (day - DATE '1970-01-01') % 7 AS dow,
                 CAST(y AS DOUBLE) AS y
               FROM s),
          med AS (SELECT key, dow, median(y) AS med
                  FROM daily GROUP BY 1, 2),
          cur0 AS (SELECT d.key, d.day, ROUND(d.y - m.med, 6) AS rd
                   FROM daily d JOIN med m
                     ON d.key = m.key AND d.dow = m.dow),
          ${esdRound(1)},
          ${esdRound(2)},
          ${esdRound(3)}
          SELECT * FROM fl1
          UNION ALL SELECT * FROM fl2
          UNION ALL SELECT * FROM fl3"""
    },

    "q474_forecast_reconcile" ->
      """WITH rev AS (SELECT c.c_nationkey AS nation,
                 n.n_regionkey AS region,
                 CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate)
                   AS BIGINT) AS mi,
                 CAST(o.o_totalprice AS DECIMAL(18,2)) AS rev
               FROM orders o
               JOIN customer c ON o.o_custkey = c.c_custkey
               JOIN nation n ON c.c_nationkey = n.n_nationkey),
          natm AS (SELECT nation, region, mi, sum(rev) AS m_rev
                   FROM rev GROUP BY 1, 2, 3),
          natf AS (SELECT nation, region,
                 CAST(max_by(m_rev, mi) AS DOUBLE)
                 + (CAST(max_by(m_rev, mi) AS DOUBLE)
                    - CAST(min_by(m_rev, mi) AS DOUBLE))
                   / CAST(max(mi) - min(mi) AS DOUBLE) AS f_bu
               FROM natm GROUP BY 1, 2),
          regm AS (SELECT region, mi, sum(m_rev) AS m_rev
                   FROM natm GROUP BY 1, 2),
          regf AS (SELECT region,
                 CAST(max_by(m_rev, mi) AS DOUBLE)
                 + (CAST(max_by(m_rev, mi) AS DOUBLE)
                    - CAST(min_by(m_rev, mi) AS DOUBLE))
                   / CAST(max(mi) - min(mi) AS DOUBLE) AS f_reg
               FROM regm GROUP BY 1),
          natt AS (SELECT nation, sum(m_rev) AS tot_n
                   FROM natm GROUP BY 1),
          regt AS (SELECT region, sum(m_rev) AS tot_r
                   FROM regm GROUP BY 1)
          SELECT natf.nation, natf.region,
                 ROUND(f_bu, 6) AS f_bu,
                 ROUND(CAST(tot_n AS DOUBLE) / CAST(tot_r AS DOUBLE), 6)
                   AS share,
                 ROUND(f_reg * (CAST(tot_n AS DOUBLE)
                   / CAST(tot_r AS DOUBLE)), 6) AS f_td
          FROM natf
          JOIN natt ON natf.nation = natt.nation
          JOIN regf ON natf.region = regf.region
          JOIN regt ON natf.region = regt.region""",

    "q475_tokenizer_fertility" ->
      """WITH t AS (SELECT lang, n_chars,
                 CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
                   AS BIGINT) AS words,
                 CAST(len(regexp_extract_all(text,
                   '[\p{L}]+|[0-9]+|[^\s\p{L}0-9]')) AS BIGINT) AS toks
               FROM documents)
          SELECT lang, count(*) AS n_docs,
                 CAST(sum(n_chars) AS BIGINT) AS chars,
                 CAST(sum(words) AS BIGINT) AS words,
                 CAST(sum(toks) AS BIGINT) AS toks,
                 ROUND(CAST(sum(toks) AS DOUBLE)
                   / CAST(sum(words) AS DOUBLE), 6) AS fertility,
                 ROUND(CAST(sum(n_chars) AS DOUBLE)
                   / CAST(sum(toks) AS DOUBLE), 6) AS chars_per_tok
          FROM t GROUP BY 1""",

    "q476_scc_mutual_reach" ->
      """WITH RECURSIVE
          e AS (SELECT c.c_nationkey AS a, s.s_nationkey AS b
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                WHERE c.c_nationkey <> s.s_nationkey
                GROUP BY 1, 2
                HAVING count(*) >= 150),
          nodes AS (SELECT DISTINCT a AS node FROM e
                    UNION SELECT DISTINCT b FROM e),
          fw(s, node, dist) AS (
            SELECT node, node, 0 FROM nodes
            UNION
            SELECT w.s, e.b, w.dist + 1 FROM fw w JOIN e ON w.node = e.a
            WHERE w.dist < 4),
          bw(s, node, dist) AS (
            SELECT node, node, 0 FROM nodes
            UNION
            SELECT w.s, e.a, w.dist + 1 FROM bw w JOIN e ON w.node = e.b
            WHERE w.dist < 4),
          mu AS (SELECT DISTINCT f.s, f.node
                 FROM fw f JOIN bw b ON f.s = b.s AND f.node = b.node),
          scc AS (SELECT s AS node, min(node) AS scc_id
                  FROM mu GROUP BY 1),
          sz AS (SELECT scc_id, count(*) AS scc_size
                 FROM scc GROUP BY 1)
          SELECT scc.node, scc.scc_id, sz.scc_size
          FROM scc JOIN sz ON scc.scc_id = sz.scc_id""",

    "q477_srm_check" ->
      s"""WITH a AS (SELECT c.c_mktsegment AS seg,
                 ${H60("'srm:' || CAST(o_orderkey AS VARCHAR)")} % 2 AS arm
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
          g AS (SELECT seg,
                  CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n0,
                  CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n1
                FROM a GROUP BY 1)
          SELECT seg, n0, n1,
                 ROUND((CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
                       * (CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
                       / (CAST(n0 + n1 AS DOUBLE) / 2.0)
                     + (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
                       * (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
                       / (CAST(n0 + n1 AS DOUBLE) / 2.0), 6) AS chi2,
                 CAST((CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
                       * (CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
                       / (CAST(n0 + n1 AS DOUBLE) / 2.0)
                     + (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
                       * (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
                       / (CAST(n0 + n1 AS DOUBLE) / 2.0) > 3.84 AS INT)
                   AS srm_alarm
          FROM g""",

    "q478_power_analysis" ->
      """WITH o AS (SELECT c.c_mktsegment AS seg,
                 CAST(o.o_totalprice AS DECIMAL(18,2)) AS v
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
          g AS (SELECT seg, count(*) AS n, sum(v) AS sv, sum(v * v) AS qv
                FROM o GROUP BY 1)
          SELECT seg, n,
                 ROUND(CAST(sv AS DOUBLE) / n, 6) AS mean,
                 ROUND((CAST(qv AS DOUBLE)
                   - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n)
                   / (n - 1.0), 6) AS sigma2,
                 CAST(ceil(2.0 * ((CAST(qv AS DOUBLE)
                     - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n)
                     / (n - 1.0)) * 7.84
                   / ((0.05 * (CAST(sv AS DOUBLE) / n))
                      * (0.05 * (CAST(sv AS DOUBLE) / n)))) AS BIGINT)
                   AS n_required
          FROM g""",

    "q479_voptimal_histogram" -> {
      def layer(b: Int): String =
        s"""dp$b AS (SELECT sg.i, $b AS b,
                 min(d.cost + sg.sse) AS cost
               FROM dp${b - 1} d JOIN sg ON d.i = sg.j
               GROUP BY 1)"""
      val layers = (2 to 6).map(layer).mkString(",\n          ")
      s"""WITH cr AS (SELECT CAST(LEAST(floor(CAST(o_totalprice
                     AS DECIMAL(18,2)) / 20000.0), 24) AS INT) AS c,
                 count(*) AS cn,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS cs,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))
                     * CAST(o_totalprice AS DECIMAL(18,2))) AS cq
               FROM orders GROUP BY 1),
          idx AS (SELECT CAST(g AS INT) AS c FROM range(0, 25) t(g)),
          cells AS (SELECT idx.c + 1 AS i,
                 coalesce(cr.cn, 0) AS cn,
                 coalesce(CAST(cr.cs AS DOUBLE), 0.0) AS cs,
                 coalesce(CAST(cr.cq AS DOUBLE), 0.0) AS cq
               FROM idx LEFT JOIN cr ON idx.c = cr.c),
          pre AS (SELECT i,
                 sum(cn) OVER w AS pn, sum(cs) OVER w AS ps,
                 sum(cq) OVER w AS pq
               FROM cells WINDOW w AS (ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          pall AS (SELECT i, pn, ps, pq FROM pre
                   UNION ALL SELECT 0, 0, 0.0, 0.0),
          sg AS (SELECT lo.i AS j, hi.i AS i,
                 CASE WHEN hi.pn - lo.pn = 0 THEN 0.0
                      ELSE (hi.pq - lo.pq)
                        - (hi.ps - lo.ps) * (hi.ps - lo.ps)
                          / CAST(hi.pn - lo.pn AS DOUBLE) END AS sse
               FROM pall lo JOIN pall hi ON lo.i < hi.i),
          dp1 AS (SELECT i, 1 AS b, sse AS cost FROM sg WHERE j = 0),
          $layers
          SELECT b, i, CAST(ROUND(cost / 1000000.0) AS BIGINT) AS cost_m FROM dp1
          UNION ALL SELECT b, i, CAST(ROUND(cost / 1000000.0) AS BIGINT) FROM dp2
          UNION ALL SELECT b, i, CAST(ROUND(cost / 1000000.0) AS BIGINT) FROM dp3
          UNION ALL SELECT b, i, CAST(ROUND(cost / 1000000.0) AS BIGINT) FROM dp4
          UNION ALL SELECT b, i, CAST(ROUND(cost / 1000000.0) AS BIGINT) FROM dp5
          UNION ALL SELECT b, i, CAST(ROUND(cost / 1000000.0) AS BIGINT) FROM dp6"""
    },

    "q480_knapsack_select" ->
      """WITH src AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars,
                 CAST(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
                   AS BIGINT) AS v
               FROM documents GROUP BY 1),
          tt AS (SELECT CAST(sum(chars) AS BIGINT) AS tot FROM src),
          it AS (SELECT source,
                 CAST(ceil(CAST(chars AS DOUBLE) * 20.0
                   / CAST(tot AS DOUBLE)) AS BIGINT) AS w, v
               FROM src, tt),
          packed AS (SELECT list_sort(list([source, CAST(w AS VARCHAR),
                   CAST(v AS VARCHAR)])) AS arr,
                 count(*) AS n_items
               FROM it),
          dp AS (SELECT n_items,
                 list_reduce(
                   list_prepend([CAST(0 AS BIGINT) for i in range(0, 11)],
                     list_transform(arr,
                       e -> [CAST(e[2] AS BIGINT), CAST(e[3] AS BIGINT)])),
                   (acc, e) -> [CASE WHEN e[1] <= c
                       THEN greatest(acc[c + 1],
                         acc[CAST(c - e[1] AS INT) + 1] + e[2])
                       ELSE acc[c + 1] END
                     for c in range(0, 11)]) AS fin
               FROM packed)
          SELECT CAST(g AS INT) AS capacity, fin[CAST(g + 1 AS INT)]
                   AS best_value,
                 n_items
          FROM dp, range(0, 11) t(g)""",

    "q481_markov_next_accuracy" ->
      """WITH pr AS (SELECT event_type AS f,
                 lead(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS t
               FROM events),
          pairs AS (SELECT f, t FROM pr WHERE t IS NOT NULL),
          tc AS (SELECT f, t, count(*) AS cnt FROM pairs GROUP BY 1, 2),
          pred AS (SELECT f, t AS pred FROM (
                 SELECT f, t, row_number() OVER (PARTITION BY f
                   ORDER BY cnt DESC, t) AS rn FROM tc) r
               WHERE rn = 1)
          SELECT pairs.f AS from_state, count(*) AS n,
                 CAST(sum(CASE WHEN pairs.t = pred.pred THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_hit,
                 ROUND(CAST(sum(CASE WHEN pairs.t = pred.pred
                     THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE), 6) AS accuracy
          FROM pairs JOIN pred ON pairs.f = pred.f
          GROUP BY 1""",

    "q482_square_count" ->
      """WITH cnts AS (SELECT least(c.c_nationkey, s.s_nationkey) AS a,
                 greatest(c.c_nationkey, s.s_nationkey) AS b
               FROM lineitem l
               JOIN orders o ON l.l_orderkey = o.o_orderkey
               JOIN customer c ON o.o_custkey = c.c_custkey
               JOIN supplier s ON l.l_suppkey = s.s_suppkey
               WHERE c.c_nationkey <> s.s_nationkey
               GROUP BY 1, 2
               HAVING count(*) >= 280),
          e AS (SELECT a AS u, b AS v FROM cnts
                UNION ALL SELECT b, a FROM cnts),
          wedges AS (SELECT x.u, y.u AS w, count(*) AS c
               FROM e x JOIN e y ON x.v = y.v
               WHERE x.u <> y.u
               GROUP BY 1, 2)
          SELECT u AS node,
                 CAST(sum(c * (c - 1) // 2) AS BIGINT) AS n_squares,
                 CAST(max(c) AS BIGINT) AS max_common
          FROM wedges GROUP BY 1""",

    "q483_audio_decimate" ->
      """WITH e AS (SELECT doc_id,
                 [CAST(('0x' || substr(md5(text || ':aw' ||
                    CAST(w AS VARCHAR)), 1, 2)) AS BIGINT)
                  for w in range(0, 16)] AS es
               FROM documents),
          m AS (SELECT doc_id,
                 [es[w] + es[w + 1] + es[w + 2]
                  for w in [1, 4, 7, 10, 13]] AS ma
               FROM e)
          SELECT doc_id, CAST(len(ma) AS BIGINT) AS n_out,
                 CAST(list_max(ma) AS BIGINT) AS peak,
                 CAST(list_sum(ma) AS BIGINT) AS total,
                 ROUND(CAST(list_sum(ma) AS DOUBLE) / 3.0
                   / CAST(len(ma) AS DOUBLE), 6) AS mean_smoothed
          FROM m""",

    "q484_bitemporal_asof" ->
      s"""WITH v AS (SELECT o_custkey AS custkey, o_orderkey,
                 CAST(o_orderdate AS DATE) AS valid_from,
                 CAST(o_orderdate AS DATE) + CAST(
                   ${H60("'lag:' || CAST(o_orderkey AS VARCHAR)")} % 6
                   AS INT) AS tx_from,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS value
               FROM orders),
          vis AS (SELECT *, row_number() OVER (PARTITION BY custkey
                   ORDER BY valid_from DESC, tx_from DESC,
                     o_orderkey DESC) AS rn
                 FROM v
                 WHERE valid_from <= DATE '1999-06-30'
                   AND tx_from <= DATE '1999-09-30')
          SELECT custkey, CAST(valid_from AS VARCHAR) AS valid_from,
                 CAST(tx_from AS VARCHAR) AS tx_from,
                 CAST(value AS DOUBLE) AS value
          FROM vis WHERE rn = 1""",

    "q485_gmm_em_1d" -> {
      def emRound(r: Int): String =
        s"""g$r AS (SELECT p.n, p.sig2,
                 CAST(ROUND(1.0 / (1.0 + ((1.0 - p.w1) / p.w1)
                   * exp((((x.x - p.mu1) * (x.x - p.mu1))
                        - ((x.x - p.mu2) * (x.x - p.mu2)))
                     / (2.0 * p.sig2))), 6) AS DECIMAL(8,6)) AS g,
                 x.x
               FROM xs x, p${r - 1} p),
            p$r AS (SELECT max(n) AS n, max(sig2) AS sig2,
                 ROUND(CAST(sum(CAST(CAST(g AS DOUBLE) * x
                     AS DECIMAL(26,12))) AS DOUBLE)
                   / CAST(sum(g) AS DOUBLE), 6) AS mu1,
                 ROUND(CAST(sum(CAST(CAST(CAST(1.0 AS DECIMAL(8,6)) - g
                       AS DOUBLE) * x AS DECIMAL(26,12))) AS DOUBLE)
                   / (CAST(max(n) AS DOUBLE) - CAST(sum(g) AS DOUBLE)), 6)
                   AS mu2,
                 ROUND(CAST(sum(g) AS DOUBLE) / CAST(max(n) AS DOUBLE), 6)
                   AS w1
               FROM g$r)"""
      s"""WITH xs AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2))
                   AS DOUBLE) / 100000.0 AS x
               FROM orders),
          p0 AS (SELECT count(*) AS n,
                 ROUND(quantile_cont(x, 0.25), 6) AS mu1,
                 ROUND(quantile_cont(x, 0.75), 6) AS mu2,
                 ROUND((CAST(sum(CAST(x * x AS DECIMAL(30,12))) AS DOUBLE)
                   - CAST(sum(CAST(x AS DECIMAL(26,12))) AS DOUBLE)
                     * CAST(sum(CAST(x AS DECIMAL(26,12))) AS DOUBLE)
                     / count(*))
                   / (count(*) - 1.0), 6) AS sig2,
                 0.5 AS w1
               FROM xs),
          ${emRound(1)},
          ${emRound(2)}
          SELECT n, mu1, mu2, w1, sig2 FROM p2"""
    },

    "q486_url_canonicalize" ->
      s"""WITH u AS (SELECT o_orderkey,
                 ${H60("'url:' || CAST(o_orderkey AS VARCHAR)")} % 8 AS h,
                 'Shop' || (o_custkey % 20) || '.Example.COM' AS host,
                 o_custkey, o_orderkey % 100 AS pp
               FROM orders),
          r AS (SELECT 'https://' || host
                 || CASE WHEN h % 2 = 0 THEN ':443' ELSE '' END
                 || '/p/' || pp
                 || CASE WHEN h % 8 < 3 THEN '/' ELSE '' END
                 || CASE WHEN h % 4 < 2 THEN '?a=1&b=2' ELSE '?b=2&a=1' END
                 || CASE WHEN h < 4 THEN '#top' ELSE '' END AS raw
               FROM u),
          c AS (SELECT raw,
                 string_split(raw, '#')[1] AS nofrag
               FROM r),
          c2 AS (SELECT raw,
                 string_split(nofrag, '?')[1] AS base,
                 string_split(nofrag, '?')[2] AS qs
               FROM c),
          c3 AS (SELECT raw, qs, substr(base, 9) AS hostpath FROM c2),
          c4 AS (SELECT raw, qs, hostpath,
                 string_split(hostpath, '/')[1] AS hostraw
               FROM c3),
          canon AS (SELECT raw,
                 'https://'
                 || regexp_replace(lower(hostraw), ':443$$', '')
                 || regexp_replace(substr(hostpath, length(hostraw) + 1),
                      '/$$', '')
                 || '?'
                 || array_to_string(list_sort(string_split(qs, '&')), '&')
                   AS canon
               FROM c4)
          SELECT regexp_extract(canon, 'https://([^/?]+)', 1) AS host,
                 count(*) AS n_urls,
                 count(DISTINCT raw) AS n_raw_distinct,
                 count(DISTINCT canon) AS n_canon_distinct
          FROM canon GROUP BY 1""",

    "q487_script_ratio" ->
      """WITH t AS (SELECT lang, n_chars,
                 CAST(len(regexp_split_to_array(text, '[\p{Han}]')) - 1
                   AS BIGINT) AS n_han
               FROM documents)
          SELECT lang, count(*) AS n_docs,
                 CAST(sum(n_han) AS BIGINT) AS han_chars,
                 ROUND(CAST(sum(n_han) AS DOUBLE)
                   / CAST(sum(n_chars) AS DOUBLE), 6) AS han_ratio
          FROM t GROUP BY 1""",

    "q488_theta_forecast" ->
      s"""WITH s AS ($dailySql),
          ser AS (SELECT key AS event_type,
                 list(CAST(y AS DOUBLE) ORDER BY day) AS arr,
                 count(*) AS n,
                 CAST(min_by(y, day) AS DOUBLE) AS y0,
                 CAST(max_by(y, day) AS DOUBLE) AS yn
               FROM s GROUP BY 1)
          SELECT event_type, n,
                 ROUND(list_reduce(arr,
                   (acc, x) -> 0.4 * x + (1.0 - 0.4) * acc), 6) AS ses_level,
                 ROUND((yn - y0) / (n - 1.0), 6) AS drift,
                 ROUND(list_reduce(arr,
                     (acc, x) -> 0.4 * x + (1.0 - 0.4) * acc)
                   + 0.5 * ((yn - y0) / (n - 1.0)), 6) AS theta_fc1
          FROM ser""",

    "q489_variance_decomposition" ->
      """WITH nat AS (SELECT n.n_regionkey AS region,
                 c.c_nationkey AS nation, count(*) AS nn,
                 sum(CAST(c_acctbal AS DECIMAL(12,2))) AS sn,
                 sum(CAST(c_acctbal AS DECIMAL(12,2))
                   * CAST(c_acctbal AS DECIMAL(12,2))) AS qn
               FROM customer c JOIN nation n
                 ON c.c_nationkey = n.n_nationkey
               GROUP BY 1, 2),
          reg AS (SELECT region, sum(nn) AS nr, sum(sn) AS sr
                  FROM nat GROUP BY 1),
          j AS (SELECT nat.region, nn,
                 CAST(CAST(qn AS DOUBLE)
                   - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)
                     / CAST(nn AS DOUBLE) AS DECIMAL(30,10)) AS w,
                 CAST(CAST(nn AS DOUBLE)
                   * (CAST(sn AS DOUBLE) / CAST(nn AS DOUBLE)
                      - CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE))
                   * (CAST(sn AS DOUBLE) / CAST(nn AS DOUBLE)
                      - CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE))
                   AS DECIMAL(30,10)) AS b
               FROM nat JOIN reg ON nat.region = reg.region)
          SELECT region, CAST(sum(nn) AS BIGINT) AS n,
                 ROUND(CAST(sum(w) AS DOUBLE), 4) AS ss_within,
                 ROUND(CAST(sum(b) AS DOUBLE), 4) AS ss_between
          FROM j GROUP BY 1""",

    "q490_hurst_rs" ->
      s"""WITH s AS ($dailySql),
          st AS (SELECT key, count(*) AS n, sum(y) AS sy,
                 sum(y * y) AS qy
               FROM s GROUP BY 1),
          z AS (SELECT s.key, st.n, st.sy, st.qy,
                 CAST(st.sy AS DOUBLE) / CAST(st.n AS DOUBLE) AS mu,
                 sum(CAST(s.y AS DOUBLE)
                     - CAST(st.sy AS DOUBLE) / CAST(st.n AS DOUBLE))
                   OVER (PARTITION BY s.key ORDER BY s.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS zt
               FROM s JOIN st ON s.key = st.key),
          r AS (SELECT key, n, sy, qy, max(zt) AS zmax, min(zt) AS zmin
                FROM z GROUP BY 1, 2, 3, 4)
          SELECT key AS event_type, n,
                 ROUND((zmax - zmin)
                   / sqrt((CAST(qy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                         / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)), 6)
                   AS rs,
                 ROUND(ln((zmax - zmin)
                     / sqrt((CAST(qy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                           / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))
                   / ln(CAST(n AS DOUBLE) / 2.0), 6) AS hurst
          FROM r""",

    "q491_spectral_entropy" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS y
               FROM events GROUP BY 1, 2),
          t AS (SELECT event_type,
                 date_diff('day', DATE '1970-01-01', day) AS t, y
               FROM daily),
          terms AS (SELECT event_type, p.period,
                 CAST(round(y * cos((CAST(t % p.period AS DOUBLE)
                     * (2.0 * pi())) / p.period) * 1e6) AS BIGINT) AS cq,
                 CAST(round(y * sin((CAST(t % p.period AS DOUBLE)
                     * (2.0 * pi())) / p.period) * 1e6) AS BIGINT) AS sq
               FROM t, (VALUES (3), (5), (7), (14), (30)) p(period)),
          agg AS (SELECT event_type, period,
                 CAST(count(*) AS BIGINT) AS nd,
                 CAST(sum(cq) AS BIGINT) AS cqs,
                 CAST(sum(sq) AS BIGINT) AS sqs
               FROM terms GROUP BY 1, 2),
          pw AS (SELECT event_type, period,
                 ROUND((CAST(cqs AS DOUBLE) / 1e6 * (CAST(cqs AS DOUBLE) / 1e6)
                      + CAST(sqs AS DOUBLE) / 1e6 * (CAST(sqs AS DOUBLE) / 1e6))
                   / CAST(nd AS DOUBLE), 6) AS power
               FROM agg),
          tot AS (SELECT event_type,
                 sum(CAST(power AS DECIMAL(20,6))) AS ptot,
                 count(*) AS k
               FROM pw GROUP BY 1),
          pr AS (SELECT pw.event_type, tot.k,
                 power / CAST(ptot AS DOUBLE) AS p
               FROM pw JOIN tot ON pw.event_type = tot.event_type),
          tm AS (SELECT event_type, k,
                 CASE WHEN p > 0 THEN
                   CAST(ROUND(-p * ln(p), 9) AS DECIMAL(12,9))
                 ELSE CAST(0.0 AS DECIMAL(12,9)) END AS term
               FROM pr)
          SELECT event_type,
                 ROUND(CAST(sum(term) AS DOUBLE)
                   / ln(CAST(k AS DOUBLE)), 6) AS spectral_entropy
          FROM tm GROUP BY event_type, k""",

    "q492_qq_points" ->
      """WITH o AS (SELECT c.c_mktsegment AS seg,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS v
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
               WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
          q AS (SELECT seg,
                 quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5,
                   0.6, 0.7, 0.8, 0.9]) AS qs
               FROM o GROUP BY 1),
          a AS (SELECT g AS i, qs[CAST(g + 1 AS INT)] AS qa
                FROM q, range(0, 9) t(g) WHERE seg = 'BUILDING'),
          b AS (SELECT g AS i, qs[CAST(g + 1 AS INT)] AS qb
                FROM q, range(0, 9) t(g) WHERE seg = 'MACHINERY')
          SELECT CAST(a.i + 1 AS DOUBLE) / 10.0 AS p,
                 ROUND(qa, 6) AS q_building,
                 ROUND(qb, 6) AS q_machinery,
                 ROUND(qb - qa, 6) AS qq_gap
          FROM a JOIN b ON a.i = b.i""",

    "q493_energy_distance" ->
      """WITH o AS (SELECT c.c_mktsegment AS seg,
                 CAST(floor(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                   AS DOUBLE) / 1000.0) AS BIGINT) AS v
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
               WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
          dom AS (SELECT v,
                 CAST(sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END)
                   AS BIGINT) AS na,
                 CAST(sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END)
                   AS BIGINT) AS nb
               FROM o GROUP BY 1),
          pre AS (SELECT v,
                 CAST(sum(na) OVER w AS BIGINT) AS ca,
                 CAST(sum(nb) OVER w AS BIGINT) AS cb,
                 lead(v, 1) OVER (ORDER BY v) AS nxt
               FROM dom WINDOW w AS (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          tot AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
                 CAST(sum(nb) AS BIGINT) AS tb FROM dom),
          gaps AS (SELECT (nxt - v) * (ca * (tb - cb) + cb * (ta - ca)) AS xy,
                 (nxt - v) * ca * (ta - ca) AS xx,
                 (nxt - v) * cb * (tb - cb) AS yy,
                 ta, tb
               FROM pre, tot WHERE nxt IS NOT NULL)
          SELECT ta AS n_a, tb AS n_b,
                 ROUND(2.0 * CAST(sum(xy) AS DOUBLE)
                     / CAST(ta * tb AS DOUBLE)
                   - 2.0 * CAST(sum(xx) AS DOUBLE)
                     / CAST(ta * ta AS DOUBLE)
                   - 2.0 * CAST(sum(yy) AS DOUBLE)
                     / CAST(tb * tb AS DOUBLE), 6) AS energy_distance
          FROM gaps GROUP BY 1, 2""",

    "q494_covariance_matrix" ->
      """WITH li AS (SELECT CAST(l_quantity AS DECIMAL(12,2)) AS x,
                 CAST(l_extendedprice AS DECIMAL(18,2)) AS y,
                 CAST(l_discount AS DECIMAL(8,2)) AS z
               FROM lineitem),
          g AS (SELECT count(*) AS n,
                 sum(x) AS sx, sum(y) AS sy, sum(z) AS sz,
                 sum(x * x) AS sxx, sum(y * y) AS syy, sum(z * z) AS szz,
                 sum(x * y) AS sxy, sum(x * z) AS sxz, sum(y * z) AS syz
               FROM li)
          SELECT n,
                 ROUND(((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                   * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0)) / 1.0, 6) AS var_qty,
                 ROUND(((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0)) / 1e6, 6) AS var_price_k2,
                 ROUND(((CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE)
                   * CAST(sz AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0)) / 1.0, 6) AS var_disc,
                 ROUND(((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0)) / 1e3, 6) AS cov_qty_price_k,
                 ROUND(((CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE)
                   * CAST(sz AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0)) / 1.0, 6) AS cov_qty_disc,
                 ROUND(((CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(sz AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0)) / 1e3, 6) AS cov_price_disc_k
          FROM g""",

    "q495_pca2_closed_form" ->
      """WITH li AS (SELECT CAST(l_quantity AS DECIMAL(12,2)) AS x,
                 CAST(l_extendedprice AS DECIMAL(18,2)) AS y
               FROM lineitem),
          g AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
               FROM li),
          w AS (SELECT n,
                 ROUND((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                   * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0), 6) AS a,
                 ROUND(((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0)) / 1e3, 6) AS b,
                 ROUND(((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0)) / 1e6, 6) AS c
               FROM g)
          SELECT n, a, b, c,
                 ROUND((a + c + sqrt((a - c) * (a - c) + 4.0 * b * b))
                   / 2.0, 6) AS lambda1,
                 ROUND((a + c - sqrt((a - c) * (a - c) + 4.0 * b * b))
                   / 2.0, 6) AS lambda2,
                 ROUND(((a + c + sqrt((a - c) * (a - c) + 4.0 * b * b)) / 2.0)
                   / (((a + c + sqrt((a - c) * (a - c) + 4.0 * b * b)) / 2.0)
                    + ((a + c - sqrt((a - c) * (a - c) + 4.0 * b * b)) / 2.0)),
                   6) AS explained_ratio,
                 ROUND(b / sqrt(b * b
                   + ((a + c + sqrt((a - c) * (a - c) + 4.0 * b * b)) / 2.0 - a)
                   * ((a + c + sqrt((a - c) * (a - c) + 4.0 * b * b)) / 2.0 - a)),
                   6) AS loading_x,
                 ROUND(((a + c + sqrt((a - c) * (a - c) + 4.0 * b * b)) / 2.0 - a)
                   / sqrt(b * b
                   + ((a + c + sqrt((a - c) * (a - c) + 4.0 * b * b)) / 2.0 - a)
                   * ((a + c + sqrt((a - c) * (a - c) + 4.0 * b * b)) / 2.0 - a)),
                   6) AS loading_y
          FROM w""",

    "q496_kde_points" -> {
      val sqrt2pi = math.sqrt(2.0 * math.Pi)
      s"""WITH xs AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2))
                   AS DOUBLE) / 100000.0 AS x
               FROM orders),
          pts AS (SELECT x, CAST(e AS DOUBLE) AS e
                  FROM xs, (VALUES (0.5), (1.5), (2.5), (3.5), (4.5)) p(e)),
          tm AS (SELECT e,
                 CAST(ROUND(exp(-(x - e) * (x - e) / (2.0 * 0.25)), 9)
                   AS DECIMAL(12,9)) AS t
               FROM pts)
          SELECT e, count(*) AS n,
                 ROUND(CAST(sum(t) AS DOUBLE)
                   / (CAST(count(*) AS DOUBLE) * 0.5 * $sqrt2pi), 6)
                   AS density
          FROM tm GROUP BY 1"""
    },

    "q497_weibull_fit" ->
      """WITH life AS (SELECT o_custkey,
                 CAST(date_diff('day', CAST(min(o_orderdate) AS DATE),
                   CAST(max(o_orderdate) AS DATE)) AS BIGINT) AS t
               FROM orders GROUP BY 1),
          lf AS (SELECT * FROM life WHERE t > 0),
          nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM lf),
          dom AS (SELECT t, count(*) AS cnt FROM lf GROUP BY 1),
          surv AS (SELECT t,
                 (n - CAST(sum(cnt) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE)) / n AS s
               FROM dom, nn),
          pt AS (SELECT ROUND(ln(CAST(t AS DOUBLE)), 6) AS lx,
                 ROUND(ln(-ln(s)), 6) AS ly
               FROM surv WHERE s > 0 AND s < 1),
          g AS (SELECT count(*) AS m,
                 sum(CAST(lx AS DECIMAL(20,6))) AS sx,
                 sum(CAST(ly AS DECIMAL(20,6))) AS sy,
                 sum(CAST(lx * lx AS DECIMAL(28,12))) AS sxx,
                 sum(CAST(lx * ly AS DECIMAL(28,12))) AS sxy
               FROM pt),
          k AS (SELECT m, sx, sy,
                 ROUND((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                   AS shape_k
               FROM g)
          SELECT m, shape_k,
                 ROUND(exp(-((CAST(sy AS DOUBLE)
                     - shape_k * CAST(sx AS DOUBLE))
                   / CAST(m AS DOUBLE)) / shape_k), 6) AS scale_lambda
          FROM k""",

    "q498_adf_unit_root" ->
      s"""WITH s AS ($dailySql),
          l AS (SELECT key, y - lag(y, 1) OVER w AS dy,
                 lag(y, 1) OVER w AS yl
               FROM s WINDOW w AS (PARTITION BY key ORDER BY day)),
          f AS (SELECT key, dy, yl FROM l WHERE yl IS NOT NULL),
          g AS (SELECT key, count(*) AS n, sum(yl) AS sx, sum(dy) AS sy,
                 sum(yl * yl) AS sxx, sum(yl * dy) AS sxy,
                 sum(dy * dy) AS syy
               FROM f GROUP BY 1)
          SELECT key AS event_type, n,
                 ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                     * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                     * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS beta,
                 ROUND(((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                     * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                     * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                   / sqrt(((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                       * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                     - ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                         * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                       / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                         * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                       * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                           * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                         / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                           * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                       * (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                         * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                     / (CAST(n AS DOUBLE) - 2.0))
                     / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                       * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))), 6)
                   AS t_stat
          FROM g""",

    "q499_price_indices" ->
      """WITH y96 AS (SELECT l_partkey,
                 ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                     AS DOUBLE)
                   / CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
                     AS DOUBLE), 6) AS v1996,
                 CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   AS q1996
               FROM lineitem WHERE year(l_shipdate) = 1996
               GROUP BY 1),
          y99 AS (SELECT l_partkey,
                 ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                     AS DOUBLE)
                   / CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
                     AS DOUBLE), 6) AS v1999,
                 CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   AS q1999
               FROM lineitem WHERE year(l_shipdate) = 1999
               GROUP BY 1),
          j AS (SELECT CAST(v1999 * q1996 AS DECIMAL(28,10)) AS l_num,
                 CAST(v1996 * q1996 AS DECIMAL(28,10)) AS l_den,
                 CAST(v1999 * q1999 AS DECIMAL(28,10)) AS p_num,
                 CAST(v1996 * q1999 AS DECIMAL(28,10)) AS p_den
               FROM y96 JOIN y99 ON y96.l_partkey = y99.l_partkey),
          g AS (SELECT count(*) AS n_parts, sum(l_num) AS ln_,
                 sum(l_den) AS ld, sum(p_num) AS pn, sum(p_den) AS pd
               FROM j)
          SELECT n_parts,
                 ROUND(CAST(ln_ AS DOUBLE) / CAST(ld AS DOUBLE), 6)
                   AS laspeyres,
                 ROUND(CAST(pn AS DOUBLE) / CAST(pd AS DOUBLE), 6)
                   AS paasche,
                 ROUND(sqrt((CAST(ln_ AS DOUBLE) / CAST(ld AS DOUBLE))
                   * (CAST(pn AS DOUBLE) / CAST(pd AS DOUBLE))), 6)
                   AS fisher
          FROM g""",

    "q500_bucketed_join" ->
      """WITH pc AS (SELECT o_custkey, count(*) AS n_orders,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
               FROM orders GROUP BY 1)
          SELECT c.c_mktsegment AS seg, count(*) AS n_cust,
                 CAST(sum(n_orders) AS BIGINT) AS n_orders,
                 CAST(sum(rev) AS DOUBLE) AS revenue
          FROM pc JOIN customer c ON pc.o_custkey = c.c_custkey
          GROUP BY 1""",

    "q501_atkinson_index" ->
      """WITH x AS (SELECT c_nationkey AS nation,
                 CAST(c_acctbal AS DECIMAL(12,2)) AS v
               FROM customer WHERE c_acctbal > 0),
          g AS (SELECT nation, count(*) AS n, sum(v) AS sv,
                 sum(CAST(ROUND(ln(CAST(v AS DOUBLE)), 9)
                   AS DECIMAL(16,9))) AS sl
               FROM x GROUP BY 1)
          SELECT nation, n,
                 ROUND(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE), 6)
                   AS mean_bal,
                 ROUND(exp(CAST(sl AS DOUBLE) / CAST(n AS DOUBLE)), 6)
                   AS geo_mean,
                 ROUND(1.0 - exp(CAST(sl AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)), 6)
                   AS atkinson
          FROM g""",

    "q502_median_polish" ->
      """WITH cell AS (SELECT event_type AS k,
                 (CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS dow,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS y
               FROM events GROUP BY 1, 2),
          rm1 AS (SELECT k, median(y) AS rmed FROM cell GROUP BY 1),
          r1 AS (SELECT c.k, c.dow, ROUND(c.y - rm1.rmed, 6) AS y
                 FROM cell c JOIN rm1 ON c.k = rm1.k),
          cm1 AS (SELECT dow, median(y) AS cmed FROM r1 GROUP BY 1),
          c1 AS (SELECT r1.k, r1.dow, ROUND(r1.y - cm1.cmed, 6) AS y
                 FROM r1 JOIN cm1 ON r1.dow = cm1.dow),
          rm2 AS (SELECT k, median(y) AS rmed FROM c1 GROUP BY 1),
          r2 AS (SELECT c1.k, c1.dow, ROUND(c1.y - rm2.rmed, 6) AS y
                 FROM c1 JOIN rm2 ON c1.k = rm2.k),
          cm2 AS (SELECT dow, median(y) AS cmed FROM r2 GROUP BY 1),
          c2 AS (SELECT r2.k, r2.dow, ROUND(r2.y - cm2.cmed, 6) AS y
                 FROM r2 JOIN cm2 ON r2.dow = cm2.dow)
          SELECT k AS event_type, dow, y AS residual FROM c2""",

    "q503_cross_correlation" ->
      s"""WITH s AS ($dailySql),
          a AS (SELECT day, y AS x FROM s WHERE key = 'click'),
          b AS (SELECT day, y FROM s WHERE key = 'purchase'),
          lg AS (SELECT l.lag, a.x, b.y
                 FROM (VALUES (-3), (-2), (-1), (0), (1), (2), (3)) l(lag)
                 CROSS JOIN a
                 JOIN b ON b.day + l.lag = a.day),
          g AS (SELECT lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
               FROM lg GROUP BY 1)
          SELECT lag, n,
                 ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
                   AS ccf
          FROM g""",

    "q504_hill_numbers" ->
      """WITH tok AS (SELECT source, t
               FROM (SELECT source, unnest(regexp_split_to_array(
                       lower(trim(text)), '\s+')) AS t
                     FROM documents) u
               WHERE length(t) > 0),
          tc AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2),
          nt AS (SELECT source, CAST(sum(c) AS BIGINT) AS nn,
                 count(*) AS richness,
                 CAST(sum(c * c) AS BIGINT) AS sc2
               FROM tc GROUP BY 1),
          sh AS (SELECT tc.source,
                 sum(CAST(ROUND(-(CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))
                     * ln(CAST(c AS DOUBLE) / CAST(nn AS DOUBLE)), 9)
                   AS DECIMAL(14,9))) AS h
               FROM tc JOIN nt ON tc.source = nt.source
               GROUP BY 1)
          SELECT nt.source, nn AS n_tokens, richness,
                 ROUND(exp(CAST(h AS DOUBLE)), 6) AS hill1,
                 ROUND(CAST(nn * nn AS DOUBLE) / CAST(sc2 AS DOUBLE), 6)
                   AS hill2
          FROM nt JOIN sh ON nt.source = sh.source""",

    "q505_heaps_law" ->
      """WITH tok AS (SELECT source, t
               FROM (SELECT source, unnest(regexp_split_to_array(
                       lower(trim(text)), '\s+')) AS t
                     FROM documents) u
               WHERE length(t) > 0),
          sv AS (SELECT ROUND(ln(CAST(count(*) AS DOUBLE)), 9) AS lx,
                 ROUND(ln(CAST(count(DISTINCT t) AS DOUBLE)), 9) AS ly
               FROM tok GROUP BY source),
          g AS (SELECT count(*) AS m,
                 sum(CAST(lx AS DECIMAL(16,9))) AS sx,
                 sum(CAST(ly AS DECIMAL(16,9))) AS sy,
                 sum(CAST(lx * lx AS DECIMAL(24,12))) AS sxx,
                 sum(CAST(lx * ly AS DECIMAL(24,12))) AS sxy
               FROM sv),
          b AS (SELECT m, sx, sy,
                 ROUND((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                   AS beta
               FROM g)
          SELECT m AS n_sources, beta,
                 ROUND(exp((CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE))
                   / CAST(m AS DOUBLE)), 6) AS k_const
          FROM b""",

    "q506_burrows_delta" ->
      """WITH tok AS (SELECT source, t
               FROM (SELECT source, unnest(regexp_split_to_array(
                       lower(trim(text)), '\s+')) AS t
                     FROM documents) u
               WHERE length(t) > 0),
          top AS (SELECT t FROM (SELECT t, count(*) AS c FROM tok
                   GROUP BY 1) g
                  ORDER BY c DESC, t LIMIT 10),
          nsrc AS (SELECT source, count(*) AS nn FROM tok GROUP BY 1),
          f AS (SELECT tc.source, tc.t,
                 CAST(ROUND(CAST(tc.c AS DOUBLE) / CAST(nsrc.nn AS DOUBLE),
                   9) AS DECIMAL(14,9)) AS f
               FROM (SELECT tok.source, tok.t, count(*) AS c
                     FROM tok JOIN top ON tok.t = top.t
                     GROUP BY 1, 2) tc
               JOIN nsrc ON tc.source = nsrc.source),
          st AS (SELECT t, count(*) AS m, sum(f) AS sf,
                 sum(CAST(CAST(f AS DOUBLE) * CAST(f AS DOUBLE)
                   AS DECIMAL(24,15))) AS sff
               FROM f GROUP BY 1),
          z AS (SELECT f.t, f.source,
                 ROUND((CAST(f.f AS DOUBLE)
                     - CAST(st.sf AS DOUBLE) / CAST(st.m AS DOUBLE))
                   / sqrt((CAST(st.sff AS DOUBLE)
                       - CAST(st.sf AS DOUBLE) * CAST(st.sf AS DOUBLE)
                         / CAST(st.m AS DOUBLE))
                     / (CAST(st.m AS DOUBLE) - 1.0)), 6) AS z
               FROM f JOIN st ON f.t = st.t),
          pr AS (SELECT za.source AS src_a, zb.source AS src_b,
                 CAST(ROUND(abs(za.z - zb.z), 9) AS DECIMAL(14,9)) AS dz
               FROM z za JOIN z zb
                 ON za.t = zb.t AND za.source < zb.source)
          SELECT src_a, src_b, count(*) AS n_words,
                 ROUND(CAST(sum(dz) AS DOUBLE) / 10.0, 6) AS delta
          FROM pr GROUP BY 1, 2""",

    "q507_twfe_regression" ->
      """WITH li AS (SELECT l_suppkey AS ent,
                 CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)
                   AS tm,
                 CAST(l_quantity AS DECIMAL(12,2)) AS x,
                 CAST(l_extendedprice AS DECIMAL(18,2)) AS y
               FROM lineitem),
          ga AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy FROM li),
          ge AS (SELECT ent, count(*) AS ne, sum(x) AS sxe, sum(y) AS sye
                 FROM li GROUP BY 1),
          gt AS (SELECT tm, count(*) AS nt, sum(x) AS sxt, sum(y) AS syt
                 FROM li GROUP BY 1),
          dm AS (SELECT
                 ROUND(CAST(li.x AS DOUBLE)
                   - CAST(sxe AS DOUBLE) / CAST(ne AS DOUBLE)
                   - CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE)
                   + CAST(ga.sx AS DOUBLE) / CAST(ga.n AS DOUBLE), 6) AS xd,
                 ROUND(CAST(li.y AS DOUBLE)
                   - CAST(sye AS DOUBLE) / CAST(ne AS DOUBLE)
                   - CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE)
                   + CAST(ga.sy AS DOUBLE) / CAST(ga.n AS DOUBLE), 6) AS yd,
                 li.x, li.y
               FROM li
               JOIN ge ON li.ent = ge.ent
               JOIN gt ON li.tm = gt.tm
               CROSS JOIN ga),
          t AS (SELECT count(*) AS n,
                 sum(CAST(xd * yd AS DECIMAL(34,10))) AS sxy,
                 sum(CAST(xd * xd AS DECIMAL(34,10))) AS sxx,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx_raw, sum(x * y) AS sxy_raw
               FROM dm)
          SELECT n,
                 ROUND((CAST(n AS DOUBLE) * CAST(sxy_raw AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx_raw AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                   AS beta_ols,
                 ROUND(CAST(sxy AS DOUBLE) / CAST(sxx AS DOUBLE), 6)
                   AS beta_twfe
          FROM t""",

    "q508_binary_segmentation" -> {
      def level(lv: Int): String =
        s"""st$lv AS (SELECT key, seg, count(*) AS n, sum(y) AS sy
               FROM cur${lv - 1} GROUP BY 1, 2),
            cz$lv AS (SELECT c.key, c.seg, c.day, c.y, s.n,
                 sum(CAST(c.y AS DOUBLE)
                     - CAST(s.sy AS DOUBLE) / CAST(s.n AS DOUBLE))
                   OVER (PARTITION BY c.key, c.seg ORDER BY c.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cz
               FROM cur${lv - 1} c JOIN st$lv s
                 ON c.key = s.key AND c.seg = s.seg),
            rk$lv AS (SELECT *, row_number() OVER (PARTITION BY key, seg
                   ORDER BY abs(cz) DESC, day) AS rn
                 FROM cz$lv),
            bp$lv AS (SELECT key, $lv AS level, seg,
                 CAST(day AS VARCHAR) AS bp_day,
                 ROUND(abs(cz), 6) AS cusum_stat
               FROM rk$lv WHERE rn = 1 AND n >= 4),
            cur$lv AS (SELECT r.key, r.day, r.y,
                 r.seg || (CASE WHEN r.day <= CAST(b.bp_day AS DATE)
                   THEN 'L' ELSE 'R' END) AS seg
               FROM rk$lv r JOIN bp$lv b
                 ON r.key = b.key AND r.seg = b.seg)"""
      s"""WITH s AS ($dailySql),
          cur0 AS (SELECT key, day, y, '0' AS seg FROM s),
          ${level(1)},
          ${level(2)}
          SELECT key AS event_type, level, seg, bp_day, cusum_stat
          FROM bp1
          UNION ALL
          SELECT key, level, seg, bp_day, cusum_stat FROM bp2"""
    },

    "q509_fleiss_kappa" ->
      s"""WITH rated AS (SELECT doc_id,
                 CASE WHEN ${H60("'rater:' || r || ':' || CAST(doc_id AS VARCHAR)")}
                     % 20 < 15 THEN lang
                 ELSE CASE ${H60("'rater:' || r || ':' || CAST(doc_id AS VARCHAR)")}
                     % 20 % 5
                   WHEN 0 THEN 'de' WHEN 1 THEN 'en' WHEN 2 THEN 'es'
                   WHEN 3 THEN 'fr' ELSE 'zh' END
                 END AS cat
               FROM documents, (VALUES (1), (2), (3)) rr(r)),
          nic AS (SELECT doc_id, cat, count(*) AS c
                  FROM rated GROUP BY 1, 2),
          items AS (SELECT doc_id,
                 CAST(sum(c * c) AS BIGINT) - 3 AS num
               FROM nic GROUP BY 1),
          pi AS (SELECT count(*) AS n_items,
                 CAST(sum(num) AS BIGINT) AS snum FROM items),
          pc AS (SELECT CAST(sum(cc * cc) AS BIGINT) AS sc2,
                 CAST(sum(cc) AS BIGINT) AS tot
               FROM (SELECT cat, count(*) AS cc FROM rated GROUP BY 1) c)
          SELECT n_items,
                 ROUND(CAST(snum AS DOUBLE)
                   / (CAST(n_items AS DOUBLE) * 6.0), 6) AS p_bar,
                 ROUND(CAST(sc2 AS DOUBLE)
                   / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS p_e,
                 ROUND((CAST(snum AS DOUBLE)
                     / (CAST(n_items AS DOUBLE) * 6.0)
                   - CAST(sc2 AS DOUBLE)
                     / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)))
                   / (1.0 - CAST(sc2 AS DOUBLE)
                     / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))), 6)
                   AS fleiss_kappa
          FROM pi, pc""",

    "q514_krippendorff_alpha" ->
      s"""WITH rated AS (SELECT doc_id,
                 CASE WHEN ${H60("'rater:' || r || ':' || CAST(doc_id AS VARCHAR)")}
                     % 20 < 15 THEN lang
                 ELSE CASE ${H60("'rater:' || r || ':' || CAST(doc_id AS VARCHAR)")}
                     % 20 % 5
                   WHEN 0 THEN 'de' WHEN 1 THEN 'en' WHEN 2 THEN 'es'
                   WHEN 3 THEN 'fr' ELSE 'zh' END
                 END AS cat
               FROM documents, (VALUES (1), (2), (3)) rr(r)
               WHERE r < 3 OR doc_id % 2 = 0),
          nuc AS (SELECT doc_id, cat, count(*) AS c
                  FROM rated GROUP BY 1, 2),
          mu AS (SELECT doc_id, count(*) AS m FROM rated GROUP BY 1),
          pairable AS (SELECT n.doc_id, n.cat, n.c, m.m
                       FROM nuc n JOIN mu m USING (doc_id)
                       WHERE m.m >= 2),
          occ AS (SELECT cat, c,
                    CAST(CAST(c * (c - 1) AS DOUBLE)
                      / CAST(m - 1 AS DOUBLE) AS DECIMAL(18,6)) AS t
                  FROM pairable),
          diag AS (SELECT sum(t) AS sa, CAST(sum(c) AS BIGINT) AS n
                   FROM occ),
          marg AS (SELECT CAST(sum(nc * (nc - 1)) AS BIGINT) AS sc
                   FROM (SELECT cat, CAST(sum(c) AS BIGINT) AS nc
                         FROM occ GROUP BY 1) x)
          SELECT n AS n_pairable,
            ROUND(CAST(sa AS DOUBLE) / CAST(n AS DOUBLE), 6) AS a_obs,
            ROUND(CAST(sc AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)), 6) AS a_exp,
            ROUND((CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)
                - CAST(sc AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
              / (1.0 - CAST(sc AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))), 6)
              AS kripp_alpha
          FROM diag, marg""",

    "q510_icc" ->
      """WITH g AS (SELECT c_nationkey, count(*) AS ng,
                 sum(CAST(c_acctbal AS DECIMAL(12,2))) AS sg,
                 sum(CAST(c_acctbal AS DECIMAL(12,2))
                   * CAST(c_acctbal AS DECIMAL(12,2))) AS qg
               FROM customer GROUP BY 1),
          w AS (SELECT count(*) AS k, CAST(sum(ng) AS BIGINT) AS nn,
                 sum(sg) AS st, sum(qg) AS qt,
                 sum(CAST(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                   / CAST(ng AS DOUBLE) AS DECIMAL(32,10))) AS sb,
                 sum(CAST(ng AS HUGEINT) * ng) AS n2
               FROM g)
          SELECT k, nn AS n,
                 ROUND((CAST(sb AS DOUBLE)
                     - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                       / CAST(nn AS DOUBLE))
                   / (CAST(k AS DOUBLE) - 1.0), 6) AS msb,
                 ROUND((CAST(qt AS DOUBLE) - CAST(sb AS DOUBLE))
                   / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)), 6) AS msw,
                 ROUND(((CAST(sb AS DOUBLE)
                     - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                       / CAST(nn AS DOUBLE))
                   / (CAST(k AS DOUBLE) - 1.0)
                   - (CAST(qt AS DOUBLE) - CAST(sb AS DOUBLE))
                     / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))
                   / ((CAST(sb AS DOUBLE)
                     - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                       / CAST(nn AS DOUBLE))
                   / (CAST(k AS DOUBLE) - 1.0)
                   + ((CAST(nn AS DOUBLE)
                       - CAST(n2 AS DOUBLE) / CAST(nn AS DOUBLE))
                      / (CAST(k AS DOUBLE) - 1.0) - 1.0)
                     * ((CAST(qt AS DOUBLE) - CAST(sb AS DOUBLE))
                       / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))), 6)
                   AS icc1
          FROM w"""
  )
}
