package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Clustering, DataQuality, Dedup, Geo, Graph, Robust, TimeSeries}
import graft.functions.TextAnalysis.hash60

/** Oracle-gated statistical-testing, trend, and spatial/string linkage
  * queries: per-series OLS trend, chi-square independence, Welch's
  * t-test, autocorrelation, CUSUM changepoint scan, radius-bounded geo
  * self-join, and Jaro-Winkler record linkage. Every closed form runs
  * on doubles derived from exact integer/decimal sums so DuckDB replays
  * the bits; geo trig rounds to 6 decimals to absorb libm 1-ulp skew.
  */
object StatsQueries {

  type Q = (SparkSession, String) => DataFrame

  private def money(c: Column): Column = c.cast("decimal(18,2)")

  // y as DECIMAL(25,6): same values as Spark's (18,6) cast, but wide
  // enough that DuckDB promotes y*y to an int128-backed DECIMAL(38,12)
  // instead of overflowing the int64 DECIMAL(18) multiply path
  // SPRT constants (H0 p=0.2 vs H1 p=0.3, alpha=beta=0.05): the two
  // per-observation log-likelihood increments and the decision
  // boundary, Scala-computed once and interpolated verbatim into the
  // oracle so both engines walk identical doubles
  private val SprtLc1: Double = math.log(0.3 / 0.2) // on conversion
  private val SprtLc0: Double = math.log(0.7 / 0.8) // on non-conversion
  private val SprtBound: Double = math.log(19.0) // ln((1-beta)/alpha)

  // RBO persistence weights (1-p) * p^(d-1) for p = 0.9, d = 1..10,
  // Scala-computed so the oracle's VALUES list is bit-identical
  private val RboP = 0.9
  private val RboW: Seq[Double] =
    (1 to 10).map(dd => (1.0 - RboP) * math.pow(RboP, dd - 1))

  // Gumbel method-of-moments constants, computed ONCE in Scala and
  // interpolated verbatim into both the Column plan and the oracle SQL
  // (libm sqrt/log/pi would otherwise be 1-ulp engine-variant)
  private val Sqrt6OverPi: Double = math.sqrt(6.0) / math.Pi
  private val EulerGamma: Double = 0.5772156649015329
  private val GumbelK12: Double = math.log(-math.log(1.0 - 1.0 / 12.0))

  /** One stump fit of the q426 depth-2 tree oracle: the q418 pipeline
    * over `base0` restricted by `pred`, picked by (score DESC, v). */
  private def giniPickSql(label: String, pred: String): String =
    s"""counts_$label AS (SELECT v, count(*) AS cnt,
               CAST(sum(pos) AS BIGINT) AS pos
             FROM base0 $pred GROUP BY 1),
        cum_$label AS (SELECT v, sum(cnt) OVER w AS nl,
               sum(pos) OVER w AS pl
             FROM counts_$label
             WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)),
        tot_$label AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
               CAST(sum(pos) AS BIGINT) AS p FROM counts_$label),
        cand_$label AS (SELECT v, CAST(nl AS BIGINT) AS nl,
               CAST(pl AS BIGINT) AS pl, CAST(n - nl AS BIGINT) AS nr,
               CAST(p - pl AS BIGINT) AS pr, n
             FROM cum_$label, tot_$label WHERE nl < n),
        sc_$label AS (SELECT *,
               CAST(CAST(pl AS HUGEINT) * pl +
                 CAST(nl - pl AS HUGEINT) * (nl - pl) AS DOUBLE) /
                 CAST(nl AS DOUBLE) +
               CAST(CAST(pr AS HUGEINT) * pr +
                 CAST(nr - pr AS HUGEINT) * (nr - pr) AS DOUBLE) /
                 CAST(nr AS DOUBLE) AS score
             FROM cand_$label),
        pick_$label AS (SELECT '$label' AS node,
               ROUND(CAST(v AS DOUBLE), 6) AS threshold, nl AS n_left,
               pl AS pos_left, nr AS n_right, pr AS pos_right,
               ROUND(1.0 - score / CAST(n AS DOUBLE), 6) AS weighted_gini
             FROM sc_$label ORDER BY score DESC, v LIMIT 1)"""

  /** One unrolled Newton step of the q422 logistic fit: score rows
    * with the previous params, fold gradient + Hessian sufficient
    * stats in integer 1e-9 units, solve the 2x2 system — mirroring
    * DataQuality.logisticNewton op-for-op. */
  private def newtonIter(i: Int): String = {
    val prev = if (i == 1) "it0" else s"it${i - 1}"
    s"""r$i AS (SELECT x, y, b0, b1,
               CAST(CAST(1.0 / (1.0 + exp(-(b0 + b1 * x)))
                 AS DECIMAL(18,12)) AS DOUBLE) AS p
             FROM rows_, $prev),
       s$i AS (SELECT max(b0) AS b0, max(b1) AS b1,
               CAST(sum(CAST(round((y - p) * 1e9) AS BIGINT)) AS DOUBLE)
                 / 1e9 AS g0,
               CAST(sum(CAST(round((x * (y - p)) * 1e9) AS BIGINT))
                 AS DOUBLE) / 1e9 AS g1,
               CAST(sum(CAST(round((p * (1.0 - p)) * 1e9) AS BIGINT))
                 AS DOUBLE) / 1e9 AS h00,
               CAST(sum(CAST(round((p * (1.0 - p) * x) * 1e9) AS BIGINT))
                 AS DOUBLE) / 1e9 AS h01,
               CAST(sum(CAST(round((p * (1.0 - p) * x * x) * 1e9)
                 AS BIGINT)) AS DOUBLE) / 1e9 AS h11
             FROM r$i),
       it$i AS (SELECT b0 + (h11 * g0 - h01 * g1) /
                  (h00 * h11 - h01 * h01) AS b0,
                b1 + (h00 * g1 - h01 * g0) /
                  (h00 * h11 - h01 * h01) AS b1
             FROM s$i)"""
  }

  private val H60 =
    (x: String) => s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"

  /** One unrolled Huber IRLS round for the q452 oracle: weight the
    * residuals of c${i-1}'s coefficients, fold 1e-6-quantized weighted
    * sums in exact longs, solve the 2x2 weighted normal equations. */
  private def huberRound(i: Int): String = {
    val prev = s"c${i - 1}"
    s"""t$i AS (SELECT r.key, CAST(r.xl AS DOUBLE) AS xd,
                  CAST(r.yl AS DOUBLE) AS yd,
                  least(CAST(1.0 AS DOUBLE), CAST(100000.0 AS DOUBLE) /
                    abs(CAST(r.yl AS DOUBLE) - c.a -
                      c.b * CAST(r.xl AS DOUBLE))) AS w
                FROM rws r JOIN $prev c USING (key)),
       s$i AS (SELECT key, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(round(w * 1e6) AS BIGINT)) AS BIGINT)
                   AS sw,
                 CAST(sum(CAST(round(w * xd * 1e6) AS BIGINT)) AS BIGINT)
                   AS swx,
                 CAST(sum(CAST(round(w * xd * xd * 1e6) AS BIGINT))
                   AS BIGINT) AS swxx,
                 CAST(sum(CAST(round(w * yd * 1e6) AS BIGINT)) AS BIGINT)
                   AS swy,
                 CAST(sum(CAST(round(w * xd * yd * 1e6) AS BIGINT))
                   AS BIGINT) AS swxy,
                 CAST(sum(CASE WHEN w < 1.0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS nd
               FROM t$i GROUP BY 1),
       f$i AS (SELECT key, n, nd, CAST(sw AS DOUBLE) / 1e6 AS fw,
                 CAST(swx AS DOUBLE) / 1e6 AS fwx,
                 CAST(swxx AS DOUBLE) / 1e6 AS fwxx,
                 CAST(swy AS DOUBLE) / 1e6 AS fwy,
                 CAST(swxy AS DOUBLE) / 1e6 AS fwxy
               FROM s$i),
       c$i AS (SELECT key, n, nd,
                 ROUND((fwy - ((fw * fwxy - fwx * fwy) /
                   (fw * fwxx - fwx * fwx)) * fwx) / fw, 6) AS a,
                 ROUND((fw * fwxy - fwx * fwy) /
                   (fw * fwxx - fwx * fwx), 6) AS b
               FROM f$i)"""
  }

  private val dailySql =
    """SELECT event_type AS key, CAST(ts AS DATE) AS day,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(25,6)) AS y
       FROM events GROUP BY 1, 2"""

  /** Daily spend per event type: the shared per-series input frame. */
  private def dailySpend(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(money(col("value"))).as("spend"))

  /** Deterministic synthetic point per customer (md5-derived, mirrored
    * in the oracle): lat in [40,45), lon in [0,5). */
  private def customerPoints(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey"),
      (pmod(hash60(concat_ws(":", lit("glat"), col("c_custkey"))), lit(1000000L))
        .cast("double") / lit(1000000.0) * lit(5.0) + lit(40.0)).as("lat"),
      (pmod(hash60(concat_ws(":", lit("glon"), col("c_custkey"))), lit(1000000L))
        .cast("double") / lit(1000000.0) * lit(5.0)).as("lon"))

  /** Memoized Borůvka MSF over the radius-blocked customer point graph —
    * q457 returns it and q458 cuts it (MST-dendrogram equivalence), so
    * a same-JVM run (Verify runs every query in one session; the bench
    * deliberately isolates heavies in separate child JVMs, where each
    * pays its own honest cost) computes the ~10s forest once.
    *
    * VALIDITY PROBE, not computeIfAbsent: boruvkaMst localCheckpoints
    * each round, and a localCheckpointed frame CANNOT be recomputed
    * once its blocks are unpersisted (the bench's between-query
    * deepClean does exactly that — the r8 first run failed both
    * queries this way). take(1) on the memo is one cheap cached read
    * when alive and a fast failure when the blocks are gone, in which
    * case the forest is rebuilt fresh. */
  private val mstMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private def boruvkaMstFor(s: SparkSession, d: String): DataFrame = {
    // prune entries for STOPPED sessions on every access — a long-lived
    // multi-session JVM (the spec suites create and stop sessions) must
    // not pin dead session graphs for its lifetime
    mstMemo.keySet.removeIf(k => k._1.sparkContext.isStopped)
    val key = (s, d)
    val cached = mstMemo.get(key)
    val alive = cached != null &&
      (try { cached.take(1); true } catch { case _: Throwable => false })
    if (alive) cached
    else {
      val pts = customerPoints(s, d).where(col("c_custkey") % 7 === 0)
        .select(col("c_custkey").as("pid"), col("lat"), col("lon"))
      val pairs = Clustering.radiusPairs(pts, col("pid"), col("lat"),
        col("lon"), radius = 0.7)
      val mst = Graph.boruvkaMst(pairs, col("u"), col("v"),
          round(col("d2") * 1e12).cast("long"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      mstMemo.put(key, mst)
      mst
    }
  }

  /** Drop (and unpersist) the memoized forest for (s, d). q457 — the
    * OWNER of the build — calls this at the top of its closure so every
    * timed execution of q457 pays the full forest cost; q458 keeps
    * reading the live memo, which is the production amortization shape
    * (build once, cut many). Without this, the bench's best-of-2 min
    * over a cross-run memo reported a 0.05s cache probe as q457's
    * cost and the ~10s build appeared in nobody's number. */
  private def invalidateMstMemo(s: SparkSession, d: String): Unit = {
    val old = mstMemo.remove((s, d))
    if (old != null)
      try old.unpersist(blocking = false) catch { case _: Throwable => () }
  }

  private val queries1: Map[String, Q] = Map(
    // per-series OLS trend of daily spend against epoch day
    "q196_trend_ols" -> ((s, d) => {
      val daily = dailySpend(s, d)
        .select(col("event_type"),
          datediff(col("day"), lit("1970-01-01")).as("x"), col("spend"))
      TimeSeries.trendPerSeries(daily, col("event_type"), col("x"), col("spend"))
    }),

    // expanding-window backtest folds over daily spend: 3 folds x 5-day
    // test horizons per event type
    "q274_backtest_folds" -> ((s, d) => {
      TimeSeries.backtestFolds(dailySpend(s, d), col("event_type"),
          col("day"), col("spend"), nFolds = 3, horizonDays = 5)
        .withColumnRenamed("k", "event_type")
        .withColumn("train_end", col("train_end").cast("string"))
    }),

    // two-regressor per-series OLS: daily spend on (day index, weekend
    // flag) — trend plus weekly level shift in one closed-form fit
    "q266_trend2_ols" -> ((s, d) => {
      val daily = dailySpend(s, d)
        .select(col("event_type"),
          datediff(col("day"), lit("1970-01-01")).as("x1"),
          when(dayofweek(col("day")).isin(1, 7), 1.0).otherwise(0.0).as("x2"),
          col("spend"))
      TimeSeries.trend2PerSeries(daily, col("event_type"),
        col("x1"), col("x2"), col("spend"))
    }),

    // chi-square independence: event type x day-of-week
    "q197_chi_square" -> ((s, d) => {
      DataQuality.chiSquare(Tables.events(s, d),
        col("event_type"), dayofweek(to_date(col("ts"))))
    }),

    // Welch's t-test: purchase vs click event values
    "q198_welch_ttest" -> ((s, d) => {
      DataQuality.welchTTest(Tables.events(s, d), col("event_type"),
        col("value"), "purchase", "click")
    }),

    // one-way ANOVA across ALL market segments on account balance
    "q292_anova" -> ((s, d) => {
      DataQuality.anovaOneWay(Tables.customer(s, d), col("c_mktsegment"),
        col("c_acctbal"))
    }),

    // Brown-Forsythe variance-homogeneity test (Levene, median center)
    // across event types on value — validates q292's pooled-variance
    // assumption
    "q300_brown_forsythe" -> ((s, d) => {
      DataQuality.brownForsythe(Tables.events(s, d), col("event_type"),
        col("value"))
    }),

    // Kruskal-Wallis H across ALL order priorities on order value — the
    // k-sample rank test (q203's machinery generalized): average ranks
    // from the two-level prefix sum, never a global sort
    "q399_kruskal_wallis" -> ((s, d) => {
      DataQuality.kruskalWallis(Tables.orders(s, d), col("o_orderpriority"),
        col("o_totalprice"))
    }),

    // McNemar paired-predicate agreement on documents: does the
    // char-length quality rule fire on the same docs as the
    // whitespace-token rule? 2x2 concordance + continuity-corrected chi2
    "q402_mcnemar" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      DataQuality.mcnemar(docs, col("n_chars") >= 800,
        (length(col("text")) - length(regexp_replace(col("text"), " ", "")))
          >= 140)
    }),

    // Cochran-Armitage trend: does the return rate trend with order
    // priority level (1-URGENT .. 5-LOW)? lineitem outcomes joined to
    // the order's dose level; closed form from exact integer stats
    "q403_cochran_armitage" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        (col("l_returnflag") === "R").as("ret"))
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        substring(col("o_orderpriority"), 1, 1).cast("long").as("dose"))
      DataQuality.cochranArmitage(li.join(o,
        col("l_orderkey") === col("o_orderkey")), col("dose"), col("ret"))
    }),

    // Tukey-HSD post-hoc pairwise mean comparisons after q292's ANOVA:
    // which segment means differ, with the pooled-MSE q statistic
    "q404_tukey_hsd" -> ((s, d) => {
      DataQuality.tukeyHsd(Tables.customer(s, d), col("c_mktsegment"),
        col("c_acctbal"))
    }),

    // Dunn's post-hoc pairwise rank test after q399's Kruskal-Wallis:
    // tie-corrected z per priority pair from the same exact rank table
    "q405_dunn_posthoc" -> ((s, d) => {
      DataQuality.dunnPosthoc(Tables.orders(s, d), col("o_orderpriority"),
        col("o_totalprice"))
    }),

    // log-rank test between even/odd user cohorts on q220's activity
    // spans: hypergeometric expected events per duration, chi2 readout
    "q406_logrank" -> ((s, d) => {
      val spans = Tables.events(s, d).groupBy(col("user_id"))
        .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      val cutoff = Tables.events(s, d)
        .agg(date_sub(to_date(max(col("ts"))), 3).as("cut"))
      val subjects = spans.crossJoin(broadcast(cutoff))
        .select(datediff(to_date(col("last_ts")), to_date(col("first_ts")))
            .as("dur"),
          (to_date(col("last_ts")) < col("cut")).as("obs"),
          (col("user_id") % 2 === 0).as("grp1"))
      TimeSeries.logRank(subjects, col("dur"), col("obs"), col("grp1"))
    }),

    // Croston intermittent-demand forecast per part: weekly nonzero
    // demands, EWMA of sizes and of inter-demand intervals (alpha=0.2),
    // plus the Syntetos-Boylan bias-corrected rate
    "q407_croston" -> ((s, d) => {
      val wk = Tables.lineitem(s, d).select(col("l_partkey").as("pk"),
          floor(datediff(col("l_shipdate"), to_date(lit("1970-01-01"))) /
            lit(7)).cast("long").as("wk"),
          col("l_quantity").cast("decimal(12,2)").as("q"))
        .groupBy(col("pk"), col("wk"))
        .agg(sum(col("q")).cast("double").as("dem"))
      TimeSeries.croston(wk, col("pk"), col("wk"), col("dem"), alpha = 0.2)
        .withColumnRenamed("key", "part_key")
    }),

    // pinball (quantile) loss of the per-type P10/P50/P90 daily-spend
    // forecasts: quantiles fit on all but the last 14 days, evaluated
    // on the held-out tail — the quantile-forecast evaluation metric
    "q408_pinball_loss" -> ((s, d) => {
      val daily = dailySpend(s, d).select(col("event_type").as("key"),
        col("day"), col("spend").cast("double").as("y"))
      val cut = daily.agg(date_sub(max(col("day")), 14).as("cutd"))
      val train = daily.crossJoin(broadcast(cut))
        .where(col("day") <= col("cutd"))
      val test = daily.crossJoin(broadcast(cut))
        .where(col("day") > col("cutd"))
      val taus = Seq(0.1, 0.5, 0.9)
      val qs = train.groupBy(col("key"))
        .agg(percentile(col("y"), lit(taus(0))).as("q0"),
          percentile(col("y"), lit(taus(1))).as("q1"),
          percentile(col("y"), lit(taus(2))).as("q2"))
      val terms = taus.zipWithIndex.map { case (t, i) =>
        struct(lit(t).as("tau"), col(s"q$i").as("q")) }
      val ex = test.join(broadcast(qs), Seq("key"))
        .select(col("key"), col("y"), explode(array(terms: _*)).as("tq"))
        .select(col("key"), col("y"), col("tq.tau").as("tau"),
          col("tq.q").as("q"))
      val lt = greatest(col("tau") * (col("y") - col("q")),
        (col("tau") - lit(1.0)) * (col("y") - col("q")))
      ex.groupBy(col("key"), col("tau"))
        .agg(count(lit(1)).as("n_test"), max(col("q")).as("qq"),
          sum(lt.cast("decimal(28,12)")).cast("double").as("sl"))
        .select(col("key"), col("tau"), col("n_test"),
          round(col("qq"), 6).as("q_forecast"),
          round(col("sl") / col("n_test").cast("double"), 6)
            .as("pinball_loss"))
    }),

    // Syntetos-Boylan demand-pattern quadrants per part (ADI x CV^2,
    // thresholds 1.32 / 0.49 decided by exact integer cross-mults):
    // smooth / intermittent / erratic / lumpy — when does q407 apply?
    "q409_intermittency_class" -> ((s, d) => {
      val wk = Tables.lineitem(s, d).select(col("l_partkey").as("pk"),
          floor(datediff(col("l_shipdate"), to_date(lit("1970-01-01"))) /
            lit(7)).cast("long").as("wk"),
          (col("l_quantity").cast("decimal(12,2)") * 100).cast("long")
            .as("qc"))
        .groupBy(col("pk"), col("wk")).agg(sum(col("qc")).as("q"))
      TimeSeries.intermittencyClass(wk, col("pk"), col("wk"), col("q"))
        .withColumnRenamed("key", "part_key")
    }),

    // log-log price elasticity of demand per brand: OLS slope of
    // ln(qty) on ln(net unit price). The libm logs quantize to
    // DECIMAL(18,12) so both engines fold identical doubles; ALL
    // sufficient sums then quantize to integer 1e9 units (q398's
    // scheme) so no fold exceeds 2^53 and shuffle order is moot
    "q412_price_elasticity" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"),
          col("l_extendedprice").cast("decimal(12,2)").cast("double").as("ep"),
          col("l_discount").cast("decimal(12,2)").cast("double").as("disc"),
          col("l_quantity").cast("decimal(12,2)").cast("double").as("qty"))
      val xy = li.select(col("brand"),
        log(col("ep") * (lit(1.0) - col("disc")) / col("qty"))
          .cast("decimal(18,12)").cast("double").as("x"),
        log(col("qty")).cast("decimal(18,12)").cast("double").as("y"))
      def q9(c: Column): Column = round(c * lit(1e9)).cast("long")
      val st = xy.groupBy(col("brand")).agg(
        count(lit(1)).cast("double").as("n"),
        (sum(q9(col("x"))).cast("double") / lit(1e9)).as("sx"),
        (sum(q9(col("y"))).cast("double") / lit(1e9)).as("sy"),
        sum(q9(col("x") * col("y"))).cast("double").as("sxyq"),
        sum(q9(col("x") * col("x"))).cast("double").as("sxxq"),
        sum(q9(col("y") * col("y"))).cast("double").as("syyq"))
      val num = col("n") * (col("sxyq") / lit(1e9)) - col("sx") * col("sy")
      val denx = col("n") * (col("sxxq") / lit(1e9)) - col("sx") * col("sx")
      val deny = col("n") * (col("syyq") / lit(1e9)) - col("sy") * col("sy")
      st.select(col("brand"), col("n").cast("long").as("n"),
        round(num / denx, 6).as("elasticity"),
        round(num * num / (denx * deny), 6).as("r2"))
    }),

    // max drawdown of each type's cumulative-revenue "equity curve":
    // running-max minus level, ALL in exact decimal (prefix sums of
    // DECIMAL(18,2)) so the peak-to-trough deficit is bit-exact; one
    // partitioned window pass, one aggregation
    "q413_max_drawdown" -> ((s, d) => {
      val daily = dailySpend(s, d).select(col("event_type").as("key"),
        col("day"), col("spend"))
      val w = Window.partitionBy(col("key")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dd = daily
        .withColumn("level", sum(col("spend")).over(w))
        .withColumn("runmax", max(col("level")).over(w))
        .withColumn("dd", col("runmax") - col("level"))
      dd.groupBy(col("key"))
        .agg(count(lit(1)).as("n_days"),
          round(max(col("dd")).cast("double"), 6).as("max_drawdown"),
          sum(when(col("dd") > 0, 1L).otherwise(0L)).as("days_in_drawdown"))
    }),

    // 14-day RSI (Cutler's SMA form) per type: rolling gain/loss sums
    // over exact decimal day-over-day diffs; emitted only where the
    // full 14-diff window exists
    "q414_rsi" -> ((s, d) => {
      val daily = dailySpend(s, d).select(col("event_type").as("key"),
        col("day"), col("spend"))
      val wl = Window.partitionBy(col("key")).orderBy(col("day"))
      val w14 = wl.rowsBetween(-13, 0)
      val diffs = daily
        .withColumn("diff", col("spend") - lag(col("spend"), 1).over(wl))
        .where(col("diff").isNotNull)
      val gl = diffs
        .withColumn("nw", count(lit(1)).over(w14))
        .withColumn("g", sum(when(col("diff") > 0, col("diff"))
          .otherwise(lit(0).cast("decimal(18,2)"))).over(w14))
        .withColumn("l", sum(when(col("diff") < 0, -col("diff"))
          .otherwise(lit(0).cast("decimal(18,2)"))).over(w14))
        .where(col("nw") === 14)
      gl.select(col("key"), col("day").cast("string").as("day"),
        round(when(col("l") === 0, lit(100.0)).otherwise(
          lit(100.0) - lit(100.0) / (lit(1.0) +
            col("g").cast("double") / col("l").cast("double"))), 6)
          .as("rsi14"))
    }),

    // Bollinger bands (20-day, 2 sigma) with breakout flags per type:
    // rolling mean/std from exact decimal rolling sums (x and x^2),
    // so both engines derive the same band doubles and the breakout
    // comparison is engine-independent
    "q415_bollinger_breakouts" -> ((s, d) => {
      val daily = dailySpend(s, d).select(col("event_type").as("key"),
        col("day"), col("spend").cast("decimal(18,2)").as("spend"))
      val w20 = Window.partitionBy(col("key")).orderBy(col("day"))
        .rowsBetween(-19, 0)
      val b = daily
        .withColumn("nw", count(lit(1)).over(w20))
        .withColumn("sx", sum(col("spend")).over(w20))
        .withColumn("sxx", sum((col("spend") * col("spend"))
          .cast("decimal(38,4)")).over(w20))
        .where(col("nw") === 20)
        .withColumn("mean", col("sx").cast("double") / lit(20.0))
        .withColumn("sd", sqrt((col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double") / lit(20.0)) /
          lit(19.0)))
        .withColumn("upper", col("mean") + lit(2.0) * col("sd"))
        .withColumn("lower", col("mean") - lit(2.0) * col("sd"))
      b.select(col("key"), col("day").cast("string").as("day"),
        round(col("mean"), 6).as("mid"), round(col("upper"), 6).as("upper"),
        round(col("lower"), 6).as("lower"),
        when(col("spend").cast("double") > col("upper"), 1L)
          .when(col("spend").cast("double") < col("lower"), -1L)
          .otherwise(0L).as("breakout"))
    }),

    // two-piece segmented trend per event type: the breakpoint that
    // minimizes left+right OLS SSE, scored from one prefix-stats pass
    "q416_segmented_trend" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg((sum(money(col("value"))) * 100).cast("long").as("cents"))
      TimeSeries.segmentedTrend(daily, col("event_type"), col("day"),
        col("cents"))
    }),

    // 1-D Kalman level filter of daily spend per type (q=0.01, r=1):
    // the sequential struct-state fold q191's EWMA cannot express —
    // time-varying gain, replayed step-for-step by the oracle
    "q420_kalman_level" -> ((s, d) => {
      val daily = dailySpend(s, d).select(col("event_type").as("key"),
        col("day"), col("spend").cast("double").as("z"))
      TimeSeries.kalmanLevel(daily, col("key"), col("day"), col("z"),
        qVar = 0.01, rVar = 1.0)
    }),

    // inverse-propensity-weighted ATE of deep discounting on returns:
    // propensity fit by q422's 3-step Newton logistic (ROUNDED
    // coefficients cross both engines verbatim), per-row p quantized
    // to DECIMAL(18,12), Horvitz-Thompson ratio terms folded as
    // integer 1e-6 units — the causal-inference composition
    "q447_ipw_ate" -> ((s, d) => {
      // cache the narrow (x,t,y) projection — spread across cores
      // first (the scan is one row group = ONE task, and a 1-partition
      // cache serializes every later pass): the Newton fit's internal
      // passes AND the scoring pass otherwise each re-scan lineitem
      // parquet + redo the decimal casts (2 extra full scans), all on
      // one core
      val li = graft.sources.Tables.spreadIfNarrow(
        Tables.lineitem(s, d).select(
          (col("l_quantity").cast("decimal(12,2)").cast("double") /
            lit(10.0)).as("x"),
          when(col("l_discount").cast("decimal(12,2)") >= 0.05, 1.0)
            .otherwise(0.0).as("t"),
          when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("y")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val fit = DataQuality.logisticNewton(li, col("x"), col("t") === 1.0,
        iters = 3).select(col("b0"), col("b1"))
      val scored = li.crossJoin(broadcast(fit))
        .withColumn("p", (lit(1.0) / (lit(1.0) +
          exp(-(col("b0") + col("b1") * col("x")))))
          .cast("decimal(18,12)").cast("double"))
      def q6(c: Column): Column = round(c * lit(1e6)).cast("long")
      val st = scored.agg(count(lit(1)).as("n"),
        max(col("b0")).as("b0"), max(col("b1")).as("b1"),
        (sum(q6(col("t") * col("y") / col("p"))).cast("double") / lit(1e6))
          .as("s1y"),
        (sum(q6(col("t") / col("p"))).cast("double") / lit(1e6)).as("s1"),
        (sum(q6((lit(1.0) - col("t")) * col("y") /
          (lit(1.0) - col("p")))).cast("double") / lit(1e6)).as("s0y"),
        (sum(q6((lit(1.0) - col("t")) / (lit(1.0) - col("p"))))
          .cast("double") / lit(1e6)).as("s0"),
        sum(when(col("t") === 1.0 && col("y") === 1.0, 1L).otherwise(0L))
          .as("ty"),
        sum(when(col("t") === 1.0, 1L).otherwise(0L)).as("tn"),
        sum(when(col("t") === 0.0 && col("y") === 1.0, 1L).otherwise(0L))
          .as("cy"),
        sum(when(col("t") === 0.0, 1L).otherwise(0L)).as("cn"))
      val out = st.select(col("n"), col("b0"), col("b1"),
        round(col("s1y") / col("s1") - col("s0y") / col("s0"), 6)
          .as("ipw_ate"),
        round(col("ty").cast("double") / col("tn").cast("double") -
          col("cy").cast("double") / col("cn").cast("double"), 6)
          .as("naive_diff"))
        .localCheckpoint(true) // 1-row result: release the cache now
      li.unpersist(blocking = false)
      out
    }),

    // doubly-robust AIPW ATE on q447's (x, t, y): the Newton-logistic
    // propensity PLUS per-arm OLS outcome models m_t(x) = a + b*x10
    // (slope = ratio of exact-integer sufficient stats — ONE IEEE
    // division, cross-engine stable), combined in the augmented
    // estimator mean[m1 - m0 + t(y-m1)/p - (1-t)(y-m0)/(1-p)] with
    // 1e-6-quantized terms; consistent if EITHER nuisance model is
    // right, and every coefficient crosses the engines at 6 decimals
    "q449_aipw_ate" -> ((s, d) => {
      // cache the narrow (x,t,y) projection — spread across cores
      // first (1-row-group scan = 1-partition cache, see q447): the
      // Newton fit, the per-arm OLS, and the scoring pass otherwise
      // EACH re-scan lineitem parquet + redo the decimal casts (3
      // extra full scans), all on one core
      val li = graft.sources.Tables.spreadIfNarrow(
        Tables.lineitem(s, d).select(
          (col("l_quantity").cast("decimal(12,2)").cast("double") /
            lit(10.0)).as("x"),
          when(col("l_discount").cast("decimal(12,2)") >= 0.05, 1.0)
            .otherwise(0.0).as("t"),
          when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("y")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val fit = DataQuality.logisticNewton(li, col("x"), col("t") === 1.0,
        iters = 3).select(col("b0").as("pb0"), col("b1").as("pb1"))
      // per-arm OLS of y on x10 = round(10x): x10 and y are exact longs,
      // so slope/intercept derive from integer sums via ONE division
      val ols = li
        .select(col("t"), round(col("x") * 10).cast("long").as("x10"),
          col("y").cast("long").as("yl"))
        .groupBy(col("t").as("arm"))
        .agg(count(lit(1)).as("n"), sum(col("x10")).as("sx"),
          sum(col("yl")).as("sy"),
          sum(col("x10") * col("x10")).as("sxx"),
          sum(col("x10") * col("yl")).as("sxy"))
      val bRaw = (col("n") * col("sxy") - col("sx") * col("sy"))
        .cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
      val aRaw = (col("sy").cast("double") - bRaw * col("sx").cast("double")) /
        col("n").cast("double")
      val coef = ols
        .select(col("arm"), round(aRaw, 6).as("a"), round(bRaw, 6).as("b"))
        .groupBy()
        .agg(max(when(col("arm") === 0.0, col("a"))).as("a0"),
          max(when(col("arm") === 0.0, col("b"))).as("b0o"),
          max(when(col("arm") === 1.0, col("a"))).as("a1"),
          max(when(col("arm") === 1.0, col("b"))).as("b1o"))
      val scored = li
        .withColumn("x10", round(col("x") * 10).cast("long"))
        .crossJoin(broadcast(fit)).crossJoin(broadcast(coef))
        .withColumn("p", (lit(1.0) / (lit(1.0) +
          exp(-(col("pb0") + col("pb1") * col("x")))))
          .cast("decimal(18,12)").cast("double"))
        .withColumn("m1", col("a1") + col("b1o") * col("x10"))
        .withColumn("m0", col("a0") + col("b0o") * col("x10"))
      def q6(c: Column): Column = round(c * lit(1e6)).cast("long")
      val term = col("m1") - col("m0") +
        col("t") * (col("y") - col("m1")) / col("p") -
        (lit(1.0) - col("t")) * (col("y") - col("m0")) /
          (lit(1.0) - col("p"))
      val out = scored.agg(count(lit(1)).as("n"),
          max(col("pb0")).as("pb0"), max(col("pb1")).as("pb1"),
          max(col("a0")).as("a0"), max(col("b0o")).as("b0o"),
          max(col("a1")).as("a1"), max(col("b1o")).as("b1o"),
          sum(q6(term)).as("sq"),
          sum(q6(col("m1") - col("m0"))).as("sreg"))
        .select(col("n"), col("pb0"), col("pb1"),
          col("a0"), col("b0o"), col("a1"), col("b1o"),
          round(col("sq").cast("double") / lit(1e6) /
            col("n").cast("double"), 6).as("aipw_ate"),
          round(col("sreg").cast("double") / lit(1e6) /
            col("n").cast("double"), 6).as("reg_ate"))
        .localCheckpoint(true) // 1-row result: release the cache now
      li.unpersist(blocking = false)
      out
    }),

    // Page-Hinkley drift detection on daily spend per event type
    // (δ=0, λ=1e5 cents): the sequential cumulative-deviation fold the
    // q191 EWMA family can't express — running mean inside the
    // accumulator — replayed step-for-step by a list-state oracle
    "q450_page_hinkley" -> ((s, d) => {
      val daily = dailySpend(s, d).select(col("event_type"), col("day"),
        (col("spend") * 100).cast("long").cast("double").as("cents"))
      TimeSeries.pageHinkley(daily, col("event_type"), col("day"),
          col("cents"), delta = 0.0, lambda = 100000.0)
        .select(col("key"), col("n"), col("m_end"), col("min_m"),
          col("alarm_idx"), col("alarm_at").cast("string").as("alarm_at"))
    }),

    // DTW distance between every pair of daily-spend series: the full
    // O(n·m) warping DP as a nested row-local fold (TimeSeries.dtw) —
    // the alignment-tolerant series similarity q299's centroid drift
    // and q191's EWMA can't see; 10 pairs × 900 cells, zero shuffle
    // past the 5-row series frame
    "q454_dtw_distance" -> ((s, d) => {
      val daily = dailySpend(s, d).select(col("event_type"), col("day"),
        (col("spend") * 100).cast("long").cast("double").as("cents"))
      val ser = daily.groupBy(col("event_type").as("key"))
        .agg(array_sort(collect_list(struct(col("day"), col("cents"))))
          .as("arr"))
        .select(col("key"), expr("transform(arr, e -> e.cents)").as("xs"))
      val a = ser.select(col("key").as("key_a"), col("xs").as("xa"))
      val b = ser.select(col("key").as("key_b"), col("xs").as("xb"))
      a.crossJoin(b).where(col("key_a") < col("key_b"))
        .withColumn("d", TimeSeries.dtw(col("xa"), col("xb")))
        .select(col("key_a"), col("key_b"),
          size(col("xa")).cast("long").as("n_a"),
          size(col("xb")).cast("long").as("n_b"),
          round(col("d"), 6).as("dtw"),
          round(col("d") / (size(col("xa")) + size(col("xb")))
            .cast("double"), 6).as("dtw_norm"))
    }),

    // Huber-loss robust trend per event type (c = 1e5 cents, 2 IRLS
    // rounds from the exact-integer OLS start): the resistant
    // companion to q196's OLS trend — outlier days get weight c/|e|
    // instead of pulling the slope quadratically
    "q452_huber_irls" -> ((s, d) => {
      val daily = dailySpend(s, d).select(col("event_type"), col("day"),
        (col("spend") * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val rws = daily.withColumn("idx", row_number().over(w))
      Robust.huberIrls(rws, col("event_type"), col("idx"), col("cents"),
        c = 100000.0, iters = 2)
    }),

    // RANSAC consensus line per event type: 8 md5-seeded 2-point
    // models, inliers within 1e5 cents, best trial refit by exact OLS
    // over its consensus set — the breakdown-point-0.5 fit for series
    // where even Huber's soft weights are not enough
    "q453_ransac_line" -> ((s, d) => {
      val daily = dailySpend(s, d).select(col("event_type"), col("day"),
        (col("spend") * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val rws = daily.withColumn("idx", row_number().over(w))
      Robust.ransacLine(rws, col("event_type"), col("idx"), col("idx"),
        col("cents"), thresh = 100000.0, trials = 8)
    }),

    // single-feature logistic regression via THREE unrolled Newton
    // steps — gradient + 2x2 Hessian sufficient-stats per step, the
    // fully SQL-auditable GLM fit (q306's EM shape, integer-1e9 folds)
    "q422_logistic_newton" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(
        (col("l_discount").cast("decimal(12,2)").cast("double") *
          lit(10.0)).as("x"),
        (col("l_returnflag") === "R").as("y"))
      DataQuality.logisticNewton(li, col("x"), col("y"), iters = 3)
    }),

    // best Gini split of price against the return flag — the auditable
    // decision-stump fit over the exact value-domain prefix
    "q418_best_gini_split" -> ((s, d) => {
      DataQuality.bestGiniSplit(Tables.lineitem(s, d),
        col("l_extendedprice"), col("l_returnflag") === "R")
    }),

    // depth-2 Gini tree (q418 recursed once per side): root split, then
    // the best split of each half — one row per node
    "q426_gini_tree_depth2" -> ((s, d) => {
      DataQuality.giniTreeDepth2(Tables.lineitem(s, d),
        col("l_extendedprice"), col("l_returnflag") === "R")
    }),

    // Gumbel extreme-value fit on weekly block maxima of daily spend
    // (method of moments): location/scale plus the 12-week return
    // level; the transcendental constants are Scala-computed doubles
    // interpolated VERBATIM into the oracle so both engines use
    // identical literals
    "q434_gumbel_maxima" -> ((s, d) => {
      val wk = dailySpend(s, d)
        .groupBy(col("event_type").as("key"),
          date_trunc("week", col("day")).cast("date").as("wk"))
        .agg(max(col("spend").cast("decimal(18,2)")).as("mx"))
      val st = wk.groupBy(col("key")).agg(count(lit(1)).as("n"),
        sum(col("mx")).as("sx"),
        sum((col("mx") * col("mx")).cast("decimal(38,4)")).as("sxx"))
      val nd = col("n").cast("double")
      val mean = col("sx").cast("double") / nd
      val sd = sqrt((nd * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")) /
        (nd * (nd - lit(1.0))))
      val sigma = sd * lit(Sqrt6OverPi)
      val mu = mean - lit(EulerGamma) * sigma
      st.select(col("key"), col("n").as("n_blocks"),
        round(mu, 6).as("gumbel_mu"), round(sigma, 6).as("gumbel_sigma"),
        round(mu - sigma * lit(GumbelK12), 6).as("return_level_12"))
    }),

    // Hill tail-index over each flag's top-k prices: xi = mean of
    // ln(x_i / x_(k+1)) on the k largest values (ties broken by id so
    // the top set is engine-identical); at warehouse scale the top-k
    // comes from the bounded TopK aggregator, not a per-group sort
    "q435_hill_tail_index" -> ((s, d) => {
      val k = 100
      val li = Tables.lineitem(s, d).select(col("l_returnflag").as("grp"),
        col("l_extendedprice").cast("decimal(12,2)").as("v"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("uid"))
      val w = Window.partitionBy(col("grp"))
        .orderBy(col("v").desc, col("uid"))
      val top = li.withColumn("rn", row_number().over(w))
        .where(col("rn") <= k + 1)
      val cut = top.where(col("rn") === k + 1)
        .select(col("grp"), col("v").as("vk1"))
      top.where(col("rn") <= k).join(broadcast(cut), Seq("grp"))
        .select(col("grp"),
          log(col("v").cast("double") / col("vk1").cast("double"))
            .cast("decimal(18,12)").as("lr"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("k"),
          (sum(col("lr")).cast("double") / lit(k.toDouble)).as("xi"))
        .select(col("grp"), col("k"), round(col("xi"), 6).as("hill_xi"),
          round(lit(1.0) / col("xi"), 6).as("tail_alpha"))
    }),

    // Tukey-biweight robust location per event type: start at the
    // exact median, two unrolled IRLS rounds with weights
    // (1 - u^2)^2, u = (x - m)/(6 * MAD); weighted sums fold as
    // integer 1e-6/1e-9 units so the reweighting replays exactly
    "q445_biweight_location" -> ((s, d) => {
      val base = Tables.events(s, d).where(col("value").isNotNull)
        .select(col("event_type").as("key"),
          col("value").cast("decimal(18,2)").cast("double").as("x"))
      val med = base.groupBy(col("key"))
        .agg(percentile(col("x"), lit(0.5)).as("m0"),
          count(lit(1)).as("n"))
      val mad = base.join(broadcast(med), Seq("key"))
        .select(col("key"), abs(col("x") - col("m0")).as("ad"))
        .groupBy(col("key"))
        .agg(percentile(col("ad"), lit(0.5)).as("mad"))
      val params = med.join(mad, Seq("key"))
      def wgt(u: Column): Column = when(abs(u) < 1.0,
        (lit(1.0) - u * u) * (lit(1.0) - u * u)).otherwise(lit(0.0))
      val j1 = base.join(broadcast(params), Seq("key"))
      val w1 = wgt((col("x") - col("m0")) / (lit(6.0) * col("mad")))
      val r1 = j1
        .withColumn("wxq", round(w1 * col("x") * lit(1e6)).cast("long"))
        .withColumn("wq", round(w1 * lit(1e9)).cast("long"))
        .groupBy(col("key"), col("n"), col("mad"), col("m0"))
        .agg(((sum(col("wxq")).cast("double") / lit(1e6)) /
          (sum(col("wq")).cast("double") / lit(1e9))).as("m1"))
      val j2 = base.join(broadcast(r1), Seq("key"))
      val w2 = wgt((col("x") - col("m1")) / (lit(6.0) * col("mad")))
      val r2 = j2
        .withColumn("wxq", round(w2 * col("x") * lit(1e6)).cast("long"))
        .withColumn("wq", round(w2 * lit(1e9)).cast("long"))
        .groupBy(col("key"), col("n"), col("m0"), col("m1"))
        .agg(((sum(col("wxq")).cast("double") / lit(1e6)) /
          (sum(col("wq")).cast("double") / lit(1e9))).as("m2"))
      r2.select(col("key"), col("n"), round(col("m0"), 6).as("median0"),
        round(col("m2"), 6).as("biweight_location"))
    }),

    // knee point of each nation's customer-spend concentration curve:
    // the curve point (i/n, cum/tot) farthest from the diagonal chord,
    // argmax decided by the EXACT integer cross-product cum*n - i*tot
    // (ties to the smallest i) — where disproportion peaks
    "q446_knee_point" -> ((s, d) => {
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val spend = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nat"), col("c_custkey"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("cents"))
      val w = Window.partitionBy(col("nat"))
        .orderBy(col("cents").desc, col("c_custkey"))
      val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wa = Window.partitionBy(col("nat"))
      val curve = spend
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("cum", sum(col("cents")).over(wc))
        .withColumn("n", count(lit(1)).over(wa))
        .withColumn("tot", sum(col("cents")).over(wa))
        .withColumn("gap", dec(col("cum")) * col("n") -
          dec(col("i")) * col("tot"))
      val mx = curve.groupBy(col("nat")).agg(max(col("gap")).as("mg"))
      curve.join(broadcast(mx), Seq("nat"))
        .where(col("gap") === col("mg"))
        .groupBy(col("nat"), col("n"), col("tot"), col("mg"))
        .agg(min(col("i")).as("knee_i"))
        .select(col("nat").as("c_nationkey"), col("n").as("n_customers"),
          col("knee_i"),
          round(col("knee_i").cast("double") / col("n").cast("double"), 6)
            .as("knee_x"),
          round((col("mg").cast("double") /
            (col("n").cast("double") * col("tot").cast("double"))), 6)
            .as("max_gap"))
    }),

    // Grubbs single-outlier test per segment: G = max|x - mean| / sd
    // from exact moment sums; ties on the max deviation break to the
    // smallest value so the flagged outlier is engine-identical
    "q442_grubbs" -> ((s, d) => {
      val base = Tables.customer(s, d).select(col("c_mktsegment").as("g"),
        col("c_acctbal").cast("decimal(12,2)").cast("double").as("x"))
      val m2 = (c: Column) => c.cast("decimal(18,2)")
      val st = base.groupBy(col("g")).agg(count(lit(1)).as("n"),
        sum(m2(col("x"))).as("sx"),
        sum((m2(col("x")) * m2(col("x"))).cast("decimal(38,4)")).as("sxx"))
      val nd = col("n").cast("double")
      val stt = st.select(col("g"), col("n"),
        (col("sx").cast("double") / nd).as("mean"),
        sqrt((nd * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")) /
          (nd * (nd - lit(1.0)))).as("sd"))
      val dev = base.join(broadcast(stt), Seq("g"))
        .withColumn("dev", abs(col("x") - col("mean")))
      val mx = dev.groupBy(col("g")).agg(max(col("dev")).as("mdev"))
      dev.join(broadcast(mx), Seq("g")).where(col("dev") === col("mdev"))
        .groupBy(col("g"), col("n"), col("sd"), col("mdev"))
        .agg(min(col("x")).as("ov"))
        .select(col("g").as("c_mktsegment"), col("n"),
          round(col("ov"), 6).as("outlier_value"),
          round(col("mdev") / col("sd"), 6).as("g_stat"))
    }),

    // Wald-Wolfowitz runs test per series: is daily spend random
    // around its median? Runs from one lag window over the
    // above/below labels, z from exact integer counts
    "q443_runs_test" -> ((s, d) => {
      val daily = dailySpend(s, d).select(col("event_type").as("key"),
        col("day"), col("spend").cast("double").as("y"))
      val med = daily.groupBy(col("key"))
        .agg(percentile(col("y"), lit(0.5)).as("med"))
      val lab = daily.join(broadcast(med), Seq("key"))
        .where(col("y") =!= col("med"))
        .withColumn("ab", (col("y") > col("med")).cast("int"))
      val w = Window.partitionBy(col("key")).orderBy(col("day"))
      val runs = lab.withColumn("chg",
        when(lag(col("ab"), 1).over(w).isNull ||
          col("ab") =!= lag(col("ab"), 1).over(w), 1L).otherwise(0L))
      val agg = runs.groupBy(col("key"))
        .agg(sum(when(col("ab") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("ab") === 0, 1L).otherwise(0L)).as("n2"),
          sum(col("chg")).as("n_runs"))
      val n1d = col("n1").cast("double")
      val n2d = col("n2").cast("double")
      val ndd = (col("n1") + col("n2")).cast("double")
      val two = lit(2.0) * n1d * n2d
      val mu = two / ndd + lit(1.0)
      val va = two * (two - ndd) / (ndd * ndd * (ndd - lit(1.0)))
      agg.select(col("key"), col("n1"), col("n2"), col("n_runs"),
        round((col("n_runs").cast("double") - mu) / sqrt(va), 6).as("z"))
    }),

    // Ljung-Box portmanteau over the first 3 autocorrelations (built
    // from q199's ROUNDED acf values, q362's composition pattern):
    // one whiteness score per series
    "q444_ljung_box" -> ((s, d) => {
      val rr = TimeSeries.acf(dailySpend(s, d), col("event_type"),
        col("day"), col("spend"), maxLag = 3)
      val lens = dailySpend(s, d).groupBy(col("event_type").as("key"))
        .agg(count(lit(1)).as("n"))
      rr.join(broadcast(lens), Seq("key"))
        .select(col("key"), col("n"),
          ((col("acf") * col("acf")) /
            (col("n") - col("lag")).cast("double"))
            .cast("decimal(28,18)").as("term"))
        .groupBy(col("key"), col("n"))
        .agg(round(col("n").cast("double") *
          (col("n").cast("double") + lit(2.0)) *
          sum(col("term")).cast("double"), 6).as("q_lb"))
        .select(col("key"), col("n"), col("q_lb"))
    }),

    // sequential probability ratio test per brand (H0 p=0.2 vs H1
    // p=0.3 return rate): the LLR walk is a closed form of the
    // cumulative conversion count (no fold needed), the first boundary
    // crossing is a filtered min — early-stopping A/B inference over
    // an ordered stream
    "q440_sprt" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("g"),
          concat_ws("#", col("l_shipdate"),
            lpad((col("l_orderkey") * 8 + col("l_linenumber"))
              .cast("string"), 12, "0")).as("ord"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      val wo = Window.partitionBy(col("g")).orderBy(col("ord"), col("y"))
      val wk = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val walk = li
        .withColumn("t", row_number().over(wo).cast("long"))
        .withColumn("k", sum(col("y")).over(wk))
        .withColumn("llr", col("k").cast("double") * lit(SprtLc1) +
          (col("t") - col("k")).cast("double") * lit(SprtLc0))
      val finals = walk.groupBy(col("g")).agg(max(col("t")).as("t_max"),
        max_by(col("llr"), col("t")).as("llr_final"))
      val dec = walk.where(col("llr") >= lit(SprtBound) ||
          col("llr") <= -lit(SprtBound))
        .groupBy(col("g")).agg(min(col("t")).as("t_dec"),
          min_by(col("llr"), col("t")).as("llr_dec"))
      finals.join(dec, Seq("g"), "left")
        .select(col("g").as("p_brand"), col("t_max").as("n_stream"),
          coalesce(col("t_dec"), col("t_max")).as("n_at_decision"),
          round(coalesce(col("llr_dec"), col("llr_final")), 6)
            .as("llr_at_decision"),
          when(col("t_dec").isNull, "undecided")
            .when(col("llr_dec") >= lit(SprtBound), "accept_h1")
            .otherwise("accept_h0").as("decision"))
    }),

    // rank-biased overlap (p=0.9, depth 10) between each brand's
    // top-revenue and top-quantity part rankings — the top-weighted
    // ranking agreement measure, depth overlaps from one bounded
    // weights cross
    "q441_rbo" -> ((s, d) => {
      val s2 = s; import s2.implicits._
      val st = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_partkey"))
        .agg(sum((col("l_extendedprice").cast("decimal(12,2)") * 100)
          .cast("long")).as("rev"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("long")
            .as("qty"))
      val wa = Window.partitionBy(col("p_brand"))
        .orderBy(col("rev").desc, col("l_partkey"))
      val wb = Window.partitionBy(col("p_brand"))
        .orderBy(col("qty").desc, col("l_partkey"))
      val ranked = st.withColumn("ra", row_number().over(wa))
        .withColumn("rb", row_number().over(wb))
        .where(col("ra") <= 10 || col("rb") <= 10)
      val weights = RboW.zipWithIndex
        .map { case (wt, i) => (i + 1, wt) }.toDF("d", "wt")
      ranked.crossJoin(broadcast(weights))
        .where(col("ra") <= col("d") && col("rb") <= col("d"))
        .groupBy(col("p_brand"), col("d"), col("wt"))
        .agg(count(lit(1)).as("ov"))
        .groupBy(col("p_brand"))
        .agg(round(sum((col("wt") * (col("ov").cast("double") /
            col("d").cast("double"))).cast("decimal(28,12)"))
          .cast("double"), 6).as("rbo"))
    }),

    // effect-size suite between two segments: Cohen's d / Hedges' g
    // from exact moment sums, Cliff's delta from the Mann-Whitney U
    // (2U/(n1 n2) - 1) — the practical-significance companions to the
    // q198/q203 hypothesis tests
    "q437_effect_sizes" -> ((s, d) => {
      val src = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .where(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val mw = DataQuality.mannWhitneyU(src, col("g"), col("v"),
        "BUILDING", "AUTOMOBILE").select(col("n1"), col("n2"), col("u1"))
      val m2 = (c: Column) => c.cast("decimal(18,2)")
      val st = src.groupBy(col("g")).agg(count(lit(1)).as("m"),
        sum(m2(col("v"))).as("sv"),
        sum((m2(col("v")) * m2(col("v"))).cast("decimal(38,4)")).as("ss"))
      val two = st.agg(
        max(when(col("g") === "BUILDING", col("m"))).as("m1"),
        max(when(col("g") === "BUILDING", col("sv"))).as("s1"),
        max(when(col("g") === "BUILDING", col("ss"))).as("ss1"),
        max(when(col("g") === "AUTOMOBILE", col("m"))).as("m2"),
        max(when(col("g") === "AUTOMOBILE", col("sv"))).as("s2"),
        max(when(col("g") === "AUTOMOBILE", col("ss"))).as("ss2"))
      val m1d = col("m1").cast("double")
      val m2d = col("m2").cast("double")
      val mean1 = col("s1").cast("double") / m1d
      val mean2 = col("s2").cast("double") / m2d
      val ssd1 = col("ss1").cast("double") -
        col("s1").cast("double") * col("s1").cast("double") / m1d
      val ssd2 = col("ss2").cast("double") -
        col("s2").cast("double") * col("s2").cast("double") / m2d
      val spooled = sqrt((ssd1 + ssd2) / (m1d + m2d - lit(2.0)))
      val cohD = (mean1 - mean2) / spooled
      val hedG = cohD * (lit(1.0) - lit(3.0) /
        (lit(4.0) * (m1d + m2d) - lit(9.0)))
      two.crossJoin(mw).select(col("n1"), col("n2"),
        round(cohD, 6).as("cohens_d"), round(hedG, 6).as("hedges_g"),
        round(lit(2.0) * col("u1") /
          (col("n1").cast("double") * col("n2").cast("double")) -
          lit(1.0), 6).as("cliffs_delta"))
    }),

    // two-sample Anderson-Darling (Scholz-Stephens midrank) on order
    // values across two segments — the tail-sensitive companion to
    // q145's KS, built from exact value-domain prefixes
    "q430_anderson_darling" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      DataQuality.andersonDarling2(o, col("g"), col("v"),
        "BUILDING", "AUTOMOBILE")
    }),

    // per-user trajectory over md5-synthetic event coordinates: total
    // haversine path, net displacement, straightness ratio — each step
    // quantized to DECIMAL(18,12) so the trig folds engine-exact
    "q431_trajectory_stats" -> ((s, d) => {
      def coord(prefix: String): Column =
        pmod(graft.functions.TextAnalysis.hash60(
          concat(lit(prefix + ":"), col("event_id").cast("string"))),
          lit(1000000L)).cast("double") / lit(1000000.0) * lit(5.0)
      val pts = Tables.events(s, d).select(col("user_id"),
        (col("ts").cast("long") * 1000000 +
          pmod(col("event_id"), lit(1000000L))).as("ord"),
        (coord("tlat") + lit(40.0)).as("lat"), coord("tlon").as("lon"))
      Geo.trajectoryStats(pts, col("user_id"), col("ord"), col("lat"),
          col("lon"))
        .withColumnRenamed("key", "user_id")
    }),

    // Getis-Ord Gi* hotspot grid over the synthetic customer points:
    // 0.5-degree cells, 3x3 neighborhood sums via bounded 9x replication
    "q301_geo_hotspot" -> ((s, d) => {
      Geo.hotspotGiStar(customerPoints(s, d), col("lat"), col("lon"),
        cellDeg = 0.5)
    }),

    // rolling 7-row MEDIAN per series (robust rolling level — the
    // outlier-immune companion to q138's rolling mean); exact
    // interpolated percentile as a window aggregate, bit-identical to
    // quantile_cont over the same frame
    "q307_rolling_median" -> ((s, d) => {
      val daily = dailySpend(s, d).select(col("event_type"), col("day"),
        col("spend").cast("double").as("y"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, 0)
      daily.select(col("event_type"), col("day").cast("string").as("day"),
        round(percentile(col("y"), lit(0.5)).over(w), 6).as("med7"),
        count(lit(1)).over(w).as("n7"))
    }),

    // process-conformance check (process-mining style): per user, the
    // time-ordered transition stream is validated against the allowed
    // transition set (broadcast); emits conforming/violating transition
    // counts — one per-user window pass + a 25-row broadcast lookup
    "q329_process_conformance" -> ((s, d) => {
      // allowed process: signup starts things; view->click->purchase
      // funnels; error only follows click/purchase; self-loops allowed
      val allowed = Seq(
        "signup" -> "view", "signup" -> "signup",
        "view" -> "view", "view" -> "click",
        "click" -> "click", "click" -> "purchase", "click" -> "error",
        "purchase" -> "purchase", "purchase" -> "error",
        "purchase" -> "view", "error" -> "view")
      val s2 = s; import s2.implicits._
      val allowedDf = allowed.toDF("prev", "curr").withColumn("ok", lit(1))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type").as("curr"),
          lag(col("event_type"), 1).over(w).as("prev"))
        .where(col("prev").isNotNull)
        .join(broadcast(allowedDf), Seq("prev", "curr"), "left")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_transitions"),
          sum(coalesce(col("ok"), lit(0))).cast("long").as("n_conforming"))
        .withColumn("n_violations",
          col("n_transitions") - col("n_conforming"))
        .withColumn("conformance",
          round(col("n_conforming").cast("double") / col("n_transitions"), 6))
    }),

    // event study: each converting user's mean event value in the 7
    // days BEFORE vs AFTER their first purchase — the per-entity
    // pre/post readout behind any promo/treatment-effect analysis;
    // decimal folds keep the per-user means exact
    "q330_event_study" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val conv = ev.where(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("ts")).as("cts"))
      val sec = col("ts").cast("long") - col("cts").cast("long")
      ev.join(conv, Seq("user_id"))
        .select(col("user_id"), money(col("value")).as("v"), sec.as("dt"))
        .where(col("dt") >= -7L * 86400L && col("dt") <= 7L * 86400L &&
          col("dt") =!= 0L)
        .groupBy(col("user_id"))
        .agg(sum(when(col("dt") < 0, col("v"))).as("pre_sum"),
          count(when(col("dt") < 0, lit(1))).as("n_pre"),
          sum(when(col("dt") > 0, col("v"))).as("post_sum"),
          count(when(col("dt") > 0, lit(1))).as("n_post"))
        .select(col("user_id"), col("n_pre"), col("n_post"),
          round(col("pre_sum").cast("double") / col("n_pre"), 6)
            .as("pre_mean"),
          round(col("post_sum").cast("double") / col("n_post"), 6)
            .as("post_mean"))
    }),

    // per-cluster summarization of the q305 grid-DBSCAN output:
    // point-weighted cell centroid + extent per cluster
    "q331_cluster_summarize" -> ((s, d) => {
      Geo.gridDbscan(customerPoints(s, d), col("lat"), col("lon"),
          cellDeg = 0.5, minPts = 12L)
        .where(col("cluster").isNotNull)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_cells"), sum(col("n_points")).as("n_points"),
          round(sum(col("cy") * col("n_points")).cast("double") /
            sum(col("n_points")).cast("double"), 6).as("centroid_cy"),
          round(sum(col("cx") * col("n_points")).cast("double") /
            sum(col("n_points")).cast("double"), 6).as("centroid_cx"),
          (max(col("cy")) - min(col("cy")) + 1).as("extent_y"),
          (max(col("cx")) - min(col("cx")) + 1).as("extent_x"))
    }),

    // gaps-and-islands: per-user consecutive-day activity streaks via
    // the day-minus-row_number anchor (one window + one agg, no joins)
    "q303_streaks" -> ((s, d) => {
      TimeSeries.streaks(Tables.events(s, d), col("user_id"), to_date(col("ts")))
        .select(col("k").as("user_id"),
          col("streak_start").cast("string").as("streak_start"),
          col("streak_end").cast("string").as("streak_end"),
          col("streak_len"), col("streak_idx"))
    }),

    // date-spine densification: zero-fill each event type's daily-spend
    // series over its own [min, max] day range (row-local sequence
    // explode, no calendar-table join)
    "q304_date_spine_fill" -> ((s, d) => {
      TimeSeries.fillDailyGaps(
          dailySpend(s, d).select(col("event_type"), col("day"),
            col("spend").cast("double").as("v")),
          col("event_type"), col("day"), col("v"))
        .select(col("k").as("event_type"), col("d").cast("string").as("day"),
          col("value"), col("is_filled"))
    }),

    // linear-interpolation gap fill (the third imputation mode next to
    // q304's zero-fill and q345's LOCF): interior gaps blend the
    // nearest observations on each side by day distance; edges fall
    // back to the available neighbor. Two per-series windows carry the
    // previous/next observed (value, day) pairs; the oracle replays the
    // carries with forward+backward ASOF joins — same values, two
    // different engines' idioms for the same stateful lookup.
    "q374_linear_interpolate" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val actual = dailySpend(s, d).select(col("event_type").as("k"),
        col("day").cast("date").as("d"), col("spend").cast("double").as("v"))
      val spine = actual.groupBy(col("k"))
        .agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
        .select(col("k"), explode(sequence(col("lo"), col("hi"),
          expr("interval 1 day"))).as("d"))
      val joined = spine.join(actual, Seq("k", "d"), "left")
      val wB = Window.partitionBy(col("k")).orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wF = Window.partitionBy(col("k")).orderBy(col("d"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      joined
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wB))
        .withColumn("pd", last(when(col("v").isNotNull, col("d")),
          ignoreNulls = true).over(wB))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wF))
        .withColumn("nd", first(when(col("v").isNotNull, col("d")),
          ignoreNulls = true).over(wF))
        .select(col("k").as("event_type"), col("d").cast("string").as("day"),
          when(col("v").isNotNull, lit(0)).otherwise(lit(1)).as("is_filled"),
          round(
            when(col("v").isNotNull, col("v"))
              .when(col("pv").isNull, col("nv"))
              .when(col("nv").isNull, col("pv"))
              .otherwise(col("pv") + (col("nv") - col("pv")) *
                (datediff(col("d"), col("pd")).cast("double") /
                 datediff(col("nd"), col("pd")).cast("double"))), 6)
            .as("value"))
    }),

    // LOCF forward-fill over the same spine as q304 — gaps carry the
    // last observed daily spend instead of zero; the oracle replays the
    // carry with an ASOF LEFT JOIN (latest observation <= spine day)
    "q345_locf_fill" -> ((s, d) => {
      TimeSeries.fillForward(
          dailySpend(s, d).select(col("event_type"), col("day"),
            col("spend").cast("double").as("v")),
          col("event_type"), col("day"), col("v"))
        .select(col("k").as("event_type"), col("d").cast("string").as("day"),
          col("value"), col("is_filled"))
    }),

    // grid-DBSCAN over the synthetic customer points: core cells
    // (>= 12 pts) merge across the 8-neighborhood into min-cell-id
    // clusters; non-core cells are noise
    "q305_grid_dbscan" -> ((s, d) => {
      Geo.gridDbscan(customerPoints(s, d), col("lat"), col("lon"),
        cellDeg = 0.5, minPts = 12L)
    }),

    // POINT-level DBSCAN (q305 clusters grid cells; this is the real
    // thing): eps-ball neighborhoods via 3x3 grid blocking, core /
    // border / noise roles, clusters = min-core-id components of the
    // core graph via the star label propagation — every tie resolves
    // to a minimum so the brute-force oracle replays the labeling
    "q456_point_dbscan" -> ((s, d) => {
      val pts = customerPoints(s, d).where(col("c_custkey") % 7 === 0)
      Clustering.dbscan(pts, col("c_custkey"), col("lat"), col("lon"),
        eps = 0.5, minPts = 5)
    }),

    // Borůvka minimum spanning forest over the radius-blocked customer
    // point graph: distributed log-round component merging under a
    // strict total edge order — so the oracle's SEQUENTIAL Kruskal
    // fold (union-find as a list-state relabel) reproduces the exact
    // forest; the cross-check that the parallel algorithm equals the
    // textbook one edge-for-edge
    "q457_boruvka_mst" -> ((s, d) => {
      invalidateMstMemo(s, d) // owner pays the build on EVERY run
      boruvkaMstFor(s, d)
    }),

    // single-linkage clustering = q457's MSF with the 2 heaviest edges
    // cut (k += 2 clusters): the classic MST-dendrogram equivalence,
    // labels again min-id components so the oracle's closure replays
    // them; the hierarchical-clustering path that needs NO iterative
    // refitting at scale — one MSF + one TakeOrdered cut
    "q458_single_linkage" -> ((s, d) => {
      val pts = customerPoints(s, d).where(col("c_custkey") % 7 === 0)
        .select(col("c_custkey").as("pid"), col("lat"), col("lon"))
      val mst = boruvkaMstFor(s, d)
      val cut = mst.orderBy(col("wq").desc, col("u"), col("v")).limit(2)
      val kept = mst.join(cut, Seq("u", "v"), "left_anti")
      // the kept MSF is a high-diameter tree: plain label propagation
      // is O(diameter) rounds; the size-dispatched CC resolves a
      // bounded forest (edge count < node count, here ~|pts|) in one
      // driver union-find with IDENTICAL min-id labels and keeps the
      // O(log n) star contraction past the 10k bound
      val comp = graft.operators.Dedup.connectedComponentsAuto(
        kept.select(col("u").as("id_a"), col("v").as("id_b")))
      pts.select(col("pid"))
        .join(comp.select(col("doc_id").as("pid"), col("component")),
          Seq("pid"), "left")
        .select(col("pid").as("id"),
          coalesce(col("component"), col("pid")).as("cluster"))
    }),

    // Mann-Kendall trend + Kendall tau per event-type daily-spend series
    "q302_mann_kendall" -> ((s, d) => {
      TimeSeries.mannKendall(
          dailySpend(s, d).select(col("event_type"), col("day"),
            col("spend").cast("double").as("y")),
          col("event_type"), col("day"), col("y"))
        .select(col("k").as("event_type"), col("n"), col("s"), col("tau"))
    }),

    // per-series autocorrelation of daily spend at lags 1..3
    "q199_acf" -> ((s, d) => {
      TimeSeries.acf(dailySpend(s, d), col("event_type"), col("day"),
        col("spend"), maxLag = 3)
    }),

    // partial autocorrelation (Durbin-Levinson to lag 3) per series,
    // assembled from the ROUNDED q199 ACF values so both engines feed
    // the recursion bit-identical r1..r3 — the AR-order diagnostic the
    // ACF alone can't give
    "q362_pacf" -> ((s, d) => {
      val rr = TimeSeries.acf(dailySpend(s, d), col("event_type"),
          col("day"), col("spend"), maxLag = 3)
        .groupBy(col("key"))
        .agg(max(when(col("lag") === 1, col("acf"))).as("r1"),
          max(when(col("lag") === 2, col("acf"))).as("r2"),
          max(when(col("lag") === 3, col("acf"))).as("r3"))
      val p22 = (col("r2") - col("r1") * col("r1")) /
        (lit(1.0) - col("r1") * col("r1"))
      val p21 = col("r1") - p22 * col("r1")
      val p33 = (col("r3") - p21 * col("r2") - p22 * col("r1")) /
        (lit(1.0) - p21 * col("r1") - p22 * col("r2"))
      rr.select(col("key").as("event_type"),
        round(col("r1"), 6).as("pacf1"),
        round(p22, 6).as("pacf2"),
        round(p33, 6).as("pacf3"))
    }),

    // 2-D summed-area table (integral image) over the 10x10 customer
    // density grid: sat(x,y) = points in cells <= (x,y), via a row
    // prefix then a column prefix — two windows, each partitioned on
    // the other axis (10 partitions of 10, never a global sort). The
    // grid is densified from a literal spine so sparse cells can't
    // break the second prefix pass; cell coords come off the md5
    // integers directly (no float floor).
    "q363_summed_area_table" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val s2 = s; import s2.implicits._
      val cells = Tables.customer(s, d).select(
          ((pmod(hash60(concat_ws(":", lit("glon"), col("c_custkey"))),
            lit(1000000L)) * 10).divide(lit(1000000)).cast("int")).as("gx"),
          ((pmod(hash60(concat_ws(":", lit("glat"), col("c_custkey"))),
            lit(1000000L)) * 10).divide(lit(1000000)).cast("int")).as("gy"))
        .groupBy(col("gx"), col("gy")).agg(count(lit(1)).as("n"))
      val spine = (for (x <- 0 to 9; y <- 0 to 9) yield (x, y))
        .toDF("gx", "gy")
      val dense = spine.join(cells, Seq("gx", "gy"), "left")
        .select(col("gx"), col("gy"), coalesce(col("n"), lit(0L)).as("n"))
      val rowSum = dense.withColumn("rs", sum(col("n")).over(
        Window.partitionBy(col("gy")).orderBy(col("gx"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      rowSum.withColumn("sat", sum(col("rs")).over(
          Window.partitionBy(col("gx")).orderBy(col("gy"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("gx"), col("gy"), col("n"), col("sat"))
    }),

    // rolling 14-day OLS slope of daily spend per series (the rolling
    // beta / local trend feature): all five sufficient sums ride ONE
    // frame-bounded window as exact integers (x = day ordinal, y =
    // cents), slope assembled with a single mirrored double division;
    // only full 14-row windows emit (no zero denominators to disagree
    // on).
    "q364_rolling_slope" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg((sum(money(col("value"))) * 100).cast("long").as("y"))
      val wo = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val f = wo.rowsBetween(-13, Window.currentRow)
      daily.withColumn("x", row_number().over(wo).cast("long"))
        .select(col("event_type"), col("day"), col("x"), col("y"),
          count(lit(1)).over(f).as("n"),
          sum(col("x")).over(f).as("sx"), sum(col("y")).over(f).as("sy"),
          sum(col("x") * col("y")).over(f).as("sxy"),
          sum(col("x") * col("x")).over(f).as("sxx"))
        .where(col("n") === 14)
        .select(col("event_type"), col("day").cast("string").as("day"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") /
            100.0, 6).as("slope14"))
    }),

    // CUSUM changepoint scan over each series' daily spend
    "q200_cusum" -> ((s, d) => {
      TimeSeries.cusum(dailySpend(s, d), col("event_type"), col("day"),
          col("spend"))
        .withColumn("at_bucket", col("at_bucket").cast("string"))
    }),

    // all customer pairs within 25 km of each other (grid-blocked
    // equi-join; the oracle brute-forces the same pairs)
    "q201_geo_radius_pairs" -> ((s, d) => {
      Geo.radiusJoinPairs(customerPoints(s, d), col("c_custkey"),
          col("lat"), col("lon"), radiusKm = 25.0, maxAbsLat = 45.0)
        .select(col("id_a"), col("id_b"), round(col("dist_km"), 6).as("dist_km"))
    }),

    // Jaro-Winkler linkage of part names blocked by their first token,
    // scored once per DISTINCT name pair and expanded to id pairs
    "q202_jw_linkage" -> ((s, d) => {
      Dedup.jaroWinklerPairsByName(Tables.part(s, d), col("p_partkey"),
          col("p_name"), nm => split(nm, " ").getItem(0), minSim = 0.88)
        .select(col("id_a"), col("id_b"), round(col("jw"), 6).as("jw"))
    }),

    // Mann-Whitney U (rank-sum) test: purchase vs view event values
    "q203_mann_whitney" -> ((s, d) => {
      DataQuality.mannWhitneyU(Tables.events(s, d), col("event_type"),
        col("value"), "purchase", "view")
    }),

    // Spearman rank correlation between quantity and extended price
    "q204_spearman" -> ((s, d) => {
      DataQuality.spearmanCorr(Tables.lineitem(s, d),
        col("l_quantity"), col("l_extendedprice"))
    }),

    // Theil-Sen robust slope of each series' daily spend
    "q205_theil_sen" -> ((s, d) => {
      val daily = dailySpend(s, d)
        .select(col("event_type"),
          datediff(col("day"), lit("1970-01-01")).as("x"), col("spend"))
      TimeSeries.theilSenSlope(daily, col("event_type"), col("x"), col("spend"))
    }),

    // link prediction on the part-affinity graph: common neighbors +
    // Adamic-Adar for non-adjacent pairs sharing >= 2 neighbors
    "q206_link_prediction" -> ((s, d) => {
      Graph.linkPrediction(affinityEdges(s, d), col("pa"), col("pb"),
        minCommon = 2, maxDegree = 10000)
    }),

    // per-node local clustering coefficient on the same graph
    "q207_clustering_coeff" -> ((s, d) => {
      Graph.clusteringCoefficient(affinityEdges(s, d), col("pa"), col("pb"))
    }),

    // tf-idf keyword extraction: top-3 terms per document (raw terms,
    // bounded TopK per doc — no global sort, no hashing)
    "q208_keyword_extract" -> ((s, d) => {
      val toks = Tables.documents(s, d).select(col("doc_id"),
        graft.functions.TextAnalysis.tokens(col("text")).as("toks"))
      val tf = toks.select(col("doc_id"), explode(col("toks")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n"))
      val scored = tf.join(dfreq, Seq("term")).crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("term"), col("tf"),
          (col("tf") * log(col("n").cast("double") / col("df").cast("double"))
            .cast("decimal(18,12)")).cast("double").as("score"))
      graft.aggregators.TopK.topKPerKeyStr(scored, "doc_id", "term", "score", k = 3)
        .select(col("doc_id"), col("term"), round(col("score"), 6).as("score"),
          col("rank"))
    }),

    // golden-record entity resolution over part names: match on the
    // DISTINCT name domain (64 values — the scale trick: never pair raw
    // rows), JW >= 0.9 within first-token blocks, connected components,
    // then one aggregation rolls every part up to its canonical record
    "q209_entity_golden" -> ((s, d) => {
      val names = Tables.part(s, d).select(col("p_name")).distinct()
      val pairs = Dedup.jaroWinklerPairs(names, col("p_name"), col("p_name"),
        Seq(split(col("p_name"), " ").getItem(0)), minSim = 0.9)
      val comp = Dedup.connectedComponents(pairs)
        .select(col("doc_id").as("p_name"), col("component"))
      Tables.part(s, d).join(comp, Seq("p_name"), "left")
        .withColumn("canonical", coalesce(col("component"), col("p_name")))
        .groupBy(col("canonical"))
        .agg(countDistinct(col("p_name")).as("n_names"),
          count(lit(1)).as("n_parts"),
          min(col("p_retailprice")).cast("decimal(18,2)").as("min_price"),
          max(col("p_retailprice")).cast("decimal(18,2)").as("max_price"))
        .select(col("canonical"), col("n_names"), col("n_parts"),
          col("min_price").cast("double").as("min_price"),
          col("max_price").cast("double").as("max_price"))
    })
  )

  private val queries2: Map[String, Q] = Map(
    // CDC compaction: latest order-status row per customer from the
    // orders changelog (one max_by aggregation, no window)
    "q210_upsert_latest" -> ((s, d) => {
      TimeSeries.upsertLatest(Tables.orders(s, d), col("o_custkey"),
          col("o_orderdate"), col("o_orderkey"),
          Seq(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")))
        .select(col("k").as("o_custkey"), col("ts").as("o_orderdate"),
          col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(18,2)").cast("double")
            .as("o_totalprice"))
    }),

    // per-returnflag weighted (by quantity) lower median of extended price
    "q211_weighted_median" -> ((s, d) => {
      DataQuality.weightedMedian(Tables.lineitem(s, d), col("l_returnflag"),
        col("l_extendedprice"), col("l_quantity"))
    }),

    // 7-day rolling correlation between purchase and view daily spend
    "q212_rolling_corr" -> ((s, d) => {
      val daily = dailySpend(s, d)
        .groupBy(col("day"))
        .agg(sum(when(col("event_type") === "purchase", col("spend"))).as("px"),
          sum(when(col("event_type") === "view", col("spend"))).as("vy"))
      TimeSeries.rollingCorr(daily, col("day"), col("px"), col("vy"), windowLen = 7)
        .withColumn("bucket", col("bucket").cast("string"))
    }),

    // Benford first-digit profile of order totals
    "q213_benford" -> ((s, d) => {
      DataQuality.benfordProfile(Tables.orders(s, d), col("o_totalprice"))
    }),

    // incremental view maintenance: fold the late half of the events
    // into the standing early-half state and read the merged rollup —
    // hash-gated against a full recompute in the oracle
    "q214_incremental_agg" -> ((s, d) => {
      import graft.operators.Incremental
      val ev = Tables.events(s, d)
      val cut = lit("2024-01-16").cast("timestamp")
      val metrics = Seq("value" -> col("value"))
      val base = Incremental.aggState(
        ev.where(col("ts") < cut), Seq(col("event_type")), metrics)
      val delta = Incremental.aggState(
        ev.where(col("ts") >= cut), Seq(col("event_type")), metrics)
      Incremental.readout(
        Incremental.mergeStates(Seq("event_type"), Seq("value"), base, delta),
        Seq("event_type"), Seq("value"))
    }),

    // Theil's uncertainty coefficient (asymmetric association):
    // how much of order priority does order status explain, and back
    "q215_theils_u" -> ((s, d) => {
      DataQuality.theilsU(Tables.orders(s, d),
        col("o_orderpriority"), col("o_orderstatus"))
    }),

    // deterministic Poisson bootstrap CI for the mean order total
    // (every resampled weight md5-derived; the oracle replays all 40
    // replica means and the percentile CI bit-for-bit)
    "q217_bootstrap_ci" -> ((s, d) => {
      DataQuality.bootstrapMeanCI(Tables.orders(s, d), col("o_orderkey"),
        col("o_totalprice"), replicas = 40, level = 0.90)
    }),

    // first-order Markov transition matrix of per-user event types
    "q218_markov_transitions" -> ((s, d) => {
      TimeSeries.markovTransitions(Tables.events(s, d), col("user_id"),
        col("ts"), col("event_id"), col("event_type"))
    }),

    // expected calibration error of the deterministic md5-LR scores
    // (one-number summary of q66's reliability table)
    "q219_calibration_ece" -> ((s, d) => {
      graft.workflow.MLTuning.expectedCalibrationError(
        ReaderQueries.mdScored(s, d), "p", "y", bins = 10)
    }),

    // Kaplan-Meier survival of user activity spans (right-censored if
    // the user was still active in the last 3 days of the window)
    "q220_kaplan_meier" -> ((s, d) => {
      val spans = Tables.events(s, d).groupBy(col("user_id"))
        .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      val cutoff = Tables.events(s, d)
        .agg(date_sub(to_date(max(col("ts"))), 3).as("cut"))
      val subjects = spans.crossJoin(broadcast(cutoff))
        .select(datediff(to_date(col("last_ts")), to_date(col("first_ts")))
            .as("dur"),
          (to_date(col("last_ts")) < col("cut")).as("obs"))
      TimeSeries.kaplanMeier(subjects, col("dur"), col("obs"))
    }),

    // Simpson's-paradox detector: Pearson corr(quantity, revenue) per
    // return-flag group AND pooled, from ONE rollup pass of exact
    // integer sufficient statistics (cents; squares accumulate in
    // DECIMAL(38) so the sf-scaled y² sums can't overflow a long);
    // each group row carries the pooled corr and a sign-flip flag —
    // the aggregation-reversal audit. The pooled scalar rides a 1-row
    // broadcast frame.
    "q354_simpsons_paradox" -> ((s, d) => {
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val base = Tables.lineitem(s, d).select(col("l_returnflag"),
        (col("l_quantity").cast("decimal(18,2)") * 100).cast("long").as("x"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("y"))
      val stats = base.rollup(col("l_returnflag"))
        .agg(count(lit(1)).as("m"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(dec(col("x") * col("y"))).as("sxy"),
          sum(dec(col("x") * col("x"))).as("sxx"),
          sum(dec(col("y") * col("y"))).as("syy"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("grp"),
          col("m"),
          round((dec(col("m")) * col("sxy") -
              dec(col("sx")) * dec(col("sy"))).cast("double") /
            (sqrt((dec(col("m")) * col("sxx") -
              dec(col("sx")) * dec(col("sx"))).cast("double")) *
             sqrt((dec(col("m")) * col("syy") -
              dec(col("sy")) * dec(col("sy"))).cast("double"))), 6).as("corr"))
      val pooled = stats.where(col("grp") === "ALL")
        .select(col("corr").as("pooled_corr"))
      stats.crossJoin(broadcast(pooled))
        .withColumn("sign_flip",
          (col("corr") > 0) =!= (col("pooled_corr") > 0))
    }),

    // point-in-polygon classification with EXACT integer ray casting:
    // the md5-derived customer coordinates stay on the integer
    // micro-degree grid (u*5, never through a float), each point tests
    // the 5 pentagon edges via a row-local explode of a LITERAL edge
    // array (no join, no BNLJ) with cross-product sign tests — zero
    // floating point in the inside/outside decision. Readout: inside
    // counts per nation over a broadcast dim join.
    "q356_point_in_polygon" -> ((s, d) => {
      val verts = Seq((2500000L, 44000000L), (4500000L, 42500000L),
        (3800000L, 40500000L), (1200000L, 40800000L), (500000L, 42800000L))
      val edgeCol = array(verts.zip(verts.tail :+ verts.head).map {
        case ((x1, y1), (x2, y2)) =>
          struct(lit(x1).as("x1"), lit(y1).as("y1"),
            lit(x2).as("x2"), lit(y2).as("y2")) }: _*)
      val pts = Tables.customer(s, d).select(col("c_custkey"),
        col("c_nationkey"),
        (pmod(hash60(concat_ws(":", lit("glon"), col("c_custkey"))),
          lit(1000000L)) * 5).as("ix"),
        (pmod(hash60(concat_ws(":", lit("glat"), col("c_custkey"))),
          lit(1000000L)) * 5 + 40000000L).as("iy"))
      val crossed = pts.withColumn("e", explode(edgeCol))
        .withColumn("t",
          (col("e.x2") - col("e.x1")) * (col("iy") - col("e.y1")) -
          (col("ix") - col("e.x1")) * (col("e.y2") - col("e.y1")))
        .withColumn("crossed",
          ((col("e.y1") > col("iy")) =!= (col("e.y2") > col("iy"))) &&
          when(col("e.y2") > col("e.y1"), col("t") > 0)
            .otherwise(col("t") < 0))
      crossed.groupBy(col("c_custkey"), col("c_nationkey"))
        .agg((sum(when(col("crossed"), 1L).otherwise(0L)) % 2).as("inside"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"), sum(col("inside")).as("n_inside"))
    }),

    // Nelson-Aalen cumulative hazard over the same right-censored
    // activity spans as q220 — the additive estimator H(t) = sum d/n,
    // each increment folded as DECIMAL(18,12) so the ordered cumulative
    // sum is exact in both engines
    "q341_nelson_aalen" -> ((s, d) => {
      val spans = Tables.events(s, d).groupBy(col("user_id"))
        .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      val cutoff = Tables.events(s, d)
        .agg(date_sub(to_date(max(col("ts"))), 3).as("cut"))
      val subjects = spans.crossJoin(broadcast(cutoff))
        .select(datediff(to_date(col("last_ts")), to_date(col("first_ts")))
            .as("dur"),
          (to_date(col("last_ts")) < col("cut")).as("obs"))
      TimeSeries.nelsonAalen(subjects, col("dur"), col("obs"))
    }),

    // decile gains table for the md5-LR score: response rate and
    // cumulative lift per score decile (exact percent-rank deciles)
    "q221_gains_table" -> ((s, d) => {
      val scored = ReaderQueries.mdScored(s, d)
      val ranked = graft.operators.Vectorizers.quantileRank(
          scored, col("vec_id"), col("p"))
        .select(col("id").as("vec_id"),
          least(floor((lit(1.0) - col("q")) * 10), lit(9.0)).cast("int")
            .as("decile"))
      val perDec = scored.join(ranked, Seq("vec_id"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"), sum(col("y").cast("long")).as("responders"))
      val tot = perDec.agg(sum(col("n")).as("tn"), sum(col("responders")).as("tr"))
      val w = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perDec.crossJoin(broadcast(tot))
        .withColumn("cum_n", sum(col("n")).over(w))
        .withColumn("cum_r", sum(col("responders")).over(w))
        .select(col("decile"), col("n"), col("responders"),
          round(col("responders").cast("double") / col("n").cast("double"), 6)
            .as("resp_rate"),
          round((col("cum_r").cast("double") / col("cum_n").cast("double")) /
            (col("tr").cast("double") / col("tn").cast("double")), 6)
            .as("cum_lift"))
    }),

    // Zipf fit of the corpus token-frequency distribution: OLS of
    // ln(freq) on ln(rank) over the vocabulary (slope ~ -1 is Zipf)
    "q222_zipf_fit" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(graft.functions.TextAnalysis.tokens(col("text")))
          .as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("f"))
      val w = Window.orderBy(col("f").desc, col("term"))
      val ranked = toks.withColumn("r", row_number().over(w))
        .select(log(col("r").cast("double")).cast("decimal(18,12)").as("x"),
          log(col("f").cast("double")).cast("decimal(18,12)").as("y"))
      val agg = ranked.agg(count(lit(1)).as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("y") * col("y")).cast("double").as("syy"))
      val n = col("n").cast("double")
      val num = col("sxy") - col("sx") * col("sy") / n
      val denX = col("sxx") - col("sx") * col("sx") / n
      val denY = col("syy") - col("sy") * col("sy") / n
      agg.select(col("n").as("vocab"),
        round(num / denX, 6).as("zipf_slope"),
        round(num * num / (denX * denY), 6).as("r2"))
    }),

    // geo k-nearest-neighbors: 3 closest customers within 25 km, per
    // customer, via grid blocking + bounded per-point TopK
    "q224_geo_knn" -> ((s, d) => {
      Geo.nearestNeighbors(customerPoints(s, d), col("c_custkey"),
          col("lat"), col("lon"), k = 3, radiusKm = 25.0, maxAbsLat = 45.0)
        .select(col("id"), col("neighbor"),
          round(col("dist_km"), 6).as("dist_km"), col("rank"))
    }),

    // data repair: per-returnflag median imputation of a deterministic
    // 10% null-out of quantities
    "q225_group_impute" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        when(pmod(hash60(concat_ws(":", lit("imp"), col("l_orderkey"),
          col("l_linenumber"))), lit(10L)) === 0, lit(null).cast("double"))
          .otherwise(col("l_quantity")).as("qty"))
      graft.operators.Vectorizers.imputeGroupMedian(li,
          col("l_returnflag"), col("qty"), "qty_filled")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("qty_filled"), 6).as("qty_filled"),
          col("qty_filled_isnull"))
    }),

    // multivariate outliers: Mahalanobis distance over (quantity,
    // extended price) with the chi-square(2, 0.99) flag
    "q226_mahalanobis" -> ((s, d) => {
      DataQuality.mahalanobis2d(
        Tables.lineitem(s, d).withColumn("rid",
          concat_ws("-", col("l_orderkey"), col("l_linenumber"))),
        col("rid"), col("l_quantity"), col("l_extendedprice"),
        threshold = 9.21)
    }),

    // exact trimmed mean (10% each tail, fractional tie-mass) of
    // extended price per return flag
    "q227_trimmed_mean" -> ((s, d) => {
      DataQuality.trimmedMean(Tables.lineitem(s, d), col("l_returnflag"),
        col("l_extendedprice"), trim = 0.1)
    }),

    // corpus diversity indices: per language, Shannon entropy, Simpson
    // concentration, and effective source count of the source mix
    "q223_diversity" -> ((s, d) => {
      val counts = Tables.documents(s, d)
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c"))
      val tot = counts.groupBy(col("lang")).agg(sum(col("c")).as("n"))
      val p = col("c").cast("double") / col("n").cast("double")
      counts.join(broadcast(tot), Seq("lang"))
        .groupBy(col("lang"))
        .agg(first(col("n")).as("n_docs"), count(lit(1)).as("n_sources"),
          (-sum(p * log(p))).as("h"), sum(p * p).as("simpson"))
        .select(col("lang"), col("n_docs"), col("n_sources"),
          round(col("h"), 6).as("shannon"),
          round(col("simpson"), 6).as("simpson"),
          round(exp(col("h")), 6).as("eff_sources"))
    }),

    // personalized PageRank on the trade graph, teleporting to the
    // BUILDING-segment customers (seed-proximity affinity ranking)
    "q216_personalized_pagerank" -> ((s, d) => {
      // the orders projection is a 2-column ~MB dimension against the
      // lineitem fact: broadcast it so the edge build never shuffles
      // the fact side
      val trade = broadcast(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey")))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("p"))
      val edges = trade.select(col("c").as("src"), col("p").as("dst"))
        .unionByName(trade.select(col("p").as("src"), col("c").as("dst")))
      val seeds = Tables.customer(s, d)
        .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val pr = Graph.personalizedPageRank(edges, col("src"), col("dst"),
        seeds, iters = 2, damping = 0.85)
      val ns = pr.agg(count(lit(1)).as("n"))
      pr.crossJoin(broadcast(ns))
        .select(col("node"), round(col("pr") * col("n"), 6).as("ppr_scaled"))
    })
  )

  /** Shared grid-DBSCAN CTE chain (q305 + the q331 summarizer):
    * synthetic points -> cell counts -> core cells -> 8-neighborhood
    * reachability -> min-cell-id cluster labels. */
  private val DBSCAN_CTES =
    """pts AS (
        SELECT CAST(CAST(('0x' || substr(md5('glat:' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
                    % 1000000 AS DOUBLE) / 1000000.0 * 5.0 + 40.0 AS lat,
               CAST(CAST(('0x' || substr(md5('glon:' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
                    % 1000000 AS DOUBLE) / 1000000.0 * 5.0 AS lon
        FROM customer),
      cells AS (SELECT CAST(floor(lat / 0.5) AS BIGINT) AS cy,
                       CAST(floor(lon / 0.5) AS BIGINT) AS cx,
                       count(*) AS n_points
                FROM pts GROUP BY 1, 2),
      cc AS (SELECT cy, cx, n_points, cy * 100000 + cx AS cell FROM cells),
      core AS (SELECT * FROM cc WHERE n_points >= 12),
      e AS (SELECT a.cell AS src, b.cell AS dst
            FROM core a JOIN core b
              ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
             AND a.cell <> b.cell),
      reach AS (SELECT cell AS n, cell AS m FROM core
                UNION
                SELECT r.n, e.dst FROM reach r JOIN e ON e.src = r.m),
      comp AS (SELECT n AS cell, min(m) AS cluster FROM reach GROUP BY n)"""

  private val oracles2: Map[String, String] = Map(
    "q307_rolling_median" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                                 AS y
                        FROM events GROUP BY 1, 2)
         SELECT event_type, CAST(day AS VARCHAR) AS day,
                ROUND(quantile_cont(y, 0.5) OVER w, 6) AS med7,
                count(*) OVER w AS n7
         FROM daily
         WINDOW w AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""",

    "q303_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id AS k, CAST(ts AS DATE) AS d
                       FROM events),
          r AS (SELECT k, d,
                  d - CAST(row_number() OVER (PARTITION BY k ORDER BY d)
                    AS INT) AS anchor
                FROM days),
          isl AS (SELECT k, anchor, min(d) AS s, max(d) AS e,
                         count(*) AS len
                  FROM r GROUP BY k, anchor)
         SELECT k AS user_id, CAST(s AS VARCHAR) AS streak_start,
                CAST(e AS VARCHAR) AS streak_end, len AS streak_len,
                CAST(row_number() OVER (PARTITION BY k ORDER BY s) AS INT)
                  AS streak_idx
         FROM isl""",

    "q374_linear_interpolate" ->
      """WITH daily AS (SELECT event_type AS k, CAST(ts AS DATE) AS d,
                               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                                 AS v
                        FROM events GROUP BY 1, 2),
          b AS (SELECT k, min(d) AS lo, max(d) AS hi FROM daily GROUP BY k),
          spine AS (SELECT k, CAST(gs AS DATE) AS d
                    FROM b, unnest(generate_series(CAST(lo AS TIMESTAMP),
                      CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) t(gs)),
          prevj AS (SELECT s.k, s.d, dd.v AS pv, dd.d AS pd
                    FROM spine s ASOF LEFT JOIN daily dd
                      ON s.k = dd.k AND s.d >= dd.d),
          nextj AS (SELECT s.k, s.d, dd.v AS nv, dd.d AS nd
                    FROM spine s ASOF LEFT JOIN daily dd
                      ON s.k = dd.k AND s.d <= dd.d),
          m AS (SELECT p.k, p.d, p.pv, p.pd, n.nv, n.nd, o.v
                FROM prevj p JOIN nextj n ON p.k = n.k AND p.d = n.d
                LEFT JOIN daily o ON o.k = p.k AND o.d = p.d)
         SELECT k AS event_type, CAST(d AS VARCHAR) AS day,
                CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS is_filled,
                ROUND(CASE WHEN v IS NOT NULL THEN v
                           WHEN pv IS NULL THEN nv
                           WHEN nv IS NULL THEN pv
                           ELSE pv + (nv - pv) *
                             (CAST(date_diff('day', pd, d) AS DOUBLE) /
                              CAST(date_diff('day', pd, nd) AS DOUBLE))
                      END, 6) AS value
         FROM m""",

    "q345_locf_fill" ->
      """WITH daily AS (SELECT event_type AS k, CAST(ts AS DATE) AS d,
                               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                                 AS v
                        FROM events GROUP BY 1, 2),
          b AS (SELECT k, min(d) AS lo, max(d) AS hi FROM daily GROUP BY k),
          spine AS (SELECT k, CAST(gs AS DATE) AS d
                    FROM b, unnest(generate_series(CAST(lo AS TIMESTAMP),
                      CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) t(gs))
         SELECT s.k AS event_type, CAST(s.d AS VARCHAR) AS day,
                dd.v AS value,
                CASE WHEN dd.d = s.d THEN 0 ELSE 1 END AS is_filled
         FROM spine s ASOF LEFT JOIN daily dd
           ON s.k = dd.k AND s.d >= dd.d""",

    "q304_date_spine_fill" ->
      """WITH daily AS (SELECT event_type AS k, CAST(ts AS DATE) AS d,
                               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                                 AS v
                        FROM events GROUP BY 1, 2),
          b AS (SELECT k, min(d) AS lo, max(d) AS hi FROM daily GROUP BY k),
          spine AS (SELECT k, CAST(gs AS DATE) AS d
                    FROM b, unnest(generate_series(CAST(lo AS TIMESTAMP),
                      CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) t(gs))
         SELECT spine.k AS event_type, CAST(spine.d AS VARCHAR) AS day,
                coalesce(daily.v, 0.0) AS value,
                CASE WHEN daily.v IS NULL THEN 1 ELSE 0 END AS is_filled
         FROM spine LEFT JOIN daily ON spine.k = daily.k AND spine.d = daily.d""",

    "q305_grid_dbscan" ->
      s"""WITH RECURSIVE $DBSCAN_CTES
         SELECT cc.cy, cc.cx, cc.n_points, comp.cluster
         FROM cc LEFT JOIN comp ON cc.cell = comp.cell""",

    "q331_cluster_summarize" ->
      s"""WITH RECURSIVE $DBSCAN_CTES,
          lab AS (SELECT cc.cy, cc.cx, cc.n_points, comp.cluster
                  FROM cc JOIN comp ON cc.cell = comp.cell)
         SELECT cluster, count(*) AS n_cells,
                CAST(sum(n_points) AS BIGINT) AS n_points,
                ROUND(CAST(sum(cy * n_points) AS DOUBLE) /
                      CAST(sum(n_points) AS DOUBLE), 6) AS centroid_cy,
                ROUND(CAST(sum(cx * n_points) AS DOUBLE) /
                      CAST(sum(n_points) AS DOUBLE), 6) AS centroid_cx,
                max(cy) - min(cy) + 1 AS extent_y,
                max(cx) - min(cx) + 1 AS extent_x
         FROM lab GROUP BY cluster""",

    "q329_process_conformance" ->
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

    "q330_event_study" ->
      """WITH conv AS (SELECT user_id, min(ts) AS cts FROM events
                       WHERE event_type = 'purchase' GROUP BY user_id),
          j AS (SELECT e.user_id, CAST(e.value AS DECIMAL(18,2)) AS v,
                  CAST(floor(epoch(e.ts)) AS BIGINT) -
                    CAST(floor(epoch(cts)) AS BIGINT) AS dt
                FROM events e JOIN conv ON e.user_id = conv.user_id),
          f AS (SELECT * FROM j
                WHERE dt >= -604800 AND dt <= 604800 AND dt <> 0)
         SELECT user_id,
           count(CASE WHEN dt < 0 THEN 1 END) AS n_pre,
           count(CASE WHEN dt > 0 THEN 1 END) AS n_post,
           ROUND(CAST(sum(CASE WHEN dt < 0 THEN v END) AS DOUBLE) /
                 count(CASE WHEN dt < 0 THEN 1 END), 6) AS pre_mean,
           ROUND(CAST(sum(CASE WHEN dt > 0 THEN v END) AS DOUBLE) /
                 count(CASE WHEN dt > 0 THEN 1 END), 6) AS post_mean
         FROM f GROUP BY user_id""",

    "q300_brown_forsythe" ->
      """WITH base AS (SELECT event_type AS gk, CAST(value AS DOUBLE) AS v
                       FROM events WHERE value IS NOT NULL),
          med AS (SELECT gk, quantile_cont(v, 0.5) AS med
                  FROM base GROUP BY gk),
          z AS (SELECT base.gk, abs(v - med) AS z
                FROM base JOIN med USING (gk)),
          g AS (SELECT gk, count(*) AS n_g,
                       sum(CAST(z AS DECIMAL(18,6))) AS s_g,
                       sum(CAST(z AS DECIMAL(18,6)) *
                           CAST(z AS DECIMAL(18,6))) AS ss_g
                FROM z GROUP BY gk),
          t AS (SELECT n_g, s_g, ss_g,
                  CAST(ROUND(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g, 6)
                    AS DECIMAL(38,6)) AS t6
                FROM g),
          a AS (SELECT count(*) AS k, CAST(sum(n_g) AS BIGINT) AS n,
                       CAST(sum(s_g) AS DOUBLE) AS s_tot,
                       CAST(sum(ss_g) AS DOUBLE) AS ss_tot,
                       CAST(sum(t6) AS DOUBLE) AS sum_t
                FROM t)
         SELECT k, n,
                ROUND(sum_t - s_tot * s_tot / n, 6) AS ss_between,
                ROUND(ss_tot - sum_t, 6) AS ss_within,
                ROUND(((sum_t - s_tot * s_tot / n) / (k - 1)) /
                      ((ss_tot - sum_t) / (n - k)), 6) AS f_stat
         FROM a""",

    "q301_geo_hotspot" ->
      """WITH pts AS (
            SELECT CAST(CAST(('0x' || substr(md5('glat:' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
                        % 1000000 AS DOUBLE) / 1000000.0 * 5.0 + 40.0 AS lat,
                   CAST(CAST(('0x' || substr(md5('glon:' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
                        % 1000000 AS DOUBLE) / 1000000.0 * 5.0 AS lon
            FROM customer),
          cells AS (SELECT CAST(floor(lat / 0.5) AS BIGINT) AS cy,
                           CAST(floor(lon / 0.5) AS BIGINT) AS cx,
                           count(*) AS c
                    FROM pts GROUP BY 1, 2),
          g AS (SELECT count(*) AS nn, CAST(sum(c) AS BIGINT) AS sc,
                       CAST(sum(c * c) AS BIGINT) AS scc
                FROM cells),
          contrib AS (
            SELECT cy + dy AS ty, cx + dx AS tx,
                   CAST(sum(c) AS BIGINT) AS s_i, count(*) AS k_i
            FROM cells,
                 (VALUES (-1), (0), (1)) o1(dy),
                 (VALUES (-1), (0), (1)) o2(dx)
            GROUP BY 1, 2)
         SELECT cy, cx, c, s_i, k_i,
                ROUND((CAST(s_i AS DOUBLE) - sc * 1.0 / nn * k_i) /
                      (sqrt(CAST(scc AS DOUBLE) / nn -
                            (sc * 1.0 / nn) * (sc * 1.0 / nn)) *
                       sqrt((CAST(nn AS DOUBLE) * k_i - CAST(k_i AS DOUBLE) * k_i)
                            / (nn - 1.0))), 6) AS gi_z
         FROM cells JOIN contrib ON cy = ty AND cx = tx
         CROSS JOIN g""",

    "q302_mann_kendall" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                                 AS y
                        FROM events GROUP BY 1, 2),
          arr AS (SELECT event_type, list(y ORDER BY day) AS ys
                  FROM daily GROUP BY event_type)
         SELECT event_type, CAST(len(ys) AS INT) AS n,
                CAST(coalesce(list_sum(list_transform(range(1, len(ys)), i ->
                  coalesce(list_sum(list_transform(range(i + 1, len(ys) + 1),
                    j -> CAST(sign(ys[CAST(j AS INT)] - ys[CAST(i AS INT)])
                           AS BIGINT))), 0))), 0) AS BIGINT) AS s,
                ROUND(CAST(coalesce(list_sum(list_transform(range(1, len(ys)), i ->
                  coalesce(list_sum(list_transform(range(i + 1, len(ys) + 1),
                    j -> CAST(sign(ys[CAST(j AS INT)] - ys[CAST(i AS INT)])
                           AS BIGINT))), 0))), 0) AS DOUBLE) /
                  (len(ys) * (len(ys) - 1) / 2.0), 6) AS tau
         FROM arr""",

    "q292_anova" ->
      """WITH g AS (SELECT c_mktsegment AS g, count(*) AS n_g,
                           sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s_g,
                           sum(CAST(c_acctbal AS DECIMAL(18,2)) *
                               CAST(c_acctbal AS DECIMAL(18,2))) AS ss_g
                    FROM customer WHERE c_acctbal IS NOT NULL GROUP BY 1),
          t AS (SELECT n_g, s_g, ss_g,
                  CAST(ROUND(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g, 6)
                    AS DECIMAL(38,6)) AS t6
                FROM g),
          a AS (SELECT count(*) AS k, CAST(sum(n_g) AS BIGINT) AS n,
                       CAST(sum(s_g) AS DOUBLE) AS s_tot,
                       CAST(sum(ss_g) AS DOUBLE) AS ss_tot,
                       CAST(sum(t6) AS DOUBLE) AS sum_t
                FROM t)
         SELECT k, n,
                ROUND(sum_t - s_tot * s_tot / n, 6) AS ss_between,
                ROUND(ss_tot - sum_t, 6) AS ss_within,
                ROUND(((sum_t - s_tot * s_tot / n) / (k - 1)) /
                      ((ss_tot - sum_t) / (n - k)), 6) AS f_stat
         FROM a""",

    "q399_kruskal_wallis" ->
      """WITH base AS (SELECT o_orderpriority AS g,
                             CAST(o_totalprice AS DECIMAL(18,6)) AS v
                      FROM orders WHERE o_totalprice IS NOT NULL),
          counts AS (SELECT v, count(*) AS t FROM base GROUP BY 1),
          rk AS (SELECT v, 2 * sum(t) OVER (ORDER BY v ROWS BETWEEN
                   UNBOUNDED PRECEDING AND CURRENT ROW) - t + 1 AS rank2
                 FROM counts),
          gv AS (SELECT g, v, count(*) AS n_gv FROM base GROUP BY 1, 2),
          rg AS (SELECT g, CAST(sum(n_gv) AS BIGINT) AS n_g,
                        sum(CAST(n_gv AS HUGEINT) * rank2) AS r2_g
                 FROM gv JOIN rk USING (v) GROUP BY 1),
          term AS (SELECT n_g,
                     CAST(round(CAST(r2_g AS DOUBLE) * CAST(r2_g AS DOUBLE) /
                       (4.0 * CAST(n_g AS DOUBLE)), 6) AS DECIMAL(38,6)) AS t6
                   FROM rg),
          a AS (SELECT count(*) AS k, CAST(sum(n_g) AS BIGINT) AS n,
                       CAST(sum(t6) AS DOUBLE) AS sum_t FROM term),
          ties AS (SELECT sum(t * t * t - t) AS ties FROM counts),
          h AS (SELECT k, n, CAST(n AS DOUBLE) AS nd, CAST(k AS DOUBLE) AS kd,
                       12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                         * sum_t - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS h,
                       1.0 - CAST(ties AS DOUBLE) /
                         (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) *
                          CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) AS c
                FROM a, ties)
         SELECT k, n, ROUND(h, 6) AS h_stat, ROUND(h / c, 6)
                  AS h_tie_corrected,
                ROUND((h - kd + 1.0) / (nd - kd), 6) AS epsilon_sq
         FROM h""",

    "q402_mcnemar" ->
      """WITH f AS (SELECT CASE WHEN n_chars >= 800 THEN 1 ELSE 0 END AS a,
                           CASE WHEN length(text) -
                             length(replace(text, ' ', '')) >= 140
                             THEN 1 ELSE 0 END AS b
                    FROM documents),
          st AS (SELECT count(*) AS n,
                   CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_both,
                   CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_a_only,
                   CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_b_only
                 FROM f)
         SELECT n, n_both, n_a_only, n_b_only,
                n - n_both - n_a_only - n_b_only AS n_neither,
                ROUND(CAST((abs(n_a_only - n_b_only) - 1) *
                           (abs(n_a_only - n_b_only) - 1) AS DOUBLE) /
                      CAST(n_a_only + n_b_only AS DOUBLE), 6) AS chi2_cc
         FROM st""",

    "q403_cochran_armitage" ->
      """WITH j AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
                           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
          g AS (SELECT w, count(*) AS n_i, CAST(sum(y) AS BIGINT) AS b_i
                FROM j GROUP BY 1),
          a AS (SELECT count(*) AS k, CAST(sum(n_i) AS BIGINT) AS n,
                       CAST(sum(b_i) AS BIGINT) AS b,
                       sum(CAST(w AS HUGEINT) * n_i) AS swn,
                       sum(CAST(w AS HUGEINT) * b_i) AS swb,
                       sum(CAST(w * w AS HUGEINT) * n_i) AS sw2n
                FROM g),
          z AS (SELECT k, n, b,
                       CAST(CAST(n AS HUGEINT) * swb - CAST(b AS HUGEINT)
                         * swn AS DOUBLE) AS num,
                       CAST(b AS DOUBLE) * CAST(n - b AS DOUBLE) *
                         CAST(CAST(n AS HUGEINT) * sw2n - swn * swn
                           AS DOUBLE) AS den
                FROM a)
         SELECT k, n, b AS n_success,
                ROUND(CAST(n AS DOUBLE) * num * num / den, 6) AS chi2_trend,
                CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0
                  END AS BIGINT) AS trend_sign
         FROM z""",

    "q404_tukey_hsd" ->
      """WITH gs AS (SELECT c_mktsegment AS g, count(*) AS n_g,
                            sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s_g,
                            sum(CAST(c_acctbal AS DECIMAL(18,2)) *
                                CAST(c_acctbal AS DECIMAL(18,2))) AS ss_g
                     FROM customer WHERE c_acctbal IS NOT NULL GROUP BY 1),
          t AS (SELECT n_g, ss_g,
                  CAST(ROUND(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) /
                    CAST(n_g AS DOUBLE), 6) AS DECIMAL(38,6)) AS t6
                FROM gs),
          mse AS (SELECT (CAST(sum(ss_g) AS DOUBLE) -
                          CAST(sum(t6) AS DOUBLE)) /
                         (CAST(sum(n_g) AS DOUBLE) -
                          CAST(count(*) AS DOUBLE)) AS mse
                  FROM t),
          m AS (SELECT g, n_g,
                       CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) AS mean
                FROM gs)
         SELECT a.g AS g1, b.g AS g2, a.n_g AS n1, b.n_g AS n2,
                ROUND(a.mean - b.mean, 6) AS mean_diff,
                ROUND(abs(a.mean - b.mean) / sqrt(mse / 2.0 *
                  (1.0 / CAST(a.n_g AS DOUBLE) +
                   1.0 / CAST(b.n_g AS DOUBLE))), 6) AS q_stat
         FROM m a JOIN m b ON a.g < b.g, mse""",

    "q405_dunn_posthoc" ->
      """WITH base AS (SELECT o_orderpriority AS g,
                             CAST(o_totalprice AS DECIMAL(18,6)) AS v
                      FROM orders WHERE o_totalprice IS NOT NULL),
          counts AS (SELECT v, count(*) AS t FROM base GROUP BY 1),
          rk AS (SELECT v, 2 * sum(t) OVER (ORDER BY v ROWS BETWEEN
                   UNBOUNDED PRECEDING AND CURRENT ROW) - t + 1 AS rank2
                 FROM counts),
          gv AS (SELECT g, v, count(*) AS n_gv FROM base GROUP BY 1, 2),
          rg AS (SELECT g, CAST(sum(n_gv) AS BIGINT) AS n_g,
                        sum(CAST(n_gv AS HUGEINT) * rank2) AS r2_g
                 FROM gv JOIN rk USING (v) GROUP BY 1),
          tot AS (SELECT CAST(sum(t) AS BIGINT) AS n,
                         sum(t * t * t - t) AS ties FROM counts),
          vr AS (SELECT CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                   / 12.0 - CAST(ties AS DOUBLE) /
                   (12.0 * (CAST(n AS DOUBLE) - 1.0)) AS var0
                 FROM tot),
          m AS (SELECT g, n_g, CAST(r2_g AS DOUBLE) /
                  (2.0 * CAST(n_g AS DOUBLE)) AS mr
                FROM rg)
         SELECT a.g AS g1, b.g AS g2, a.n_g AS n1, b.n_g AS n2,
                ROUND(a.mr, 6) AS mean_rank_1, ROUND(b.mr, 6) AS mean_rank_2,
                ROUND((a.mr - b.mr) / sqrt(var0 *
                  (1.0 / CAST(a.n_g AS DOUBLE) +
                   1.0 / CAST(b.n_g AS DOUBLE))), 6) AS z_stat
         FROM m a JOIN m b ON a.g < b.g, vr""",

    "q406_logrank" ->
      """WITH span AS (SELECT user_id, CAST(min(ts) AS DATE) AS f,
                              CAST(max(ts) AS DATE) AS l
                       FROM events GROUP BY user_id),
          cut AS (SELECT CAST(max(ts) AS DATE) - 3 AS cut FROM events),
          subj AS (SELECT date_diff('day', f, l) AS t,
                          CASE WHEN l < cut THEN 1 ELSE 0 END AS obs,
                          CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS g1
                   FROM span, cut),
          c AS (SELECT t, CAST(sum(obs) AS BIGINT) AS d,
                       CAST(sum(obs * g1) AS BIGINT) AS d1,
                       count(*) AS m, CAST(sum(g1) AS BIGINT) AS m1
                FROM subj GROUP BY t),
          k AS (SELECT t, d, d1, m, m1,
                       sum(m) OVER (ORDER BY t) - m AS left_before,
                       sum(m1) OVER (ORDER BY t) - m1 AS left1_before,
                       sum(m) OVER () AS total, sum(m1) OVER () AS total1
                FROM c),
          f AS (SELECT d, d1, total - left_before AS n_t,
                       total1 - left1_before AS n1_t
                FROM k WHERE d > 0),
          e AS (SELECT d, d1,
                       CAST(CAST(d AS DOUBLE) * CAST(n1_t AS DOUBLE) /
                         CAST(n_t AS DOUBLE) AS DECIMAL(28,12)) AS e1,
                       CASE WHEN n_t > 1 THEN
                         CAST(CAST(d AS DOUBLE) * CAST(n1_t AS DOUBLE) /
                           CAST(n_t AS DOUBLE) *
                           CAST(n_t - n1_t AS DOUBLE) / CAST(n_t AS DOUBLE) *
                           CAST(n_t - d AS DOUBLE) / CAST(n_t - 1 AS DOUBLE)
                           AS DECIMAL(28,12))
                       ELSE CAST(0.0 AS DECIMAL(28,12)) END AS vt
                FROM f),
          a AS (SELECT CAST(sum(d1) AS BIGINT) AS observed_1,
                       CAST(sum(d) AS BIGINT) AS observed_total,
                       CAST(sum(e1) AS DOUBLE) AS e1s,
                       CAST(sum(vt) AS DOUBLE) AS vs
                FROM e)
         SELECT observed_1, observed_total, ROUND(e1s, 6) AS expected_1,
                ROUND((CAST(observed_1 AS DOUBLE) - e1s) *
                      (CAST(observed_1 AS DOUBLE) - e1s) / vs, 6)
                  AS chi2_logrank
         FROM a""",

    "q407_croston" ->
      """WITH dd AS (SELECT l_partkey AS k,
                            CAST(floor(CAST(date_diff('day',
                              DATE '1970-01-01', l_shipdate) AS DOUBLE) / 7)
                              AS BIGINT) AS p,
                            CAST(l_quantity AS DECIMAL(12,2)) AS q
                     FROM lineitem),
          wk AS (SELECT k, p, CAST(sum(q) AS DOUBLE) AS d
                 FROM dd GROUP BY 1, 2),
          g AS (SELECT k, p, d,
                       p - lag(p) OVER (PARTITION BY k ORDER BY p) AS gap
                FROM wk WHERE d > 0),
          agg AS (SELECT k, count(*) AS n_events,
                         list(d ORDER BY p) AS dl,
                         list(CAST(gap AS DOUBLE) ORDER BY p)
                           FILTER (WHERE gap IS NOT NULL) AS gl
                  FROM g GROUP BY k),
          f AS (SELECT k, n_events,
                       list_reduce(dl, (acc, x) -> acc *
                         (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE)) +
                         x * CAST(0.2 AS DOUBLE)) AS z,
                       list_reduce(gl, (acc, x) -> acc *
                         (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE)) +
                         x * CAST(0.2 AS DOUBLE)) AS pi
                FROM agg WHERE n_events >= 2)
         SELECT k AS part_key, n_events, ROUND(z, 6) AS z_level,
                ROUND(pi, 6) AS p_interval, ROUND(z / pi, 6) AS croston_rate,
                ROUND((CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE) / 2.0) *
                  (z / pi), 6) AS sba_rate
         FROM f""",

    "q408_pinball_loss" ->
      s"""WITH daily AS (SELECT key, day, y FROM ($dailySql) ds),
          cut AS (SELECT max(day) - 14 AS cutd FROM daily),
          train AS (SELECT key, CAST(y AS DOUBLE) AS y
                    FROM daily, cut WHERE day <= cutd),
          test AS (SELECT key, CAST(y AS DOUBLE) AS y
                   FROM daily, cut WHERE day > cutd),
          q AS (SELECT key, quantile_cont(y, 0.1) AS q0,
                       quantile_cont(y, 0.5) AS q1,
                       quantile_cont(y, 0.9) AS q2
                FROM train GROUP BY key),
          t3 AS (SELECT * FROM (VALUES (CAST(0.1 AS DOUBLE), 0),
                                       (CAST(0.5 AS DOUBLE), 1),
                                       (CAST(0.9 AS DOUBLE), 2)) v(tau, i)),
          ex AS (SELECT te.key, te.y, t3.tau,
                        CASE t3.i WHEN 0 THEN q.q0 WHEN 1 THEN q.q1
                          ELSE q.q2 END AS q
                 FROM test te JOIN q USING (key), t3),
          l AS (SELECT key, tau, q,
                       CAST(greatest(tau * (y - q), (tau - 1.0) * (y - q))
                         AS DECIMAL(28,12)) AS lt
                FROM ex)
         SELECT key, tau, count(*) AS n_test, ROUND(max(q), 6) AS q_forecast,
                ROUND(CAST(sum(lt) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                  AS pinball_loss
         FROM l GROUP BY key, tau""",

    "q409_intermittency_class" ->
      """WITH dd AS (SELECT l_partkey AS k,
                            CAST(floor(CAST(date_diff('day',
                              DATE '1970-01-01', l_shipdate) AS DOUBLE) / 7)
                              AS BIGINT) AS p,
                            CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100
                              AS BIGINT) AS qc
                     FROM lineitem),
          wk AS (SELECT k, p, CAST(sum(qc) AS BIGINT) AS q
                 FROM dd GROUP BY 1, 2),
          st AS (SELECT k, count(*) AS n_events, min(p) AS minp,
                        max(p) AS maxp, sum(CAST(q AS HUGEINT)) AS sd,
                        sum(CAST(q AS HUGEINT) * q) AS sdd
                 FROM wk WHERE q > 0 GROUP BY k),
          f AS (SELECT *, CAST(n_events AS HUGEINT) * sdd - sd * sd AS varnum
                FROM st WHERE n_events >= 2)
         SELECT k AS part_key, n_events,
                ROUND(CAST(maxp - minp AS DOUBLE) /
                      CAST(n_events - 1 AS DOUBLE), 6) AS adi,
                ROUND(CAST(varnum AS DOUBLE) /
                      CAST(sd * sd AS DOUBLE), 6) AS cv2,
                CASE WHEN (maxp - minp) * 100 >= 132 * (n_events - 1)
                      AND CAST(100 AS HUGEINT) * varnum >=
                          CAST(49 AS HUGEINT) * (sd * sd) THEN 'lumpy'
                     WHEN (maxp - minp) * 100 >= 132 * (n_events - 1)
                       THEN 'intermittent'
                     WHEN CAST(100 AS HUGEINT) * varnum >=
                          CAST(49 AS HUGEINT) * (sd * sd) THEN 'erratic'
                     ELSE 'smooth' END AS pattern
         FROM f""",

    "q412_price_elasticity" ->
      """WITH li AS (SELECT p_brand AS brand,
                   CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE)
                     AS ep,
                   CAST(CAST(l_discount AS DECIMAL(12,2)) AS DOUBLE) AS disc,
                   CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS qty
                     FROM lineitem JOIN part ON l_partkey = p_partkey),
          xy AS (SELECT brand,
                   CAST(CAST(ln(ep * (1.0 - disc) / qty) AS DECIMAL(18,12))
                     AS DOUBLE) AS x,
                   CAST(CAST(ln(qty) AS DECIMAL(18,12)) AS DOUBLE) AS y
                 FROM li),
          st AS (SELECT brand, CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(CAST(round(x * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
                     AS sx,
                   CAST(sum(CAST(round(y * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
                     AS sy,
                   CAST(sum(CAST(round(x * y * 1e9) AS BIGINT)) AS DOUBLE)
                     AS sxyq,
                   CAST(sum(CAST(round(x * x * 1e9) AS BIGINT)) AS DOUBLE)
                     AS sxxq,
                   CAST(sum(CAST(round(y * y * 1e9) AS BIGINT)) AS DOUBLE)
                     AS syyq
                 FROM xy GROUP BY 1)
         SELECT brand, CAST(n AS BIGINT) AS n,
                ROUND((n * (sxyq / 1e9) - sx * sy) /
                      (n * (sxxq / 1e9) - sx * sx), 6) AS elasticity,
                ROUND((n * (sxyq / 1e9) - sx * sy) *
                      (n * (sxyq / 1e9) - sx * sy) /
                      ((n * (sxxq / 1e9) - sx * sx) *
                       (n * (syyq / 1e9) - sy * sy)), 6) AS r2
         FROM st""",

    "q413_max_drawdown" ->
      s"""WITH daily AS (SELECT key, day, y FROM ($dailySql) ds),
          t AS (SELECT key, day,
                       sum(y) OVER (PARTITION BY key ORDER BY day ROWS
                         BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS level
                FROM daily),
          ddt AS (SELECT key,
                         max(level) OVER (PARTITION BY key ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
                           ROW) - level AS dd
                  FROM t)
         SELECT key, count(*) AS n_days,
                ROUND(CAST(max(dd) AS DOUBLE), 6) AS max_drawdown,
                CAST(sum(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS days_in_drawdown
         FROM ddt GROUP BY key""",

    "q414_rsi" ->
      s"""WITH daily AS (SELECT key, day, y FROM ($dailySql) ds),
          df AS (SELECT key, day,
                        y - lag(y) OVER (PARTITION BY key ORDER BY day)
                          AS diff
                 FROM daily),
          d2 AS (SELECT * FROM df WHERE diff IS NOT NULL),
          gl AS (SELECT key, day, count(*) OVER w AS nw,
                        sum(CASE WHEN diff > 0 THEN diff
                          ELSE CAST(0 AS DECIMAL(18,2)) END) OVER w AS g,
                        sum(CASE WHEN diff < 0 THEN -diff
                          ELSE CAST(0 AS DECIMAL(18,2)) END) OVER w AS l
                 FROM d2
                 WINDOW w AS (PARTITION BY key ORDER BY day ROWS BETWEEN
                   13 PRECEDING AND CURRENT ROW))
         SELECT key, CAST(day AS VARCHAR) AS day,
                ROUND(CASE WHEN l = 0 THEN 100.0
                           ELSE 100.0 - 100.0 / (1.0 + CAST(g AS DOUBLE) /
                             CAST(l AS DOUBLE)) END, 6) AS rsi14
         FROM gl WHERE nw = 14""",

    "q415_bollinger_breakouts" ->
      s"""WITH daily AS (SELECT key, day, CAST(y AS DECIMAL(18,2)) AS y
                         FROM ($dailySql) ds),
          b AS (SELECT key, day, y, count(*) OVER w AS nw,
                       sum(y) OVER w AS sx,
                       sum(CAST(y * y AS DECIMAL(38,4))) OVER w AS sxx
                FROM daily
                WINDOW w AS (PARTITION BY key ORDER BY day ROWS BETWEEN
                  19 PRECEDING AND CURRENT ROW)),
          f AS (SELECT key, day, y,
                       CAST(sx AS DOUBLE) / 20.0 AS mean,
                       sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
                         CAST(sx AS DOUBLE) / 20.0) / 19.0) AS sd
                FROM b WHERE nw = 20)
         SELECT key, CAST(day AS VARCHAR) AS day, ROUND(mean, 6) AS mid,
                ROUND(mean + 2.0 * sd, 6) AS upper,
                ROUND(mean - 2.0 * sd, 6) AS lower,
                CAST(CASE WHEN CAST(y AS DOUBLE) > mean + 2.0 * sd THEN 1
                          WHEN CAST(y AS DOUBLE) < mean - 2.0 * sd THEN -1
                          ELSE 0 END AS BIGINT) AS breakout
         FROM f""",

    "q416_segmented_trend" ->
      """WITH daily AS (SELECT event_type AS k, CAST(ts AS DATE) AS day,
                          CAST(sum(CAST(value AS DECIMAL(18,2))) * 100
                            AS BIGINT) AS y
                        FROM events GROUP BY 1, 2),
          b AS (SELECT k, day,
                       CAST(date_diff('day', DATE '1970-01-01', day)
                         AS BIGINT) AS x, y
                FROM daily),
          pre AS (SELECT k, day, count(*) OVER wp AS nl,
                         sum(CAST(x AS HUGEINT)) OVER wp AS sxl,
                         sum(CAST(y AS HUGEINT)) OVER wp AS syl,
                         sum(CAST(x AS HUGEINT) * y) OVER wp AS sxyl,
                         sum(CAST(x AS HUGEINT) * x) OVER wp AS sxxl,
                         sum(CAST(y AS HUGEINT) * y) OVER wp AS syyl,
                         count(*) OVER wa AS nt,
                         sum(CAST(x AS HUGEINT)) OVER wa AS sxt,
                         sum(CAST(y AS HUGEINT)) OVER wa AS syt,
                         sum(CAST(x AS HUGEINT) * y) OVER wa AS sxyt,
                         sum(CAST(x AS HUGEINT) * x) OVER wa AS sxxt,
                         sum(CAST(y AS HUGEINT) * y) OVER wa AS syyt
                  FROM b
                  WINDOW wp AS (PARTITION BY k ORDER BY day ROWS BETWEEN
                    UNBOUNDED PRECEDING AND CURRENT ROW),
                         wa AS (PARTITION BY k)),
          cand AS (SELECT * FROM pre WHERE nl >= 2 AND nt - nl >= 2),
          cm AS (SELECT k, day, nl, nt,
                   CAST(sxyl AS DOUBLE) - CAST(sxl AS DOUBLE) *
                     CAST(syl AS DOUBLE) / CAST(nl AS DOUBLE) AS sxycl,
                   CAST(sxxl AS DOUBLE) - CAST(sxl AS DOUBLE) *
                     CAST(sxl AS DOUBLE) / CAST(nl AS DOUBLE) AS sxxcl,
                   CAST(syyl AS DOUBLE) - CAST(syl AS DOUBLE) *
                     CAST(syl AS DOUBLE) / CAST(nl AS DOUBLE) AS syycl,
                   CAST(sxyt - sxyl AS DOUBLE) - CAST(sxt - sxl AS DOUBLE) *
                     CAST(syt - syl AS DOUBLE) / CAST(nt - nl AS DOUBLE)
                     AS sxycr,
                   CAST(sxxt - sxxl AS DOUBLE) - CAST(sxt - sxl AS DOUBLE) *
                     CAST(sxt - sxl AS DOUBLE) / CAST(nt - nl AS DOUBLE)
                     AS sxxcr,
                   CAST(syyt - syyl AS DOUBLE) - CAST(syt - syl AS DOUBLE) *
                     CAST(syt - syl AS DOUBLE) / CAST(nt - nl AS DOUBLE)
                     AS syycr
                 FROM cand),
          sc AS (SELECT k, day, nl, nt, sxycl / sxxcl AS slope_l,
                        sxycr / sxxcr AS slope_r,
                        (syycl - sxycl * sxycl / sxxcl) +
                        (syycr - sxycr * sxycr / sxxcr) AS sse_tot
                 FROM cm),
          r AS (SELECT *, row_number() OVER (PARTITION BY k
                  ORDER BY sse_tot, day) AS rn FROM sc)
         SELECT k AS key, CAST(day AS VARCHAR) AS split_day, nl AS n_left,
                CAST(nt - nl AS BIGINT) AS n_right,
                ROUND(slope_l / 100.0, 6) AS slope_left,
                ROUND(slope_r / 100.0, 6) AS slope_right,
                ROUND(sse_tot / 1e4, 6) AS sse_total
         FROM r WHERE rn = 1""",

    "q418_best_gini_split" ->
      """WITH base AS (SELECT CAST(l_extendedprice AS DECIMAL(18,6)) AS v,
                             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
                               AS pos
                      FROM lineitem WHERE l_extendedprice IS NOT NULL),
          counts AS (SELECT v, count(*) AS cnt,
                            CAST(sum(pos) AS BIGINT) AS pos
                     FROM base GROUP BY 1),
          cum AS (SELECT v, sum(cnt) OVER w AS nl, sum(pos) OVER w AS pl
                  FROM counts
                  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW)),
          tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
                         CAST(sum(pos) AS BIGINT) AS p FROM counts),
          cand AS (SELECT v, CAST(nl AS BIGINT) AS nl,
                          CAST(pl AS BIGINT) AS pl,
                          CAST(n - nl AS BIGINT) AS nr,
                          CAST(p - pl AS BIGINT) AS pr, n
                   FROM cum, tot WHERE nl < n),
          sc AS (SELECT *,
                   CAST(CAST(pl AS HUGEINT) * pl +
                     CAST(nl - pl AS HUGEINT) * (nl - pl) AS DOUBLE) /
                     CAST(nl AS DOUBLE) +
                   CAST(CAST(pr AS HUGEINT) * pr +
                     CAST(nr - pr AS HUGEINT) * (nr - pr) AS DOUBLE) /
                     CAST(nr AS DOUBLE) AS score
                 FROM cand)
         SELECT ROUND(CAST(v AS DOUBLE), 6) AS threshold, nl AS n_left,
                pl AS pos_left, nr AS n_right, pr AS pos_right,
                ROUND(1.0 - score / CAST(n AS DOUBLE), 6) AS weighted_gini
         FROM sc ORDER BY score DESC, v LIMIT 1""",

    "q445_biweight_location" ->
      """WITH base AS (SELECT event_type AS key,
                         CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS x
                       FROM events WHERE value IS NOT NULL),
          med AS (SELECT key, quantile_cont(x, 0.5) AS m0, count(*) AS n
                  FROM base GROUP BY 1),
          mad AS (SELECT b.key, quantile_cont(abs(b.x - m.m0), 0.5) AS mad
                  FROM base b JOIN med m USING (key) GROUP BY 1),
          p AS (SELECT med.key, med.m0, med.n, mad.mad
                FROM med JOIN mad USING (key)),
          t1 AS (SELECT b.key, p.n, p.mad, p.m0, b.x,
                        (b.x - p.m0) / (6.0 * p.mad) AS u
                 FROM base b JOIN p ON b.key = p.key),
          t1w AS (SELECT *, CASE WHEN abs(u) < 1.0
                    THEN (1.0 - u * u) * (1.0 - u * u) ELSE 0.0 END AS w
                  FROM t1),
          r1 AS (SELECT key, n, mad, m0,
                   (CAST(sum(CAST(round(w * x * 1e6) AS BIGINT))
                     AS DOUBLE) / 1e6) /
                   (CAST(sum(CAST(round(w * 1e9) AS BIGINT)) AS DOUBLE)
                     / 1e9) AS m1
                 FROM t1w GROUP BY 1, 2, 3, 4),
          t2 AS (SELECT b.key, r.n, r.m0, r.m1, b.x,
                        (b.x - r.m1) / (6.0 * r.mad) AS u
                 FROM base b JOIN r1 r ON b.key = r.key),
          t2w AS (SELECT *, CASE WHEN abs(u) < 1.0
                    THEN (1.0 - u * u) * (1.0 - u * u) ELSE 0.0 END AS w
                  FROM t2),
          r2 AS (SELECT key, n, m0, m1,
                   (CAST(sum(CAST(round(w * x * 1e6) AS BIGINT))
                     AS DOUBLE) / 1e6) /
                   (CAST(sum(CAST(round(w * 1e9) AS BIGINT)) AS DOUBLE)
                     / 1e9) AS m2
                 FROM t2w GROUP BY 1, 2, 3, 4)
         SELECT key, n, ROUND(m0, 6) AS median0,
                ROUND(m2, 6) AS biweight_location
         FROM r2""",

    "q446_knee_point" ->
      """WITH spend AS (SELECT c_nationkey AS nat, c_custkey,
                          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                            * 100 AS BIGINT) AS cents
                        FROM orders JOIN customer ON o_custkey = c_custkey
                        GROUP BY 1, 2),
          curve AS (SELECT nat,
                      CAST(row_number() OVER w AS BIGINT) AS i,
                      sum(cents) OVER wc AS cum,
                      count(*) OVER wa AS n,
                      sum(cents) OVER wa AS tot
                    FROM spend
                    WINDOW w AS (PARTITION BY nat ORDER BY cents DESC,
                        c_custkey),
                      wc AS (PARTITION BY nat ORDER BY cents DESC,
                        c_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND
                        CURRENT ROW),
                      wa AS (PARTITION BY nat)),
          g AS (SELECT nat, i, n, tot,
                       CAST(cum AS HUGEINT) * n - CAST(i AS HUGEINT) * tot
                         AS gap
                FROM curve),
          mx AS (SELECT nat, max(gap) AS mg FROM g GROUP BY 1)
         SELECT g.nat AS c_nationkey, CAST(max(g.n) AS BIGINT)
                  AS n_customers,
                CAST(min(g.i) AS BIGINT) AS knee_i,
                ROUND(CAST(min(g.i) AS DOUBLE) / CAST(max(g.n) AS DOUBLE),
                  6) AS knee_x,
                ROUND(CAST(max(g.gap) AS DOUBLE) /
                  (CAST(max(g.n) AS DOUBLE) * CAST(max(g.tot) AS DOUBLE)),
                  6) AS max_gap
         FROM g JOIN mx ON g.nat = mx.nat AND g.gap = mx.mg
         GROUP BY g.nat""",

    "q442_grubbs" ->
      """WITH base AS (SELECT c_mktsegment AS g,
                         CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE)
                           AS x
                       FROM customer),
          st AS (SELECT g, count(*) AS n,
                        sum(CAST(x AS DECIMAL(18,2))) AS sx,
                        sum(CAST(CAST(x AS DECIMAL(18,2)) *
                          CAST(x AS DECIMAL(18,2)) AS DECIMAL(38,4)))
                          AS sxx
                 FROM base GROUP BY 1),
          stt AS (SELECT g, n,
                    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
                    sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
                      (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                      AS sd
                  FROM st),
          dev AS (SELECT b.g, b.x, s.n, s.sd, abs(b.x - s.mean) AS dev
                  FROM base b JOIN stt s USING (g)),
          mx AS (SELECT g, max(dev) AS mdev FROM dev GROUP BY 1)
         SELECT d.g AS c_mktsegment, max(d.n) AS n,
                ROUND(min(d.x), 6) AS outlier_value,
                ROUND(max(d.mdev2) / max(d.sd), 6) AS g_stat
         FROM (SELECT dev.*, mx.mdev AS mdev2 FROM dev
               JOIN mx ON dev.g = mx.g AND dev.dev = mx.mdev) d
         GROUP BY d.g""",

    "q443_runs_test" ->
      s"""WITH daily AS (SELECT key, day, CAST(y AS DOUBLE) AS y
                         FROM ($dailySql) ds),
          med AS (SELECT key, quantile_cont(y, 0.5) AS med
                  FROM daily GROUP BY 1),
          lab AS (SELECT d.key, d.day,
                         CASE WHEN d.y > m.med THEN 1 ELSE 0 END AS ab
                  FROM daily d JOIN med m USING (key)
                  WHERE d.y <> m.med),
          runs AS (SELECT key, ab,
                     CASE WHEN lag(ab) OVER w IS NULL
                       OR ab <> lag(ab) OVER w THEN 1 ELSE 0 END AS chg
                   FROM lab
                   WINDOW w AS (PARTITION BY key ORDER BY day)),
          agg AS (SELECT key,
                    CAST(sum(CASE WHEN ab = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n1,
                    CAST(sum(CASE WHEN ab = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n2,
                    CAST(sum(chg) AS BIGINT) AS n_runs
                  FROM runs GROUP BY 1)
         SELECT key, n1, n2, n_runs,
                ROUND((CAST(n_runs AS DOUBLE) -
                  (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) /
                   CAST(n1 + n2 AS DOUBLE) + 1.0)) /
                  sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) *
                    (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) -
                     CAST(n1 + n2 AS DOUBLE)) /
                    (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE) *
                     (CAST(n1 + n2 AS DOUBLE) - 1.0))), 6) AS z
         FROM agg""",

    "q444_ljung_box" ->
      s"""WITH s AS ($dailySql),
          l AS (SELECT key, y AS x,
                       lag(y, 1) OVER w AS x1, lag(y, 2) OVER w AS x2,
                       lag(y, 3) OVER w AS x3
                FROM s WINDOW w AS (PARTITION BY key ORDER BY day)),
          e AS (SELECT key, 1 AS lag, x, x1 AS xl FROM l
                UNION ALL SELECT key, 2, x, x2 FROM l
                UNION ALL SELECT key, 3, x, x3 FROM l),
          a AS (SELECT key, lag, count(*) AS n,
                       CAST(sum(x) AS DOUBLE) AS sx,
                       CAST(sum(x * x) AS DOUBLE) AS sxx,
                       count(xl) AS np,
                       CAST(sum(CASE WHEN xl IS NOT NULL THEN x * xl END)
                         AS DOUBLE) AS sxy,
                       CAST(sum(CASE WHEN xl IS NOT NULL THEN x END)
                         AS DOUBLE) AS sh,
                       CAST(sum(xl) AS DOUBLE) AS st
                FROM e GROUP BY 1, 2),
          r AS (SELECT key, lag,
                       ROUND((sxy - (sx / CAST(n AS DOUBLE)) * (sh + st)
                              + CAST(np AS DOUBLE) *
                                (sx / CAST(n AS DOUBLE)) *
                                (sx / CAST(n AS DOUBLE)))
                         / (sxx - sx * sx / CAST(n AS DOUBLE)), 6) AS acf
                FROM a),
          lens AS (SELECT key, count(*) AS n FROM s GROUP BY 1),
          t AS (SELECT r.key, lens.n,
                       CAST((acf * acf) / CAST(n - lag AS DOUBLE)
                         AS DECIMAL(28,18)) AS term
                FROM r JOIN lens USING (key))
         SELECT key, n,
                ROUND(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) *
                  CAST(sum(term) AS DOUBLE), 6) AS q_lb
         FROM t GROUP BY key, n""",

    "q440_sprt" ->
      s"""WITH li AS (SELECT p_brand AS g,
                        CAST(l_shipdate AS VARCHAR) || '#' ||
                          lpad(CAST(l_orderkey * 8 + l_linenumber
                            AS VARCHAR), 12, '0') AS ord,
                        CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
                          AS y
                      FROM lineitem JOIN part ON l_partkey = p_partkey),
          walk AS (SELECT g,
                     CAST(row_number() OVER wo AS BIGINT) AS t,
                     CAST(sum(y) OVER wk AS BIGINT) AS k
                   FROM li
                   WINDOW wo AS (PARTITION BY g ORDER BY ord, y),
                          wk AS (PARTITION BY g ORDER BY ord, y ROWS
                            BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          lw AS (SELECT g, t, k,
                        CAST(k AS DOUBLE) * CAST($SprtLc1 AS DOUBLE) +
                        CAST(t - k AS DOUBLE) * CAST($SprtLc0 AS DOUBLE)
                          AS llr
                 FROM walk),
          fin AS (SELECT g, max(t) AS t_max,
                         max_by(llr, t) AS llr_final
                  FROM lw GROUP BY 1),
          dec AS (SELECT g, min(t) AS t_dec, min_by(llr, t) AS llr_dec
                  FROM lw
                  WHERE llr >= CAST($SprtBound AS DOUBLE)
                     OR llr <= -CAST($SprtBound AS DOUBLE)
                  GROUP BY 1)
         SELECT f.g AS p_brand, f.t_max AS n_stream,
                coalesce(d.t_dec, f.t_max) AS n_at_decision,
                ROUND(coalesce(d.llr_dec, f.llr_final), 6)
                  AS llr_at_decision,
                CASE WHEN d.t_dec IS NULL THEN 'undecided'
                     WHEN d.llr_dec >= CAST($SprtBound AS DOUBLE)
                       THEN 'accept_h1'
                     ELSE 'accept_h0' END AS decision
         FROM fin f LEFT JOIN dec d ON f.g = d.g""",

    "q441_rbo" ->
      s"""WITH st AS (SELECT p_brand, l_partkey,
                        CAST(sum(CAST(CAST(l_extendedprice
                          AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)
                          AS rev,
                        CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
                          AS BIGINT) AS qty
                      FROM lineitem JOIN part ON l_partkey = p_partkey
                      GROUP BY 1, 2),
          rk AS (SELECT p_brand, l_partkey,
                   row_number() OVER (PARTITION BY p_brand
                     ORDER BY rev DESC, l_partkey) AS ra,
                   row_number() OVER (PARTITION BY p_brand
                     ORDER BY qty DESC, l_partkey) AS rb
                 FROM st),
          rr AS (SELECT * FROM rk WHERE ra <= 10 OR rb <= 10),
          wt AS (SELECT * FROM (VALUES ${RboW.zipWithIndex.map {
            case (w, i) => s"(${i + 1}, CAST($w AS DOUBLE))"
          }.mkString(", ")}) w(d, wt)),
          ov AS (SELECT p_brand, d, wt, count(*) AS ov
                 FROM rr, wt WHERE ra <= d AND rb <= d GROUP BY 1, 2, 3)
         SELECT p_brand,
                ROUND(CAST(sum(CAST(wt * (CAST(ov AS DOUBLE) /
                  CAST(d AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE), 6)
                  AS rbo
         FROM ov GROUP BY 1""",

    "q437_effect_sizes" ->
      """WITH src AS (SELECT c_mktsegment AS g, o_totalprice AS v
                      FROM orders JOIN customer ON o_custkey = c_custkey
                      WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
          lab AS (SELECT CAST(v AS DECIMAL(18,6)) AS v,
                         CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END AS is1
                  FROM src WHERE v IS NOT NULL),
          c AS (SELECT v, count(*) AS t, sum(is1) AS t1
                FROM lab GROUP BY v),
          cc AS (SELECT v, t, t1, sum(t) OVER (ORDER BY v) AS cum_t
                 FROM c),
          s AS (SELECT CAST(sum(t1 * (2 * cum_t - t + 1)) AS DOUBLE)
                    AS r2x,
                       CAST(sum(t1) AS BIGINT) AS n1,
                       CAST(sum(t) AS BIGINT) AS n
                FROM cc),
          u AS (SELECT n1, n - n1 AS n2,
                       ROUND(r2x / 2.0 - CAST(n1 AS DOUBLE) *
                         (CAST(n1 AS DOUBLE) + 1.0) / 2.0, 6) AS u1
                FROM s),
          st AS (SELECT g, count(*) AS m,
                        sum(CAST(v AS DECIMAL(18,2))) AS sv,
                        sum(CAST(CAST(v AS DECIMAL(18,2)) *
                          CAST(v AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS ss
                 FROM src GROUP BY 1),
          two AS (SELECT
                    max(CASE WHEN g = 'BUILDING' THEN m END) AS m1,
                    max(CASE WHEN g = 'BUILDING' THEN sv END) AS s1,
                    max(CASE WHEN g = 'BUILDING' THEN ss END) AS ss1,
                    max(CASE WHEN g = 'AUTOMOBILE' THEN m END) AS m2,
                    max(CASE WHEN g = 'AUTOMOBILE' THEN sv END) AS s2,
                    max(CASE WHEN g = 'AUTOMOBILE' THEN ss END) AS ss2
                  FROM st),
          f AS (SELECT
                  CAST(s1 AS DOUBLE) / CAST(m1 AS DOUBLE) AS mean1,
                  CAST(s2 AS DOUBLE) / CAST(m2 AS DOUBLE) AS mean2,
                  CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) *
                    CAST(s1 AS DOUBLE) / CAST(m1 AS DOUBLE) AS ssd1,
                  CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) *
                    CAST(s2 AS DOUBLE) / CAST(m2 AS DOUBLE) AS ssd2,
                  CAST(m1 AS DOUBLE) AS m1d, CAST(m2 AS DOUBLE) AS m2d
                FROM two),
          e AS (SELECT (mean1 - mean2) /
                  sqrt((ssd1 + ssd2) / (m1d + m2d - 2.0)) AS d,
                       m1d, m2d
                FROM f)
         SELECT n1, n2, ROUND(d, 6) AS cohens_d,
                ROUND(d * (1.0 - 3.0 / (4.0 * (m1d + m2d) - 9.0)), 6)
                  AS hedges_g,
                ROUND(2.0 * u1 / (CAST(n1 AS DOUBLE) *
                  CAST(n2 AS DOUBLE)) - 1.0, 6) AS cliffs_delta
         FROM e, u""",

    "q434_gumbel_maxima" ->
      s"""WITH daily AS (SELECT key, day, y FROM ($dailySql) ds),
          wk AS (SELECT key, CAST(date_trunc('week', day) AS DATE) AS wk,
                        max(CAST(y AS DECIMAL(18,2))) AS mx
                 FROM daily GROUP BY 1, 2),
          st AS (SELECT key, count(*) AS n, sum(mx) AS sx,
                        sum(CAST(mx * mx AS DECIMAL(38,4))) AS sxx
                 FROM wk GROUP BY 1),
          f AS (SELECT key, n,
                       CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
                       sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                         CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
                         (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                         AS sd
                FROM st),
          g AS (SELECT key, n, mean,
                       sd * CAST($Sqrt6OverPi AS DOUBLE) AS sigma FROM f),
          h AS (SELECT key, n,
                       mean - CAST($EulerGamma AS DOUBLE) * sigma AS mu,
                       sigma FROM g)
         SELECT key, n AS n_blocks, ROUND(mu, 6) AS gumbel_mu,
                ROUND(sigma, 6) AS gumbel_sigma,
                ROUND(mu - sigma * CAST($GumbelK12 AS DOUBLE), 6)
                  AS return_level_12
         FROM h""",

    "q435_hill_tail_index" ->
      """WITH li AS (SELECT l_returnflag AS grp,
                            CAST(l_extendedprice AS DECIMAL(12,2)) AS v,
                            l_orderkey * 8 + l_linenumber AS uid
                     FROM lineitem),
          top AS (SELECT *, row_number() OVER (PARTITION BY grp
                    ORDER BY v DESC, uid) AS rn FROM li),
          cut AS (SELECT grp, v AS vk1 FROM top WHERE rn = 101),
          lr AS (SELECT t.grp,
                        CAST(ln(CAST(t.v AS DOUBLE) /
                          CAST(c.vk1 AS DOUBLE)) AS DECIMAL(18,12)) AS lr
                 FROM top t JOIN cut c USING (grp) WHERE t.rn <= 100)
         SELECT grp, count(*) AS k,
                ROUND(CAST(sum(lr) AS DOUBLE) / 100.0, 6) AS hill_xi,
                ROUND(1.0 / (CAST(sum(lr) AS DOUBLE) / 100.0), 6)
                  AS tail_alpha
         FROM lr GROUP BY grp""",

    "q430_anderson_darling" ->
      """WITH lab AS (SELECT CAST(o_totalprice AS DECIMAL(18,6)) AS v,
                             CASE WHEN c_mktsegment = 'BUILDING' THEN 1
                               ELSE 0 END AS is1
                      FROM orders JOIN customer ON o_custkey = c_custkey
                      WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
                        AND o_totalprice IS NOT NULL),
          counts AS (SELECT v, count(*) AS l,
                            CAST(sum(is1) AS BIGINT) AS l1
                     FROM lab GROUP BY 1),
          cum AS (SELECT v, sum(l) OVER w AS cum_l,
                         sum(l1) OVER w AS cum_l1
                  FROM counts
                  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW)),
          tot AS (SELECT CAST(sum(l) AS BIGINT) AS n,
                         CAST(sum(l1) AS BIGINT) AS n1 FROM counts),
          t AS (SELECT l, n, n1,
                       CAST(n AS HUGEINT) * (2 * cum_l1 - l1) -
                         CAST(n1 AS HUGEINT) * (2 * cum_l - l) AS num2,
                       CAST(2 * cum_l - l AS HUGEINT) *
                         (2 * n - 2 * cum_l + l) -
                         CAST(n AS HUGEINT) * l AS d4
                FROM counts JOIN cum USING (v), tot),
          q AS (SELECT n, n1,
                       CAST(round(CAST(l AS DOUBLE) *
                         (CAST(num2 AS DOUBLE) * CAST(num2 AS DOUBLE)) /
                         CAST(d4 AS DOUBLE) * 1e9) AS BIGINT) AS term
                FROM t),
          inr AS (SELECT CAST(max(n) AS BIGINT) AS n,
                         CAST(max(n1) AS BIGINT) AS n1,
                         CAST(sum(term) AS DOUBLE) / 1e9 AS innersum
                  FROM q)
         SELECT n1, n - n1 AS n2,
                ROUND((CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE) *
                  innersum * (1.0 / CAST(n1 AS DOUBLE) +
                    1.0 / CAST(n - n1 AS DOUBLE)) / CAST(n AS DOUBLE), 6)
                  AS a2_stat
         FROM inr""",

    "q431_trajectory_stats" ->
      """WITH pts AS (SELECT user_id,
                       CAST(floor(epoch(ts)) AS BIGINT) * 1000000 +
                         event_id % 1000000 AS ord,
                       CAST(CAST(('0x' || substr(md5('tlat:' ||
                           CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
                         % 1000000 AS DOUBLE) / 1000000.0 * 5.0 + 40.0
                         AS lat,
                       CAST(CAST(('0x' || substr(md5('tlon:' ||
                           CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
                         % 1000000 AS DOUBLE) / 1000000.0 * 5.0 AS lon
                     FROM events),
          st AS (SELECT user_id, ord, lat, lon,
                        lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
                 FROM pts
                 WINDOW w AS (PARTITION BY user_id ORDER BY ord)),
          sd AS (SELECT user_id, ord, lat, lon,
                        CASE WHEN plat IS NOT NULL THEN
                          CAST(2 * 6371 * asin(sqrt(
                            sin(radians(lat - plat) / 2) *
                              sin(radians(lat - plat) / 2)
                            + cos(radians(plat)) * cos(radians(lat)) *
                              (sin(radians(lon - plon) / 2) *
                               sin(radians(lon - plon) / 2))))
                            AS DECIMAL(18,12))
                        END AS step
                 FROM st),
          ag AS (SELECT user_id, count(*) AS n_points, sum(step) AS path,
                        min_by(lat, ord) AS lat0, min_by(lon, ord) AS lon0,
                        max_by(lat, ord) AS lat1, max_by(lon, ord) AS lon1
                 FROM sd GROUP BY 1),
          fin AS (SELECT user_id, n_points, path,
                         CAST(CAST(2 * 6371 * asin(sqrt(
                           sin(radians(lat1 - lat0) / 2) *
                             sin(radians(lat1 - lat0) / 2)
                           + cos(radians(lat0)) * cos(radians(lat1)) *
                             (sin(radians(lon1 - lon0) / 2) *
                              sin(radians(lon1 - lon0) / 2))))
                           AS DECIMAL(18,12)) AS DOUBLE) AS disp
                  FROM ag WHERE n_points >= 2)
         SELECT user_id, n_points, ROUND(CAST(path AS DOUBLE), 6)
                  AS path_km,
                ROUND(disp, 6) AS disp_km,
                ROUND(disp / CAST(path AS DOUBLE), 6) AS straightness
         FROM fin""",

    "q426_gini_tree_depth2" ->
      s"""WITH base0 AS (SELECT CAST(l_extendedprice AS DECIMAL(18,6)) AS v,
                           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
                             AS pos
                         FROM lineitem WHERE l_extendedprice IS NOT NULL),
          ${giniPickSql("root", "")},
          ${giniPickSql("left",
            "WHERE CAST(v AS DOUBLE) <= (SELECT threshold FROM pick_root)")},
          ${giniPickSql("right",
            "WHERE CAST(v AS DOUBLE) > (SELECT threshold FROM pick_root)")}
         SELECT * FROM pick_root
         UNION ALL SELECT * FROM pick_left
         UNION ALL SELECT * FROM pick_right""",

    "q447_ipw_ate" ->
      s"""WITH full_ AS (SELECT CAST(CAST(l_quantity AS DECIMAL(12,2))
                           AS DOUBLE) / 10.0 AS x,
                         CAST(CASE WHEN CAST(l_discount AS DECIMAL(12,2))
                           >= 0.05 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS t,
                         CAST(CASE WHEN l_returnflag = 'R' THEN 1.0
                           ELSE 0.0 END AS DOUBLE) AS yy
                        FROM lineitem),
          rows_ AS (SELECT x, t AS y FROM full_),
          it0 AS (SELECT CAST(0.0 AS DOUBLE) AS b0,
                         CAST(0.0 AS DOUBLE) AS b1),
          ${newtonIter(1)},
          ${newtonIter(2)},
          ${newtonIter(3)},
          fitc AS (SELECT ROUND(b0, 6) AS b0, ROUND(b1, 6) AS b1
                   FROM it3),
          sc AS (SELECT f.x, f.t, f.yy, c.b0, c.b1,
                        CAST(CAST(1.0 / (1.0 + exp(-(c.b0 + c.b1 * f.x)))
                          AS DECIMAL(18,12)) AS DOUBLE) AS p
                 FROM full_ f, fitc c),
          st AS (SELECT count(*) AS n, max(b0) AS b0, max(b1) AS b1,
                   CAST(sum(CAST(round(t * yy / p * 1e6) AS BIGINT))
                     AS DOUBLE) / 1e6 AS s1y,
                   CAST(sum(CAST(round(t / p * 1e6) AS BIGINT))
                     AS DOUBLE) / 1e6 AS s1,
                   CAST(sum(CAST(round((1.0 - t) * yy / (1.0 - p) * 1e6)
                     AS BIGINT)) AS DOUBLE) / 1e6 AS s0y,
                   CAST(sum(CAST(round((1.0 - t) / (1.0 - p) * 1e6)
                     AS BIGINT)) AS DOUBLE) / 1e6 AS s0,
                   CAST(sum(CASE WHEN t = 1.0 AND yy = 1.0 THEN 1 ELSE 0
                     END) AS BIGINT) AS ty,
                   CAST(sum(CASE WHEN t = 1.0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS tn,
                   CAST(sum(CASE WHEN t = 0.0 AND yy = 1.0 THEN 1 ELSE 0
                     END) AS BIGINT) AS cy,
                   CAST(sum(CASE WHEN t = 0.0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS cn
                 FROM sc)
         SELECT n, b0, b1,
                ROUND(s1y / s1 - s0y / s0, 6) AS ipw_ate,
                ROUND(CAST(ty AS DOUBLE) / CAST(tn AS DOUBLE) -
                  CAST(cy AS DOUBLE) / CAST(cn AS DOUBLE), 6)
                  AS naive_diff
         FROM st""",

    "q449_aipw_ate" ->
      s"""WITH full_ AS (SELECT CAST(CAST(l_quantity AS DECIMAL(12,2))
                           AS DOUBLE) / 10.0 AS x,
                         CAST(CASE WHEN CAST(l_discount AS DECIMAL(12,2))
                           >= 0.05 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS t,
                         CAST(CASE WHEN l_returnflag = 'R' THEN 1.0
                           ELSE 0.0 END AS DOUBLE) AS yy
                        FROM lineitem),
          rows_ AS (SELECT x, t AS y FROM full_),
          it0 AS (SELECT CAST(0.0 AS DOUBLE) AS b0,
                         CAST(0.0 AS DOUBLE) AS b1),
          ${newtonIter(1)},
          ${newtonIter(2)},
          ${newtonIter(3)},
          fitp AS (SELECT ROUND(b0, 6) AS pb0, ROUND(b1, 6) AS pb1
                   FROM it3),
          olsr AS (SELECT t AS arm, CAST(round(x * 10) AS BIGINT) AS x10,
                          CAST(yy AS BIGINT) AS yl
                   FROM full_),
          olsa AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(x10) AS BIGINT) AS sx,
                          CAST(sum(yl) AS BIGINT) AS sy,
                          CAST(sum(x10 * x10) AS BIGINT) AS sxx,
                          CAST(sum(x10 * yl) AS BIGINT) AS sxy
                   FROM olsr GROUP BY 1),
          olsc AS (SELECT arm,
                          ROUND((CAST(sy AS DOUBLE) -
                            (CAST(n * sxy - sx * sy AS DOUBLE) /
                             CAST(n * sxx - sx * sx AS DOUBLE)) *
                            CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
                            AS a,
                          ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
                            CAST(n * sxx - sx * sx AS DOUBLE), 6) AS b
                   FROM olsa),
          coefp AS (SELECT max(CASE WHEN arm = 0.0 THEN a END) AS a0,
                           max(CASE WHEN arm = 0.0 THEN b END) AS b0o,
                           max(CASE WHEN arm = 1.0 THEN a END) AS a1,
                           max(CASE WHEN arm = 1.0 THEN b END) AS b1o
                    FROM olsc),
          sc AS (SELECT f.x, f.t, f.yy,
                        CAST(round(f.x * 10) AS BIGINT) AS x10,
                        p.pb0, p.pb1, c.a0, c.b0o, c.a1, c.b1o,
                        CAST(CAST(1.0 / (1.0 +
                          exp(-(p.pb0 + p.pb1 * f.x)))
                          AS DECIMAL(18,12)) AS DOUBLE) AS pr
                 FROM full_ f, fitp p, coefp c),
          sc2 AS (SELECT *, a1 + b1o * x10 AS m1, a0 + b0o * x10 AS m0
                  FROM sc),
          st AS (SELECT count(*) AS n, max(pb0) AS pb0, max(pb1) AS pb1,
                   max(a0) AS a0, max(b0o) AS b0o,
                   max(a1) AS a1, max(b1o) AS b1o,
                   CAST(sum(CAST(round((m1 - m0 + t * (yy - m1) / pr -
                     (1.0 - t) * (yy - m0) / (1.0 - pr)) * 1e6)
                     AS BIGINT)) AS BIGINT) AS sq,
                   CAST(sum(CAST(round((m1 - m0) * 1e6) AS BIGINT))
                     AS BIGINT) AS sreg
                 FROM sc2)
         SELECT n, pb0, pb1, a0, b0o, a1, b1o,
                ROUND(CAST(sq AS DOUBLE) / 1e6 / CAST(n AS DOUBLE), 6)
                  AS aipw_ate,
                ROUND(CAST(sreg AS DOUBLE) / 1e6 / CAST(n AS DOUBLE), 6)
                  AS reg_ate
         FROM st""",

    "q458_single_linkage" ->
      """WITH RECURSIVE pts AS (
           SELECT c_custkey AS pid,
             CAST(CAST(('0x' || substr(md5('glat:' ||
                 CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
               % 1000000 AS DOUBLE) / 1000000.0 * 5.0 + 40.0 AS px,
             CAST(CAST(('0x' || substr(md5('glon:' ||
                 CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
               % 1000000 AS DOUBLE) / 1000000.0 * 5.0 AS py
           FROM customer WHERE c_custkey % 7 = 0),
         idx AS (SELECT pid, row_number() OVER (ORDER BY pid) AS ix
                 FROM pts),
         n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pts),
         cand AS (SELECT a.pid AS u, b.pid AS v,
                    (b.px - a.px) * (b.px - a.px) +
                    (b.py - a.py) * (b.py - a.py) AS d2
                  FROM pts a JOIN pts b ON a.pid < b.pid
                  WHERE (b.px - a.px) * (b.px - a.px) +
                        (b.py - a.py) * (b.py - a.py) <=
                        CAST(0.7 AS DOUBLE) * CAST(0.7 AS DOUBLE)),
         ed AS (SELECT CAST(round(d2 * 1e12) AS BIGINT) AS wq,
                       c.u, c.v, ia.ix AS iu, ib.ix AS iv
                FROM cand c JOIN idx ia ON ia.pid = c.u
                            JOIN idx ib ON ib.pid = c.v),
         sl AS (SELECT max(n1.n) AS n,
                       list([iu, iv, u, v] ORDER BY wq, u, v) AS es
                FROM ed, n1),
         fl AS (SELECT n,
                  list_reduce(list_prepend(range(1, n + 1), es),
                    (a, e) -> CASE
                      WHEN a[CAST(e[1] AS INT)] = a[CAST(e[2] AS INT)]
                        THEN a
                      ELSE list_concat(
                        list_transform(a, (r, k) -> CASE
                          WHEN k <= n AND r = greatest(
                              a[CAST(e[1] AS INT)], a[CAST(e[2] AS INT)])
                            THEN least(a[CAST(e[1] AS INT)],
                              a[CAST(e[2] AS INT)])
                          ELSE r END),
                        [e[3], e[4]]) END) AS st
                FROM sl),
         picked AS (SELECT st[CAST(n + 2 * p - 1 AS INT)] AS u,
                           st[CAST(n + 2 * p AS INT)] AS v
                    FROM (SELECT st, n,
                            unnest(range(1, (len(st) - n) // 2 + 1)) AS p
                          FROM fl)),
         mst AS (SELECT p.u, p.v, e.wq
                 FROM picked p JOIN ed e ON e.u = p.u AND e.v = p.v),
         cut AS (SELECT u, v FROM (SELECT u, v, ROW_NUMBER() OVER
                   (ORDER BY wq DESC, u, v) AS rn FROM mst)
                 WHERE rn <= 2),
         kept AS (SELECT m.u, m.v FROM mst m
                  LEFT JOIN cut c ON c.u = m.u AND c.v = m.v
                  WHERE c.u IS NULL),
         sym AS (SELECT u AS a, v AS b FROM kept
                 UNION SELECT v, u FROM kept),
         reach(s, t) AS (SELECT pid, pid FROM pts
                         UNION
                         SELECT r.s, e.b FROM reach r
                         JOIN sym e ON e.a = r.t),
         comp AS (SELECT s AS pid, MIN(t) AS cluster
                  FROM reach GROUP BY 1)
        SELECT pid AS id, cluster FROM comp""",

    "q457_boruvka_mst" ->
      """WITH pts AS (
           SELECT c_custkey AS pid,
             CAST(CAST(('0x' || substr(md5('glat:' ||
                 CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
               % 1000000 AS DOUBLE) / 1000000.0 * 5.0 + 40.0 AS px,
             CAST(CAST(('0x' || substr(md5('glon:' ||
                 CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
               % 1000000 AS DOUBLE) / 1000000.0 * 5.0 AS py
           FROM customer WHERE c_custkey % 7 = 0),
         idx AS (SELECT pid, row_number() OVER (ORDER BY pid) AS ix
                 FROM pts),
         n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pts),
         cand AS (SELECT a.pid AS u, b.pid AS v,
                    (b.px - a.px) * (b.px - a.px) +
                    (b.py - a.py) * (b.py - a.py) AS d2
                  FROM pts a JOIN pts b ON a.pid < b.pid
                  WHERE (b.px - a.px) * (b.px - a.px) +
                        (b.py - a.py) * (b.py - a.py) <=
                        CAST(0.7 AS DOUBLE) * CAST(0.7 AS DOUBLE)),
         ed AS (SELECT CAST(round(d2 * 1e12) AS BIGINT) AS wq,
                       c.u, c.v, ia.ix AS iu, ib.ix AS iv
                FROM cand c JOIN idx ia ON ia.pid = c.u
                            JOIN idx ib ON ib.pid = c.v),
         sl AS (SELECT max(n1.n) AS n,
                       list([iu, iv, u, v] ORDER BY wq, u, v) AS es
                FROM ed, n1),
         fl AS (SELECT n,
                  list_reduce(list_prepend(range(1, n + 1), es),
                    (a, e) -> CASE
                      WHEN a[CAST(e[1] AS INT)] = a[CAST(e[2] AS INT)]
                        THEN a
                      ELSE list_concat(
                        list_transform(a, (r, k) -> CASE
                          WHEN k <= n AND r = greatest(
                              a[CAST(e[1] AS INT)], a[CAST(e[2] AS INT)])
                            THEN least(a[CAST(e[1] AS INT)],
                              a[CAST(e[2] AS INT)])
                          ELSE r END),
                        [e[3], e[4]]) END) AS st
                FROM sl),
         picked AS (SELECT st[CAST(n + 2 * p - 1 AS INT)] AS u,
                           st[CAST(n + 2 * p AS INT)] AS v
                    FROM (SELECT st, n,
                            unnest(range(1, (len(st) - n) // 2 + 1)) AS p
                          FROM fl))
        SELECT p.u, p.v, e.wq
        FROM picked p JOIN ed e ON e.u = p.u AND e.v = p.v""",

    "q456_point_dbscan" ->
      """WITH RECURSIVE pts AS (
           SELECT c_custkey AS pid,
             CAST(CAST(('0x' || substr(md5('glat:' ||
                 CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
               % 1000000 AS DOUBLE) / 1000000.0 * 5.0 + 40.0 AS px,
             CAST(CAST(('0x' || substr(md5('glon:' ||
                 CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
               % 1000000 AS DOUBLE) / 1000000.0 * 5.0 AS py
           FROM customer WHERE c_custkey % 7 = 0),
         nbr AS (SELECT a.pid AS qid, b.pid AS pid
                 FROM pts a JOIN pts b ON a.pid <> b.pid
                   AND (b.px - a.px) * (b.px - a.px) +
                       (b.py - a.py) * (b.py - a.py) <= 0.25),
         cores AS (SELECT qid AS core_id
                   FROM (SELECT qid, count(*) AS deg FROM nbr GROUP BY 1)
                   WHERE deg + 1 >= 5),
         ce AS (SELECT n.qid AS a, n.pid AS b
                FROM nbr n
                JOIN cores c1 ON c1.core_id = n.qid
                JOIN cores c2 ON c2.core_id = n.pid),
         reach(n, m) AS (SELECT core_id, core_id FROM cores
                         UNION
                         SELECT r.n, e.b FROM reach r
                         JOIN ce e ON e.a = r.m),
         comp AS (SELECT n AS core_id, MIN(m) AS cluster
                  FROM reach GROUP BY 1),
         bord AS (SELECT n.qid, MIN(c.cluster) AS cluster
                  FROM nbr n JOIN comp c ON c.core_id = n.pid
                  WHERE n.qid NOT IN (SELECT core_id FROM cores)
                  GROUP BY 1)
        SELECT p.pid AS id,
               coalesce(c.cluster, b.cluster, -1) AS cluster,
               CASE WHEN c.core_id IS NOT NULL THEN 'core'
                    WHEN b.qid IS NOT NULL THEN 'border'
                    ELSE 'noise' END AS role
        FROM pts p LEFT JOIN comp c ON c.core_id = p.pid
                   LEFT JOIN bord b ON b.qid = p.pid""",

    "q454_dtw_distance" ->
      """WITH daily AS (SELECT event_type AS key, CAST(ts AS DATE) AS day,
                          CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) * 100
                            AS BIGINT) AS DOUBLE) AS cents
                        FROM events GROUP BY 1, 2),
          ser AS (SELECT key, list(cents ORDER BY day) AS xs
                  FROM daily GROUP BY 1),
          pr AS (SELECT a.key AS key_a, b.key AS key_b,
                        a.xs AS xa, b.xs AS xb
                 FROM ser a JOIN ser b ON a.key < b.key),
          fl AS (SELECT key_a, key_b, len(xa) AS na, len(xb) AS nb,
                   list_reduce(
                     list_prepend(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(xb, x -> CAST(1e18 AS DOUBLE))),
                       list_transform(xa, a -> [a])),
                     (acc, e) -> list_reduce(
                       list_prepend([CAST(1e18 AS DOUBLE)],
                         list_transform(xb, b -> [b])),
                       (cur, eb) -> list_append(cur,
                         abs(e[1] - eb[1]) +
                         least(acc[len(cur)], acc[len(cur) + 1],
                           cur[len(cur)])))) AS row_
                 FROM pr)
         SELECT key_a, key_b, CAST(na AS BIGINT) AS n_a,
                CAST(nb AS BIGINT) AS n_b,
                ROUND(row_[CAST(nb + 1 AS INT)], 6) AS dtw,
                ROUND(row_[CAST(nb + 1 AS INT)] /
                  CAST(na + nb AS DOUBLE), 6) AS dtw_norm
         FROM fl""",

    "q452_huber_irls" ->
      s"""WITH daily AS (SELECT event_type AS key, CAST(ts AS DATE) AS day,
                           CAST(sum(CAST(value AS DECIMAL(18,2))) * 100
                             AS BIGINT) AS cents
                         FROM events GROUP BY 1, 2),
          rws AS (SELECT key,
                    row_number() OVER (PARTITION BY key ORDER BY day)
                      AS xl,
                    cents AS yl
                  FROM daily),
          ols AS (SELECT key, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(xl) AS BIGINT) AS sx,
                    CAST(sum(yl) AS BIGINT) AS sy,
                    CAST(sum(xl * xl) AS BIGINT) AS sxx,
                    CAST(sum(xl * yl) AS BIGINT) AS sxy
                  FROM rws GROUP BY 1),
          c0 AS (SELECT key, n,
                   ROUND((CAST(sy AS DOUBLE) -
                     (CAST(n * sxy - sx * sy AS DOUBLE) /
                      CAST(n * sxx - sx * sx AS DOUBLE)) *
                     CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS a,
                   ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
                     CAST(n * sxx - sx * sx AS DOUBLE), 6) AS b
                 FROM ols),
          ${huberRound(1)},
          ${huberRound(2)}
         SELECT c2.key, c2.n, c0.a AS a0, c0.b AS b0,
                c2.a AS a_fit, c2.b AS b_fit, c2.nd AS n_down
         FROM c2 JOIN c0 USING (key)""",

    "q453_ransac_line" ->
      s"""WITH daily AS (SELECT event_type AS key, CAST(ts AS DATE) AS day,
                           CAST(sum(CAST(value AS DECIMAL(18,2))) * 100
                             AS BIGINT) AS cents
                         FROM events GROUP BY 1, 2),
          rws AS (SELECT key,
                    row_number() OVER (PARTITION BY key ORDER BY day)
                      AS xl,
                    cents AS yl
                  FROM daily),
          sizes AS (SELECT key, CAST(count(*) AS BIGINT) AS n
                    FROM rws GROUP BY 1),
          grid0 AS (SELECT key, n, CAST(t AS BIGINT) AS t,
                      ${H60("'ra:' || key || ':' || CAST(t AS VARCHAR)")}
                        % n + 1 AS i1,
                      ${H60("'rb:' || key || ':' || CAST(t AS VARCHAR)")}
                        % n + 1 AS i2r
                    FROM sizes, (SELECT unnest(range(1, 9)) AS t)),
          grid AS (SELECT key, t, i1,
                     CASE WHEN i2r = i1 THEN i2r % n + 1 ELSE i2r END
                       AS i2
                   FROM grid0),
          pts AS (SELECT key, xl AS i, CAST(xl AS DOUBLE) AS xd,
                         CAST(yl AS DOUBLE) AS yd
                  FROM rws),
          models AS (SELECT g.key, g.t,
                       p1.yd - ((p2.yd - p1.yd) / (p2.xd - p1.xd)) *
                         p1.xd AS am,
                       (p2.yd - p1.yd) / (p2.xd - p1.xd) AS bm
                     FROM grid g
                     JOIN pts p1 ON p1.key = g.key AND p1.i = g.i1
                     JOIN pts p2 ON p2.key = g.key AND p2.i = g.i2),
          sc AS (SELECT r.key, m.t, m.am, m.bm,
                   CAST(sum(CASE WHEN abs(CAST(r.yl AS DOUBLE) - m.am -
                     m.bm * CAST(r.xl AS DOUBLE)) <= 100000.0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_inliers
                 FROM rws r JOIN models m USING (key)
                 GROUP BY 1, 2, 3, 4),
          best AS (SELECT key, t AS best_trial, n_inliers, am, bm
                   FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY key
                           ORDER BY n_inliers DESC, t) AS rn FROM sc)
                   WHERE rn = 1),
          cons AS (SELECT r.key, r.xl, r.yl
                   FROM rws r JOIN best b USING (key)
                   WHERE abs(CAST(r.yl AS DOUBLE) - b.am -
                     b.bm * CAST(r.xl AS DOUBLE)) <= 100000.0),
          colsa AS (SELECT key, CAST(count(*) AS BIGINT) AS nc,
                      CAST(sum(xl) AS BIGINT) AS sx,
                      CAST(sum(yl) AS BIGINT) AS sy,
                      CAST(sum(xl * xl) AS BIGINT) AS sxx,
                      CAST(sum(xl * yl) AS BIGINT) AS sxy
                    FROM cons GROUP BY 1),
          refit AS (SELECT key,
                      ROUND((CAST(sy AS DOUBLE) -
                        (CAST(nc * sxy - sx * sy AS DOUBLE) /
                         CAST(nc * sxx - sx * sx AS DOUBLE)) *
                        CAST(sx AS DOUBLE)) / CAST(nc AS DOUBLE), 6)
                        AS a_fit,
                      ROUND(CAST(nc * sxy - sx * sy AS DOUBLE) /
                        CAST(nc * sxx - sx * sx AS DOUBLE), 6) AS b_fit
                    FROM colsa)
         SELECT b.key, b.best_trial, b.n_inliers,
                ROUND(b.am, 6) AS a_model, ROUND(b.bm, 6) AS b_model,
                r.a_fit, r.b_fit
         FROM best b JOIN refit r USING (key)""",

    "q450_page_hinkley" ->
      """WITH daily AS (SELECT event_type AS key, CAST(ts AS DATE) AS day,
                          CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) * 100
                            AS BIGINT) AS DOUBLE) AS cents
                        FROM events GROUP BY 1, 2),
          ser AS (SELECT key, count(*) AS n,
                         list(cents ORDER BY day) AS xs,
                         list(day ORDER BY day) AS days
                  FROM daily GROUP BY 1),
          fl AS (SELECT key, n, days,
                   list_reduce(list_prepend([0.0, 0.0, 0.0, 0.0, 0.0],
                     list_transform(xs, v -> [v])),
                     (a, e) -> [
                       a[1] + 1.0,
                       a[2] + e[1],
                       a[3] + (e[1] - (a[2] + e[1]) / (a[1] + 1.0) - 0.0),
                       least(a[4], a[3] + (e[1] - (a[2] + e[1]) /
                         (a[1] + 1.0) - 0.0)),
                       CASE WHEN a[5] = 0.0 AND
                           (a[3] + (e[1] - (a[2] + e[1]) / (a[1] + 1.0)
                             - 0.0)) -
                           least(a[4], a[3] + (e[1] - (a[2] + e[1]) /
                             (a[1] + 1.0) - 0.0)) > 100000.0
                         THEN a[1] + 1.0 ELSE a[5] END
                     ]) AS st
                 FROM ser)
         SELECT key, CAST(n AS BIGINT) AS n, ROUND(st[3], 6) AS m_end,
                ROUND(st[4], 6) AS min_m, CAST(st[5] AS BIGINT)
                  AS alarm_idx,
                CASE WHEN st[5] > 0 THEN
                  CAST(days[CAST(st[5] AS INT)] AS VARCHAR) END
                  AS alarm_at
         FROM fl""",

    "q422_logistic_newton" ->
      s"""WITH rows_ AS (SELECT CAST(CAST(l_discount AS DECIMAL(12,2))
                           AS DOUBLE) * 10.0 AS x,
                         CAST(CASE WHEN l_returnflag = 'R' THEN 1.0
                           ELSE 0.0 END AS DOUBLE) AS y
                        FROM lineitem),
          it0 AS (SELECT CAST(0.0 AS DOUBLE) AS b0,
                         CAST(0.0 AS DOUBLE) AS b1),
          ${newtonIter(1)},
          ${newtonIter(2)},
          ${newtonIter(3)},
          fin AS (SELECT y, b0, b1,
                    CAST(CAST(1.0 / (1.0 + exp(-(b0 + b1 * x)))
                      AS DECIMAL(18,12)) AS DOUBLE) AS p
                  FROM rows_, it3)
         SELECT count(*) AS n, ROUND(max(b0), 6) AS b0,
                ROUND(max(b1), 6) AS b1,
                ROUND(CAST(sum(CAST(round((-(y * ln(p) + (1.0 - y) *
                  ln(1.0 - p))) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 /
                  CAST(count(*) AS DOUBLE), 6) AS logloss
         FROM fin""",

    "q420_kalman_level" ->
      s"""WITH daily AS (SELECT key, day, CAST(y AS DOUBLE) AS z
                         FROM ($dailySql) ds),
          agg AS (SELECT key, count(*) AS n,
                    list_reduce(
                      list_transform(list(z ORDER BY day),
                        v -> {'z': v, 'x': v, 'p': CAST(1.0 AS DOUBLE)}),
                      (a, b) -> {'z': b.z,
                        'x': a.x + ((a.p + CAST(0.01 AS DOUBLE)) /
                          (a.p + CAST(0.01 AS DOUBLE) +
                           CAST(1.0 AS DOUBLE))) * (b.z - a.x),
                        'p': (CAST(1.0 AS DOUBLE) -
                          (a.p + CAST(0.01 AS DOUBLE)) /
                          (a.p + CAST(0.01 AS DOUBLE) +
                           CAST(1.0 AS DOUBLE))) *
                          (a.p + CAST(0.01 AS DOUBLE))}) AS st
                  FROM daily GROUP BY key)
         SELECT key, n, ROUND(st.x, 6) AS level, ROUND(st.p, 6) AS p_var,
                ROUND((st.p + CAST(0.01 AS DOUBLE)) /
                  (st.p + CAST(0.01 AS DOUBLE) + CAST(1.0 AS DOUBLE)), 6)
                  AS gain_next
         FROM agg""",

    "q210_upsert_latest" ->
      """WITH r AS (SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus,
                           o_totalprice,
                           ROW_NUMBER() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                    FROM orders)
          SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
          FROM r WHERE rn = 1""",

    "q211_weighted_median" ->
      """WITH c AS (SELECT l_returnflag AS g,
                           CAST(l_extendedprice AS DECIMAL(18,6)) AS v,
                           sum(CAST(l_quantity AS DECIMAL(18,6))) AS w
                    FROM lineitem WHERE l_extendedprice IS NOT NULL
                    GROUP BY 1, 2),
          cw AS (SELECT g, v, w,
                        sum(w) OVER (PARTITION BY g ORDER BY v) AS cumw,
                        sum(w) OVER (PARTITION BY g) AS totw
                 FROM c)
          SELECT g, CAST(min(v) AS DOUBLE) AS weighted_median,
                 CAST(max(totw) AS DOUBLE) AS total_weight
          FROM cw WHERE CAST(cumw AS DOUBLE) >= CAST(totw AS DOUBLE) / 2.0
          GROUP BY g""",

    "q212_rolling_corr" ->
      s"""WITH d AS (SELECT day,
                            CAST(sum(CASE WHEN key = 'purchase' THEN y END)
                                 AS DECIMAL(25,6)) AS x,
                            CAST(sum(CASE WHEN key = 'view' THEN y END)
                                 AS DECIMAL(25,6)) AS y2
                     FROM ($dailySql) GROUP BY day),
          wf AS (SELECT day, x, y2,
                        count(*) OVER w AS n,
                        CAST(sum(x) OVER w AS DOUBLE) AS sx,
                        CAST(sum(y2) OVER w AS DOUBLE) AS sy,
                        CAST(sum(x * x) OVER w AS DOUBLE) AS sxx,
                        CAST(sum(y2 * y2) OVER w AS DOUBLE) AS syy,
                        CAST(sum(x * y2) OVER w AS DOUBLE) AS sxy
                 FROM d
                 WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
          SELECT CAST(day AS VARCHAR) AS bucket,
                 CAST(x AS DOUBLE) AS x, CAST(y2 AS DOUBLE) AS y,
                 CASE WHEN n = 7 THEN
                   ROUND((7.0 * sxy - sx * sy)
                     / sqrt((7.0 * sxx - sx * sx) * (7.0 * syy - sy * sy)), 6)
                 END AS corr
          FROM wf""",

    "q213_benford" ->
      """WITH d AS (SELECT CAST(substr(regexp_replace(
                       CAST(abs(o_totalprice) AS VARCHAR), '[0.]*', '', 'g'),
                       1, 1) AS INT) AS digit
                    FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice <> 0),
          c AS (SELECT digit, count(*) AS n FROM d
                WHERE digit BETWEEN 1 AND 9 GROUP BY digit),
          t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
          SELECT digit, n, ROUND(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS observed,
                 ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS expected
          FROM c, t""",

    // full recompute over all events — must equal base-state + delta
    "q214_incremental_agg" ->
      """WITH s AS (SELECT event_type, CAST(value AS DECIMAL(18,6)) AS v
                    FROM events)
          SELECT event_type,
                 CAST(count(v) AS BIGINT) AS value_cnt,
                 CAST(CAST(sum(v) AS DECIMAL(38,6)) AS DOUBLE) AS value_sum,
                 ROUND(CAST(CAST(sum(v) AS DECIMAL(38,6)) AS DOUBLE)
                   / CAST(count(v) AS DOUBLE), 6) AS value_mean,
                 CAST(min(v) AS DOUBLE) AS value_min,
                 CAST(max(v) AS DOUBLE) AS value_max
          FROM s GROUP BY event_type""",

    "q215_theils_u" ->
      """WITH cont AS (SELECT coalesce(CAST(o_orderpriority AS VARCHAR), ' null') AS va,
                              coalesce(CAST(o_orderstatus AS VARCHAR), ' null') AS vb,
                              count(*) AS cnt
                       FROM orders GROUP BY 1, 2),
          ma AS (SELECT va, sum(cnt) AS ca FROM cont GROUP BY va),
          mb AS (SELECT vb, sum(cnt) AS cb FROM cont GROUP BY vb),
          n AS (SELECT sum(cnt) AS n FROM cont),
          mi AS (SELECT sum((cnt / n) * ln((cnt / n)
                     / ((ca / n) * (cb / n)))) AS mi
                 FROM cont JOIN ma USING (va) JOIN mb USING (vb), n),
          ha AS (SELECT -sum((ca / n) * ln(ca / n)) AS h_a FROM ma, n),
          hb AS (SELECT -sum((cb / n) * ln(cb / n)) AS h_b FROM mb, n)
          SELECT ROUND(mi, 6) AS mi, ROUND(mi / h_a, 6) AS u_a_given_b,
                 ROUND(mi / h_b, 6) AS u_b_given_a
          FROM mi, ha, hb""",

    "q216_personalized_pagerank" ->
      """WITH t AS (SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS p
                    FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          e AS (SELECT c AS src, p AS dst FROM t
                UNION SELECT p AS src, c AS dst FROM t),
          deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
          nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          sd AS (SELECT c_custkey AS node FROM customer
                 WHERE c_mktsegment = 'BUILDING'),
          ns AS (SELECT count(*) AS k FROM sd),
          sv AS (SELECT nodes.node,
                        CASE WHEN sd.node IS NOT NULL THEN 1.0 / k ELSE 0.0 END AS s
                 FROM nodes LEFT JOIN sd ON nodes.node = sd.node, ns),
          p0 AS (SELECT node, s, s AS pr FROM sv),
          c1 AS (SELECT dst AS node, sum(pr / outdeg) AS m
                 FROM e JOIN deg USING (src) JOIN p0 ON e.src = p0.node
                 GROUP BY 1),
          p1 AS (SELECT sv.node, sv.s, 0.15 * sv.s + 0.85 * coalesce(m, 0) AS pr
                 FROM sv LEFT JOIN c1 ON sv.node = c1.node),
          c2 AS (SELECT dst AS node, sum(pr / outdeg) AS m
                 FROM e JOIN deg USING (src) JOIN p1 ON e.src = p1.node
                 GROUP BY 1),
          p2 AS (SELECT sv.node, 0.15 * sv.s + 0.85 * coalesce(m, 0) AS pr
                 FROM sv LEFT JOIN c2 ON sv.node = c2.node),
          nn AS (SELECT count(*) AS n FROM nodes)
          SELECT node, ROUND(pr * n, 6) AS ppr_scaled FROM p2, nn""",

    "q217_bootstrap_ci" -> {
      val caseW = graft.operators.DataQuality.PoissonThresholds.zipWithIndex
        .map { case (t, k) => s"WHEN u < $t THEN $k" }
        .mkString("CASE ", " ", s" ELSE ${graft.operators.DataQuality.PoissonThresholds.length} END")
      s"""WITH base AS (SELECT o_orderkey AS rid,
                               CAST(o_totalprice AS DECIMAL(18,6)) AS x
                        FROM orders WHERE o_totalprice IS NOT NULL),
          rep AS (SELECT rid, x, b.b FROM base,
                  (SELECT unnest(range(0, 40)) AS b) b),
          du AS (SELECT x, b,
                        CAST(CAST(('0x' || substr(md5('boot:' || CAST(b AS VARCHAR)
                          || ':' || CAST(rid AS VARCHAR)), 1, 15)) AS BIGINT) + 1
                          AS DOUBLE) / 1152921504606846976.0 AS u
                 FROM rep),
          dw AS (SELECT x, b, $caseW AS w FROM du),
          means AS (SELECT b, CAST(sum(w * x) AS DOUBLE)
                              / CAST(sum(w) AS DOUBLE) AS m
                    FROM dw GROUP BY b),
          stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(x) AS DOUBLE) AS sx FROM base),
          agg AS (SELECT quantile_cont(m, 0.05) AS lo,
                         quantile_cont(m, 0.95) AS hi,
                         sum(m) AS sm, sum(m * m) AS smm FROM means)
          SELECT n, ROUND(sx / CAST(n AS DOUBLE), 6) AS point_mean,
                 ROUND(lo, 6) AS ci_lo, ROUND(hi, 6) AS ci_hi,
                 ROUND(sqrt((smm - sm * sm / 40.0) / (40.0 - 1.0)), 6) AS se
          FROM agg, stats"""
    },

    "q218_markov_transitions" ->
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

    "q219_calibration_ece" ->
      s"""WITH s AS (${ReaderQueries.MD_SCORED}),
          pb AS (SELECT CAST(least(floor(p * 10), 9) AS INT) AS bin,
                        count(*) AS n_b, avg(p) AS sc, avg(y) AS lb
                 FROM s GROUP BY 1),
          t AS (SELECT CAST(sum(n_b) AS BIGINT) AS n FROM pb)
          SELECT n, 10 AS bins,
                 ROUND(sum(CAST(n_b AS DOUBLE) / CAST(n AS DOUBLE)
                   * abs(sc - lb)), 6) AS ece,
                 ROUND(max(abs(sc - lb)), 6) AS max_gap
          FROM pb, t GROUP BY n""",

    "q354_simpsons_paradox" ->
      """WITH base AS (
           SELECT l_returnflag,
                  CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS x,
                  CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT) AS y
           FROM lineitem),
          st AS (SELECT coalesce(l_returnflag, 'ALL') AS grp,
                        count(*) AS m, sum(x) AS sx, sum(y) AS sy,
                        sum(x * y) AS sxy, sum(x * x) AS sxx,
                        sum(y * y) AS syy
                 FROM base GROUP BY ROLLUP (l_returnflag)),
          co AS (SELECT grp, CAST(m AS BIGINT) AS m,
                        ROUND(CAST(m * sxy - sx * sy AS DOUBLE) /
                              (sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) *
                               sqrt(CAST(m * syy - sy * sy AS DOUBLE))), 6)
                          AS corr
                 FROM st),
          p AS (SELECT corr AS pooled_corr FROM co WHERE grp = 'ALL')
         SELECT co.grp, co.m, co.corr, p.pooled_corr,
                (co.corr > 0) <> (p.pooled_corr > 0) AS sign_flip
         FROM co, p""",

    "q356_point_in_polygon" ->
      """WITH v(i, x, y) AS (VALUES
             (0, 2500000, 44000000), (1, 4500000, 42500000),
             (2, 3800000, 40500000), (3, 1200000, 40800000),
             (4, 500000, 42800000)),
          e AS (SELECT a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
                FROM v a JOIN v b ON b.i = (a.i + 1) % 5),
          pts AS (SELECT c_custkey, c_nationkey,
                    (CAST(('0x' || substr(md5('glon:' ||
                       CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
                       % 1000000) * 5 AS ix,
                    (CAST(('0x' || substr(md5('glat:' ||
                       CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
                       % 1000000) * 5 + 40000000 AS iy
                  FROM customer),
          cr AS (SELECT p.c_custkey, p.c_nationkey,
                        CASE WHEN ((e.y1 > p.iy) <> (e.y2 > p.iy)) AND
                             CASE WHEN e.y2 > e.y1
                               THEN (e.x2 - e.x1) * (p.iy - e.y1)
                                    - (p.ix - e.x1) * (e.y2 - e.y1) > 0
                               ELSE (e.x2 - e.x1) * (p.iy - e.y1)
                                    - (p.ix - e.x1) * (e.y2 - e.y1) < 0 END
                             THEN 1 ELSE 0 END AS crossed
                 FROM pts p CROSS JOIN e),
          fl AS (SELECT c_custkey, c_nationkey,
                        sum(crossed) % 2 AS inside
                 FROM cr GROUP BY 1, 2)
         SELECT n_name, count(*) AS n_customers,
                CAST(sum(inside) AS BIGINT) AS n_inside
         FROM fl JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",

    "q341_nelson_aalen" ->
      """WITH span AS (SELECT user_id, CAST(min(ts) AS DATE) AS f,
                              CAST(max(ts) AS DATE) AS l
                       FROM events GROUP BY user_id),
          cut AS (SELECT CAST(max(ts) AS DATE) - 3 AS cut FROM events),
          subj AS (SELECT date_diff('day', f, l) AS t,
                          CASE WHEN l < cut THEN 1 ELSE 0 END AS obs
                   FROM span, cut),
          c AS (SELECT t, CAST(sum(obs) AS BIGINT) AS d,
                       CAST(sum(1 - obs) AS BIGINT) AS cens
                FROM subj GROUP BY t),
          k AS (SELECT t, d, cens,
                       sum(d + cens) OVER (ORDER BY t) - (d + cens) AS left_before,
                       sum(d + cens) OVER () AS total
                FROM c),
          f AS (SELECT t, d, total - left_before AS n_at_risk,
                       CAST(CAST(d AS DOUBLE)
                         / CAST(total - left_before AS DOUBLE)
                         AS DECIMAL(18,12)) AS inc
                FROM k)
          SELECT t AS duration, CAST(n_at_risk AS BIGINT) AS n_at_risk,
                 d AS d_events,
                 ROUND(CAST(sum(inc) OVER (ORDER BY t) AS DOUBLE), 6)
                   AS cum_hazard
          FROM f""",

    "q220_kaplan_meier" ->
      """WITH span AS (SELECT user_id, CAST(min(ts) AS DATE) AS f,
                              CAST(max(ts) AS DATE) AS l
                       FROM events GROUP BY user_id),
          cut AS (SELECT CAST(max(ts) AS DATE) - 3 AS cut FROM events),
          subj AS (SELECT date_diff('day', f, l) AS t,
                          CASE WHEN l < cut THEN 1 ELSE 0 END AS obs
                   FROM span, cut),
          c AS (SELECT t, CAST(sum(obs) AS BIGINT) AS d,
                       CAST(sum(1 - obs) AS BIGINT) AS cens
                FROM subj GROUP BY t),
          k AS (SELECT t, d, cens,
                       sum(d + cens) OVER (ORDER BY t) - (d + cens) AS left_before,
                       sum(d + cens) OVER () AS total
                FROM c),
          f AS (SELECT t, d, cens, total - left_before AS n_at_risk,
                       CASE WHEN d = 0 THEN CAST(0.0 AS DECIMAL(18,12))
                            WHEN d = total - left_before THEN CAST(-999.0 AS DECIMAL(18,12))
                            ELSE CAST(ln(1.0 - CAST(d AS DOUBLE)
                              / CAST(total - left_before AS DOUBLE)) AS DECIMAL(18,12))
                       END AS lnf
                FROM k)
          SELECT t AS duration, CAST(n_at_risk AS BIGINT) AS n_at_risk,
                 d AS d_events, cens AS n_censored,
                 ROUND(exp(CAST(sum(lnf) OVER (ORDER BY t) AS DOUBLE)), 6) AS survival
          FROM f""",

    "q221_gains_table" ->
      s"""WITH s AS (${ReaderQueries.MD_SCORED}),
          r AS (SELECT vec_id, y,
                       CAST(least(floor((1.0 - ROUND(percent_rank()
                         OVER (ORDER BY p), 6)) * 10), 9) AS INT) AS decile
                FROM s),
          pd AS (SELECT decile, CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS responders
                 FROM r GROUP BY decile),
          t AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
                       CAST(sum(responders) AS BIGINT) AS tr FROM pd),
          cw AS (SELECT decile, n, responders,
                        sum(n) OVER (ORDER BY decile) AS cum_n,
                        sum(responders) OVER (ORDER BY decile) AS cum_r
                 FROM pd)
          SELECT decile, n, responders,
                 ROUND(CAST(responders AS DOUBLE) / CAST(n AS DOUBLE), 6) AS resp_rate,
                 ROUND((CAST(cum_r AS DOUBLE) / CAST(cum_n AS DOUBLE))
                   / (CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE)), 6) AS cum_lift
          FROM cw, t""",

    "q222_zipf_fit" ->
      """WITH tok AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
                      FROM documents),
          c AS (SELECT term, count(*) AS f FROM tok GROUP BY term),
          r AS (SELECT CAST(ln(CAST(row_number() OVER (ORDER BY f DESC, term) AS DOUBLE))
                         AS DECIMAL(18,12)) AS x,
                       CAST(ln(CAST(f AS DOUBLE)) AS DECIMAL(18,12)) AS y
                FROM c),
          a AS (SELECT CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
                       CAST(sum(x * y) AS DOUBLE) AS sxy,
                       CAST(sum(x * x) AS DOUBLE) AS sxx,
                       CAST(sum(y * y) AS DOUBLE) AS syy
                FROM r)
          SELECT n AS vocab,
                 ROUND((sxy - sx * sy / CAST(n AS DOUBLE))
                   / (sxx - sx * sx / CAST(n AS DOUBLE)), 6) AS zipf_slope,
                 ROUND((sxy - sx * sy / CAST(n AS DOUBLE))
                   * (sxy - sx * sy / CAST(n AS DOUBLE))
                   / ((sxx - sx * sx / CAST(n AS DOUBLE))
                      * (syy - sy * sy / CAST(n AS DOUBLE))), 6) AS r2
          FROM a""",

    "q223_diversity" ->
      """WITH c AS (SELECT lang, source, count(*) AS c
                    FROM documents GROUP BY 1, 2),
          t AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY lang),
          j AS (SELECT c.lang, CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE) AS p, t.n
                FROM c JOIN t ON c.lang = t.lang),
          a AS (SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
                       CAST(count(*) AS BIGINT) AS n_sources,
                       -sum(p * ln(p)) AS h, sum(p * p) AS simpson
                FROM j GROUP BY lang)
          SELECT lang, n_docs, n_sources, ROUND(h, 6) AS shannon,
                 ROUND(simpson, 6) AS simpson, ROUND(exp(h), 6) AS eff_sources
          FROM a""",

    "q224_geo_knn" ->
      """WITH pts AS (
            SELECT c_custkey AS id,
                   CAST(CAST(('0x' || substr(md5('glat:' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
                        % 1000000 AS DOUBLE) / 1000000.0 * 5.0 + 40.0 AS lat,
                   CAST(CAST(('0x' || substr(md5('glon:' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
                        % 1000000 AS DOUBLE) / 1000000.0 * 5.0 AS lon
            FROM customer),
          pairs AS (
            SELECT a.id AS p, b.id AS nb,
                   2 * 6371 * asin(sqrt(
                     sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
                     + cos(radians(a.lat)) * cos(radians(b.lat))
                       * (sin(radians(b.lon - a.lon) / 2) * sin(radians(b.lon - a.lon) / 2))
                   )) AS dist_km
            FROM pts a JOIN pts b ON a.id <> b.id),
          nearby AS (SELECT p, nb, dist_km,
                            ROW_NUMBER() OVER (PARTITION BY p
                              ORDER BY dist_km, nb) AS rank
                     FROM pairs WHERE dist_km <= 25.0)
          SELECT p AS id, nb AS neighbor, ROUND(dist_km, 6) AS dist_km,
                 CAST(rank AS INT) AS rank
          FROM nearby WHERE rank <= 3""",

    "q225_group_impute" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber, l_returnflag,
                            CASE WHEN CAST(('0x' || substr(md5('imp:'
                                   || CAST(l_orderkey AS VARCHAR) || ':'
                                   || CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT)
                                 % 10 = 0
                                 THEN NULL ELSE l_quantity END AS qty
                     FROM lineitem),
          gm AS (SELECT l_returnflag, quantile_cont(qty, 0.5) AS gmed
                 FROM li WHERE qty IS NOT NULL GROUP BY 1),
          am AS (SELECT quantile_cont(qty, 0.5) AS allmed
                 FROM li WHERE qty IS NOT NULL)
          SELECT l_orderkey, l_linenumber,
                 ROUND(coalesce(qty, gmed, allmed), 6) AS qty_filled,
                 CAST(qty IS NULL AS INT) AS qty_filled_isnull
          FROM li LEFT JOIN gm USING (l_returnflag), am""",

    "q226_mahalanobis" ->
      """WITH base AS (SELECT CAST(l_orderkey AS VARCHAR) || '-'
                              || CAST(l_linenumber AS VARCHAR) AS id,
                              CAST(l_quantity AS DECIMAL(25,6)) AS x,
                              CAST(l_extendedprice AS DECIMAL(25,6)) AS y
                       FROM lineitem
                       WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
          st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                        CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
                        CAST(sum(x * x) AS DOUBLE) AS sxx,
                        CAST(sum(y * y) AS DOUBLE) AS syy,
                        CAST(sum(x * y) AS DOUBLE) AS sxy
                 FROM base),
          f AS (SELECT id, CAST(x AS DOUBLE) - sx / n AS dx,
                       CAST(y AS DOUBLE) - sy / n AS dy,
                       (sxx - sx * sx / n) / (n - 1.0) AS vx,
                       (syy - sy * sy / n) / (n - 1.0) AS vy,
                       (sxy - sx * sy / n) / (n - 1.0) AS cxy
                FROM base, st),
          g AS (SELECT id,
                       (dx * (vy * dx - cxy * dy) + dy * (vx * dy - cxy * dx))
                         / (vx * vy - cxy * cxy) AS d2
                FROM f)
          SELECT id, ROUND(d2, 6) AS d2,
                 CAST(d2 > 9.21 AS INT) AS is_outlier
          FROM g""",

    "q227_trimmed_mean" ->
      """WITH c AS (SELECT l_returnflag AS g,
                           CAST(l_extendedprice AS DECIMAL(18,6)) AS v,
                           count(*) AS c
                    FROM lineitem WHERE l_extendedprice IS NOT NULL
                    GROUP BY 1, 2),
          k AS (SELECT g, v, c,
                       sum(c) OVER (PARTITION BY g ORDER BY v) AS cum,
                       sum(c) OVER (PARTITION BY g) AS n
                FROM c),
          m AS (SELECT g, v, c, cum, n,
                       CAST(floor(CAST(n AS DOUBLE) * 0.1) AS BIGINT) AS k_lo,
                       n - CAST(floor(CAST(n AS DOUBLE) * 0.1) AS BIGINT) AS k_hi
                FROM k),
          kept AS (SELECT g, v, n,
                          greatest(least(cum, k_hi) - greatest(cum - c, k_lo),
                            0) AS kept
                   FROM m)
          SELECT g, CAST(max(n) AS BIGINT) AS n,
                 CAST(sum(kept) AS BIGINT) AS n_kept,
                 ROUND(CAST(sum(kept * v) AS DOUBLE)
                   / CAST(sum(kept) AS DOUBLE), 6) AS trimmed_mean
          FROM kept GROUP BY g"""
  )

  /** Part-affinity edges: parts bought together in large-quantity
    * lineitems of the same order (the q190 graph). */
  private def affinityEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).where(col("l_quantity") > 40)
      .select(col("l_orderkey"), col("l_partkey"))
    li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
  }


  private val oracles1: Map[String, String] = Map(
    "q196_trend_ols" ->
      s"""WITH s AS (SELECT key, date_diff('day', DATE '1970-01-01', day) AS x, y
                     FROM ($dailySql)),
          a AS (SELECT key, count(*) AS n, sum(x) AS sx, sum(x*x) AS sxx,
                       CAST(sum(y) AS DOUBLE) AS sy,
                       CAST(sum(x*y) AS DOUBLE) AS sxy,
                       CAST(sum(y*y) AS DOUBLE) AS syy
                FROM s GROUP BY key),
          f AS (SELECT key, n, sx, sxx, sy, syy,
                       sxy - CAST(sx AS DOUBLE) * sy / CAST(n AS DOUBLE) AS num,
                       CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS denx,
                       syy - sy * sy / CAST(n AS DOUBLE) AS deny
                FROM a)
          SELECT key, n, ROUND(num / denx, 6) AS slope,
                 ROUND(sy / CAST(n AS DOUBLE)
                   - (num / denx) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS intercept,
                 ROUND(num * num / (denx * deny), 6) AS r2
          FROM f""",

    "q274_backtest_folds" ->
      s"""WITH s AS ($dailySql),
          b AS (SELECT key, CAST(day AS DATE) AS d,
                  CAST(y AS DECIMAL(18,6)) AS yy FROM s),
          mx AS (SELECT key, max(d) AS maxd FROM b GROUP BY 1),
          folds AS (SELECT key, maxd, unnest(range(1, 4)) AS fold FROM mx),
          bd AS (SELECT key, CAST(fold AS INT) AS fold,
                   maxd - CAST((3 - fold + 1) * 5 AS INT) AS train_end,
                   maxd - CAST((3 - fold) * 5 AS INT) AS test_end
                 FROM folds)
          SELECT b.key AS event_type, fold,
            CAST(train_end AS VARCHAR) AS train_end,
            CAST(sum(CASE WHEN d <= train_end THEN 1 ELSE 0 END) AS BIGINT)
              AS n_train,
            CAST(sum(CASE WHEN d > train_end AND d <= test_end
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
            ROUND(CAST(sum(CASE WHEN d <= train_end THEN yy END) AS DOUBLE)
              / CAST(sum(CASE WHEN d <= train_end THEN 1 ELSE 0 END)
                AS DOUBLE), 6) AS train_mean,
            ROUND(CAST(sum(CASE WHEN d > train_end AND d <= test_end
                 THEN yy END) AS DOUBLE)
              / CAST(sum(CASE WHEN d > train_end AND d <= test_end
                 THEN 1 ELSE 0 END) AS DOUBLE), 6) AS test_mean
          FROM b JOIN bd USING (key)
          GROUP BY b.key, fold, train_end""",

    "q266_trend2_ols" ->
      s"""WITH s AS ($dailySql),
          b AS (SELECT key,
                  CAST(day - DATE '1970-01-01' AS DECIMAL(19,0)) AS x1,
                  CAST(CASE WHEN dayofweek(day) IN (0, 6) THEN 1
                       ELSE 0 END AS DECIMAL(19,0)) AS x2,
                  CAST(y AS DECIMAL(19,6)) AS yy
                FROM s),
          a AS (SELECT key, count(*) AS n,
                  CAST(sum(x1) AS DOUBLE) AS s1, CAST(sum(x2) AS DOUBLE) AS s2,
                  CAST(sum(yy) AS DOUBLE) AS sy,
                  CAST(sum(x1 * x1) AS DOUBLE) AS s11,
                  CAST(sum(x2 * x2) AS DOUBLE) AS s22,
                  CAST(sum(x1 * x2) AS DOUBLE) AS s12,
                  CAST(sum(x1 * yy) AS DOUBLE) AS s1y,
                  CAST(sum(x2 * yy) AS DOUBLE) AS s2y
                FROM b GROUP BY key),
          f AS (SELECT key, n, s1, s2, sy,
                  s11 - s1 * s1 / n AS a11,
                  s22 - s2 * s2 / n AS a22,
                  s12 - s1 * s2 / n AS a12,
                  s1y - s1 * sy / n AS c1,
                  s2y - s2 * sy / n AS c2
                FROM a),
          g AS (SELECT key, n, s1, s2, sy,
                  (c1 * a22 - c2 * a12) / (a11 * a22 - a12 * a12) AS b1,
                  (c2 * a11 - c1 * a12) / (a11 * a22 - a12 * a12) AS b2
                FROM f)
          SELECT key, n,
            ROUND(sy / n - b1 * (s1 / n) - b2 * (s2 / n), 6) AS intercept,
            ROUND(b1, 6) AS beta1,
            ROUND(b2, 6) AS beta2
          FROM g""",

    "q197_chi_square" ->
      """WITH cells AS (SELECT event_type AS a, dayofweek(CAST(ts AS DATE)) AS b,
                               count(*) AS o
                        FROM events GROUP BY 1, 2),
          rt AS (SELECT a, sum(o) AS rt FROM cells GROUP BY a),
          ct AS (SELECT b, sum(o) AS ct FROM cells GROUP BY b),
          tot AS (SELECT sum(o) AS n FROM cells),
          s AS (SELECT CAST(sum(CAST(CAST(o AS DOUBLE) * CAST(o AS DOUBLE)
                         / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
                         AS DECIMAL(38,18))) AS DOUBLE) AS s
                FROM cells JOIN rt USING (a) JOIN ct USING (b))
          SELECT ROUND(CAST(tot.n AS DOUBLE) * (s.s - 1.0), 6) AS chi2,
                 (SELECT count(*) - 1 FROM rt) * (SELECT count(*) - 1 FROM ct) AS dof,
                 CAST(tot.n AS BIGINT) AS n
          FROM s, tot""",

    "q198_welch_ttest" ->
      """WITH g1 AS (SELECT count(*) AS n1, CAST(sum(v) AS DOUBLE) AS s1,
                            CAST(sum(v * v) AS DOUBLE) AS ss1
                     FROM (SELECT CAST(value AS DECIMAL(18,6)) AS v FROM events
                           WHERE event_type = 'purchase' AND value IS NOT NULL)),
          g2 AS (SELECT count(*) AS n2, CAST(sum(v) AS DOUBLE) AS s2,
                        CAST(sum(v * v) AS DOUBLE) AS ss2
                 FROM (SELECT CAST(value AS DECIMAL(18,6)) AS v FROM events
                       WHERE event_type = 'click' AND value IS NOT NULL)),
          c AS (SELECT n1, n2, s1 / CAST(n1 AS DOUBLE) AS m1, s2 / CAST(n2 AS DOUBLE) AS m2,
                       (ss1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)
                         / CAST(n1 AS DOUBLE) AS se1,
                       (ss2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)
                         / CAST(n2 AS DOUBLE) AS se2
                FROM g1, g2)
          SELECT n1, n2, ROUND(m1, 6) AS mean1, ROUND(m2, 6) AS mean2,
                 ROUND(m1 - m2, 6) AS mean_diff,
                 ROUND((m1 - m2) / sqrt(se1 + se2), 6) AS t_stat,
                 ROUND((se1 + se2) * (se1 + se2)
                   / (se1 * se1 / (CAST(n1 AS DOUBLE) - 1.0)
                      + se2 * se2 / (CAST(n2 AS DOUBLE) - 1.0)), 6) AS welch_df
          FROM c""",

    "q363_summed_area_table" ->
      """WITH cells AS (
           SELECT ((CAST(('0x' || substr(md5('glon:' ||
                    CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
                    % 1000000) * 10) // 1000000 AS gx,
                  ((CAST(('0x' || substr(md5('glat:' ||
                    CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
                    % 1000000) * 10) // 1000000 AS gy,
                  count(*) AS n
           FROM customer GROUP BY 1, 2),
          spine AS (SELECT x.range AS gx, y.range AS gy
                    FROM range(0, 10) x, range(0, 10) y),
          dense AS (SELECT s.gx, s.gy, coalesce(c.n, 0) AS n
                    FROM spine s LEFT JOIN cells c
                      ON s.gx = c.gx AND s.gy = c.gy),
          rs AS (SELECT gx, gy, n,
                        sum(n) OVER (PARTITION BY gy ORDER BY gx
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS rs
                 FROM dense)
         SELECT CAST(gx AS INT) AS gx, CAST(gy AS INT) AS gy,
                CAST(n AS BIGINT) AS n,
                CAST(sum(rs) OVER (PARTITION BY gx ORDER BY gy
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS sat
         FROM rs""",

    "q364_rolling_slope" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                    AS y
           FROM events GROUP BY 1, 2),
          xi AS (SELECT event_type, day, y,
                        row_number() OVER (PARTITION BY event_type
                                           ORDER BY day) AS x
                 FROM daily),
          f AS (SELECT event_type, day,
                       count(*) OVER w AS n,
                       sum(x) OVER w AS sx, sum(y) OVER w AS sy,
                       sum(x * y) OVER w AS sxy, sum(x * x) OVER w AS sxx
                FROM xi
                WINDOW w AS (PARTITION BY event_type ORDER BY day
                             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         SELECT event_type, CAST(day AS VARCHAR) AS day,
                ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
                      CAST(n * sxx - sx * sx AS DOUBLE) / 100.0, 6)
                  AS slope14
         FROM f WHERE n = 14""",

    "q362_pacf" ->
      s"""WITH s AS ($dailySql),
          l AS (SELECT key, y AS x,
                       lag(y, 1) OVER w AS x1, lag(y, 2) OVER w AS x2,
                       lag(y, 3) OVER w AS x3
                FROM s WINDOW w AS (PARTITION BY key ORDER BY day)),
          e AS (SELECT key, 1 AS lag, x, x1 AS xl FROM l
                UNION ALL SELECT key, 2, x, x2 FROM l
                UNION ALL SELECT key, 3, x, x3 FROM l),
          a AS (SELECT key, lag, count(*) AS n,
                       CAST(sum(x) AS DOUBLE) AS sx,
                       CAST(sum(x * x) AS DOUBLE) AS sxx,
                       count(xl) AS np,
                       CAST(sum(CASE WHEN xl IS NOT NULL THEN x * xl END) AS DOUBLE) AS sxy,
                       CAST(sum(CASE WHEN xl IS NOT NULL THEN x END) AS DOUBLE) AS sh,
                       CAST(sum(xl) AS DOUBLE) AS st
                FROM e GROUP BY 1, 2),
          ac AS (SELECT key, lag,
                        ROUND((sxy - (sx / CAST(n AS DOUBLE)) * (sh + st)
                               + CAST(np AS DOUBLE) * (sx / CAST(n AS DOUBLE))
                                 * (sx / CAST(n AS DOUBLE)))
                          / (sxx - sx * sx / CAST(n AS DOUBLE)), 6) AS acf
                 FROM a),
          rr AS (SELECT key,
                        max(CASE WHEN lag = 1 THEN acf END) AS r1,
                        max(CASE WHEN lag = 2 THEN acf END) AS r2,
                        max(CASE WHEN lag = 3 THEN acf END) AS r3
                 FROM ac GROUP BY key),
          d2 AS (SELECT key, r1, r2, r3,
                        (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22
                 FROM rr),
          d3 AS (SELECT key, r1, r2, r3, p22,
                        r1 - p22 * r1 AS p21
                 FROM d2)
         SELECT key AS event_type, ROUND(r1, 6) AS pacf1,
                ROUND(p22, 6) AS pacf2,
                ROUND((r3 - p21 * r2 - p22 * r1)
                  / (1.0 - p21 * r1 - p22 * r2), 6) AS pacf3
         FROM d3""",

    "q199_acf" ->
      s"""WITH s AS ($dailySql),
          l AS (SELECT key, y AS x,
                       lag(y, 1) OVER w AS x1, lag(y, 2) OVER w AS x2,
                       lag(y, 3) OVER w AS x3
                FROM s WINDOW w AS (PARTITION BY key ORDER BY day)),
          e AS (SELECT key, 1 AS lag, x, x1 AS xl FROM l
                UNION ALL SELECT key, 2, x, x2 FROM l
                UNION ALL SELECT key, 3, x, x3 FROM l),
          a AS (SELECT key, lag, count(*) AS n,
                       CAST(sum(x) AS DOUBLE) AS sx,
                       CAST(sum(x * x) AS DOUBLE) AS sxx,
                       count(xl) AS np,
                       CAST(sum(CASE WHEN xl IS NOT NULL THEN x * xl END) AS DOUBLE) AS sxy,
                       CAST(sum(CASE WHEN xl IS NOT NULL THEN x END) AS DOUBLE) AS sh,
                       CAST(sum(xl) AS DOUBLE) AS st
                FROM e GROUP BY 1, 2)
          SELECT key, lag, np AS n_pairs,
                 ROUND((sxy - (sx / CAST(n AS DOUBLE)) * (sh + st)
                        + CAST(np AS DOUBLE) * (sx / CAST(n AS DOUBLE))
                          * (sx / CAST(n AS DOUBLE)))
                   / (sxx - sx * sx / CAST(n AS DOUBLE)), 6) AS acf
          FROM a""",

    "q200_cusum" ->
      s"""WITH s AS ($dailySql),
          c AS (SELECT key, day,
                       CAST(sum(x) OVER (PARTITION BY key ORDER BY day) AS DOUBLE) AS cum,
                       row_number() OVER (PARTITION BY key ORDER BY day) AS idx,
                       count(*) OVER (PARTITION BY key) AS n,
                       CAST(sum(x) OVER (PARTITION BY key) AS DOUBLE)
                         / CAST(count(*) OVER (PARTITION BY key) AS DOUBLE) AS mean
                FROM (SELECT key, day, y AS x FROM s)),
          d AS (SELECT key, day, n, mean,
                       abs(cum - CAST(idx AS DOUBLE) * mean) AS s_abs
                FROM c),
          m AS (SELECT key, max(s_abs) AS max_dev FROM d GROUP BY key)
          SELECT d.key, max(d.n) AS n, ROUND(max(m.max_dev), 6) AS max_dev,
                 CAST(min(d.day) AS VARCHAR) AS at_bucket,
                 ROUND(max(d.mean), 6) AS mean
          FROM d JOIN m ON d.key = m.key AND d.s_abs = m.max_dev
          GROUP BY d.key""",

    "q201_geo_radius_pairs" ->
      """WITH pts AS (
            SELECT c_custkey AS id,
                   CAST(CAST(('0x' || substr(md5('glat:' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
                        % 1000000 AS DOUBLE) / 1000000.0 * 5.0 + 40.0 AS lat,
                   CAST(CAST(('0x' || substr(md5('glon:' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
                        % 1000000 AS DOUBLE) / 1000000.0 * 5.0 AS lon
            FROM customer),
          pairs AS (
            SELECT a.id AS id_a, b.id AS id_b,
                   2 * 6371 * asin(sqrt(
                     sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
                     + cos(radians(a.lat)) * cos(radians(b.lat))
                       * (sin(radians(b.lon - a.lon) / 2) * sin(radians(b.lon - a.lon) / 2))
                   )) AS dist_km
            FROM pts a JOIN pts b ON a.id < b.id)
          SELECT id_a, id_b, ROUND(dist_km, 6) AS dist_km
          FROM pairs WHERE dist_km <= 25.0""",

    "q202_jw_linkage" ->
      """WITH p AS (SELECT p_partkey AS id, p_name AS nm,
                           str_split(p_name, ' ')[1] AS blk
                    FROM part)
          SELECT a.id AS id_a, b.id AS id_b,
                 ROUND(jaro_winkler_similarity(a.nm, b.nm), 6) AS jw
          FROM p a JOIN p b ON a.blk = b.blk AND a.id < b.id
          WHERE jaro_winkler_similarity(a.nm, b.nm) >= 0.88""",

    "q203_mann_whitney" ->
      """WITH lab AS (SELECT CAST(value AS DECIMAL(18,6)) AS v,
                             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is1
                      FROM events
                      WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL),
          c AS (SELECT v, count(*) AS t, sum(is1) AS t1 FROM lab GROUP BY v),
          cc AS (SELECT v, t, t1, sum(t) OVER (ORDER BY v) AS cum_t FROM c),
          s AS (SELECT CAST(sum(t1 * (2 * cum_t - t + 1)) AS DOUBLE) AS r2x,
                       CAST(sum(t1) AS BIGINT) AS n1, CAST(sum(t) AS BIGINT) AS n,
                       CAST(sum(t * t * t - t) AS DOUBLE) AS ties
                FROM cc),
          f AS (SELECT n1, n - n1 AS n2,
                       r2x / 2.0 - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0) / 2.0 AS u1,
                       CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 2.0 AS mu,
                       CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 12.0
                         * ((CAST(n AS DOUBLE) + 1.0)
                            - ties / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS s2
                FROM s)
          SELECT n1, n2, ROUND(u1, 6) AS u1, ROUND((u1 - mu) / sqrt(s2), 6) AS z
          FROM f""",

    "q204_spearman" ->
      """WITH base AS (SELECT CAST(l_quantity AS DECIMAL(18,6)) AS va,
                              CAST(l_extendedprice AS DECIMAL(18,6)) AS vb
                       FROM lineitem
                       WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
          ca AS (SELECT va AS v, count(*) AS t FROM base GROUP BY va),
          ra AS (SELECT v, 2 * sum(t) OVER (ORDER BY v) - t + 1 AS r FROM ca),
          cb AS (SELECT vb AS v, count(*) AS t FROM base GROUP BY vb),
          rb AS (SELECT v, 2 * sum(t) OVER (ORDER BY v) - t + 1 AS r FROM cb),
          j AS (SELECT ra.r AS x, rb.r AS y FROM base
                JOIN ra ON base.va = ra.v JOIN rb ON base.vb = rb.v),
          s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(x) AS DOUBLE) AS sa, CAST(sum(y) AS DOUBLE) AS sb,
                       CAST(sum(x * x) AS DOUBLE) AS saa,
                       CAST(sum(y * y) AS DOUBLE) AS sbb,
                       CAST(sum(x * y) AS DOUBLE) AS sab
                FROM j)
          SELECT n, ROUND((CAST(n AS DOUBLE) * sab - sa * sb)
                   / sqrt((CAST(n AS DOUBLE) * saa - sa * sa)
                          * (CAST(n AS DOUBLE) * sbb - sb * sb)), 6) AS spearman_rho
          FROM s""",

    "q205_theil_sen" ->
      s"""WITH s AS (SELECT key, date_diff('day', DATE '1970-01-01', day) AS x, y
                     FROM ($dailySql)),
          p AS (SELECT a.key,
                       CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
                FROM s a JOIN s b ON a.key = b.key AND a.x < b.x)
          SELECT key, CAST(count(*) AS BIGINT) AS n_pairs,
                 ROUND(median(slope), 6) AS ts_slope
          FROM p GROUP BY key""",

    "q206_link_prediction" ->
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > 40),
          e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
                 FROM li a JOIN li b
                   ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
          nbr AS (SELECT a AS n, b AS c FROM e0 UNION ALL SELECT b, a FROM e0),
          deg AS (SELECT c AS node, count(*) AS deg FROM nbr GROUP BY 1),
          centers AS (SELECT node AS c,
                             CAST(1.0 / ln(CAST(deg AS DOUBLE)) AS DECIMAL(18,12)) AS aa
                      FROM deg WHERE deg >= 2 AND deg <= 10000),
          half AS (SELECT n, nbr.c, aa FROM nbr JOIN centers ON nbr.c = centers.c),
          pairs AS (SELECT e1.n AS u, e2.n AS w,
                           CAST(count(*) AS BIGINT) AS common_neighbors,
                           CAST(sum(e1.aa) AS DOUBLE) AS adamic_adar
                    FROM half e1 JOIN half e2 ON e1.c = e2.c AND e1.n < e2.n
                    GROUP BY 1, 2 HAVING count(*) >= 2)
          SELECT u, w, common_neighbors, ROUND(adamic_adar, 6) AS adamic_adar
          FROM pairs
          WHERE NOT EXISTS (SELECT 1 FROM e0 WHERE e0.a = pairs.u AND e0.b = pairs.w)""",

    "q207_clustering_coeff" ->
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > 40),
          e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
                 FROM li a JOIN li b
                   ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
          tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                  FROM e0 e1 JOIN e0 e2 ON e2.a = e1.b
                  JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b),
          pern AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
                   FROM (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
                         UNION ALL SELECT z FROM tri)
                   GROUP BY 1),
          deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
                  FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
                  GROUP BY 1)
          SELECT d.node, d.deg, COALESCE(p.n_triangles, 0) AS n_triangles,
                 ROUND(CASE WHEN d.deg < 2 THEN 0.0
                       ELSE 2.0 * CAST(COALESCE(p.n_triangles, 0) AS DOUBLE)
                            / (CAST(d.deg AS DOUBLE) * (CAST(d.deg AS DOUBLE) - 1.0))
                       END, 6) AS clustering_coeff
          FROM deg d LEFT JOIN pern p ON d.node = p.node""",

    "q208_keyword_extract" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
                    FROM documents),
          tfc AS (SELECT doc_id, term, count(*) AS tf
                  FROM (SELECT doc_id, unnest(toks) AS term FROM t)
                  GROUP BY 1, 2),
          dfreq AS (SELECT term, count(*) AS df FROM tfc GROUP BY term),
          n AS (SELECT count(*) AS n FROM documents),
          sc AS (SELECT doc_id, tfc.term,
                        CAST(tf * CAST(ln(CAST(n.n AS DOUBLE) / CAST(df AS DOUBLE))
                                       AS DECIMAL(18,12)) AS DOUBLE) AS score
                 FROM tfc JOIN dfreq ON tfc.term = dfreq.term, n),
          r AS (SELECT doc_id, term, score,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, term ASC) AS rank
                FROM sc)
          SELECT doc_id, term, ROUND(score, 6) AS score, CAST(rank AS INT) AS rank
          FROM r WHERE rank <= 3""",

    "q209_entity_golden" ->
      """WITH RECURSIVE nm AS (SELECT DISTINCT p_name AS id,
                                      str_split(p_name, ' ')[1] AS blk
                               FROM part),
          pr AS (SELECT a.id AS id_a, b.id AS id_b
                 FROM nm a JOIN nm b ON a.blk = b.blk AND a.id < b.id
                 WHERE jaro_winkler_similarity(a.id, b.id) >= 0.9),
          edges AS (SELECT id_a AS a, id_b AS b FROM pr
                    UNION SELECT id_b, id_a FROM pr),
          nodes AS (SELECT DISTINCT a AS n FROM edges),
          reach(n, m) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m),
          comp AS (SELECT n AS p_name, MIN(m) AS component FROM reach GROUP BY n)
          SELECT COALESCE(component, p.p_name) AS canonical,
                 CAST(count(DISTINCT p.p_name) AS BIGINT) AS n_names,
                 CAST(count(*) AS BIGINT) AS n_parts,
                 CAST(CAST(min(p_retailprice) AS DECIMAL(18,2)) AS DOUBLE) AS min_price,
                 CAST(CAST(max(p_retailprice) AS DECIMAL(18,2)) AS DOUBLE) AS max_price
          FROM part p LEFT JOIN comp ON p.p_name = comp.p_name
          GROUP BY 1"""
  )

  // exports last: object vals initialize in declaration order
  val queries: Map[String, Q] = queries1 ++ queries2
  val oracles: Map[String, String] = oracles1 ++ oracles2
}
