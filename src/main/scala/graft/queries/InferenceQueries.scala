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

    // Durbin-Watson serial-correlation statistic of the per-series OLS
    // residuals: DW = sum (e_t - e_{t-1})^2 / sum e_t^2. Residuals come
    // off the ROUNDED (a,b) fit so both engines square identical
    // doubles; each squared term crosses into DECIMAL(32,12) so the
    // sums are order-free — the associativity contract every
    // distributed sum here obeys
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
      val m = scored.count() // bounded: #hypotheses, not rows
      val kmax = ranked
        .where(col("pa") <= lit(0.2) * col("rank").cast("double") / lit(m.toDouble))
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
    })
  )

  val oracles: Map[String, String] = Map(

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
          FROM pv"""
  )
}
