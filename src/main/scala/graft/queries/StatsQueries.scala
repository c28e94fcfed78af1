package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{DataQuality, Dedup, Geo, TimeSeries}
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

  val queries: Map[String, Q] = Map(
    // per-series OLS trend of daily spend against epoch day
    "q196_trend_ols" -> ((s, d) => {
      val daily = dailySpend(s, d)
        .select(col("event_type"),
          datediff(col("day"), lit("1970-01-01")).as("x"), col("spend"))
      TimeSeries.trendPerSeries(daily, col("event_type"), col("x"), col("spend"))
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

    // per-series autocorrelation of daily spend at lags 1..3
    "q199_acf" -> ((s, d) => {
      TimeSeries.acf(dailySpend(s, d), col("event_type"), col("day"),
        col("spend"), maxLag = 3)
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

    // Jaro-Winkler linkage of part names blocked by their first token
    "q202_jw_linkage" -> ((s, d) => {
      Dedup.jaroWinklerPairs(Tables.part(s, d), col("p_partkey"), col("p_name"),
          Seq(split(col("p_name"), " ").getItem(0)), minSim = 0.88)
        .select(col("id_a"), col("id_b"), round(col("jw"), 6).as("jw"))
    })
  )

  // y as DECIMAL(25,6): same values as Spark's (18,6) cast, but wide
  // enough that DuckDB promotes y*y to an int128-backed DECIMAL(38,12)
  // instead of overflowing the int64 DECIMAL(18) multiply path
  private val dailySql =
    """SELECT event_type AS key, CAST(ts AS DATE) AS day,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(25,6)) AS y
       FROM events GROUP BY 1, 2"""

  val oracles: Map[String, String] = Map(
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

    "q197_chi_square" ->
      """WITH cells AS (SELECT event_type AS a, dayofweek(CAST(ts AS DATE)) AS b,
                               count(*) AS o
                        FROM events GROUP BY 1, 2),
          rt AS (SELECT a, sum(o) AS rt FROM cells GROUP BY a),
          ct AS (SELECT b, sum(o) AS ct FROM cells GROUP BY b),
          tot AS (SELECT sum(o) AS n FROM cells),
          s AS (SELECT sum(CAST(o AS DOUBLE) * CAST(o AS DOUBLE)
                         / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))) AS s
                FROM cells JOIN rt USING (a) JOIN ct USING (b))
          SELECT ROUND(CAST(tot.n AS DOUBLE) * (s.s - 1.0), 6) AS chi2,
                 (SELECT count(*) - 1 FROM rt) * (SELECT count(*) - 1 FROM ct) AS dof,
                 tot.n AS n
          FROM s, tot""",

    "q198_welch_ttest" ->
      """WITH g1 AS (SELECT count(*) AS n1, CAST(sum(v) AS DOUBLE) AS s1,
                            CAST(sum(v * v) AS DOUBLE) AS ss1
                     FROM (SELECT CAST(value AS DECIMAL(18,6)) AS v FROM events
                           WHERE event_type = 'purchase')),
          g2 AS (SELECT count(*) AS n2, CAST(sum(v) AS DOUBLE) AS s2,
                        CAST(sum(v * v) AS DOUBLE) AS ss2
                 FROM (SELECT CAST(value AS DECIMAL(18,6)) AS v FROM events
                       WHERE event_type = 'click')),
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
          WHERE jaro_winkler_similarity(a.nm, b.nm) >= 0.88"""
  )
}
