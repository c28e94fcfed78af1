package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.aggregators.MapAggregators
import graft.functions.MapFunctions
import graft.operators.MapVectorizers

/** Oracle-gated map-typed feature queries (reference Maps.scala
  * aggregators + RichMapFeature dsl + TextMapPivotVectorizer). The
  * synthetic tables carry no physical map columns, so each query first
  * CONSTRUCTS map columns from scalar columns (`map(...)`), exercises
  * the real map machinery (typed map-monoid Aggregators, higher-order
  * map functions, key-discovery pivot), and emits scalar/exploded rows
  * that DuckDB replays from the original columns.
  */
object MapQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // UnionSumLongMap: per-order map(returnflag -> quantity) summed
    "q49_map_union_sum" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          map(col("l_returnflag"), col("l_quantity").cast("long")).as("m"))
        .groupBy(col("l_orderkey"))
        .agg(MapAggregators.unionSumLongMap(col("m")).as("agg"))
        .select(col("l_orderkey"), explode(col("agg")).as(Seq("flag", "qty_sum")))
    }),

    // UnionMean/Min/MaxMap over the same key space, joined by explode +
    // element_at — three map monoids in ONE groupBy pass
    "q50_map_union_stats" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          map(col("l_returnflag"), col("l_quantity")).as("qm"),
          map(col("l_returnflag"), col("l_extendedprice")).as("pm"))
        .groupBy(col("l_orderkey"))
        .agg(
          MapAggregators.unionMeanMap(col("qm")).as("mmean"),
          MapAggregators.unionMinMap(col("pm")).as("mmin"),
          MapAggregators.unionMaxMap(col("pm")).as("mmax"))
        .select(col("l_orderkey"), col("mmin"), col("mmax"),
          explode(col("mmean")).as(Seq("flag", "mean_q")))
        .select(col("l_orderkey"), col("flag"),
          round(col("mean_q"), 6).as("qty_mean"),
          element_at(col("mmin"), col("flag")).as("price_min"),
          element_at(col("mmax"), col("flag")).as("price_max"))
    }),

    // FilterMap allow-list + PickListMap value normalization + DateMap
    // month period — all row-local higher-order map functions
    "q51_map_filter_transform" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"),
          map(lit("prio"), col("o_orderpriority"),
              lit("stat"), col("o_orderstatus")).as("tm"),
          map(lit("od"), col("o_orderdate")).as("dm"))
      o.select(col("o_orderkey"),
        MapFunctions.valueAt(
          MapFunctions.upperValues(MapFunctions.filterKeysAllow(col("tm"), Seq("prio"))),
          "prio").as("prio_u"),
        MapFunctions.valueAt(MapFunctions.filterKeysBlock(col("tm"), Seq("prio")), "stat").as("stat_v"),
        MapFunctions.valueAt(MapFunctions.monthOfYearValues(col("dm")), "od").as("od_month"))
    }),

    // UnionSetMap + UnionOrMap per customer
    "q52_map_union_set_or" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_custkey"),
          map(lit("prio"), col("o_orderpriority")).as("sm"),
          map(lit("big"), col("o_totalprice") > 100000).as("bm"))
        .groupBy(col("o_custkey"))
        .agg(
          MapAggregators.unionSetMap(col("sm")).as("sets"),
          MapAggregators.unionOrMap(col("bm")).as("ors"))
        .select(col("o_custkey"),
          array_join(element_at(col("sets"), "prio"), ",").as("prios"),
          element_at(col("ors"), "big").as("any_big"))
    }),

    // ConcatMapByTime: per user, per event-type, event ids concatenated
    // in event-time order (UnionConcatMap made deterministic)
    "q53_map_concat_bytime" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("tsm"),
          map(col("event_type"), col("event_id").cast("string")).as("m"))
        .groupBy(col("user_id"))
        .agg(MapAggregators.concatMapByTime(col("tsm"), col("m")).as("agg"))
        .select(col("user_id"), explode(col("agg")).as(Seq("etype", "trail")))
    }),

    // TextMapPivotVectorizer: keys discovered from the map, top-2 pivot
    // per key with Other + Null slots
    "q54_map_pivot" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"),
          map(lit("prio"), col("o_orderpriority"),
              lit("stat"), col("o_orderstatus")).as("tm"))
      MapVectorizers.textMapPivot(o, col("o_orderkey"), col("tm"), k = 2)
        .withColumnRenamed("id", "o_orderkey")
    }),

    // EmailToPickListMap / UrlMapToPickListMap + TextMapLen/Null
    // (reference EmailToPickListMapTransformer, UrlMapToPickListMap-
    // Transformer, TextMapLenEstimator, TextMapNullEstimator): email and
    // URL map values reduced to domains; per-key lengths and null
    // indicators (BUILDING nulled so the indicator path fires)
    "q71_map_text_transforms" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_custkey"),
          map(lit("e"), concat(lower(col("c_name")), lit("@"),
            lower(col("c_mktsegment")), lit(".com"))).as("em"),
          map(lit("u"), concat(lit("https://www."),
            lower(col("c_mktsegment")), lit(".com/a/b"))).as("um"),
          map(lit("n"), col("c_name"),
              lit("seg"), nullif(col("c_mktsegment"), lit("BUILDING"))).as("tm"))
      c.select(col("c_custkey"),
        MapFunctions.valueAt(MapFunctions.emailDomains(col("em")), "e").as("email_domain"),
        MapFunctions.valueAt(MapFunctions.urlDomains(col("um")), "u").as("url_domain"),
        MapFunctions.valueAt(MapFunctions.valueLengths(col("tm")), "n").as("name_len"),
        MapFunctions.valueAt(MapFunctions.nullIndicators(col("tm")), "seg").as("seg_null"))
    }),

    // TimePeriodMapTransformer family (reference TimePeriodMapTransformer
    // + DateMapToUnitCircleVectorizer): day-of-month/week/year, ISO week
    // and the month unit-circle encoding over a DateMap
    "q72_map_time_periods" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), map(lit("od"), col("o_orderdate")).as("dm"))
      o.select(col("o_orderkey"),
        MapFunctions.valueAt(MapFunctions.dayOfMonthValues(col("dm")), "od").as("dom"),
        MapFunctions.valueAt(MapFunctions.dayOfWeekValues(col("dm")), "od").as("dow"),
        MapFunctions.valueAt(MapFunctions.dayOfYearValues(col("dm")), "od").as("doy"),
        MapFunctions.valueAt(MapFunctions.weekOfYearValues(col("dm")), "od").as("woy"),
        round(element_at(
          MapFunctions.valueAt(MapFunctions.monthUnitCircleValues(col("dm")), "od"), 1), 6).as("m_sin"),
        round(element_at(
          MapFunctions.valueAt(MapFunctions.monthUnitCircleValues(col("dm")), "od"), 2), 6).as("m_cos"))
    }),

    // MultiPickListMapVectorizer (reference
    // MultiPickListMapVectorizer.scala:64): per-customer SETS of order
    // priorities/statuses as a set-valued map; top-3 pivot per key with
    // a counting Other slot and a Null slot (customers with no orders
    // have a null map, so the null path fires)
    "q93_multipicklist_map" -> ((s, d) => {
      val sets = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(collect_set(col("o_orderpriority")).as("prios"),
          collect_set(col("o_orderstatus")).as("stats"))
      val src = Tables.customer(s, d)
        .join(sets, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          when(col("prios").isNotNull,
            map(lit("prio"), col("prios"), lit("stat"), col("stats"))).as("mm"))
      MapVectorizers.multiPickListMapVectorize(src, col("c_custkey"), col("mm"), k = 3)
        .withColumnRenamed("id", "c_custkey")
    }),

    // RealMapVectorizer: numeric map, keys discovered at fit, each key
    // mean-imputed with a null indicator (zero discount treated as
    // missing so the fill path is exercised on a table with no nulls)
    "q68_map_real_vectorize" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("rid"),
          map(lit("qty"), col("l_quantity").cast("double"),
              lit("disc"), nullif(col("l_discount"), lit(0.0)).cast("double")).as("nm"))
      MapVectorizers.realMapVectorize(li, col("rid"), col("nm"))
        .select(col("id").as("rid"),
          round(col("qty_v"), 6).as("qty_v"), col("qty_null"),
          round(col("disc_v"), 6).as("disc_v"), col("disc_null"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q49_map_union_sum" ->
      """SELECT l_orderkey, l_returnflag AS flag,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
         FROM lineitem GROUP BY 1, 2""",

    "q50_map_union_stats" ->
      """SELECT l_orderkey, l_returnflag AS flag,
           ROUND(SUM(l_quantity) / COUNT(*), 6) AS qty_mean,
           MIN(l_extendedprice) AS price_min,
           MAX(l_extendedprice) AS price_max
         FROM lineitem GROUP BY 1, 2""",

    "q51_map_filter_transform" ->
      """SELECT o_orderkey, UPPER(o_orderpriority) AS prio_u,
           o_orderstatus AS stat_v,
           CAST(MONTH(o_orderdate) AS INT) AS od_month
         FROM orders""",

    "q52_map_union_set_or" ->
      """SELECT o_custkey,
           STRING_AGG(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS prios,
           BOOL_OR(o_totalprice > 100000) AS any_big
         FROM orders GROUP BY 1""",

    "q53_map_concat_bytime" ->
      """SELECT user_id, event_type AS etype,
           STRING_AGG(CAST(event_id AS VARCHAR), ',' ORDER BY ts, CAST(event_id AS VARCHAR)) AS trail
         FROM events GROUP BY 1, 2""",

    "q54_map_pivot" ->
      """WITH kv AS (
           SELECT 'prio' AS k, o_orderpriority AS v FROM orders WHERE o_orderpriority IS NOT NULL
           UNION ALL
           SELECT 'stat' AS k, o_orderstatus AS v FROM orders WHERE o_orderstatus IS NOT NULL),
         ranked AS (
           SELECT k, v, ROW_NUMBER() OVER (PARTITION BY k ORDER BY count(*) DESC, v ASC) AS r
           FROM kv GROUP BY k, v),
         p1 AS (SELECT v FROM ranked WHERE k = 'prio' AND r = 1),
         p2 AS (SELECT v FROM ranked WHERE k = 'prio' AND r = 2),
         s1 AS (SELECT v FROM ranked WHERE k = 'stat' AND r = 1),
         s2 AS (SELECT v FROM ranked WHERE k = 'stat' AND r = 2)
         SELECT o_orderkey,
           CASE WHEN o_orderpriority = (SELECT v FROM p1) THEN 1 ELSE 0 END AS prio_1,
           CASE WHEN o_orderpriority = (SELECT v FROM p2) THEN 1 ELSE 0 END AS prio_2,
           CASE WHEN o_orderpriority IS NOT NULL
                 AND o_orderpriority NOT IN ((SELECT v FROM p1), (SELECT v FROM p2))
                THEN 1 ELSE 0 END AS prio_other,
           CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END AS prio_null,
           CASE WHEN o_orderstatus = (SELECT v FROM s1) THEN 1 ELSE 0 END AS stat_1,
           CASE WHEN o_orderstatus = (SELECT v FROM s2) THEN 1 ELSE 0 END AS stat_2,
           CASE WHEN o_orderstatus IS NOT NULL
                 AND o_orderstatus NOT IN ((SELECT v FROM s1), (SELECT v FROM s2))
                THEN 1 ELSE 0 END AS stat_other,
           CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END AS stat_null
         FROM orders""",

    "q71_map_text_transforms" ->
      """SELECT c_custkey,
           lower(c_mktsegment) || '.com' AS email_domain,
           'www.' || lower(c_mktsegment) || '.com' AS url_domain,
           CAST(LENGTH(c_name) AS INT) AS name_len,
           CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS seg_null
         FROM customer""",

    "q72_map_time_periods" ->
      """SELECT o_orderkey,
           CAST(DAYOFMONTH(o_orderdate) AS INT) AS dom,
           CAST(DAYOFWEEK(o_orderdate) + 1 AS INT) AS dow,
           CAST(DAYOFYEAR(o_orderdate) AS INT) AS doy,
           CAST(WEEKOFYEAR(o_orderdate) AS INT) AS woy,
           ROUND(SIN((MONTH(o_orderdate) - 1) * 2 * PI() / 12), 6) + 0 AS m_sin,
           ROUND(COS((MONTH(o_orderdate) - 1) * 2 * PI() / 12), 6) + 0 AS m_cos
         FROM orders""",

    // fit = per-value count of DISTINCT customers whose set contains it
    // (set semantics: one count per row), rank (count desc, value asc);
    // other = |set| minus the number of top values it contains
    "q93_multipicklist_map" ->
      """WITH cp AS (SELECT DISTINCT o_custkey, o_orderpriority AS v FROM orders),
           cs AS (SELECT DISTINCT o_custkey, o_orderstatus AS v FROM orders),
           rp AS (SELECT v, ROW_NUMBER() OVER (ORDER BY count(*) DESC, v ASC) AS r
                  FROM cp GROUP BY v),
           rs AS (SELECT v, ROW_NUMBER() OVER (ORDER BY count(*) DESC, v ASC) AS r
                  FROM cs GROUP BY v),
           pl AS (SELECT o_custkey, list(DISTINCT o_orderpriority) AS vs FROM orders GROUP BY 1),
           sl AS (SELECT o_custkey, list(DISTINCT o_orderstatus) AS vs FROM orders GROUP BY 1),
           ind AS (
             SELECT c_custkey, pl.vs AS pvs, sl.vs AS svs,
               CASE WHEN list_contains(pl.vs, (SELECT v FROM rp WHERE r = 1)) THEN 1 ELSE 0 END AS p1,
               CASE WHEN list_contains(pl.vs, (SELECT v FROM rp WHERE r = 2)) THEN 1 ELSE 0 END AS p2,
               CASE WHEN list_contains(pl.vs, (SELECT v FROM rp WHERE r = 3)) THEN 1 ELSE 0 END AS p3,
               CASE WHEN list_contains(sl.vs, (SELECT v FROM rs WHERE r = 1)) THEN 1 ELSE 0 END AS s1,
               CASE WHEN list_contains(sl.vs, (SELECT v FROM rs WHERE r = 2)) THEN 1 ELSE 0 END AS s2,
               CASE WHEN list_contains(sl.vs, (SELECT v FROM rs WHERE r = 3)) THEN 1 ELSE 0 END AS s3
             FROM customer
               LEFT JOIN pl ON c_custkey = pl.o_custkey
               LEFT JOIN sl ON c_custkey = sl.o_custkey)
         SELECT c_custkey, p1 AS prio_1, p2 AS prio_2, p3 AS prio_3,
           CASE WHEN pvs IS NULL THEN 0 ELSE len(pvs) - (p1 + p2 + p3) END AS prio_other,
           CASE WHEN pvs IS NULL THEN 1 ELSE 0 END AS prio_null,
           s1 AS stat_1, s2 AS stat_2, s3 AS stat_3,
           CASE WHEN svs IS NULL THEN 0 ELSE len(svs) - (s1 + s2 + s3) END AS stat_other,
           CASE WHEN svs IS NULL THEN 1 ELSE 0 END AS stat_null
         FROM ind""",

    "q68_map_real_vectorize" ->
      """WITH src AS (
           SELECT l_orderkey || '-' || l_linenumber AS rid,
                  CAST(l_quantity AS DOUBLE) AS qty,
                  CAST(nullif(l_discount, 0.0) AS DOUBLE) AS disc
           FROM lineitem),
         stats AS (SELECT AVG(qty) AS mq, AVG(disc) AS md FROM src)
         SELECT rid,
           ROUND(COALESCE(qty, mq), 6) AS qty_v,
           CASE WHEN qty IS NULL THEN 1 ELSE 0 END AS qty_null,
           ROUND(COALESCE(disc, md), 6) AS disc_v,
           CASE WHEN disc IS NULL THEN 1 ELSE 0 END AS disc_null
         FROM src CROSS JOIN stats"""
  )
}
