package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Vectorizers
import graft.aggregators.MonoidAggregators

/** Oracle-gated feature-engineering queries (reference §2.6-§2.7):
  * one-hot top-K pivot, imputation + null indicator, z-scaling,
  * bucketizing, percentile calibration, string indexing, and the
  * date-list pivot aggregations. Fit = window/agg SQL the DuckDB oracle
  * replays exactly (same (-count, value) tiebreaks as the reference).
  */
object FeatureQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // smoothed mean target encoding: order priority vs total price,
    // shrunk toward the global mean (alpha = 25)
    "q139_target_encode" -> ((s, d) => {
      Vectorizers.targetEncode(Tables.orders(s, d), col("o_orderkey"),
          col("o_orderpriority"), col("o_totalprice"), alpha = 25.0)
        .select(col("id").as("o_orderkey"), col("cat").as("priority"), col("enc"))
    }),

    // leakage-safe variant: each order's encoding is fitted on the four
    // folds that exclude it (md5 fold assignment from the order key)
    "q144_target_encode_oof" -> ((s, d) => {
      Vectorizers.targetEncodeOOF(Tables.orders(s, d), col("o_orderkey"),
          col("o_orderpriority"), col("o_totalprice"), folds = 5, alpha = 25.0)
        .select(col("id").as("o_orderkey"), col("cat").as("priority"),
          col("fold"), col("enc"))
    }),

    // percentile clipping (winsorization) of the heavy-tailed price
    "q170_winsorize" -> ((s, d) => {
      val li = Tables.lineitem(s, d).withColumn("rid",
        concat_ws("-", col("l_orderkey"), col("l_linenumber")))
      Vectorizers.winsorize(li, col("rid"), col("l_extendedprice"),
          lo = 0.05, hi = 0.95)
        .withColumnRenamed("id", "rid")
    }),

    // exact percent-rank normalization, no global sort
    "q166_quantile_rank" -> ((s, d) => {
      Vectorizers.quantileRank(Tables.orders(s, d), col("o_orderkey"),
          col("o_totalprice"))
        .withColumnRenamed("id", "o_orderkey")
    }),

    // outlier-resistant scaling: (v - median) / IQR
    "q147_robust_scale" -> ((s, d) => {
      Vectorizers.robustScale(Tables.orders(s, d), col("o_orderkey"),
          col("o_totalprice"))
        .withColumnRenamed("id", "o_orderkey")
    }),

    "q29_onehot_topk" -> ((s, d) => {
      Vectorizers.oneHotTopK(Tables.orders(s, d),
          col("o_orderkey"), col("o_orderpriority"), k = 3, minSupport = 10)
        .withColumnRenamed("id", "o_orderkey")
    }),

    // IntegralVectorizer setFillWithMode (reference
    // IntegralVectorizer.scala:77 / SequenceAggregators.ModeSeqNullInt):
    // most-frequent value fills nulls, ties to the smallest value;
    // quantity 1 treated as missing so the fill path fires
    "q94_impute_mode" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("rid"),
          nullif(col("l_quantity").cast("long"), lit(1L)).as("qty"))
      Vectorizers.imputeMode(li, col("rid"), col("qty"))
        .select(col("id").as("rid"), col("imputed"), col("is_null"))
    }),

    // DecisionTreeNumericMapBucketizer (reference
    // DecisionTreeNumericMapBucketizer.scala): per-key supervised splits
    // on a numeric map against a binary label; spark.ml's candidate
    // binning is sample/sketch-based, so the fitted thresholds are not
    // SQL-replayable → rows-only check (spec-gated in CvCutSpec), with
    // q511_gini_stump_map as the HASH-GATED exact companion fit
    "q95_dt_map_bucketize" -> ((s, d) => {
      import graft.workflow._
      // the synthetic columns are mutually independent, so the label is
      // derived from the price key (totalprice > ~median): that key
      // fits informative splits while the constant key takes the
      // reference's shouldSplit=false path in the same query
      val li = Tables.orders(s, d)
        .select(col("o_orderkey").as("rid"),
          map(lit("price"), col("o_totalprice").cast("double"),
              lit("flat"), lit(1.0)).as("nm"),
          (col("o_totalprice") > 250000).cast("double").as("y"))
      val fMap = Feature.raw("nm", FeatureKind.RealMapK)
      val fLab = Feature.raw("y", FeatureKind.RealK, isResponse = true)
      val st = Stages.decisionTreeMapBucketize(fMap, fLab, "nm_b")
      val model = new Workflow(st.outputFeatures).fit(li)
      model.score(li, keep = Seq("rid"))
        .select(col("rid"), posexplode(col("nm_b")).as(Seq("slot", "value")))
    }),

    // exact Gini-stump per-key supervised split — the HASH-GATED
    // companion to q95's spark.ml tree fit (q455's PCA pattern): same
    // synthetic map + label, but the split search is exact over the
    // value domain so the oracle replays it; the constant 'flat' key
    // exercises the shouldSplit=false null-threshold path
    "q511_gini_stump_map" -> ((s, d) => {
      val li = Tables.orders(s, d)
        .select(col("o_orderkey").as("rid"),
          map(lit("price"), col("o_totalprice").cast("double"),
              lit("flat"), lit(1.0)).as("nm"),
          (col("o_totalprice") > 250000).cast("long").as("y"))
      Vectorizers.giniStumpMapSplits(li, col("nm"), col("y"))
    }),

    "q30_impute_indicator" -> ((s, d) => {
      // treat zero discount as missing: exercises fill + indicator on a
      // table with no physical nulls
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_discount"), lit(0.0)).as("disc"))
      Vectorizers.imputeMean(
          li.withColumn("rid", concat_ws("-", col("l_orderkey"), col("l_linenumber"))),
          col("rid"), col("disc"))
        .select(col("id").as("rid"), round(col("imputed"), 6).as("imputed"), col("is_null"))
    }),

    "q31_standard_scale" -> ((s, d) => {
      Vectorizers.standardScale(Tables.orders(s, d), col("o_orderkey"), col("o_totalprice"))
        .select(col("id").as("o_orderkey"), round(col("z"), 6).as("z"))
    }),

    "q32_bucketize" -> ((s, d) => {
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        Vectorizers.bucketize(col("l_quantity"), Seq(0, 10, 25, 40, 51)).as("qty_bucket"))
    }),

    "q33_percentile" -> ((s, d) => {
      Vectorizers.percentile100(Tables.orders(s, d), col("o_orderkey"), col("o_totalprice"))
        .select(col("id").as("o_orderkey"), col("pctile").as("price_pctile"))
    }),

    "q34_string_index" -> ((s, d) => {
      Vectorizers.stringIndex(Tables.customer(s, d), col("c_custkey"), col("c_mktsegment"))
        .select(col("id").as("c_custkey"), col("idx").as("segment_idx"))
    }),

    // remaining DateListVectorizer pivots: ModeMonth + ModeHour
    // (reference DateListVectorizer.scala pivot enum)
    "q67_datelist_modes" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          MonoidAggregators.modeString(month(col("ts")).cast("string")).cast("int").as("mode_month"),
          MonoidAggregators.modeString(hour(col("ts")).cast("string")).cast("int").as("mode_hour"))
    }),

    // OpSetVectorizer: multi-valued set pivot — per order the SET of
    // return flags, top-2 one-hot where a row can light several slots
    "q69_set_pivot" -> ((s, d) => {
      val sets = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_returnflag")).as("flags"))
      Vectorizers.setPivotVectorize(sets, col("l_orderkey"), col("flags"),
          k = 2, minSupport = 1)
        .withColumnRenamed("id", "l_orderkey")
    }),

    // Max/MinDateList + ConcatList monoids (reference Lists.scala:41-74):
    // per-row singleton date lists and (type, id) string lists, unioned
    // per user — extremes as one-element lists, concat ordered by id
    "q70_datelist_minmax_concat" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          array(unix_micros(col("ts"))).as("dl"),
          array(col("event_type"), col("event_id").cast("string")).as("lst"))
        .groupBy(col("user_id"))
        .agg(
          element_at(MonoidAggregators.maxDateList(col("dl")), 1).as("max_ts"),
          element_at(MonoidAggregators.minDateList(col("dl")), 1).as("min_ts"),
          array_join(MonoidAggregators.concatLists(col("lst"), col("event_id")), ",").as("trail"))
    }),

    // CombineVector monoid (reference OPVector.scala:43): concatenate
    // embeddings per label in vec_id order; gate on shape + endpoints
    // (exact float→double values, no float-sum order sensitivity)
    "q73_combine_vectors" -> ((s, d) => {
      val e = Tables.embeddings(s, d).where(col("vec_id") < 40)
        .select(col("label"), col("vec_id"),
          graft.operators.Similarity.toDouble(col("embedding")).as("emb"))
      e.groupBy(col("label"))
        .agg(MonoidAggregators.combineVectors(col("emb"), col("vec_id")).as("combined"))
        .select(col("label"), size(col("combined")).as("n_dims"),
          round(element_at(col("combined"), 1), 6).as("first_v"),
          round(element_at(col("combined"), size(col("combined"))), 6).as("last_v"))
    }),

    // GeolocationVectorizer (reference GeolocationVectorizer.scala):
    // fill-with-midpoint + null indicator over synthetic coordinates
    // with planted nulls on both the coords and the accuracy
    "q90_geo_vectorize" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_custkey"),
        when(col("c_custkey") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("c_acctbal") % 90).as("glat"),
        when(col("c_custkey") % 7 === 0, lit(null).cast("double"))
          .otherwise(((col("c_custkey") % 360) - 180).cast("double")).as("glon"),
        when(col("c_custkey") % 3 === 0, lit(null).cast("double"))
          .otherwise(col("c_nationkey").cast("double")).as("gacc"))
      Vectorizers.geolocationVectorize(c, col("c_custkey"),
          col("glat"), col("glon"), col("gacc"))
        .select(col("id").as("c_custkey"),
          round(col("lat"), 6).as("lat"), round(col("lon"), 6).as("lon"),
          round(col("accuracy"), 6).as("accuracy"), col("geo_isnull"))
    }),

    // GeolocationMidpoint monoid (reference aggregators/Geolocation.scala:43):
    // 3-D cartesian mean + best accuracy over synthetic per-customer
    // coordinates, grouped by segment
    "q78_geo_midpoint" -> ((s, d) => {
      val pts = Tables.customer(s, d).select(
        col("c_mktsegment").as("segment"),
        (col("c_acctbal") % 90).as("lat"),
        ((col("c_custkey") % 360) - 180).cast("double").as("lon"),
        col("c_nationkey").cast("double").as("acc"))
      pts.groupBy(col("segment"))
        .agg(udaf(MonoidAggregators.GeoMidpoint)
          .apply(col("lat"), col("lon"), col("acc")).as("mid"))
        .select(col("segment"),
          round(element_at(col("mid"), 1), 6).as("mid_lat"),
          round(element_at(col("mid"), 2), 6).as("mid_lon"),
          element_at(col("mid"), 3).as("best_acc"))
    }),

    // DateListVectorizer pivots (reference DateListVectorizer.scala):
    // SinceFirst / SinceLast vs a reference date + ModeDay(-of-week)
    "q35_datelist_pivot" -> ((s, d) => {
      val ref = to_timestamp(lit("2024-06-30 00:00:00"))
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          datediff(ref, min(col("ts"))).as("days_since_first"),
          datediff(ref, max(col("ts"))).as("days_since_last"),
          MonoidAggregators.modeString(dayofweek(col("ts")).cast("string")).as("mode_dow"))
    })
  )

  val oracles: Map[String, String] = Map(

    // exact Gini stump per map key: h = (pl²+ql²)/nl + (pr²+qr²)/nr as
    // ONE double division of exact integer stats → engine-independent
    // argmax; the 'flat' key has one distinct value → null threshold
    "q511_gini_stump_map" ->
      """WITH ex AS (
           SELECT 'price' AS key, CAST(o_totalprice AS DOUBLE) AS v,
                  CAST(o_totalprice > 250000 AS BIGINT) AS y
           FROM orders
           UNION ALL
           SELECT 'flat', 1.0, CAST(o_totalprice > 250000 AS BIGINT)
           FROM orders),
         pv AS (SELECT key, v, count(*) AS n,
                  CAST(sum(y) AS BIGINT) AS pos
                FROM ex GROUP BY 1, 2),
         tot AS (SELECT key, CAST(sum(n) AS BIGINT) AS nt,
                   CAST(sum(pos) AS BIGINT) AS pt
                 FROM pv GROUP BY 1),
         cum AS (SELECT key, v,
                   CAST(sum(n) OVER wk AS BIGINT) AS nl,
                   CAST(sum(pos) OVER wk AS BIGINT) AS pl
                 FROM pv
                 WINDOW wk AS (PARTITION BY key ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         cand AS (SELECT c.key, v, nl, pl, nt - nl AS nr, pt - pl AS pr,
                    nl - pl AS ql, (nt - nl) - (pt - pl) AS qr
                  FROM cum c JOIN tot t USING (key) WHERE nl < nt),
         sc AS (SELECT *,
                  CAST(CAST(nr AS HUGEINT) * (CAST(pl AS HUGEINT)*pl + CAST(ql AS HUGEINT)*ql)
                       + CAST(nl AS HUGEINT) * (CAST(pr AS HUGEINT)*pr + CAST(qr AS HUGEINT)*qr) AS DOUBLE)
                    / CAST(CAST(nl AS HUGEINT) * nr AS DOUBLE) AS h
                FROM cand),
         best AS (SELECT * FROM (
                    SELECT *, row_number() OVER
                      (PARTITION BY key ORDER BY h DESC, v ASC) AS rn
                    FROM sc) WHERE rn = 1)
         SELECT t.key, b.v AS threshold,
           b.nl AS n_left, b.pl AS pos_left,
           b.nr AS n_right, b.pr AS pos_right,
           ROUND((CAST(b.nl AS DOUBLE)
               - CAST(CAST(b.pl AS HUGEINT)*b.pl + CAST(b.ql AS HUGEINT)*b.ql AS DOUBLE)
                 / CAST(b.nl AS DOUBLE)
               + CAST(b.nr AS DOUBLE)
               - CAST(CAST(b.pr AS HUGEINT)*b.pr + CAST(b.qr AS HUGEINT)*b.qr AS DOUBLE)
                 / CAST(b.nr AS DOUBLE))
             / CAST(t.nt AS DOUBLE), 6) AS gini
         FROM tot t LEFT JOIN best b USING (key)""",

    "q170_winsorize" ->
      """WITH f AS (SELECT quantile_cont(l_extendedprice, 0.05) AS p_lo,
                      quantile_cont(l_extendedprice, 0.95) AS p_hi
                    FROM lineitem WHERE l_extendedprice IS NOT NULL)
         SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS rid,
           l_extendedprice AS value,
           ROUND(least(greatest(l_extendedprice, p_lo), p_hi), 6) AS clipped,
           CASE WHEN l_extendedprice < p_lo THEN 1 ELSE 0 END AS clipped_lo,
           CASE WHEN l_extendedprice > p_hi THEN 1 ELSE 0 END AS clipped_hi
         FROM lineitem CROSS JOIN f""",

    "q166_quantile_rank" ->
      """SELECT o_orderkey, o_totalprice AS value,
           ROUND(percent_rank() OVER (ORDER BY o_totalprice), 6) AS q
         FROM orders""",

    "q147_robust_scale" ->
      """WITH f AS (SELECT quantile_cont(o_totalprice, 0.5) AS med,
             quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.75) AS q3
           FROM orders WHERE o_totalprice IS NOT NULL)
         SELECT o_orderkey, o_totalprice AS value,
           ROUND((o_totalprice - med) /
             (CASE WHEN q3 - q1 = 0 THEN 1 ELSE q3 - q1 END), 6) AS scaled
         FROM orders CROSS JOIN f""",

    "q144_target_encode_oof" ->
      """WITH r AS (SELECT o_orderkey AS id, o_orderpriority AS cat,
             o_totalprice AS y,
             CAST(CAST(('0x' || substr(md5('oof|' || CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) % 5 AS INT) AS fold
           FROM orders),
          pf AS (SELECT cat, fold, count(*) AS n_cf, sum(y) AS s_cf
                 FROM r GROUP BY 1, 2),
          tot AS (SELECT cat, sum(n_cf) AS n_c, sum(s_cf) AS s_c
                  FROM pf GROUP BY 1),
          p AS (SELECT avg(o_totalprice) AS prior FROM orders)
          SELECT id AS o_orderkey, r.cat AS priority, r.fold,
            ROUND((s_c - s_cf + 25.0 * prior) / (n_c - n_cf + 25.0), 6) AS enc
          FROM r JOIN pf ON r.cat IS NOT DISTINCT FROM pf.cat
                        AND r.fold = pf.fold
          JOIN tot ON r.cat IS NOT DISTINCT FROM tot.cat
          CROSS JOIN p""",

    "q139_target_encode" ->
      """WITH t AS (SELECT o_orderpriority AS cat, count(*) AS n,
                      sum(o_totalprice) AS s
                    FROM orders GROUP BY 1),
          p AS (SELECT avg(o_totalprice) AS prior FROM orders)
          SELECT o_orderkey, o_orderpriority AS priority,
            ROUND((s + 25.0 * prior) / (n + 25.0), 6) AS enc
          FROM orders JOIN t ON o_orderpriority IS NOT DISTINCT FROM cat
          CROSS JOIN p""",

    "q70_datelist_minmax_concat" ->
      """SELECT user_id,
           epoch_us(MAX(ts)) AS max_ts, epoch_us(MIN(ts)) AS min_ts,
           STRING_AGG(event_type || ',' || CAST(event_id AS VARCHAR), ','
                      ORDER BY event_id) AS trail
         FROM events GROUP BY 1""",

    "q90_geo_vectorize" ->
      """WITH src AS (
           SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal % 90 END AS glat,
             CASE WHEN c_custkey % 7 = 0 THEN NULL
                  ELSE CAST((c_custkey % 360) - 180 AS DOUBLE) END AS glon,
             CASE WHEN c_custkey % 3 = 0 THEN NULL
                  ELSE CAST(c_nationkey AS DOUBLE) END AS gacc
           FROM customer),
         m AS (
           SELECT AVG(cos(radians(glat)) * cos(radians(glon))) AS x,
                  AVG(cos(radians(glat)) * sin(radians(glon))) AS y,
                  AVG(sin(radians(glat))) AS z,
                  MAX(COALESCE(gacc, 0.0)) AS macc
           FROM src WHERE glat IS NOT NULL AND glon IS NOT NULL)
         SELECT c_custkey,
           ROUND(COALESCE(glat, degrees(atan2(z, sqrt(x*x + y*y)))), 6) + 0 AS lat,
           ROUND(COALESCE(glon, degrees(atan2(y, x))), 6) + 0 AS lon,
           ROUND(COALESCE(gacc, macc), 6) AS accuracy,
           CASE WHEN glat IS NULL OR glon IS NULL THEN 1 ELSE 0 END AS geo_isnull
         FROM src CROSS JOIN m""",

    "q78_geo_midpoint" ->
      """WITH pts AS (
           SELECT c_mktsegment AS segment,
             radians(c_acctbal % 90) AS la,
             radians(CAST((c_custkey % 360) - 180 AS DOUBLE)) AS lo,
             CAST(c_nationkey AS DOUBLE) AS acc
           FROM customer),
         agg AS (
           SELECT segment,
             AVG(cos(la) * cos(lo)) AS x, AVG(cos(la) * sin(lo)) AS y,
             AVG(sin(la)) AS z, MAX(acc) AS best_acc
           FROM pts GROUP BY 1)
         SELECT segment,
           ROUND(degrees(atan2(z, sqrt(x*x + y*y))), 6) + 0 AS mid_lat,
           ROUND(degrees(atan2(y, x)), 6) + 0 AS mid_lon,
           best_acc
         FROM agg""",

    "q73_combine_vectors" ->
      """WITH e AS (
           SELECT label, vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           FROM embeddings WHERE vec_id < 40),
         g AS (
           SELECT label, flatten(list(emb ORDER BY vec_id)) AS combined
           FROM e GROUP BY label)
         SELECT label, CAST(len(combined) AS INT) AS n_dims,
           ROUND(combined[1], 6) AS first_v,
           ROUND(combined[len(combined)], 6) AS last_v
         FROM g""",

    // tiebreak is on the STRING form of the period (mode aggregator is
    // string-typed), hence CAST(... AS VARCHAR) in the ORDER BY
    "q67_datelist_modes" ->
      """WITH mc AS (
           SELECT user_id, CAST(MONTH(ts) AS VARCHAR) AS m, count(*) AS n
           FROM events GROUP BY 1, 2),
         mr AS (
           SELECT user_id, m,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, m ASC) AS rn
           FROM mc),
         hc AS (
           SELECT user_id, CAST(HOUR(ts) AS VARCHAR) AS h, count(*) AS n
           FROM events GROUP BY 1, 2),
         hr AS (
           SELECT user_id, h,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, h ASC) AS rn
           FROM hc)
         SELECT mr.user_id, CAST(mr.m AS INT) AS mode_month, CAST(hr.h AS INT) AS mode_hour
         FROM mr JOIN hr ON mr.user_id = hr.user_id AND mr.rn = 1 AND hr.rn = 1
         WHERE mr.rn = 1""",
    "q29_onehot_topk" ->
      """WITH fitted AS (
           SELECT value, ROW_NUMBER() OVER (ORDER BY cnt DESC, value ASC) AS rank
           FROM (SELECT o_orderpriority AS value, count(*) AS cnt FROM orders
                 WHERE o_orderpriority IS NOT NULL GROUP BY 1)
           WHERE cnt >= 10 QUALIFY rank <= 3)
         SELECT o_orderkey,
           CASE WHEN rank = 1 THEN 1 ELSE 0 END AS slot_1,
           CASE WHEN rank = 2 THEN 1 ELSE 0 END AS slot_2,
           CASE WHEN rank = 3 THEN 1 ELSE 0 END AS slot_3,
           CASE WHEN o_orderpriority IS NOT NULL AND rank IS NULL THEN 1 ELSE 0 END AS slot_other,
           CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END AS slot_null
         FROM orders LEFT JOIN fitted ON o_orderpriority = fitted.value""",

    "q94_impute_mode" ->
      """WITH src AS (
           SELECT l_orderkey || '-' || l_linenumber AS rid,
                  nullif(CAST(l_quantity AS BIGINT), 1) AS qty
           FROM lineitem),
         m AS (SELECT qty AS fill FROM src WHERE qty IS NOT NULL
               GROUP BY qty ORDER BY count(*) DESC, qty ASC LIMIT 1)
         SELECT rid, COALESCE(qty, fill) AS imputed,
                CASE WHEN qty IS NULL THEN 1 ELSE 0 END AS is_null
         FROM src CROSS JOIN m""",

    "q30_impute_indicator" ->
      """WITH src AS (
           SELECT l_orderkey || '-' || l_linenumber AS rid,
                  nullif(l_discount, 0.0) AS disc
           FROM lineitem),
         stats AS (SELECT AVG(disc) AS fill FROM src)
         SELECT rid, ROUND(COALESCE(disc, fill), 6) AS imputed,
                CASE WHEN disc IS NULL THEN 1 ELSE 0 END AS is_null
         FROM src CROSS JOIN stats""",

    "q31_standard_scale" ->
      """WITH stats AS (
           SELECT AVG(o_totalprice) AS mu, STDDEV_SAMP(o_totalprice) AS sigma FROM orders)
         SELECT o_orderkey, ROUND((o_totalprice - mu) / sigma, 6) AS z
         FROM orders CROSS JOIN stats""",

    "q32_bucketize" ->
      """SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity >= 40 AND l_quantity < 51 THEN 3
                WHEN l_quantity >= 25 AND l_quantity < 40 THEN 2
                WHEN l_quantity >= 10 AND l_quantity < 25 THEN 1
                WHEN l_quantity >= 0  AND l_quantity < 10 THEN 0
                ELSE NULL END AS qty_bucket
         FROM lineitem""",

    "q33_percentile" -> {
      val probs = (1 to 99).map(k => k / 100.0).mkString(", ")
      s"""WITH sp AS (SELECT quantile_cont(o_totalprice, [$probs]) AS ss FROM orders)
         SELECT o_orderkey,
           CAST(len(list_filter(ss, s -> o_totalprice >= s)) AS INT) AS price_pctile
         FROM orders CROSS JOIN sp"""
    },

    "q34_string_index" ->
      """WITH idx AS (
           SELECT value, ROW_NUMBER() OVER (ORDER BY cnt DESC, value ASC) - 1 AS segment_idx
           FROM (SELECT c_mktsegment AS value, count(*) AS cnt FROM customer
                 WHERE c_mktsegment IS NOT NULL GROUP BY 1))
         SELECT c_custkey, segment_idx
         FROM customer LEFT JOIN idx ON c_mktsegment = idx.value""",

    "q69_set_pivot" ->
      """WITH sets AS (
           SELECT l_orderkey, list_distinct(list(l_returnflag)) AS s
           FROM lineitem GROUP BY 1),
         ex AS (SELECT unnest(s) AS value FROM sets),
         counts AS (
           SELECT value, count(*) AS cnt FROM ex
           WHERE value IS NOT NULL GROUP BY 1 HAVING count(*) >= 1),
         ranked AS (
           SELECT value, ROW_NUMBER() OVER (ORDER BY cnt DESC, value ASC) AS rank
           FROM counts QUALIFY rank <= 2),
         tops AS (
           SELECT (SELECT value FROM ranked WHERE rank = 1) AS a,
                  (SELECT value FROM ranked WHERE rank = 2) AS b)
         SELECT l_orderkey,
           CASE WHEN list_contains(s, a) THEN 1 ELSE 0 END AS slot_1,
           CASE WHEN list_contains(s, b) THEN 1 ELSE 0 END AS slot_2,
           CASE WHEN len(list_filter(s, x ->
                  x IS DISTINCT FROM a AND x IS DISTINCT FROM b)) > 0
                THEN 1 ELSE 0 END AS slot_other,
           CASE WHEN s IS NULL OR len(s) = 0 THEN 1 ELSE 0 END AS slot_null
         FROM sets CROSS JOIN tops""",

    "q35_datelist_pivot" ->
      """WITH ref AS (SELECT TIMESTAMP '2024-06-30 00:00:00' AS r),
         base AS (
           SELECT user_id,
             date_diff('day', CAST(min(ts) AS DATE), DATE '2024-06-30') AS days_since_first,
             date_diff('day', CAST(max(ts) AS DATE), DATE '2024-06-30') AS days_since_last
           FROM events GROUP BY user_id),
         dowc AS (
           SELECT user_id, dow, count(*) AS n
           FROM (SELECT user_id, CAST(dayofweek(ts) + 1 AS VARCHAR) AS dow FROM events)
           GROUP BY 1, 2),
         moded AS (
           SELECT user_id, dow AS mode_dow,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, dow ASC) AS rn
           FROM dowc)
         SELECT b.user_id, b.days_since_first, b.days_since_last, m.mode_dow
         FROM base b JOIN moded m ON b.user_id = m.user_id AND m.rn = 1"""
  )
}
