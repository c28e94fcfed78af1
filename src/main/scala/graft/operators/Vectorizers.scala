package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fit-then-transform vectorization operators (reference §2.6): one-hot
  * top-K pivot, imputation with null indicators, standard scaling,
  * bucketizing, percentile calibration, string indexing. The "fit" pass
  * is an aggregation (counts / moments / quantiles) joined back to the
  * rows — both halves stay declarative so Catalyst plans one broadcast
  * join of tiny fitted stats against the full table.
  *
  * Determinism conventions copied from the reference:
  * top-K and indexer order is (-count, value) — count desc, value asc —
  * (reference OpOneHotVectorizer.scala:103, OpStringIndexer freq order);
  * indicator slots append Other then Null (TransmogrifierDefaults).
  *
  * Scale: fitted stats are O(cardinality) / O(1) rows — always
  * broadcastable; the transform side is a row-local projection.
  */
object Vectorizers {

  /** Total-order row numbers without a single-partition window:
    * range-partitioned sort, then per-partition offsets (zipWithIndex).
    * Scales to any cardinality — used to rank fitted distinct-value
    * tables, where a global `row_number().over(Window.orderBy(...))`
    * would collapse to one partition. 1-based and LongType like
    * row_number (an Int would silently wrap past 2^31 rows). */
  def withRowNumber(df: DataFrame, sort: Seq[Column], out: String): DataFrame = {
    val sorted = df.orderBy(sort: _*)
    val schema = sorted.schema.add(out, org.apache.spark.sql.types.LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Fit half of the one-hot pivot: values with support >= minSupport,
    * ranked 1..k by (count desc, value asc). */
  def topKByCount(df: DataFrame, value: Column, k: Int, minSupport: Long): DataFrame = {
    val counts = df.groupBy(value.as("value")).agg(count(lit(1)).as("cnt"))
      .where(col("value").isNotNull && col("cnt") >= minSupport)
    // TakeOrdered top-k (per-partition heads, never a global sort of
    // the vocabulary), then rank with a window DIRECTLY on the limit's
    // single-partition output: input is <= k rows by construction, so
    // the unpartitioned window adds no exchange and no scale risk —
    // and no RDD zipWithIndex round-trip (extra job, codegen break).
    counts.orderBy(col("cnt").desc, col("value").asc).limit(k)
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(col("cnt").desc, col("value").asc)).cast("long"))
      .select(col("value"), col("rank"))
  }

  /** Transform half: indicator columns slot_1..slot_k plus slot_other
    * (non-null value outside top-K) and slot_null. */
  def oneHotColumns(valueInRow: Column, rankCol: Column, k: Int): Seq[Column] =
    (1 to k).map(i => when(rankCol === i, 1).otherwise(0).as(s"slot_$i")) ++ Seq(
      when(valueInRow.isNotNull && rankCol.isNull, 1).otherwise(0).as("slot_other"),
      when(valueInRow.isNull, 1).otherwise(0).as("slot_null"))

  /** One-hot top-K pivot of `value`, keyed by `id`. One broadcast join. */
  def oneHotTopK(df: DataFrame, id: Column, value: Column, k: Int, minSupport: Long): DataFrame = {
    val fitted = topKByCount(df, value, k, minSupport)
    df.select(id.as("id"), value.as("value"))
      .join(broadcast(fitted), Seq("value"), "left")
      .select(col("id") +: oneHotColumns(col("value"), col("rank"), k): _*)
  }

  /** Exact supervised depth-1 split (Gini stump) per numeric-map key —
    * the SQL-replayable companion to the spark.ml tree behind
    * [[graft.workflow.MLStages.decisionTreeMapBuckets]] (whose
    * sample/sketch-based candidate binning an oracle cannot replay).
    * Per key: candidate thresholds are the distinct values; the pick
    * minimizes weighted Gini, which equals maximizing
    * h = (pl²+ql²)/nl + (pr²+qr²)/nr. h is evaluated as ONE double
    * division of exact integer sufficient statistics, so the argmax is
    * engine-independent; ties break on the smallest threshold. A key
    * with a single distinct value takes the shouldSplit=false path
    * (null threshold) — the reference's no-informative-split case.
    *
    * Scale: one explode + one (key, value) groupBy; the prefix counts
    * run in a window PARTITIONED BY KEY over the per-key value domain;
    * the per-key totals frame is key-domain bounded and broadcast.
    * Emits (key, threshold, n_left, pos_left, n_right, pos_right,
    * gini). */
  def giniStumpMapSplits(df: DataFrame, m: Column, label: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(explode(m).as(Seq("key", "v")),
      label.cast("long").as("y"))
    val pv = base.groupBy(col("key"), col("v"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    val tot = pv.groupBy(col("key"))
      .agg(sum(col("n")).as("nt"), sum(col("pos")).as("pt"))
    val wk = Window.partitionBy(col("key")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cand = pv
      .withColumn("nl", sum(col("n")).over(wk))
      .withColumn("pl", sum(col("pos")).over(wk))
      .join(broadcast(tot), Seq("key"))
      .where(col("nl") < col("nt"))
      .withColumn("nr", col("nt") - col("nl"))
      .withColumn("pr", col("pt") - col("pl"))
      .withColumn("ql", col("nl") - col("pl"))
      .withColumn("qr", col("nr") - col("pr"))
      // widen to decimal(38,0) BEFORE multiplying: h's numerator grows as
      // n^3 per key, which silently wraps a (non-ANSI) BIGINT once a key
      // holds ~2M+ rows — fatal at 100 TB. decimal(38,0) is exact to
      // ~4.6e12 rows per key; the oracle mirrors with HUGEINT.
      .withColumn("h",
        (col("nr").cast("decimal(38,0)") *
          (col("pl").cast("decimal(38,0)") * col("pl") +
           col("ql").cast("decimal(38,0)") * col("ql")) +
         col("nl").cast("decimal(38,0)") *
          (col("pr").cast("decimal(38,0)") * col("pr") +
           col("qr").cast("decimal(38,0)") * col("qr")))
          .cast("double") /
        (col("nl").cast("decimal(38,0)") * col("nr")).cast("double"))
    val rw = Window.partitionBy(col("key")).orderBy(col("h").desc, col("v").asc)
    val best = cand.withColumn("rn", row_number().over(rw)).where(col("rn") === 1)
    tot.join(best.select(col("key"), col("v"), col("nl"), col("pl"),
        col("nr"), col("pr"), col("ql"), col("qr")), Seq("key"), "left")
      .select(col("key"), col("v").as("threshold"),
        col("nl").as("n_left"), col("pl").as("pos_left"),
        col("nr").as("n_right"), col("pr").as("pos_right"),
        round((col("nl").cast("double") -
          (col("pl").cast("decimal(38,0)") * col("pl") +
           col("ql").cast("decimal(38,0)") * col("ql")).cast("double") /
            col("nl").cast("double") +
          col("nr").cast("double") -
          (col("pr").cast("decimal(38,0)") * col("pr") +
           col("qr").cast("decimal(38,0)") * col("qr")).cast("double") /
            col("nr").cast("double")) / col("nt").cast("double"), 6)
          .as("gini"))
  }

  /** Mean-impute `value` (nulls filled with the non-null mean) plus a
    * null indicator — the RealVectorizer trackNulls convention. */
  def imputeMean(df: DataFrame, id: Column, value: Column): DataFrame = {
    val stats = df.agg(avg(value).as("fill"))
    df.select(id.as("id"), value.as("value")).crossJoin(broadcast(stats))
      .select(col("id"),
        coalesce(col("value"), col("fill")).as("imputed"),
        when(col("value").isNull, 1).otherwise(0).as("is_null"))
  }

  /** Mode-impute for INTEGRAL features (reference
    * IntegralVectorizer.scala:77 setFillWithMode backed by
    * SequenceAggregators.ModeSeqNullInt:100): nulls filled with the most
    * frequent non-null value, ties broken by the SMALLEST value,
    * all-null column → 0 — plus the trackNulls indicator. Fit = one
    * groupBy + top-1 (O(1) rows to the driver); transform folds the
    * mode in as a literal. */
  def imputeMode(df: DataFrame, id: Column, value: Column): DataFrame = {
    val top = df.where(value.isNotNull)
      .groupBy(value.cast("long").as("v")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("v").asc).limit(1)
      .collect()
    val fill = if (top.isEmpty) 0L else top(0).getLong(0)
    df.select(id.as("id"),
      coalesce(value.cast("long"), lit(fill)).as("imputed"),
      when(value.isNull, 1).otherwise(0).as("is_null"))
  }

  /** Z-normalize: (x - mean) / stddev_samp (OpScalarStandardScaler). */
  def standardScale(df: DataFrame, id: Column, value: Column): DataFrame = {
    val stats = df.agg(avg(value).as("mu"), stddev_samp(value).as("sigma"))
    df.select(id.as("id"), value.as("value")).crossJoin(broadcast(stats))
      .select(col("id"), ((col("value") - col("mu")) / col("sigma")).as("z"))
  }

  /** Fixed-split bucketizer: index of the right-open interval
    * [splits(i), splits(i+1)) containing x; below-first → 0-th bucket
    * "underflow" not tracked (reference NumericBucketizer inclusion
    * convention: left-closed right-open). Null → null. */
  def bucketize(value: Column, splits: Seq[Double]): Column =
    splits.sliding(2).zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (Seq(lo, hi), i)) => when(value >= lo && value < hi, i).otherwise(acc)
    }

  /** Percentile calibration into [0, 99] (reference PercentileCalibrator
    * via QuantileDiscretizer(100)): fit = ONE exact-percentile
    * aggregation producing the 99 interior quantile splits — no global
    * sort, no single-partition window; transform = row-local count of
    * fitted splits <= x, folded in as literals. Spark's exact
    * `percentile` interpolation is bit-identical to DuckDB's
    * quantile_cont (verified empirically), so the oracle replays the
    * fit. Null value → null percentile. */
  def percentile100(df: DataFrame, id: Column, value: Column): DataFrame = {
    val probs = (1 to 99).map(k => k / 100.0)
    val src = df.select(id.as("id"), value.as("v"))
    // ONE action: the exact-percentile fit stays a plan branch that
    // broadcasts a single row carrying the 99 splits — no driver
    // collect, no second job. The rank is still 99 plain comparisons
    // summed (element_at on the broadcast array is codegen'd), not an
    // array-lambda filter, which would run interpreted per row.
    val splits = src.agg(expr(
      s"percentile(v, array(${probs.mkString(",")}))").as("ss"))
    val rank = (1 to 99)
      .map(i => when(col("v") >= element_at(col("ss"), i), 1).otherwise(0))
      .reduce(_ + _)
    src.crossJoin(broadcast(splits))
      .select(col("id"), when(col("v").isNotNull, rank).as("pctile"))
  }

  /** IndexToString inverse of [[stringIndex]] (reference OpIndexToString /
    * PredictionDeIndexer): map indices back to their labels via the same
    * fitted (value, idx) frame, broadcast-joined. Unknown index → null
    * (the NoFilter variant's behavior). */
  def deindex(df: DataFrame, id: Column, indexed: Column, fitted: DataFrame): DataFrame =
    df.select(id.as("id"), indexed.as("idx"))
      .join(broadcast(fitted), Seq("idx"), "left")
      .select(col("id"), col("value").as("label"))

  /** Geolocation vectorizer (reference GeolocationVectorizer.scala):
    * fit the geodesic midpoint (3-D cartesian mean via GeoMidpoint),
    * fill missing lat/lon/accuracy with it, emit a null indicator. */
  def geolocationVectorize(df: DataFrame, id: Column,
                           lat: Column, lon: Column, acc: Column): DataFrame = {
    val midRow = df.where(lat.isNotNull && lon.isNotNull)
      .agg(org.apache.spark.sql.functions.udaf(
        graft.aggregators.MonoidAggregators.GeoMidpoint,
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Double, Double)]()
      ).apply(lat, lon, coalesce(acc, lit(0.0))).as("mid"))
      .head.getSeq[Double](0)
    val (mLat, mLon, mAcc) =
      if (midRow.isEmpty) (0.0, 0.0, 0.0) else (midRow(0), midRow(1), midRow(2))
    df.select(id.as("id"),
      coalesce(lat, lit(mLat)).as("lat"),
      coalesce(lon, lit(mLon)).as("lon"),
      coalesce(acc, lit(mAcc)).as("accuracy"),
      when(lat.isNull || lon.isNull, 1).otherwise(0).as("geo_isnull"))
  }

  /** OpSetVectorizer (reference OpOneHotVectorizer.scala:164): one-hot
    * pivot of a SET-valued column — fit counts each value's document
    * frequency (explode + groupBy, one shuffle), keep top-K >= minSupport
    * with the (count desc, value asc) order; transform marks slot i when
    * the set CONTAINS value i (sets can light several slots, unlike the
    * scalar pivot), plus Other (any non-top element) and Null/empty. */
  def setPivotVectorize(df: DataFrame, id: Column, set: Column,
                        k: Int, minSupport: Long): DataFrame = {
    val counts = df.select(explode(set).as("value"))
      .groupBy(col("value")).agg(count(lit(1)).as("cnt"))
      .where(col("value").isNotNull && col("cnt") >= minSupport)
    val fitted = withRowNumber(counts, Seq(col("cnt").desc, col("value").asc), "rank")
      .where(col("rank") <= k)
      .collect().map(r => r.getString(0)).toSeq
    val slots = fitted.zipWithIndex.map { case (v, i) =>
      when(array_contains(set, v), 1).otherwise(0).as(s"slot_${i + 1}")
    } ++ (fitted.length + 1 to k).map(i => lit(0).as(s"slot_$i"))
    df.select(id.as("id") +: (slots ++ Seq(
      when(set.isNotNull &&
        size(array_except(set, lit(fitted.toArray))) > 0, 1).otherwise(0).as("slot_other"),
      when(set.isNull || size(set) === 0, 1).otherwise(0).as("slot_null"))): _*)
  }

  /** Fitted (value, idx) table: 0-based index by (count desc, value asc). */
  def stringIndexTable(df: DataFrame, value: Column): DataFrame = {
    val counts = df.where(value.isNotNull)
      .groupBy(value.as("value")).agg(count(lit(1)).as("cnt"))
    withRowNumber(counts, Seq(col("cnt").desc, col("value").asc), "rn")
      .select(col("value"), (col("rn") - 1).as("idx"))
  }

  /** StringIndexer: 0-based index by (count desc, value asc). */
  def stringIndex(df: DataFrame, id: Column, value: Column): DataFrame = {
    val idx = stringIndexTable(df, value)
    df.select(id.as("id"), value.as("value"))
      .join(broadcast(idx), Seq("value"), "left")
      .select(col("id"), col("value"), col("idx"))
  }

  /** Smoothed mean target encoding: each category maps to
    * `(sum_label + alpha * prior) / (n + alpha)` with prior = the global
    * label mean — the shrinkage form that keeps rare categories near the
    * prior instead of memorizing their few labels. Fit is one groupBy
    * producing an O(#categories) table, broadcast back over the rows
    * (null-safe, so a null category is its own level); the 1-row prior
    * frame rides the same broadcast. No leave-one-out split here — at
    * fit/score separation the caller encodes the scoring frame with a
    * table fitted on train only. */
  def targetEncode(df: DataFrame, id: Column, cat: Column, label: Column,
                   alpha: Double = 10.0): DataFrame = {
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    val table = df.groupBy(cat.as("cat"))
      .agg(count(lit(1)).as("n"), sum(label.cast("double")).as("s"))
    val prior = df.agg(avg(label.cast("double")).as("prior"))
    df.select(id.as("id"), cat.as("__cat"))
      .join(broadcast(table), col("__cat") <=> col("cat"))
      .crossJoin(broadcast(prior))
      .select(col("id"), col("__cat").as("cat"),
        round((col("s") + lit(alpha) * col("prior")) / (col("n") + lit(alpha)), 6)
          .as("enc"))
  }

  /** Hashed interaction (cross) features: the hashing-trick encoding of
    * a categorical CONJUNCTION — bucket = md5(colA + sep + a + sep +
    * colB + sep + b) % dims, emitted sparse as (id, bucket) rows. The
    * cross space (|A|·|B| levels) never materializes a vocabulary: fit
    * is nothing, transform is a codegen'd projection, and downstream
    * models consume the sparse rows exactly like hashed tf. Null levels
    * encode as their own token, so null×x interactions stay
    * distinguishable. */
  def hashedInteraction(df: DataFrame, id: Column,
                        a: (String, Column), b: (String, Column),
                        dims: Int): DataFrame = {
    import graft.functions.TextAnalysis.hash60
    require(dims >= 2, s"dims must be >= 2, got $dims")
    val key = concat_ws("|", lit(a._1),
      coalesce(a._2.cast("string"), lit(" null")), lit(b._1),
      coalesce(b._2.cast("string"), lit(" null")))
    df.select(id.as("id"),
      pmod(hash60(key), lit(dims)).cast("int").as("bucket"))
  }

  /** Winsorization (percentile clipping): values below the `lo` or above
    * the `hi` percentile clamp to those fences — the standard taming of
    * heavy-tailed features before scaling. Fit is one exact-percentile
    * aggregate (a 1-row frame broadcast back over the rows); transform
    * is a codegen'd projection; emits the clip flags so downstream
    * audits can count affected rows. */
  def winsorize(df: DataFrame, id: Column, value: Column,
                lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1: $lo, $hi")
    val fit = df.where(value.isNotNull)
      .agg(percentile(value, lit(lo)).as("p_lo"),
        percentile(value, lit(hi)).as("p_hi"))
    df.select(id.as("id"), value.as("value"))
      .crossJoin(broadcast(fit))
      .select(col("id"), col("value"),
        round(least(greatest(col("value"), col("p_lo")), col("p_hi")), 6)
          .as("clipped"),
        when(col("value") < col("p_lo"), 1).otherwise(0).as("clipped_lo"),
        when(col("value") > col("p_hi"), 1).otherwise(0).as("clipped_hi"))
  }

  /** Exact quantile-rank (percent-rank) normalization: each row's value
    * maps to (#values strictly below) / (n - 1) in [0, 1] — the
    * rank/quantile transform GBDT and calibration pipelines use when a
    * feature's scale is meaningless but its order matters. Exact and
    * global with NO global sort: distinct-value counts feed the
    * two-level cumulative sum ([[graft.operators.DataQuality.cumulativeByValue]]),
    * strictly-below counts come from cum - own, and rows join back on
    * the value. Ties share a rank, matching SQL percent_rank. The
    * value-keyed join back means a single dominant constant is a skew
    * key — salt via [[Skew]] if one value dominates a 100 TB column.
    * Null values pass through with null rank. Emits (id, value, q). */
  /** Per-group median imputation: nulls fill with their group's exact
    * interpolated median; groups with no observed values fall back to
    * the global median. One per-group percentile aggregate (broadcast
    * back) + one 1-row global fallback — the grouped upgrade of
    * [[imputeMean]]'s fit/transform split, for data-repair pipelines
    * where subpopulations differ too much for one global fill. Emits
    * the input with `out` (imputed value) and `out_isnull` indicator. */
  def imputeGroupMedian(df: DataFrame, group: Column, value: Column,
                        out: String): DataFrame = {
    val gm = df.where(value.isNotNull)
      .groupBy(group.as("__g"))
      .agg(percentile(value.cast("double"), lit(0.5)).as("__gmed"))
    val glob = df.where(value.isNotNull)
      .agg(percentile(value.cast("double"), lit(0.5)).as("__allmed"))
    df.join(broadcast(gm), group === col("__g"), "left")
      .crossJoin(broadcast(glob))
      .withColumn(out, coalesce(value.cast("double"), col("__gmed"),
        col("__allmed")))
      .withColumn(s"${out}_isnull", value.isNull.cast("int"))
      .drop("__g", "__gmed", "__allmed")
  }

  def quantileRank(df: DataFrame, id: Column, value: Column): DataFrame = {
    val rows = df.select(id.as("id"), value.cast("double").as("v"))
    val counts = rows.where(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val below = graft.operators.DataQuality.cumulativeByValue(counts, Seq("c"))
      .join(counts, "v")
      .select(col("v"), (col("cum_c") - col("c")).as("below"))
    val n = counts.agg(sum(col("c")).cast("double").as("n"))
    rows.join(below, Seq("v"), "left").crossJoin(broadcast(n))
      .select(col("id"), col("v").as("value"),
        when(col("v").isNull, lit(null).cast("double"))
          .when(col("n") <= 1, 0.0)
          .otherwise(round(col("below") / (col("n") - 1), 6)).as("q"))
  }

  /** Robust scaling: (v - median) / IQR — the outlier-resistant
    * alternative to [[standardScale]] (a handful of extreme values move
    * mean/stddev arbitrarily but barely touch the quartiles). Fit is one
    * exact-percentile aggregate (1 row) broadcast back; a degenerate
    * IQR of 0 falls back to divisor 1 so constant-ish columns pass
    * through centered. */
  def robustScale(df: DataFrame, id: Column, value: Column): DataFrame = {
    val fit = df.where(value.isNotNull)
      .agg(percentile(value, lit(0.5)).as("med"),
        percentile(value, lit(0.25)).as("q1"),
        percentile(value, lit(0.75)).as("q3"))
      .select(col("med"),
        when(col("q3") - col("q1") === 0, 1.0)
          .otherwise(col("q3") - col("q1")).as("iqr"))
    df.select(id.as("id"), value.as("value"))
      .crossJoin(broadcast(fit))
      .select(col("id"), col("value"),
        round((col("value") - col("med")) / col("iqr"), 6).as("scaled"))
  }

  /** Out-of-fold target encoding: the leakage-safe form — each row's
    * encoding is fitted on every fold EXCEPT its own, so a row's label
    * never contributes to its own feature. Folds are md5-assigned from
    * the row id (deterministic: the same row lands in the same fold on
    * any cluster, and the oracle replays the assignment). Fit is one
    * groupBy((cat, fold)) producing an O(#categories · folds) table;
    * per-row encoding subtracts the own-fold slice from the category
    * totals — all fit frames broadcast, the row side never reshuffles.
    * A category entirely inside one fold falls back to the prior. */
  def targetEncodeOOF(df: DataFrame, id: Column, cat: Column, label: Column,
                      folds: Int = 5, alpha: Double = 10.0,
                      salt: String = "oof"): DataFrame = {
    import graft.functions.TextAnalysis.hash60
    require(folds >= 2, s"folds must be >= 2, got $folds")
    val fold = pmod(hash60(concat(lit(salt), lit("|"), id.cast("string"))),
      lit(folds)).cast("int")
    val perFold = df.groupBy(cat.as("cat"), fold.as("fold"))
      .agg(count(lit(1)).as("n_cf"), sum(label.cast("double")).as("s_cf"))
    val totals = perFold.groupBy(col("cat"))
      .agg(sum(col("n_cf")).as("n_c"), sum(col("s_cf")).as("s_c"))
    val prior = df.agg(avg(label.cast("double")).as("prior"))
    df.select(id.as("id"), cat.as("__cat"), fold.as("__fold"))
      .join(broadcast(perFold),
        col("__cat") <=> perFold("cat") && col("__fold") === perFold("fold"))
      .drop("cat", "fold")
      .join(broadcast(totals), col("__cat") <=> totals("cat"))
      .drop("cat")
      .crossJoin(broadcast(prior))
      .select(col("id"), col("__cat").as("cat"), col("__fold").as("fold"),
        round((col("s_c") - col("s_cf") + lit(alpha) * col("prior")) /
          (col("n_c") - col("n_cf") + lit(alpha)), 6).as("enc"))
  }
}
