package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis.hash60

/** Robust per-group regression fits: Huber IRLS and RANSAC. Both are
  * deterministic, oracle-replayable counterparts to the resistant-fit
  * utilities a feature-engineering pipeline wants next to the plain
  * OLS trend (q196) — the reference's SanityChecker derives only
  * non-robust moments (core/src/main/scala/com/salesforce/op/stages/
  * impl/preparators/SanityChecker.scala:523).
  *
  * Scale design: every fit is one groupBy over the grouping key plus a
  * bounded coefficient frame broadcast back for the next pass — series
  * count scales out, series LENGTH stays row-local arithmetic; no
  * window over the whole table, no driver-side math beyond the
  * coefficient frames the caller already bounds.
  */
object Robust {

  private def q6(c: Column): Column = round(c * lit(1e6)).cast("long")

  /** Huber-loss linear fit per key via `iters` IRLS rounds, starting
    * from exact-integer OLS. x and y must arrive integer-valued (cast
    * to long internally) so the init sums are exact; the IRLS rounds
    * fold 1e-6-quantized weighted terms in exact longs and the
    * coefficients cross rounds at 6 decimals — the same determinism
    * contract as [[DataQuality.logisticNewton]]. Weight w = min(1,
    * c/|resid|) (w=1 inside the c-band, downweighted outside). Emits
    * (key, n, a0, b0, a_fit, b_fit, n_down): the OLS start, the final
    * Huber coefficients, and how many points the last round
    * downweighted. */
  def huberIrls(df: DataFrame, key: Column, x: Column, y: Column,
                c: Double, iters: Int = 2): DataFrame = {
    require(c > 0 && iters >= 1 && iters <= 4,
      s"bad Huber params: c=$c iters=$iters")
    val rows = df.select(key.as("k"), x.cast("long").as("xl"),
        y.cast("long").as("yl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ols = rows.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("xl")).as("sx"),
        sum(col("yl")).as("sy"), sum(col("xl") * col("xl")).as("sxx"),
        sum(col("xl") * col("yl")).as("sxy"))
    val bRaw = (col("n") * col("sxy") - col("sx") * col("sy"))
      .cast("double") /
      (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val aRaw = (col("sy").cast("double") - bRaw * col("sx").cast("double")) /
      col("n").cast("double")
    var coef = ols.select(col("k"), col("n"),
      round(aRaw, 6).as("a"), round(bRaw, 6).as("b"))
    val first = coef.select(col("k"), col("a").as("a0"), col("b").as("b0"))
    var nDown: DataFrame = null
    for (_ <- 1 to iters) {
      val t = rows.join(broadcast(coef.select(col("k"), col("a"), col("b"))),
          Seq("k"))
        .withColumn("xd", col("xl").cast("double"))
        .withColumn("yd", col("yl").cast("double"))
        .withColumn("e", col("yd") - col("a") - col("b") * col("xd"))
        .withColumn("w", least(lit(1.0), lit(c) / abs(col("e"))))
      val st = t.groupBy(col("k"))
        .agg(count(lit(1)).as("n"),
          sum(q6(col("w"))).as("sw"),
          sum(q6(col("w") * col("xd"))).as("swx"),
          sum(q6(col("w") * col("xd") * col("xd"))).as("swxx"),
          sum(q6(col("w") * col("yd"))).as("swy"),
          sum(q6(col("w") * col("xd") * col("yd"))).as("swxy"),
          sum(when(col("w") < 1.0, 1L).otherwise(0L)).as("nd"))
        .select(col("k"), col("n"), col("nd"),
          (col("sw").cast("double") / 1e6).as("fw"),
          (col("swx").cast("double") / 1e6).as("fwx"),
          (col("swxx").cast("double") / 1e6).as("fwxx"),
          (col("swy").cast("double") / 1e6).as("fwy"),
          (col("swxy").cast("double") / 1e6).as("fwxy"))
      val det = col("fw") * col("fwxx") - col("fwx") * col("fwx")
      val bN = (col("fw") * col("fwxy") - col("fwx") * col("fwy")) / det
      val aN = (col("fwy") - bN * col("fwx")) / col("fw")
      nDown = st.select(col("k"), col("nd"))
      coef = st.select(col("k"), col("n"),
        round(aN, 6).as("a"), round(bN, 6).as("b"))
    }
    val out = coef.join(first, Seq("k")).join(nDown, Seq("k"))
      .select(col("k").as("key"), col("n"), col("a0"), col("b0"),
        col("a").as("a_fit"), col("b").as("b_fit"),
        col("nd").as("n_down"))
    out
  }

  /** RANSAC line fit per key with `trials` md5-seeded 2-point draws:
    * trial t samples indices h('ra:'key:t) % n and h('rb:'key:t) % n
    * (collision bumped by one, circularly), scores the exact 2-point
    * line by its inlier count |y - a - b·x| <= thresh, keeps the
    * best-count trial (ties → smaller t), then refits OLS over that
    * consensus set from exact integer sums. The draw grid is
    * (keys × trials) — a bounded broadcast against the rows — and both
    * passes are equi-joins on the key, so series count scales out.
    * Emits (key, best_trial, n_inliers, a_model, b_model, a_fit,
    * b_fit). */
  def ransacLine(df: DataFrame, key: Column, idx: Column, x: Column,
                 y: Column, thresh: Double, trials: Int = 8): DataFrame = {
    require(thresh > 0 && trials >= 1 && trials <= 64,
      s"bad RANSAC params: thresh=$thresh trials=$trials")
    val rows = df.select(key.as("k"), idx.cast("long").as("i"),
        x.cast("double").as("xd"), y.cast("double").as("yd"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = rows.groupBy(col("k")).agg(count(lit(1)).as("n"))
    val spark = df.sparkSession
    val grid = sizes.crossJoin(
        spark.range(1, trials + 1).select(col("id").as("t")))
      .select(col("k"), col("t"), col("n"),
        (pmod(hash60(concat_ws(":", lit("ra"), col("k"), col("t"))),
          col("n")) + 1).as("i1"))
      .withColumn("i2r",
        pmod(hash60(concat_ws(":", lit("rb"), col("k"), col("t"))),
          col("n")) + 1)
      .withColumn("i2",
        when(col("i2r") === col("i1"), pmod(col("i2r"), col("n")) + 1)
          .otherwise(col("i2r")))
    val p1 = rows.select(col("k"), col("i").as("i1"), col("xd").as("x1"),
      col("yd").as("y1"))
    val p2 = rows.select(col("k"), col("i").as("i2"), col("xd").as("x2"),
      col("yd").as("y2"))
    val models = grid.join(p1, Seq("k", "i1")).join(p2, Seq("k", "i2"))
      .withColumn("bm", (col("y2") - col("y1")) / (col("x2") - col("x1")))
      .withColumn("am", col("y1") - col("bm") * col("x1"))
      .select(col("k"), col("t"), col("am"), col("bm"))
    val scoredT = rows.join(broadcast(models), Seq("k"))
      .withColumn("inl",
        when(abs(col("yd") - col("am") - col("bm") * col("xd")) <=
          lit(thresh), 1L).otherwise(0L))
      .groupBy(col("k"), col("t"), col("am"), col("bm"))
      .agg(sum(col("inl")).as("n_inliers"))
    val best = scoredT
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
          .orderBy(col("n_inliers").desc, col("t"))))
      .where(col("rn") === 1)
      .select(col("k"), col("t").as("best_trial"),
        col("n_inliers"), col("am"), col("bm"))
    // consensus refit: exact-integer OLS over the best trial's inliers
    val cons = rows.join(broadcast(best), Seq("k"))
      .where(abs(col("yd") - col("am") - col("bm") * col("xd")) <=
        lit(thresh))
      .select(col("k"), col("xd").cast("long").as("xl"),
        col("yd").cast("long").as("yl"))
    val ols = cons.groupBy(col("k"))
      .agg(count(lit(1)).as("nc"), sum(col("xl")).as("sx"),
        sum(col("yl")).as("sy"), sum(col("xl") * col("xl")).as("sxx"),
        sum(col("xl") * col("yl")).as("sxy"))
    val bRaw = (col("nc") * col("sxy") - col("sx") * col("sy"))
      .cast("double") /
      (col("nc") * col("sxx") - col("sx") * col("sx")).cast("double")
    val aRaw = (col("sy").cast("double") - bRaw * col("sx").cast("double")) /
      col("nc").cast("double")
    best.join(ols.select(col("k"), round(aRaw, 6).as("a_fit"),
        round(bRaw, 6).as("b_fit")), Seq("k"))
      .select(col("k").as("key"), col("best_trial"), col("n_inliers"),
        round(col("am"), 6).as("a_model"), round(col("bm"), 6).as("b_model"),
        col("a_fit"), col("b_fit"))
  }

  /** Exact isotonic regression (PAVA) per key via the minimax
    * characterization f(i) = max_{j<=i} min_{k>=i} mean(y[j..k]) — the
    * closed form of pool-adjacent-violators, so the fit needs no
    * sequential pooling loop: segment means come off exact DECIMAL
    * prefix sums, the reverse cumulative min is one window per (key,j),
    * and the final max is a plain groupBy. Mirrors the reference's
    * IsotonicRegressionCalibrator semantics
    * (core/src/main/scala/com/salesforce/op/stages/impl/regression/
    * IsotonicRegressionCalibrator.scala) with a SQL-replayable answer.
    *
    * Scale: O(n_k^2) pairs per key, which is the right shape because a
    * calibration fit's input is an already-aggregated (bucket, rate)
    * curve — n_k is score-bucket-bounded (<= a few hundred), never raw
    * rows; the 100 TB work happens in the upstream groupBy that builds
    * the curve. Emits (key, idx, ord, y, fitted), fitted nondecreasing
    * in idx. */
  def isotonicPava(df: DataFrame, key: Column, ord: Column, y: Column)
    : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // y joins the sort as a tiebreak: duplicate `ord` values within a
    // key would otherwise make idx (and the fit) nondeterministic
    // across runs/partitionings and silently break a hash gate
    val w = Window.partitionBy(col("key")).orderBy(col("ord"), col("y"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df.select(key.as("key"), ord.as("ord"),
        y.cast("decimal(25,6)").as("y"))
      .withColumn("idx", row_number().over(w).cast("long"))
      .withColumn("pre", sum(col("y")).over(w))
    // pair frame (j <= k) with the exact segment mean A(j,k)
    val lo = base.select(col("key"), col("idx").as("j"),
      (col("pre") - col("y")).as("pj")) // prefix BEFORE j
    val hi = base.select(col("key"), col("idx").as("k"), col("pre").as("pk"))
    val pairs = lo.join(hi, Seq("key")).where(col("j") <= col("k"))
      .withColumn("avg", (col("pk") - col("pj")).cast("double") /
        (col("k") - col("j") + lit(1)).cast("double"))
    val wrev = Window.partitionBy(col("key"), col("j"))
      .orderBy(col("k").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fit = pairs.withColumn("mrev", min(col("avg")).over(wrev))
      .groupBy(col("key"), col("k").as("idx"))
      .agg(max(col("mrev")).as("fitted"))
    base.join(fit, Seq("key", "idx"))
      .select(col("key"), col("idx"), col("ord"),
        round(col("y").cast("double"), 6).as("y"),
        round(col("fitted"), 6).as("fitted"))
  }
}
