package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases for the round-6 statistical-test and demand-series
  * operators: k-sample rank tests, post-hocs, survival comparison,
  * intermittent-demand forecasting, breakpoint fits, and the Gini
  * stump. */
class Stats10Spec extends SparkSpec {

  import spark.implicits._

  private val twoGroups = Seq(
    ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 3.0), ("a", 5.0),
    ("b", 2.0), ("b", 3.0), ("b", 4.0), ("b", 4.0), ("b", 6.0))

  test("kruskalWallis with two groups equals the squared Mann-Whitney z " +
    "(tie-corrected identity)") {
    val df = twoGroups.toDF("g", "v")
    val h = DataQuality.kruskalWallis(df, col("g"), col("v"))
      .head().getAs[Double]("h_tie_corrected")
    val z = DataQuality.mannWhitneyU(df, col("g"), col("v"), "a", "b")
      .head().getAs[Double]("z")
    assert(math.abs(h - z * z) < 1e-4)
  }

  test("dunnPosthoc with two groups reproduces the Mann-Whitney z " +
    "magnitude and emits one pair") {
    val df = twoGroups.toDF("g", "v")
    val rows = DataQuality.dunnPosthoc(df, col("g"), col("v")).collect()
    assert(rows.length == 1)
    val zd = rows.head.getAs[Double]("z_stat")
    val zm = DataQuality.mannWhitneyU(df, col("g"), col("v"), "a", "b")
      .head().getAs[Double]("z")
    assert(math.abs(math.abs(zd) - math.abs(zm)) < 1e-4)
  }

  test("mcnemar counts the 2x2 concordance and applies the continuity " +
    "correction") {
    val df = (Seq.fill(2)((true, true)) ++ Seq.fill(3)((true, false)) ++
      Seq.fill(1)((false, true)) ++ Seq.fill(4)((false, false)))
      .toDF("a", "b")
    val r = DataQuality.mcnemar(df, col("a"), col("b")).head()
    assert(r.getAs[Long]("n_both") == 2L)
    assert(r.getAs[Long]("n_a_only") == 3L)
    assert(r.getAs[Long]("n_b_only") == 1L)
    assert(r.getAs[Long]("n_neither") == 4L)
    // ((|3-1|-1)^2) / (3+1) = 0.25
    assert(r.getAs[Double]("chi2_cc") == 0.25)
  }

  test("cochranArmitage recovers the closed-form trend chi2 on a " +
    "hand-computed dose ladder") {
    // doses 1/2/3, 10 subjects each, successes 0/5/10 -> chi2 = 20
    val rows = (1 to 10).flatMap { i =>
      Seq((1L, false), (2L, i <= 5), (3L, true))
    }
    val r = DataQuality.cochranArmitage(rows.toDF("dose", "y"),
      col("dose"), col("y")).head()
    assert(r.getAs[Long]("k") == 3L)
    assert(r.getAs[Double]("chi2_trend") == 20.0)
    assert(r.getAs[Long]("trend_sign") == 1L)
  }

  test("tukeyHsd emits k(k-1)/2 pairs with pooled-MSE q statistics") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 7.0),
      ("c", 9.0), ("c", 11.0)).toDF("g", "v")
    val rows = DataQuality.tukeyHsd(df, col("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rows.size == 3)
    val ab = rows(("a", "b"))
    // means 2 and 6, mse = 2 -> q = 4 / sqrt(2/2 * (1/2 + 1/2)) = 4
    assert(ab.getAs[Double]("mean_diff") == -4.0)
    assert(ab.getAs[Double]("q_stat") == 4.0)
  }

  test("logRank on two identical cohorts is exactly zero") {
    val df = (1 to 3).flatMap { t =>
      Seq((t.toLong, true, true), (t.toLong, true, false))
    }.toDF("dur", "obs", "g1")
    val r = TimeSeries.logRank(df, col("dur"), col("obs"), col("g1")).head()
    assert(r.getAs[Long]("observed_1") == 3L)
    assert(r.getAs[Double]("chi2_logrank") == 0.0)
  }

  test("croston on constant demand and constant gaps is exact: z = d, " +
    "p = gap, rate = d/gap, sba = 0.9 * rate") {
    val df = Seq((1L, 0L, 10.0), (1L, 2L, 10.0), (1L, 4L, 10.0),
      (1L, 6L, 10.0)).toDF("k", "p", "d")
    val r = TimeSeries.croston(df, col("k"), col("p"), col("d"), 0.2).head()
    assert(r.getAs[Double]("z_level") == 10.0)
    assert(r.getAs[Double]("p_interval") == 2.0)
    assert(r.getAs[Double]("croston_rate") == 5.0)
    assert(math.abs(r.getAs[Double]("sba_rate") - 4.5) < 1e-9)
  }

  test("intermittencyClass separates smooth from lumpy demand via the " +
    "exact quadrant thresholds") {
    val smooth = (0L to 9L).map(p => ("s", p, 100L))
    val lumpy = Seq(("l", 0L, 100L), ("l", 5L, 10000L), ("l", 10L, 100L),
      ("l", 30L, 20000L))
    val got = TimeSeries.intermittencyClass((smooth ++ lumpy)
        .toDF("k", "p", "q"), col("k"), col("p"), col("q"))
      .collect().map(r => r.getString(0) -> r.getAs[String]("pattern")).toMap
    assert(got("s") == "smooth")
    assert(got("l") == "lumpy")
  }

  test("segmentedTrend finds the exact breakpoint of a perfect " +
    "two-piece series (SSE 0, both slopes recovered)") {
    val days = (0 to 9).map(i => java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i).toString))
    val rows = (0 to 9).map { i =>
      val cents = if (i <= 4) 100L * i else 1000L - 50L * i
      ("s", days(i), cents)
    }
    val r = TimeSeries.segmentedTrend(rows.toDF("k", "day", "c"),
      col("k"), col("day"), col("c")).head()
    assert(r.getAs[String]("split_day") == "2024-01-05")
    assert(r.getAs[Long]("n_left") == 5L)
    assert(r.getAs[Double]("slope_left") == 1.0)
    assert(r.getAs[Double]("slope_right") == -0.5)
    assert(r.getAs[Double]("sse_total") == 0.0)
  }

  test("kalmanLevel on a constant series keeps the level and contracts " +
    "the variance monotonically") {
    val df = (1 to 20).map(i => ("k", i.toLong, 42.0)).toDF("k", "o", "z")
    val r = TimeSeries.kalmanLevel(df, col("k"), col("o"), col("z"),
      qVar = 0.01, rVar = 1.0).head()
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Double]("level") == 42.0) // innovations are all zero
    val p = r.getAs[Double]("p_var")
    assert(p > 0 && p < 1.0) // contracted from the p0 = 1 prior
    // steady-state gain for q=0.01, r=1 is ~0.0951; 20 steps is close
    assert(math.abs(r.getAs[Double]("gain_next") - 0.0951) < 0.005)
  }

  test("kalmanLevel tracks a level shift from above (smoothing lag)") {
    val df = ((1 to 10).map(i => ("k", i.toLong, 0.0)) ++
      (11 to 13).map(i => ("k", i.toLong, 100.0))).toDF("k", "o", "z")
    val lvl = TimeSeries.kalmanLevel(df, col("k"), col("o"), col("z"),
      qVar = 0.01, rVar = 1.0).head().getAs[Double]("level")
    assert(lvl > 0.0 && lvl < 100.0) // lags the shift, moves toward it
  }

  test("kleinbergBursts flags the dense stretch of an on/off stream") {
    // 10 gaps of 100s, then 10 gaps of 5s (burst), then 10 of 100s
    val times = (0 to 9).map(_ * 100L) ++
      (1 to 10).map(900L + _ * 5L) ++ (1 to 10).map(950L + _ * 100L)
    val df = times.map(("u", _)).toDF("k", "t")
    val r = TimeSeries.kleinbergBursts(df, col("k"), col("t"),
      gamma = 1.0, burstFactor = 2.0).head()
    assert(r.getAs[Long]("n_gaps") == 29L)
    val bursts = r.getAs[Long]("n_burst_steps")
    // the 10 short gaps (and only roughly those) ride the burst state
    assert(bursts >= 8L && bursts <= 12L, s"bursts=$bursts")
  }

  test("lisLength: sorted series scores 1.0, reversed series scores 1/n") {
    val up = (1 to 8).map(i => ("up", i.toLong, i.toLong * 10))
    val down = (1 to 8).map(i => ("down", i.toLong, 100L - i * 10))
    val got = TimeSeries.lisLength((up ++ down).toDF("k", "o", "v"),
        col("k"), col("o"), col("v"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("lis_len")).toMap
    assert(got("up") == 8L)
    assert(got("down") == 1L)
  }

  test("bestGiniSplit on perfectly separable data finds the boundary " +
    "with weighted Gini 0") {
    val df = Seq((1.0, false), (1.0, false), (2.0, false), (2.0, false),
      (3.0, true), (3.0, true), (4.0, true), (4.0, true)).toDF("v", "y")
    val r = DataQuality.bestGiniSplit(df, col("v"), col("y")).head()
    assert(r.getAs[Double]("threshold") == 2.0)
    assert(r.getAs[Long]("n_left") == 4L)
    assert(r.getAs[Long]("pos_left") == 0L)
    assert(r.getAs[Long]("n_right") == 4L)
    assert(r.getAs[Long]("pos_right") == 4L)
    assert(r.getAs[Double]("weighted_gini") == 0.0)
  }
}
