package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Calibration ECE and Kaplan-Meier survival. */
class Stats5Spec extends SparkSpec {

  import spark.implicits._

  test("expectedCalibrationError: perfectly calibrated bins score 0; " +
    "a constant-score miscalibration scores its exact gap") {
    // bin 0.15: half labels 1 at score .15? make per-bin avg label equal
    // avg score: score 0.2 with 20% positives, score 0.8 with 80%
    val calib = (Seq.fill(8)((0.25, 0.0)) ++ Seq.fill(2)((0.25, 1.0)) ++
      Seq.fill(2)((0.85, 0.0)) ++ Seq.fill(8)((0.85, 1.0))).toDF("p", "y")
    val r = graft.workflow.MLTuning
      .expectedCalibrationError(calib, "p", "y", bins = 10).head
    assert(math.abs(r.getAs[Double]("ece") - 0.05) < 1e-9) // |.25-.2| avg both bins
    val off = (Seq.fill(10)((0.9, 0.0))).toDF("p", "y")
    val r2 = graft.workflow.MLTuning
      .expectedCalibrationError(off, "p", "y", bins = 10).head
    assert(r2.getAs[Double]("ece") === 0.9)
    assert(r2.getAs[Double]("max_gap") === 0.9)
  }

  test("kaplanMeier reproduces the textbook small-sample curve with " +
    "censoring, and an all-death batch drives survival to exactly 0") {
    // classic: deaths at t=1 (2 of 10), t=3 (1 of 7 after 1 censored at
    // t=2)... construct: 10 subjects
    val subjects = Seq(
      (1L, true), (1L, true), (2L, false), (3L, true), (4L, false),
      (5L, true), (5L, true), (5L, false), (6L, false), (7L, true))
      .toDF("t", "obs")
    val km = TimeSeries.kaplanMeier(subjects, col("t"), col("obs"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    // t=1: n=10, d=2 -> S = 0.8
    assert(km(1L) === ((10L, 2L, 0.8)))
    // t=3: at risk 7, d=1 -> S = 0.8 * 6/7
    assert(math.abs(km(3L)._3 - 0.8 * 6.0 / 7.0) < 1e-6)
    // t=7: last subject dies -> S = 0 exactly (the -999 floor)
    assert(km(7L)._3 === 0.0)
    // censor-only time keeps survival flat
    assert(math.abs(km(2L)._3 - 0.8) < 1e-9)
  }
}
