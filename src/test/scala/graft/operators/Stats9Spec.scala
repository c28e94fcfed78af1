package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Clamped running balance (nonlinear sequential fold). */
class Stats9Spec extends SparkSpec {

  import spark.implicits._

  test("clampedBalance floors at zero, counts absorbed deltas, folds in " +
    "(ts, order) sequence") {
    // deltas in order: +5, -10 (floored), +3, -1 -> balance 2, floored 1
    val df = Seq((1L, 2L, 1L, -10.0), (1L, 1L, 1L, 5.0), (1L, 3L, 1L, 3.0),
      (1L, 4L, 1L, -1.0), (2L, 1L, 1L, -7.0)).toDF("k", "t", "o", "d")
    val got = TimeSeries.clampedBalance(df, col("k"), col("t"), col("o"),
        col("d"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got(1L) === ((4, 2.0, 1L)))
    assert(got(2L) === ((1, 0.0, 1L))) // single negative: floored to 0
    // order sensitivity: the same multiset summed without the clamp
    // would be -3; the fold's path dependence is the point
  }
}
