package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases for the round-6 operator batch: min-date dominance in
  * temporal reachability, the exclusive-prefix-min sentinel, LOCF carry
  * semantics, and Nelson-Aalen monotonicity.
  */
class Round6EdgeSpec extends SparkSpec {
  import spark.implicits._

  test("temporalReachMinDate: a cheaper (earlier) intermediate date " +
    "unlocks edges a naive latest-state search would miss") {
    // seed s exposed 2020-01-01. Two paths to m: via a (date 10) and
    // via b (date 5). Edge m->t carries date 7: only the b-path's
    // earlier exposure (5) can use it. Min-date dominance must keep
    // (m, 5) even though (m, 10) also exists, and reach t on day 7.
    val edges = Seq(
      (1L, 2L, "2020-01-10"), // s -> a
      (1L, 3L, "2020-01-05"), // s -> b
      (2L, 4L, "2020-01-10"), // a -> m  (m at 10 via a... wait same date)
      (3L, 4L, "2020-01-06"), // b -> m  (m at 6)
      (4L, 5L, "2020-01-07")  // m -> t  (usable only from exposure < 7)
    ).toDF("src", "dst", "ds").withColumn("dt", col("ds").cast("date"))
    val seeds = Seq((1L, "2020-01-01")).toDF("node", "d0")
      .withColumn("d0", col("d0").cast("date"))
    val out = Graph.temporalReachMinDate(edges, col("src"), col("dst"),
        col("dt"), seeds, col("node"), col("d0"), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getDate(1).toString).toMap
    assert(out(4L) == "2020-01-06") // min over both paths
    assert(out(5L) == "2020-01-07") // reachable only via the min state
    assert(out(1L) == "2020-01-01")
  }

  test("temporalReachMinDate: strictly-after semantics exclude " +
    "same-day edges") {
    val edges = Seq((1L, 2L, "2020-01-01")).toDF("src", "dst", "ds")
      .withColumn("dt", col("ds").cast("date"))
    val seeds = Seq((1L, "2020-01-01")).toDF("node", "d0")
      .withColumn("d0", col("d0").cast("date"))
    val out = Graph.temporalReachMinDate(edges, col("src"), col("dst"),
      col("dt"), seeds, col("node"), col("d0"), maxHops = 2)
    assert(out.count() == 1L) // only the seed; edge date is not > d0
  }

  test("cumulativeMinByValue: exclusive semantics and the MaxValue " +
    "sentinel on the first value") {
    val vals = Seq((1.0, 5L), (2.0, 3L), (3.0, 7L), (4.0, 1L))
      .toDF("v", "m")
    val out = DataQuality.cumulativeMinByValue(vals, Seq("m"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(out(1.0) == Long.MaxValue) // no predecessor
    assert(out(2.0) == 5L)
    assert(out(3.0) == 3L)            // min of {5,3}, own 7 excluded
    assert(out(4.0) == 3L)
  }

  test("fillForward carries the last observation, not zero") {
    val df = Seq(("a", "2020-01-01", 10.0), ("a", "2020-01-04", 2.0))
      .toDF("k", "d", "v").withColumn("d", col("d").cast("date"))
    val out = TimeSeries.fillForward(df, col("k"), col("d"), col("v"))
      .orderBy(col("d")).collect()
    assert(out.length == 4)
    assert(out.map(_.getDouble(2)).toSeq == Seq(10.0, 10.0, 10.0, 2.0))
    assert(out.map(_.getInt(3)).toSeq == Seq(0, 1, 1, 0))
  }

  test("nelsonAalen hazard is nonnegative and nondecreasing in t") {
    val subj = Seq((1L, true), (2L, true), (2L, false), (5L, true),
      (7L, false)).toDF("dur", "obs")
    val out = TimeSeries.nelsonAalen(subj, col("dur"), col("obs"))
      .orderBy(col("duration")).collect()
    val hz = out.map(_.getDouble(3))
    assert(hz.head >= 0.0)
    assert(hz.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    // at t=1: 5 at risk, 1 event -> H = 0.2
    assert(math.abs(hz.head - 0.2) < 1e-9)
  }
}
