package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot reconciliation and decay-weighted engagement. */
class Stats8Spec extends SparkSpec {

  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed/unchanged exactly") {
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val nw = Seq((2L, "b", 20.0), (3L, "c", 31.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val got = Incremental.snapshotDiff(old, col("k"), nw, col("k"),
        Seq(col("s"), col("v")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "added"))
  }

  test("decayScore: an event at the reference instant scores its full " +
    "value, one half-life earlier scores half, sums are deterministic") {
    def t(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val df = Seq((1L, t(8), 10.0), (2L, t(1), 10.0), (3L, t(8), 4.0),
      (3L, t(1), 8.0)).toDF("user_id", "ts", "value")
    val got = TimeSeries.decayScore(df, col("user_id"), col("ts"),
        col("value"), refInstant = "2024-01-08 00:00:00", halflifeDays = 7.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) === 10.0)          // age 0
    assert(got(2L) === 5.0)           // exactly one half-life
    assert(got(3L) === 8.0)           // 4 + 8/2
  }
}
