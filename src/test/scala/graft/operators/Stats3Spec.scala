package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CDC upsert compaction, weighted median, rolling correlation, and the
  * Benford first-digit profile. */
class Stats3Spec extends SparkSpec {

  import spark.implicits._

  test("upsertLatest keeps exactly the greatest (ts, order) row per key") {
    val log = Seq(
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"), (1L, 20L, 99L, "c"),
      (2L, 5L, 50L, "x")).toDF("k0", "t", "ord", "v")
    val got = TimeSeries.upsertLatest(log, col("k0"), col("t"), col("ord"),
        Seq(col("v")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got === Map(1L -> ((20L, "b")), 2L -> ((5L, "x")))) // 101 beats 99 at ts 20
  }

  test("weightedMedian: hand-computed lower median; degenerates to a " +
    "plain lower median under unit weights") {
    // g1: values 1(w=1), 2(w=1), 3(w=10) -> total 12, half 6 -> median 3
    val df = Seq(("g1", 1.0, 1.0), ("g1", 2.0, 1.0), ("g1", 3.0, 10.0),
      ("g2", 5.0, 1.0), ("g2", 7.0, 1.0)).toDF("g", "v", "w")
    val got = DataQuality.weightedMedian(df, col("g"), col("v"), col("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("g1" -> 3.0, "g2" -> 5.0)) // even count: lower member
  }

  test("rollingCorr: +1 on co-moving windows, -1 on anti-moving, null " +
    "until the window fills") {
    val up = (1 to 12).map(i => (i, i.toDouble, 2.0 * i + 3))
    val rows = TimeSeries.rollingCorr(up.toDF("b", "x", "y"),
      col("b"), col("x"), col("y"), windowLen = 5).orderBy("bucket").collect()
    assert(rows.take(4).forall(_.isNullAt(3))) // warm-up rows
    assert(rows.drop(4).forall(r => math.abs(r.getDouble(3) - 1.0) < 1e-9))
    val down = (1 to 12).map(i => (i, i.toDouble, -3.0 * i))
    val anti = TimeSeries.rollingCorr(down.toDF("b", "x", "y"),
      col("b"), col("x"), col("y"), windowLen = 5).orderBy("bucket").collect()
    assert(anti.drop(4).forall(r => math.abs(r.getDouble(3) + 1.0) < 1e-9))
  }

  test("benfordProfile extracts first significant digits across " +
    "magnitudes and matches expected shares") {
    val df = Seq(123.4, 0.0456, 1999.0, 0.1, 2.5, -345.0, 9000.0, 0.0)
      .toDF("v")
    val got = DataQuality.benfordProfile(df, col("v"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // digits: 1 (123.4), 4 (0.0456), 1 (1999), 1 (0.1), 2 (2.5),
    // 3 (-345), 9 (9000); zero row dropped
    assert(got === Map(1 -> 3L, 2 -> 1L, 3 -> 1L, 4 -> 1L, 9 -> 1L))
    val exp = DataQuality.benfordProfile(df, col("v"))
      .where(col("digit") === 1).head.getAs[Double]("expected")
    assert(math.abs(exp - math.log10(2.0)) < 1e-6)
  }
}
