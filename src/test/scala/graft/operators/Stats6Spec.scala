package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Geo kNN, group-median imputation, Mahalanobis outliers, trimmed mean. */
class Stats6Spec extends SparkSpec {

  import spark.implicits._

  test("nearestNeighbors returns each point's k closest within the " +
    "radius, ascending, matching a window-rank brute force") {
    val pts = (1L to 40L).map(i =>
      (i, 40.0 + (i * 37 % 100) / 50.0, (i * 61 % 100) / 50.0))
      .toDF("id", "lat", "lon")
    val got = Geo.nearestNeighbors(pts, col("id"), col("lat"), col("lon"),
        k = 2, radiusKm = 60.0, maxAbsLat = 45.0)
      .select("id", "neighbor", "rank").as[(Long, Long, Int)].collect().toSet
    val a = pts.select(col("id").as("p"), col("lat").as("la"), col("lon").as("lo"))
    val brute = a.crossJoin(pts.select(col("id").as("nb"), col("lat").as("lb"),
        col("lon").as("lb2")))
      .where(col("p") =!= col("nb"))
      .withColumn("d", Geo.haversineKm(col("la"), col("lo"), col("lb"), col("lb2")))
      .where(col("d") <= 60.0)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("p"))
          .orderBy(col("d"), col("nb"))))
      .where(col("rank") <= 2)
      .select(col("p"), col("nb"), col("rank")).as[(Long, Long, Int)].collect().toSet
    assert(got === brute)
  }

  test("imputeGroupMedian fills nulls with the group median, falls back " +
    "to the global median for empty groups, flags imputed rows") {
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("a", None),
      ("b", Some(10.0)), ("b", None), ("c", None)).toDF("g", "v")
    val got = Vectorizers.imputeGroupMedian(df, col("g"), col("v"), "f")
      .select("g", "f", "f_isnull").as[(String, Double, Int)]
      .collect().groupBy(_._1)
    assert(got("a").filter(_._3 == 1).map(_._2).toSeq === Seq(2.0)) // median(1,3)
    assert(got("b").filter(_._3 == 1).map(_._2).toSeq === Seq(10.0))
    assert(got("c").map(_._2).toSeq === Seq(3.0)) // global median(1,3,10)
  }

  test("mahalanobis2d: on-ridge points score low, an off-correlation " +
    "point scores far above the chi2 threshold") {
    val ridge = (1 to 200).map(i => (i.toString, i.toDouble,
      2.0 * i + (i % 5 - 2) * 0.1))
    val df = (ridge :+ (("odd", 100.0, 50.0))).toDF("id", "x", "y")
    val got = DataQuality.mahalanobis2d(df, col("id"), col("x"), col("y"),
        threshold = 9.21)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    assert(got("odd")._2 === 1) // wildly off the y=2x ridge
    assert(got("100")._2 === 0) // dead center of the ridge
    assert(got("odd")._1 > 50 * got("100")._1)
  }

  test("trimmedMean drops exactly the tail mass (fractional ties) and " +
    "matches the hand-computed value; trim=0 degenerates to the mean") {
    // g: values 0, 1..10 (ten 1s? no): 0 once, then 1..10 once, 1000 once
    val vals = Seq(0.0) ++ (1 to 10).map(_.toDouble) ++ Seq(1000.0)
    val df = vals.map(("g", _)).toDF("g", "v")
    val r = DataQuality.trimmedMean(df, col("g"), col("v"), trim = 0.1).head
    // n=12, k_lo=1, k_hi=11: drop 0 and 1000 -> mean(1..10) = 5.5
    assert(r.getAs[Long]("n") === 12L)
    assert(r.getAs[Long]("n_kept") === 10L)
    assert(r.getAs[Double]("trimmed_mean") === 5.5)
    val r0 = DataQuality.trimmedMean(df, col("g"), col("v"), trim = 0.0).head
    assert(math.abs(r0.getAs[Double]("trimmed_mean") - vals.sum / 12) < 1e-6)
  }
}
