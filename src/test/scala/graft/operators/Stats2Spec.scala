package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rank statistics (Mann-Whitney, Spearman), Theil-Sen robust trend,
  * neighborhood link prediction, per-node clustering coefficient, and
  * golden-record composition primitives. */
class Stats2Spec extends SparkSpec {

  import spark.implicits._

  test("mannWhitneyU: identical distributions give z ~ 0 and " +
    "U ~ n1*n2/2; a stochastically larger group gives large positive z") {
    val same = (Seq.tabulate(60)(i => ("a", (i % 10).toDouble)) ++
      Seq.tabulate(60)(i => ("b", (i % 10).toDouble))).toDF("g", "v")
    val r = DataQuality.mannWhitneyU(same, col("g"), col("v"), "a", "b").head
    assert(r.getAs[Double]("u1") === 60.0 * 60.0 / 2)
    assert(math.abs(r.getAs[Double]("z")) < 1e-9)
    val shifted = (Seq.tabulate(50)(i => ("hi", 100.0 + i)) ++
      Seq.tabulate(50)(i => ("lo", i.toDouble))).toDF("g", "v")
    val r2 = DataQuality.mannWhitneyU(shifted, col("g"), col("v"), "hi", "lo").head
    assert(r2.getAs[Double]("u1") === 2500.0) // every hi beats every lo
    assert(r2.getAs[Double]("z") > 8.0)
  }

  test("mannWhitneyU ties: all-equal values give U = n1*n2/2 via the " +
    "average-rank path (and sigma collapses to 0 -> z NaN)") {
    val df = (Seq.fill(5)(("a", 1.0)) ++ Seq.fill(7)(("b", 1.0))).toDF("g", "v")
    val r = DataQuality.mannWhitneyU(df, col("g"), col("v"), "a", "b").head
    assert(r.getAs[Double]("u1") === 5.0 * 7.0 / 2)
    // sigma collapses to 0: z is 0/0 -> NaN (or null after rounding)
    assert(r.isNullAt(r.fieldIndex("z")) || r.getAs[Double]("z").isNaN)
  }

  test("spearmanCorr: a monotone transform scores exactly 1, its " +
    "negation -1, and ranks ignore the distortion Pearson sees") {
    val df = (1 to 100).map(i => (i.toDouble, math.exp(i / 10.0))).toDF("a", "b")
    val r = DataQuality.spearmanCorr(df, col("a"), col("b")).head
    assert(r.getAs[Long]("n") === 100L)
    assert(r.getAs[Double]("spearman_rho") === 1.0)
    val neg = DataQuality.spearmanCorr(
      df.withColumn("b", -col("b")), col("a"), col("b")).head
    assert(neg.getAs[Double]("spearman_rho") === -1.0)
  }

  test("theilSenSlope: exact on a clean line, robust to a gross outlier " +
    "that wrecks OLS") {
    val clean = (0 to 20).map(x => ("k", x, 3.0 * x + 5))
    // outlier at the series END, where OLS leverage is maximal
    val dirty = clean.map { case (k, x, y) => if (x == 20) (k, x, 1e6) else (k, x, y) }
    val ts = TimeSeries.theilSenSlope(dirty.toDF("k", "x", "y"),
      col("k"), col("x"), col("y")).head
    assert(math.abs(ts.getAs[Double]("ts_slope") - 3.0) < 1e-9)
    assert(ts.getAs[Long]("n_pairs") === 210L)
    val ols = TimeSeries.trendPerSeries(dirty.toDF("k", "x", "y"),
      col("k"), col("x"), col("y")).head
    assert(math.abs(ols.getAs[Double]("slope") - 3.0) > 100) // OLS destroyed
  }

  test("theilSenSlope refuses oversized series loudly") {
    val big = (1 to 50).map(x => ("k", x, 1.0)).toDF("k", "x", "y")
    val e = intercept[IllegalArgumentException] {
      TimeSeries.theilSenSlope(big, col("k"), col("x"), col("y"),
        maxSeriesLength = 10)
    }
    assert(e.getMessage.contains("maxSeriesLength"))
  }

  test("linkPrediction: triangle-with-a-tail graph predicts the one " +
    "open wedge pair with the right CN count and AA score; adjacent " +
    "pairs are excluded") {
    // edges: 1-2, 1-3, 2-3 (triangle), 2-4, 3-4 missing? use 1-2,2-3,1-3,3-4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "d")
    val got = Graph.linkPrediction(edges, col("s"), col("d"), minCommon = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // non-adjacent pairs: (1,4) via 3, (2,4) via 3
    assert(got.keySet === Set((1L, 4L), (2L, 4L)))
    val aa3 = BigDecimal(1.0 / math.log(3.0))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((1L, 4L))._1 === 1L)
    assert(math.abs(got((1L, 4L))._2 -
      BigDecimal(aa3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("linkPrediction excludes hub centers above maxDegree") {
    // star: hub 0 connected to 1..5; every leaf pair shares only the hub
    val star = (1L to 5L).map(i => (0L, i)).toDF("s", "d")
    assert(Graph.linkPrediction(star, col("s"), col("d"), minCommon = 1,
      maxDegree = 4).count() === 0L)
    assert(Graph.linkPrediction(star, col("s"), col("d"), minCommon = 1,
      maxDegree = 10).count() === 10L) // C(5,2) leaf pairs
  }

  test("clusteringCoefficient: K4 scores 1.0 everywhere; a path node " +
    "with unlinked neighbors scores 0") {
    val k4 = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)).toDF("s", "d")
    val cc = Graph.clusteringCoefficient(k4, col("s"), col("d"))
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(cc.values.forall(_ === 1.0))
    val path = Seq((1, 2), (2, 3)).toDF("s", "d")
    val pc = Graph.clusteringCoefficient(path, col("s"), col("d"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(pc(2) === ((2L, 0L, 0.0))) // deg 2, no triangle
    assert(pc(1) === ((1L, 0L, 0.0))) // deg 1 emits 0 by convention
  }

  test("clusteringCoefficient triangle totals reconcile with " +
    "triangleCount (each triangle credits 3 nodes)") {
    val edges = Seq((1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5), (1, 5))
      .toDF("s", "d")
    val total = Graph.triangleCount(edges, col("s"), col("d"))
      .head.getAs[Long]("n_triangles")
    val perNode = Graph.clusteringCoefficient(edges, col("s"), col("d"))
      .agg(sum(col("n_triangles"))).head.getLong(0)
    assert(perNode === 3 * total)
  }
}
