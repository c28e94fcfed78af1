package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.expressions.JaroWinkler
import org.apache.spark.unsafe.types.UTF8String

/** Statistical tests, per-series trend/ACF/CUSUM, the grid-blocked geo
  * radius join, and the native Jaro-Winkler expression. */
class StatsGeoSpec extends SparkSpec {

  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.score(UTF8String.fromString(a), UTF8String.fromString(b))

  test("JaroWinkler.score matches the standard published cases and the " +
    "DuckDB edge-case semantics (empty -> 0, degenerate window -> 0, " +
    "boost only above 0.7, prefix capped at 4)") {
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(jw("abc", "") == 0.0)
    assert(jw("", "") == 0.0)
    assert(jw("a", "a") == 1.0)
    assert(jw("ab", "ba") == 0.0) // window floor(2/2)-1 = 0: no matches
    assert(math.abs(jw("aaaaaaaaaa", "aaaaaaaaab") - 0.96) < 1e-12) // prefix cap 4
    // jaro 0.697 < 0.7: boost NOT applied despite the long shared prefix
    assert(math.abs(jw("prefixmatch", "prefixxxxxx") - 0.6969696969696969) < 1e-12)
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333334) < 1e-12) // no prefix
  }

  test("jaroWinklerPairs scores within blocks through codegen (no UDF " +
    "in the plan) and agrees with the static scorer") {
    val df = Seq((1L, "red widget"), (2L, "red widgets"), (3L, "red bolt"),
      (4L, "blue widget")).toDF("id", "nm")
    val pairs = Dedup.jaroWinklerPairs(df, col("id"), col("nm"),
      Seq(split(col("nm"), " ").getItem(0)), minSim = 0.0)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), "JW must stay a native expression")
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(math.abs(got((1L, 2L)) - jw("red widget", "red widgets")) < 1e-15)
    // blocked out: no (x, 4) pairs despite "widget" similarity
  }

  test("radiusJoinPairs equals the brute-force all-pairs filter, each " +
    "pair exactly once") {
    val pts = (1L to 60L).map { i =>
      (i, 40.0 + (i * 37 % 100) / 100.0 * 3.0, (i * 61 % 100) / 100.0 * 3.0)
    }.toDF("id", "lat", "lon")
    val got = Geo.radiusJoinPairs(pts, col("id"), col("lat"), col("lon"),
      radiusKm = 40.0, maxAbsLat = 45.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().sorted
    val a = pts.select(col("id").as("ia"), col("lat").as("la"), col("lon").as("lo"))
    val brute = a.crossJoin(pts.select(col("id").as("ib"), col("lat").as("lb"),
        col("lon").as("lb2")))
      .where(col("ia") < col("ib"))
      .where(Geo.haversineKm(col("la"), col("lo"), col("lb"), col("lb2")) <= 40.0)
      .select("ia", "ib").as[(Long, Long)].collect().sorted
    assert(got.length === brute.length) // exactly-once: no dedup pass ran
    assert(got === brute)
  }

  test("haversineKm: known distance (Paris-London ~343.5 km)") {
    val d = Seq((48.8566, 2.3522, 51.5074, -0.1278)).toDF("a", "b", "c", "d")
      .select(Geo.haversineKm(col("a"), col("b"), col("c"), col("d")))
      .head.getDouble(0)
    assert(math.abs(d - 343.5) < 1.0)
  }

  test("trendPerSeries recovers an exact linear series (slope/intercept " +
    "exact, r2 = 1)") {
    val df = (0 to 9).flatMap(x => Seq(("a", x.toLong, 2.5 * x + 7.0),
      ("b", x.toLong, -1.25 * x + 100.0))).toDF("k", "x", "y")
    val got = TimeSeries.trendPerSeries(df, col("k"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("a") === ((2.5, 7.0, 1.0)))
    assert(got("b") === ((-1.25, 100.0, 1.0)))
  }

  test("acf: lag-1 of an alternating series is strongly negative; a " +
    "linear ramp is positive at all lags") {
    val alt = (0 to 19).map(i => ("s", i, if (i % 2 == 0) 1.0 else -1.0))
    val ramp = (0 to 19).map(i => ("r", i, i.toDouble))
    val got = TimeSeries.acf((alt ++ ramp).toDF("k", "t", "y"),
        col("k"), col("t"), col("y"), maxLag = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(got(("s", 1)) < -0.9)
    assert(got(("s", 2)) > 0.8)
    assert(got(("r", 1)) > 0.8 && got(("r", 2)) > 0.7)
    // textbook identity on the alternating series: acf(1) ~ -(n-1)/n
    assert(math.abs(got(("s", 1)) - (-19.0 / 20.0)) < 0.01)
  }

  test("cusum finds the level-shift location (earliest bucket at the " +
    "maximum deviation)") {
    // 10 points at 0, then 10 at 10: |S_t| peaks exactly at the shift
    val df = (1 to 20).map(i => ("k", i, if (i <= 10) 0.0 else 10.0))
      .toDF("k", "t", "y")
    val r = TimeSeries.cusum(df, col("k"), col("t"), col("y")).head
    assert(r.getAs[Long]("n") === 20L)
    assert(r.getAs[Int]("at_bucket") === 10) // cum deviation extreme at t=10
    assert(math.abs(r.getAs[Double]("max_dev") - 50.0) < 1e-9) // 10*(0-5)
    assert(r.getAs[Double]("mean") === 5.0)
  }

  test("chiSquare: independent uniform 2x2 scores ~0; a deterministic " +
    "association scores n*(min(r,c)-1) at the perfect-association bound") {
    val indep = (0 until 400).map(i => (s"a${i % 2}", s"b${(i / 2) % 2}"))
      .toDF("a", "b")
    val r1 = DataQuality.chiSquare(indep, col("a"), col("b")).head
    assert(math.abs(r1.getAs[Double]("chi2")) < 1e-6)
    assert(r1.getAs[Long]("dof") === 1L)
    val perfect = (0 until 300).map(i => (s"a${i % 3}", s"b${i % 3}")).toDF("a", "b")
    val r2 = DataQuality.chiSquare(perfect, col("a"), col("b")).head
    assert(math.abs(r2.getAs[Double]("chi2") - 600.0) < 1e-6) // n*(k-1) = 300*2
    assert(r2.getAs[Long]("dof") === 4L)
  }

  test("welchTTest: equal samples give t=0; a clear shift gives the " +
    "hand-computed statistic") {
    val df = (Seq.tabulate(50)(i => ("g1", 10.0 + i % 5)) ++
      Seq.tabulate(40)(i => ("g2", 14.0 + i % 5))).toDF("g", "v")
    val r = DataQuality.welchTTest(df, col("g"), col("v"), "g1", "g2").head
    assert(r.getAs[Long]("n1") === 50L && r.getAs[Long]("n2") === 40L)
    assert(r.getAs[Double]("mean_diff") === -4.0)
    // sample variances of the i%5 pattern: sum(d^2)=100 over n1-1=49, 80 over 39
    val t = -4.0 / math.sqrt(100.0 / 49 / 50 + 80.0 / 39 / 40)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-4)
    val same = DataQuality.welchTTest(df.withColumn("g", lit("x"))
      .unionAll(df.withColumn("g", lit("y"))), col("g"), col("v"), "x", "y").head
    assert(r != null && math.abs(same.getAs[Double]("t_stat")) < 1e-12)
  }
}
