package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {

  test("profileNumeric: one row per column with exact null/distinct/mean") {
    val s = spark; import s.implicits._
    val d = Seq[(Option[Double], Option[Double])](
      (Some(1.0), Some(5.0)), (Some(2.0), None), (Some(1.0), Some(7.0)))
      .toDF("a", "b")
    val p = DataQuality.profileNumeric(d, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("a").getLong(1) == 3 && p("a").getLong(2) == 0 &&
      p("a").getLong(3) == 2 && p("a").getDouble(4) == 1.0 &&
      p("a").getDouble(5) == 2.0 && math.abs(p("a").getDouble(6) - 4.0 / 3) < 1e-12)
    assert(p("b").getLong(2) == 1 && p("b").getLong(3) == 2 &&
      p("b").getDouble(6) == 6.0)
  }

  test("psiDrift: ~0 on identical frames, positive and large under shift") {
    val s = spark; import s.implicits._
    val base = (1 to 1000).map(_.toDouble).toDF("v")
    val same = DataQuality.psiDrift(base, base, col("v"), 0, 1000, 10)
      .collect().head
    assert(math.abs(same.getDouble(0)) < 1e-9)
    assert(same.getLong(1) == 1000 && same.getLong(2) == 1000)
    val shifted = (1 to 1000).map(i => i / 2.0).toDF("v")
    val psi = DataQuality.psiDrift(base, shifted, col("v"), 0, 1000, 10)
      .collect().head.getDouble(0)
    assert(psi > 0.25, s"expected a large PSI under a halving shift, got $psi")
  }

  lazy val df = {
    val s = spark; import s.implicits._
    Seq[(Option[Double], Option[String], Double)](
      (Some(1.0), Some("a"), 10.0), (Some(2.0), Some(""), 20.0),
      (None, Some("b"), 30.0), (Some(4.0), None, 40.0))
      .toDF("x", "s", "y")
  }

  test("fillRates counts empty strings as unfilled") {
    val r = DataQuality.fillRates(df, Seq("x", "s", "y")).collect()(0)
    assert(r.getDouble(0) == 0.75) // x: 3/4 non-null
    assert(r.getDouble(1) == 0.50) // s: "b","a" filled; "" and null not
    assert(r.getDouble(2) == 1.00)
  }

  test("rawFeatureFilterStats gates on fill and drift") {
    val out = DataQuality.rawFeatureFilterStats(df, df, Seq("x", "s"), 0.6, 0.1)
      .orderBy("column").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("s", "x"))
    assert(out.map(_.getBoolean(4)).toSeq == Seq(false, true)) // s fails minFill
    assert(out.forall(_.getDouble(3) == 0.0)) // same frame → zero drift
  }

  test("minVarianceStats drops constant columns") {
    val d2 = df.withColumn("const", lit(5.0))
    val out = DataQuality.minVarianceStats(d2, Seq("y", "const"), 0.01)
      .orderBy("column").collect()
    assert(out.find(_.getString(0) == "const").get.getBoolean(2) == false)
    assert(out.find(_.getString(0) == "y").get.getBoolean(2) == true)
  }

  lazy val corrDf = {
    val s = spark; import s.implicits._
    // f1 ≈ label (strong), f2 = -f1 + noise (strong, redundant with f1),
    // f3 independent-ish, f4 constant (zero variance)
    val rows = (0 until 40).map { i =>
      val x = i.toDouble
      (x, x + math.sin(i * 7) * 0.1, -x + math.cos(i * 5) * 0.1,
        math.sin(i * 13) * 3, 5.0)
    }
    rows.toDF("label", "f1", "f2", "f3", "f4")
  }

  test("featureCorrStats reports max pairwise |corr| per feature") {
    val out = DataQuality.featureCorrStats(
        corrDf, "label", Seq("f1", "f2", "f3"), maxFeatureCorrelation = 0.9)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getBoolean(4))).toMap
    assert(out("f1")._1 > 0.99 && out("f1")._2) // f1-f2 nearly collinear
    assert(out("f2")._1 > 0.99 && out("f2")._2)
    assert(out("f3")._1 < 0.5 && !out("f3")._2)
  }

  test("sanityCheckApply drops the weaker of a correlated pair and zero-variance columns") {
    val (cleaned, dropped) = DataQuality.sanityCheckApply(
      corrDf, "label", Seq("f1", "f2", "f3", "f4"),
      minCorrelation = 0.0, maxCorrelation = 1.0, minVariance = 0.001,
      maxFeatureCorrelation = 0.9)
    // f4: zero variance -> gated out; f1/f2 pair: keep exactly one
    assert(dropped.contains("f4"))
    assert(dropped.count(Set("f1", "f2")) == 1)
    assert(!dropped.contains("f3"))
    assert(cleaned.columns.toSet ==
      corrDf.columns.toSet -- dropped)
  }

  test("rawFeatureFilterApply drops failing columns from the frame") {
    val (cleaned, dropped) = DataQuality.rawFeatureFilterApply(
      df, df, Seq("x", "s"), minFill = 0.6, maxFillDifference = 0.1)
    assert(dropped == Seq("s"))
    assert(cleaned.columns.toSet == Set("x", "y"))
  }

  test("cramersV is 1 for perfectly associated columns, ~0 for independent") {
    val s = spark; import s.implicits._
    val perfect = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("u", "v")
    val v1 = DataQuality.cramersV(perfect, "u", "v").collect()(0).getDouble(0)
    assert(v1 == 1.0)
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("u", "v")
    val v0 = DataQuality.cramersV(indep, "u", "v").collect()(0).getDouble(0)
    assert(v0 == 0.0)
  }

  test("histogram clips to range and includes empty buckets") {
    val s = spark; import s.implicits._
    val d = Seq(-5.0, 0.0, 1.0, 5.0, 99.0, 150.0).toDF("v")
    val h = DataQuality.histogram(d, col("v"), 0, 100, 4).orderBy("bucket").collect()
    assert(h.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    // -5 clips to bucket 0 (with 0,1,5); 150 clips to bucket 3 (with 99)
    assert(h.map(_.getLong(1)).toSeq == Seq(4L, 0L, 0L, 2L))
  }

  test("groupedQuantiles: linear interpolation per group, nulls dropped") {
    val s = spark; import s.implicits._
    val d = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", Some(4.0)), ("a", None), ("b", Some(10.0)))
      .toDF("g", "v")
    val out = DataQuality.groupedQuantiles(d, col("g"), col("v"), Seq(0.25, 0.5))
      .as[(String, Double, Double)].collect()
      .map { case (g, p, q) => (g, p) -> q }.toMap
    assert(out(("a", 0.25)) == 1.75) // 1 + 0.75*(2-1)
    assert(out(("a", 0.5)) == 2.5)
    assert(out(("b", 0.25)) == 10.0 && out(("b", 0.5)) == 10.0)
  }

  test("iqrOutliers flags values outside the Tukey fences per group") {
    val s = spark; import s.implicits._
    val d = (Seq.tabulate(11)(i => ("a", 1L + i, i + 1.0)) :+ (("a", 99L, 100.0)))
      .toDF("g", "id", "v")
    val out = DataQuality.iqrOutliers(d, col("id"), col("g"), col("v"))
      .select(col("id"), col("is_outlier")).as[(Long, Int)].collect().toMap
    // values 1..11 + one 100: q1/q3 of the 12 values fence out only 100
    assert(out(99L) == 1)
    assert(out.filter(_._1 != 99L).values.forall(_ == 0))
  }

  test("abLift reproduces the hand-computed two-proportion readout") {
    val s = spark; import s.implicits._
    // control: 2/4 convert; treatment: 3/4 convert
    val d = Seq(("c", 1), ("c", 1), ("c", 0), ("c", 0),
      ("t", 1), ("t", 1), ("t", 1), ("t", 0)).toDF("arm", "conv")
    val r = DataQuality.abLift(d, col("arm"), "c", "t", col("conv")).head
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 0.75)
    assert(r.getDouble(4) == 0.5) // lift = 0.75/0.5 - 1
    val pPool = 5.0 / 8
    val z = 0.25 / math.sqrt(pPool * (1 - pPool) * 0.5)
    assert(r.getDouble(5) == math.rint(z * 1e6) / 1e6)
    val seU = math.sqrt(0.25 / 4 + 0.1875 / 4)
    assert(r.getDouble(6) == math.rint((0.25 - 1.959963984540054 * seU) * 1e6) / 1e6)
  }

  test("categoricalEntropy: uniform = ln(levels), constant = 0, null is a level") {
    val s = spark; import s.implicits._
    val d = Seq(("a", "x", Some("p")), ("b", "x", Some("q")),
      ("c", "x", None), ("d", "x", Some("p")))
      .toDF("u", "k", "m")
    val out = DataQuality.categoricalEntropy(d, Seq("u", "k", "m"))
      .as[(String, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("u") == ((math.rint(math.log(4) * 1e6) / 1e6, 4L)))
    assert(out("k") == ((0.0, 1L)))
    // m: p,q,null,p -> levels 3; H = -(1/2 ln 1/2 + 1/4 ln 1/4 * 2)
    val hm = -(0.5 * math.log(0.5) + 2 * 0.25 * math.log(0.25))
    assert(out("m") == ((math.rint(hm * 1e6) / 1e6, 3L)))
  }

  test("mutualInformation: H(a) when b determines a, ~0 when independent") {
    val s = spark; import s.implicits._
    // b = f(a): MI = H(a) = H(b), NMI = 1
    val dep = Seq(("x", "1"), ("y", "2"), ("x", "1"), ("z", "3"))
      .toDF("a", "b")
    val r = DataQuality.mutualInformation(dep, col("a"), col("b")).head
    assert(r.getDouble(0) == r.getDouble(2) && r.getDouble(1) == 1.0)
    // independent 2x2 with equal counts: MI = 0
    val ind = Seq(("x", "1"), ("x", "2"), ("y", "1"), ("y", "2")).toDF("a", "b")
    val r2 = DataQuality.mutualInformation(ind, col("a"), col("b")).head
    assert(math.abs(r2.getDouble(0)) < 1e-9)
  }

  test("ksDrift: 0 on identical frames, 1 on disjoint supports, exact on a hand case") {
    val s = spark; import s.implicits._
    val a = (1 to 100).map(_.toDouble).toDF("v").repartition(7)
    assert(DataQuality.ksDrift(a, a, col("v")).head.getDouble(0) == 0.0)
    val b = (101 to 200).map(_.toDouble).toDF("v").repartition(3)
    assert(DataQuality.ksDrift(a, b, col("v")).head.getDouble(0) == 1.0)
    // hand case: train {1,2,3,4}, score {3,4,5,6} -> sup gap at v=2:
    // |2/4 - 0/4| = 0.5
    val t = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val sc = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    val r = DataQuality.ksDrift(t, sc, col("v")).head
    assert(r.getDouble(0) == 0.5 && r.getLong(1) == 4L && r.getLong(2) == 4L)
  }

  test("ksDrift prefix sums are partition-invariant") {
    val s = spark; import s.implicits._
    // skewed multiset across many partitions: the two-level cumulative
    // sum must agree with itself under any repartitioning
    val x = (1 to 500).map(i => (i % 37).toDouble).toDF("v")
    val y = (1 to 400).map(i => (i % 23).toDouble).toDF("v")
    val r1 = DataQuality.ksDrift(x.repartition(2), y.repartition(13), col("v")).head
    val r2 = DataQuality.ksDrift(x.repartition(31), y.repartition(1), col("v")).head
    assert(r1.getDouble(0) == r2.getDouble(0))
  }

  test("jsDivergence: 0 for identical, 1 for disjoint, symmetric") {
    val p = Seq(1.0, 2.0, 3.0)
    assert(DataQuality.jsDivergence(p, p) == 0.0)
    val a = Seq(1.0, 0.0); val b = Seq(0.0, 1.0)
    assert(math.abs(DataQuality.jsDivergence(a, b) - 1.0) < 1e-12)
    val q = Seq(3.0, 2.0, 1.0)
    assert(DataQuality.jsDivergence(p, q) == DataQuality.jsDivergence(q, p))
  }

  test("quantileRank matches percent_rank semantics, ties share a rank") {
    val s = spark; import s.implicits._
    // values 10,20,20,30,null over 4 non-null rows: pct = below/(n-1)
    val df = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, Some(20.0)),
      (4L, Some(30.0)), (5L, None: Option[Double])).toDF("id", "v")
    val out = graft.operators.Vectorizers.quantileRank(df, col("id"), col("v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(1L) == Some(0.0))
    assert(out(2L) == Some(round6(1.0 / 3)) && out(3L) == out(2L))
    assert(out(4L) == Some(1.0))
    assert(out(5L) == None)
  }

  private def round6(x: Double): Double = math.rint(x * 1e6) / 1e6

  test("winsorize clamps to the percentile fences and flags clipped rows") {
    val s = spark; import s.implicits._
    val df = (1 to 99).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = graft.operators.Vectorizers.winsorize(df, col("id"), col("v"),
        lo = 0.1, hi = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getInt(3), r.getInt(4))).toMap
    // exact percentiles of 1..99 at 0.1/0.9 are 10.8 and 89.2
    assert(out(1L) == ((10.8, 1, 0)) && out(99L) == ((89.2, 0, 1)))
    assert(out(50L) == ((50.0, 0, 0)))
  }

  test("skewReport computes straggler factor and Gini (uniform -> 0)") {
    val s = spark; import s.implicits._
    val uniform = (1 to 100).flatMap(k => Seq.fill(5)(k.toLong)).toDF("k")
    val r1 = graft.operators.DataQuality.skewReport(uniform, col("k")).head
    assert(r1.getLong(0) == 100 && r1.getLong(1) == 500 && r1.getLong(2) == 5)
    assert(r1.getDouble(4) == 1.0)            // straggler factor: max/avg
    assert(math.abs(r1.getDouble(5)) < 1e-9)  // uniform keys -> Gini 0
    val skewed = (Seq.fill(96)(1L) ++ (2L to 5L)).toDF("k")
    val r2 = graft.operators.DataQuality.skewReport(skewed, col("k")).head
    assert(r2.getLong(2) == 96 && r2.getDouble(4) == 4.8)
    assert(r2.getDouble(5) > 0.7, s"expected high Gini, got ${r2.getDouble(5)}")
  }

  test("referentialIntegrity counts orphans, null FKs, and coverage") {
    val s = spark; import s.implicits._
    val fact = Seq(Some(1L), Some(1L), Some(2L), Some(99L), None)
      .toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val r = graft.operators.DataQuality.referentialIntegrity(
      fact, col("fk"), dim, col("pk")).head
    assert(r.getLong(0) == 5 && r.getLong(1) == 1 && r.getLong(2) == 1)
    assert(r.getLong(3) == 3 && r.getDouble(4) == 0.75)
  }

  test("survival estimators take the bounded-domain fast path at sf0.1 " +
    "(dispatch evidence, not timing inference)") {
    // The 100x-scale story for q220/q341/q406 is: bounded duration
    // domain -> ONE <=10k-row single-partition window; unbounded ->
    // two-level prefix sum. This asserts the branch ACTUALLY taken on
    // the bench-scale fixture by draining autoDispatch's decision log,
    // so the residual local latency is attributable to the per-job
    // floor rather than a silent fallback.
    val s = spark
    val log = graft.operators.DataQuality.dispatchLog
    log.clear()
    Seq("q220_kaplan_meier", "q341_nelson_aalen", "q406_logrank").foreach { q =>
      graft.SparkEntry.queries(q)(s, "/root/testdata/sf0.1").count()
    }
    val decisions = {
      val b = Seq.newBuilder[(Long, Boolean)]
      var e = log.poll()
      while (e != null) { b += e; e = log.poll() }
      b.result()
    }
    assert(decisions.nonEmpty, "no autoDispatch call recorded")
    val slow = decisions.filterNot(_._2)
    assert(slow.isEmpty,
      s"expected the fast path for every survival dispatch; fallbacks: $slow")
    assert(decisions.forall(_._1 <= 10000L), decisions.toString)
  }
}
