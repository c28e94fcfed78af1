package graft.aggregators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish corpus: "w0" 400x, "w1" 200x, "w2" 100x, then a 900-item tail
  private def corpus = (
    Seq.fill(400)("w0") ++ Seq.fill(200)("w1") ++ Seq.fill(100)("w2") ++
      (0 until 900).map(i => s"tail$i")
  ).toDF("item").repartition(7)

  test("Misra-Gries candidates contain every true heavy hitter") {
    val phi = 0.05 // n = 1600, threshold 80 -> truth is w0, w1, w2
    val cands = Sketches.heavyHitterCandidates(corpus, col("item"), phi)
      .as[(String, Long)].collect().toMap
    assert(Set("w0", "w1", "w2").subsetOf(cands.keySet))
    assert(cands.size <= math.ceil(1 / phi).toInt)
    // undercount only, bounded by n/(k+1)
    val bound = 1600.0 / (math.ceil(1 / phi) + 1)
    assert(cands("w0") <= 400 && cands("w0") >= 400 - bound)
  }

  test("exact two-pass heavy hitters equal the brute-force groupBy truth") {
    val phi = 0.05
    val got = Sketches.heavyHittersExact(corpus, col("item"), phi)
      .as[(String, Long)].collect().toMap
    val truth = corpus.groupBy("item").count()
      .where(col("count") >= phi * 1600).as[(String, Long)].collect().toMap
    assert(got == truth)
    assert(got == Map("w0" -> 400L, "w1" -> 200L, "w2" -> 100L))
  }

  test("result is stable across partitionings (merge-order independence)") {
    val phi = 0.05
    val a = Sketches.heavyHittersExact(corpus.repartition(1), col("item"), phi)
      .as[(String, Long)].collect().toMap
    val b = Sketches.heavyHittersExact(corpus.repartition(31), col("item"), phi)
      .as[(String, Long)].collect().toMap
    assert(a == b)
  }

  test("KMV estimates distinct count within the k-bound error, exactly below k") {
    val many = (0 until 20000).map(i => s"v${i % 5000}").toDF("v")
    val Array(est, used) = Sketches.kmvDistinct(many, col("v"), 256)
      .collect().head.toSeq.toArray.map(_.toString.toDouble)
    assert(used == 256)
    assert(math.abs(est - 5000) / 5000 < 3.0 / math.sqrt(256), s"est=$est")
    // deterministic across partitionings
    val est2 = Sketches.kmvDistinct(many.repartition(17), col("v"), 256)
      .collect().head.getDouble(0)
    assert(est == est2)
    // below k the sketch holds every distinct hash -> exact
    val few = (0 until 100).map(i => s"v${i % 40}").toDF("v")
    assert(Sketches.kmvDistinct(few, col("v"), 256).collect().head.getDouble(0) == 40.0)
  }

  test("minKSample draws an exact-size, partition-stable, unbiased sample") {
    val df = (1L to 5000L).map(i => (i, i.toDouble)).toDF("id", "x")
    val a = Sketches.minKSample(df, col("id"), 200)
    val rows = a.collect()
    assert(rows.length == 200)
    assert(rows.map(_.getAs[Int]("sample_rank")).sorted.toSeq == (1 to 200))
    val b = Sketches.minKSample(df.repartition(23), col("id"), 200)
      .select("id").as[Long].collect().toSet
    assert(a.select("id").as[Long].collect().toSet == b)
    // quantile estimated from the sample lands near the true quantile
    // (x is uniform on 1..5000; median ~2500, tolerance ~3/sqrt(k))
    val med = a.agg(expr("percentile(x, 0.5)")).head.getDouble(0)
    assert(math.abs(med - 2500) / 2500 < 3.0 / math.sqrt(200), s"median=$med")
  }

  test("kmvDistinctByGroup: exact below k, estimate within bound above") {
    val s = spark; import s.implicits._
    val df = ((1 to 30).map(i => ("small", s"v$i")) ++
      (1 to 4000).map(i => ("big", s"w${i % 2000}"))).toDF("g", "v")
    val out = Sketches.kmvDistinctByGroup(df, col("g"), col("v"), k = 64)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("small") == ((30L, 30.0))) // below k: exact count
    val (kUsed, est) = out("big")
    assert(kUsed == 64L)
    // KMV relative error ~1/sqrt(k-2); allow 4 sigma
    assert(math.abs(est - 2000) / 2000 < 4.0 / math.sqrt(62), s"est=$est")
  }

  test("CMS estimates never undercount; wide sketch is exact; partition-invariant") {
    val s = spark; import s.implicits._
    val items = (Seq.fill(50)("a") ++ Seq.fill(20)("b") ++
      (1 to 30).map(i => s"x$i")).toDF("v")
    val exact = items.groupBy("v").count().as[(String, Long)].collect().toMap
    def run(depth: Int, width: Int, parts: Int) = {
      val src = items.repartition(parts)
      val m = Sketches.cmsSketch(src, col("v"), depth, width)
      Sketches.cmsEstimate(m, src, col("v"), depth, width)
        .as[(String, Long)].collect().toMap
    }
    val tight = run(3, 8, 4) // 32 distinct items into 8 buckets: collisions
    exact.foreach { case (k, n) => assert(tight(k) >= n, s"undercount at $k") }
    val wide = run(4, 4096, 4) // collision-free whp at 32 items
    assert(wide == exact)
    assert(run(3, 8, 17) == tight) // additive counters: order-invariant
  }

  test("HLL states roll up: union of partial states equals the one-shot estimate") {
    val s = spark; import s.implicits._
    val rows = (0 until 20000).map(i => (s"d${i % 4}", s"u${i % 3000}")).toDF("day", "user")
    // one-shot per-day states rolled up to a single estimate...
    val states = Sketches.hllStates(rows, Seq(col("day")), col("user"))
    assert(states.count() == 4)
    val rolled = Sketches.hllRollup(states, Seq(lit(1).as("g")))
      .select(col("n_distinct_est")).as[Long].head()
    // ...equals the estimate from sketching everything directly
    // (register maxing is merge-order-invariant)
    val direct = Sketches.hllRollup(
        Sketches.hllStates(rows, Seq(lit(1).as("g")), col("user")), Seq(col("g")))
      .select(col("n_distinct_est")).as[Long].head()
    assert(rolled == direct)
    // and sits within the lgK=12 error envelope of the exact count
    assert(math.abs(rolled - 3000.0) / 3000.0 < 0.05, s"est=$rolled")
    // partition-count invariance (the property a float-sum would lose)
    val reparts = Sketches.hllRollup(
        Sketches.hllStates(rows.repartition(17), Seq(lit(1).as("g")), col("user")),
        Seq(col("g")))
      .select(col("n_distinct_est")).as[Long].head()
    assert(reparts == direct)
  }

  test("hllDeterministic estimate is partition-invariant and inside " +
    "the m=64 error envelope") {
    val rows = spark.range(5000)
      .select(lit(1).as("g"), concat(lit("u"), (col("id") % 2000)).as("u"))
    def est(df: org.apache.spark.sql.DataFrame): Double =
      Sketches.hllDeterministic(df, Seq(col("g")), col("u"))
        .select(col("est_distinct")).as[Double].head()
    val e1 = est(rows)
    val e2 = est(rows.repartition(13))
    assert(e1 == e2, s"register algebra must be partition-invariant: $e1 vs $e2")
    // m=64 → ~1.04/8 = 13% std error; allow 3 sigma
    assert(math.abs(e1 - 2000.0) / 2000.0 < 0.4, s"est=$e1")
  }

  test("luhnValid accepts known-valid payloads and rejects off-by-one") {
    import graft.functions.TextFunctions
    val df = Seq(
      ("79927398713", true),        // canonical Luhn test number
      ("79927398714", false),       // off by one
      ("4539-1488-0343-6467", true),// separators stripped
      ("no digits", false)          // empty payload
    ).toDF("s", "want")
    val bad = df.where(TextFunctions.luhnValid(col("s")) =!= col("want")).count()
    assert(bad == 0)
  }
}
