package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  lazy val vecs = {
    val s = spark; import s.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)), // close to 0
      (2L, Array(0.0f, 1.0f)), // orthogonal to 0
      (3L, Array(-1.0f, 0.0f)) // opposite of 0
    ).toDF("vec_id", "embedding")
  }

  test("cosine: identity 1, orthogonal 0, opposite -1") {
    val s = spark; import s.implicits._
    val e = vecs.select(col("vec_id"), Similarity.toDouble(col("embedding")).as("e"))
    val pairs = e.as("a").crossJoin(e.as("b"))
      .select(col("a.vec_id"), col("b.vec_id"),
        Similarity.cosine(col("a.e"), col("b.e")).as("c"))
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(math.abs(pairs((0L, 0L)) - 1.0) < 1e-12)
    assert(math.abs(pairs((0L, 2L))) < 1e-12)
    assert(math.abs(pairs((0L, 3L)) + 1.0) < 1e-12)
  }

  test("native DotProduct expression: equals interpreted dot, codegen, null contract") {
    val s = spark; import s.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2), Seq(0.3, 0.7))).toDF("a", "b")
    val both = df.select(
      Similarity.dotFast(col("a"), col("b")).as("fast"),
      Similarity.dot(col("a"), col("b")).as("interp"))
    // bit-identical to the sequential interpreted form
    assert(both.collect().forall(r => r.getDouble(0) == r.getDouble(1)))
    // plan shape over NON-foldable input (literals constant-fold away):
    // a native expression, no ScalaUDF anywhere
    val live = spark.range(4).select(
      transform(sequence(lit(0), lit(3)), i => (col("id") + i).cast("double")).as("a"),
      transform(sequence(lit(0), lit(3)), i => (col("id") * 2 + i).cast("double")).as("b"))
      .select(Similarity.dotFast(col("a"), col("b")).as("d"))
    val plan = live.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(plan.contains("graft_dot"), plan)
    assert(live.collect().map(_.getDouble(0)).sum > 0)
    // null in either side -> null out
    val withNull = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(Similarity.dotFast(col("a"), col("b")).as("d")).collect()
    assert(withNull.head.isNullAt(0))
  }

  test("bruteForceTopK ranks by cosine desc") {
    val s = spark; import s.implicits._
    val top = Similarity.bruteForceTopK(vecs, vecs.where(col("vec_id") === 0), k = 3)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    assert(top.map(_._2).toSeq == Seq(1L, 2L, 3L)) // by similarity to vec 0
    assert(top.head._3 > 0.99)
  }

  test("hardNegativesTopK returns only candidates inside the band, " +
    "ranked like bruteForceTopK") {
    val s = spark; import s.implicits._
    val q = vecs.where(col("vec_id") === 0)
    val all = Similarity.bruteForceTopK(vecs, q, k = 100)
      .as[(Long, Long, Double, Int)].collect()
    val banded = all.filter(r => r._3 >= -0.5 && r._3 < 0.99)
    val hard = Similarity.hardNegativesTopK(vecs, q, k = 100, lo = -0.5, hi = 0.99)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    // same set as post-filtering the full ranking, re-ranked densely
    assert(hard.map(_._2).toSeq == banded.sortBy(r => (-r._3, r._2)).map(_._2).toSeq)
    assert(hard.forall(r => r._3 >= -0.5 && r._3 < 0.99))
    assert(hard.map(_._4).toSeq == (1 to hard.length))
  }

  test("cosineNearDupPairs (blocked exact) equals naive all-pairs") {
    val s = spark; import s.implicits._
    // 40 deterministic pseudo-random vectors in 8 dims
    val rows = (0L until 40L).map { id =>
      val e = Array.tabulate(8)(i => math.sin(id * 31 + i * 7).toFloat)
      (id, e)
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.cosineNearDupPairs(df, 0.3, numBlocks = 4)
      .as[(Long, Long, Double)].collect().toSet
    // naive reference with identical fp order
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s0 = 0.0; var i = 0
      while (i < a.length) { s0 += a(i).toDouble * b(i).toDouble; i += 1 }
      s0
    }
    val want = (for {
      (ia, ea) <- rows; (ib, eb) <- rows if ia < ib
      c = dot(ea, eb) / (math.sqrt(dot(ea, ea)) * math.sqrt(dot(eb, eb)))
      if c >= 0.3
    } yield (ia, ib, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("cosineNearDupPairsLSH finds strong near-dups") {
    val s = spark; import s.implicits._
    // pairs (2k, 2k+1) are slight perturbations => cosine ~0.99; the rest random-ish
    val rows = (0L until 30L).map { id =>
      val base = id / 2
      val e = Array.tabulate(16)(i => (math.sin(base * 53 + i * 11) + (if (id % 2 == 1) 0.01 * math.cos(i) else 0.0)).toFloat)
      (id, e)
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.cosineNearDupPairsLSH(df, 0.95, planesPerBand = 8, numBands = 8, dim = 16)
      .as[(Long, Long, Double)].collect()
    val duplicatePairs = got.filter { case (a, b, _) => b == a + 1 && a % 2 == 0 }
    assert(duplicatePairs.length == 15) // every planted pair found
    assert(got.forall(_._3 >= 0.95))
    // literal-weight band buckets equal the dynamic md5-per-row form
    val emb = Similarity.toDouble(col("embedding"))
    val cmp = df.select(
      Similarity.srpBandBucketsLit(emb, 4, 3, 16).as("lit"),
      Similarity.srpBandBuckets(emb, 4, 3).as("dyn")).collect()
    assert(cmp.forall(r => r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("ivfTopK probes enough cells to match brute force on a clustered corpus") {
    val s = spark; import s.implicits._
    // 3 well-separated clusters of 10 vectors each in 8 dims
    val rows = (0L until 30L).map { id =>
      val c = (id % 3).toInt
      val base = Array.tabulate(8)(i => if (i % 3 == c) 1.0 else 0.05)
      val e = base.zipWithIndex.map { case (x, i) => (x + 0.01 * math.sin(id * 13 + i)).toFloat }
      (id, e)
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(df, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // probing every cell makes IVF exhaustive -> identical answers
    val ivfAll = Similarity.ivfTopK(df, queries, k = 5, nList = 6, nProbe = 6)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivfAll == exact)
    // probing 2 of 6 cells keeps high recall on clustered data
    val ivf2 = Similarity.ivfTopK(df, queries, k = 5, nList = 6, nProbe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert((ivf2 & exact).size >= (exact.size * 4) / 5)
  }

  test("pqTopK: ADC ranking finds same-cluster neighbors on clustered data") {
    val s = spark; import s.implicits._
    val rows = (0L until 32L).map { id =>
      val c = (id % 4).toInt
      val e = Array.tabulate(16)(i =>
        (if (i % 4 == c) 1.0 else 0.02) + 0.01 * math.sin(id * 17 + i)).map(_.toFloat)
      (id, e)
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id") < 4) // one query per cluster
    val top = Similarity.pqTopK(df, queries, k = 5, m = 4, nCodes = 8)
      .as[(Long, Long, Double, Int)].collect()
    assert(top.length == 4 * 5)
    // a query's PQ neighbors should overwhelmingly share its cluster
    val sameCluster = top.count { case (q, n, _, _) => q % 4 == n % 4 }
    assert(sameCluster >= 16, s"only $sameCluster/20 same-cluster")
    // distances ascend with rank per query
    top.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq)
    }
  }

  test("ivfCentroids Lloyd refinement pulls centroids to cluster means") {
    val s = spark; import s.implicits._
    val rows = (0L until 30L).map { id =>
      val c = (id % 3).toInt
      val e = Array.tabulate(6)(i => if (i % 3 == c) 1.0f else 0.0f)
      (id, e)
    }
    val df = rows.toDF("vec_id", "embedding")
    val refined = Similarity.ivfCentroids(df, nList = 3, lloydRounds = 2)
    // seeds are ids 0,1,2 = one per cluster; after refinement each
    // centroid is its cluster's exact mean (all members identical)
    refined.zipWithIndex.foreach { case (cent, c) =>
      val want = Array.tabulate(6)(i => if (i % 3 == c) 1.0 else 0.0)
      assert(cent.zip(want).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    }
    // deep refinement stays bounded: 10 rounds are 10 independent
    // shallow jobs over the persisted projection (constant lineage —
    // centroids ride a driver array, not a growing plan), and the
    // fixed point equals the 2-round answer on separable clusters
    val deep = Similarity.ivfCentroids(df, nList = 3, lloydRounds = 10)
    assert(deep.zip(refined).forall { case (a, b) =>
      a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-9 } })
  }

  test("srpBucket: same vector -> same bucket; opposite -> different") {
    val s = spark; import s.implicits._
    val b = vecs.select(col("vec_id"),
        Similarity.srpBucket(Similarity.toDouble(col("embedding")), 8, 2).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(b(0L) != b(3L)) // all 8 plane signs flip for the negation
    // literal-weight fast path computes the same buckets as the
    // dynamic md5-per-row form
    val dyn = vecs.select(col("vec_id"),
        Similarity.srpBucket(Similarity.toDouble(col("embedding")), 8).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(b == dyn)
  }

  test("semanticDedup keeps one min-id representative per duplicate group") {
    val s = spark; import s.implicits._
    // two exact-duplicate groups + two singletons, orthogonal across groups
    val df = Seq(
      1L -> Seq(1f, 0f, 0f, 0f), 2L -> Seq(1f, 0f, 0f, 0f), 3L -> Seq(1f, 0f, 0f, 0f),
      10L -> Seq(0f, 1f, 0f, 0f), 11L -> Seq(0f, 1f, 0f, 0f),
      20L -> Seq(0f, 0f, 1f, 0f), 21L -> Seq(0f, 0f, 0f, 1f))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(df, threshold = 0.9, nList = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 10L, 11L, 20L, 21L))
    assert(out(1L) == ((1L, true)) && out(2L) == ((1L, false)) && out(3L) == ((1L, false)))
    assert(out(10L) == ((10L, true)) && out(11L) == ((10L, false)))
    assert(out(20L) == ((20L, true)) && out(21L) == ((21L, true)))
  }

  test("recallAtK counts truth coverage; missing queries score 0") {
    val s = spark; import s.implicits._
    def frame(rows: (Long, Long, Int)*) =
      rows.toSeq.toDF("query_id", "neighbor_id", "rank")
    val truth = frame((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (2L, 20L, 1))
    val approx = frame((1L, 10L, 1), (1L, 90L, 2), (1L, 12L, 3))
    val out = Similarity.recallAtK(approx, truth, 3)
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == math.rint(2.0 / 3 * 1e6) / 1e6)
    assert(out(2L) == 0.0)
  }

  test("ndcgAtK: 1.0 on a perfect list, 0.0 on disjoint, hand value when degraded") {
    val s = spark; import s.implicits._
    def frame(rows: (Long, Long, Int)*) =
      rows.toSeq.toDF("query_id", "neighbor_id", "rank")
    val truth = frame((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
    assert(Similarity.ndcgAtK(truth, truth, 3)
      .head.getDouble(1) == 1.0)
    val disjoint = frame((1L, 90L, 1), (1L, 91L, 2), (1L, 92L, 3))
    assert(Similarity.ndcgAtK(disjoint, truth, 3).head.getDouble(1) == 0.0)
    // hits at ranks 1 and 3 only:
    // dcg = 1/log2(2) + 1/log2(4) = 1.5; idcg = 1 + 1/log2(3) + 0.5
    val partial = frame((1L, 10L, 1), (1L, 90L, 2), (1L, 12L, 3))
    val want = math.rint(1.5 / (1.5 + 1.0 / (math.log(3) / math.log(2))) * 1e6) / 1e6
    assert(Similarity.ndcgAtK(partial, truth, 3).head.getDouble(1) == want)
    // a query the approx side never answered scores 0 via the truth join
    val truth2 = truth.union(frame((2L, 30L, 1)))
    val byQ = Similarity.ndcgAtK(partial, truth2, 3)
      .as[(Long, Double)].collect().toMap
    assert(byQ(2L) == 0.0 && byQ.size == 2)
  }
}
