package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental aggregate states, Theil's U, personalized PageRank. */
class Stats4Spec extends SparkSpec {

  import spark.implicits._

  test("Incremental: state + delta merge equals a full recompute, in " +
    "any merge order and with repeated deltas") {
    val full = (1 to 100).map(i => (s"k${i % 3}", i.toDouble)).toDF("k", "v")
    val parts = Seq(
      full.where(col("v") <= 30), full.where(col("v") > 30 && col("v") <= 31),
      full.where(col("v") > 31))
    val states = parts.map(p =>
      Incremental.aggState(p, Seq(col("k")), Seq("v" -> col("v"))))
    val mergedA = Incremental.readout(
      Incremental.mergeStates(Seq("k"), Seq("v"), states: _*), Seq("k"), Seq("v"))
    val mergedB = Incremental.readout(
      Incremental.mergeStates(Seq("k"), Seq("v"), states.reverse: _*),
      Seq("k"), Seq("v"))
    val direct = Incremental.readout(
      Incremental.aggState(full, Seq(col("k")), Seq("v" -> col("v"))),
      Seq("k"), Seq("v"))
    val key = (r: org.apache.spark.sql.Row) => r.getString(0)
    val canon = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => key(r) -> r.toSeq.drop(1)).toMap
    assert(canon(mergedA) === canon(direct))
    assert(canon(mergedB) === canon(direct)) // order-insensitive: exact decimals
  }

  test("Incremental state handles empty deltas and all-null metrics") {
    val base = Seq(("a", Some(1.0)), ("a", None)).toDF("k", "v")
    val emptyDelta = base.where(lit(false))
    val st = Incremental.aggState(base, Seq(col("k")), Seq("v" -> col("v")))
    val dl = Incremental.aggState(emptyDelta, Seq(col("k")), Seq("v" -> col("v")))
    val out = Incremental.readout(
      Incremental.mergeStates(Seq("k"), Seq("v"), st, dl), Seq("k"), Seq("v")).head
    assert(out.getAs[Long]("v_cnt") === 1L) // count(v) skips the null
    assert(out.getAs[Double]("v_sum") === 1.0)
  }

  test("theilsU: independence scores ~0 both ways; determinism scores " +
    "1 in the determined direction only") {
    // b determines a (a = b mod 2), but a does not determine b
    val df = (0 until 120).map(i => (s"a${i % 2}", s"b${i % 4}")).toDF("a", "b")
    val r = DataQuality.theilsU(df, col("a"), col("b")).head
    assert(r.getAs[Double]("u_a_given_b") === 1.0) // H(a|b) = 0
    assert(r.getAs[Double]("u_b_given_a") < 0.6)
    val indep = (0 until 120).map(i => (s"a${i % 2}", s"b${(i / 2) % 2}")).toDF("a", "b")
    val r2 = DataQuality.theilsU(indep, col("a"), col("b")).head
    assert(math.abs(r2.getAs[Double]("u_a_given_b")) < 1e-9)
  }

  test("personalizedPageRank concentrates mass near the seeds and " +
    "degenerates to pageRank's recurrence with all nodes seeded") {
    // barbell: seed side 1-2-3 triangle, bridge 3-4, far side 4-5-6
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (4L, 6L)).flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("s", "d")
    val seeds = Seq(1L).toDF("node")
    val pr = Graph.personalizedPageRank(edges, col("s"), col("d"), seeds,
      iters = 3).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(1L) > pr(6L) * 3) // mass stays near the seed
    assert(math.abs(pr.values.sum - 1.0) < 0.2) // teleport keeps ~unit mass
    // seeding EVERY node = uniform restart = classic PageRank
    val allSeeds = (1L to 6L).toDF("node")
    val ppr = Graph.personalizedPageRank(edges, col("s"), col("d"), allSeeds,
      iters = 3).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val classic = Graph.pageRank(edges, col("s"), col("d"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (1L to 6L).foreach(n => assert(math.abs(ppr(n) - classic(n)) < 1e-12))
  }

  test("bootstrapMeanCI: CI brackets the true mean of a well-behaved " +
    "sample, se is positive and small, weights average ~1") {
    val df = (1L to 2000L).map(i => (i, 50.0 + (i % 21) - 10)).toDF("id", "v")
    val r = DataQuality.bootstrapMeanCI(df, col("id"), col("v"),
      replicas = 40).head
    val mean = r.getAs[Double]("point_mean")
    assert(math.abs(mean - 50.0) < 0.5)
    assert(r.getAs[Double]("ci_lo") < mean && mean < r.getAs[Double]("ci_hi"))
    assert(r.getAs[Double]("se") > 0 && r.getAs[Double]("se") < 1.0)
    assert(r.getAs[Long]("n") === 2000L)
  }

  test("bootstrapMeanCI is deterministic across invocations (md5 draws)") {
    val df = (1L to 500L).map(i => (i, i.toDouble)).toDF("id", "v")
    val a = DataQuality.bootstrapMeanCI(df, col("id"), col("v")).head
    val b = DataQuality.bootstrapMeanCI(df, col("id"), col("v")).head
    assert(a === b)
  }

  test("markovTransitions: deterministic cycle gives probability-1 " +
    "transitions; probabilities per row sum to 1") {
    // user cycles a -> b -> c -> a ...
    val df = (0 until 30).map(i => (1L, i.toLong, i.toLong,
      Seq("a", "b", "c")(i % 3))).toDF("u", "t", "o", "s")
    val got = TimeSeries.markovTransitions(df, col("u"), col("t"), col("o"),
      col("s")).collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("a", "b"))._2 === 1.0)
    assert(got(("b", "c"))._2 === 1.0)
    assert(got(("c", "a"))._2 === 1.0)
    assert(got.size === 3) // no cross-user or self transitions invented
  }
}
