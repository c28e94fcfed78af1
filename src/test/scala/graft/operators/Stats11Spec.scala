package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases for the round-6 robust-fit / drift / alignment additions:
  * Page-Hinkley, DTW, Huber IRLS, RANSAC, and MMR re-ranking. */
class Stats11Spec extends SparkSpec {

  import spark.implicits._

  test("pageHinkley stays silent on a constant series and fires after " +
    "a level shift") {
    val flat = (1 to 20).map(i => ("flat", i, 100.0))
    val step = (1 to 10).map(i => ("step", i, 100.0)) ++
      (11 to 20).map(i => ("step", i, 200.0))
    val df = (flat ++ step).toDF("k", "o", "x")
    val got = TimeSeries.pageHinkley(df, col("k"), col("o"), col("x"),
        delta = 0.0, lambda = 50.0)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("alarm_idx"), r.getAs[Long]("n"))).toMap
    assert(got("flat")._1 == 0L)
    assert(got("flat")._2 == 20L)
    // m rises by ~(200 - running mean) per post-shift step; the 50
    // threshold trips within a few steps of t=11
    assert(got("step")._1 >= 11L && got("step")._1 <= 14L)
  }

  test("dtw of identical series is 0, and the shifted-by-one ramp costs " +
    "only the boundary cells") {
    val df = Seq((Array(1.0, 2.0, 3.0, 4.0), Array(1.0, 2.0, 3.0, 4.0),
        Array(2.0, 3.0, 4.0, 5.0)))
      .toDF("a", "same", "shift")
    val r = df.select(
      TimeSeries.dtw(col("a"), col("same")).as("d0"),
      TimeSeries.dtw(col("a"), col("shift")).as("d1")).head()
    assert(r.getAs[Double]("d0") == 0.0)
    // optimal path matches 2..4 exactly and pays |1-2| + |4-5| = 2
    assert(r.getAs[Double]("d1") == 2.0)
  }

  test("dtw hand example matches the worked DP (xs=[1,3,5] vs [2,4])") {
    val df = Seq((Array(1.0, 3.0, 5.0), Array(2.0, 4.0))).toDF("a", "b")
    assert(df.select(TimeSeries.dtw(col("a"), col("b"))).head()
      .getDouble(0) == 3.0)
  }

  test("huberIrls pulls the slope toward the clean line that one huge " +
    "outlier dragged away from OLS") {
    // y = 10x on 1..20 except x=10 spikes to 10000
    val rows = (1 to 20).map(i =>
      ("k", i, if (i == 10) 10000L else 10L * i))
    val df = rows.toDF("k", "x", "y")
    val r = Robust.huberIrls(df, col("k"), col("x"), col("y"),
      c = 30.0, iters = 2).head()
    val olsB = r.getAs[Double]("b0")
    val hubB = r.getAs[Double]("b_fit")
    assert(math.abs(hubB - 10.0) < math.abs(olsB - 10.0))
    assert(r.getAs[Long]("n_down") >= 1L)
    assert(math.abs(hubB - 10.0) < 2.0)
  }

  test("ransacLine recovers the exact majority line under 30% gross " +
    "outliers (model residuals 0 on the consensus set)") {
    val clean = (1 to 14).map(i => ("k", i, i, 10L * i))
    val noise = (15 to 20).map(i => ("k", i, i, 5000L + i))
    val df = (clean ++ noise).toDF("k", "idx", "x", "y")
    val r = Robust.ransacLine(df, col("k"), col("idx"), col("x"),
      col("y"), thresh = 1.0, trials = 16).head()
    assert(r.getAs[Long]("n_inliers") == 14L)
    assert(r.getAs[Double]("b_fit") == 10.0)
    assert(r.getAs[Double]("a_fit") == 0.0)
  }

  test("boruvkaMst recovers the unique MST of a weighted square-with-" +
    "diagonal and skips the heavy redundant edges") {
    // square 1-2-3-4 with cheap sides (1,2,3,4), expensive diagonal 9
    // and a heavier parallel side 7: MST = the three cheapest sides
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L),
      (4L, 1L, 4L), (1L, 3L, 9L), (2L, 3L, 7L))
      .toDF("u", "v", "w")
    val got = Graph.boruvkaMst(edges, col("u"), col("v"), col("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L)))
  }

  test("boruvkaMst on a disconnected graph returns a spanning forest") {
    val edges = Seq((1L, 2L, 5L), (10L, 11L, 7L), (11L, 12L, 6L),
      (10L, 12L, 8L)).toDF("u", "v", "w")
    val got = Graph.boruvkaMst(edges, col("u"), col("v"), col("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (11L, 12L), (10L, 11L)))
  }

  test("mmrRerank picks by relevance first, then trades relevance for " +
    "diversity") {
    // two near-duplicate high-rel docs (1, 2) and a diverse lower-rel
    // doc (3): pos1 = 1 (max rel); pos2 must skip the near-dup 2 and
    // take 3 when 7*rel difference < 3*sim difference
    // pos2 scores: cand2 = 7*880000 - 3*990000 = 3190000 < cand3 =
    // 7*500000 - 3*100000 = 3200000 → diversity wins by 10000
    val cands = Seq((0L, 1L, 900000L), (0L, 2L, 880000L),
      (0L, 3L, 500000L)).toDF("query_id", "cand_id", "relq")
    val sims = Seq(
      (0L, 1L, 2L, 990000L), (0L, 2L, 1L, 990000L),
      (0L, 1L, 3L, 100000L), (0L, 3L, 1L, 100000L),
      (0L, 2L, 3L, 100000L), (0L, 3L, 2L, 100000L))
      .toDF("query_id", "ca", "cb", "simq")
    val got = Similarity.mmrRerank(cands, sims, 3)
      .orderBy(col("pos"))
      .collect().map(r => (r.getAs[Int]("pos"), r.getAs[Long]("cand_id")))
    assert(got.toSeq == Seq((1, 1L), (2, 3L), (3, 2L)))
  }
}
