package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge-case specs for the round-6 operator batch — behaviors the
  * oracle gates can't probe (failure modes, empty inputs, tolerance
  * boundaries, convergence guards). */
class Round6OpsSpec extends SparkSpec {

  test("flattenHierarchy resolves a chain and fails loudly on a cycle") {
    val s = spark; import s.implicits._
    // chain 1 <- 2 <- 3 <- 4 plus a second root 10
    val par = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 3L), (10L, 10L))
      .toDF("k", "p")
    val out = Graph.flattenHierarchy(par, col("k"), col("p"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(4L) == ((1L, 3L)) && out(3L) == ((1L, 2L)) &&
      out(1L) == ((1L, 0L)) && out(10L) == ((10L, 0L)))
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("k", "p")
    val err = intercept[Exception] {
      Graph.flattenHierarchy(cyc, col("k"), col("p"), maxRounds = 5).count()
    }
    assert(err.getMessage.contains("cycle"), err.getMessage)
  }

  test("bfsDistances: min distance wins, unreachable nodes absent, empty seeds") {
    val s = spark; import s.implicits._
    // 1->2->3->4 and shortcut 1->3; 99 isolated
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val d = Graph.bfsDistances(e, col("src"), col("dst"), seeds, col("node"), 4)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    val none = Graph.bfsDistances(e, col("src"), col("dst"),
      Seq.empty[Long].toDF("node"), col("node"), 2)
    assert(none.count() == 0)
  }

  test("shortestPaths relaxes beyond the first-reached cost") {
    val s = spark; import s.implicits._
    // direct 1->3 costs 10; detour 1->2->3 costs 3: Bellman-Ford must
    // improve 3 after its first (cheaper-hop) reach
    val e = Seq((1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 2L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    val c = Graph.shortestPaths(e, col("src"), col("dst"), col("w"),
      seeds, col("node"), maxHops = 3).as[(Long, Long)].collect().toMap
    assert(c == Map(1L -> 0L, 2L -> 1L, 3L -> 3L))
  }

  test("ancestorClosure emits reflexive rows and full ancestor chains") {
    val s = spark; import s.implicits._
    val par = Seq((1L, 1L), (2L, 1L), (3L, 2L)).toDF("k", "p")
    val cl = Graph.ancestorClosure(par, col("k"), col("p"))
      .as[(Long, Long, Long)].collect().toSet
    assert(cl == Set((1L, 1L, 0L), (2L, 2L, 0L), (3L, 3L, 0L),
      (2L, 1L, 1L), (3L, 2L, 1L), (3L, 1L, 2L)))
  }

  test("kCorePeel removes tendrils, keeps the clique, symmetrized input") {
    val s = spark; import s.implicits._
    // triangle 1-2-3 (each degree 2) + pendant 3-4
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val e = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val core2 = Graph.kCorePeel(e, col("src"), col("dst"), k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(core2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L)) // 4 peeled, 3's deg drops
    val core3 = Graph.kCorePeel(e, col("src"), col("dst"), k = 3, rounds = 3)
    assert(core3.count() == 0) // triangle is not a 3-core
  }

  test("asOfJoinDirected: forward picks the next value inside tolerance only") {
    val s = spark; import s.implicits._
    val right = Seq((1L, 100L, 10.0), (1L, 500L, 50.0))
      .toDF("k", "sec", "v")
      .select(col("k"), col("sec").cast("timestamp").as("ts"), col("v"))
    val left = Seq((101L, 1L, 90L), (102L, 1L, 100L), (103L, 1L, 400L),
      (104L, 1L, 501L))
      .toDF("id", "k", "sec")
      .select(col("id"), col("k"), col("sec").cast("timestamp").as("ts"))
    val out = TimeSeries.asOfJoinDirected(left, col("id"), col("k"), col("ts"),
        right, col("k"), col("ts"), col("v"), forward = true, toleranceSec = 60L)
      .select(col("id"), col("asof"), col("asof_lag_sec"))
      .as[(Long, Option[Double], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(101L) == ((Some(10.0), Some(10L)))) // next right at 100, lag 10
    assert(out(102L) == ((Some(10.0), Some(0L)))) // equal ts is visible
    assert(out(103L) == ((None, None))) // next right at 500: lag 100 > 60
    assert(out(104L) == ((None, None))) // nothing ahead
  }

  test("streaks splits on gaps and numbers islands in time order") {
    val s = spark; import s.implicits._
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-05",
      "2024-01-06", "2024-03-01").map(d => (7L, d))
    val df = days.toDF("u", "d").select(col("u"), col("d").cast("date").as("d"))
    val out = TimeSeries.streaks(df, col("u"), col("d"))
      .orderBy(col("streak_idx"))
      .select(col("streak_len"), col("streak_idx"))
      .as[(Long, Int)].collect().toSeq
    assert(out == Seq((3L, 1), (2L, 2), (1L, 3)))
  }

  test("fillDailyGaps densifies each key over its own range only") {
    val s = spark; import s.implicits._
    val df = Seq(("a", "2024-01-01", 1.0), ("a", "2024-01-04", 4.0),
      ("b", "2024-02-01", 9.0))
      .toDF("k", "d", "v").select(col("k"), col("d").cast("date").as("d"), col("v"))
    val out = TimeSeries.fillDailyGaps(df, col("k"), col("d"), col("v"))
    assert(out.count() == 5) // a: 4 days, b: 1 day
    assert(out.where(col("is_filled") === 1).count() == 2)
    assert(out.where(col("k") === "b" && col("value") === 9.0).count() == 1)
  }

  test("gridDbscan merges adjacent core cells, marks sparse cells noise") {
    val s = spark; import s.implicits._
    // two adjacent dense cells (0,0) and (0,1), one far dense cell
    // (5,5), one sparse cell (9,9)
    def pts(cy: Long, cx: Long, n: Int) =
      (1 to n).map(i => (cy + 0.5, cx + 0.5))
    val all = pts(0, 0, 5) ++ pts(0, 1, 5) ++ pts(5, 5, 5) ++ pts(9, 9, 1)
    val df = all.toDF("lat", "lon")
    val out = Geo.gridDbscan(df, col("lat"), col("lon"), cellDeg = 1.0,
        minPts = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out((0L, 0L)) == out((0L, 1L)) && out((0L, 0L)).isDefined)
    assert(out((5L, 5L)).isDefined && out((5L, 5L)) != out((0L, 0L)))
    assert(out((9L, 9L)).isEmpty)
  }

  test("fellegiSunterEM separates a planted match/non-match mixture") {
    val s = spark; import s.implicits._
    // matches mostly agree on all three fields, non-matches mostly
    // disagree: the all-agree pattern must get the max posterior and a
    // positive weight, the all-disagree pattern the min
    val pat = Seq((1, 1, 1, 80L), (1, 1, 0, 15L), (0, 0, 1, 100L),
      (0, 0, 0, 800L)).toDF("g1", "g2", "g3", "n")
    val out = Dedup.fellegiSunterEM(pat, iters = 2)
      .select(col("g1"), col("g2"), col("g3"), col("w"), col("match_weight"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        ((r.getDouble(3), r.getDouble(4)))).toMap
    val all = out((1, 1, 1)); val none = out((0, 0, 0))
    assert(all._1 > 0.9 && none._1 < 0.1)
    assert(all._2 > 0 && none._2 < 0)
    assert(out.values.map(_._1).max == all._1)
  }

  test("containmentPairs flags an embedded doc that jaccard misses") {
    val s = spark; import s.implicits._
    val small = "alpha beta gamma delta"
    val big = ("alpha beta gamma delta " +
      (1 to 40).map(i => s"w$i").mkString(" "))
    val df = Seq((1L, small), (2L, big)).toDF("id", "text")
    val cont = Dedup.containmentPairs(df, col("id"), col("text"), k = 3,
      threshold = 0.9).collect()
    assert(cont.length == 1 && cont(0).getDouble(2) == 1.0) // A fully inside B
    val jac = Dedup.jaccardPairs(df, col("id"), col("text"), k = 3,
      threshold = 0.9)
    assert(jac.count() == 0) // union-dominated jaccard misses it
  }
}
