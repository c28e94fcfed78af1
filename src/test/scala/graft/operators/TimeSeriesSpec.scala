package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {

  /** Two users; u1 has a 100 s gap after two close events, u2 one event. */
  lazy val events = {
    val s = spark; import s.implicits._
    Seq(
      (1L, 1L, "2024-01-01 00:00:00", 1.0),
      (2L, 1L, "2024-01-01 00:00:30", 2.0),
      (3L, 1L, "2024-01-01 00:02:10", 4.0), // 100 s after e2 -> new session
      (4L, 2L, "2024-01-01 00:00:00", 8.0)
    ).toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
  }

  test("sessionize splits on gaps > threshold; summary aggregates per session") {
    val s = spark; import s.implicits._
    val out = TimeSeries.sessionize(events, col("user_id"), col("ts"),
        col("event_id"), gapSeconds = 60L)
      .select(col("event_id"), col("session_idx")).as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))

    val sum = TimeSeries.sessionSummary(events, col("user_id"), col("ts"),
        col("event_id"), col("value"), gapSeconds = 60L)
      .select(col("entity"), col("session_idx"), col("n_events"),
        col("duration_sec"), col("sum_value"))
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    assert(sum == Set((1L, 1L, 2L, 30.0, 3.0), (1L, 2L, 1L, 0.0, 4.0),
      (2L, 1L, 1L, 0.0, 8.0)))
  }

  test("sessionize: a gap exactly at the threshold stays in-session") {
    val s = spark; import s.implicits._
    val out = TimeSeries.sessionize(events, col("user_id"), col("ts"),
        col("event_id"), gapSeconds = 100L)
      .select(col("event_id"), col("session_idx")).as[(Long, Long)].collect().toMap
    assert(out.values.forall(_ == 1L)) // 100 s gap == threshold -> no split
  }

  test("rollingStats: trailing range counts and lag features are exact") {
    val s = spark; import s.implicits._
    val out = TimeSeries.rollingStats(events, col("user_id"), col("ts"),
        col("event_id"), col("value"), windowSeconds = 60L)
      .select(col("id"), col("n_trail"), col("sum_trail"),
        col("prev_value"), col("secs_since_prev"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(out(1L) == ((1L, 1.0, None, None)))
    assert(out(2L) == ((2L, 3.0, Some(1.0), Some(30.0)))) // e1 within 60 s
    assert(out(3L) == ((1L, 4.0, Some(2.0), Some(100.0)))) // e1,e2 aged out
    assert(out(4L) == ((1L, 8.0, None, None)))
  }

  test("funnel: strict ordering, broken chains stay null, non-entrants dropped") {
    val s = spark; import s.implicits._
    val ev = Seq(
      // u1 completes in order
      (1L, "view", "2024-01-01 00:00:00"), (1L, "click", "2024-01-01 00:01:00"),
      (1L, "buy", "2024-01-01 00:02:00"),
      // u2 skips click: buy must NOT count
      (2L, "view", "2024-01-01 00:00:00"), (2L, "buy", "2024-01-01 00:01:00"),
      // u3 never views -> not in output
      (3L, "click", "2024-01-01 00:00:00"),
      // u4 clicks BEFORE viewing -> click doesn't count
      (4L, "click", "2024-01-01 00:00:00"), (4L, "view", "2024-01-01 00:01:00")
    ).toDF("user_id", "et", "ts_s").withColumn("ts", to_timestamp(col("ts_s")))
    val out = TimeSeries.funnel(ev, col("user_id"), col("ts"), col("et"),
        Seq("view", "click", "buy"))
      .select(col("entity"), col("reached")).as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 3, 2L -> 1, 4L -> 1))
  }

  test("cooccurrenceLift: support and lift from hand-counted baskets") {
    val s = spark; import s.implicits._
    // baskets: u1 {a,b}, u2 {a,b}, u3 {a}, u4 {b,c}
    val d = Seq((1L, "a"), (1L, "b"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (4L, "b"), (4L, "c")).toDF("u", "i")
    val out = TimeSeries.cooccurrenceLift(d, col("u"), col("i"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // (a,b): both in 2 of 4 baskets; n_a=3, n_b=3 -> lift = 2*4/9
    assert(out(("a", "b")) == ((2L, 0.5, math.rint(8.0 / 9 * 1e6) / 1e6)))
    // (b,c): 1 basket; n_b=3, n_c=1 -> lift = 1*4/3
    assert(out(("b", "c")) == ((1L, 0.25, math.rint(4.0 / 3 * 1e6) / 1e6)))
    assert(!out.contains(("a", "c"))) // never co-occur -> absent
  }

  test("rollingAnomalies: prior-only window, min-points guard, exact flag") {
    val s = spark; import s.implicits._
    // 6 calm points then a spike; spike's window excludes itself
    val base = (0 to 5).map(i => (i.toLong, 1L, s"2024-01-01 0$i:00:00",
      Seq(10.0, 12.0, 11.0, 13.0, 12.0, 11.0)(i)))
    val ev = (base :+ ((6L, 1L, "2024-01-01 06:00:00", 99.0)))
      .toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = TimeSeries.rollingAnomalies(ev, col("user_id"), col("ts"),
        col("event_id"), col("value"), windowSeconds = 86400L, k = 3.0,
        minPoints = 5)
      .select(col("id"), col("n_prior"), col("is_anomaly"))
      .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(0L) == ((0L, 0))) // no priors
    assert(out(4L) == ((4L, 0))) // below minPoints, even though calm
    assert(out(6L) == ((6L, 1))) // 99 vs mean ~11.5, sd ~1.05 -> flagged
    assert(out(5L)._2 == 0)
  }

  test("sessionize plans ONE exchange for the stacked windows") {
    val p = TimeSeries.sessionize(events, col("user_id"), col("ts"),
      col("event_id"), 60L).queryExecution.executedPlan.toString
    // localrelation input: any Exchange present must be the single
    // hashpartitioning(user_id); no second shuffle between the windows
    assert(p.linesIterator.count(_.contains("Exchange")) <= 1, p)
  }

  test("asOfJoin attaches the latest right value at-or-before each left ts") {
    val s = spark; import s.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val right = Seq((1L, t(10), 100.0), (1L, t(20), 200.0), (2L, t(5), 50.0))
      .toDF("k", "ts", "v")
    val left = Seq(
      (11L, 1L, t(9)),   // before any right row -> null
      (12L, 1L, t(10)),  // inclusive: sees the ts=10 row
      (13L, 1L, t(25)),  // latest is ts=20
      (14L, 3L, t(30))   // key with no right rows -> null
    ).toDF("id", "k", "ts")
    val out = TimeSeries.asOfJoin(left, col("id"), col("k"), col("ts"),
        right, col("k"), col("ts"), col("v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out == Map(11L -> None, 12L -> Some(100.0), 13L -> Some(200.0),
      14L -> None))
  }

  test("scd2 collapses unchanged runs into validity intervals") {
    val s = spark; import s.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ch = Seq(
      (1L, t(0), 1L, "a"), (1L, t(5), 2L, "a"),   // unchanged -> no new interval
      (1L, t(10), 3L, "b"), (1L, t(20), 4L, "a"), // back to a -> third interval
      (2L, t(1), 5L, "x")).toDF("k", "ts", "ord", "v")
    val out = TimeSeries.scd2(ch, col("k"), col("ts"), col("ord"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getInt(4))).toSet
    assert(out == Set(
      (1L, "a", t(0), Some(t(10)), 0),
      (1L, "b", t(10), Some(t(20)), 0),
      (1L, "a", t(20), None, 1),
      (2L, "x", t(1), None, 1)))
  }

  test("assembleSequences keeps the first maxLen items in event-time order") {
    val s = spark; import s.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, t(3), 30L, "c"), (1L, t(1), 10L, "a"), (1L, t(2), 20L, "b"),
      (1L, t(4), 40L, "d"),
      // same ts: event id breaks the tie
      (2L, t(1), 2L, "late"), (2L, t(1), 1L, "early")).toDF("k", "ts", "eid", "item")
    val out = TimeSeries.assembleSequences(ev, col("k"), col("ts"), col("eid"),
        col("item"), maxLen = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((4L, 3L, "a|b|c")))   // capped at 3 of 4, time order
    assert(out(2L) == ((2L, 2L, "early|late")))
  }

  test("retentionCohorts builds the cohort grid with period-0 retention 1.0") {
    val s = spark; import s.implicits._
    def d(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    // cohort Mon Jan 1 week: users 1, 2; week+1 only user 1 returns;
    // cohort Jan 8 week: user 3
    val ev = Seq((1L, d(2)), (2L, d(3)), (1L, d(9)), (3L, d(10)))
      .toDF("u", "ts")
    val out = TimeSeries.retentionCohorts(ev, col("u"), col("ts"), "week")
      .collect().map(r => (r.getTimestamp(0).toString.take(10), r.getInt(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(out == Set(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 1L, 2L, 0.5),
      ("2024-01-08", 0, 1L, 1L, 1.0)))
  }

  test("topPaths counts identical session paths and ranks by frequency") {
    val s = spark; import s.implicits._
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    // users 1 and 2 both do a->b in one session; user 3 does c alone
    val ev = Seq(
      (1L, t(0), 1L, "a"), (1L, t(5), 2L, "b"),
      (2L, t(0), 3L, "a"), (2L, t(5), 4L, "b"),
      (3L, t(0), 5L, "c")).toDF("u", "ts", "eid", "it")
    val out = TimeSeries.topPaths(ev, col("u"), col("ts"), col("eid"), col("it"),
        gapSeconds = 3600L, maxLen = 5, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set(("a>b", 2L, 1), ("c", 1L, 2)))
  }
}
