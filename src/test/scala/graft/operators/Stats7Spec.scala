package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sliding distinct actives, join-cardinality pre-flight, and the
  * streaming transition extractor (cross-batch state stitching). */
class Stats7Spec extends SparkSpec {

  import spark.implicits._

  test("slidingDistinct counts each entity once per window and matches " +
    "a brute-force range join") {
    def t(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // u1 active days 1 and 3 (twice on day 3), u2 day 5, u3 days 1..2
    val df = Seq((1L, t(1)), (1L, t(3)), (1L, t(3)), (2L, t(5)),
      (3L, t(1)), (3L, t(2))).toDF("u", "ts")
    val got = TimeSeries.slidingDistinct(df, col("u"), col("ts"), windowDays = 3)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // window ending d covers [d-2, d]
    assert(got === Map(
      "2024-01-01" -> 2L, // u1, u3
      "2024-01-02" -> 2L, // u1(d1), u3
      "2024-01-03" -> 2L, // u1(d1,d3), u3(d1..2)
      "2024-01-05" -> 2L)) // u1(d3), u2
  }

  test("joinCardinality: exact output size and dominating keys of a " +
    "skewed self-join") {
    val df = (Seq.fill(10)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L)).toDF("k")
    val rows = DataQuality.joinCardinality(df, col("k"), df, col("k"), topK = 2)
      .collect()
    val byRank = rows.map(r => r.getAs[Int]("rank") ->
      ((r.getAs[Long]("key"), r.getAs[Long]("contrib")))).toMap
    assert(byRank(1) === ((1L, 100L)))
    assert(byRank(2) === ((2L, 9L)))
    assert(rows.head.getAs[Long]("est_rows") === 110L) // 100 + 9 + 1
    assert(rows.head.getAs[Long]("n_joint_keys") === 3L)
  }

  test("transitionStream stitches transitions ACROSS micro-batches via " +
    "the per-key last-event state and sorts within a batch") {
    val s = spark; import s.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // batch 1 arrives out of order inside the batch
    mem.addData((1L, t(2), 2L, "b"), (1L, t(1), 1L, "a"))
    val stream = mem.toDF.toDF("user_id", "ts", "event_id", "event_type")
    val ds = graft.streaming.Streaming.transitionStream(s, stream)
    val q = ds.toDF().writeStream.format("memory")
      .queryName("stats7_transitions").outputMode("append").start()
    q.processAllAvailable()
    // batch 2: continuation for user 1 (stitches b -> c), new user 2
    mem.addData((1L, t(3), 3L, "c"), (2L, t(1), 4L, "x"), (2L, t(2), 5L, "y"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("stats7_transitions")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set((1L, "a", "b"), (1L, "b", "c"), (2L, "x", "y")))
  }
}
