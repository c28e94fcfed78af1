package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventReadersSpec extends SparkSpec {

  lazy val events = {
    val s = spark; import s.implicits._
    Seq(
      ("u1", "2024-01-01 00:00:00", 1.0, true),
      ("u1", "2024-01-10 00:00:00", 2.0, false),
      ("u1", "2024-01-20 00:00:00", 4.0, true), // at/after cutoff (15th)
      ("u2", "2024-01-16 00:00:00", 8.0, false) // all after cutoff
    ).toDF("k", "ts_s", "v", "flag").withColumn("ts", to_timestamp(col("ts_s")))
  }

  test("aggregateWithCutoff: predictors strictly before, responses at/after") {
    val s = spark; import s.implicits._
    val out = AggregateReader.aggregateWithCutoff(
        events, col("k"), col("ts"), CutOff.At("2024-01-15 00:00:00"),
        predictors = Seq(AggSpec("pred_sum", sum, col("v"))),
        responses = Seq(AggSpec("resp_sum", sum, col("v"))))
      .orderBy("k")
      .as[(String, Option[Double], Option[Double])].collect()
    assert(out(0) == (("u1", Some(3.0), Some(4.0))))
    assert(out(1) == (("u2", None, Some(8.0))))
  }

  test("aggregateWithCutoff honors windows each side") {
    val s = spark; import s.implicits._
    val out = AggregateReader.aggregateWithCutoff(
        events, col("k"), col("ts"), CutOff.At("2024-01-15 00:00:00"),
        predictors = Seq(AggSpec("p", sum, col("v"))),
        responses = Seq(AggSpec("r", sum, col("v"))),
        predictorWindow = Some(expr("INTERVAL 6 DAYS")),
        responseWindow = Some(expr("INTERVAL 2 DAYS")))
      .orderBy("k")
      .as[(String, Option[Double], Option[Double])].collect()
    // u1: predictor window [9th,15th) -> only the 2.0; response [15th,17th) -> none
    assert(out(0) == (("u1", Some(2.0), None)))
  }

  test("CutOff WeeksAgo and DDMMYYYY resolve to the documented timestamps") {
    val s = spark; import s.implicits._
    val got = Seq(1).toDF("x").select(
      CutOff.WeeksAgo(2, "2024-06-30 00:00:00").toColumn.cast("string"),
      CutOff.DDMMYYYY("15062024").toColumn.cast("string")).collect().head
    assert(got.getString(0) == "2024-06-16 00:00:00")
    assert(got.getString(1) == "2024-06-15 00:00:00")
  }

  test("aggregateAsOf: per-key cutoff at first qualifying event") {
    val s = spark; import s.implicits._
    val out = ConditionalReader.aggregateAsOf(
        events, col("k"), col("ts"),
        targetCondition = col("flag"),
        keep = TimeStampToKeep.Min,
        predictors = Seq(AggSpec("p_n", count, lit(1))),
        responses = Seq(AggSpec("r_n", count, lit(1))))
      .orderBy("k")
      .as[(String, Long, Long)].collect()
    // u1 cutoff = 1st (first flag): 0 events before, 3 at/after
    assert(out(0) == (("u1", 0L, 3L)))
    // u2 never meets condition -> dropped
    assert(out.length == 1)
  }

  test("secondaryAggregate windows the many side") {
    val s = spark; import s.implicits._
    val parent = Seq(("o1", "2024-01-10 00:00:00", 100.0)).toDF("ok", "od_s", "tot")
      .withColumn("od", to_timestamp(col("od_s")))
    val child = Seq(("o1", "2024-01-12 00:00:00", 5.0), ("o1", "2024-02-20 00:00:00", 7.0))
      .toDF("ck", "sd_s", "price").withColumn("sd", to_timestamp(col("sd_s")))
    val joined = JoinedReader.join(parent, child, col("ok"), col("ck"))
    val out = JoinedReader.secondaryAggregate(joined, col("ok"),
        parentSide = Seq("tot" -> col("tot")),
        manySide = Seq(AggSpec("rev", sum, col("price"))),
        ts = col("sd"), cutoff = col("od") + expr("INTERVAL 30 DAYS"),
        window = Some(expr("INTERVAL 30 DAYS")))
      .as[(String, Double, Option[Double])].collect()
    assert(out.head == (("o1", 100.0, Some(5.0)))) // the Feb row is outside the window
  }
}
