package graft.aggregators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MapAggregatorsSpec extends SparkSpec {

  lazy val df = {
    val s = spark; import s.implicits._
    Seq(
      (1L, 10L, Map("a" -> 1.0, "b" -> 4.0)),
      (1L, 20L, Map("a" -> 3.0)),
      (2L, 30L, Map("c" -> 5.0))
    ).toDF("g", "ts", "m")
  }

  test("unionSumLongMap merges with per-key sums") {
    val s = spark; import s.implicits._
    val got = df.select(col("g"), transform_values(col("m"), (_, v) => v.cast("long")).as("lm"))
      .groupBy("g").agg(MapAggregators.unionSumLongMap(col("lm")).as("u"))
      .as[(Long, Map[String, Long])].collect().toMap
    assert(got(1L) == Map("a" -> 4L, "b" -> 4L))
    assert(got(2L) == Map("c" -> 5L))
  }

  test("unionMeanMap computes per-key means") {
    val s = spark; import s.implicits._
    val got = df.groupBy("g").agg(MapAggregators.unionMeanMap(col("m")).as("u"))
      .as[(Long, Map[String, Double])].collect().toMap
    assert(got(1L) == Map("a" -> 2.0, "b" -> 4.0))
  }

  test("unionMin/MaxMap keep per-key extremes") {
    val s = spark; import s.implicits._
    val mn = df.groupBy("g").agg(MapAggregators.unionMinMap(col("m")).as("u"))
      .as[(Long, Map[String, Double])].collect().toMap
    val mx = df.groupBy("g").agg(MapAggregators.unionMaxMap(col("m")).as("u"))
      .as[(Long, Map[String, Double])].collect().toMap
    assert(mn(1L)("a") == 1.0 && mx(1L)("a") == 3.0)
  }

  test("unionSetMap finishes sorted; unionOrMap ORs") {
    val s = spark; import s.implicits._
    val sets = df.select(col("g"), transform_values(col("m"), (_, v) => concat(lit("v"), v.cast("int"))).as("sm"))
      .groupBy("g").agg(MapAggregators.unionSetMap(col("sm")).as("u"))
      .as[(Long, Map[String, Seq[String]])].collect().toMap
    assert(sets(1L)("a") == Seq("v1", "v3"))
    val ors = df.select(col("g"), transform_values(col("m"), (_, v) => v > 3.5).as("bm"))
      .groupBy("g").agg(MapAggregators.unionOrMap(col("bm")).as("u"))
      .as[(Long, Map[String, Boolean])].collect().toMap
    assert(ors(1L) == Map("a" -> false, "b" -> true))
  }

  test("concatMapByTime orders by event time per key") {
    val s = spark; import s.implicits._
    val got = df.select(col("g"), col("ts"),
        transform_values(col("m"), (_, v) => v.cast("int").cast("string")).as("sm"))
      .groupBy("g").agg(MapAggregators.concatMapByTime(col("ts"), col("sm")).as("u"))
      .as[(Long, Map[String, String])].collect().toMap
    assert(got(1L)("a") == "1,3") // ts 10 before ts 20
  }
}
