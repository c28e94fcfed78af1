package graft.aggregators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MonoidAggregatorsSpec extends SparkSpec {
  import MonoidAggregators._

  lazy val events = {
    val s = spark; import s.implicits._
    Seq(
      ("u1", 1L, "a", 1.0), ("u1", 2L, "b", 2.0), ("u1", 3L, "a", 3.0),
      ("u2", 5L, "c", -1.0), ("u2", 4L, "d", 0.0)
    ).toDF("k", "ts", "v", "x")
  }

  test("modeString picks most frequent with min-value tiebreak") {
    val s = spark; import s.implicits._
    val out = events.groupBy("k").agg(modeString(col("v")).as("m"))
      .as[(String, String)].collect().toMap
    assert(out("u1") == "a") // a appears twice
    assert(out("u2") == "c") // tie between c,d -> alphabetical min
  }

  test("first/last by event time") {
    val s = spark; import s.implicits._
    val out = events.groupBy("k")
      .agg(firstByTime(col("v"), col("ts")).as("f"), lastByTime(col("v"), col("ts")).as("l"))
      .as[(String, String, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("u1") == ("a", "a"))
    assert(out("u2") == ("d", "c"))
  }

  test("logicalXor = parity of true count") {
    val s = spark; import s.implicits._
    val out = events.groupBy("k").agg(logicalXor(col("x") > 0).as("p"))
      .as[(String, Boolean)].collect().toMap
    assert(out("u1")) // 3 positives -> odd
    assert(!out("u2")) // 0 positives -> even
  }

  test("concatByTime orders by timestamp") {
    val s = spark; import s.implicits._
    val out = events.groupBy("k").agg(concatByTime(col("v"), col("ts")).as("c"))
      .as[(String, String)].collect().toMap
    assert(out("u1") == "a,b,a")
    assert(out("u2") == "d,c")
  }

  test("unionSumMap merges maps summing collisions") {
    val s = spark; import s.implicits._
    val df = Seq(("k", Map("a" -> 1.0, "b" -> 2.0)), ("k", Map("b" -> 3.0)))
      .toDF("k", "m")
    val out = df.groupBy("k").agg(unionSumMap(col("m")).as("u"))
      .as[(String, Map[String, Double])].collect().head._2
    assert(out == Map("a" -> 1.0, "b" -> 5.0))
  }

  test("max/minDateList keep the extreme across per-row lists as a singleton list") {
    val s = spark; import s.implicits._
    val df = Seq(("k", Seq(5L, 9L)), ("k", Seq(1L)), ("k", Seq.empty[Long]))
      .toDF("k", "dl")
    val out = df.groupBy("k")
      .agg(maxDateList(col("dl")).as("mx"), minDateList(col("dl")).as("mn"))
      .as[(String, Seq[Long], Seq[Long])].collect().head
    assert(out._2 == Seq(9L))
    assert(out._3 == Seq(1L))
  }

  test("combineVectors concatenates in sort-key order") {
    val s = spark; import s.implicits._
    val df = Seq(("k", 2L, Seq(3.0, 4.0)), ("k", 1L, Seq(1.0, 2.0)))
      .toDF("k", "ord", "v")
    val out = df.groupBy("k").agg(combineVectors(col("v"), col("ord")).as("c"))
      .as[(String, Seq[Double])].collect().head._2
    assert(out == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("GeoMidpoint averages on the sphere and keeps best accuracy") {
    val s = spark; import s.implicits._
    val ds = Seq((0.0, 0.0, 1.0), (0.0, 90.0, 5.0)).toDS()
    val mid = ds.select(udaf(GeoMidpoint).apply(col("_1"), col("_2"), col("_3")).as("g"))
      .as[Seq[Double]].collect().head
    assert(math.abs(mid.head) < 1e-9) // lat 0
    assert(math.abs(mid(1) - 45.0) < 1e-9) // lon 45
    assert(mid(2) == 5.0)
  }
}
