package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MapVectorizersSpec extends SparkSpec {

  test("realMapVectorize mean-imputes per discovered key with null indicator") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Some(10.0), Some(1.0)),
      (2L, Some(20.0), None),
      (3L, None, Some(3.0))).toDF("id", "a", "b")
      .select(col("id"), map(lit("a"), col("a"), lit("b"), col("b")).as("m"))
    val out = MapVectorizers.realMapVectorize(df, col("id"), col("m"))
      .orderBy("id")
      .as[(Long, Double, Int, Double, Int)].collect()
    assert(out(0) == ((1L, 10.0, 0, 1.0, 0)))
    assert(out(1) == ((2L, 20.0, 0, 2.0, 1))) // b mean = (1+3)/2
    assert(out(2) == ((3L, 15.0, 1, 3.0, 0))) // a mean = (10+20)/2
  }

  test("binaryMapVectorize fills false and tracks nulls per key") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Some(true), Some(false)),
      (2L, None, Some(true))).toDF("id", "x", "y")
      .select(col("id"), map(lit("x"), col("x"), lit("y"), col("y")).as("m"))
    val out = MapVectorizers.binaryMapVectorize(df, col("id"), col("m"))
      .orderBy("id")
      .as[(Long, Int, Int, Int, Int)].collect()
    assert(out(0) == ((1L, 1, 0, 0, 0)))
    assert(out(1) == ((2L, 0, 1, 1, 0)))
  }

  test("geoMapVectorize fills missing entries with the key midpoint") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Some(Seq(0.0, 0.0, 1.0))),
      (2L, Some(Seq(0.0, 90.0, 3.0))),
      (3L, None)).toDF("id", "g")
      .select(col("id"), map(lit("home"), col("g")).as("m"))
    val out = MapVectorizers.geoMapVectorize(df, col("id"), col("m"))
      .orderBy("id")
      .as[(Long, Double, Double, Double, Int)].collect()
    assert(out(0) == ((1L, 0.0, 0.0, 1.0, 0)))
    assert(out(2)._5 == 1)
    // midpoint of (0,0) and (0,90) on the equator is (0,45)
    assert(math.abs(out(2)._2 - 0.0) < 1e-9 && math.abs(out(2)._3 - 45.0) < 1e-9)
    assert(math.abs(out(2)._4 - 2.0) < 1e-9) // mean accuracy
  }
}
