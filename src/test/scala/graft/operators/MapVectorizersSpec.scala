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

  test("realMapVectorize keeps all-null keys with a 0.0 fill") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Some(10.0), Option.empty[Double]),
      (2L, Some(20.0), Option.empty[Double])).toDF("id", "a", "dead")
      .select(col("id"), map(lit("a"), col("a"), lit("dead"), col("dead")).as("m"))
    val out = MapVectorizers.realMapVectorize(df, col("id"), col("m"))
      .orderBy("id").collect()
    // key discovery comes from map_keys, so 'dead' still gets columns
    assert(out.head.schema.fieldNames.toSeq ==
      Seq("id", "a_v", "a_null", "dead_v", "dead_null"))
    assert(out.forall(r => r.getDouble(3) == 0.0 && r.getInt(4) == 1))
  }

  test("smartTextMapVectorize dispatches per key: pivot low-card, hash free text, pad short fits") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "red", "the quick brown fox jumps"),
      (2L, "red", "entirely different words here now"),
      (3L, "blue", "the quick brown fox jumps again and again"),
      (4L, "red", "short")).toDF("id", "color", "bio")
      .select(col("id"),
        map(lit("color"), col("color"), lit("bio"), col("bio")).as("m"))
    val out = MapVectorizers.smartTextMapVectorize(df, col("id"), col("m"),
      maxCardinality = 3, topK = 3, dims = 16)
    // color (2 distinct) -> pivot: slots 1..3 (padded), other, null
    assert(out.columns.contains("color_1") && out.columns.contains("color_3"))
    assert(out.columns.contains("color_other") && out.columns.contains("color_null"))
    // bio (4 distinct, length variance > 0) -> hashed tf vector
    assert(out.columns.contains("bio_tf"))
    val rows = out.orderBy("id").collect()
    val c1 = out.columns.indexOf("color_1")
    // 'red' (count 3) is the rank-1 pivot value
    assert(rows(0).getInt(c1) == 1 && rows(2).getInt(c1) == 0)
    // padded slot 3 is always 0
    assert(rows.forall(_.getInt(out.columns.indexOf("color_3")) == 0))
    // every bio_tf is a fixed-width non-null vector
    val ti = out.columns.indexOf("bio_tf")
    assert(rows.forall(_.getSeq[Double](ti).length == 16))
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

  test("multiPickListMapVectorize: set containment slots, counting other, null slot") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Some(Seq("a", "b"))),        // a,b both top -> slots 1,2; other 0
      (2L, Some(Seq("a", "z", "w"))),   // a top; z,w not -> other 2
      (3L, Some(Seq("b"))),
      (4L, Option.empty[Seq[String]]),  // key absent -> null slot
      (5L, Some(Seq("a", "a", "b")))    // duplicate collapses (set semantics)
    ).toDF("id", "vs")
      .select(col("id"),
        when(col("vs").isNotNull, map(lit("tags"), col("vs"))).as("m"))
    val out = MapVectorizers.multiPickListMapVectorize(df, col("id"), col("m"), k = 2)
      .orderBy("id").collect()
    assert(out.head.schema.fieldNames.toSeq ==
      Seq("id", "tags_1", "tags_2", "tags_other", "tags_null"))
    // fit: a freq 3, b freq 3 -> tie broken by value: a=slot1, b=slot2
    def row(i: Int) = (out(i).getInt(1), out(i).getInt(2), out(i).getInt(3), out(i).getInt(4))
    assert(row(0) == ((1, 1, 0, 0)))
    assert(row(1) == ((1, 0, 2, 0))) // z,w counted in other
    assert(row(2) == ((0, 1, 0, 0)))
    assert(row(3) == ((0, 0, 0, 1))) // absent key: only the null slot
    assert(row(4) == ((1, 1, 0, 0))) // duplicates don't double-count
  }

  test("discoverKeys caps at the top maxKeys by frequency, sorted") {
    val s = spark; import s.implicits._
    // key frequencies: common=4, mid=3, rare2=2, rare1=1
    val df = Seq(
      Seq("common", "mid", "rare2"),
      Seq("common", "mid", "rare2"),
      Seq("common", "mid", "rare1"),
      Seq("common")
    ).toDF("ks")
      .select(map_from_arrays(col("ks"),
        transform(col("ks"), k => lit(1.0))).as("m"))
    assert(MapVectorizers.discoverKeys(df, col("m"), maxKeys = 2) == Seq("common", "mid"))
    // under the cap: every key, alphabetical
    assert(MapVectorizers.discoverKeys(df, col("m"), maxKeys = 10) ==
      Seq("common", "mid", "rare1", "rare2"))
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
