package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorizersSpec extends SparkSpec {

  test("bucketize: left-closed right-open, null passthrough") {
    val s = spark; import s.implicits._
    val out = Seq(Some(0.0), Some(9.99), Some(10.0), Some(50.9), None)
      .toDF("x")
      .select(Vectorizers.bucketize(col("x"), Seq(0, 10, 25, 40, 51)).as("b"))
      .as[Option[Int]].collect()
    assert(out.toSeq == Seq(Some(0), Some(0), Some(1), Some(3), None))
  }

  test("topKByCount ranks by count desc then value asc, honors minSupport") {
    val s = spark; import s.implicits._
    val df = (Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(3)("c") ++ Seq("d")).toDF("v")
    val top = Vectorizers.topKByCount(df, col("v"), k = 3, minSupport = 2)
      .as[(String, Long)].collect().toMap
    assert(top == Map("a" -> 1L, "b" -> 2L, "c" -> 3L)) // a before b on tie
  }

  test("giniStumpMapSplits finds the perfect split and nulls the " +
    "constant key") {
    val s = spark; import s.implicits._
    // value 1..8 with label = v > 4: perfect split at threshold 4
    val df = (1 to 8).map(v => (v.toLong, v > 4)).toDF("v", "lab")
      .select(map(lit("sig"), col("v").cast("double"),
        lit("const"), lit(7.0)).as("m"), col("lab").cast("long").as("y"))
    val out = Vectorizers.giniStumpMapSplits(df, col("m"), col("y"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out("sig") == Some(4.0)) // perfect split
    assert(out("const").isEmpty)    // shouldSplit=false path
  }

  test("stringIndex is dense 0-based by frequency") {
    val s = spark; import s.implicits._
    val df = (Seq.fill(3)("y") ++ Seq.fill(5)("x") ++ Seq("z")).toDF("v")
      .withColumn("id", monotonically_increasing_id())
    val idx = Vectorizers.stringIndex(df, col("id"), col("v"))
      .select("value", "idx").distinct()
      .as[(String, Long)].collect().toMap
    assert(idx == Map("x" -> 0L, "y" -> 1L, "z" -> 2L))
  }

  test("imputeMean fills nulls with the non-null mean + indicator") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Some(2.0)), (2L, None), (3L, Some(4.0))).toDF("id", "x")
    val out = Vectorizers.imputeMean(df, col("id"), col("x"))
      .orderBy("id").as[(Long, Double, Int)].collect()
    assert(out.toSeq == Seq((1L, 2.0, 0), (2L, 3.0, 1), (3L, 4.0, 0)))
  }

  test("imputeMode fills nulls with the mode; ties break to the smallest value") {
    val s = spark; import s.implicits._
    // 7 and 9 both occur twice -> mode is 7 (smallest wins, reference
    // ModeSeqNullInt finish semantics)
    val df = Seq((1L, Some(7L)), (2L, Some(9L)), (3L, None),
      (4L, Some(7L)), (5L, Some(9L))).toDF("id", "x")
    val out = Vectorizers.imputeMode(df, col("id"), col("x"))
      .orderBy("id").as[(Long, Long, Int)].collect()
    assert(out.toSeq == Seq((1L, 7L, 0), (2L, 9L, 0), (3L, 7L, 1),
      (4L, 7L, 0), (5L, 9L, 0)))
  }

  test("imputeMode of an all-null column fills 0 (reference empty-map fallback)") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Option.empty[Long]), (2L, Option.empty[Long])).toDF("id", "x")
    val out = Vectorizers.imputeMode(df, col("id"), col("x"))
      .orderBy("id").as[(Long, Long, Int)].collect()
    assert(out.toSeq == Seq((1L, 0L, 1), (2L, 0L, 1)))
  }

  test("targetEncode shrinks rare categories toward the prior; null is a level") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Some("a"), 10.0), (2L, Some("a"), 20.0),
      (3L, Some("b"), 100.0), (4L, None, 40.0)).toDF("id", "cat", "y")
    val out = Vectorizers.targetEncode(df, col("id"), col("cat"), col("y"), alpha = 2.0)
      .select(col("id"), col("enc")).as[(Long, Double)].collect().toMap
    val prior = (10.0 + 20.0 + 100.0 + 40.0) / 4 // 42.5
    def enc(sum: Double, n: Int) =
      math.rint((sum + 2.0 * prior) / (n + 2.0) * 1e6) / 1e6
    assert(out(1L) == enc(30.0, 2) && out(2L) == out(1L))
    assert(out(3L) == enc(100.0, 1))
    assert(out(4L) == enc(40.0, 1)) // null category kept via null-safe join
    // one-observation "b" sits closer to the prior than its raw mean
    assert(math.abs(out(3L) - prior) < math.abs(100.0 - prior))
  }

  test("hashedInteraction: same cross level -> same bucket, null is its own level") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Some("a"), "x"), (2L, Some("a"), "x"),
      (3L, Some("b"), "x"), (4L, None, "x")).toDF("id", "p", "q")
    val out = Vectorizers.hashedInteraction(df, col("id"),
        ("p", col("p")), ("q", col("q")), dims = 1024)
      .as[(Long, Int)].collect().toMap
    assert(out(1L) == out(2L)) // identical conjunction
    assert(out(1L) != out(3L)) // differing level (whp at 1024 dims)
    assert(out(4L) != out(1L)) // null level distinct
    assert(out.values.forall(b => b >= 0 && b < 1024))
  }

  test("robustScale centers on the median and divides by IQR; constant falls back") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0), (5L, 100.0))
      .toDF("id", "x")
    // med = 3, q1 = 2, q3 = 4 -> iqr = 2; the outlier barely moves them
    val out = Vectorizers.robustScale(df, col("id"), col("x"))
      .select(col("id"), col("scaled")).as[(Long, Double)].collect().toMap
    assert(out(3L) == 0.0 && out(1L) == -1.0 && out(5L) == 48.5)
    val const = Seq((1L, 7.0), (2L, 7.0)).toDF("id", "x")
    val cOut = Vectorizers.robustScale(const, col("id"), col("x"))
      .select(col("scaled")).as[Double].collect()
    assert(cOut.forall(_ == 0.0)) // iqr 0 -> divisor 1, centered
  }

  test("targetEncodeOOF excludes the row's own fold from its encoding") {
    val s = spark; import s.implicits._
    val df = (1L to 40L).map(i => (i, "a", if (i % 2 == 0) 1.0 else 0.0))
      .toDF("id", "cat", "y")
    val out = Vectorizers.targetEncodeOOF(df, col("id"), col("cat"), col("y"),
      folds = 4, alpha = 0.0)
    val rows = out.select(col("id"), col("fold"), col("enc"))
      .as[(Long, Int, Double)].collect()
    assert(rows.length == 40)
    // recompute each row's leave-fold-out mean independently
    val folds = rows.map(r => r._1 -> r._2).toMap
    val data = (1L to 40L).map(i => i -> (if (i % 2 == 0) 1.0 else 0.0)).toMap
    rows.foreach { case (id, f, enc) =>
      val rest = data.filter { case (j, _) => folds(j) != f }
      val want = math.rint(rest.values.sum / rest.size * 1e6) / 1e6
      assert(enc == want, s"row $id fold $f: got $enc want $want")
    }
    // rows in different folds get different encodings (leakage-safe
    // encodings vary by fold, unlike plain targetEncode)
    assert(rows.map(_._3).distinct.length > 1)
  }
}
