package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProjectionSpec extends SparkSpec {

  test("signProjection: matches a driver-side replay of the md5 sign family") {
    val s = spark; import s.implicits._
    val data = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (1L, Array(-1.0f, 0.5f, 0.0f, 2.0f)))
    val df = data.toDF("vec_id", "embedding")
    val got = Projection
      .signProjection(df, col("vec_id"), col("embedding"), inDim = 4, outDim = 3)
      .as[(Long, Int, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got.size == 6)
    for ((id, vec) <- data; j <- 0 until 3) {
      val expected = vec.indices
        .map(i => vec(i).toDouble * Projection.sign(i, j))
        .foldLeft(0.0)(_ + _) / math.sqrt(3.0)
      val rounded = BigDecimal(expected).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got((id, j)) == rounded, s"id=$id j=$j")
    }
  }

  test("signProjection is a narrow plan: no shuffle Exchange") {
    val s = spark; import s.implicits._
    val df = Seq((0L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val plan = Projection
      .signProjection(df, col("vec_id"), col("embedding"), inDim = 2, outDim = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection should not shuffle:\n$plan")
  }

  test("pca: captured variance is non-increasing by component and dominates the tail") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    // anisotropic cloud: dim 0 has 10x the spread of dim 1, dims 2-3 noise
    val df = (0 until 200).map { i =>
      (i.toLong, Array(
        (rnd.nextGaussian() * 10).toFloat, (rnd.nextGaussian() * 3).toFloat,
        rnd.nextGaussian().toFloat, (rnd.nextGaussian() * 0.1).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Projection.pca(df, col("vec_id"), col("embedding"), k = 3)
      .groupBy(col("dim"))
      .agg(var_samp(col("value")).as("v"))
      .as[(Int, Double)].collect().toMap
    assert(out.size == 3)
    assert(out(0) > out(1) && out(1) > out(2),
      s"component variance must be non-increasing: $out")
    assert(out(0) > 50.0 && out(2) < 5.0, s"axis separation lost: $out")
  }

  test("sign family is deterministic and roughly balanced") {
    val signs = for (i <- 0 until 64; j <- 0 until 8) yield Projection.sign(i, j)
    assert(signs.forall(sg => sg == 1.0 || sg == -1.0))
    val pos = signs.count(_ == 1.0)
    assert(pos > signs.size / 4 && pos < 3 * signs.size / 4,
      s"sign family badly unbalanced: $pos/+ of ${signs.size}")
    assert(Projection.sign(3, 5) == Projection.sign(3, 5))
  }
}
