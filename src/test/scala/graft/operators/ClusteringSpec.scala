package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {

  test("kmeansAssign recovers separated blobs with canonical labels") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    // three well-separated blobs of 30 points each around (0,0), (20,0), (0,20)
    val centers = Seq((0.0, 0.0), (20.0, 0.0), (0.0, 20.0))
    val pts = for {
      (cx, cy) <- centers; j <- 0 until 30
    } yield (centers.indexOf((cx, cy)) * 100L + j,
      Array((cx + rnd.nextGaussian()).toFloat, (cy + rnd.nextGaussian()).toFloat))
    val df = pts.toDF("vec_id", "embedding")
    val out = Clustering.kmeansAssign(df, col("vec_id"), col("embedding"), k = 3)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 90)
    // every blob maps to exactly one cluster whose label is its min id
    val byBlob = out.groupBy(_._1 / 100)
    for ((blob, rows) <- byBlob) {
      val labels = rows.map(_._2).distinct
      assert(labels.length == 1, s"blob $blob split across clusters: $labels")
      assert(labels.head == blob * 100, s"blob $blob label not canonical min id")
    }
    // distances are to a nearby centroid, not a far one
    assert(out.forall(_._3 < 10.0), "a point is far from its centroid")
  }

  test("kCenterGreedy saturates short of k on < k distinct points") {
    val s = spark; import s.implicits._
    // 3 distinct points, each duplicated — k=5 must stop at 3 centers
    // (the documented <k contract) rather than emit duplicate centers
    val pts = Seq(
      (1L, Array(0f, 0f)), (2L, Array(0f, 0f)),
      (3L, Array(10f, 0f)), (4L, Array(10f, 0f)),
      (5L, Array(0f, 10f)), (6L, Array(0f, 10f)))
    val df = pts.toDF("vec_id", "embedding")
    val out = Clustering.kCenterGreedy(df, col("vec_id"), col("embedding"), k = 5)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(out.length == 3, s"expected saturation at 3 centers, got ${out.length}")
    // one center per distinct point, deterministic order: smallest id
    // first, then farthest-point picks with min-id tiebreak on dmin
    assert(out.map(_._2).toSet == Set(1L, 3L, 5L))
    assert(out.head == ((1, 1L, 0L)))
    assert(out.forall { case (r, _, d) => r == 1 || d > 0L })
  }
}
