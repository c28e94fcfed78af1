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
}
