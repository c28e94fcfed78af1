package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Known-answer specs for the round-6 operator additions: exact
  * isotonic PAVA (minimax form), all-pairs BFS distances, and the
  * stub-codec audio decimation plumbing. */
class InferenceOpsSpec extends SparkSpec {

  test("isotonicPava matches hand-pooled PAVA on a violator series") {
    val sess = spark; import sess.implicits._
    // y = 1, 3, 2, 4: PAVA pools (3,2) -> 2.5; fit = 1, 2.5, 2.5, 4
    val df = Seq(("a", 1, 1.0), ("a", 2, 3.0), ("a", 3, 2.0), ("a", 4, 4.0))
      .toDF("k", "o", "y")
    val fit = Robust.isotonicPava(df, col("k"), col("o"), col("y"))
      .orderBy(col("idx")).collect()
    assert(fit.map(_.getAs[Double]("fitted")).toSeq ==
      Seq(1.0, 2.5, 2.5, 4.0))
    // monotone nondecreasing by construction
    val fs = fit.map(_.getAs[Double]("fitted"))
    assert(fs.zip(fs.tail).forall { case (a, b) => a <= b })
  }

  test("isotonicPava on an already-monotone series is the identity") {
    val sess = spark; import sess.implicits._
    val df = Seq(("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 5.0))
      .toDF("k", "o", "y")
    val fit = Robust.isotonicPava(df, col("k"), col("o"), col("y"))
      .orderBy(col("idx")).collect()
    assert(fit.map(_.getAs[Double]("fitted")).toSeq == Seq(1.0, 2.0, 5.0))
  }

  test("allPairsDistances computes hop distances on a path graph") {
    val sess = spark; import sess.implicits._
    // path 1 - 2 - 3 - 4 (undirected)
    val e = Seq((1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3))
      .toDF("u", "v")
    val d = Graph.allPairsDistances(e, col("u"), col("v"), maxHops = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(d((1, 4)) == 3L && d((1, 3)) == 2L && d((2, 4)) == 2L)
    assert(d((1, 1)) == 0L && d((4, 1)) == 3L)
    assert(d.size == 16) // complete within 3 hops on a 4-path
  }

  test("allPairsDistances respects the hop bound") {
    val sess = spark; import sess.implicits._
    val e = Seq((1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3))
      .toDF("u", "v")
    val d = Graph.allPairsDistances(e, col("u"), col("v"), maxHops = 1)
      .collect()
    assert(d.length == 4 + 6) // reflexive rows + direct edges only
  }

  test("decimateAudio emits 3-tap sums over every 3rd interior window") {
    val sess = spark; import sess.implicits._
    val docs = Seq((1L, "hello world")).toDF("doc_id", "text")
    val withP = Multimodal.withPayload(docs, "text")
    val out = Multimodal.decimateAudio(withP, col("doc_id"), col("payload"))
      .collect().head
    assert(out.getAs[Long]("n_out") == 5L)
    val total = out.getAs[Long]("total")
    val peak = out.getAs[Long]("peak")
    assert(peak <= 3 * 255 && peak >= 0 && total >= peak)
    // operator rounds to 6 decimals
    assert(math.abs(out.getAs[Double]("mean_smoothed") -
      total / 3.0 / 5.0) <= 5e-7)
  }
}
