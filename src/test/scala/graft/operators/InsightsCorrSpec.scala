package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.workflow.MLTuning

class InsightsCorrSpec extends SparkSpec {

  test("corrInsights ranks slots by |corr| with the score") {
    val s = spark; import s.implicits._
    // slot 0 = score exactly (corr 1), slot 1 = -score (corr -1, same
    // abs, loses dim tiebreak), slot 2 = constant (corr null -> rank last)
    val df = (1 to 20).map(i => (Seq(i.toDouble, -i.toDouble, 5.0), i.toDouble))
      .toDF("v", "score")
    val out = Insights.corrInsights(df, col("v"), col("score"))
      .orderBy("rank").as[(Int, Option[Double], Int)].collect()
    assert(out(0) == ((0, Some(1.0), 1)))
    assert(out(1) == ((1, Some(-1.0), 2)))
    assert(out(2)._1 == 2 && out(2)._2.isEmpty)
  }

  test("topKAccuracy counts the label within the K best classes") {
    val s = spark; import s.implicits._
    val df = Seq(
      (Seq(0.7, 0.2, 0.1), 0.0), // top1 hit
      (Seq(0.2, 0.7, 0.1), 0.0), // top2 hit
      (Seq(0.1, 0.2, 0.7), 0.0), // top3 only
      (Seq(0.5, 0.3, 0.2), 1.0)  // top2 hit
    ).toDF("probs", "y")
    val acc = MLTuning.topKAccuracy(df, "probs", "y", Seq(1, 2, 3))
    assert(acc(1) == 0.25)
    assert(acc(2) == 0.75)
    assert(acc(3) == 1.0)
  }
}
