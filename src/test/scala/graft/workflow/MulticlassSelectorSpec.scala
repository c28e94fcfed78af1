package graft.workflow

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MulticlassSelectorSpec extends SparkSpec {

  // Tiny separable 3-class problem: class = quadrant-ish of (x, y).
  private def frame = {
    val s = spark; import s.implicits._
    val rows = for (i <- 0 until 120) yield {
      val cls = i % 3
      val base = cls * 10.0
      (i.toLong, Seq(base + (i % 7) * 0.1, base - (i % 5) * 0.1), cls.toDouble)
    }
    rows.toDF("id", "f", "y")
  }

  test("multiclass selector picks a candidate deterministically and scores all classes") {
    val fVec = Feature.raw("f", FeatureKind.VectorK)
    val fLab = Feature.raw("y", FeatureKind.RealK, isResponse = true)
    val sel = ModelSelector.multiclass(fVec, fLab, "mc",
      ModelSelector.multiclassDefaults(fVec, fLab, "mc"),
      ModelSelector.TrainValidationSplit(0.75))
    val model = new Workflow(sel.outputFeatures).fit(frame)
    val scored = model.score(frame, keep = Seq("id", "y"))
    assert(scored.columns.contains("mc_prediction"))
    assert(!scored.columns.contains("mc_prob_1")) // no prob for multiclass
    val acc = scored.where(col("mc_prediction") === col("y")).count().toDouble /
      scored.count()
    assert(acc > 0.95, s"separable 3-class accuracy $acc")
    assert(sel.results.length == 3 && sel.bestName.nonEmpty)
  }

  test("mlpClassifier wrapper trains and emits prob_1") {
    val s = spark; import s.implicits._
    val df = (0 until 80).map { i =>
      val y = if (i % 2 == 0) 0.0 else 1.0
      (i.toLong, Seq(y * 2 + (i % 3) * 0.01, 1 - y + (i % 5) * 0.01), y)
    }.toDF("id", "f", "y")
    val fVec = Feature.raw("f", FeatureKind.VectorK)
    val fLab = Feature.raw("y", FeatureKind.RealK, isResponse = true)
    val mlp = MLStages.mlpClassifier(fVec, fLab, "mlp", layers = Seq(2, 4, 2), maxIter = 40)
    val model = new Workflow(mlp.outputFeatures).fit(df)
    val scored = model.score(df, keep = Seq("id", "y"))
    assert(scored.columns.contains("mlp_prediction") && scored.columns.contains("mlp_prob_1"))
    val acc = scored.where(col("mlp_prediction") === col("y")).count().toDouble / 80
    assert(acc > 0.9, s"separable binary accuracy $acc")
  }
}
