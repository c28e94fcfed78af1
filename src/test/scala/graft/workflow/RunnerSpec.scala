package graft.workflow

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RunnerSpec extends SparkSpec {

  // tiny separable binary problem: y = x > 0
  lazy val df = {
    val s = spark; import s.implicits._
    (1 to 40).map { i =>
      val x = if (i % 2 == 0) i.toDouble else -i.toDouble
      (i.toLong, Seq(x), if (x > 0) 1.0 else 0.0)
    }.toDF("id", "fv", "y")
  }

  lazy val modelDir = java.nio.file.Files.createTempDirectory("graft_runner").toString

  test("Train/Score/Features/Evaluate dispatch round-trips through the saved model") {
    val Seq(_, fv, y) = Feature.fromSchema(df.schema, response = Some("y"))
    val lr = MLStages.logisticRegression(fv, y, "m", maxIter = 20)
    val p = Runner.RunParams(modelDir, keep = Seq("id"),
      labelCol = Some("y"), scoreCol = Some("m_prob_1"))

    val Runner.TrainResult(model) =
      Runner.run(Runner.Train, spark, df, p, lr.outputFeatures)
    assert(model.layers.nonEmpty)

    val Runner.ScoreResult(scores) = Runner.run(Runner.Score, spark, df, p)
    assert(scores.columns.toSet == Set("id", "m_prediction", "m_prob_1"))
    assert(scores.count() == 40)

    val Runner.FeaturesResult(raw) =
      Runner.run(Runner.Features, spark, df, p, lr.outputFeatures)
    assert(raw.columns.toSet == Set("fv", "y"))

    // Evaluate needs the label alongside the scores
    val pEval = p.copy(keep = Seq("id", "y"))
    val Runner.EvaluateResult(_, metrics) = Runner.run(Runner.Evaluate, spark, df, pEval)
    assert(metrics("auroc") > 0.99) // separable -> perfect ranking
    assert(metrics("accuracy") > 0.99)
  }

  test("computeDataUpTo materializes a DAG prefix with intermediates") {
    val s = spark; import s.implicits._
    val data = Seq((1L, Some(10.0)), (2L, None), (3L, Some(30.0))).toDF("id", "x")
    val Seq(_, x) = Feature.fromSchema(data.schema)
    val imp = Stages.imputeMean(x, "x_f")
    val z = Stages.standardScale(imp.outputFeatures.head, "x_z")
    val model = new Workflow(z.outputFeatures).fit(data)
    val upTo = model.computeDataUpTo(data, "x_f")
    assert(upTo.columns.contains("x_f"))
    assert(!upTo.columns.contains("x_z")) // later layer not applied
    intercept[IllegalArgumentException] {
      model.computeDataUpTo(data, "nope")
    }
  }
}
