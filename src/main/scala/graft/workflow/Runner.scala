package graft.workflow

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Application entry dispatch (reference OpWorkflowRunner.run,
  * core/.../OpWorkflowRunner.scala:296-365, run types at :358-365, and
  * OpParams locations): Train fits + saves, Score loads + scores +
  * optionally writes, Features materializes the raw feature frame only,
  * Evaluate scores + computes metrics, StreamingScore wires the fitted
  * model into the micro-batch loop. Everything heavy is a Spark job;
  * dispatch and (de)serialization stay on the driver.
  */
object Runner {

  sealed trait RunType
  case object Train extends RunType
  case object Score extends RunType
  case object Features extends RunType
  case object Evaluate extends RunType

  /** Location/column parameters (reference OpParams). */
  final case class RunParams(
      modelDir: String,
      writeDir: Option[String] = None,
      keep: Seq[String] = Nil,
      labelCol: Option[String] = None,
      scoreCol: Option[String] = None)

  sealed trait RunResult
  final case class TrainResult(model: WorkflowModel) extends RunResult
  final case class ScoreResult(scores: DataFrame) extends RunResult
  final case class FeaturesResult(raw: DataFrame) extends RunResult
  final case class EvaluateResult(scores: DataFrame, metrics: Map[String, Double]) extends RunResult

  /** Single dispatcher over the run types (reference
    * OpWorkflowRunner.run:296). Train needs `resultFeatures`; the other
    * types run from the saved model at `params.modelDir`. */
  def run(runType: RunType, spark: SparkSession, data: DataFrame,
          params: RunParams, resultFeatures: Seq[Feature] = Nil): RunResult =
    runType match {
      case Train => train(resultFeatures, data, params)
      case Score => score(spark, data, params)
      case Features => features(spark, data, params, resultFeatures)
      case Evaluate => evaluate(spark, data, params)
    }

  /** Fit the workflow and persist it (reference Train → §3.1 + save). */
  def train(resultFeatures: Seq[Feature], df: DataFrame, p: RunParams): TrainResult = {
    val model = new Workflow(resultFeatures).fit(df)
    ModelIO.save(model, p.modelDir, df.sparkSession)
    TrainResult(model)
  }

  /** Load the persisted model, score, optionally write parquet
    * (reference Score → loadModel + §3.2 + saveScores). */
  def score(spark: SparkSession, df: DataFrame, p: RunParams): ScoreResult = {
    val model = ModelIO.load(spark, p.modelDir)
    val scores = model.score(df, p.keep)
    p.writeDir.foreach(d => scores.write.mode("overwrite").parquet(d))
    ScoreResult(scores)
  }

  /** Materialize the raw feature columns only (reference Features →
    * computeFeatures): the raw ancestors of the declared results, or of
    * the saved model's results when none are passed. */
  def features(spark: SparkSession, df: DataFrame, p: RunParams,
               resultFeatures: Seq[Feature] = Nil): FeaturesResult = {
    val feats =
      if (resultFeatures.nonEmpty) resultFeatures
      else ModelIO.load(spark, p.modelDir).resultFeatures
    val raws = feats.flatMap(Workflow.rawAncestors).distinct
      .filter(df.columns.contains)
    FeaturesResult(df.select(raws.map(org.apache.spark.sql.functions.col): _*))
  }

  /** Score then evaluate (reference Evaluate → scoreAndEvaluate:272).
    * Binary metrics when `labelCol`+`scoreCol` are set on the scored
    * frame; metrics land in the result map. */
  def evaluate(spark: SparkSession, df: DataFrame, p: RunParams): EvaluateResult = {
    val ScoreResult(scores) = score(spark, df, p.copy(writeDir = None))
    val metrics = (p.labelCol, p.scoreCol) match {
      case (Some(l), Some(s)) =>
        val m = MLTuning.binaryMetrics(scores, s, l)
        Map("auroc" -> m.auroc, "aupr" -> m.aupr, "accuracy" -> m.accuracy, "f1" -> m.f1)
      case _ => Map.empty[String, Double]
    }
    p.writeDir.foreach(d => scores.write.mode("overwrite").parquet(d))
    EvaluateResult(scores, metrics)
  }

  /** Micro-batch scoring from the saved model (reference StreamingScore
    * → OpWorkflowRunner.scala:232-263): defers to Streaming.scoreStream
    * with the loaded model. */
  def streamingScore(spark: SparkSession, stream: DataFrame, p: RunParams,
                     checkpoint: String)(sink: (DataFrame, Long) => Unit) = {
    val model = ModelIO.load(spark, p.modelDir)
    graft.streaming.Streaming.scoreStream(stream, model, p.keep, checkpoint)(sink)
  }
}
