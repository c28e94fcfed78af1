package graft.workflow

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model selection with cross-validation / train-validation split
  * (reference selector/ModelSelector.scala:72,116,145 +
  * tuning/OpCrossValidation.scala:42, OpTrainValidationSplit.scala):
  * train every candidate estimator on each validation split, average the
  * metric, pick the best (deterministic tiebreak on candidate name),
  * REFIT the winner on the full training frame, and stand in its fitted
  * stage — downstream stages and scoring see ordinary
  * `<outPrefix>_prediction` / `<outPrefix>_prob_1` columns.
  *
  * All candidates must be constructed with the same `outPrefix` so the
  * winner's outputs satisfy the selector's declared features.
  *
  * Scale: each candidate×fold fit is a distributed spark.ml job; the
  * selection loop itself is driver-side control flow over k*#candidates
  * fits, like the reference's thread-pooled CV (parallelism can be added
  * by scheduling fits concurrently — Spark interleaves jobs). */
object ModelSelector {

  sealed trait Validation
  /** K-fold CV; folds assigned by seeded uniform random. */
  case class KFold(k: Int = 3, seed: Long = 42L) extends Validation
  /** Single train/validation split (OpTrainValidationSplit). */
  case class TrainValidationSplit(trainFraction: Double = 0.75, seed: Long = 42L) extends Validation

  /** Per-candidate mean validation metric from the last fit. */
  case class ValidationResult(name: String, metric: Double)

  class ModelSelectorStage(
      features: Feature, label: Feature, outPrefix: String,
      candidates: Seq[(String, EstimatorStage)],
      validation: Validation,
      metric: (DataFrame, String, String) => Double,
      metricProbCol: String, // column passed to `metric` (prob or prediction)
      maximize: Boolean,
      withProb: Boolean,
      parallelism: Int = 4) extends EstimatorStage { self =>

    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")

    require(candidates.nonEmpty, "need at least one candidate")
    val name = "modelSelector"
    val inputs = Seq(features, label)
    // regression candidates emit no probability column, so the selector
    // must not declare one (mirrors wrapPredictor's withProb output spec)
    lazy val outputFeatures = {
      val pred = new Feature(s"${outPrefix}_prediction", FeatureKind.RealK, isResponse = false, Some(this), inputs)
      if (withProb)
        Seq(pred, new Feature(s"${outPrefix}_prob_1", FeatureKind.RealK, isResponse = false, Some(this), inputs))
      else Seq(pred)
    }

    /** Populated by fit — the reference surfaces the same via
      * ModelSelectorSummary metadata. */
    @volatile var results: Seq[ValidationResult] = Nil
    @volatile var bestName: String = _

    def fit(df: DataFrame): TransformerStage = fitCut(df, Nil)._2

    /** Fit with a label-dependent upstream section REFIT PER SPLIT —
      * the reference's cutDAG leakage control (FitStagesUtil.cutDAG:302,
      * used at OpWorkflow.scala:407-456): estimators whose fit reads the
      * label must never see a fold's validation rows, so they refit on
      * each training split before the candidates do, and once more on
      * the full frame for the final model. Upstream refits are
      * per-SPLIT, not per-candidate (hoisted out of the candidate loop,
      * like the reference). Returns (fitted upstream layers on the full
      * frame, fitted winner). */
    private[workflow] def fitCut(df: DataFrame, upstream: Seq[Seq[Stage]])
        : (Seq[Seq[TransformerStage]], TransformerStage) = {
      val (splits, foldFrame): (Seq[(DataFrame, DataFrame)], Option[DataFrame]) =
        validation match {
          case KFold(k, seed) =>
            val withFold = df.withColumn("__fold", floor(rand(seed) * k).cast("int")).persist()
            ((0 until k).map(i => (
              withFold.where(col("__fold") =!= i).drop("__fold"),
              withFold.where(col("__fold") === i).drop("__fold"))), Some(withFold))
          case TrainValidationSplit(f, seed) =>
            val Array(tr, va) = df.randomSplit(Array(f, 1 - f), seed)
            (Seq((tr, va)), None)
        }
      def fitUpstream(tr: DataFrame): (Seq[Seq[TransformerStage]], DataFrame) = {
        var data = tr
        val fitted = upstream.map { layer =>
          val fl: Seq[TransformerStage] = layer.map {
            case e: EstimatorStage => e.fit(data)
            case t: TransformerStage => t
          }
          data = Workflow.applyLayer(data, fl)
          fl
        }
        (fitted, data)
      }
      // per-split upstream refit (candidate-independent)
      val prepared = splits.map { case (tr, va) =>
        val (fittedUp, trP) = fitUpstream(tr)
        (trP, fittedUp.foldLeft(va)(Workflow.applyLayer))
      }
      // candidate×split fits run concurrently on a driver thread pool —
      // Spark's scheduler interleaves the jobs (reference
      // OpCrossValidation.scala:48 thread-pooled `parallelism`, same
      // default of 4; raise it when candidates outnumber the pool and
      // the cluster has headroom)
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val futures = candidates.map { case (cname, est) =>
        Future {
          val ms = prepared.map { case (tr, va) =>
            val fitted = est.fit(tr)
            metric(Workflow.applyLayer(va, Seq(fitted)), metricProbCol, label.name)
          }
          ValidationResult(cname, ms.sum / ms.length)
        }
      }
      results =
        try futures.map(f => Await.result(f, Duration.Inf))
        finally {
          pool.shutdown()
          // release the fold-annotated cache: the winner refit below runs
          // on `df`, so keeping it would leak a full training-frame copy
          // for the session lifetime
          foldFrame.foreach(_.unpersist(blocking = false))
        }
      val best = results.minBy(r => (if (maximize) -r.metric else r.metric, r.name))
      bestName = best.name
      val winner = candidates.find(_._1 == best.name).get._2
      // refit upstream + winner on the full frame (reference ModelSelector.scala:145)
      val (fittedUpFull, dfP) = fitUpstream(df)
      (fittedUpFull, winner.fit(dfP))
    }
  }

  /** Binary selector: auROC on the probability column, maximized
    * (reference BinaryClassificationModelSelector defaults). */
  def binary(features: Feature, label: Feature, outPrefix: String,
             candidates: Seq[(String, EstimatorStage)],
             validation: Validation = KFold(),
             parallelism: Int = 4): ModelSelectorStage =
    new ModelSelectorStage(features, label, outPrefix, candidates, validation,
      (df, probCol, labelCol) => MLTuning.binaryMetrics(df, probCol, labelCol).auroc,
      s"${outPrefix}_prob_1", maximize = true, withProb = true, parallelism = parallelism)

  /** Default binary candidate pool: LR over a small regParam grid + RF
    * over a depth grid (reference DefaultSelectorParams.scala:71 has the
    * same families; grids kept small and deterministic). */
  def binaryDefaults(features: Feature, label: Feature, outPrefix: String): Seq[(String, EstimatorStage)] =
    Seq(
      "lr_reg0" -> MLStages.logisticRegression(features, label, outPrefix, maxIter = 30, regParam = 0.0),
      "lr_reg01" -> MLStages.logisticRegression(features, label, outPrefix, maxIter = 30, regParam = 0.1),
      "rf_d3" -> MLStages.randomForest(features, label, outPrefix, numTrees = 20, maxDepth = 3),
      "rf_d5" -> MLStages.randomForest(features, label, outPrefix, numTrees = 20, maxDepth = 5))

  /** Multiclass selector: weighted F1 on the prediction column,
    * maximized (reference MultiClassificationModelSelector defaults use
    * error-based metrics on the prediction; weighted F1 is its
    * OpMultiClassificationEvaluator headline). No prob output — the
    * positive-class probability is a binary-only concept. */
  def multiclass(features: Feature, label: Feature, outPrefix: String,
                 candidates: Seq[(String, EstimatorStage)],
                 validation: Validation = KFold(),
                 parallelism: Int = 4): ModelSelectorStage =
    new ModelSelectorStage(features, label, outPrefix, candidates, validation,
      (df, predCol, labelCol) => MLTuning.multiclassMetrics(df, predCol, labelCol).weightedF1,
      s"${outPrefix}_prediction", maximize = true, withProb = false, parallelism = parallelism)

  /** Default multiclass candidate pool: multinomial LR + decision trees
    * of two depths (reference DefaultSelectorParams families). */
  def multiclassDefaults(features: Feature, label: Feature, outPrefix: String): Seq[(String, EstimatorStage)] =
    Seq(
      "lr_reg0" -> MLStages.logisticRegression(features, label, outPrefix, maxIter = 30, regParam = 0.0),
      "dt_d3" -> MLStages.decisionTreeClassifier(features, label, outPrefix, maxDepth = 3),
      "dt_d5" -> MLStages.decisionTreeClassifier(features, label, outPrefix, maxDepth = 5))

  /** Regression selector: RMSE on the prediction column, minimized. */
  def regression(features: Feature, label: Feature, outPrefix: String,
                 candidates: Seq[(String, EstimatorStage)],
                 validation: Validation = KFold(),
                 parallelism: Int = 4): ModelSelectorStage =
    new ModelSelectorStage(features, label, outPrefix, candidates, validation,
      (df, predCol, labelCol) => MLTuning.regressionMetrics(df, predCol, labelCol).rmse,
      s"${outPrefix}_prediction", maximize = false, withProb = false, parallelism = parallelism)

  /** DataCutter (reference tuning/DataCutter.scala:78,151): multiclass
    * label trim — keep the `maxClasses` most frequent labels whose
    * frequency is at least `minLabelFraction`; rows with other labels
    * are dropped. Deterministic: ties broken by label value. */
  def cutMulticlass(df: DataFrame, labelCol: String,
                    maxClasses: Int, minLabelFraction: Double): DataFrame = {
    val counts = df.groupBy(col(labelCol)).agg(count(lit(1)).as("__c"))
    val total = counts.agg(sum(col("__c")).as("__t"))
    val qualified = counts.crossJoin(broadcast(total))
      .where(col("__c") / col("__t") >= minLabelFraction)
    val kept = graft.operators.Vectorizers
      .withRowNumber(qualified, Seq(col("__c").desc, col(labelCol).asc), "__rn")
      .where(col("__rn") <= maxClasses)
      .select(col(labelCol))
    df.join(broadcast(kept), Seq(labelCol), "left_semi")
  }
}
