package graft.workflow

import org.apache.spark.ml.classification.{LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.workflow.FeatureKind._

/** spark.ml predictor wrappers as workflow stages (reference
  * OpPredictorWrapper family + ModelSelector, SURVEY §2.8). The fitted
  * model scores inside the DAG like any other transformer; prediction
  * lands as plain columns (`<prefix>_prediction`, `<prefix>_prob_1`) —
  * the engine's Prediction-map analog, kept flat for column pruning.
  *
  * Scale: training is delegated to spark.ml (distributed); scoring is a
  * model.transform (codegen'd for LR; tree ensembles row-local).
  */
object MLStages {

  private def toVec(featuresCol: String) = array_to_vector(col(featuresCol))

  /** Binary/multinomial logistic regression. */
  def logisticRegression(features: Feature, label: Feature, outPrefix: String,
                         maxIter: Int = 50, regParam: Double = 0.0): EstimatorStage =
    new EstimatorStage {
      val name = "logisticRegression"
      val inputs = Seq(features, label)
      lazy val outputFeatures = Seq(
        new Feature(s"${outPrefix}_prediction", RealK, isResponse = false, Some(this), inputs),
        new Feature(s"${outPrefix}_prob_1", RealK, isResponse = false, Some(this), inputs))
      private val self = this

      def fit(df: DataFrame): TransformerStage = {
        val prepared = df.select(toVec(features.name).as("__features"),
          col(label.name).cast("double").as("__label"))
        val model = new LogisticRegression()
          .setMaxIter(maxIter).setRegParam(regParam)
          .setFeaturesCol("__features").setLabelCol("__label")
          .fit(prepared)
        new DataFrameStage("logisticRegression.fitted", inputs) {
          def outputs = Seq(s"${outPrefix}_prediction" -> RealK, s"${outPrefix}_prob_1" -> RealK)
          override lazy val outputFeatures = self.outputFeatures
          def transform(df: DataFrame): DataFrame = {
            val scored = model
              .setFeaturesCol("__f").setPredictionCol("__pred")
              .setProbabilityCol("__prob").setRawPredictionCol("__raw")
              .transform(df.withColumn("__f", toVec(features.name)))
            scored
              .withColumn(s"${outPrefix}_prediction", col("__pred"))
              .withColumn(s"${outPrefix}_prob_1", vector_to_array(col("__prob")).getItem(1))
              .drop("__f", "__pred", "__prob", "__raw")
          }
        }
      }
    }

  /** Random forest classifier. */
  def randomForest(features: Feature, label: Feature, outPrefix: String,
                   numTrees: Int = 20, maxDepth: Int = 5, seed: Long = 42L): EstimatorStage =
    new EstimatorStage {
      val name = "randomForest"
      val inputs = Seq(features, label)
      lazy val outputFeatures = Seq(
        new Feature(s"${outPrefix}_prediction", RealK, isResponse = false, Some(this), inputs))
      private val self = this

      def fit(df: DataFrame): TransformerStage = {
        val prepared = df.select(toVec(features.name).as("__features"),
          col(label.name).cast("double").as("__label"))
        val model = new RandomForestClassifier()
          .setNumTrees(numTrees).setMaxDepth(maxDepth).setSeed(seed)
          .setFeaturesCol("__features").setLabelCol("__label")
          .fit(prepared)
        new DataFrameStage("randomForest.fitted", inputs) {
          def outputs = Seq(s"${outPrefix}_prediction" -> RealK)
          override lazy val outputFeatures = self.outputFeatures
          def transform(df: DataFrame): DataFrame = {
            model.setFeaturesCol("__f").setPredictionCol(s"${outPrefix}_prediction")
              .setProbabilityCol("__prob").setRawPredictionCol("__raw")
              .transform(df.withColumn("__f", toVec(features.name)))
              .drop("__f", "__prob", "__raw")
          }
        }
      }
    }

  /** Linear regression. */
  def linearRegression(features: Feature, label: Feature, outPrefix: String,
                       maxIter: Int = 50, regParam: Double = 0.0): EstimatorStage =
    new EstimatorStage {
      val name = "linearRegression"
      val inputs = Seq(features, label)
      lazy val outputFeatures = Seq(
        new Feature(s"${outPrefix}_prediction", RealK, isResponse = false, Some(this), inputs))
      private val self = this
      def fit(df: DataFrame): TransformerStage = {
        val prepared = df.select(toVec(features.name).as("__features"),
          col(label.name).cast("double").as("__label"))
        val model = new LinearRegression()
          .setMaxIter(maxIter).setRegParam(regParam)
          .setFeaturesCol("__features").setLabelCol("__label")
          .fit(prepared)
        new DataFrameStage("linearRegression.fitted", inputs) {
          def outputs = Seq(s"${outPrefix}_prediction" -> RealK)
          override lazy val outputFeatures = self.outputFeatures
          def transform(df: DataFrame): DataFrame =
            model.setFeaturesCol("__f").setPredictionCol(s"${outPrefix}_prediction")
              .transform(df.withColumn("__f", toVec(features.name)))
              .drop("__f")
        }
      }
    }
}

/** Train/validation utilities (reference DataSplitter/DataBalancer,
  * tuning/DataSplitter.scala:65, DataBalancer.scala:73) and evaluator
  * aggregations (SURVEY §2.8) — all seeded/deterministic.
  */
object MLTuning {
  def split(df: DataFrame, trainFraction: Double, seed: Long = 42L): (DataFrame, DataFrame) = {
    val Array(a, b) = df.randomSplit(Array(trainFraction, 1 - trainFraction), seed)
    (a, b)
  }

  /** Down-sample the majority class of a binary label to reach the
    * target positive fraction (DataBalancer semantics). */
  def balanceBinary(df: DataFrame, labelCol: String, targetPositiveFraction: Double,
                    seed: Long = 42L): DataFrame = {
    val counts = df.groupBy(col(labelCol).cast("int").as("l")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val (pos, neg) = (counts.getOrElse(1, 0L).toDouble, counts.getOrElse(0, 0L).toDouble)
    if (pos == 0 || neg == 0) df
    else {
      val wantNeg = pos * (1 - targetPositiveFraction) / targetPositiveFraction
      val fracNeg = math.min(1.0, wantNeg / neg)
      // sampleBy matches stratum keys by value equality, so the column
      // must be double-typed to meet the Double keys (an int label would
      // silently match nothing and return an empty frame)
      df.withColumn("__bal_l", col(labelCol).cast("double"))
        .stat.sampleBy("__bal_l", Map(0.0 -> fracNeg, 1.0 -> 1.0), seed)
        .drop("__bal_l")
    }
  }

  /** Binary classification metrics over (probability, label). */
  case class BinaryMetrics(auroc: Double, aupr: Double, accuracy: Double, f1: Double)
  def binaryMetrics(df: DataFrame, probCol: String, labelCol: String): BinaryMetrics = {
    import org.apache.spark.mllib.evaluation.BinaryClassificationMetrics
    val rdd = df.select(col(probCol).cast("double"), col(labelCol).cast("double"))
      .rdd.map(r => (r.getDouble(0), r.getDouble(1)))
    val m = new BinaryClassificationMetrics(rdd)
    // confusion counts at threshold 0.5 in ONE aggregation; F1 =
    // 2TP/(2TP+FP+FN). (mllib's fMeasureByThreshold(x) takes beta, not
    // a threshold — it cannot express "F1 at 0.5" directly.)
    val pred = (col(probCol) > 0.5).cast("int")
    val lab = col(labelCol).cast("int")
    val r = df.agg(
      sum(when(pred === 1 && lab === 1, 1).otherwise(0)).as("tp"),
      sum(when(pred === 1 && lab === 0, 1).otherwise(0)).as("fp"),
      sum(when(pred === 0 && lab === 1, 1).otherwise(0)).as("fn"),
      sum(when(pred === lab, 1).otherwise(0)).as("correct"),
      count(lit(1)).as("n")).head
    val (tp, fp, fn) = (r.getLong(0).toDouble, r.getLong(1).toDouble, r.getLong(2).toDouble)
    val acc = r.getLong(3).toDouble / r.getLong(4)
    val f1 = if (2 * tp + fp + fn == 0) 0.0 else 2 * tp / (2 * tp + fp + fn)
    BinaryMetrics(m.areaUnderROC(), m.areaUnderPR(), acc, f1)
  }

  /** Regression metrics over (prediction, label). */
  case class RegressionMetrics(rmse: Double, mae: Double, r2: Double)
  def regressionMetrics(df: DataFrame, predCol: String, labelCol: String): RegressionMetrics = {
    val mean = df.agg(avg(col(labelCol))).head.getDouble(0)
    val row = df.agg(
      sqrt(avg(pow(col(predCol) - col(labelCol), 2))).as("rmse"),
      avg(abs(col(predCol) - col(labelCol))).as("mae"),
      (lit(1.0) - sum(pow(col(predCol) - col(labelCol), 2)) /
        sum(pow(col(labelCol) - lit(mean), 2))).as("r2")).head
    RegressionMetrics(row.getDouble(0), row.getDouble(1), row.getDouble(2))
  }
}
