package graft.workflow

import org.apache.spark.ml.classification.{LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
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

  /** A score-only copy of a fitted model: same params/coefficients, no
    * training summary. spark.ml's transform captures the MODEL in its
    * scoring closure, and a summary drags the whole training object
    * graph — including a SparkSession reference — into every task:
    * closure bloat at best, and an outright serialization failure once
    * anything non-serializable (e.g. the session's ObservationManager,
    * created by the first `Dataset.observe`) hangs off the session.
    * `copy` alone does NOT shed it (Spark's model copies re-attach the
    * summary), so the copy's summary field is cleared reflectively; the
    * caller's original keeps its summary for driver-side inspection. */
  private[graft] def stripTrainingSummary(
      t: org.apache.spark.ml.Transformer): org.apache.spark.ml.Transformer =
    t match {
      case m: org.apache.spark.ml.Model[_] =>
        val c = m.copy(org.apache.spark.ml.param.ParamMap.empty)
          .asInstanceOf[org.apache.spark.ml.Transformer]
        var cls: Class[_] = c.getClass
        while (cls != null) {
          cls.getDeclaredFields.filter(_.getName.endsWith("trainingSummary"))
            .foreach { f => f.setAccessible(true); f.set(c, None) }
          cls = cls.getSuperclass
        }
        c
      case other => other
    }

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
        new FittedPredictor("logisticRegression", model, features.name, outPrefix,
          inputs, Seq(s"${outPrefix}_prediction" -> RealK, s"${outPrefix}_prob_1" -> RealK),
          Some(self.outputFeatures))
      }
    }

  /** Random forest classifier. */
  def randomForest(features: Feature, label: Feature, outPrefix: String,
                   numTrees: Int = 20, maxDepth: Int = 5, seed: Long = 42L): EstimatorStage =
    new EstimatorStage {
      val name = "randomForest"
      val inputs = Seq(features, label)
      lazy val outputFeatures = Seq(
        new Feature(s"${outPrefix}_prediction", RealK, isResponse = false, Some(this), inputs),
        new Feature(s"${outPrefix}_prob_1", RealK, isResponse = false, Some(this), inputs))
      private val self = this

      def fit(df: DataFrame): TransformerStage = {
        val prepared = df.select(toVec(features.name).as("__features"),
          col(label.name).cast("double").as("__label"))
        val model = new RandomForestClassifier()
          .setNumTrees(numTrees).setMaxDepth(maxDepth).setSeed(seed)
          .setFeaturesCol("__features").setLabelCol("__label")
          .fit(prepared)
        new FittedPredictor("randomForest", model, features.name, outPrefix,
          inputs, Seq(s"${outPrefix}_prediction" -> RealK, s"${outPrefix}_prob_1" -> RealK),
          Some(self.outputFeatures))
      }
    }

  /** Generic spark.ml Predictor wrapper (reference OpPredictorWrapper,
    * sparkwrappers/specific/OpPredictorWrapper.scala:71-92): any
    * Predictor becomes a workflow estimator stage; probabilistic
    * classifiers also surface `<prefix>_prob_1`. */
  def wrapPredictor(mlKind: String,
                    est: org.apache.spark.ml.Predictor[org.apache.spark.ml.linalg.Vector, _, _],
                    features: Feature, label: Feature, outPrefix: String,
                    withProb: Boolean): EstimatorStage =
    new EstimatorStage { self =>
      val name = mlKind
      val inputs = Seq(features, label)
      private val outsSpec =
        Seq(s"${outPrefix}_prediction" -> RealK) ++
          (if (withProb) Seq(s"${outPrefix}_prob_1" -> RealK) else Nil)
      lazy val outputFeatures = outsSpec.map { case (n, k) =>
        new Feature(n, k, isResponse = false, Some(this), inputs)
      }
      def fit(df: DataFrame): TransformerStage = {
        val prepared = df.select(toVec(features.name).as("__features"),
          col(label.name).cast("double").as("__label"))
        est.setFeaturesCol("__features")
        est.setLabelCol("__label")
        val model = est.fit(prepared).asInstanceOf[org.apache.spark.ml.Transformer]
        new FittedPredictor(mlKind, model, features.name, outPrefix,
          inputs, outsSpec, Some(self.outputFeatures))
      }
    }

  import org.apache.spark.ml.classification.{DecisionTreeClassifier, GBTClassifier, LinearSVC, NaiveBayes}
  import org.apache.spark.ml.regression.{DecisionTreeRegressor, GBTRegressor, GeneralizedLinearRegression, RandomForestRegressor}

  def gbtClassifier(features: Feature, label: Feature, outPrefix: String,
                    maxIter: Int = 10, maxDepth: Int = 5, seed: Long = 42L): EstimatorStage =
    wrapPredictor("gbtClassifier",
      new GBTClassifier().setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(seed),
      features, label, outPrefix, withProb = true)

  def decisionTreeClassifier(features: Feature, label: Feature, outPrefix: String,
                             maxDepth: Int = 5, seed: Long = 42L): EstimatorStage =
    wrapPredictor("decisionTreeClassifier",
      new DecisionTreeClassifier().setMaxDepth(maxDepth).setSeed(seed),
      features, label, outPrefix, withProb = true)

  def naiveBayes(features: Feature, label: Feature, outPrefix: String): EstimatorStage =
    wrapPredictor("naiveBayes", new NaiveBayes(), features, label, outPrefix, withProb = true)

  def linearSVC(features: Feature, label: Feature, outPrefix: String,
                maxIter: Int = 30, regParam: Double = 0.0): EstimatorStage =
    wrapPredictor("linearSVC",
      new LinearSVC().setMaxIter(maxIter).setRegParam(regParam),
      features, label, outPrefix, withProb = false)

  def gbtRegressor(features: Feature, label: Feature, outPrefix: String,
                   maxIter: Int = 10, maxDepth: Int = 5, seed: Long = 42L): EstimatorStage =
    wrapPredictor("gbtRegressor",
      new GBTRegressor().setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(seed),
      features, label, outPrefix, withProb = false)

  def randomForestRegressor(features: Feature, label: Feature, outPrefix: String,
                            numTrees: Int = 20, maxDepth: Int = 5, seed: Long = 42L): EstimatorStage =
    wrapPredictor("randomForestRegressor",
      new RandomForestRegressor().setNumTrees(numTrees).setMaxDepth(maxDepth).setSeed(seed),
      features, label, outPrefix, withProb = false)

  def decisionTreeRegressor(features: Feature, label: Feature, outPrefix: String,
                            maxDepth: Int = 5, seed: Long = 42L): EstimatorStage =
    wrapPredictor("decisionTreeRegressor",
      new DecisionTreeRegressor().setMaxDepth(maxDepth).setSeed(seed),
      features, label, outPrefix, withProb = false)

  /** Multilayer perceptron classifier (reference OpMultilayerPerceptronClassifier,
    * sparkwrappers/specific — layer sizes given explicitly: input dim,
    * hidden sizes, #classes). Probabilistic → emits prob_1. */
  def mlpClassifier(features: Feature, label: Feature, outPrefix: String,
                    layers: Seq[Int], maxIter: Int = 50, seed: Long = 42L): EstimatorStage =
    wrapPredictor("mlpClassifier",
      new org.apache.spark.ml.classification.MultilayerPerceptronClassifier()
        .setLayers(layers.toArray).setMaxIter(maxIter).setSeed(seed),
      features, label, outPrefix, withProb = true)

  def glmRegressor(features: Feature, label: Feature, outPrefix: String,
                   family: String = "gaussian", link: String = "identity",
                   maxIter: Int = 25, regParam: Double = 0.0): EstimatorStage =
    wrapPredictor("glmRegression",
      new GeneralizedLinearRegression().setFamily(family).setLink(link)
        .setMaxIter(maxIter).setRegParam(regParam),
      features, label, outPrefix, withProb = false)

  /** Monotonic score calibration (reference IsotonicRegressionCalibrator,
    * core/.../regression/IsotonicRegressionCalibrator.scala; dsl
    * RichNumericFeature.scala:398): fit isotonic regression of the label
    * on the raw score, return the fitted spark.ml model — its transform
    * maps scores to calibrated probabilities. */
  def isotonicCalibrator(df: DataFrame, scoreCol: String, labelCol: String)
      : org.apache.spark.ml.regression.IsotonicRegressionModel = {
    val prepared = df.select(
      array_to_vector(array(col(scoreCol).cast("double"))).as("__features"),
      col(labelCol).cast("double").as("__label"))
    new org.apache.spark.ml.regression.IsotonicRegression()
      .setFeaturesCol("__features").setLabelCol("__label")
      .fit(prepared)
  }

  /** Supervised bucketing thresholds (reference
    * DecisionTreeNumericBucketizer.scala + dsl autoBucketize,
    * RichNumericFeature.scala:288): fit a single-feature decision tree
    * against the label and use its continuous split thresholds as
    * bucket boundaries. */
  def decisionTreeBuckets(df: DataFrame, value: org.apache.spark.sql.Column,
                          label: org.apache.spark.sql.Column,
                          maxDepth: Int = 2, minInfoGain: Double = 0.0,
                          seed: Long = 42L): Seq[Double] = {
    val prepared = df.select(value.cast("double").as("__v"), label.cast("double").as("__label"))
      .where(col("__v").isNotNull && col("__label").isNotNull)
      .select(toVec1(col("__v")).as("__features"), col("__label"))
    val tree = new DecisionTreeClassifier()
      .setMaxDepth(maxDepth).setMinInfoGain(minInfoGain).setSeed(seed)
      .setFeaturesCol("__features").setLabelCol("__label")
      .fit(prepared)
    def thresholds(n: org.apache.spark.ml.tree.Node): Seq[Double] = n match {
      case in: org.apache.spark.ml.tree.InternalNode =>
        val t = in.split match {
          case cs: org.apache.spark.ml.tree.ContinuousSplit => Seq(cs.threshold)
          case _ => Nil
        }
        t ++ thresholds(in.leftChild) ++ thresholds(in.rightChild)
      case _ => Nil
    }
    thresholds(tree.rootNode).distinct.sorted
  }

  /** Per-key supervised bucketing splits for a numeric MAP column
    * (reference DecisionTreeNumericMapBucketizer.scala:71-99): discover
    * the key domain (bounded — the reference's unbounded distinct-key
    * reduce is the driver-OOM shape [[graft.operators.MapVectorizers
    * .discoverKeys]] guards), then fit [[decisionTreeBuckets]] per key
    * over the rows where the key is present. Key fits run concurrently
    * (`.par`, mirroring the reference's `uniqueKeys.par` at :92) — each
    * fit is itself a distributed spark.ml job, so the pool only overlaps
    * scheduling latency. Returns (key → sorted thresholds), sorted by
    * key; a key whose tree finds no informative split maps to Nil
    * (`shouldSplit = false` in the reference). */
  def decisionTreeMapBuckets(df: DataFrame, m: org.apache.spark.sql.Column,
                             label: org.apache.spark.sql.Column,
                             maxDepth: Int = 2, minInfoGain: Double = 0.0,
                             maxKeys: Int = graft.operators.MapVectorizers.DefaultMaxKeys)
      : Seq[(String, Seq[Double])] = {
    import scala.collection.parallel.CollectionConverters._
    // one materialization of the (map, label) projection feeds every
    // per-key fit — without it each of the K tree fits re-scans the
    // source (the reference persists the same way, :79)
    val src = df.select(m.as("__m"), label.as("__l"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val keys = graft.operators.MapVectorizers.discoverKeys(src, col("__m"), maxKeys)
      keys.par.map { k =>
        k -> decisionTreeBuckets(src, element_at(col("__m"), k), col("__l"),
          maxDepth, minInfoGain)
      }.toList.sortBy(_._1)
    } finally src.unpersist(blocking = false)
  }

  private def toVec1(c: org.apache.spark.sql.Column) =
    array_to_vector(array(c))

  /** Bucket index by fitted thresholds: count of thresholds < x
    * (row-local literals; null → null). Plain summed comparisons, not an
    * array filter(lambda): whole-stage codegen fuses them AND the
    * expression SQL-renders for the ModelIO manifest (lambdafunction
    * does neither) — same pattern as Vectorizers.percentile100. */
  def bucketizeByThresholds(value: org.apache.spark.sql.Column, thresholds: Seq[Double]): org.apache.spark.sql.Column = {
    val rank =
      if (thresholds.isEmpty) lit(0)
      else thresholds.map(t => when(value > t, 1).otherwise(0)).reduce(_ + _)
    when(value.isNotNull, rank).otherwise(lit(null))
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
        new FittedPredictor("linearRegression", model, features.name, outPrefix,
          inputs, Seq(s"${outPrefix}_prediction" -> RealK), Some(self.outputFeatures))
      }
    }
}

/** Fitted spark.ml predictor as a workflow stage. Named class so
  * [[ModelIO]] can persist the wrapped MLWritable model and rebuild the
  * stage on load (reference OpPredictionModel + SparkModelConverter).
  * Probabilistic classifiers additionally emit `<prefix>_prob_1` when it
  * is in `outsSpec`. */
class FittedPredictor(
    val mlKind: String,
    rawModel: org.apache.spark.ml.Transformer,
    val featuresName: String,
    val outPrefix: String,
    ins: Seq[Feature],
    outsSpec: Seq[(String, FeatureKind)],
    sharedOutputs: Option[Seq[Feature]] = None)
  extends DataFrameStage(s"$mlKind.fitted", ins) {

  /** The wrapped model with its training summary stripped — score-time
    * state must be the coefficients, nothing else (see
    * [[MLStages.stripTrainingSummary]]). */
  val model: org.apache.spark.ml.Transformer =
    MLStages.stripTrainingSummary(rawModel)

  def outputs: Seq[(String, FeatureKind)] = outsSpec
  override lazy val outputFeatures: Seq[Feature] =
    sharedOutputs.getOrElse(outsSpec.map { case (n, k) =>
      new Feature(n, k, inputs.exists(_.isResponse), Some(this), inputs)
    })
  private def wantsProb = outsSpec.exists(_._1 == s"${outPrefix}_prob_1")

  def transform(df: DataFrame): DataFrame = {
    val base = df.withColumn("__f", array_to_vector(col(featuresName)))
    model match {
      case m: org.apache.spark.ml.classification.ProbabilisticClassificationModel[_, _] @unchecked =>
        val scored = m.setFeaturesCol("__f").setPredictionCol("__pred")
          .setProbabilityCol("__prob").setRawPredictionCol("__raw")
          .transform(base)
          .withColumn(s"${outPrefix}_prediction", col("__pred"))
        val withProb =
          if (wantsProb)
            scored.withColumn(s"${outPrefix}_prob_1", vector_to_array(col("__prob")).getItem(1))
          else scored
        withProb.drop("__f", "__pred", "__prob", "__raw")
      case m: org.apache.spark.ml.PredictionModel[_, _] @unchecked =>
        m.setFeaturesCol("__f").setPredictionCol(s"${outPrefix}_prediction")
          .transform(base)
          .drop("__f")
          .drop("rawPrediction") // non-probabilistic classifiers (SVC) add it
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

  /** Multiclass metrics over (prediction, label) — reference
    * OpMultiClassificationEvaluator: accuracy plus label-frequency-
    * weighted precision/recall/F1. One groupBy over the (label, pred)
    * confusion cells (#classes^2 rows) then driver-side arithmetic. */
  case class MulticlassMetrics(accuracy: Double, weightedPrecision: Double,
                               weightedRecall: Double, weightedF1: Double)
  def multiclassMetrics(df: DataFrame, predCol: String, labelCol: String): MulticlassMetrics = {
    val cells = df.groupBy(col(labelCol).cast("double").as("l"), col(predCol).cast("double").as("p"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(2)).toMap
    val classes = (cells.keys.map(_._1) ++ cells.keys.map(_._2)).toSeq.distinct.sorted
    val total = cells.values.sum.toDouble
    val byLabel = classes.map(c => c -> cells.collect { case ((l, _), n) if l == c => n }.sum).toMap
    val acc = classes.map(c => cells.getOrElse((c, c), 0L)).sum / total
    val perClass = classes.map { c =>
      val tp = cells.getOrElse((c, c), 0L).toDouble
      val predC = cells.collect { case ((_, p), n) if p == c => n }.sum.toDouble
      val labC = byLabel(c).toDouble
      val prec = if (predC == 0) 0.0 else tp / predC
      val rec = if (labC == 0) 0.0 else tp / labC
      val f1 = if (prec + rec == 0) 0.0 else 2 * prec * rec / (prec + rec)
      (c, prec, rec, f1)
    }
    def weighted(get: ((Double, Double, Double, Double)) => Double): Double =
      perClass.map(x => get(x) * byLabel(x._1) / total).sum
    MulticlassMetrics(acc, weighted(_._2), weighted(_._3), weighted(_._4))
  }

  /** Top-K accuracy family (reference OpMultiClassificationEvaluator
    * topK metrics, OpMultiClassificationEvaluator.scala): fraction of
    * rows whose true label is among the K highest-probability classes.
    * Probabilities arrive as array<double> indexed by class; ties count
    * as hits (strictly-better classes < K). One aggregation pass for
    * every K. */
  def topKAccuracy(df: DataFrame, probsCol: String, labelCol: String,
                   ks: Seq[Int]): Map[Int, Double] = {
    val lbl = col(labelCol).cast("int")
    val pLabel = element_at(col(probsCol), lbl + 1)
    val better = size(filter(col(probsCol), p => p > pLabel))
    // rows with a null or out-of-range label are EXCLUDED (avg skips the
    // null branch) — otherwise `p > null` filters to empty and an
    // invalid-label row would silently count as a hit for every K
    val valid = lbl.isNotNull && lbl >= 0 && lbl < size(col(probsCol))
    val aggs = ks.map(k =>
      avg(when(valid, when(better < k, 1.0).otherwise(0.0))).as(s"top$k"))
    val row = df.agg(aggs.head, aggs.tail: _*).head
    ks.zipWithIndex.map { case (k, i) => k -> row.getDouble(i) }.toMap
  }

  /** Binary log-loss (reference stages/impl/evaluator/OPLogLoss.scala):
    * -mean(y ln p + (1-y) ln(1-p)), probabilities clamped to
    * [eps, 1-eps]. One aggregation. */
  def logLoss(df: DataFrame, probCol: String, labelCol: String,
              eps: Double = 1e-15): Double = {
    val p = least(greatest(col(probCol), lit(eps)), lit(1 - eps))
    val y = col(labelCol).cast("double")
    df.agg(-avg(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p))).head.getDouble(0)
  }

  /** Symmetric mean absolute percentage error (reference
    * OpForecastEvaluator.scala:59-89): mean(2|p-y| / (|p|+|y|)), terms
    * with |p|+|y| = 0 contribute 0. */
  def smape(df: DataFrame, predCol: String, labelCol: String): Double = {
    val p = col(predCol).cast("double"); val y = col(labelCol).cast("double")
    val denom = abs(p) + abs(y)
    df.agg(avg(when(denom === 0, 0.0).otherwise(lit(2.0) * abs(p - y) / denom)))
      .head.getDouble(0)
  }

  /** Split-conformal regression intervals (the distribution-free
    * calibration wrapper a production regression pipeline ships with
    * its point model): qhat is the ceil((n_cal + 1) * (1 - alpha))-th
    * smallest absolute calibration residual, and every test prediction
    * becomes [pred - qhat, pred + qhat] — finite-sample marginal
    * coverage >= 1 - alpha with no distributional assumptions.
    *
    * The rank statistic is found EXACTLY with no global sort and no
    * driver materialization: distinct-residual counts feed the
    * two-level cumulative sum ([[graft.operators.DataQuality.cumulativeByValue]]
    * — range-partitioned running sums plus broadcast offsets), and qhat
    * is the first value whose cumulative count reaches the conformal
    * rank. Everything downstream is a broadcast of the single-row qhat
    * frame over the test side — one wide shuffle on distinct residual
    * values total, independent of test size. When alpha < 1/(n_cal+1)
    * the conformal interval is unbounded and qhat is null: lo/hi come
    * back null rather than silently clamping, `covered` = 0.
    * Emits (id, pred, lo, hi, covered). */
  def conformalIntervals(cal: DataFrame, test: DataFrame, id: Column,
                         label: Column, pred: Column,
                         alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    // the scored calibration frame feeds two aggregates (residual
    // histogram + count): persist it, resolve the ONE-ROW conformal
    // quantile eagerly (bounded fit artifact, same policy as topK
    // tables/centroids), release, and widen the test side with a plan
    // literal — the test plan is then a single narrow scan
    val res = cal.select(abs(label - pred).as("v")).where(col("v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = res.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val cum = graft.operators.DataQuality.cumulativeByValue(counts, Seq("c"))
    val n = res.agg(count(lit(1)).as("n"))
    val qhatRow = cum.crossJoin(broadcast(n))
      .where(col("cum_c") >= ceil((col("n") + lit(1)) * lit(1.0 - alpha)))
      .agg(min(col("v")).as("qhat"))
      .collect() // 1 row by construction
    res.unpersist(blocking = false)
    // min over an empty candidate set is NULL (alpha too small for
    // n_cal): keep the null so the bounds come out null, not 0
    val qhat =
      if (qhatRow.head.isNullAt(0)) lit(null).cast("double")
      else lit(qhatRow.head.getDouble(0))
    test.select(id.as("id"), label.as("__y"), pred.as("__pred"))
      .select(col("id"), round(col("__pred"), 6).as("pred"),
        round(col("__pred") - qhat, 6).as("lo"),
        round(col("__pred") + qhat, 6).as("hi"),
        when(col("__y").between(col("__pred") - qhat,
          col("__pred") + qhat), 1).otherwise(0).as("covered"))
  }

  /** Per-series forecast metrics (reference OpForecastEvaluator.scala:
    * 59-89 — SMAPE + the seasonal error component): SMAPE of the
    * prediction, and MASE = mean|p-y| scaled by the seasonal-naive
    * error |y_t - y_(t-season)|, per series. The lag windows partition
    * by the series key, so many series spread across executors; one
    * series' history sorts within its partition (inherently sequential
    * per series, parallel across series — the scale-sane shape). */
  def forecastBySeries(df: DataFrame, series: org.apache.spark.sql.Column,
                       predCol: org.apache.spark.sql.Column,
                       labelCol: org.apache.spark.sql.Column,
                       tsCol: org.apache.spark.sql.Column, season: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(series).orderBy(tsCol)
    val p = predCol.cast("double"); val y = labelCol.cast("double")
    val sn = lag(y, season).over(w)
    df.select(series.as("series"), p.as("p"), y.as("y"), sn.as("sn"))
      .groupBy(col("series"))
      .agg(
        avg(when(col("p").isNotNull,
          when(abs(col("p")) + abs(col("y")) === 0, 0.0)
            .otherwise(lit(2.0) * abs(col("p") - col("y")) /
              (abs(col("p")) + abs(col("y")))))).as("smape_raw"),
        avg(when(col("p").isNotNull, abs(col("p") - col("y")))).as("mae"),
        avg(when(col("sn").isNotNull, abs(col("y") - col("sn")))).as("snaive_mae"))
      .select(col("series"), round(col("smape_raw"), 6).as("smape"),
        round(col("mae") / col("snaive_mae"), 6).as("mase"))
  }

  /** Score-bin calibration table (reference OpBinScoreEvaluator): rows
    * (bin, n, avg_score, avg_label) over equal-width probability bins —
    * a well-calibrated model has avg_score ≈ avg_label per bin. */
  def binScore(df: DataFrame, probCol: String, labelCol: String, bins: Int): DataFrame = {
    val b = least(floor(col(probCol) * bins), lit(bins - 1)).cast("int")
    df.groupBy(b.as("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg(col(probCol)), 6).as("avg_score"),
        round(avg(col(labelCol).cast("double")), 6).as("avg_label"))
  }

  /** Expected calibration error over equal-width probability bins:
    * ECE = sum_b (n_b / N) * |avg_score_b - avg_label_b| — the one-number
    * summary of the [[binScore]] reliability table. Same single
    * aggregation; bins with no rows contribute nothing (standard ECE).
    * Emits one row (n, bins, ece, max_gap). */
  def expectedCalibrationError(df: DataFrame, probCol: String,
                               labelCol: String, bins: Int): DataFrame = {
    val b = least(floor(col(probCol) * bins), lit(bins - 1)).cast("int")
    val perBin = df.groupBy(b.as("bin"))
      .agg(count(lit(1)).as("n_b"), avg(col(probCol)).as("s"),
        avg(col(labelCol).cast("double")).as("l"))
    val tot = perBin.agg(sum(col("n_b")).as("n"))
    perBin.crossJoin(broadcast(tot))
      .agg(first(col("n")).as("n"),
        round(sum(col("n_b").cast("double") / col("n").cast("double") *
          abs(col("s") - col("l"))), 6).as("ece"),
        round(max(abs(col("s") - col("l"))), 6).as("max_gap"))
      .select(col("n"), lit(bins).as("bins"), col("ece"), col("max_gap"))
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

  /** Collaborative-filtering top-K recommendations via spark.ml ALS.
    *
    * ALS is the canonical distributed factorization: each iteration
    * solves per-user then per-item least squares with only the
    * counterpart factor blocks shuffled (block-to-block routing tables,
    * not an all-to-all of ratings), so it scales by rating count, not
    * user×item. Seeded init + drop cold-start keeps output shape
    * deterministic; factor VALUES carry float-sum jitter, so the gate
    * is rows-only plus a structural spec (block-preference recovery) —
    * same policy as the other iterative fits. Emits
    * (user, rec_rank, item) — rank from the model's own score order. */
  def alsRecommend(ratings: DataFrame, user: Column, item: Column,
                   rating: Column, rank: Int, topK: Int,
                   maxIter: Int = 8, seed: Long = 7L): DataFrame = {
    val r = ratings.select(user.cast("int").as("user"),
      item.cast("int").as("item"), rating.cast("float").as("rating"))
    // ALS lineage grows per solve round; without checkpoint cuts a
    // 15-iteration fit carries a task closure deep enough to overflow
    // the deserializer's stack under suite load (observed), and at
    // cluster scale the same uncut lineage is a recovery/serialization
    // hazard. In local mode default the checkpoint dir to tmp; on a
    // cluster a driver-local path is NOT a valid reliable-checkpoint
    // target (executors can't read it back), so there the caller's
    // configured shared dir is required — ALS itself skips
    // checkpointing when none is set, which is the safe fallback.
    val sc = ratings.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty && sc.isLocal)
      sc.setCheckpointDir(
        s"${System.getProperty("java.io.tmpdir")}/graft_ckpt_${sc.applicationId}")
    val model = new org.apache.spark.ml.recommendation.ALS()
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setRank(rank).setMaxIter(maxIter).setRegParam(0.1)
      .setSeed(seed).setColdStartStrategy("drop")
      .setCheckpointInterval(2)
      .fit(r)
    model.setItemCol("item").setUserCol("user")
    model.recommendForAllUsers(topK)
      .select(col("user"), posexplode(col("recommendations")))
      .select(col("user"), (col("pos") + 1).as("rec_rank"),
        col("col.item").as("item"))
  }
}
