package graft.workflow

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Pipeline stages (reference OpPipelineStages.scala:218-524 trait
  * family). Two operational flavors:
  *
  *  - [[ColumnStage]]: row-level transformer whose outputs are Column
  *    expressions over its inputs. All ColumnStages in a DAG layer are
  *    applied in ONE `select` — Catalyst's CollapseProject +
  *    WholeStageCodegen fuse them into a single generated function,
  *    the modern replacement for the reference's fused `rdd.map` layer
  *    execution (FitStagesUtil.applyOpTransformations:96-120).
  *
  *  - [[DataFrameStage]]: whole-DataFrame transformer (joins, groupBy,
  *    spark.ml wrappers) applied sequentially like the reference's
  *    Spark-wrapped stages (applySparkTransformations:134-165).
  *
  * Estimators fit on the training frame and return a fitted transformer
  * whose parameters are literals — broadcast-safe by construction.
  */
trait Stage {
  def name: String
  def inputs: Seq[Feature]
  val uid: String = s"${name}_stage_${Stage.next()}"
  /** Declare this stage's output feature(s). */
  def outputFeatures: Seq[Feature]
}
object Stage {
  private val c = new java.util.concurrent.atomic.AtomicLong(0)
  private[workflow] def next(): Long = c.incrementAndGet()
}

trait TransformerStage extends Stage

/** Row-level transformer: named Column expressions over input columns. */
abstract class ColumnStage(val name: String, val inputs: Seq[Feature]) extends TransformerStage {
  /** One (outputName, expression) per output feature. */
  def expressions: Seq[(String, Column)]
  lazy val outputFeatures: Seq[Feature] = expressions.map { case (n, _) =>
    new Feature(n, outputKind(n), inputs.exists(_.isResponse), Some(this), inputs)
  }
  protected def outputKind(outputName: String): FeatureKind = FeatureKind.RealK
}

object ColumnStage {
  /** Lambda transformer (reference UnaryLambdaTransformer and friends):
    * one output from N inputs. */
  def apply(opName: String, in: Seq[Feature], out: String, kind: FeatureKind)
           (f: Seq[Column] => Column): ColumnStage =
    new ColumnStage(opName, in) {
      def expressions: Seq[(String, Column)] = Seq(out -> f(in.map(i => col(i.name))))
      override protected def outputKind(n: String): FeatureKind = kind
    }
}

/** Whole-DataFrame transformer (joins, aggregations, ml model scoring). */
abstract class DataFrameStage(val name: String, val inputs: Seq[Feature]) extends TransformerStage {
  def transform(df: DataFrame): DataFrame
  /** Names + kinds of appended columns. */
  def outputs: Seq[(String, FeatureKind)]
  lazy val outputFeatures: Seq[Feature] = outputs.map { case (n, k) =>
    new Feature(n, k, inputs.exists(_.isResponse), Some(this), inputs)
  }
}

/** Estimator: fits on data, yields a fitted transformer. The fitted
  * stage must declare the SAME output feature identities so the DAG
  * can swap it in place (reference copyWithNewStages,
  * OpWorkflow.scala:353). */
trait EstimatorStage extends Stage {
  def fit(df: DataFrame): TransformerStage
}

/** Estimator whose fit produces per-output Column expressions with the
  * fitted statistics folded in as literals. */
abstract class ColumnEstimator(val name: String, val inputs: Seq[Feature]) extends EstimatorStage {
  /** Output names (fixed before fit so the DAG is plannable). */
  def outputNames: Seq[String]
  def outputKindOf(n: String): FeatureKind = FeatureKind.RealK
  /** Compute fitted expressions from the training data. */
  def fitExpressions(df: DataFrame): Seq[(String, Column)]

  private val self = this
  lazy val outputFeatures: Seq[Feature] = outputNames.map(n =>
    new Feature(n, outputKindOf(n), inputs.exists(_.isResponse), Some(this), inputs))

  def fit(df: DataFrame): TransformerStage = {
    val exprs = fitExpressions(df)
    new ColumnStage(s"$name.fitted", inputs) {
      def expressions: Seq[(String, Column)] = exprs
      override lazy val outputFeatures: Seq[Feature] = self.outputFeatures
    }
  }
}
