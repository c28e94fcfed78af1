package graft.workflow

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** DAG planner + executor (reference OpWorkflow / FitStagesUtil):
  *
  *  1. Plan: DFS from result features over `Feature.parents`, annotate
  *     each origin stage with max distance-from-result, group stages
  *     into layers by distance desc, dedup by uid, sort each layer by
  *     first output name for determinism
  *     (FitStagesUtil.computeDAG:173-196). Dead stages — anything not an
  *     ancestor of a result — never enter the plan.
  *  2. Fit: fold over layers; estimators fit first, then ALL row-level
  *     ColumnStages of the layer are applied in one `select` (Catalyst
  *     fuses them into one codegen function); DataFrame stages apply
  *     sequentially. Optional persist cadence truncates lineage every K
  *     layers (the AQE-era analog of the reference's RDD round-trip,
  *     FitStagesUtil.applySparkTransformations:134-165).
  *  3. Score: same replay with fitted transformers only; final
  *     projection prunes to key + requested features
  *     (OpWorkflowModel.saveScores column pruning:404-414).
  */
class Workflow(val resultFeatures: Seq[Feature], persistEveryKLayers: Int = 5) {

  /** Layers of unique stages, farthest-from-result first. */
  def plan(): Seq[Seq[Stage]] = {
    val distances = resultFeatures
      .flatMap(_.parentStages().toSeq)
      .groupBy(_._1.uid)
      .map { case (_, xs) => (xs.head._1, xs.map(_._2).max) }
    distances.toSeq
      .groupBy(_._2).toSeq
      .sortBy(-_._1)
      .map(_._2.map(_._1).sortBy(_.outputFeatures.head.name).toSeq)
  }

  /** Fit every estimator layer-by-layer and return the scoring model. */
  def fit(df: DataFrame): WorkflowModel = {
    var data = df
    var persistedCount = 0
    val fittedLayers = plan().zipWithIndex.map { case (layer, i) =>
      val fitted: Seq[TransformerStage] = layer.map {
        case e: EstimatorStage => e.fit(data)
        case t: TransformerStage => t
      }
      data = Workflow.applyLayer(data, fitted)
      if ((i + 1) % persistEveryKLayers == 0) { data = data.persist(); persistedCount += 1 }
      fitted
    }
    new WorkflowModel(fittedLayers, resultFeatures)
  }
}

object Workflow {
  /** Names of the raw columns in a feature's lineage. */
  def rawAncestors(f: Feature): Set[String] =
    if (f.isRaw) Set(f.name) else f.parents.flatMap(rawAncestors).toSet

  /** Fit behind the RawFeatureFilter gate (reference
    * OpWorkflow.withRawFeatureFilter:544 applied in
    * generateRawData:235-261 + setBlocklist purge:118-168): raw columns
    * failing the fill/drift gate against the scoring frame are dropped
    * from the training data, and every result feature whose lineage
    * touches a dropped raw is purged from the plan before fitting.
    * Returns the fitted model over the surviving features plus the
    * dropped raw names. */
  def fitWithRawFeatureFilter(
      resultFeatures: Seq[Feature], train: DataFrame, score: DataFrame,
      minFill: Double, maxFillDifference: Double,
      persistEveryKLayers: Int = 5): (WorkflowModel, Seq[String]) = {
    val raws = resultFeatures.flatMap(rawAncestors).distinct
    val (cleaned, dropped) = graft.operators.DataQuality.rawFeatureFilterApply(
      train, score, raws, minFill, maxFillDifference)
    val surviving = resultFeatures.filter(
      f => rawAncestors(f).intersect(dropped.toSet).isEmpty)
    require(surviving.nonEmpty, "raw feature filter dropped every result feature")
    (new Workflow(surviving, persistEveryKLayers).fit(cleaned), dropped)
  }

  /** Fit a plan containing ONE ModelSelector with the reference's
    * cutDAG semantics (FitStagesUtil.cutDAG:302-366, applied at
    * OpWorkflow.scala:407-456): layers are split into
    * before / during / after the selector. "During" starts at the first
    * layer holding a LABEL-DEPENDENT estimator (one whose input lineage
    * touches a response feature) and is refit on every validation split
    * inside the selector — so label-derived statistics never leak
    * validation rows into model selection — while label-free layers fit
    * exactly once. Post-selector layers fit after the winner stands in. */
  def fitWithCvCut(resultFeatures: Seq[Feature], df: DataFrame,
                   persistEveryKLayers: Int = 5): WorkflowModel = {
    val layers = new Workflow(resultFeatures, persistEveryKLayers).plan()
    val selIdx = layers.indexWhere(_.exists(_.isInstanceOf[ModelSelector.ModelSelectorStage]))
    require(selIdx >= 0, "fitWithCvCut needs a ModelSelector stage in the plan")
    def touchesResponse(f: Feature): Boolean =
      f.isResponse || f.parents.exists(touchesResponse)
    def labelDependent(s: Stage): Boolean = s match {
      case _: ModelSelector.ModelSelectorStage => false // the cut point itself
      case _: EstimatorStage => s.inputs.exists(touchesResponse)
      case _ => false
    }
    val firstCut = layers.take(selIdx).indexWhere(_.exists(labelDependent))
    val cutStart = if (firstCut < 0) selIdx else firstCut
    val (sels, selPeers) = layers(selIdx)
      .partition(_.isInstanceOf[ModelSelector.ModelSelectorStage])
    require(sels.length == 1, "fitWithCvCut supports exactly one ModelSelector")
    val sel = sels.head.asInstanceOf[ModelSelector.ModelSelectorStage]
    // selector-layer peers join the refit section (they cannot depend on
    // the selector; per-split refitting them is correct and keeps the
    // final model identical — the full-frame refit decides it)
    val cutSection = layers.slice(cutStart, selIdx) ++
      (if (selPeers.nonEmpty) Seq(selPeers) else Nil)

    var data = df
    val preFitted = layers.take(cutStart).map { layer =>
      val fitted: Seq[TransformerStage] = layer.map {
        case e: EstimatorStage => e.fit(data)
        case t: TransformerStage => t
      }
      data = applyLayer(data, fitted)
      fitted
    }
    val (cutFitted, winner) = sel.fitCut(data, cutSection)
    data = cutFitted.foldLeft(data)(applyLayer)
    data = applyLayer(data, Seq(winner))
    val postFitted = layers.drop(selIdx + 1).map { layer =>
      val fitted: Seq[TransformerStage] = layer.map {
        case e: EstimatorStage => e.fit(data)
        case t: TransformerStage => t
      }
      data = applyLayer(data, fitted)
      fitted
    }
    new WorkflowModel(
      preFitted ++ cutFitted ++ Seq(Seq(winner)) ++ postFitted, resultFeatures)
  }

  /** Apply one layer: all ColumnStages in a single select (fused by
    * CollapseProject/WholeStageCodegen), DataFrame stages sequentially. */
  private[workflow] def applyLayer(df: DataFrame, layer: Seq[TransformerStage]): DataFrame = {
    val (columnStages, frameStages) = layer.partition(_.isInstanceOf[ColumnStage])
    val afterColumns =
      if (columnStages.isEmpty) df
      else {
        val exprs = columnStages.collect { case c: ColumnStage => c.expressions }.flatten
        df.select(col("*") +: exprs.map { case (n, e) => e.as(n) }: _*)
      }
    frameStages.foldLeft(afterColumns) { case (d, s: DataFrameStage) => s.transform(d) }
  }
}

/** Fitted workflow: replays transformer layers; final select prunes to
  * the requested result features (+ passthrough keys). */
class WorkflowModel(val layers: Seq[Seq[TransformerStage]], val resultFeatures: Seq[Feature]) {

  def transform(df: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val scored = layers.foldLeft(df)(Workflow.applyLayer)
    val wanted = keep ++ resultFeatures.map(_.name)
    scored.select(wanted.distinct.map(col): _*)
  }

  def score(df: DataFrame, keep: Seq[String] = Nil): DataFrame = transform(df, keep)

  /** Materialize the DAG prefix up to (and including) the layer that
    * produces `featureName` — partial-pipeline debugging (reference
    * computeDataUpTo, OpWorkflowCore.scala:300 /
    * OpWorkflowModel.scala:109). Returns every column computed so far,
    * raw and intermediate. */
  def computeDataUpTo(df: DataFrame, featureName: String): DataFrame = {
    val idx = layers.indexWhere(_.exists(_.outputFeatures.exists(_.name == featureName)))
    require(idx >= 0, s"no stage in this model produces '$featureName'")
    layers.take(idx + 1).foldLeft(df)(Workflow.applyLayer)
  }
}
