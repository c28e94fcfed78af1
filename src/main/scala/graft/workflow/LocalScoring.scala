package graft.workflow

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{BindReferences, Expression}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType
import org.apache.spark.ml.linalg.Vectors

/** Spark-free local scoring (reference local/OpWorkflowModelLocal.scala:79-118,
  * without MLeap): compile a fitted [[WorkflowModel]] into a plain
  * `Map[String, Any] => Map[String, Any]` closure that scores one record
  * in-process — no cluster, no Spark jobs, microsecond latency.
  *
  * How: compilation (driver-only, runs zero Spark jobs) resolves each
  * layer's ColumnStage expressions through the analyzer against an EMPTY
  * frame, binds them to the layer's input schema, and keeps the
  * interpreted Catalyst `eval` closures; predictor stages call the
  * spark.ml model's public `predict`/`predictProbability` on a locally
  * built vector; string indexers collect their small fitted map.
  * Scoring then never touches a DataFrame. The round-trip contract
  * (spec-enforced): local scores equal cluster scores. */
object LocalScoring {

  type Rec = Map[String, Any]

  /** Compile the model against the input record schema. `keep` = input
    * fields to carry into the output next to the result features. */
  def scoreFunction(model: WorkflowModel, inputSchema: StructType,
                    spark: SparkSession, keep: Seq[String] = Nil): Rec => Rec = {
    var cur: DataFrame =
      spark.createDataFrame(java.util.Collections.emptyList[Row](), inputSchema)
    val layerFns: Seq[Rec => Rec] = model.layers.flatMap { layer =>
      val (columnStages, frameStages) = layer.partition(_.isInstanceOf[ColumnStage])
      val colFn: Seq[Rec => Rec] =
        if (columnStages.isEmpty) Nil
        else {
          val exprs = columnStages.collect { case c: ColumnStage => c.expressions }.flatten
          Seq(compileProjection(cur.schema, exprs, spark))
        }
      val frameFns = frameStages.map(compileFrameStage)
      cur = Workflow.applyLayer(cur, layer.collect { case t: TransformerStage => t })
      colFn ++ frameFns
    }
    val wanted = (keep ++ model.resultFeatures.map(_.name)).distinct
    rec => {
      val full = layerFns.foldLeft(rec)((r, f) => f(r))
      wanted.map(n => n -> full.getOrElse(n, null)).toMap
    }
  }

  /** One fused projection for all ColumnStages of a layer — the local
    * analog of the cluster path's single select. */
  private def compileProjection(schema: StructType, exprs: Seq[(String, Column)],
                                spark: SparkSession): Rec => Rec = {
    val empty = spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
    val projected = empty.select(col("*") +: exprs.map { case (n, e) => e.as(n) }: _*)
    val project = projected.queryExecution.analyzed.collectFirst { case p: Project => p }
      .getOrElse(throw new IllegalStateException("projection did not analyze to a Project"))
    val childOut = project.child.output
    val bound: Seq[Expression] =
      project.projectList.map(ne => BindReferences.bindReference(ne: Expression, childOut))
    val names = project.projectList.map(_.name)
    val inConverters = schema.fields.map(f =>
      CatalystTypeConverters.createToCatalystConverter(f.dataType))
    val outConverters = projected.schema.fields.map(f =>
      CatalystTypeConverters.createToScalaConverter(f.dataType))
    val fieldNames = schema.fieldNames
    rec => {
      val row = InternalRow.fromSeq(
        fieldNames.zip(inConverters).map { case (n, cv) => cv(rec.getOrElse(n, null)) }
          .toIndexedSeq)
      names.lazyZip(bound).lazyZip(outConverters).map { (n, e, oc) =>
        n -> oc(e.eval(row))
      }.toMap
    }
  }

  private def toDoubleArray(v: Any): Array[Double] = v match {
    case a: Array[Double] => a
    case s: Seq[_] => s.map(x => x.asInstanceOf[Number].doubleValue()).toArray
    case other => throw new IllegalArgumentException(s"not a vector: $other")
  }

  private def compileFrameStage(stage: Stage): Rec => Rec = stage match {
    case p: FittedPredictor =>
      val wantsProb = p.outputs.exists(_._1 == s"${p.outPrefix}_prob_1")
      p.model match {
        case m: org.apache.spark.ml.classification.ProbabilisticClassificationModel[org.apache.spark.ml.linalg.Vector, _] @unchecked =>
          rec => {
            val v = Vectors.dense(toDoubleArray(rec(p.featuresName)))
            val base = rec + (s"${p.outPrefix}_prediction" -> m.predict(v))
            if (wantsProb) base + (s"${p.outPrefix}_prob_1" -> m.predictProbability(v)(1))
            else base
          }
        case m: org.apache.spark.ml.PredictionModel[org.apache.spark.ml.linalg.Vector, _] @unchecked =>
          rec => rec + (s"${p.outPrefix}_prediction" ->
            m.predict(Vectors.dense(toDoubleArray(rec(p.featuresName)))))
        case other =>
          throw new UnsupportedOperationException(s"local scoring: ${other.getClass.getName}")
      }
    case s: FittedStringIndexer =>
      // the fitted (value, idx) table is O(cardinality) — the same frame
      // the cluster path broadcasts
      val mapping: Map[Any, Any] =
        s.fitted.collect().map(r => r.get(0) -> r.get(1)).toMap
      rec => rec + (s.out -> mapping.getOrElse(rec.getOrElse(s.inName, null), null))
    case other =>
      throw new UnsupportedOperationException(
        s"stage ${other.name} (${other.getClass.getName}) has no local-scoring form")
  }
}
