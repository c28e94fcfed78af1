package graft.workflow

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Workflow-model serialization (reference OpWorkflowModelWriter.scala:56
  * / OpWorkflowModelReader.scala:63): a fitted [[WorkflowModel]] becomes
  * a directory of
  *
  *   manifest/   one JSON row per stage: layer, slot, type, names, and —
  *               for fitted ColumnStages — each output's expression as
  *               SQL text (fitted statistics are literals by
  *               construction, so the SQL is self-contained)
  *   results/    JSON rows naming the result features
  *   stage_L_S/  per-stage payload: the broadcast (value, idx) frame for
  *               string indexers (parquet), or the spark.ml model dir
  *               for predictor stages (MLWritable)
  *
  * Loading rebuilds each stage: `expr(sql)` for column stages, parquet +
  * broadcast join for indexers, `<Model>.load` for predictors. The
  * round-trip contract (spec-enforced): scores from the loaded model
  * equal scores from the original bit-for-bit.
  *
  * Stages must be one of the serializable kinds; an anonymous
  * DataFrameStage raises UnsupportedOperationException at save time,
  * mirroring the reference's stage-serializability validation
  * (OpWorkflow.scala:280). */
object ModelIO {

  case class StageRow(layer: Int, slot: Int, stype: String, name: String,
                      inNames: Seq[String], outNames: Seq[String],
                      outKinds: Seq[String], sqls: Seq[String],
                      extra: Map[String, String])
  case class ResultRow(name: String, kind: String)

  import FeatureKind._
  private val kinds: Map[String, FeatureKind] = Map(
    "BinaryK" -> BinaryK, "IntegralK" -> IntegralK, "RealK" -> RealK,
    "TextK" -> TextK, "DateK" -> DateK, "TextListK" -> TextListK,
    "RealListK" -> RealListK, "TextMapK" -> TextMapK, "RealMapK" -> RealMapK,
    "VectorK" -> VectorK)
  private def kindName(k: FeatureKind): String = k.toString

  def save(model: WorkflowModel, path: String, spark: SparkSession): Unit = {
    val rows = model.layers.zipWithIndex.flatMap { case (layer, li) =>
      layer.zipWithIndex.map { case (st, si) =>
        val dir = s"$path/stage_${li}_$si"
        st match {
          case p: FittedPredictor =>
            p.model.asInstanceOf[org.apache.spark.ml.util.MLWritable]
              .write.overwrite().save(dir)
            StageRow(li, si, "predictor", p.name, Seq(p.featuresName),
              p.outputs.map(_._1), p.outputs.map(o => kindName(o._2)), Nil,
              Map("mlKind" -> p.mlKind, "outPrefix" -> p.outPrefix))
          case s: FittedStringIndexer =>
            s.fitted.write.mode("overwrite").parquet(dir)
            StageRow(li, si, "stringIndexer", s.name, Seq(s.inName),
              Seq(s.out), Seq(kindName(IntegralK)), Nil, Map.empty)
          case c: ColumnStage =>
            val kindsByName = c.outputFeatures.map(f => f.name -> kindName(f.kind)).toMap
            StageRow(li, si, "column", c.name, c.inputs.map(_.name),
              c.expressions.map(_._1),
              c.expressions.map { case (n, _) => kindsByName(n) },
              c.expressions.map { case (_, e) =>
                org.apache.spark.sql.graftshim.ColumnSql.sqlOf(e)
              }, Map.empty)
          case other =>
            throw new UnsupportedOperationException(
              s"stage ${other.name} (${other.getClass.getName}) is not serializable")
        }
      }
    }
    implicit val se: Encoder[StageRow] = Encoders.product[StageRow]
    implicit val re: Encoder[ResultRow] = Encoders.product[ResultRow]
    spark.createDataset(rows).coalesce(1).write.mode("overwrite").json(s"$path/manifest")
    spark.createDataset(model.resultFeatures.map(f => ResultRow(f.name, kindName(f.kind))))
      .coalesce(1).write.mode("overwrite").json(s"$path/results")
  }

  def load(spark: SparkSession, path: String): WorkflowModel = {
    implicit val se: Encoder[StageRow] = Encoders.product[StageRow]
    implicit val re: Encoder[ResultRow] = Encoders.product[ResultRow]
    val rows = spark.read.schema(se.schema).json(s"$path/manifest").as[StageRow].collect()
    val results = spark.read.schema(re.schema).json(s"$path/results").as[ResultRow].collect()
      .map(r => Feature.raw(r.name, kinds(r.kind))).toSeq
    val layers = rows.groupBy(_.layer).toSeq.sortBy(_._1).map { case (_, ls) =>
      ls.sortBy(_.slot).map(rebuild(spark, path, _)).toSeq
    }
    new WorkflowModel(layers, results)
  }

  private def rebuild(spark: SparkSession, path: String, r: StageRow): TransformerStage = {
    val dir = s"$path/stage_${r.layer}_${r.slot}"
    r.stype match {
      case "column" =>
        val exprs = r.outNames.zip(r.sqls).map { case (n, s) => n -> expr(s) }
        val kindByName = r.outNames.zip(r.outKinds.map(kinds)).toMap
        new ColumnStage(r.name, Nil) {
          def expressions = exprs
          override protected def outputKind(n: String): FeatureKind = kindByName(n)
        }
      case "stringIndexer" =>
        new FittedStringIndexer(spark.read.parquet(dir), r.inNames.head, r.outNames.head, Nil)
      case "predictor" =>
        val mlKind = r.extra("mlKind")
        val model: org.apache.spark.ml.Transformer = mlKind match {
          case "logisticRegression" =>
            org.apache.spark.ml.classification.LogisticRegressionModel.load(dir)
          case "randomForest" =>
            org.apache.spark.ml.classification.RandomForestClassificationModel.load(dir)
          case "linearRegression" =>
            org.apache.spark.ml.regression.LinearRegressionModel.load(dir)
          case "gbtClassifier" =>
            org.apache.spark.ml.classification.GBTClassificationModel.load(dir)
          case "decisionTreeClassifier" =>
            org.apache.spark.ml.classification.DecisionTreeClassificationModel.load(dir)
          case "naiveBayes" =>
            org.apache.spark.ml.classification.NaiveBayesModel.load(dir)
          case "linearSVC" =>
            org.apache.spark.ml.classification.LinearSVCModel.load(dir)
          case "mlpClassifier" =>
            org.apache.spark.ml.classification.MultilayerPerceptronClassificationModel.load(dir)
          case "gbtRegressor" =>
            org.apache.spark.ml.regression.GBTRegressionModel.load(dir)
          case "randomForestRegressor" =>
            org.apache.spark.ml.regression.RandomForestRegressionModel.load(dir)
          case "decisionTreeRegressor" =>
            org.apache.spark.ml.regression.DecisionTreeRegressionModel.load(dir)
          case "glmRegression" =>
            org.apache.spark.ml.regression.GeneralizedLinearRegressionModel.load(dir)
          case other => throw new IllegalArgumentException(s"unknown predictor kind $other")
        }
        new FittedPredictor(mlKind, model, r.inNames.head, r.extra("outPrefix"),
          Nil, r.outNames.zip(r.outKinds.map(kinds)))
      case other => throw new IllegalArgumentException(s"unknown stage type $other")
    }
  }
}
