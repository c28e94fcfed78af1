package graft.workflow

import org.apache.spark.sql.functions._
import graft.workflow.FeatureKind._

/** Automatic feature engineering dispatcher (reference
  * Transmogrifier.scala:52-102 + dsl RichFeaturesCollection.scala:69
  * `.transmogrify()`): group raw features by kind, apply the per-kind
  * default vectorizer, and assemble everything into one vector feature.
  *
  * Kind → default stages (TransmogrifierDefaults analog):
  *  - RealK / IntegralK: mean-impute + null indicator
  *  - BinaryK:           0/1 cast + null indicator
  *  - TextK:             one-hot top-K pivot with Other + Null slots
  *  - DateK:             month-of-year unit-circle (sin, cos)
  *  - VectorK:           passed through to the assembler
  *
  * Features are processed in name order (reference sorts before
  * dispatch, Transmogrifier.scala:115) so the output slot layout is
  * deterministic. Every fit is a broadcastable aggregation; the
  * transform side is one fused projection. */
object Transmogrifier {

  case class Plan(stages: Seq[Stage], output: Feature) {
    /** All stages including the assembler, ready for Workflow planning. */
    def resultFeatures: Seq[Feature] = Seq(output)
  }

  def transmogrify(features: Seq[Feature], out: String = "features",
                   topK: Int = 3, minSupport: Long = 1): Plan = {
    val sorted = features.sortBy(_.name)
    val stages: Seq[Stage] = sorted.flatMap { f =>
      f.kind match {
        case RealK | IntegralK => Seq(Stages.imputeMean(f, s"${f.name}_f"))
        case BinaryK => Seq(new ColumnStage("binaryVec", Seq(f)) {
          def expressions = Seq(
            s"${f.name}_b" -> coalesce(col(f.name).cast("double"), lit(0.0)),
            s"${f.name}_isnull" -> when(col(f.name).isNull, 1).otherwise(0))
          override protected def outputKind(n: String): FeatureKind = RealK
        })
        case TextK => Seq(Stages.oneHotTopK(f, f.name, topK, minSupport))
        case DateK => Seq(Stages.monthUnitCircle(f, f.name))
        case VectorK => Nil // assembled directly
        case _ => Nil
      }
    }
    val numericOuts = stages.flatMap(_.outputFeatures) ++ sorted.filter(_.kind == VectorK)
    val asm = Stages.assemble(numericOuts, out)
    Plan(stages :+ asm, asm.outputFeatures.head)
  }
}
