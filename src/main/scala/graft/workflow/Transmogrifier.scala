package graft.workflow

import org.apache.spark.sql.functions._
import graft.workflow.FeatureKind._

/** Automatic feature engineering dispatcher (reference
  * Transmogrifier.scala:52-102 + dsl RichFeaturesCollection.scala:69
  * `.transmogrify()`): group raw features by kind, apply the per-kind
  * default vectorizer, and assemble everything into one vector feature.
  *
  * Kind → default stages (TransmogrifierDefaults analog):
  *  - RealK:             mean-impute + null indicator
  *  - IntegralK:         MODE-impute + null indicator
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
      (f.kind, f.semantic) match {
        // semantic subtype dispatch (reference branches on the 45-class
        // hierarchy; here on the collapsed tag):
        // ids carry no signal — excluded from auto-vectorization
        case (TextK, Some("id")) => Nil
        // emails pivot on the DOMAIN, not the raw address
        case (TextK, Some("email")) =>
          val dom = new ColumnStage("emailDomain", Seq(f)) {
            def expressions = Seq(s"${f.name}_domain" ->
              graft.functions.TextFunctions.emailDomain(col(f.name)))
            override protected def outputKind(n: String): FeatureKind = TextK
          }
          Seq(dom, Stages.oneHotTopK(dom.outputFeatures.head, s"${f.name}_dom", topK, minSupport))
        case (RealK, _) => Seq(Stages.imputeMean(f, s"${f.name}_f"))
        // integral kinds impute the MODE, not the mean (reference
        // IntegralVectorizer.scala:77 — a mean is not a value the
        // integral column can hold)
        case (IntegralK, _) => Seq(Stages.imputeMode(f, s"${f.name}_f"))
        case (BinaryK, _) => Seq(new ColumnStage("binaryVec", Seq(f)) {
          def expressions = Seq(
            s"${f.name}_b" -> coalesce(col(f.name).cast("double"), lit(0.0)),
            s"${f.name}_isnull" -> when(col(f.name).isNull, 1).otherwise(0))
          override protected def outputKind(n: String): FeatureKind = RealK
        })
        case (TextK, _) => Seq(Stages.oneHotTopK(f, f.name, topK, minSupport))
        case (DateK, _) => Seq(Stages.monthUnitCircle(f, f.name))
        case (VectorK, _) => Nil // assembled directly
        case _ => Nil
      }
    }
    // only numeric stage outputs are assembled — intermediate text
    // features (e.g. the email-domain column feeding its pivot) are not
    val numericOuts = stages.flatMap(_.outputFeatures)
      .filter(f => f.kind == RealK || f.kind == IntegralK || f.kind == BinaryK) ++
      sorted.filter(_.kind == VectorK)
    val asm = Stages.assemble(numericOuts, out)
    Plan(stages :+ asm, asm.outputFeatures.head)
  }
}
