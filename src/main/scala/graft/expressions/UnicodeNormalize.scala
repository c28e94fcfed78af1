package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode normalization over a string column (reference text
  * cleaning has no analog — this backs the corpus-curation cleaning
  * pass, where mixed composed/decomposed forms would defeat exact and
  * shingle dedup: "café" NFC and "café" NFD are different bytes,
  * same text). Wraps `java.text.Normalizer` as a Catalyst
  * `UnaryExpression` so it fuses into WholeStageCodegen with the rest
  * of the cleaning projection instead of paying a Scala-UDF
  * serialization boundary; the per-row cost is the unavoidable
  * UTF8String <-> java.lang.String conversion, identical in both
  * paths.
  *
  * ASCII fast path: `Normalizer.isNormalized` over the decoded string
  * is cheap for the common all-ASCII row and skips the rebuild.
  *
  * `form` is NFC/NFD/NFKC/NFKD, validated at construction. NFC matches
  * the DuckDB oracle's `nfc_normalize`, which is how q122 gates this
  * byte-for-byte.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {

  require(UnicodeNormalize.forms.contains(form),
    s"form must be one of ${UnicodeNormalize.forms.keys.mkString(",")}: $form")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override def nullSafeEval(s: Any): Any =
    UnicodeNormalize.normalize(s.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", form, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.UnicodeNormalize.normalize($c, $formRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  private[expressions] val forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC,
    "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC,
    "NFKD" -> Normalizer.Form.NFKD)

  /** Static entry shared by interpreted eval and generated code. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    val f = forms(form)
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}
