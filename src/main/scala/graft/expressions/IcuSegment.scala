package graft.expressions

import com.ibm.icu.text.BreakIterator
import com.ibm.icu.util.ULocale

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ICU `BreakIterator` segmentation as native Catalyst expressions —
  * the Lucene-analyzer-grade upgrade over the regex "simple" mode
  * (which the reference itself falls back to,
  * core/.../utils/text/TextTokenizer.scala:125, and which stays the
  * default for the SQL-replayable oracles). ICU ships dictionary-based
  * word segmentation for CJK/Thai/Khmer — scripts where `\s+` yields
  * one giant token — and UAX#29 sentence breaking that handles
  * abbreviations and quoted punctuation the `[.!?]+` split cannot.
  *
  * icu4j is already on the Spark classpath (no new dependency).
  * BreakIterators are mutable and not thread-safe: each executor
  * thread clones from a per-locale prototype via a ThreadLocal cache,
  * so the hot loop never re-parses break rules. Both expressions
  * codegen into a static call, keeping the projection inside
  * WholeStageCodegen.
  */
case class IcuWordTokens(child: Expression, locale: String)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_icu_tokens"

  override def nullSafeEval(s: Any): Any =
    IcuSegment.wordTokens(s.asInstanceOf[UTF8String], locale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loc = ctx.addReferenceObj("locale", locale, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.IcuSegment.wordTokens($c, $loc)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class IcuSentences(child: Expression, locale: String)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_icu_sentences"

  override def nullSafeEval(s: Any): Any =
    IcuSegment.sentences(s.asInstanceOf[UTF8String], locale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loc = ctx.addReferenceObj("locale", locale, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.IcuSegment.sentences($c, $loc)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IcuSegment {

  // Prototype iterators are expensive to build (rule compile +
  // dictionary load); clone()-per-thread is ICU's documented pattern.
  private val wordProto = new java.util.concurrent.ConcurrentHashMap[String, BreakIterator]()
  private val sentProto = new java.util.concurrent.ConcurrentHashMap[String, BreakIterator]()

  private val wordIters: ThreadLocal[java.util.HashMap[String, BreakIterator]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, BreakIterator]())
  private val sentIters: ThreadLocal[java.util.HashMap[String, BreakIterator]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, BreakIterator]())

  private def iter(locale: String, word: Boolean): BreakIterator = {
    val local = if (word) wordIters.get() else sentIters.get()
    var it = local.get(locale)
    if (it == null) {
      val protos = if (word) wordProto else sentProto
      val proto = protos.computeIfAbsent(locale, l => {
        val ul = ULocale.forLanguageTag(l)
        if (word) BreakIterator.getWordInstance(ul)
        else BreakIterator.getSentenceInstance(ul)
      })
      it = proto.clone().asInstanceOf[BreakIterator]
      local.put(locale, it)
    }
    it
  }

  /** Lowercased word tokens: spans whose rule status is a real word
    * (letters, numbers, kana/ideographs) — whitespace and punctuation
    * spans (WORD_NONE) are dropped, matching what an analyzer emits. */
  def wordTokens(s: UTF8String, locale: String): ArrayData = {
    val text = s.toString
    val bi = iter(locale, word = true)
    bi.setText(text)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var start = bi.first()
    var end = bi.next()
    while (end != BreakIterator.DONE) {
      if (bi.getRuleStatus != BreakIterator.WORD_NONE) {
        out += UTF8String.fromString(
          text.substring(start, end).toLowerCase(java.util.Locale.ROOT))
      }
      start = end
      end = bi.next()
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Trimmed, non-empty sentences per UAX#29 sentence breaking. */
  def sentences(s: UTF8String, locale: String): ArrayData = {
    val text = s.toString
    val bi = iter(locale, word = false)
    bi.setText(text)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var start = bi.first()
    var end = bi.next()
    while (end != BreakIterator.DONE) {
      val t = text.substring(start, end).trim
      if (t.nonEmpty) out += UTF8String.fromString(t)
      start = end
      end = bi.next()
    }
    new GenericArrayData(out.toArray[Any])
  }
}
