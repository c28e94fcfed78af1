package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Jaro-Winkler similarity over two string columns, for
  * record-linkage scoring inside whole-stage codegen (complements the
  * built-in `levenshtein`; the reference's fuzzy text matching relies on
  * string-similarity scores, cf. reference
  * utils/.../text/TextUtils.scala name/text matching helpers).
  *
  * Standard Jaro with match window floor(max(|a|,|b|)/2)-1 and
  * half-transposition counting, then the Winkler prefix boost
  * (scaling 0.1, shared-prefix cap 4) applied only when the Jaro score
  * exceeds 0.7 — the exact variant DuckDB's
  * `jaro_winkler_similarity` implements, verified on its edge cases
  * (empty strings score 0, "ab"/"ba" scores 0 because the window is
  * degenerate), so the differential oracle can replay scores
  * bit-for-bit. `doGenCode` emits a static call (the `levenshtein`
  * pattern): no closure dispatch, fuses into the surrounding stage.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.score(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.JaroWinkler.score($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static scorer invoked from both interpreted and generated code. */
  def score(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    // match window; max(.,0) keeps single-char self-pairs matchable
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && a.charAt(i) == b.charAt(j)) {
          aMatched(i) = true; bMatched(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // half-transpositions: aligned match sequences compared pairwise
    var transpositions = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / la + m / lb + (m - transpositions / 2) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(la, lb)) &&
      a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
