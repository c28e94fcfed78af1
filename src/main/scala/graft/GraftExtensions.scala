package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.ColumnSql.{columnOf, eagerExpressionOf}

/** `SparkSessionExtensions` entry point: exposes graft's native and
  * composed expressions to plain-SQL users, so a `spark.sql(...)` /
  * Thrift / notebook client gets the same hot-path functions the
  * DataFrame API uses — activate with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (applied by
  * [[GraftSession]] automatically) or retrofit a live session with
  * [[GraftExtensions.install]].
  *
  * Functions: `graft_dot(a, b)` (the codegen'd Catalyst
  * [[graft.expressions.DotProduct]]), `graft_cosine(a, b)` (dot over
  * hoisted norms, accepts float or double arrays), and
  * `graft_hash60(s)` (the md5-derived 60-bit hash every deterministic
  * sampling/LSH decision in the engine keys on — exposed so external
  * audits can replay those decisions from SQL).
  *
  * This is deliberately the whole extension surface: the engine's
  * semantics are expressed through built-in operators that Catalyst
  * already optimizes, so there is no custom LogicalPlan/Strategy to
  * inject — a native scalar `Expression` on the similarity hot path is
  * the one place built-ins genuinely couldn't deliver (UDF
  * serialization / interpreted higher-order functions), and function
  * injection is its canonical delivery vehicle.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def checkArity(name: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${args.length}")

  /** (identifier, info, builder) triples in Spark's FunctionRegistry
    * shape — shared by the extension path and [[install]]. */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[graft.expressions.DotProduct].getName, "graft_dot"),
        args => {
          checkArity("graft_dot", 2, args)
          graft.expressions.DotProduct(args(0), args(1))
        }),
      (FunctionIdentifier("graft_cosine"),
        new ExpressionInfo("graft.operators.Similarity", "graft_cosine"),
        args => {
          checkArity("graft_cosine", 2, args)
          import graft.operators.Similarity.{cosine, toDouble}
          eagerExpressionOf(cosine(toDouble(columnOf(args(0))), toDouble(columnOf(args(1)))))
        }),
      (FunctionIdentifier("graft_hash60"),
        new ExpressionInfo("graft.functions.TextAnalysis", "graft_hash60"),
        args => {
          checkArity("graft_hash60", 1, args)
          eagerExpressionOf(graft.functions.TextAnalysis.hash60(columnOf(args.head)))
        }),
      (FunctionIdentifier("graft_nfc"),
        new ExpressionInfo(classOf[graft.expressions.UnicodeNormalize].getName, "graft_nfc"),
        args => {
          checkArity("graft_nfc", 1, args)
          graft.expressions.UnicodeNormalize(args.head, "NFC")
        }),
      (FunctionIdentifier("graft_lev_bounded"),
        new ExpressionInfo(classOf[graft.expressions.BoundedLevenshtein].getName,
          "graft_lev_bounded"),
        args => {
          checkArity("graft_lev_bounded", 3, args)
          graft.expressions.BoundedLevenshtein(args(0), args(1), args(2))
        }),
      (FunctionIdentifier("graft_jaro_winkler"),
        new ExpressionInfo(classOf[graft.expressions.JaroWinkler].getName,
          "graft_jaro_winkler"),
        args => {
          checkArity("graft_jaro_winkler", 2, args)
          graft.expressions.JaroWinkler(args(0), args(1))
        }),
      // ICU segmentation: 1-arg form defaults the locale to "en"
      // (locale only tunes dictionary choice; UAX#29 rules are shared)
      (FunctionIdentifier("graft_icu_tokens"),
        new ExpressionInfo(classOf[graft.expressions.IcuWordTokens].getName,
          "graft_icu_tokens"),
        args => {
          checkArity("graft_icu_tokens", 1, args)
          graft.expressions.IcuWordTokens(args.head, "en")
        }),
      (FunctionIdentifier("graft_icu_sentences"),
        new ExpressionInfo(classOf[graft.expressions.IcuSentences].getName,
          "graft_icu_sentences"),
        args => {
          checkArity("graft_icu_sentences", 1, args)
          graft.expressions.IcuSentences(args.head, "en")
        }))

  /** Register on an already-built session (the `spark.sql.extensions`
    * path only applies while a session is being constructed). */
  def install(spark: SparkSession): Unit =
    registrations.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
