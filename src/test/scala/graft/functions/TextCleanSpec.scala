package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextAnalysis._

/** Unicode normalization + cleaning pass. The q122 oracle gate proves
  * engine agreement on the synthetic mess; this spec pins the unicode
  * semantics the ASCII-heavy corpus can't exercise: composed/decomposed
  * equivalence, NFKC compatibility folding, and null propagation — in
  * both interpreted and codegen'd evaluation. All non-ASCII input is
  * written as explicit \\u escapes so the composed/decomposed
  * distinction survives editors and diffs.
  */
class TextCleanSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "caf\u00e9"        // precomposed e-acute
  private val decomposed = "cafe\u0301"     // e + combining acute

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.as("r")).head.getString(0)

  test("NFC folds a combining accent into the precomposed form") {
    assert(one(normalizeUnicode(lit(decomposed))) === composed)
  }

  test("NFD decomposes; NFKC folds compatibility chars") {
    assert(one(normalizeUnicode(lit(composed), "NFD")) === decomposed)
    // U+FB01 LATIN SMALL LIGATURE FI -> "fi"; U+2460 CIRCLED ONE -> "1"
    assert(one(normalizeUnicode(lit("\ufb01le \u2460"), "NFKC")) === "file 1")
  }

  test("NFC-equalized dedup: composed and decomposed forms hash together") {
    val df = Seq(composed, decomposed).toDF("t")
    val n = df.select(contentHash(normalizeUnicode(col("t"))).as("h"))
      .distinct().count()
    assert(n === 1)
  }

  test("null propagates; invalid form rejected at construction") {
    val r = Seq(1).toDF("x")
      .select(normalizeUnicode(lit(null).cast("string")).as("r")).head
    assert(r.isNullAt(0))
    intercept[IllegalArgumentException] { normalizeUnicode(lit("x"), "NFX") }
  }

  test("cleanText strips tags and controls, collapses whitespace") {
    val messy = "<p id=\"x\">  ab  <br/>\n\tc  </p>"
    assert(one(cleanText(lit(messy))) === "ab c")
  }

  test("cleanText keeps interior punctuation and case") {
    assert(one(cleanText(lit("  Hello,   World! <i>42</i>  "))) ===
      "Hello, World! 42")
  }

  test("interpreted eval matches codegen (whole-column vs literal fold)") {
    // a literal input is constant-folded on the driver (interpreted
    // nullSafeEval); a column input goes through doGenCode — both must
    // produce identical bytes
    val viaCol = Seq(decomposed + " \ufb01le").toDF("t")
      .select(normalizeUnicode(col("t"), "NFKC").as("r")).head.getString(0)
    assert(viaCol === one(normalizeUnicode(lit(decomposed + " \ufb01le"), "NFKC")))
    assert(viaCol === composed + " file")
  }

  test("graft_nfc is callable from plain SQL") {
    graft.GraftExtensions.install(spark)
    val r = spark.sql(s"SELECT graft_nfc('$decomposed') AS r").head.getString(0)
    assert(r === composed)
  }
}
