package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("phone heuristic validates E.164-ish numbers and rejects junk") {
    val s = spark; import s.implicits._
    val rows = Seq("+1 (415) 555-0132", "415-555-0132", "12345", "call me", "+4930123456")
      .toDF("p")
      .select(col("p"), TextFunctions.isValidPhone(col("p")).as("ok"),
        TextFunctions.normalizePhone(col("p")).as("norm"))
      .collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(rows("+1 (415) 555-0132") == ((true, "+14155550132")))
    assert(rows("415-555-0132")._1)
    assert(!rows("12345")._1) // too short
    assert(!rows("call me")._1) // letters
  }

  test("human-name heuristic accepts capitalized name shapes only") {
    val s = spark; import s.implicits._
    val got = Seq("Ada Lovelace", "Grace B. Hopper", "Jean Luc Picard", "lowercase name", "X", "THE TABLE")
      .toDF("n").select(col("n"), TextFunctions.looksLikeHumanName(col("n")).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("Ada Lovelace") && got("Grace B. Hopper") && got("Jean Luc Picard"))
    assert(!got("lowercase name") && !got("X") && !got("THE TABLE"))
  }
  import TextAnalysis._

  def one[T](c: org.apache.spark.sql.Column): T = {
    val s = spark; import s.implicits._
    Seq(1).toDF("x").select(c.as("r")).collect().head.getAs[T]("r")
  }

  test("token counts") {
    assert(one[Int](tokenCount(lit("Hello  world again"))) == 3)
    assert(one[Int](bpeTokenCount(lit("don't stop, 42 times!"))) == 8)
    // don | ' | t | stop | , | 42 | times | !
  }

  test("language id picks profile with most hits, und when none") {
    assert(one[String](languageId(lit("the cat and the dog of it"))) == "en")
    assert(one[String](languageId(lit("der hund und die katze ist"))) == "de")
    assert(one[String](languageId(lit("xyzzy plugh"))) == "und")
  }

  test("scored multi-language detector gets every multilingual fixture row " +
    "right (per-language precision 100%), with confidence in (0,1]") {
    val s = spark; import s.implicits._
    val rows = graft.queries.TextQueries.langIdCorpus
      .toDF("sid", "expected", "text")
      .select(col("sid"), col("expected"),
        languageIdScored(col("text")).as("r"))
      .select(col("sid"), col("expected"),
        col("r.lang").as("pred"), col("r.confidence").as("conf"))
      .collect()
    assert(rows.length == graft.queries.TextQueries.langIdCorpus.size)
    assert(rows.length >= 72) // 63 word profiles + 9 script votes
    val wrong = rows.filter(r => r.getAs[String]("pred") != r.getAs[String]("expected"))
    assert(wrong.isEmpty, wrong.mkString("\n"))
    assert(rows.forall { r =>
      val c = r.getAs[Double]("conf"); c > 0.0 && c <= 1.0
    })
    // und fallback with zero confidence on gibberish
    val u = Seq(1).toDF("x")
      .select(languageIdScored(lit("xyzzy plugh qwerty")).as("r"))
      .select(col("r.lang"), col("r.confidence")).collect().head
    assert(u.getString(0) == "und" && u.getDouble(1) == 0.0)
  }

  test("confusable skeleton folds homoglyphs and strips invisibles") {
    // Cyrillic а/е/о/р/с + ZWSP-injected variant both skeleton to the
    // plain ASCII form — the evasion q526 detects
    val evaded = "hеllo wоrld" // cyrillic е, о
    assert(one[String](confusableSkeleton(lit(evaded))) == "hello world")
    assert(one[String](confusableSkeleton(lit("hel​lo"))) == "hello")
    // idempotent on plain ASCII
    assert(one[String](confusableSkeleton(lit("plain text 42"))) == "plain text 42")
    // fullwidth forms fold too
    assert(one[String](confusableSkeleton(lit("ａｂｃ"))) == "abc")
  }

  test("quality score bounded and monotone in stopword presence") {
    val good = one[Double](qualityScore(lit("the cat and the dog of it is in a house " * 10)))
    val bad = one[Double](qualityScore(lit("!!! ??? *** ### $$$")))
    assert(good > bad && good <= 1.0 && bad >= 0.0)
  }

  test("hash60 is deterministic, positive, 60-bit") {
    val h1 = one[Long](hash60(lit("abc")))
    val h2 = one[Long](hash60(lit("abc")))
    assert(h1 == h2 && h1 > 0 && h1 < (1L << 60))
    assert(one[Long](hash60(lit("abd"))) != h1)
  }

  test("minShingleHash invariant under shingle-preserving permutation") {
    // same multiset of 8-char shingles -> same min hash for a rotation
    val a = one[Long](minShingleHash(lit("abcdefgh"), 8))
    val b = one[Long](hash60(lit("abcdefgh")))
    assert(a == b) // single shingle == its own hash
  }

  test("removeStopWords drops list words, preserves nulls and order") {
    val s = spark; import s.implicits._
    import TextAnalysis.removeStopWords
    val df = Seq(1).toDF("i").select(
      removeStopWords(split(lit("the quick fox is a fox"), " ")).as("dflt"),
      removeStopWords(array(lit("keep"), lit(null), lit("DROP"), lit("drop")),
        stopWords = Seq("drop")).as("nulls"),
      removeStopWords(array(lit("The"), lit("the"), lit("x")),
        stopWords = Seq("the"), caseSensitive = true).as("cs"))
    val r = df.head
    // default English list removes the/is/a, keeps content words in order
    assert(r.getSeq[String](0) == Seq("quick", "fox", "fox"))
    // null elements preserved; case-insensitive match drops DROP too
    assert(r.getSeq[String](1) == Seq("keep", null))
    // case-sensitive: "The" survives, "the" is dropped
    assert(r.getSeq[String](2) == Seq("The", "x"))
  }

  test("sentences splits on terminal punctuation runs, trims, drops empties") {
    val s = spark; import s.implicits._
    val out = Seq(
      (1L, "One. Two sentences!  Third?! "),
      (2L, "no punctuation at all"),
      (3L, "..."),
      (4L, "")).toDF("id", "t")
      .select(col("id"), TextAnalysis.sentences(col("t")).as("ss"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("One", "Two sentences", "Third"))
    assert(out(2L) == Seq("no punctuation at all"))
    assert(out(3L).isEmpty && out(4L).isEmpty)
  }

  test("fleschReadingEase scores easy text above dense text, handles degenerate input") {
    val s = spark; import s.implicits._
    val out = Seq(
      (1L, "The cat sat. The dog ran. It was fun."),
      (2L, "Extraordinarily complicated methodological considerations necessitate interdisciplinary collaboration."),
      (3L, "")).toDF("id", "t")
      .select(col("id"), TextAnalysis.fleschReadingEase(col("t")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > 80, s"easy text should score high: ${out(1L)}")
    assert(out(2L) < 0, s"dense text should score very low: ${out(2L)}")
    assert(!out(3L).isNaN)  // degenerate input still deterministic
  }

  test("icuTokens segments CJK into dictionary words, drops punctuation, lowercases") {
    val s = spark; import s.implicits._
    val out = Seq(
      (1L, "我爱北京天安门"),
      (2L, "Hello, World! 123"),
      (3L, "สวัสดีครับ")).toDF("id", "t")
      .select(col("id"), TextAnalysis.icuTokens(col("t")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("我", "爱", "北京", "天安门"))
    assert(out(2L) == Seq("hello", "world", "123"))
    assert(out(3L).size == 2)  // Thai: dictionary break, no spaces needed
    // whitespace mode would have produced a single giant token
    assert(out(1L).size > 1)
  }

  test("icuSentences applies UAX#29 breaks; null-safe") {
    val s = spark; import s.implicits._
    val out = Seq(
      (1L, "One sentence. Two now! Three?"),
      (2L, null.asInstanceOf[String])).toDF("id", "t")
      .select(col("id"), TextAnalysis.icuSentences(col("t")).as("ss"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    assert(out(1L).get.size == 3)
    assert(out(2L).isEmpty)
  }

  test("graft_icu_tokens is registered for SQL users and codegens") {
    val r = spark.sql(
      "SELECT graft_icu_tokens('東京都に住んでいます') AS t, " +
      "graft_icu_sentences('A b. C d.') AS s").head
    assert(r.getSeq[String](0).nonEmpty && r.getSeq[String](0).size > 1)
    assert(r.getSeq[String](1).size == 2)
  }
}
