package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale corpus processing: token
  * counting, quality scoring, n-gram language ID, and fingerprinting.
  * Reference analogs: TextTokenizer / TextStats in the reference's
  * SmartTextVectorizer (core/.../impl/feature/SmartTextVectorizer.scala:232)
  * and LangDetector (core/.../impl/feature/LangDetector.scala) — here
  * re-expressed as pure `Column` combinators over Spark builtins so every
  * op stays inside WholeStageCodegen and is trivially replayable in ANSI
  * SQL for the differential oracle.
  *
  * Scale note: everything below is row-local (no shuffle, no fit pass);
  * at 100 TB these run at parquet-scan speed and pipeline into whatever
  * aggregation follows.
  */
object TextAnalysis {

  /** Whitespace tokens of lowercased text — the "simple" analyzer mode
    * (the reference's own fallback, TextTokenizer.scala:125) and the
    * default for oracle-gated paths, since `\s+` replays in any SQL
    * engine. For CJK/Thai and analyzer-grade breaking use [[icuTokens]]. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** ICU `BreakIterator` word tokens (dictionary-based segmentation for
    * CJK/Thai — scripts where whitespace splitting yields one token per
    * paragraph). Native codegen'd expression; lowercased, punctuation
    * and whitespace spans dropped. */
  def icuTokens(text: Column, locale: String = "en"): Column =
    org.apache.spark.sql.graftshim.ColumnSql.columnOf(
      graft.expressions.IcuWordTokens(
        org.apache.spark.sql.graftshim.ColumnSql.expressionOf(text), locale))

  /** ICU UAX#29 sentence segmentation — handles abbreviations and
    * closing quotes the regex [[sentences]] split cannot. */
  def icuSentences(text: Column, locale: String = "en"): Column =
    org.apache.spark.sql.graftshim.ColumnSql.columnOf(
      graft.expressions.IcuSentences(
        org.apache.spark.sql.graftshim.ColumnSql.expressionOf(text), locale))

  /** Unicode-normalize (default NFC) via the native
    * [[graft.expressions.UnicodeNormalize]] expression — mixed
    * composed/decomposed forms are the silent killer of exact and
    * shingle dedup, so the cleaning pass runs this first. */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graftshim.ColumnSql.columnOf(
      graft.expressions.UnicodeNormalize(
        org.apache.spark.sql.graftshim.ColumnSql.expressionOf(text), form))

  /** Drop HTML/XML tags. Character-class pattern (`<[^>]*>`) behaves
    * identically in Java regex and RE2, so the DuckDB oracle replays it
    * verbatim. */
  def stripHtmlTags(text: Column): Column =
    regexp_replace(text, "<[^>]*>", "")

  /** Drop C0 control characters except tab/newline, plus DEL. Keeps
    * \t and \n so the whitespace-collapse step sees them; \r, \f and
    * vertical tab are stripped here, which keeps Java's `\s` and
    * RE2's `\s` (which disagree on \x0B) observationally identical
    * downstream. */
  def stripControlChars(text: Column): Column =
    regexp_replace(text, "[\\x00-\\x08\\x0B-\\x1F\\x7F]", "")

  /** Collapse whitespace runs to single spaces and trim. */
  def collapseWhitespace(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** Full cleaning pass for raw scraped text: NFC normalize, strip
    * tags, strip control chars, collapse whitespace. Order matters and
    * is part of the contract (tags may span newlines; control strip
    * precedes collapse so engine `\s` differences can't surface) —
    * the q122 oracle replays exactly this composition. Row-local,
    * fuses into one codegen'd projection at scan speed. */
  def cleanText(text: Column): Column =
    collapseWhitespace(stripControlChars(stripHtmlTags(normalizeUnicode(text))))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Flesch reading-ease score with the vowel-group syllable heuristic
    * (runs of [aeiouy] approximate syllable nuclei — the standard
    * dictionary-free stand-in): 206.835 - 1.015*(words/sentences)
    * - 84.6*(syllables/words). Sentence and word counts floor at 1 so
    * degenerate inputs score deterministically instead of dividing by
    * zero. All three counts are single regex passes, row-local,
    * RE2-identical so the oracle replays the score bit-for-bit. */
  def fleschReadingEase(text: Column): Column = {
    val words = greatest(tokenCount(text), lit(1)).cast("double")
    val sents = greatest(size(sentences(text)), lit(1)).cast("double")
    val syllables = size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))
      .cast("double")
    round(lit(206.835) - lit(1.015) * (words / sents)
      - lit(84.6) * (syllables / words), 6)
  }

  /** Rule-based sentence split: break on runs of terminal punctuation
    * ([.!?]+), trim fragments, drop empties. Terminal punctuation is
    * consumed by the split (the convention the oracle replays) — the
    * downstream uses (per-sentence dedup, quality scoring, RAG
    * chunk boundaries) need the text, not the delimiter. The
    * character-class pattern is identical under Java regex and RE2, so
    * DuckDB replays it verbatim; no lookaround (RE2 has none). */
  def sentences(text: Column): Column =
    filter(transform(split(text, "[.!?]+"), s => trim(s)),
      s => length(s) > 0)

  /** BPE-ish subword count: letter runs, digit runs, and single
    * non-space symbols each count as one token — the pre-tokenization
    * regex most BPE vocabularies (GPT-2 style) apply before merges. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\p{L}]+|[0-9]+|[^\\s\\p{L}0-9]"), lit(0)))

  /** Mean token length in characters. */
  def meanTokenLength(text: Column): Column = {
    val t = tokens(text)
    aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t)
  }

  // Small fixed stopword profiles per language for the n-gram/word
  // heuristic language ID. Deterministic by construction. Kept
  // lexicographically ordered — the argmax tiebreak is first-profile
  // wins, so profile order is part of the operator's contract.
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "af" -> Seq("hierdie", "vir", "hulle", "baie", "ons", "gesê", "maar", "wat"),
    "ar" -> Seq("في", "من", "على", "أن", "إلى", "عن", "هذا", "التي", "لا", "متى"),
    "az" -> Seq("və", "ilə", "üçün", "edir", "olan", "olub", "kimi", "həm"),
    // Belarusian keeps to its own orthography (што/гэта vs ru что/это,
    // uk що) so no Cyrillic sibling's text lands here
    "be" -> Seq("гэта", "што", "якія", "быў", "вельмі", "таксама", "ёсць", "адзін"),
    "bg" -> Seq("да", "се", "това", "които", "след", "към", "само", "може"),
    "bn" -> Seq("এবং", "না", "করে", "থেকে", "এই", "তার", "জন্য", "হয়"),
    "ca" -> Seq("els", "amb", "dels", "aquesta", "també", "són", "molt", "però"),
    "cs" -> Seq("že", "jsem", "jsou", "není", "byl", "který", "také", "podle", "jestli", "nebo"),
    "cy" -> Seq("mae", "wedi", "gyda", "hefyd", "iawn", "bod", "dyma", "eisiau"),
    "da" -> Seq("og", "er", "til", "ikke", "af", "hvad", "hvor", "være"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "für"),
    "el" -> Seq("και", "να", "το", "της", "των", "είναι", "από", "με"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "was"),
    "es" -> Seq("el", "los", "y", "que", "en", "una", "por", "con", "muy"),
    "et" -> Seq("ning", "või", "oli", "oma", "aga", "kui", "ka", "olid", "millal"),
    "eu" -> Seq("eta", "dela", "baina", "zen", "dira", "izan", "ere", "baita"),
    "fa" -> Seq("که", "را", "با", "این", "است", "های", "برای", "آن"),
    "fi" -> Seq("ja", "on", "ei", "että", "hän", "mutta", "myös", "kun"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "pour", "une"),
    "ga" -> Seq("agus", "atá", "bhfuil", "chomh", "freisin", "déanamh", "beidh", "raibh"),
    // Galician avoids the pt/es cores (de/que/en/com): tamén vs pt
    // também, despois vs es después / pt depois — own orthography only
    "gl" -> Seq("unha", "tamén", "moi", "coa", "dende", "xeito", "despois", "polo"),
    "gu" -> Seq("છે", "અને", "કરી", "માટે", "આ", "તે", "પણ", "હતી"),
    "he" -> Seq("את", "של", "על", "לא", "זה", "הוא", "עם", "אבל"),
    "hi" -> Seq("के", "है", "में", "की", "को", "से", "का", "पर"),
    "hr" -> Seq("koja", "koji", "nije", "ili", "jer", "kao", "će", "biti"),
    "hu" -> Seq("és", "hogy", "nem", "egy", "már", "csak", "meg", "vagy"),
    "hy" -> Seq("եւ", "է", "որ", "այս", "նաեւ", "մեջ", "համար", "նրա"),
    // "dari" not "di": the profiles avoid words that are top-frequency
    // in SIBLING languages (e.g. "de"/"que" are the most common words
    // of fr/es/pt alike, "di" of it/id alike, "и"/"не" of ru/bg/sr
    // alike, "ve"/"bir" of tr vs az — including them in one profile
    // would siphon other languages' text)
    "id" -> Seq("yang", "dan", "dari", "untuk", "dengan", "tidak", "ini", "itu"),
    // Icelandic ð/þ forms are unambiguous vs da/no/sv (og/er belong to da)
    "is" -> Seq("að", "það", "ekki", "við", "hún", "þetta", "einnig", "mjög"),
    "it" -> Seq("di", "che", "non", "per", "sono", "gli", "più", "della"),
    "ka" -> Seq("და", "არის", "რომ", "ეს", "მისი", "იყო", "ასევე", "უნდა"),
    "kn" -> Seq("ಮತ್ತು", "ಒಂದು", "ಈ", "ಎಂದು", "ಅವರು", "ಇದು", "ಮೇಲೆ", "ಆದರೆ"),
    "lt" -> Seq("ir", "yra", "kad", "bet", "tai", "iš", "su", "kaip"),
    "lv" -> Seq("un", "par", "arī", "kā", "tika", "bija", "gada", "viņš"),
    // Macedonian picks forms bg/sr spell differently (дека vs bg че,
    // многу vs bg много, бидејќи has no bg/sr twin)
    "mk" -> Seq("дека", "бидејќи", "исто", "како", "многу", "овој", "беше", "сите"),
    "ml" -> Seq("എന്ന", "ഒരു", "ഈ", "അത്", "ആണ്", "എന്നാൽ", "വളരെ", "ഉണ്ട്"),
    "mr" -> Seq("आहे", "आणि", "यांनी", "केली", "असून", "हे", "झाली", "तसेच"),
    // Malay keeps to ms-EXCLUSIVE forms (kerana vs id karena, sahaja vs
    // id saja, selepas vs id setelah, kelmarin vs id kemarin, awak vs
    // id kamu) so Indonesian text doesn't siphon here. Earlier drafts
    // carried boleh/daripada/kepada, which are also standard Indonesian
    // function words — heavy-formal id documents could land in ms.
    "ms" -> Seq("kerana", "ialah", "sahaja", "selepas", "amat", "kelmarin", "awak", "esok"),
    "mt" -> Seq("huwa", "iżda", "ukoll", "ħafna", "qed", "biex", "kienet", "dawn"),
    "ne" -> Seq("छ", "र", "गरेको", "भएको", "लागि", "पनि", "हुने", "गर्न"),
    "nl" -> Seq("het", "een", "van", "niet", "dat", "zijn", "ik", "ook"),
    // bokmål shares its article/copula inventory with da — the no
    // profile keeps to forms Danish spells differently (å/fra/noen/
    // mellom/blir), so Danish text never lands here
    "no" -> Seq("å", "fra", "noen", "bare", "etter", "mellom", "også", "blir"),
    "pa" -> Seq("ਦੇ", "ਹੈ", "ਵਿੱਚ", "ਦੀ", "ਨੂੰ", "ਅਤੇ", "ਇਸ", "ਲਈ"),
    "pl" -> Seq("się", "nie", "jest", "oraz", "które", "został", "przez", "tylko"),
    "pt" -> Seq("não", "uma", "isso", "ele", "são", "mais", "você", "muito"),
    "ro" -> Seq("și", "în", "este", "pentru", "care", "mai", "din", "sunt"),
    "ru" -> Seq("и", "в", "не", "на", "что", "это", "как", "его"),
    "sk" -> Seq("som", "ako", "aj", "už", "ale", "či", "tiež", "bolo"),
    "sl" -> Seq("tudi", "kot", "pa", "še", "lahko", "bil", "niso", "ker"),
    "so" -> Seq("iyo", "waa", "ayaa", "waxaa", "inuu", "soo", "kale", "sidoo"),
    "sq" -> Seq("dhe", "një", "të", "për", "është", "më", "nga", "kjo"),
    "sr" -> Seq("је", "су", "али", "био", "него", "већ", "док", "ово"),
    "sv" -> Seq("och", "att", "är", "inte", "på", "för", "jag", "ett"),
    "sw" -> Seq("kwa", "ya", "wa", "katika", "kuwa", "za", "ni", "hii"),
    "ta" -> Seq("மற்றும்", "இது", "என்று", "உள்ளது", "அந்த", "ஒரு", "என", "இந்த"),
    "te" -> Seq("మరియు", "ఈ", "ఒక", "అని", "కూడా", "లో", "ఆ", "ఉంది"),
    "tl" -> Seq("ang", "mga", "ng", "sa", "namin", "ito", "hindi", "ay"),
    "tr" -> Seq("bir", "ve", "bu", "için", "ile", "olarak", "çok", "daha", "önce", "değil"),
    "uk" -> Seq("що", "або", "та", "є", "під", "після", "цей", "їх"),
    "ur" -> Seq("کے", "ہے", "میں", "کی", "کو", "نے", "ایک", "پر"),
    "vi" -> Seq("của", "và", "là", "không", "người", "này", "được", "trong"),
    // Yiddish shares the script but not the function words of he
    // (un/iz/fun/der are Germanic; none appear in the he profile)
    "yi" -> Seq("און", "איז", "פון", "דער", "האט", "מיט", "אויך", "וואס"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  val englishStopwords: Seq[String] = stopwordProfiles.toMap.apply("en")

  /** Count of tokens found in `words`. */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit): _*)))

  /** Per-language stopword-hit scores, ordered as stopwordProfiles. */
  def languageScores(text: Column): Seq[(String, Column)] =
    stopwordProfiles.map { case (lang, ws) => lang -> stopwordHits(text, ws) }

  /** All 63 per-language stopword-hit counts in ONE token pass,
    * returned as an array in stopwordProfiles order. The per-language
    * [[languageScores]] form costs |profiles|·8 string comparisons per
    * token (isin-filter per language); this UDF does one hash lookup
    * per token, so cost is independent of the language count. Callers
    * project the array FIRST (its own projection — CollapseProject
    * won't inline a non-cheap UDF referenced 63×) and element_at the
    * per-language columns from it. Token semantics identical to
    * [[tokens]]: spaces-only trim, ROOT lowercase, \s+ split. */
  def languageScoreCounts(text: Column): Column = {
    val widx = wordLangIndex
    val n = stopwordProfiles.size
    val f = udf((s: String) => {
      if (s == null) null
      else {
        var a = 0; var b = s.length
        while (a < b && s.charAt(a) == ' ') a += 1
        while (b > a && s.charAt(b - 1) == ' ') b -= 1
        val counts = new Array[Long](n)
        s.substring(a, b).toLowerCase(java.util.Locale.ROOT)
          .split("\\s+", -1).foreach { t =>
            val j = widx.getOrElse(t, -1)
            if (j >= 0) counts(j) += 1
          }
        counts.toSeq
      }
    })
    f(text)
  }

  /** Argmax language with deterministic tiebreak: first language in
    * lexicographic profile order reaching the max score; all-zero → "und"
    * (undetermined, BCP-47). The CASE chain form mirrors 1:1 into the
    * DuckDB oracle. Shared by [[languageId]] and the oracle-gated query
    * so the tiebreak contract lives in exactly one place. */
  def languageIdFrom(scores: Seq[(String, Column)]): Column = {
    val m = greatest(scores.map(_._2): _*)
    scores.foldLeft(when(m === 0, "und")) {
      case (acc, (lang, s)) => acc.when(s === m, lang)
    }
  }

  def languageId(text: Column): Column = languageIdFrom(languageScores(text))

  /** Word-profile argmax language in ONE token pass (no script vote,
    * no confidence) — the row-local form of [[languageId]] for
    * consumers that only need the predicted code (q247/q377 confusion
    * readouts). Exactly [[languageIdFrom]]'s contract: first profile
    * in declaration order reaching the max hit count; all-zero →
    * "und". */
  def wordLanguageId(text: Column): Column = {
    val profiles = stopwordProfiles.map(_._1).toArray
    val widx = wordLangIndex
    val f = udf((s: String) => {
      if (s == null) null
      else {
        var a = 0; var b = s.length
        while (a < b && s.charAt(a) == ' ') a += 1
        while (b > a && s.charAt(b - 1) == ' ') b -= 1
        val counts = new Array[Long](profiles.length)
        s.substring(a, b).toLowerCase(java.util.Locale.ROOT)
          .split("\\s+", -1).foreach { t =>
            val j = widx.getOrElse(t, -1)
            if (j >= 0) counts(j) += 1
          }
        var best = -1; var bestC = 0L
        var k = 0
        while (k < counts.length) {
          if (counts(k) > bestC) { best = k; bestC = counts(k) }
          k += 1
        }
        if (best < 0) "und" else profiles(best)
      }
    })
    f(text)
  }

  /** Per-script character counts — the signal whitespace stopword
    * profiles cannot see (zh/ja/th write without spaces; ko attaches
    * particles). One regexp pass per script, row-local at any scale.
    * Java script classes (\p{IsHan}) mirror to RE2 names (\p{Han}) in
    * the oracle — the q487 house pattern. Ordered: the detector checks
    * kana BEFORE han (Japanese text mixes kanji + kana; Chinese has han
    * only), so sequence order is part of the contract. */
  val scriptClasses: Seq[(String, String)] = Seq(
    "kana" -> "[\\p{IsHiragana}\\p{IsKatakana}]",
    "hangul" -> "[\\p{IsHangul}]",
    "thai" -> "[\\p{IsThai}]",
    "han" -> "[\\p{IsHan}]",
    "myanmar" -> "[\\p{IsMyanmar}]",
    "khmer" -> "[\\p{IsKhmer}]",
    "lao" -> "[\\p{IsLao}]",
    "sinhala" -> "[\\p{IsSinhala}]",
    "ethiopic" -> "[\\p{IsEthiopic}]",
    "tibetan" -> "[\\p{IsTibetan}]")

  /** The same classes as `Character.UnicodeScript` values, in the SAME
    * order — the UDF char pass counts through this table; a mismatch
    * with [[scriptClasses]] would silently diverge the UDF from the
    * generated regexp oracle, so the pairing is asserted below. */
  private val scriptEnums: Seq[(String, Seq[Character.UnicodeScript])] = {
    import Character.UnicodeScript._
    Seq(
      "kana" -> Seq(HIRAGANA, KATAKANA),
      "hangul" -> Seq(HANGUL),
      "thai" -> Seq(THAI),
      "han" -> Seq(HAN),
      "myanmar" -> Seq(MYANMAR),
      "khmer" -> Seq(KHMER),
      "lao" -> Seq(LAO),
      "sinhala" -> Seq(SINHALA),
      "ethiopic" -> Seq(ETHIOPIC),
      "tibetan" -> Seq(TIBETAN))
  }
  require(scriptEnums.map(_._1) == scriptClasses.map(_._1),
    "scriptEnums out of sync with scriptClasses")

  /** UnicodeScript.ordinal -> scriptClasses index (-1 = not counted),
    * the O(1) per-char dispatch for the single-pass detector. */
  private lazy val scriptOrdinalIndex: Array[Int] = {
    val a = Array.fill(Character.UnicodeScript.values.length)(-1)
    scriptEnums.zipWithIndex.foreach { case ((_, ss), i) =>
      ss.foreach(s => a(s.ordinal) = i)
    }
    a
  }

  def scriptCounts(text: Column): Seq[(String, Column)] =
    scriptClasses.map { case (n, re) =>
      n -> (size(split(text, re)) - 1).cast("long")
    }

  // script → language, applied in scriptClasses order with a >= 2
  // character threshold (one CJK char can be a stray symbol; two is a
  // message). Scripts written by exactly one major language get a
  // script vote instead of a word profile — cheaper and more robust
  // than stopwords for unsegmented or agglutinative scripts.
  val scriptLangs: Map[String, String] =
    Map("kana" -> "ja", "hangul" -> "ko", "thai" -> "th", "han" -> "zh",
      "myanmar" -> "my", "khmer" -> "km", "lao" -> "lo",
      "sinhala" -> "si", "ethiopic" -> "am", "tibetan" -> "bo")
  val scriptThreshold = 2

  /** lang/confidence pair returned by [[languageIdScored]]. */
  case class LangScore(lang: String, confidence: Double)

  /** word → profile index over ALL profiles, with a uniqueness check:
    * the single-pass detector and the per-profile IN-list oracle are
    * equivalent only if no stopword appears in two profiles. */
  lazy val wordLangIndex: Map[String, Int] = {
    val m = scala.collection.mutable.HashMap.empty[String, Int]
    stopwordProfiles.zipWithIndex.foreach { case ((lang, ws), i) =>
      ws.foreach { w =>
        require(!m.contains(w),
          s"stopword '$w' of $lang already claimed by ${stopwordProfiles(m(w))._1}")
        m(w) = i
      }
    }
    m.toMap
  }

  /** Detected language over 72 languages (BCP-47 codes, "und" =
    * undetermined): script vote first (ja/ko/th/zh + my/km/lo/si/am/bo),
    * then the stopword argmax over the 63 word profiles. The reference
    * wraps Optimaize's 70-language n-gram detector
    * (core/.../utils/text/OptimaizeLanguageDetector.scala); that jar is
    * absent here, so this is the deterministic, oracle-replayable
    * stand-in — the DuckDB oracle replays the same decision tree as
    * per-profile IN-list scores + a CASE chain.
    *
    * Computed ROW-LOCALLY in ONE UDF pass: the Column-combinator form
    * (N isin-filters over the token array + an N-branch argmax chain)
    * costs 432 string comparisons per token and grew linearly with
    * every added language (measured 0.4 s → 2.4 s on q525 when the
    * profile table grew 19 → 54; now 63); this pass does one hash lookup per
    * token and one UnicodeScript check per char, so detector cost is
    * independent of the language count. Exact semantic replay of the
    * old plan: spaces-only trim, ROOT lowercase, \s+ split, script
    * classes in declaration order with the >= 2 threshold, first-
    * profile-wins argmax, HALF_UP 6dp confidences. */
  def languageIdScored(text: Column): Column = {
    val profiles = stopwordProfiles.map(_._1).toArray
    val widx = wordLangIndex
    val scriptOut = scriptClasses.map { case (n, _) => scriptLangs(n) }.toArray
    val ordIdx = scriptOrdinalIndex
    val nScripts = scriptClasses.size
    val thr = scriptThreshold
    val f = udf((s: String) => {
      if (s == null) null
      else {
        // one char pass: per-script counts (scriptClasses order, via
        // the ordinal->index table) + codepoint count
        val scriptHits = new Array[Long](nScripts)
        var nChars = 0L
        var i = 0
        while (i < s.length) {
          val cp = s.codePointAt(i)
          val si0 = ordIdx(Character.UnicodeScript.of(cp).ordinal)
          if (si0 >= 0) scriptHits(si0) += 1
          nChars += 1
          i += Character.charCount(cp)
        }
        def q6(x: Double): Double =
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val si = scriptHits.indexWhere(_ >= thr)
        if (si >= 0) LangScore(scriptOut(si), q6(scriptHits(si).toDouble / nChars))
        else {
          // one token pass: spaces-only trim + ROOT lowercase + \s+
          // split — byte-identical to trim/lower/split in Spark SQL
          var a = 0; var b = s.length
          while (a < b && s.charAt(a) == ' ') a += 1
          while (b > a && s.charAt(b - 1) == ' ') b -= 1
          val toks = s.substring(a, b)
            .toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
          val counts = new Array[Long](profiles.length)
          toks.foreach { t =>
            val j = widx.getOrElse(t, -1)
            if (j >= 0) counts(j) += 1
          }
          var best = -1; var bestC = 0L; var total = 0L
          var k = 0
          while (k < counts.length) {
            total += counts(k)
            if (counts(k) > bestC) { best = k; bestC = counts(k) }
            k += 1
          }
          if (total == 0L) LangScore("und", 0.0)
          else LangScore(profiles(best), q6(bestC.toDouble / total))
        }
      }
    })
    f(text)
  }

  /** Confusable → ASCII mapping for homoglyph skeletons (the
    * high-frequency rows of Unicode TR39's confusables table: Cyrillic
    * and Greek lookalikes plus fullwidth Latin). Per-codepoint, so it
    * compiles to one `translate` — identical semantics in Spark and
    * DuckDB. */
  val confusableFrom: String =
    "аеорсхуіѕјЬА" + "οαεινρυκ" + ('ａ' to 'ｚ').mkString + ('０' to '９').mkString
  val confusableTo: String =
    "aeopcxyisjbA" + "oaeivpuk" + ('a' to 'z').mkString + ('0' to '9').mkString

  /** Zero-width / invisible codepoints dedup evaders inject (ZWSP,
    * ZWNJ, ZWJ, BOM, soft hyphen) — literal chars inside a char class,
    * so the same pattern string runs under Java regex and RE2. */
  val invisibleClass: String = "[\u200B\u200C\u200D\uFEFF\u00AD]"

  /** Homoglyph skeleton: strip invisible codepoints, then fold
    * confusable lookalikes to their ASCII targets. Two row-local
    * passes; hashing the skeleton gives the dedup key that catches
    * Cyrillic-о / zero-width-space evasion of exact dedup (q22's
    * content hash sees different bytes; this sees the same text). */
  def confusableSkeleton(text: Column): Column =
    translate(regexp_replace(text, invisibleClass, ""),
      confusableFrom, confusableTo)

  /** Default stop-word list: spark.ml StopWordsRemover's English list —
    * the same default the reference wraps (OpStopWordsRemover.scala:48,
    * `StopWordsRemover.loadDefaultStopWords()`). */
  lazy val defaultStopWords: Seq[String] =
    org.apache.spark.ml.feature.StopWordsRemover.loadDefaultStopWords("english").toSeq

  /** Remove stop words from a token array (reference
    * OpStopWordsRemover.scala:48 wrapping ml.feature.StopWordsRemover):
    * case-insensitive by default; null elements are PRESERVED unless the
    * stop list names them — the transformer's documented contract.
    * Row-local single-pass filter; the stop set compiles to an InSet
    * hash lookup so it stays inside WholeStageCodegen. */
  def removeStopWords(toks: Column, stopWords: Seq[String] = defaultStopWords,
                      caseSensitive: Boolean = false): Column = {
    val words = if (caseSensitive) stopWords else stopWords.map(_.toLowerCase)
    filter(toks, t => {
      val cmp = if (caseSensitive) t else lower(t)
      t.isNull || !cmp.isin(words.map(lit): _*)
    })
  }

  /** Punctuation character ratio (over all characters). */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
      nullif(length(text), lit(0))

  /** Ratio of whitespace tokens that are (English) stopwords. */
  def stopwordRatio(text: Column, words: Seq[String] = englishStopwords): Column =
    stopwordHits(text, words).cast("double") / nullif(tokenCount(text), lit(0))

  /** Uppercase-letter ratio over letters. */
  def uppercaseRatio(text: Column): Column =
    (length(regexp_replace(text, "[^A-Z]", ""))).cast("double") /
      nullif(length(regexp_replace(text, "[^A-Za-z]", "")), lit(0))

  /** Composite quality score in [0,1]: rewards mid-range length, some
    * stopword presence (fluency proxy), and low punctuation noise —
    * the shape of the heuristics C4/Gopher-style corpus filters apply.
    * quality = 0.4*min(1, tokens/100) + 0.4*min(1, 4*stopword_ratio)
    *         + 0.2*(1 - min(1, 4*punct_ratio))                      */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text).cast("double")
    val sw = stopwordRatio(text)
    val pr = punctRatio(text)
    lit(0.4) * least(lit(1.0), toks / 100.0) +
      lit(0.4) * least(lit(1.0), sw * 4.0) +
      lit(0.2) * (lit(1.0) - least(lit(1.0), pr * 4.0))
  }

  /** 60-bit deterministic hash of a string column: first 15 hex chars of
    * md5 as a signed long. 60 bits keeps it positive and exactly
    * representable on both Spark and DuckDB ('0x'||hex cast). The md5
    * basis makes the differential oracle replayable — both engines ship
    * bit-identical md5. */
  def hash60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("bigint")

  /** Seeded variant for minhash families: h_i(x) = hash60(i:x). */
  def hash60(c: Column, seed: Int): Column = hash60(concat_ws(":", lit(seed), c))

  /** Rolling-hash document fingerprint: min over character k-gram
    * shingle hashes (= 1-hash MinHash; collision-resistant content id
    * robust to document reordering at the shingle scale). */
  def minShingleHash(text: Column, k: Int = 8): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => hash60(text.substr(i, lit(k)))))

  /** Whole-document content hash (exact-dedup key). */
  def contentHash(text: Column): Column = md5(text)
}
