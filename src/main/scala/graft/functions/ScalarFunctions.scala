package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function library (reference §2.5): math, text, date, email/URL,
  * geo — all expressed as `Column` combinators over Spark's codegen'd
  * builtins (functions._), never UDFs, so every one of them stays inside
  * WholeStageCodegen and pushes through Catalyst untouched.
  */
object MathFunctions {
  /** Null-propagating arithmetic with non-finite guards: the reference's
    * divide/multiply return None when the result is NaN/Inf
    * (MathTransformers.scala:138,185). */
  private def finite(c: Column): Column = when(!isnan(c) && !c.isin(Double.PositiveInfinity, Double.NegativeInfinity), c)
  def plus(a: Column, b: Column): Column = a + b
  def minus(a: Column, b: Column): Column = a - b
  def times(a: Column, b: Column): Column = finite(a * b)
  def divide(a: Column, b: Column): Column = finite(try_divide(a, b))
  def absOf(c: Column): Column = abs(c)
  def ceilOf(c: Column): Column = ceil(c)
  def floorOf(c: Column): Column = floor(c)
  def roundTo(c: Column, digits: Int): Column = round(c, digits)
  def expOf(c: Column): Column = exp(c)
  def sqrtOf(c: Column): Column = sqrt(c)
  def logBase(base: Double, c: Column): Column = log(base, c)
  def powerOf(c: Column, p: Double): Column = pow(c, p)
}

object TextFunctions {
  /** Simple-mode tokenizer (reference TextTokenizer.scala "simple" path):
    * lowercase, split on non-alphanumerics, drop empties and tokens
    * shorter than minLength. */
  def tokenize(c: Column, minLength: Int = 1): Column =
    filter(split(lower(c), "[^\\p{L}\\p{N}]+"),
      t => length(t) >= minLength)
  def textLength(c: Column): Column = length(c)
  def isSubstring(sub: Column, in: Column): Column = in.contains(sub)
  /** Email parsing (reference RichTextFeature.scala:589-603). */
  def emailPrefix(c: Column): Column = when(isValidEmail(c), split(c, "@").getItem(0))
  def emailDomain(c: Column): Column = when(isValidEmail(c), split(c, "@").getItem(1))
  def isValidEmail(c: Column): Column = c.rlike("^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$")
  /** URL parsing (reference RichTextFeature.scala:642-654). */
  def urlProtocol(c: Column): Column = parse_url(c, lit("PROTOCOL"))
  def urlDomain(c: Column): Column = parse_url(c, lit("HOST"))
  def isValidUrl(c: Column): Column = parse_url(c, lit("HOST")).isNotNull &&
    lower(parse_url(c, lit("PROTOCOL"))).isin("http", "https", "ftp")
  /** Jaccard similarity of two string arrays (reference JaccardSimilarity.scala). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, 1.0).otherwise(inter / uni)
  }
  /** Phone validation/normalization (reference PhoneNumberParser.scala
    * uses Google libphonenumber — not in this container, so this is the
    * documented heuristic core: E.164-ish shape after separator
    * stripping, 7-15 digits, optional leading +). */
  def normalizePhone(c: Column): Column =
    concat(when(c.startsWith("+"), "+").otherwise(""),
      regexp_replace(c, "[^0-9]", ""))
  def isValidPhone(c: Column): Column =
    normalizePhone(c).rlike("^\\+?[0-9]{7,15}$") &&
      !regexp_replace(c, "[0-9+\\-().\\s]", "").rlike(".")

  /** Human-name detection heuristic (reference HumanNameDetector.scala +
    * NameDetectUtils dictionaries — stand-in: 2-3 capitalized alphabetic
    * tokens, each at least 2 chars, with an optional middle initial). */
  def looksLikeHumanName(c: Column): Column =
    c.rlike("^[A-Z][a-z]{1,20}( [A-Z]\\.?)?( [A-Z][a-z]{1,20}){1,2}$")

  /** Named-entity candidate extraction (reference NameEntityRecognizer /
    * OpenNLPNameEntityTagger — OpenNLP model jars are not in this
    * container, so this is the documented heuristic core: maximal runs
    * of 2+ capitalized alphabetic tokens, the shape OpenNLP's
    * person/organization finders score highest). Row-local regex;
    * returns array<string> of candidate entity spans. */
  def entityCandidates(c: Column): Column =
    regexp_extract_all(c, lit("([A-Z][a-z]+(?: [A-Z][a-z]+)+)"), lit(1))

  /** Corporate/institutional suffix tokens ⇒ ORG (v2: the r10 q570
    * gold-fixture readout showed suffix-less orgs — Enterprises /
    * Institute / Dynamics / Nations-style — typed PER, so the list
    * grew from 6 to 19 standard org suffixes). */
  val orgSuffixes: String = Seq(
    "Inc", "Corp", "Ltd", "Labs", "University", "Bank",
    "Enterprises", "Institute", "Dynamics", "Nations", "Foundation",
    "Group", "Systems", "Technologies", "Solutions", "Holdings",
    "Industries", "Association", "Partners").mkString("|")

  /** Locative prepositions that type the following capitalized span as
    * LOC — and admit SINGLE capitalized tokens as candidates (the
    * 2+-token candidate floor missed Boston/London/Paris-class
    * single-token locations entirely; a preposition is the context
    * that makes the single token a span, not noise). */
  val locPrepositions: String = "in|to|at|from|near"

  /** Motion/visit verbs that also type the following capitalized span
    * as LOC (v3: the q570 readout's last PER-precision miss was
    * "visited Rio Grande" typed PER — a motion verb is locative
    * context exactly like a preposition, and OpenNLP's location model
    * scores these transitions the same way). Lowercase verb forms
    * only: a capitalized "Visited" would itself join the span. */
  val locMotionVerbs: String =
    "visited|toured|entered|crossed|reached|departed|explored"

  /** The full locative-context alternation ([[locPrepositions]] +
    * [[locMotionVerbs]]) — the ONE constant both [[typedEntities]] and
    * the generated DuckDB oracle interpolate, so the two engines
    * cannot disagree on what counts as locative context. */
  val locContext: String = s"$locPrepositions|$locMotionVerbs"

  /** Capitalized determiners/quantifiers that open a capitalized run
    * without being part of a name — a run led by one is dropped at the
    * PER fallback ("Every Morning Joe" is not a person), while the ORG
    * and LOC rules still fire first ("The First National Bank" keeps
    * its suffix ⇒ ORG). */
  val perStopLead: String = "The|A|An|Every|Each|Some|Any|Many|Most"

  /** Typed entity extraction — the OpenNLP person/organization/location
    * finders approximated with replayable rules, in precedence order:
    * a corporate/institutional suffix token ⇒ ORG; the span is preceded
    * by locative context (word-bounded [[locContext]]: a preposition
    * or a motion verb) ⇒ LOC; a span led by a [[perStopLead]] determiner is dropped;
    * otherwise 2+-token spans ⇒ PER (the proper-name shape). Candidates
    * are [[entityCandidates]]' 2+-token runs plus preposition-preceded
    * spans (which may be single tokens); duplicates are preserved and
    * loc-only spans appended, so both engines see the same multiset.
    * Returns array<struct<entity,etype>>; all regexes are RE2-safe (no
    * lookaround), so the DuckDB oracle replays them verbatim. Rule
    * quality is MEASURED by the q570 gold fixture (P/R per type in
    * COVERAGE), not just replayed. */
  def typedEntities(c: Column): Column = {
    val cands = entityCandidates(c)
    val locs = regexp_extract_all(c,
      lit(s"\\b(?:$locContext) ([A-Z][a-z]+(?: [A-Z][a-z]+)*)"), lit(1))
    val all = concat(cands, filter(locs, l => !array_contains(cands, l)))
    filter(
      transform(all, e => struct(e.as("entity"),
        when(e.rlike(s" ($orgSuffixes)$$"), "ORG")
          .when(array_contains(locs, e), "LOC")
          .when(e.rlike(s"^(?:$perStopLead) "), lit(null).cast("string"))
          .when(e.contains(" "), "PER")
          .otherwise(lit(null).cast("string")).as("etype"))),
      t => t.getField("etype").isNotNull)
  }

  /** Word n-grams (reference OpNGram.scala wraps ml.feature.NGram).
    * PERF: the slice in the lambda body re-reads `tokens` per position
    * (no CSE across lambda boundaries) — pass a materialized token
    * ARRAY COLUMN, not an inline split expression, on big frames (see
    * Dedup.shingleFrame for the pattern). */
  def ngrams(tokens: Column, n: Int): Column =
    filter(
      transform(tokens, (_, i) =>
        when(i <= size(tokens) - n,
          array_join(slice(tokens, i + 1, lit(n)), " "))),
      g => g.isNotNull)

  /** Luhn (mod-10) checksum validity of a string's digit payload — the
    * card/IMEI/account-number plausibility test a PII scrubber runs
    * before redacting digit runs (a digit run that PASSES Luhn is far
    * more likely to be a real identifier than noise). Non-digits are
    * stripped first; empty payload → false. Row-local integer fold,
    * codegen-friendly, no UDF. */
  def luhnValid(c: Column): Column = {
    val rev = reverse(filter(split(c, ""), ch => ch.rlike("^[0-9]$")))
    val digitSum = aggregate(sequence(lit(1), size(rev)), lit(0),
      (acc, j) => {
        val d = element_at(rev, j).cast("int")
        acc + when(pmod(j, lit(2)) === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      })
    // sequence(1, 0) would DESCEND, so guard the empty payload first
    when(size(rev) === 0, lit(false))
      .otherwise(pmod(digitSum, lit(10)) === 0)
  }
}

object DateFunctions {
  /** TimePeriod extraction (reference TimePeriodTransformer.scala; enum
    * TimePeriod.scala). Input: timestamp column. */
  def timePeriod(ts: Column, period: String): Column = period match {
    case "DayOfMonth"  => dayofmonth(ts)
    case "DayOfWeek"   => dayofweek(ts)   // 1 = Sunday (Spark & DuckDB ISO differ; callers align)
    case "DayOfYear"   => dayofyear(ts)
    case "HourOfDay"   => hour(ts)
    case "MonthOfYear" => month(ts)
    case "WeekOfMonth" => ceil(dayofmonth(ts) / 7.0).cast("int")
    case "WeekOfYear"  => weekofyear(ts)
    case other => throw new IllegalArgumentException(s"unknown period $other")
  }
  /** Circular (unit-circle) encoding: sin/cos of 2π·unit/periodSize
    * (reference DateToUnitCircleTransformer.scala:121). */
  def unitCircle(unit: Column, periodSize: Int): (Column, Column) = {
    val angle = unit.cast("double") * (2.0 * math.Pi / periodSize)
    (sin(angle), cos(angle))
  }
}

object GeoFunctions {
  /** Haversine distance in km between (lat1,lon1) and (lat2,lon2) degrees. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val r = 6371.0
    def rad(c: Column) = radians(c)
    val dLat = rad(lat2 - lat1); val dLon = rad(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) + cos(rad(lat1)) * cos(rad(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * r) * asin(sqrt(a))
  }
}
