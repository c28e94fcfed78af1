package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-country phone validation rules — the fidelity step from the
  * E.164-shape heuristic ([[TextFunctions.isValidPhone]]) toward the
  * reference's libphonenumber-backed parser
  * (core/.../impl/feature/PhoneNumberParser.scala — the jar is absent
  * in this container, so the top ~20 calling codes get explicit
  * length/prefix tables instead of the full metadata set).
  *
  * Reference semantics reproduced here (PhoneNumberParser.scala:260-325):
  *   - `cleanNumber`: trim, strip every char outside [+0-9]
  *   - raw input shorter than 2 chars → None (null, not false)
  *   - a leading "+" switches to international parsing (the "ZZ"
  *     convention): calling code by longest-prefix match, then the
  *     country's national-number rules
  *   - otherwise the DefaultRegion parameter's rules apply
  *     (ParsePhoneDefaultCountry / IsValidPhoneDefaultCountry, default
  *     "US"), with the country's trunk '0' stripped first
  *   - parse returns "+<cc><national>" when valid, null otherwise;
  *     validate returns parse's success as a boolean
  *
  * Documented OUT OF SCOPE vs libphonenumber (q569 gates what IS in
  * scope): numbers outside the 22 tabled calling codes are invalid
  * rather than ZZ-parsed; variable-length metadata beyond min/max
  * (e.g. per-area-code patterns) is not modeled; the non-strict
  * `truncateTooLongNumber` retry and carrier-code/extension handling
  * are not implemented. RU's '8' trunk prefix IS stripped (r11), with
  * libphonenumber's validate-after-strip guard: only at plan
  * length + 1, so a bare 10-digit 8800 toll-free keeps its 8. (The
  * country-NAME Jaccard fallback of `validCountryCode` IS implemented —
  * [[resolveRegion]], gated by q574 — and now uses the reference's
  * raw-string leading-'+' test for the ZZ branch.)
  *
  * Everything below is row-local and codegen-friendly (anchored RE2-safe
  * regex + a when-chain), and [[oracleE164Sql]] renders the IDENTICAL
  * decision tree as DuckDB SQL from the same rules table, so the gate
  * cannot drift from the implementation.
  */
object PhoneRules {

  /** One country's national-number rules: calling code, length bounds,
    * whether a national-format leading trunk '0' is stripped, and an
    * optional anchored pattern (RE2-safe, no lookaround) the national
    * number must match. `trunkEight` is RU's national prefix: '8' is
    * stripped only when the cleaned number is one digit LONGER than
    * the plan length (libphonenumber's validate-after-strip semantics
    * specialized to RU's fixed-length plan — a bare 10-digit
    * 8-800-toll-free number must NOT lose its leading 8). */
  final case class Rule(region: String, cc: String, minLen: Int, maxLen: Int,
                        trunkZero: Boolean, pattern: Option[String],
                        trunkEight: Boolean = false)

  /** Top calling codes by traffic; US covers the whole NANP (+1). The
    * NANP pattern encodes area code and exchange both in [2-9]. */
  val rules: Seq[Rule] = Seq(
    Rule("US", "1", 10, 10, trunkZero = false,
      Some("^[2-9][0-9]{2}[2-9][0-9]{6}$")),
    Rule("RU", "7", 10, 10, trunkZero = false, None, trunkEight = true),
    Rule("ZA", "27", 9, 9, trunkZero = true, None),
    Rule("NL", "31", 9, 9, trunkZero = true, None),
    Rule("FR", "33", 9, 9, trunkZero = true, None),
    Rule("ES", "34", 9, 9, trunkZero = false, None),
    Rule("IT", "39", 8, 11, trunkZero = false, None),
    Rule("CH", "41", 9, 9, trunkZero = true, None),
    Rule("GB", "44", 9, 10, trunkZero = true, None),
    Rule("SE", "46", 7, 9, trunkZero = true, None),
    Rule("PL", "48", 9, 9, trunkZero = false, None),
    Rule("DE", "49", 6, 11, trunkZero = true, None),
    Rule("MX", "52", 10, 10, trunkZero = false, None),
    Rule("BR", "55", 10, 11, trunkZero = false, None),
    Rule("AU", "61", 9, 9, trunkZero = true, None),
    Rule("SG", "65", 8, 8, trunkZero = false, None),
    Rule("JP", "81", 9, 10, trunkZero = true, None),
    Rule("KR", "82", 8, 10, trunkZero = true, None),
    Rule("CN", "86", 10, 11, trunkZero = true, None),
    Rule("TR", "90", 10, 10, trunkZero = true, None),
    Rule("IN", "91", 10, 10, trunkZero = true, Some("^[6-9][0-9]{9}$")),
    Rule("NG", "234", 8, 10, trunkZero = true, None))

  private val byRegion: Map[String, Rule] = rules.map(r => r.region -> r).toMap

  /** Longest-calling-code-first order for the international prefix
    * match ("+2347..." must bind to NG's 234, never a shorter code). */
  private val intlOrder: Seq[Rule] = rules.sortBy(r => (-r.cc.length, r.cc))

  /** Reference `cleanNumber`: trim, keep only '+' and digits. */
  def cleanPhone(c: Column): Column = regexp_replace(trim(c), "[^+0-9]", "")

  private def validNational(nat: Column, r: Rule): Column = {
    val lenOk = length(nat).between(r.minLen, r.maxLen)
    r.pattern.map(p => lenOk && nat.rlike(p)).getOrElse(lenOk)
  }

  /** National digits after the country's trunk-prefix rule: '0'
    * stripped unconditionally (national-format convention), RU's '8'
    * stripped only at plan length + 1 (see [[Rule.trunkEight]]). The
    * ONE definition both the Column path and [[sqlNatDigits]] mirror. */
  private def natDigitsOf(cleaned: Column, r: Rule): Column =
    if (r.trunkZero)
      when(cleaned.startsWith("0"),
        cleaned.substr(lit(2), length(cleaned))).otherwise(cleaned)
    else if (r.trunkEight)
      when(cleaned.startsWith("8") && length(cleaned) === r.maxLen + 1,
        cleaned.substr(lit(2), length(cleaned))).otherwise(cleaned)
    else cleaned

  /** [[natDigitsOf]] rendered as a DuckDB expression over `cleaned`. */
  private def sqlNatDigits(cleaned: String, r: Rule): String =
    if (r.trunkZero)
      s"CASE WHEN starts_with($cleaned, '0') THEN substr($cleaned, 2) ELSE $cleaned END"
    else if (r.trunkEight)
      s"CASE WHEN starts_with($cleaned, '8') AND length($cleaned) = ${r.maxLen + 1} " +
        s"THEN substr($cleaned, 2) ELSE $cleaned END"
    else cleaned

  /** E.164 parse under the per-country tables: "+<cc><national>" when
    * valid, null otherwise. Decision tree (replayed 1:1 by
    * [[oracleE164Sql]]): raw < 2 chars → null; cleaned not ^\+?[0-9]+$
    * → null; leading '+' → longest-cc-prefix international match;
    * otherwise `defaultRegion`'s rules with its trunk '0' stripped. */
  def parsePhoneCountry(c: Column, defaultRegion: String = "US"): Column = {
    val r = byRegion.getOrElse(defaultRegion.toUpperCase,
      throw new IllegalArgumentException(s"no rules for region $defaultRegion"))
    val cleaned = cleanPhone(c)
    val digitsI = cleaned.substr(lit(2), length(cleaned)) // after '+'
    val intlCase = intlOrder.map { ru =>
      val nat = digitsI.substr(lit(ru.cc.length + 1), length(digitsI))
      (digitsI.startsWith(ru.cc) && validNational(nat, ru),
        concat(lit("+" + ru.cc), nat))
    }.foldRight(lit(null).cast("string")) {
      case ((cond, v), acc) => when(cond, v).otherwise(acc)
    }
    val natDigits = natDigitsOf(cleaned, r)
    val nationalCase = when(validNational(natDigits, r),
      concat(lit("+" + r.cc), natDigits)).otherwise(lit(null).cast("string"))
    when(length(c) < 2, lit(null).cast("string"))
      .when(!cleaned.rlike("^\\+?[0-9]+$"), lit(null).cast("string"))
      .when(cleaned.startsWith("+"), intlCase)
      .otherwise(nationalCase)
  }

  /** Validity under the same tables: null for <2-char inputs AND for
    * candidates whose cleaned form has no digit at all (the reference's
    * PhoneNumberParser.validate yields None whenever phoneUtil.parse
    * THROWS — NOT_A_NUMBER — and Some(false) only for
    * parseable-but-invalid numbers); otherwise whether
    * [[parsePhoneCountry]] succeeds. */
  def isValidPhoneCountry(c: Column, defaultRegion: String = "US"): Column =
    when(length(c) < 2, lit(null).cast("boolean"))
      .when(!cleanPhone(c).rlike("[0-9]"), lit(null).cast("boolean"))
      .otherwise(parsePhoneCountry(c, defaultRegion).isNotNull)

  /** English country names per region (comma-separated variants, the
    * reference's DefaultCountryCodes value shape) for the Jaccard
    * fallback of [[resolveRegion]]. */
  val countryNames: Seq[(String, String)] = Seq(
    "US" -> "UNITED STATES OF AMERICA, USA",
    "RU" -> "RUSSIA, RUSSIAN FEDERATION",
    "ZA" -> "SOUTH AFRICA",
    "NL" -> "NETHERLANDS, HOLLAND",
    "FR" -> "FRANCE",
    "ES" -> "SPAIN",
    "IT" -> "ITALY",
    "CH" -> "SWITZERLAND",
    "GB" -> "UNITED KINGDOM, GREAT BRITAIN",
    "SE" -> "SWEDEN",
    "PL" -> "POLAND",
    "DE" -> "GERMANY",
    "MX" -> "MEXICO",
    "BR" -> "BRAZIL",
    "AU" -> "AUSTRALIA",
    "SG" -> "SINGAPORE",
    "JP" -> "JAPAN",
    "KR" -> "SOUTH KOREA, KOREA",
    "CN" -> "CHINA",
    "TR" -> "TURKEY",
    "IN" -> "INDIA",
    "NG" -> "NIGERIA")

  /** (region, one name variant) pairs in table order — the fold order
    * of the reference's `regionCodes.zip(countryNames).flatMap(split
    * on comma)` with maxBy's FIRST-maximum tie rule. */
  private val nameVariants: Seq[(String, String)] =
    countryNames.flatMap { case (r, ns) => ns.split(",").map(r -> _.trim) }

  /** Distinct character 2-grams of an uppercased trimmed string column
    * (the reference's `rc.trim.sliding(2).toSet`). */
  private def bigramsOf(c: Column): Column = {
    val u = upper(trim(c))
    // length <= 1: sliding(2) yields the string itself as its one
    // window (and [] for "", where [u] = [""] scores 0 against every
    // name — same resolution). Guarded because sequence(1, 0) would
    // otherwise run DOWNWARD.
    when(length(u) <= 1, array(u)).otherwise(
      array_distinct(transform(sequence(lit(1), length(u) - 1),
        i => u.substr(i, lit(2)))))
  }

  /** The reference's `validCountryCode`
    * (PhoneNumberParser.scala:285-305): a phone with a leading '+' is
    * international ("ZZ", google's unknown-region convention); a
    * region input that IS a known code passes through; any other
    * non-null region resolves to the country NAME with the highest
    * character-2-gram Jaccard similarity (first-maximum tie rule, the
    * table order above); a null region falls back to `defaultRegion`.
    * Row-local Column logic over literal name bigram sets. */
  def resolveRegion(phone: Column, regionText: Column,
                    defaultRegion: String = "US"): Column = {
    require(byRegion.contains(defaultRegion.toUpperCase))
    val rcU = upper(trim(regionText))
    val rb = bigramsOf(regionText)
    val scored = nameVariants.map { case (r, nm) =>
      val nb = nm.sliding(2).toSeq.distinct
      val nbLit = array(nb.map(lit): _*)
      val j = size(array_intersect(rb, nbLit)).cast("double") /
        size(array_union(rb, nbLit)).cast("double")
      (r, j)
    }
    // first-maximum WITHOUT a when-fold: a fold that references its
    // accumulator in both the condition and the otherwise doubles the
    // expression tree per entry (2^25 nodes here — the first attempt
    // hung Catalyst in plan construction). array_max over (j, -index)
    // structs is linear and implements the same keep-earlier tie rule:
    // max j wins, and among ties the max of -index is the SMALLEST
    // index, i.e. the earliest table entry.
    val best = array_max(array(scored.zipWithIndex.map { case ((_, j), i) =>
      struct(j.as("j"), lit(-i).as("ni")) }: _*))
    val regionArr = array(nameVariants.map(v => lit(v._1)): _*)
    val bestRegion = element_at(regionArr, (-best.getField("ni")) + 1)
    // RAW startsWith("+"), trim-free: the reference's
    // isInternationalFormat checks the ORIGINAL string, so "(+44) ..."
    // and " +44 ..." take the region/Jaccard path here (not ZZ) and
    // only a literal leading '+' switches to ZZ. The parse itself still
    // handles an embedded '+' (see parsePhoneDispatch).
    when(phone.startsWith("+"), "ZZ")
      .when(regionText.isNull, defaultRegion.toUpperCase)
      .when(rcU.isin(rules.map(_.region): _*), rcU)
      .otherwise(bestRegion)
  }

  /** National-format parse under ONE region's rules (the body
    * [[parsePhoneCountry]] uses for its default region). */
  private def nationalE164(cleaned: Column, r: Rule): Column = {
    val natDigits = natDigitsOf(cleaned, r)
    when(validNational(natDigits, r),
      concat(lit("+" + r.cc), natDigits)).otherwise(lit(null).cast("string"))
  }

  private def intlE164(cleaned: Column): Column = {
    val digitsI = cleaned.substr(lit(2), length(cleaned))
    intlOrder.map { ru =>
      val nat = digitsI.substr(lit(ru.cc.length + 1), length(digitsI))
      (digitsI.startsWith(ru.cc) && validNational(nat, ru),
        concat(lit("+" + ru.cc), nat))
    }.foldRight(lit(null).cast("string")) {
      case ((cond, v), acc) => when(cond, v).otherwise(acc)
    }
  }

  /** The reference's ParsePhoneNumber BinaryTransformer: E.164 parse
    * of `phone` under a PER-ROW RESOLVED region code (a
    * [[resolveRegion]] output column — pre-project it so the
    * resolution expression isn't embedded once per dispatch branch):
    * "ZZ" runs the international longest-prefix chain, anything else
    * that region's national rules. Same <2-chars/cleanliness
    * contracts as [[parsePhoneCountry]]. */
  def parsePhoneDispatch(phone: Column, resolvedRegion: Column): Column = {
    val cleaned = cleanPhone(phone)
    val dispatch = rules.foldLeft(
      when(resolvedRegion === "ZZ", intlE164(cleaned))) {
      (acc, r) => acc.when(resolvedRegion === r.region, nationalE164(cleaned, r))
    }.otherwise(lit(null).cast("string"))
    when(length(phone) < 2, lit(null).cast("string"))
      .when(!cleaned.rlike("^\\+?[0-9]+$"), lit(null).cast("string"))
      // a '+' ANYWHERE-leading after cleaning (e.g. "(+44) 20...", which
      // resolveRegion no longer sends to ZZ) still parses as
      // international — libphonenumber's parse extracts the country
      // code from the number itself and ignores the region then
      .when(cleaned.startsWith("+"), intlE164(cleaned))
      .otherwise(dispatch)
  }

  // ---- DuckDB replay, generated from the SAME rules table ----------

  private def sqlValidNational(nat: String, r: Rule): String = {
    val lenOk = s"length($nat) BETWEEN ${r.minLen} AND ${r.maxLen}"
    r.pattern.map(p => s"($lenOk AND regexp_matches($nat, '$p'))").getOrElse(lenOk)
  }

  /** [[resolveRegion]] + [[parsePhoneWithRegion]] as one SQL query
    * over `srcSql` (rows of (rid, phone, region)) — name bigram sets,
    * rule bounds and the first-maximum fold order all render from the
    * same Scala tables; the per-variant Jaccard scores compute ONCE as
    * CTE columns so the argmax chain compares columns, not
    * re-instantiated list expressions. */
  def oracleParseWithRegionSql(srcSql: String,
                               defaultRegion: String = "US"): String = {
    val cleanedIn = "regexp_replace(trim(phone), '[^+0-9]', '', 'g')"
    val jCols = nameVariants.zipWithIndex.map { case ((_, nm), i) =>
      val nb = nm.sliding(2).toSeq.distinct.map(b => s"'$b'").mkString("[", ", ", "]")
      s"(CAST(len(list_intersect(rb, $nb)) AS DOUBLE) / " +
        s"len(list_distinct(rb || $nb))) AS j_$i"
    }.mkString(",\n             ")
    // first index attaining the global maximum = strictly greater than
    // every earlier score and >= every later one (the Scala fold's
    // keep-earlier-unless-strictly-better rule)
    val bestChain = nameVariants.zipWithIndex.init.map { case ((r, _), i) =>
      val before = (0 until i).map(k => s"j_$i > j_$k")
      val after = (i + 1 until nameVariants.size).map(k => s"j_$i >= j_$k")
      s"WHEN ${(before ++ after).mkString(" AND ")} THEN '$r'"
    }.mkString("CASE ", "\n                ", s"\n                ELSE '${nameVariants.last._1}' END")
    val codesIn = rules.map(r => s"'${r.region}'").mkString(", ")
    val intlArms = intlOrder.map { ru =>
      val nat = s"substr(substr(cleaned, 2), ${ru.cc.length + 1})"
      s"WHEN starts_with(substr(cleaned, 2), '${ru.cc}') AND ${sqlValidNational(nat, ru)} " +
        s"THEN '+${ru.cc}' || $nat"
    }.mkString("\n                 ")
    val natArms = rules.map { r =>
      val natDigits = sqlNatDigits("cleaned", r)
      s"WHEN region_used = '${r.region}' THEN CASE WHEN ${sqlValidNational(natDigits, r)} " +
        s"THEN '+${r.cc}' || $natDigits ELSE NULL END"
    }.mkString("\n                 ")
    s"""WITH src AS ($srcSql),
        b AS (SELECT rid, phone, region, $cleanedIn AS cleaned,
             CASE WHEN length(upper(trim(region))) <= 1 THEN [upper(trim(region))]
                  ELSE list_distinct([substr(upper(trim(region)), i, 2)
                         for i in range(1, length(upper(trim(region))))])
                  END AS rb
           FROM src),
        j AS (SELECT rid, phone, region, cleaned,
             $jCols
           FROM b),
        r AS (SELECT rid, phone, region, cleaned,
             CASE WHEN starts_with(phone, '+') THEN 'ZZ'
                  WHEN region IS NULL THEN '${defaultRegion.toUpperCase}'
                  WHEN upper(trim(region)) IN ($codesIn) THEN upper(trim(region))
                  ELSE $bestChain END AS region_used
           FROM j)
       SELECT rid, phone, region AS region_input, region_used,
         CASE WHEN length(phone) < 2 THEN NULL
              WHEN NOT regexp_matches(cleaned, '^\\+?[0-9]+$$') THEN NULL
              WHEN region_used = 'ZZ' OR starts_with(cleaned, '+')
                THEN CASE $intlArms ELSE NULL END
              $natArms
              ELSE NULL END AS e164
       FROM r"""
  }

  /** The [[parsePhoneCountry]] decision tree as one SQL CASE over the
    * column expression `cand`; `cleaned`/`digits` are rendered inline
    * (DuckDB regexp_replace needs the 'g' flag to match Spark's
    * replace-all). */
  def oracleE164Sql(cand: String, defaultRegion: String = "US"): String = {
    val r = byRegion(defaultRegion.toUpperCase)
    val cleaned = s"regexp_replace(trim($cand), '[^+0-9]', '', 'g')"
    val digitsI = s"substr($cleaned, 2)"
    val intlArms = intlOrder.map { ru =>
      val nat = s"substr($digitsI, ${ru.cc.length + 1})"
      s"WHEN starts_with($digitsI, '${ru.cc}') AND ${sqlValidNational(nat, ru)} " +
        s"THEN '+${ru.cc}' || $nat"
    }.mkString("\n                 ")
    val natDigits = sqlNatDigits(cleaned, r)
    s"""CASE WHEN length($cand) < 2 THEN NULL
           WHEN NOT regexp_matches($cleaned, '^\\+?[0-9]+$$') THEN NULL
           WHEN starts_with($cleaned, '+') THEN
             CASE $intlArms
                  ELSE NULL END
           ELSE CASE WHEN ${sqlValidNational(natDigits, r)}
                     THEN '+${r.cc}' || $natDigits ELSE NULL END
      END"""
  }
}
