package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PhoneRulesSpec extends SparkSpec {
  import PhoneRules._

  private def parse(s: String, region: String = "US"): Option[String] = {
    val r = spark.range(1)
      .select(parsePhoneCountry(lit(s), region).as("p")).collect()(0)
    Option(r.getAs[String]("p"))
  }

  test("NANP rules: separators stripped, area/exchange in [2-9]") {
    assert(parse("555-234-0000") == Some("+15552340000"))
    assert(parse("+1 (555) 234-0000") == Some("+15552340000"))
    assert(parse("+1 (155) 234-0000") == None) // area code 1xx
    assert(parse("(555) 014-0000") == None)    // exchange 0xx
    assert(parse("555-234-00001") == None)     // 11 national digits
  }

  test("default-region semantics with trunk-zero strip") {
    // GB national format only parses under defaultRegion=GB
    assert(parse("07700 900123", "GB") == Some("+447700900123"))
    assert(parse("07700 900123", "US") == None) // 11 digits under NANP
    assert(parse("030 1234567", "DE") == Some("+49301234567"))
  }

  test("international longest-prefix match and per-country lengths") {
    assert(parse("+44 7700 900123") == Some("+447700900123"))
    assert(parse("+49 30 123456789012") == None) // 14 national digits > 11
    assert(parse("+2348012345678") == Some("+2348012345678")) // NG binds 234
    assert(parse("+919123456789") == Some("+919123456789"))
    assert(parse("+915123456789") == None) // IN first digit must be [6-9]
    assert(parse("+999 1234 5678") == None) // unknown calling code
  }

  test("region resolution: code passthrough, '+' -> ZZ, name Jaccard, null default") {
    def resolve(phone: String, region: Option[String]): String =
      spark.range(1).select(resolveRegion(lit(phone),
        region.map(lit).getOrElse(lit(null).cast("string"))).as("r"))
        .collect()(0).getString(0)
    assert(resolve("555-234-0000", Some("us")) == "US")   // code, case-folded
    assert(resolve("+49 30 1234", Some("FRANCE")) == "ZZ") // '+' wins over region
    assert(resolve("0123", Some("United Kingdom")) == "GB")
    assert(resolve("0123", Some("GREAT BRITAIN")) == "GB") // second name variant
    assert(resolve("0123", Some("FRANZIA")) == "FR")       // misspelling, Jaccard
    assert(resolve("0123", None) == "US")                  // null -> DefaultRegion
    // a region sharing zero bigrams with every name resolves to the
    // FIRST table entry (all scores 0, keep-earlier tie rule)
    assert(resolve("0123", Some("QQ")) == "US")
    // ZZ tests the RAW string (reference isInternationalFormat): a
    // parenthesized or space-padded '+' takes the region path instead
    assert(resolve("(+44) 20 7946 0958", Some("FRANCE")) == "FR")
    assert(resolve(" +44 20 7946 0958", Some("FRANCE")) == "FR")
    // dispatch applies the resolved region's national rules
    val r = spark.range(1).select(
      parsePhoneDispatch(lit("07700 900123"), lit("GB")).as("a"),
      parsePhoneDispatch(lit("07700 900123"), lit("US")).as("b"),
      // cleaned-leading '+' still parses internationally under ANY
      // resolved region (libphonenumber ignores the region then)
      parsePhoneDispatch(lit("(+44) 7700 900123"), lit("FR")).as("c")).collect()(0)
    assert(r.getString(0) == "+447700900123" && r.isNullAt(1))
    assert(r.getString(2) == "+447700900123")
  }

  test("reference contracts: <2 chars null, junk rejected") {
    assert(parse("x") == None)
    assert(parse("call me maybe") == None)
    assert(parse("++15552340000") == None) // embedded '+' survives cleaning
    val v = spark.range(1).select(
      isValidPhoneCountry(lit("x")).as("a"),
      isValidPhoneCountry(lit("555-234-0000")).as("b"),
      isValidPhoneCountry(lit("12345")).as("c"),
      isValidPhoneCountry(lit("call me maybe")).as("d")).collect()(0)
    assert(v.isNullAt(0))      // <2 chars -> null, the reference's None
    assert(v.getBoolean(1))
    assert(!v.getBoolean(2))
    // digit-less candidate: phoneUtil.parse THROWS in the reference, so
    // validate is None (null), not false
    assert(v.isNullAt(3))
  }
}
