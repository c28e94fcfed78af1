package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemiStructuredSpec extends SparkSpec {

  test("withJsonFields extracts typed paths; malformed rows go null") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, """{"k": 7, "tags": ["a"], "who": {"name": "x"}}"""),
      (2L, """{"k": "notanint"}"""),
      (3L, "not json at all"),
      (4L, null.asInstanceOf[String])).toDF("id", "j")
    val out = SemiStructured.withJsonFields(df, col("j"), Seq(
        ("k", "$.k", "int"), ("who_name", "$.who.name", "string")))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getInt(2)),
         Option(r.getString(3)))).toMap
    assert(out(1L) == ((Some(7), Some("x"))))
    assert(out(2L) == ((None, None)))   // non-int casts to null
    assert(out(3L) == ((None, None)))
    assert(out(4L) == ((None, None)))
  }

  test("inferJsonSchema + parseJson round-trips a sampled schema; failures counted") {
    val s = spark; import s.implicits._
    val df = (1L to 50L).map(i => (i, s"""{"k": $i, "s": "v$i"}""")).toDF("id", "j")
    val schema = SemiStructured.inferJsonSchema(df, col("j"))
    assert(schema.fieldNames.toSet == Set("k", "s"))
    val parsed = SemiStructured.parseJson(df, col("j"), schema)
    assert(parsed.where(col("parsed.k") === 7 && col("parsed.s") === "v7").count() == 1)
    val bad = df.union(Seq((99L, "][nope")).toDF("id", "j"))
    val r = SemiStructured.parseFailures(bad, col("j"), schema).head
    assert(r.getLong(0) == 51 && r.getLong(1) == 1)
  }
}
