package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntitySpec extends SparkSpec {

  test("entityCandidates extracts capitalized runs of 2+ tokens") {
    val s = spark; import s.implicits._
    val out = Seq(
      "I met Alice Johnson at Acme Corp yesterday",
      "no entities here",
      "Paris is nice but Marie Anne Claire is nicer").toDF("t")
      .select(TextFunctions.entityCandidates(col("t")).as("e"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("Alice Johnson", "Acme Corp"))
    assert(out(1).isEmpty)
    assert(out(2) == Seq("Marie Anne Claire")) // single-cap 'Paris' excluded
  }
}
