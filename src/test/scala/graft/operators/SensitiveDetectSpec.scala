package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SensitiveDetectSpec extends SparkSpec {

  private def statsOf(rows: Seq[String]) = {
    val s = spark; import s.implicits._
    SensitiveDetect.nameColumnStats(rows.toDF("t"), col("t"), "t")
      .collect()(0)
  }

  test("name column detected; guard failures veto the dictionary signal") {
    // 12 distinct dictionary-heavy names: all guards pass, avg frac > 0.5
    // 10 half-dict + 2 all-dict rows -> avg frac 7/12 > 0.5
    val names = Seq("John Smith", "Mary Jones", "Alice Green", "James Brown",
      "Emma Wilson", "Robert Fox", "Linda Crane", "Sarah Grace",
      "David Hill", "Anna Maria", "Peter Quill", "Karen Page")
    val r = statsOf(names)
    assert(r.getAs[Int]("guards_passed") == 1)
    assert(r.getAs[Int]("treat_as_name") == 1)
    // same texts but only 3 distinct values: unique guard fails at N>=10,
    // so treat_as_name goes false even though the dict fraction is high
    val dup = Seq.fill(4)(Seq("John Smith", "Mary Jones", "James Brown")).flatten
    val r2 = statsOf(dup)
    assert(r2.getAs[Long]("n_unique") == 3L)
    assert(r2.getAs[Int]("guards_passed") == 0)
    assert(r2.getAs[Int]("treat_as_name") == 0)
  }

  test("gender strategies: honorific exactly-one rule, comma regexes, threshold") {
    val s = spark; import s.implicits._
    // 12 distinct comma-form rows so guards pass and after_comma_token
    // is the only strategy that resolves every row -> it must win
    val rows = (1 to 12).map { i =>
      val fn = if (i % 2 == 0) "John" else "Mary"
      s"Lastname$i, Mr $fn"
    }
    val r = statsOf(rows)
    assert(r.getAs[String]("best_gender_strategy") == "after_comma_token")
    assert(r.getAs[Long]("best_n_male") == 6L)
    assert(r.getAs[Long]("best_n_female") == 6L)
    assert(r.getAs[Long]("best_n_other") == 0L)
    // exactly-one honorific: two honorifics -> NA, so honorific scores
    // 12 others on "Mr Mrs ..." rows and cannot win
    val two = statsOf((1 to 12).map(i => s"Mr Mrs Name$i"))
    assert(two.getAs[String]("best_gender_strategy") != "honorific")
    // ambiguous names split on the 0.5 threshold: jordan 0.55 -> M,
    // taylor 0.41 -> F (by_index_0 reads the first token)
    val amb = statsOf((1 to 6).map(i => s"Jordan X$i") ++
      (1 to 6).map(i => s"Taylor Y$i"))
    assert(amb.getAs[String]("best_gender_strategy") == "by_index_0")
    assert(amb.getAs[Long]("best_n_male") == 6L)
    assert(amb.getAs[Long]("best_n_female") == 6L)
  }
}
