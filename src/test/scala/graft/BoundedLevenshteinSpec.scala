package graft

import org.apache.spark.sql.functions._

/** Differential + codegen tests for the banded bounded-Levenshtein
  * expression: must equal least(levenshtein(a,b), k+1) everywhere and
  * stay native (no ScalaUDF) in the plan. */
class BoundedLevenshteinSpec extends SparkSpec {

  import spark.implicits._

  private val pairs = Seq(
    ("", ""), ("", "abc"), ("abc", ""), ("abc", "abc"),
    ("kitten", "sitting"), ("flaw", "lawn"), ("saturday", "sunday"),
    ("BURNISHED", "BRUSHED"), ("ANODIZED", "POLISHED"),
    ("aaaaaaaaaaaaaaaaaaaa", "bbbbbbbbbbbbbbbbbbbb"),
    ("prefix-match-tail-x", "prefix-match-tail-y"),
    ("short", "a much longer string entirely"))

  test("graft_lev_bounded equals least(levenshtein, k+1) for k in 0..5") {
    val df = pairs.toDF("a", "b")
    for (k <- 0 to 5) {
      val rows = df.selectExpr(s"graft_lev_bounded(a, b, $k) AS got",
        s"least(levenshtein(a, b), $k + 1) AS want").collect()
      rows.foreach(r => assert(r.getInt(0) == r.getInt(1),
        s"k=$k row=$r"))
    }
  }

  test("length-gap fast path and early exit return exactly k+1") {
    val r = Seq(("abcdefghij", "z")).toDF("a", "b")
      .selectExpr("graft_lev_bounded(a, b, 3) AS d").head()
    assert(r.getInt(0) == 4)
    // same length, all positions differ: band exceeds budget on row k+1
    val r2 = Seq(("aaaaaaaaaa", "bbbbbbbbbb")).toDF("a", "b")
      .selectExpr("graft_lev_bounded(a, b, 2) AS d").head()
    assert(r2.getInt(0) == 3)
  }

  test("stays a native expression: no ScalaUDF in the executed plan") {
    val df = Seq(("x", "y")).toDF("a", "b")
      .selectExpr("graft_lev_bounded(a, b, 2) AS d")
    assert(!df.queryExecution.executedPlan.toString.contains("ScalaUDF"))
    assert(df.head().getInt(0) == 1)
  }
}
