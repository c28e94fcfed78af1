package graft.aggregators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish corpus: "w0" 400x, "w1" 200x, "w2" 100x, then a 900-item tail
  private def corpus = (
    Seq.fill(400)("w0") ++ Seq.fill(200)("w1") ++ Seq.fill(100)("w2") ++
      (0 until 900).map(i => s"tail$i")
  ).toDF("item").repartition(7)

  test("Misra-Gries candidates contain every true heavy hitter") {
    val phi = 0.05 // n = 1600, threshold 80 -> truth is w0, w1, w2
    val cands = Sketches.heavyHitterCandidates(corpus, col("item"), phi)
      .as[(String, Long)].collect().toMap
    assert(Set("w0", "w1", "w2").subsetOf(cands.keySet))
    assert(cands.size <= math.ceil(1 / phi).toInt)
    // undercount only, bounded by n/(k+1)
    val bound = 1600.0 / (math.ceil(1 / phi) + 1)
    assert(cands("w0") <= 400 && cands("w0") >= 400 - bound)
  }

  test("exact two-pass heavy hitters equal the brute-force groupBy truth") {
    val phi = 0.05
    val got = Sketches.heavyHittersExact(corpus, col("item"), phi)
      .as[(String, Long)].collect().toMap
    val truth = corpus.groupBy("item").count()
      .where(col("count") >= phi * 1600).as[(String, Long)].collect().toMap
    assert(got == truth)
    assert(got == Map("w0" -> 400L, "w1" -> 200L, "w2" -> 100L))
  }

  test("result is stable across partitionings (merge-order independence)") {
    val phi = 0.05
    val a = Sketches.heavyHittersExact(corpus.repartition(1), col("item"), phi)
      .as[(String, Long)].collect().toMap
    val b = Sketches.heavyHittersExact(corpus.repartition(31), col("item"), phi)
      .as[(String, Long)].collect().toMap
    assert(a == b)
  }
}
