package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bloom-prefiltered fact-dim join: exactness (no false negatives, join
  * kills the false positives), the empty-dim edge, actual pruning power,
  * and the plan shape (probe is a codegen'd might_contain filter on the
  * fact scan, before any shuffle).
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fact = (1L to 10000L).map(i => (i, i % 100)).toDF("fk", "v")
  private def dim = Seq(3L, 7L, 9999L).map(k => (k, s"d$k")).toDF("dk", "name")

  test("prefiltered join result equals the plain join") {
    val pre = JoinedReader.bloomPrefilteredFact(
      fact, col("fk"), dim, col("dk"), expectedKeys = 10)
    val got = pre.join(dim, col("fk") === col("dk")).select("fk", "name")
    val want = fact.join(dim, col("fk") === col("dk")).select("fk", "name")
    assert(got.collect().toSet === want.collect().toSet)
  }

  test("no false negatives: every dim key survives the prefilter") {
    val pre = JoinedReader.bloomPrefilteredFact(
      fact, col("fk"), dim, col("dk"), expectedKeys = 10)
    val kept = pre.select("fk").as[Long].collect().toSet
    assert(Set(3L, 7L, 9999L).subsetOf(kept))
  }

  test("prefilter actually prunes (fpp keeps survivors near dim size)") {
    val pre = JoinedReader.bloomPrefilteredFact(
      fact, col("fk"), dim, col("dk"), expectedKeys = 10)
    val n = pre.count()
    // 3 true keys + false positives; with 1M bits for 3 keys the fp
    // rate is ~0, but allow generous slack for the bloom's hash luck
    assert(n >= 3 && n < 200, s"prefilter kept $n of 10000 rows")
  }

  test("empty dim yields an empty prefiltered fact") {
    val pre = JoinedReader.bloomPrefilteredFact(
      fact, col("fk"), dim.where(lit(false)), col("dk"), expectedKeys = 10)
    assert(pre.count() === 0)
  }

  test("probe is a native might_contain filter in the plan (no UDF)") {
    // a file-backed fact: over a LocalRelation the optimizer folds the
    // probe away entirely (ConvertToLocalRelation), which hides the
    // plan shape this test pins down
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val dimKeys = Seq(1L, 2L, 3L).toDF("dk")
    val pre = JoinedReader.bloomPrefilteredFact(
      orders, col("o_custkey"), dimKeys, col("dk"), expectedKeys = 10)
    val plan = pre.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(500))
    assert(!plan.toLowerCase.contains("batchevalpython") &&
      !plan.contains("UDF"), "probe must not be a UDF")
  }
}
