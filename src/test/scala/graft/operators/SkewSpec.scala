package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  // one hot key (0) with 200 rows, long tail of singletons
  lazy val fact = {
    val s = spark; import s.implicits._
    ((1 to 200).map(i => (0L, i.toDouble)) ++ (1 to 50).map(i => (i.toLong, i.toDouble)))
      .toDF("k", "v")
  }
  lazy val dim = {
    val s = spark; import s.implicits._
    (0L to 50L).map(k => (k, s"name_$k")).toDF("k", "nm")
  }

  test("saltedJoin equals the plain join") {
    val plain = fact.join(dim, Seq("k")).select("k", "v", "nm")
    val salted = Skew.saltedJoin(fact, dim, "k", saltBuckets = 8).select("k", "v", "nm")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedDistinct equals countDistinct per key") {
    val s = spark; import s.implicits._
    // hot key 0 sees each value 4x so dedup is non-trivial
    val dup = fact.union(fact).union(fact).union(fact)
    val want = dup.groupBy("k").agg(countDistinct(col("v")).as("n"))
      .as[(Long, Long)].collect().toMap
    val got = Skew.saltedDistinct(dup, col("k"), col("v"), saltBuckets = 8)
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }
}
