package graft.aggregators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-style laws for the monoid aggregators, mirroring the
  * reference's seeded-generator test strategy: a distributed aggregate
  * is only correct if its partial+final merge is associative and
  * commutative, so every law here compares Spark's answer across
  * DIFFERENT partitionings against a sequential Scala fold. ScalaCheck
  * generators are driven with fixed seeds — failures reproduce. */
class AggregatorLawsSpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, rng.Seed(seed))

  private val rowGen: Gen[List[(Long, String, Double, Long)]] =
    Gen.listOfN(200, for {
      key <- Gen.choose(0L, 4L)
      s <- Gen.oneOf("a", "b", "c", "dd", "ee")
      v <- Gen.choose(-1000, 1000).map(_ / 8.0) // exact doubles
      t <- Gen.choose(0L, 50L)
    } yield (key, s, v, t))

  test("modeString: partition-invariant and equal to the sequential mode") {
    for (seed <- 1L to 5L) {
      val rows = sample(rowGen, seed)
      val s = spark; import s.implicits._
      val df = rows.toDF("k", "s", "v", "t")
      // deterministic tiebreak: max count, then min value
      val exp2 = rows.groupBy(_._1).map { case (k, rs) =>
        val counts = rs.groupBy(_._2).view.mapValues(_.size).toMap
        val maxN = counts.values.max
        k -> counts.filter(_._2 == maxN).keys.min
      }
      for (parts <- Seq(1, 7)) {
        val got = df.repartition(parts).groupBy("k")
          .agg(MonoidAggregators.modeString(col("s")).as("m"))
          .as[(Long, String)].collect().toMap
        assert(got == exp2, s"seed=$seed parts=$parts")
      }
    }
  }

  test("unionSumMap: partition-invariant and equal to the sequential map-sum") {
    for (seed <- 10L to 13L) {
      val rows = sample(rowGen, seed)
      val s = spark; import s.implicits._
      val df = rows.map { case (k, str, v, _) => (k, Map(str -> v)) }.toDF("k", "m")
      val expected = rows.groupBy(_._1).map { case (k, rs) =>
        k -> rs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      }
      for (parts <- Seq(1, 5)) {
        val got = df.repartition(parts).groupBy("k")
          .agg(MonoidAggregators.unionSumMap(col("m")).as("u"))
          .as[(Long, Map[String, Double])].collect().toMap
        assert(got == expected, s"seed=$seed parts=$parts")
      }
    }
  }

  test("first/lastByTime: partition-invariant min_by/max_by on unique timestamps") {
    for (seed <- 20L to 23L) {
      // unique ts per key so the law is well-defined under reshuffles
      val rows = sample(rowGen, seed)
        .groupBy(r => (r._1, r._4)).map(_._2.head).toList
      val s = spark; import s.implicits._
      val df = rows.toDF("k", "s", "v", "t")
      val expFirst = rows.groupBy(_._1).map { case (k, rs) => k -> rs.minBy(_._4)._2 }
      val expLast = rows.groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._4)._2 }
      for (parts <- Seq(1, 6)) {
        val got = df.repartition(parts).groupBy("k").agg(
            MonoidAggregators.firstByTime(col("s"), col("t")).as("f"),
            MonoidAggregators.lastByTime(col("s"), col("t")).as("l"))
          .as[(Long, String, String)].collect()
        assert(got.map(r => r._1 -> r._2).toMap == expFirst, s"seed=$seed parts=$parts")
        assert(got.map(r => r._1 -> r._3).toMap == expLast, s"seed=$seed parts=$parts")
      }
    }
  }

  test("sampleBucket/hashSplit: every generated id set is fully covered, bands disjoint") {
    import graft.operators.Curation
    for (seed <- 30L to 32L) {
      val ids = sample(Gen.listOfN(300, Gen.choose(0L, 1000000L)), seed).distinct
      val s = spark; import s.implicits._
      val df = ids.toDF("id")
      val out = Curation.hashSplit(df, col("id"), Seq("x" -> 0.5, "y" -> 0.5))
        .as[(Long, String)].collect()
      assert(out.length == ids.length)        // total function
      assert(out.forall(r => r._2 == "x" || r._2 == "y")) // onto the bands
      val again = Curation.hashSplit(df.repartition(9), col("id"),
        Seq("x" -> 0.5, "y" -> 0.5)).as[(Long, String)].collect().toMap
      assert(out.toMap == again)              // partition-invariant
    }
  }
}
