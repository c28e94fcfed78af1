package graft.queries

import graft.SparkSpec
import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

/** Differential gate for the r11 bitmask rewrite of q347: the greedy
  * set cover computed from per-shingle source-membership masks must
  * equal the brute-force SET-algebra greedy (anti-join formulation)
  * step for step — picks, marginals, and cumulative coverage. */
class SetCoverSpec extends SparkSpec {

  test("q347 bitmask greedy equals the brute-force set greedy on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q347_set_cover_greedy")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)

    // brute force: materialize the (source, bigram-shingle) set and run
    // the textbook greedy with Scala sets
    val ts = graft.sources.Tables.documents(spark, dir)
      .select(col("source"),
        explode(graft.operators.Dedup.wordShinglesOf(
          TextAnalysis.tokens(col("text")), 2)).as("w"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource: Map[String, Set[String]] =
      ts.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    var covered = Set.empty[String]
    var picked = Vector.empty[String]
    var expect = Vector.empty[(Int, String, Long, Long)]
    var done = false
    for (step <- 1 to 4 if !done) {
      val cand = bySource.keys.filterNot(picked.contains)
        .map(s => (s, (bySource(s) -- covered).size.toLong))
        .filter(_._2 > 0)
        .toSeq.sortBy { case (s, m) => (-m, s) }
      cand.headOption match {
        case None => done = true
        case Some((s, m)) =>
          picked :+= s
          covered ++= bySource(s)
          expect :+= ((step, s, m, covered.size.toLong))
      }
    }
    assert(got.toSeq == expect,
      s"bitmask greedy diverged:\n got=${got.toSeq}\n exp=$expect")
  }
}
