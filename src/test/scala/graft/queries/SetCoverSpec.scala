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

  test(">62 sources dispatch to the set-algebra fallback and match brute force") {
    import spark.implicits._
    // 70 sources: source s_i covers shingles w_0..w_(70-i) — nested
    // coverage makes the greedy picks deterministic and non-trivial
    val data = (0 until 70).flatMap(i =>
      (0 to (70 - i)).map(j => (f"s$i%02d", s"w$j")))
    val shingled = data.toDF("source", "w")
    val srcList = data.map(_._1).distinct.sorted
    assert(srcList.length > 62)
    val got = CurationQueries.setCoverGreedy(spark, srcList, shingled)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // brute-force Scala greedy (same as the sf0.001 gate above)
    val bySource: Map[String, Set[String]] =
      data.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
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
      s"fallback greedy diverged:\n got=${got.toSeq}\n exp=$expect")
  }

  test("empty source list returns an empty frame instead of failing") {
    import spark.implicits._
    val empty = Seq.empty[(String, String)].toDF("source", "w")
    val out = CurationQueries.setCoverGreedy(spark, Seq.empty, empty)
    assert(out.count() == 0)
    assert(out.columns.toSeq ==
      Seq("step", "source", "marginal_new_tokens", "cum_tokens"))
  }
}
