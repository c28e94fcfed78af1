package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenizerSpec extends SparkSpec {

  test("fitBpeMerges reproduces the textbook low/lower/lowest merge order") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "low lower lowest")).toDF("id", "t")
    // pair counts: (l,o)=3 (o,w)=3 tie -> lexicographic a picks (l,o);
    // then (lo,w)=3; then (low,e)=2; then all-1 ties -> '<' sorts
    // before letters, so (low,</w>) wins the fourth round
    val merges = Tokenizer.fitBpeMerges(df, col("t"), numMerges = 4)
    assert(merges == Seq("l" -> "o", "lo" -> "w", "low" -> "e", "low" -> "</w>"))
  }

  test("bpeTokenize applies fitted merges greedily left-to-right") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "low lower lowest")).toDF("id", "t")
    val merges = Tokenizer.fitBpeMerges(df, col("t"), numMerges = 4)
    val out = df.select(Tokenizer.bpeTokenize(col("t"), merges).as("toks"))
      .collect().head.getSeq[String](0)
    assert(out == Seq("low</w>", "lowe", "r", "</w>", "lowe", "s", "t", "</w>"))
  }

  test("mergePair handles overlapping runs without double-consuming") {
    val s = spark; import s.implicits._
    val df = Seq(Tuple1(Seq("a", "a", "a", "a", "a"))).toDF("syms")
    val out = df.select(Tokenizer.mergePair(col("syms"), "a", "a").as("m"))
      .collect().head.getSeq[String](0)
    // greedy non-overlapping left-to-right: aa aa a
    assert(out == Seq("aa", "aa", "a"))
  }

  test("fitBpeMerges stops early when no pairs remain") {
    val s = spark; import s.implicits._
    // single 1-char word: seed is [c, </w>] -> one merge exhausts it
    val df = Seq((1L, "c c c")).toDF("id", "t")
    val merges = Tokenizer.fitBpeMerges(df, col("t"), numMerges = 10)
    assert(merges == Seq("c" -> "</w>"))
  }

  test("fit is invariant under repartitioning (deterministic tiebreaks)") {
    val s = spark; import s.implicits._
    val words = Seq("spark", "sparse", "parse", "park", "spar", "spark")
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "t")
    val m1 = Tokenizer.fitBpeMerges(df, col("t"), numMerges = 6)
    val m2 = Tokenizer.fitBpeMerges(df.repartition(7), col("t"), numMerges = 6)
    assert(m1 == m2)
    assert(m1.size == 6)
  }
}
