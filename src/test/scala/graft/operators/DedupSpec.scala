package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  lazy val docs = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
      (3L, "completely different words entirely here now"),
      (4L, "the quick brown fox jumps over the lazy dog") // exact dup of 1
    ).toDF("doc_id", "text")
  }

  test("wordShingles: k-grams, distinct, empty when too short") {
    val s = spark; import s.implicits._
    val sh = docs.select(Dedup.wordShingles(col("text"), 3).as("s")).as[Seq[String]].collect()
    assert(sh(0).contains("the quick brown"))
    assert(sh(0).length == 7) // 9 tokens -> 7 shingles, all distinct here
    val short = Seq((1L, "just two")).toDF("doc_id", "text")
      .select(Dedup.wordShingles(col("text"), 3).as("s")).as[Seq[String]].collect()
    assert(short.head.isEmpty)
  }

  test("connectedComponents resolves transitive chains to min-id keepers") {
    val s = spark; import s.implicits._
    // chain 1-2-3 (1~2, 2~3 but NOT 1~3) + isolated pair 7-9
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("connectedComponentsStar equals label propagation on a mixed graph") {
    val s = spark; import s.implicits._
    // chain + triangle + pair + star, with shuffled id order
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 12L), (12L, 11L), (11L, 10L),
      (7L, 9L), (20L, 25L), (20L, 23L), (20L, 21L)).toDF("id_a", "id_b")
    val prop = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    val star = Dedup.connectedComponentsStar(pairs).as[(Long, Long)].collect().toMap
    assert(star == prop)
    assert(star(3L) == 1L && star(12L) == 10L && star(9L) == 7L && star(25L) == 20L)
  }

  test("connectedComponentsAuto: both dispatch paths yield identical labels") {
    val s = spark; import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 12L), (12L, 11L), (11L, 10L),
      (7L, 9L), (20L, 25L), (20L, 23L), (20L, 21L)).toDF("id_a", "id_b")
    // 9 edges <= 10000: driver union-find fires
    val fast = Dedup.connectedComponentsAuto(pairs).as[(Long, Long)].collect().toMap
    // bound = 0 forces the distributed star path on the SAME input
    val dist = Dedup.connectedComponentsAuto(pairs, bound = 0L)
      .as[(Long, Long)].collect().toMap
    val star = Dedup.connectedComponentsStar(pairs).as[(Long, Long)].collect().toMap
    assert(fast == star && dist == star)
    assert(fast(3L) == 1L && fast(12L) == 10L && fast(25L) == 20L)
  }

  test("connectedComponentsAuto: dispatch log records the branch taken") {
    val s = spark; import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    Dedup.ccDispatchLog.clear()
    // under the bound: driver union-find fires
    Dedup.connectedComponentsAuto(pairs).count()
    // bound tripped: the distributed star fallback must actually fire,
    // not just exist — this is the branch evidence the 100x claim needs
    Dedup.connectedComponentsAuto(pairs, bound = 2L).count()
    val log = Iterator.continually(Dedup.ccDispatchLog.poll())
      .takeWhile(_ != null).toSeq
    assert(log == Seq((3L, true), (3L, false)),
      s"expected fast-then-star dispatch on 3 edges, got $log")
  }

  test("connectedComponentsStar converges in O(log n) rounds on a path graph") {
    val s = spark; import s.implicits._
    // a 200-node path has diameter 199: min-label propagation needs ~199
    // rounds; the alternating algorithm must stay logarithmic
    val n = 200
    val pairs = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.connectedComponentsStarWithRounds(pairs, maxIter = 25)
    val comp = labels.as[(Long, Long)].collect()
    assert(comp.length == n && comp.forall(_._2 == 0L))
    assert(rounds <= 12, s"expected O(log n) rounds, took $rounds")
  }

  test("exactGroups groups identical content") {
    val s = spark; import s.implicits._
    val g = Dedup.exactGroups(docs, col("doc_id"), col("text"))
      .as[(String, Long, Long)].collect()
    assert(g.length == 3)
    val dupGroup = g.find(_._3 == 2).get
    assert(dupGroup._2 == 1L) // keeper = min id
  }

  test("jaccardPairs finds near-dups above threshold with exact scores") {
    val s = spark; import s.implicits._
    val pairs = Dedup.jaccardPairs(docs, col("doc_id"), col("text"), 3, 0.4)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs.contains((1L, 4L)) && pairs((1L, 4L)) == 1.0) // exact dup
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) > 0.4 && pairs((1L, 2L)) < 1.0)
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minHashLshPairs surfaces exact duplicates with jaccard 1") {
    val s = spark; import s.implicits._
    val pairs = Dedup.minHashLshPairs(docs, col("doc_id"), col("text"),
        k = 3, numHashes = 12, numBands = 6, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 1.0))
  }

  test("simHashPairs: identical docs at hamming 0, near-dups close") {
    val s = spark; import s.implicits._
    val pairs = Dedup.simHashPairs(docs, col("doc_id"), col("text"), maxHamming = 30)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 4L)) == 0)
    assert(pairs.get((1L, 2L)).forall(_ <= 30))
  }

  test("dedupAgainstCorpus drops incoming near-dups of standing docs only") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different standing content about engines")).toDF("id", "t")
    val incoming = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup of 1
      (11L, "fresh unseen material that matches nothing at all here"),
      (12L, "xy")) // < k tokens: no signal, must survive
      .toDF("id", "t")
    val kept = Dedup.dedupAgainstCorpus(corpus, incoming, col("id"), col("t"),
        k = 3, numHashes = 12, numBands = 6, threshold = 0.35)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 12L))
  }

  test("fuzzyJoinTopK matches probes to canon rows by token Jaccard, bounded top-k") {
    val s = spark; import s.implicits._
    val canon = Seq(
      (2L, "red green blue"), (4L, "red green yellow"), (6L, "cyan magenta")).toDF("id", "t")
    val probes = Seq(
      (1L, "red green blue"),      // exact (J=1 vs 2), J=0.5 vs 4
      (3L, "totally different words"), // no shared tokens -> no rows
      (5L, "cyan magenta")).toDF("id", "t")
    val out = Dedup.fuzzyJoinTopK(canon, col("id"), col("t"),
        probes, col("id"), col("t"), k = 2, minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val p1 = out.filter(_._1 == 1L).sortBy(_._4)
    assert(p1.map(x => (x._2, x._4)).toSeq == Seq((2L, 1), (4L, 2)))
    assert(p1.head._3 == 1.0 && math.abs(p1(1)._3 - 0.5) < 1e-12)
    assert(out.count(_._1 == 3L) == 0)
    assert(out.filter(_._1 == 5L).map(x => (x._2, x._3, x._4)).toSeq == Seq((6L, 1.0, 1)))
    spark.catalog.clearCache()
  }

  test("fuzzyJoinTopK hot-token cap drops candidates blocked only by hot tokens") {
    val s = spark; import s.implicits._
    // "common" appears in every canon row; with the cap at 2 it cannot block
    val canon = Seq((2L, "common a"), (4L, "common b"), (6L, "common c")).toDF("id", "t")
    val probes = Seq((1L, "common z")).toDF("id", "t")
    val out = Dedup.fuzzyJoinTopK(canon, col("id"), col("t"),
      probes, col("id"), col("t"), k = 3, minJaccard = 0.1, maxTokenDocFreq = 2)
    assert(out.count() == 0)
    spark.catalog.clearCache()
  }

  test("nearExactMatchTopK matches sets differing by at most one token per side") {
    val s = spark; import s.implicits._
    val canon = Seq(
      (2L, "red green blue"), (4L, "red green yellow"), (6L, "one two three four"))
      .toDF("id", "t")
    val probes = Seq(
      (1L, "red green blue"),        // identical to 2; one-off from 4
      (3L, "one two three five"),    // one token swapped vs 6
      (5L, "totally different set")).toDF("id", "t")
    val out = Dedup.nearExactMatchTopK(canon, col("id"), col("t"),
        probes, col("id"), col("t"), k = 2, minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val p1 = out.filter(_._1 == 1L).sortBy(_._4)
    assert(p1.map(x => (x._2, x._4)).toSeq == Seq((2L, 1), (4L, 2)))
    assert(p1.head._3 == 1.0 && math.abs(p1(1)._3 - 0.5) < 1e-12)
    // 3 vs 6: intersection 3 of union 5 -> J = 0.6, found via delete-one sig
    assert(out.filter(_._1 == 3L).map(x => (x._2, x._3)).toSeq == Seq((6L, 0.6)))
    assert(out.count(_._1 == 5L) == 0)
    spark.catalog.clearCache()
  }

  test("nearExactMatchTopK hot-signature cap drops blocking on corpus-hot signatures") {
    val s = spark; import s.implicits._
    // every canon row is the same name: its full signature is hot at cap 2
    val canon = (1L to 4L).map(i => (i * 2, "same name")).toDF("id", "t")
    val probes = Seq((1L, "same name")).toDF("id", "t")
    val out = Dedup.nearExactMatchTopK(canon, col("id"), col("t"),
      probes, col("id"), col("t"), k = 3, minJaccard = 0.9, maxSigDocFreq = 2)
    assert(out.count() == 0)
    spark.catalog.clearCache()
  }

  test("editDistancePairs: pairs within blocks under the distance bound, cross-block never compared") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "kitten", "b1"), (2L, "sitting", "b1"), (3L, "kitten!", "b1"),
      (4L, "kitten", "b2") // same name, different block: must not pair with 1
    ).toDF("id", "nm", "blk")
    val out = Dedup.editDistancePairs(df, col("id"), col("nm"),
        Seq(col("blk")), maxDist = 3)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out == Map((1L, 2L) -> 3, (1L, 3L) -> 1, (2L, 3L) -> 3))
  }

  test("editDistancePairs refuses oversized blocks loudly") {
    val s = spark; import s.implicits._
    val df = (1L to 5L).map(i => (i, s"n$i", "hot")).toDF("id", "nm", "blk")
    val e = intercept[IllegalArgumentException] {
      Dedup.editDistancePairs(df, col("id"), col("nm"),
        Seq(col("blk")), maxDist = 2, maxBlockSize = 3)
    }
    assert(e.getMessage.contains("maxBlockSize"))
  }
}
