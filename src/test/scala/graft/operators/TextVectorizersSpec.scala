package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextVectorizersSpec extends SparkSpec {

  lazy val docs = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "alpha beta gamma", "en"),
      (2L, "alpha alpha delta", "en"),
      (3L, "omega beta", "fr"),
      (4L, "zeta eta theta iota", "de")
    ).toDF("id", "text", "lang")
  }

  test("hashedTf counts tokens per md5 bucket; tfVector densifies") {
    val s = spark; import s.implicits._
    val tf = TextVectorizers.hashedTf(docs, col("id"), col("text"), dims = 8)
    val total = tf.agg(sum("cnt")).head.getLong(0)
    assert(total == 12) // every token lands in exactly one bucket
    // doc 2 has "alpha" twice -> some bucket with cnt 2
    assert(tf.where(col("id") === 2 && col("cnt") === 2).count() == 1)
    val dense = TextVectorizers.tfVector(tf, dims = 8)
      .as[(Long, Seq[Double])].collect().toMap
    assert(dense(2L).sum == 3.0 && dense(2L).length == 8)
  }

  test("tfidf downweights ubiquitous tokens") {
    val s = spark; import s.implicits._
    val out = TextVectorizers.hashedTfIdf(docs, col("id"), col("text"), dims = 64)
    assert(out.count() > 0)
    assert(out.select(min("tfidf")).head.getDouble(0) > 0)
    // with dims=64 and 9 distinct tokens collisions are unlikely, so
    // idf spread shows: a 2-doc token's tfidf < a 1-doc token's tfidf
    val m = out.where(col("tfidf") > 0).agg(max("tfidf"), min("tfidf")).head
    assert(m.getDouble(0) > m.getDouble(1))
  }

  test("hashedTfMulti: separate spaces offset per column, shared space prefixes tokens") {
    val s = spark; import s.implicits._
    import TextVectorizers.{HashSpace, hashedTf, hashedTfMulti}
    val dims = 8
    val sep = hashedTfMulti(docs, col("id"), Seq("text", "lang"), dims, HashSpace.Separate)
      .as[(Long, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // separate == per-column hashedTf with column i shifted by i*dims
    val manual = (
      hashedTf(docs, col("id"), col("text"), dims)
        .as[(Long, Int, Long)].collect().map(r => (r._1, r._2) -> r._3) ++
      hashedTf(docs, col("id"), col("lang"), dims)
        .as[(Long, Int, Long)].collect().map(r => (r._1, r._2 + dims) -> r._3)).toMap
    assert(sep == manual)
    assert(sep.keys.exists(_._2 >= dims) && sep.keys.exists(_._2 < dims))

    val sh = hashedTfMulti(docs, col("id"), Seq("text", "lang"), dims, HashSpace.Shared)
    // shared: all buckets inside one dims-wide space
    assert(sh.agg(max("bucket")).head.getInt(0) < dims)
    // token totals preserved in both modes (every token lands somewhere)
    val totalTokens = sep.values.sum
    assert(sh.agg(sum("cnt")).head.getLong(0) == totalTokens)
    // the name prefix keeps identical tokens from different columns
    // distinguishable: "en" in lang must hash differently than an
    // unprefixed "en" would
    val enShared = graft.functions.TextAnalysis.hash60(lit("lang:en"))
    val expected = docs.select((pmod(enShared, lit(dims))).cast("int")).head.getInt(0)
    assert(sh.where(col("id") === 1 && col("bucket") === expected).count() == 1)
  }

  test("hashedTfMulti Auto picks shared only past the width budget") {
    import TextVectorizers.{HashSpace, hashedTfMulti}
    // 2 cols x 8 dims = 16 buckets: under a 16 budget -> separate
    val under = hashedTfMulti(docs, col("id"), Seq("text", "lang"), 8, HashSpace.Auto(16))
    assert(under.agg(max("bucket")).head.getInt(0) >= 8)
    // over a 15 budget -> shared
    val over = hashedTfMulti(docs, col("id"), Seq("text", "lang"), 8, HashSpace.Auto(15))
    assert(over.agg(max("bucket")).head.getInt(0) < 8)
  }

  test("smartTextVectorize dispatches pivot vs hash by TextStats") {
    val s = spark; import s.implicits._
    val decisions = TextVectorizers.smartDecide(docs, Seq("text", "lang"), maxCardinality = 3)
      .select("col_name", "decision").as[(String, String)].collect().toMap
    assert(decisions("lang") == "pivot") // 3 distinct <= 3
    assert(decisions("text") == "hash") // 4 distinct, length variance > 0
    val wide = TextVectorizers.smartTextVectorize(docs, col("id"), Seq("text", "lang"),
      maxCardinality = 3, topK = 2, dims = 8)
    assert(wide.columns.contains("lang_1") && wide.columns.contains("lang_null"))
    assert(wide.columns.contains("text_tf"))
    assert(wide.count() == 4)
  }

  /** The spec's own md5 bucket — same family as TextAnalysis.hash60. */
  private def bucketOf(tok: String, dims: Int): Int = {
    val h = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(tok).take(15), 16)
    ((h % dims + dims) % dims).toInt
  }

  test("bm25 matches an independent driver-side computation exactly") {
    val dims = 64
    val out = TextVectorizers.bm25(docs, col("id"), col("text"), dims)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // independent computation: tokenize + bucket + the BM25 formula
    val corpus = Seq(1L -> "alpha beta gamma", 2L -> "alpha alpha delta",
      3L -> "omega beta", 4L -> "zeta eta theta iota")
    val tf = corpus.flatMap { case (id, t) =>
      t.split("\\s+").map(tok => (id, bucketOf(tok, dims))) }
      .groupBy(identity).view.mapValues(_.size).toMap
    val m = corpus.size.toDouble
    val toks = tf.values.sum.toDouble
    val dl = tf.groupBy(_._1._1).view.mapValues(_.values.sum.toDouble).toMap
    val dfb = tf.keys.groupBy(_._2).view.mapValues(_.map(_._1).toSet.size.toDouble).toMap
    val (k1, b) = (1.2, 0.75)
    assert(out.size == tf.size)
    tf.foreach { case ((id, bk), cnt) =>
      val expected = math.log((m - dfb(bk) + 0.5) / (dfb(bk) + 0.5) + 1.0) *
        (cnt * (k1 + 1.0)) /
        (cnt + k1 * (1.0 - b + b * dl(id) / (toks / m)))
      assert(math.abs(out((id, bk)) - expected) < 1e-12,
        s"doc $id bucket $bk: got ${out((id, bk))}, want $expected")
    }
  }

  test("bm25TopK ranks higher term count first; respects k and tiebreak") {
    val s = spark; import s.implicits._
    // dims = 256: every spec token owns its bucket (alpha/gamma collide
    // below that), so the ranking reflects term counts, not collisions
    val top = TextVectorizers.bm25TopK(docs, col("id"), col("text"),
      query = "alpha", dims = 256, k = 2).as[(Long, Double)].collect()
    // doc 2 has alpha twice (same dl as doc 1) -> strictly higher score
    assert(top.map(_._1).toSeq == Seq(2L, 1L), top.mkString(","))
    assert(top(0)._2 > top(1)._2)
  }
}
