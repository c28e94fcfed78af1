package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  lazy val vecs = {
    val s = spark; import s.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)), // close to 0
      (2L, Array(0.0f, 1.0f)), // orthogonal to 0
      (3L, Array(-1.0f, 0.0f)) // opposite of 0
    ).toDF("vec_id", "embedding")
  }

  test("cosine: identity 1, orthogonal 0, opposite -1") {
    val s = spark; import s.implicits._
    val e = vecs.select(col("vec_id"), Similarity.toDouble(col("embedding")).as("e"))
    val pairs = e.as("a").crossJoin(e.as("b"))
      .select(col("a.vec_id"), col("b.vec_id"),
        Similarity.cosine(col("a.e"), col("b.e")).as("c"))
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(math.abs(pairs((0L, 0L)) - 1.0) < 1e-12)
    assert(math.abs(pairs((0L, 2L))) < 1e-12)
    assert(math.abs(pairs((0L, 3L)) + 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine desc") {
    val s = spark; import s.implicits._
    val top = Similarity.bruteForceTopK(vecs, vecs.where(col("vec_id") === 0), k = 3)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    assert(top.map(_._2).toSeq == Seq(1L, 2L, 3L)) // by similarity to vec 0
    assert(top.head._3 > 0.99)
  }

  test("srpBucket: same vector -> same bucket; opposite -> different") {
    val s = spark; import s.implicits._
    val b = vecs.select(col("vec_id"),
        Similarity.srpBucket(Similarity.toDouble(col("embedding")), 8).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(b(0L) != b(3L)) // all 8 plane signs flip for the negation
  }
}
