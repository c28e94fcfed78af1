package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis.hash60

/** Embedding similarity operators: exact cosine (zip_with + sequential
  * aggregate — same summation order the DuckDB oracle uses), brute-force
  * top-k, cosine near-dup pairs, and a sign-random-projection (SRP) LSH
  * bucketing as the approximate scale path. The SRP hyperplanes are
  * md5-derived, so even the approximate pipeline is deterministic and
  * oracle-replayable.
  *
  * Scale design (100 TB): brute-force top-k is the per-query baseline
  * (one broadcast of the query set, one pass over the corpus, per-
  * partition top-k via window); the SRP variant turns near-dup search
  * into a bucket-keyed shuffle like the MinHash pipeline — no all-pairs
  * product anywhere.
  */
object Similarity {

  /** Element-wise double cast (embeddings arrive as array<float>;
    * widening float→double is exact). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential left-to-right dot product — matches list_sum order in
    * the DuckDB oracle so results agree bit-for-bit. Expression form
    * (codegen-friendly for small fixed work like SRP planes). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Same sum, compiled: a while-loop UDF is ~20x the interpreted
    * higher-order aggregate on the all-pairs hot path, and the
    * left-to-right order keeps doubles bit-identical to `dot`. */
  private val dotUdf = udf((a: Seq[Double], b: Seq[Double]) => {
    var s = 0.0; var i = 0; val n = a.length
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  })
  def dotFast(a: Column, b: Column): Column = dotUdf(a, b)

  def norm(a: Column): Column = sqrt(dotFast(a, a))

  def cosine(a: Column, b: Column): Column = dotFast(a, b) / (norm(a) * norm(b))

  /** Cosine when per-row norms were hoisted out of the join (compute n
    * norms once instead of 2 per pair — at all-pairs scale that is the
    * difference between O(n) and O(n^2) norm work). */
  def cosinePreNormed(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)

  /** Brute-force exact top-k neighbors for each row of `queries` over
    * `corpus` (both: id + array<float> embedding). Queries are expected
    * to be a small set — Spark broadcasts them; the corpus is scanned
    * once. Rank ties broken by neighbor id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"), toDouble(col("embedding")).as("c_emb"))
      .withColumn("c_nrm", norm(col("c_emb")))
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    val q = queries.select(col("vec_id").as("query_id"), toDouble(col("embedding")).as("q_emb"))
      .withColumn("q_nrm", norm(col("q_emb")))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePreNormed(dotFast(col("q_emb"), col("c_emb")),
          col("q_nrm"), col("c_nrm")).as("cos"))
    scored.withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cosine"), col("rank"))
  }

  /** All pairs with cosine >= threshold (near-duplicate detection).
    * Exact; at scale restrict with srpBucket blocking first. */
  def cosineNearDupPairs(df: DataFrame, threshold: Double): DataFrame = {
    // norms hoisted to the per-row projection: n sqrt+dot instead of 2n^2
    val e = df.select(col("vec_id"), toDouble(col("embedding")).as("emb"))
      .withColumn("nrm", norm(col("emb")))
    // the corpus often arrives as one parquet file = one partition, which
    // would serialize the O(n^2) pair loop on a single core; spread the
    // streamed side so every core owns a slice of the pair space
    val a = e.repartition(df.sparkSession.sparkContext.defaultParallelism)
    a.as("a").join(broadcast(e).as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        cosinePreNormed(dotFast(col("a.emb"), col("b.emb")),
          col("a.nrm"), col("b.nrm")).as("cos"))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine"))
  }

  /** Deterministic md5-derived hyperplane weight for (plane, dim):
    * uniform in [-1, 1). 2^60 = 1152921504606846976. */
  private def planeWeight(p: Column, i: Column): Column =
    hash60(concat_ws(":", lit("srp"), p, i)).cast("double") / 1.152921504606846976e18 * 2.0 - 1.0

  /** Sign-random-projection LSH bucket: bit p of the bucket id is the
    * sign of the projection onto md5-derived hyperplane p. Rows landing
    * in the same bucket are near-neighbor candidates. */
  def srpBucket(emb: Column, numPlanes: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(numPlanes - 1)), p =>
        when(aggregate(
               zip_with(emb, sequence(lit(0), size(emb) - 1),
                 (x, i) => x * planeWeight(p, i)),
               lit(0.0), (acc, x) => acc + x) > 0,
             pow(lit(2.0), p).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)

  /** LSH-bucketed ANN: candidates share the query's SRP bucket; exact
    * cosine re-rank within the bucket. Approximate (recall < 1) but
    * deterministic — the oracle replays the identical buckets. */
  def srpTopK(corpus: DataFrame, queries: DataFrame, k: Int, numPlanes: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      toDouble(col("embedding")).as("c_emb"))
      .withColumn("bucket", srpBucket(col("c_emb"), numPlanes))
      .withColumn("c_nrm", norm(col("c_emb")))
    val q = queries.select(col("vec_id").as("query_id"),
      toDouble(col("embedding")).as("q_emb"))
      .withColumn("bucket", srpBucket(col("q_emb"), numPlanes))
      .withColumn("q_nrm", norm(col("q_emb")))
    val scored = c.join(broadcast(q), "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePreNormed(dotFast(col("q_emb"), col("c_emb")),
          col("q_nrm"), col("c_nrm")).as("cos"))
    scored.withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cosine"), col("rank"))
  }
}
