package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{AggSpec, AggregateReader, ConditionalReader, CutOff, Tables, TimeStampToKeep}
import graft.operators.{Similarity, Vectorizers}

/** Oracle-gated queries for the round-2 reader/similarity additions:
  * relative cutoffs (DaysAgo), deterministic Random as-of cutoffs,
  * multi-probe SRP ANN, and index→string deindexing.
  */
object ReaderQueries {

  type Q = (SparkSession, String) => DataFrame

  private def money(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  val queries: Map[String, Q] = Map(
    // CutOffTime.DaysAgo relative cutoff (reference CutOffTime.scala:41-70)
    "q62_agg_cutoff_daysago" -> ((s, d) => {
      AggregateReader.aggregateWithCutoff(
        Tables.events(s, d),
        key = col("user_id"), ts = col("ts"),
        cutoff = CutOff.DaysAgo(60, "2024-06-30 00:00:00"),
        predictors = Seq(
          AggSpec("pred_sum_value", sum, money(col("value"))),
          AggSpec("pred_n", count, lit(1))),
        responses = Seq(AggSpec("resp_n", count, lit(1))))
        .withColumn("pred_sum_value", col("pred_sum_value").cast("double"))
    }),

    // TimeStampToKeep.Random as-of cutoff — md5-deterministic pick
    "q63_asof_random" -> ((s, d) => {
      ConditionalReader.aggregateAsOf(
        Tables.events(s, d),
        key = col("user_id"), ts = col("ts"),
        targetCondition = col("event_type") === "purchase",
        keep = TimeStampToKeep.Random,
        predictors = Seq(
          AggSpec("pred_sum_value", sum, money(col("value"))),
          AggSpec("pred_n", count, lit(1))),
        responses = Seq(AggSpec("resp_n", count, lit(1))))
        .withColumn("pred_sum_value", col("pred_sum_value").cast("double"))
    }),

    // multi-probe SRP ANN: hamming-1 probing over 6-plane buckets
    "q61_sim_srp_multiprobe" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.srpTopKProbed(e, e.where(col("vec_id") < 5), k = 10, numPlanes = 6)
    }),

    // OpIndexToString inverse: index then deindex round-trips the label
    "q64_deindex" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val fitted = Vectorizers.stringIndexTable(c, col("c_mktsegment"))
      val indexed = Vectorizers.stringIndex(c, col("c_custkey"), col("c_mktsegment"))
      Vectorizers.deindex(indexed, col("id"), col("idx"), fitted)
        .select(col("id").as("c_custkey"), col("label").as("segment"))
    })
  )

  private val H60 = (x: String) => s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"
  private def dotSql(a: String, b: String) =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[CAST(i AS INT)] * $b[CAST(i AS INT)]))"
  private def cosSql(a: String, b: String) =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
  private val W6 = s"(${H60("'srp:' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)")} / 1152921504606846976.0 * 2.0 - 1.0)"
  private def bucketSql(e: String, planes: Int) =
    s"""CAST(list_sum(list_transform(range(0, $planes), p ->
          CASE WHEN list_sum(list_transform(range(0, len($e)), i ->
                 $e[CAST(i + 1 AS INT)] * $W6)) > 0
               THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)) AS BIGINT)"""

  val oracles: Map[String, String] = Map(
    "q62_agg_cutoff_daysago" ->
      """SELECT user_id,
           CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-06-30 00:00:00' - INTERVAL 60 DAY
                THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS pred_sum_value,
           COUNT(CASE WHEN ts < TIMESTAMP '2024-06-30 00:00:00' - INTERVAL 60 DAY THEN 1 END) AS pred_n,
           COUNT(CASE WHEN ts >= TIMESTAMP '2024-06-30 00:00:00' - INTERVAL 60 DAY THEN 1 END) AS resp_n
         FROM events GROUP BY user_id""",

    "q63_asof_random" ->
      s"""WITH cut AS (
           SELECT user_id AS k,
             arg_min(CASE WHEN event_type = 'purchase' THEN ts END,
                     CASE WHEN event_type = 'purchase'
                          THEN ${H60("CAST(user_id AS VARCHAR) || '|' || CAST(epoch_us(ts) AS VARCHAR)")} END) AS cutoff
           FROM events GROUP BY user_id)
         SELECT user_id,
           CAST(SUM(CASE WHEN ts < cutoff THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS pred_sum_value,
           COUNT(CASE WHEN ts < cutoff THEN 1 END) AS pred_n,
           COUNT(CASE WHEN ts >= cutoff THEN 1 END) AS resp_n
         FROM events JOIN cut ON user_id = k
         WHERE cutoff IS NOT NULL
         GROUP BY user_id""",

    "q61_sim_srp_multiprobe" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                     FROM embeddings),
          c AS (SELECT vec_id AS neighbor_id, emb AS c_emb, ${bucketSql("emb", 6)} AS bucket FROM e),
          q AS (SELECT vec_id AS query_id, emb AS q_emb, ${bucketSql("emb", 6)} AS bucket FROM e
                WHERE vec_id < 5),
          scored AS (
            SELECT query_id, neighbor_id, ${cosSql("q_emb", "c_emb")} AS cos
            FROM c JOIN q ON bit_count(xor(c.bucket, q.bucket)) <= 1
            WHERE query_id <> neighbor_id),
          ranked AS (
            SELECT query_id, neighbor_id, cos,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
          SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, CAST(rank AS INT) AS rank
          FROM ranked WHERE rank <= 10""",

    "q64_deindex" ->
      """SELECT c_custkey, c_mktsegment AS segment FROM customer"""
  )
}
