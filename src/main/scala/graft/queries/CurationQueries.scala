package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Curation
import graft.functions.TextAnalysis

/** Oracle-gated corpus-curation queries over `documents`: deterministic
  * hash sampling, reproducible split assignment, and per-group token
  * budgeting. Every decision is md5-derived so the DuckDB oracle
  * replays the exact kept/dropped sets — the audit property these
  * selection steps need in a production pretraining pipeline.
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // deterministic 50% sample, then 80/10/10 split assignment over the
    // kept rows — both md5-derived, both replayed exactly
    "q97_curation_sample_split" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val kept = Curation.deterministicSample(docs, col("doc_id"), 0.5, salt = "s1")
      Curation.hashSplit(kept, col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"),
          Curation.sampleBucket(col("doc_id"), "split").as("bucket"),
          col("split"))
    }),

    // per-source token budget: keep the longest documents of each
    // source while its running token total stays within 5000
    "q98_curation_token_budget" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("ntok", TextAnalysis.tokenCount(col("text")))
      Curation.tokenBudgetPerGroup(docs, col("doc_id"), col("source"),
          col("n_chars"), col("ntok"), budget = 5000L)
        .select(col("source"), col("doc_id"), col("ntok"))
    })
  )

  private val H60 = (x: String) => s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"
  private def bucket(salt: String) =
    s"${H60(s"'$salt:' || CAST(doc_id AS VARCHAR)")} % 1000000"

  val oracles: Map[String, String] = Map(
    "q97_curation_sample_split" ->
      s"""SELECT doc_id, ${bucket("split")} AS bucket,
            CASE WHEN ${bucket("split")} < 800000 THEN 'train'
                 WHEN ${bucket("split")} < 900000 THEN 'val'
                 ELSE 'test' END AS split
          FROM documents
          WHERE ${bucket("s1")} < 500000""",

    "q98_curation_token_budget" ->
      """WITH t AS (
           SELECT doc_id, source, n_chars,
             len(regexp_split_to_array(lower(trim(text)), '\s+')) AS ntok
           FROM documents),
         c AS (
           SELECT doc_id, source, ntok,
             SUM(ntok) OVER (PARTITION BY source
                             ORDER BY n_chars DESC, doc_id ASC
                             ROWS UNBOUNDED PRECEDING) AS cum
           FROM t)
         SELECT source, doc_id, CAST(ntok AS INT) AS ntok
         FROM c WHERE cum <= 5000"""
  )
}
