package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.TextVectorizers

/** Oracle-gated hashing / smart-text vectorization queries over
  * `documents` (reference OPCollectionHashingVectorizer, OpHashingTF +
  * IDF, SmartTextVectorizer TextStats dispatch). The md5-derived hash
  * family replays bit-identically in DuckDB.
  */
object TextVecQueries {

  type Q = (SparkSession, String) => DataFrame

  private val DIMS = 64

  val queries: Map[String, Q] = Map(
    "q56_text_hashed_tf" -> ((s, d) => {
      TextVectorizers.hashedTf(Tables.documents(s, d), col("doc_id"), col("text"), DIMS)
    }),

    "q57_text_tfidf" -> ((s, d) => {
      TextVectorizers.hashedTfIdf(Tables.documents(s, d), col("doc_id"), col("text"), DIMS)
        .select(col("id"), col("bucket"), round(col("tfidf"), 6).as("tfidf"))
    }),

    "q58_smart_text_decide" -> ((s, d) => {
      TextVectorizers.smartDecide(Tables.documents(s, d),
        Seq("lang", "source", "text"), maxCardinality = 50)
    }),

    // OPCollectionHashingVectorizer hash-space strategies (reference
    // OPCollectionHashingVectorizer.scala:101-145): the SAME two input
    // columns hashed into one shared name-prefixed space and into
    // per-column sub-spaces, both gated
    "q96_hash_space_strategy" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cols = Seq("text", "source")
      val sep = TextVectorizers.hashedTfMulti(docs, col("doc_id"), cols, 32,
          TextVectorizers.HashSpace.Separate)
        .select(lit("separate").as("mode"), col("id"), col("bucket"), col("cnt"))
      val sh = TextVectorizers.hashedTfMulti(docs, col("doc_id"), cols, 32,
          TextVectorizers.HashSpace.Shared)
        .select(lit("shared").as("mode"), col("id"), col("bucket"), col("cnt"))
      sep.unionByName(sh)
    }),

    // BM25 relevance over the hashed term space (RSJ idf + length
    // normalization — the retrieval weighting spark.ml lacks), and
    // top-k retrieval for a literal query
    "q135_text_bm25" -> ((s, d) => {
      TextVectorizers.bm25(Tables.documents(s, d), col("doc_id"), col("text"), DIMS)
        .select(col("id"), col("bucket"), round(col("bm25"), 6).as("bm25"))
    }),

    // end-to-end RAG retrieval: chunk the corpus with overlap, index the
    // CHUNKS with BM25, retrieve the top 20 chunks for a literal query —
    // the chunk id (doc#idx) maps hits back to source documents
    "q175_rag_retrieve" -> ((s, d) => {
      val chunks = graft.operators.Curation.chunkByTokens(
          Tables.documents(s, d), col("doc_id"), col("text"),
          chunkSize = 32, overlap = 8)
        .select(concat_ws("#", col("doc"), col("chunk_idx")).as("cid"),
          col("chunk_text"))
      TextVectorizers.bm25TopK(chunks, col("cid"), col("chunk_text"),
        query = "spark window join", dims = DIMS, k = 20)
    }),

    "q136_bm25_topk" -> ((s, d) => {
      TextVectorizers.bm25TopK(Tables.documents(s, d), col("doc_id"), col("text"),
        query = "spark window join", dims = DIMS, k = 20)
    })
  )

  private val H60 = (x: String) => s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"
  private val TF =
    s"""SELECT doc_id AS id,
          CAST(${H60("tok")} % $DIMS AS INT) AS bucket, count(*) AS cnt
        FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
              FROM documents)
        WHERE len(tok) > 0 GROUP BY 1, 2"""

  val oracles: Map[String, String] = Map(
    "q56_text_hashed_tf" -> TF,

    "q57_text_tfidf" ->
      s"""WITH tf AS ($TF),
          dfb AS (SELECT bucket, count(DISTINCT id) AS df_b FROM tf GROUP BY 1),
          n AS (SELECT count(*) AS m FROM documents)
          SELECT id, bucket, ROUND(cnt * ln((m + 1.0) / (df_b + 1.0)), 6) AS tfidf
          FROM tf JOIN dfb USING (bucket) CROSS JOIN n""",

    "q96_hash_space_strategy" ->
      s"""WITH tokt AS (
            SELECT doc_id AS id,
              unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
            FROM documents),
          toks AS (
            SELECT doc_id AS id,
              unnest(regexp_split_to_array(lower(trim(source)), '\\s+')) AS tok
            FROM documents),
          pts AS (
            SELECT 'separate' AS mode, id,
              CAST(${H60("tok")} % 32 AS INT) AS bucket
            FROM tokt WHERE len(tok) > 0
            UNION ALL
            SELECT 'separate', id, CAST(32 + ${H60("tok")} % 32 AS INT)
            FROM toks WHERE len(tok) > 0
            UNION ALL
            SELECT 'shared', id, CAST(${H60("'text:' || tok")} % 32 AS INT)
            FROM tokt WHERE len(tok) > 0
            UNION ALL
            SELECT 'shared', id, CAST(${H60("'source:' || tok")} % 32 AS INT)
            FROM toks WHERE len(tok) > 0)
          SELECT mode, id, bucket, count(*) AS cnt FROM pts GROUP BY 1, 2, 3""",

    "q58_smart_text_decide" ->
      """WITH s AS (
           SELECT 'lang' AS col_name, count(DISTINCT lang) AS n_distinct,
             AVG(CAST(len(lang) AS DOUBLE)) AS avg_len,
             VAR_SAMP(CAST(len(lang) AS DOUBLE)) AS len_var
           FROM documents
           UNION ALL
           SELECT 'source', count(DISTINCT source),
             AVG(CAST(len(source) AS DOUBLE)), VAR_SAMP(CAST(len(source) AS DOUBLE))
           FROM documents
           UNION ALL
           SELECT 'text', count(DISTINCT text),
             AVG(CAST(len(text) AS DOUBLE)), VAR_SAMP(CAST(len(text) AS DOUBLE))
           FROM documents)
         SELECT col_name, n_distinct,
           ROUND(avg_len, 6) AS avg_len, ROUND(len_var, 6) AS len_var,
           CASE WHEN n_distinct <= 50 THEN 'pivot'
                WHEN len_var > 0 THEN 'hash'
                ELSE 'ignore' END AS decision
         FROM s""",

    "q135_text_bm25" ->
      s"""WITH tf AS ($TF),
          dl AS (SELECT id, sum(cnt) AS dl FROM tf GROUP BY 1),
          dfb AS (SELECT bucket, count(DISTINCT id) AS df_b FROM tf GROUP BY 1),
          n AS (SELECT count(*) AS m FROM documents),
          t AS (SELECT sum(cnt) AS toks FROM tf)
          SELECT tf.id, tf.bucket,
            ROUND(ln((m - df_b + 0.5) / (df_b + 0.5) + 1.0)
                  * (cnt * 2.2)
                  / (cnt + 1.2 * (1.0 - 0.75 + 0.75 * dl / (toks / m))), 6) AS bm25
          FROM tf JOIN dl USING (id) JOIN dfb USING (bucket)
          CROSS JOIN n CROSS JOIN t""",

    "q175_rag_retrieve" ->
      s"""WITH t0 AS (
            SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM documents),
          u AS (SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS st FROM t0),
          chunks AS (
            SELECT CAST(doc_id AS VARCHAR) || '#' || CAST(st // 24 AS VARCHAR) AS id,
              array_to_string(toks[CAST(st + 1 AS INT):CAST(st + 32 AS INT)], ' ') AS ctext
            FROM u),
          tf AS (
            SELECT id, CAST(${H60("tok")} % $DIMS AS INT) AS bucket, count(*) AS cnt
            FROM (SELECT id, unnest(regexp_split_to_array(lower(trim(ctext)), '\\s+')) AS tok
                  FROM chunks)
            WHERE len(tok) > 0 GROUP BY 1, 2),
          dl AS (SELECT id, sum(cnt) AS dl FROM tf GROUP BY 1),
          dfb AS (SELECT bucket, count(DISTINCT id) AS df_b FROM tf GROUP BY 1),
          n AS (SELECT count(*) AS m FROM chunks),
          t AS (SELECT sum(cnt) AS toks FROM tf),
          qb AS (SELECT DISTINCT CAST(${H60("tok")} % $DIMS AS INT) AS bucket
                 FROM (SELECT unnest(['spark', 'window', 'join']) AS tok)),
          scores AS (
            SELECT tf.id,
              ROUND(sum(ln((m - df_b + 0.5) / (df_b + 0.5) + 1.0)
                    * (cnt * 2.2)
                    / (cnt + 1.2 * (1.0 - 0.75 + 0.75 * dl / (toks / m)))), 6) AS score
            FROM tf JOIN dl USING (id) JOIN dfb USING (bucket)
            CROSS JOIN n CROSS JOIN t
            WHERE tf.bucket IN (SELECT bucket FROM qb)
            GROUP BY 1)
          SELECT id, score FROM scores ORDER BY score DESC, id ASC LIMIT 20""",

    "q136_bm25_topk" ->
      s"""WITH tf AS ($TF),
          dl AS (SELECT id, sum(cnt) AS dl FROM tf GROUP BY 1),
          dfb AS (SELECT bucket, count(DISTINCT id) AS df_b FROM tf GROUP BY 1),
          n AS (SELECT count(*) AS m FROM documents),
          t AS (SELECT sum(cnt) AS toks FROM tf),
          qb AS (SELECT DISTINCT CAST(${H60("tok")} % $DIMS AS INT) AS bucket
                 FROM (SELECT unnest(['spark', 'window', 'join']) AS tok)),
          scores AS (
            SELECT tf.id,
              ROUND(sum(ln((m - df_b + 0.5) / (df_b + 0.5) + 1.0)
                    * (cnt * 2.2)
                    / (cnt + 1.2 * (1.0 - 0.75 + 0.75 * dl / (toks / m)))), 6) AS score
            FROM tf JOIN dl USING (id) JOIN dfb USING (bucket)
            CROSS JOIN n CROSS JOIN t
            WHERE tf.bucket IN (SELECT bucket FROM qb)
            GROUP BY 1)
          SELECT id, score FROM scores ORDER BY score DESC, id ASC LIMIT 20"""
  )
}
