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
    }),

    // Reciprocal-rank fusion: the hybrid-retrieval combiner. Lexical
    // ranking = BM25 top-50 for the literal query; semantic ranking =
    // exact cosine top-50 against the doc-0 query embedding (documents
    // link to `embeddings` by vec_id = doc_id). RRF(id) =
    // sum 1/(60 + rank_i) over the lists containing id, kept EXACT as a
    // rational: with both ranks present it is (120+ra+rb)/((60+ra)(60+rb))
    // — integer numerator/denominator, so the fused score is ONE IEEE
    // division of exact ints and the final ordering replays bit-stable
    // cross-engine. Both rank lists are bounded (<= 50 rows), so the
    // fusion join and the rank windows run on k-row frames regardless of
    // corpus size.
    "q378_rrf_fusion" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val lex = TextVectorizers.bm25TopK(docs, col("doc_id"), col("text"),
          query = "spark window join", dims = DIMS, k = 50)
        .select(col("id"), row_number().over(
          Window.orderBy(col("score").desc, col("id").asc)).as("ra"))
      val corpus = Tables.embeddings(s, d)
        .join(docs.select(col("doc_id")), col("vec_id") === col("doc_id"))
        .select(col("vec_id"), col("embedding"))
      val sem = graft.operators.Similarity
        .bruteForceTopK(corpus, corpus.where(col("vec_id") === 0L), 50)
        .select(col("neighbor_id").as("id"), col("rank").as("rb"))
      val both = col("ra").isNotNull && col("rb").isNotNull
      val fused = lex.join(sem, Seq("id"), "full_outer")
        .select(col("id").as("doc_id"), col("ra").as("rank_bm25"),
          col("rb").as("rank_cos"),
          (when(both, lit(120) + col("ra") + col("rb")).otherwise(lit(1))
             .cast("double") /
           when(both, (lit(60) + col("ra")) * (lit(60) + col("rb")))
             .when(col("ra").isNotNull, lit(60) + col("ra"))
             .otherwise(lit(60) + col("rb")).cast("double")).as("rrf"))
      fused
        .withColumn("rank_fused", row_number().over(
          Window.orderBy(col("rrf").desc, col("doc_id").asc)))
        .where(col("rank_fused") <= 20)
    })
  )

  private val H60 = (x: String) => s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"
  /** Sequential dot product of two double-list expressions (left-to-
    * right fold — matches Similarity.dotFast bit-for-bit). */
  private def dotSql(a: String, b: String) =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[CAST(i AS INT)] * $b[CAST(i AS INT)]))"
  private def cosSql(a: String, b: String) =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
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
          SELECT id, score FROM scores ORDER BY score DESC, id ASC LIMIT 20""",

    "q378_rrf_fusion" ->
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
                    / (cnt + 1.2 * (1.0 - 0.75 + 0.75 * dl / (toks / m)))), 6)
                AS score
            FROM tf JOIN dl USING (id) JOIN dfb USING (bucket)
            CROSS JOIN n CROSS JOIN t
            WHERE tf.bucket IN (SELECT bucket FROM qb)
            GROUP BY 1),
          s50 AS (SELECT id, score FROM scores
                  ORDER BY score DESC, id ASC LIMIT 50),
          lex AS (SELECT id, CAST(row_number() OVER (ORDER BY score DESC, id)
                    AS INT) AS ra
                  FROM s50),
          e AS (SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                FROM embeddings JOIN documents ON vec_id = doc_id),
          q AS (SELECT * FROM e WHERE vec_id = 0),
          sc AS (SELECT c.vec_id AS id, ${cosSql("q.emb", "c.emb")} AS cos
                 FROM e c CROSS JOIN q WHERE c.vec_id <> q.vec_id),
          semr AS (SELECT id, CAST(row_number() OVER (ORDER BY cos DESC, id)
                     AS INT) AS rb
                   FROM sc),
          sem AS (SELECT id, rb FROM semr WHERE rb <= 50),
          f AS (SELECT coalesce(l.id, s.id) AS doc_id, ra, rb,
                  CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
                       THEN 120 + ra + rb ELSE 1 END AS num,
                  CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
                       THEN (60 + ra) * (60 + rb)
                       WHEN ra IS NOT NULL THEN 60 + ra
                       ELSE 60 + rb END AS den
                FROM lex l FULL OUTER JOIN sem s ON l.id = s.id),
          g AS (SELECT doc_id, ra AS rank_bm25, rb AS rank_cos,
                       CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS rrf
                FROM f)
         SELECT doc_id, rank_bm25, rank_cos, rrf,
                CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT)
                  AS rank_fused
         FROM g QUALIFY rank_fused <= 20"""
  )
}
