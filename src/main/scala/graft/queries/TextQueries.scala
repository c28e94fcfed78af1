package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextAnalysis._

/** Oracle-gated text-analysis queries over the `documents` table:
  * token counting, quality scoring, n-gram language ID, and md5-based
  * fingerprinting. Every formula is mirrored verbatim in the DuckDB
  * oracle (both engines ship bit-identical md5 and compatible regex
  * classes), so even the "heuristic" ops get exact differential checks.
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  private val sw = englishStopwords.map(w => s"'$w'").mkString(", ")

  val queries: Map[String, Q] = Map(
    "q18_text_token_counts" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        bpeTokenCount(col("text")).as("n_bpe_tokens"),
        round(meanTokenLength(col("text")), 6).as("mean_token_len"))
    }),

    "q19_text_quality" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        length(col("text")).as("n_chars_actual"),
        round(punctRatio(col("text")), 6).as("punct_ratio"),
        round(stopwordRatio(col("text")), 6).as("stopword_ratio"),
        round(uppercaseRatio(col("text")), 6).as("upper_ratio"),
        round(qualityScore(col("text")), 6).as("quality"))
    }),

    "q20_text_langid" -> ((s, d) => {
      val scored = Tables.documents(s, d).select(
        col("doc_id") +: col("lang").as("lang_label") +:
        languageScores(col("text")).map { case (l, c) => c.as(s"s_$l") }: _*)
      scored.select(col("doc_id"), col("lang_label"),
        col("s_de"), col("s_en"), col("s_es"), col("s_fr"), col("s_zh"),
        {
          val m = greatest(col("s_de"), col("s_en"), col("s_es"), col("s_fr"), col("s_zh"))
          when(m === 0, "und")
            .when(col("s_de") === m, "de").when(col("s_en") === m, "en")
            .when(col("s_es") === m, "es").when(col("s_fr") === m, "fr")
            .when(col("s_zh") === m, "zh")
        }.as("lang_pred"))
    }),

    "q21_text_fingerprint" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        contentHash(col("text")).as("content_md5"),
        hash60(col("text")).as("content_h60"),
        minShingleHash(col("text"), 8).as("min_shingle_h60"))
    })
  )

  private def scoreSql(lang: String): String = {
    val words = stopwordProfiles.toMap.apply(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t IN ($words)))"
  }

  val oracles: Map[String, String] = Map(
    "q18_text_token_counts" ->
      """SELECT doc_id,
           len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tokens,
           len(regexp_extract_all(text, '[\p{L}]+|[0-9]+|[^\s\p{L}0-9]')) AS n_bpe_tokens,
           ROUND(CAST(list_sum(list_transform(regexp_split_to_array(lower(trim(text)), '\s+'), t -> length(t))) AS DOUBLE)
                 / len(regexp_split_to_array(lower(trim(text)), '\s+')), 6) AS mean_token_len
         FROM documents""",

    "q19_text_quality" ->
      s"""WITH t AS (
           SELECT doc_id, length(text) AS n_chars_actual,
             CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE)
               / nullif(length(text), 0) AS pr,
             CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x IN ($sw))) AS DOUBLE)
               / nullif(len(regexp_split_to_array(lower(trim(text)), '\\s+')), 0) AS sw_r,
             CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
               / nullif(length(regexp_replace(text, '[^A-Za-z]', '', 'g')), 0) AS up_r,
             len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS toks
           FROM documents)
         SELECT doc_id, n_chars_actual,
           ROUND(pr, 6) AS punct_ratio,
           ROUND(sw_r, 6) AS stopword_ratio,
           ROUND(up_r, 6) AS upper_ratio,
           ROUND(0.4 * least(1.0, toks / 100.0) + 0.4 * least(1.0, sw_r * 4.0)
                 + 0.2 * (1.0 - least(1.0, pr * 4.0)), 6) AS quality
         FROM t""",

    "q20_text_langid" ->
      s"""WITH t AS (
           SELECT doc_id, lang AS lang_label,
             ${scoreSql("de")} AS s_de, ${scoreSql("en")} AS s_en,
             ${scoreSql("es")} AS s_es, ${scoreSql("fr")} AS s_fr,
             ${scoreSql("zh")} AS s_zh
           FROM documents)
         SELECT doc_id, lang_label, s_de, s_en, s_es, s_fr, s_zh,
           CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
                WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
                WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
                WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
                WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
                ELSE 'zh' END AS lang_pred
         FROM t""",

    "q21_text_fingerprint" ->
      """SELECT doc_id, md5(text) AS content_md5,
           CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS content_h60,
           list_min(list_transform(
             range(1, greatest(length(text) - 7, 1) + 1),
             i -> CAST(('0x' || substr(md5(substr(text, CAST(i AS INT), 8)), 1, 15)) AS BIGINT)
           )) AS min_shingle_h60
         FROM documents"""
  )
}
