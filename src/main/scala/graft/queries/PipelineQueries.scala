package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextAnalysis.hash60

/** Oracle-gated pipeline/ETL composition operators added in round 6:
  * FIFO two-stream matching, multi-tier match-waterfall enrichment,
  * and related allocation/audit shapes. Everything folds in exact
  * integers/decimals so the DuckDB replay hash-matches; every join is
  * an equi-join on a well-distributed key (partkey / bucket) or a
  * broadcast of a bounded dimension, so the shapes hold at 100 TB.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  private val H60 = (x: String) => s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"

  private def qty(c: Column): Column = c.cast("decimal(12,2)")

  val queries: Map[String, Q] = Map(
    // FIFO two-stream matching: per part, demand lineitems (flag <> 'R')
    // consume supply lineitems (returned stock, flag = 'R') in shipdate
    // order — the lot-allocation / payment-application primitive. Each
    // stream becomes a run of half-open quantity intervals via a dual
    // prefix sum ([cum-qty, cum+qty) per row); matched quantity is the
    // interval overlap, so the whole match is ONE equi-join on partkey
    // plus a row-local overlap predicate — never a theta join, and the
    // per-part interval chains keep output linear in input rows. Scale:
    // both windows and the join shuffle on partkey once; AQE handles any
    // hot part.
    "q375_fifo_match" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_partkey"),
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        qty(col("l_quantity")).as("q"), col("l_shipdate"))
      val w = Window.partitionBy(col("l_partkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def stream(df: DataFrame, p: String): DataFrame = df
        .withColumn("hi", sum(col("q")).over(w))
        .select(col("l_partkey"),
          col("l_orderkey").as(s"${p}_orderkey"),
          col("l_linenumber").as(s"${p}_linenumber"),
          (col("hi") - col("q")).as(s"${p}_lo"), col("hi").as(s"${p}_hi"))
      val sup = stream(li.where(col("l_returnflag") === "R"), "s")
      val dem = stream(li.where(col("l_returnflag") =!= "R"), "d")
      sup.join(dem, Seq("l_partkey"))
        .where(col("s_lo") < col("d_hi") && col("d_lo") < col("s_hi"))
        .select(col("l_partkey"), col("s_orderkey"), col("s_linenumber"),
          col("d_orderkey"), col("d_linenumber"),
          (least(col("s_hi"), col("d_hi")) -
           greatest(col("s_lo"), col("d_lo"))).cast("double").as("qty_matched"))
    }),

    // Match-waterfall enrichment: a deterministic md5-selected probe set
    // (20% of parts, half with the name mangled down to its last token)
    // resolves against the part dimension through tiered keys — tier 1
    // exact name, tier 2 last-token (noun) fallback — first match wins,
    // min-partkey tiebreak within a tier. Both tier dimensions are
    // pre-aggregated to one row per key and broadcast, so the waterfall
    // is two broadcast joins + one coalesce, no matter how many probes.
    "q376_waterfall_join" -> ((s, d) => {
      val part = Tables.part(s, d)
      val probes = part
        .where(pmod(hash60(concat(lit("wfprobe:"), col("p_partkey"))), lit(5L)) === 0L)
        .select(col("p_partkey").as("probe_id"),
          when(pmod(hash60(concat(lit("wfmangle:"), col("p_partkey"))), lit(2L)) === 0L,
            col("p_name"))
            .otherwise(element_at(split(col("p_name"), " "), -1))
            .as("probe_name"))
      val byName = part.groupBy(col("p_name").as("k1"))
        .agg(min(col("p_partkey")).as("m1"))
      val byNoun = part.groupBy(element_at(split(col("p_name"), " "), -1).as("k2"))
        .agg(min(col("p_partkey")).as("m2"))
      probes
        .join(broadcast(byName), col("probe_name") === col("k1"), "left")
        .join(broadcast(byNoun),
          element_at(split(col("probe_name"), " "), -1) === col("k2"), "left")
        .select(col("probe_id"), col("probe_name"),
          coalesce(col("m1"), col("m2")).as("matched_partkey"),
          when(col("m1").isNotNull, lit(1))
            .when(col("m2").isNotNull, lit(2)).otherwise(lit(0)).as("tier"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q375_fifo_match" ->
      """WITH li AS (SELECT l_partkey, l_orderkey, l_linenumber, l_returnflag,
                            CAST(l_quantity AS DECIMAL(12,2)) AS q, l_shipdate
                     FROM lineitem),
          sup AS (SELECT l_partkey, l_orderkey AS s_orderkey,
                         l_linenumber AS s_linenumber,
                         sum(q) OVER w - q AS s_lo, sum(q) OVER w AS s_hi
                  FROM li WHERE l_returnflag = 'R'
                  WINDOW w AS (PARTITION BY l_partkey
                               ORDER BY l_shipdate, l_orderkey, l_linenumber
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          dem AS (SELECT l_partkey, l_orderkey AS d_orderkey,
                         l_linenumber AS d_linenumber,
                         sum(q) OVER w - q AS d_lo, sum(q) OVER w AS d_hi
                  FROM li WHERE l_returnflag <> 'R'
                  WINDOW w AS (PARTITION BY l_partkey
                               ORDER BY l_shipdate, l_orderkey, l_linenumber
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT sup.l_partkey, s_orderkey, s_linenumber, d_orderkey, d_linenumber,
                CAST(least(s_hi, d_hi) - greatest(s_lo, d_lo) AS DOUBLE)
                  AS qty_matched
         FROM sup JOIN dem ON sup.l_partkey = dem.l_partkey
         WHERE s_lo < d_hi AND d_lo < s_hi""",

    "q376_waterfall_join" -> {
      val hp = H60("'wfprobe:' || CAST(p_partkey AS VARCHAR)")
      val hm = H60("'wfmangle:' || CAST(p_partkey AS VARCHAR)")
      s"""WITH probes AS (
            SELECT p_partkey AS probe_id,
                   CASE WHEN $hm % 2 = 0 THEN p_name
                        ELSE string_split(p_name, ' ')[-1] END AS probe_name
            FROM part WHERE $hp % 5 = 0),
          by_name AS (SELECT p_name AS k1, min(p_partkey) AS m1
                      FROM part GROUP BY 1),
          by_noun AS (SELECT string_split(p_name, ' ')[-1] AS k2,
                             min(p_partkey) AS m2
                      FROM part GROUP BY 1)
         SELECT probe_id, probe_name,
                coalesce(m1, m2) AS matched_partkey,
                CASE WHEN m1 IS NOT NULL THEN 1
                     WHEN m2 IS NOT NULL THEN 2 ELSE 0 END AS tier
         FROM probes
         LEFT JOIN by_name ON probe_name = k1
         LEFT JOIN by_noun ON string_split(probe_name, ' ')[-1] = k2"""
    }
  )
}
