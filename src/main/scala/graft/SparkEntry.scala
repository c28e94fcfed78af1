package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the oracle-gated query modules under
  * graft.queries.*; each entry exercises one operator family from
  * SURVEY §2 through the graft library (sources / aggregators /
  * functions / operators packages).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.queries, RelationalQueries.oracles),
      (TextQueries.queries, TextQueries.oracles),
      (DedupQueries.queries, DedupQueries.oracles),
      (SimilarityQueries.queries, SimilarityQueries.oracles),
      (FeatureQueries.queries, FeatureQueries.oracles),
      (WorkflowQueries.queries, WorkflowQueries.oracles),
      (QualityQueries.queries, QualityQueries.oracles),
      (MapQueries.queries, MapQueries.oracles),
      (TextVecQueries.queries, TextVecQueries.oracles),
      (ReaderQueries.queries, ReaderQueries.oracles),
      (CurationQueries.queries, CurationQueries.oracles),
      (OlapQueries.queries, OlapQueries.oracles),
      (MiningQueries.queries, MiningQueries.oracles),
      (StatsQueries.queries, StatsQueries.oracles),
      (AnalyticsQueries.queries, AnalyticsQueries.oracles),
      (PipelineQueries.queries, PipelineQueries.oracles),
      (InferenceQueries.queries, InferenceQueries.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q03_agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}
