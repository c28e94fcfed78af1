package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed storage for co-located joins and aggregations (SURVEY §4 /
  * the 100 TB shuffle-elimination path): write a table hash-bucketed
  * (and sorted) on its join key, and joins or groupBys on that key read
  * each bucket as a pre-partitioned, pre-sorted split — no Exchange, no
  * Sort in the plan. At 100 TB this converts every repeated fact-to-fact
  * join on the same key from a full shuffle into a zip of bucket files.
  *
  * (The reference has no storage layer of its own — repartition hints,
  * DataReader.scala:146-165, are its closest analog; bucketing is the
  * Spark-native superset.)
  */
object Bucketing {

  /** Write `df` bucketed+sorted by `key` into `buckets` buckets as an
    * external table at `path`, registered as `table` in the session
    * catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    path: String): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata only survives through
    * the catalog, not a bare parquet path read). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
