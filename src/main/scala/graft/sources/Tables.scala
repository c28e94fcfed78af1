package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided synthetic star schema (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst keeps predicate
  * pushdown / column pruning; never cache here — callers decide.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    * only accepts as Long (spark.sql.legacy.parquet.nanosAsLong=true, set
    * in GraftSession/Verify/Bench). Convert nanos → micros timestamp here
    * (integer div — nanos exceed 2^53 so double math would lose precision);
    * DuckDB reads the same file by truncating to micros, so the two agree.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = apply(spark, dir, "events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))

  /** Spread a compute-heavy pipeline across the session's shuffle
    * parallelism when the upstream SCAN under-partitions it — the
    * single-row-group parquet files the driver ships are unsplittable,
    * so Spark reads each as ONE task and everything pipelined into the
    * scan stage (tokenization, hashing, per-row model math) runs on one
    * core (the optimization guide's §2.5 "unsplittable input" fix:
    * repartition immediately after the read).
    *
    * Scale-adaptive, not a local[32] constant: a cluster-scale table
    * arrives as thousands of scan partitions, the condition fails, and
    * NO extra shuffle is paid — only parallelism-starved inputs pay the
    * one narrow exchange. Callers must pass a SCAN-ROOTED frame
    * (projection/filter over a read, no upstream exchange): the
    * partition probe walks the physical plan, and an upstream shuffle
    * would both defeat the probe and make the spread redundant. Project
    * BEFORE calling so the exchange carries only the needed columns
    * (guide §2.3). */
  def spreadIfNarrow(df: DataFrame): DataFrame = {
    // numShufflePartitions is always numeric (resolves 'auto'/defaults),
    // and toRdd probes partitioning without building the deserializer
    // plan a .rdd QueryExecution would pay per call
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.queryExecution.toRdd.getNumPartitions < n) df.repartition(n) else df
  }
}
