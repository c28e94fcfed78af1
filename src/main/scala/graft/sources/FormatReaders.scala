package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV / JSON sources and sinks (SURVEY §2.1: CSVReader
  * readers/.../CSVReaders.scala:54-84, CSVAutoReader with header-driven
  * schema inference CSVAutoReaders.scala:57-99, sinks
  * RichDataset.scala:218). Thin, declarative wrappers over
  * DataFrameReader/Writer so Catalyst keeps pushdown; explicit-schema
  * reads avoid the double-scan that inferSchema costs at 100 TB.
  */
object FormatReaders {

  /** CSVReader analog: explicit schema — single pass, no inference scan. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** CSVAutoReader analog: header + inference (costs an extra scan of a
    * sample; acceptable for exploration, not for the 100 TB hot path). */
  def readCsvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC source/sink (the columnar alternative the reference's Avro I/O
    * would map to where Avro jars are unavailable): native Spark ORC —
    * vectorized scan, predicate pushdown and column pruning all apply,
    * same as parquet. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** CSVProductReader analog (reference CSVProductReaders.scala:49-75):
    * typed `Dataset[T]` straight from CSV; schema derived from the
    * case-class encoder so there is no inference scan. */
  def readCsvAs[T: org.apache.spark.sql.Encoder](spark: SparkSession, path: String)
      : org.apache.spark.sql.Dataset[T] = {
    val enc = implicitly[org.apache.spark.sql.Encoder[T]]
    spark.read.schema(enc.schema).option("header", "true").csv(path).as[T]
  }

  /** ParquetProductReader analog (ParquetProductReader.scala:47-66):
    * typed `Dataset[T]` from parquet — columns pruned to the encoder's
    * fields so the scan reads only what the type needs. */
  def readParquetAs[T: org.apache.spark.sql.Encoder](spark: SparkSession, path: String)
      : org.apache.spark.sql.Dataset[T] = {
    val enc = implicitly[org.apache.spark.sql.Encoder[T]]
    val cols = enc.schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq
    spark.read.parquet(path).select(cols: _*).as[T]
  }

  /** Schema-evolution read: union the schemas of every footer under
    * `paths` (columns missing from older files come back null). The
    * per-file footer merge is a driver-side metadata pass; the data
    * scan is unchanged — this is how a 100 TB table that gained
    * columns over months reads as ONE frame without a backfill. */
  def readParquetMerged(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
}
