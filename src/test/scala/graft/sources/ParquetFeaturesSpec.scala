package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Parquet sink scale features: column bloom filters (the footer
  * structure brokers use for point-lookup pruning at 100 TB) and
  * row-group min/max statistics (the zone maps q382 audits), plus
  * filter pushdown on read-back. Asserted against the actual footer via
  * parquet-hadoop, not just write options. */
class ParquetFeaturesSpec extends SparkSpec {

  test("parquet sink writes bloom filters + row-group stats; reads push filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pqf").toString
    // parquet-mr skips the bloom when a column ends fully
    // dictionary-encoded (the dictionary is already an exact filter), so
    // the spec disables dictionary encoding for the bloom column to
    // exercise the real high-NDV path
    Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_partkey"), col("l_orderkey"), col("l_quantity"))
      .coalesce(1).write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#l_partkey", "true")
      .option("parquet.bloom.filter.expected.ndv#l_partkey", "1000")
      .option("parquet.enable.dictionary#l_partkey", "false")
      .parquet(dir)

    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.getAbsolutePath),
      spark.sparkContext.hadoopConfiguration)
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val rg = rdr.getFooter.getBlocks.get(0)
      val cols = rg.getColumns.asScala
      val pk = cols.find(_.getPath.toDotString == "l_partkey").get
      assert(rdr.getBloomFilterDataReader(rg).readBloomFilter(pk) != null,
        "bloom filter missing for l_partkey")
      val noBloom = cols.find(_.getPath.toDotString == "l_orderkey").get
      assert(rdr.getBloomFilterDataReader(rg).readBloomFilter(noBloom) == null,
        "bloom filter written for a column that did not ask for one")
      val st = pk.getStatistics
      assert(st != null && st.hasNonNullValue,
        "row-group min/max statistics missing for l_partkey")
    } finally rdr.close()

    val p = spark.read.parquet(dir).where(col("l_partkey") === 42L)
      .queryExecution.executedPlan.toString
    assert(p.contains("EqualTo(l_partkey,42)"),
      p.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
  }
}
