package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class AvroIOSpec extends SparkSpec {

  private val tmp = "/tmp/graft_avro_spec"

  test("roundtrip preserves primitives, nulls, timestamps, dates, decimals") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("flag", BooleanType, nullable = true),
      StructField("small", IntegerType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("day", DateType, nullable = true),
      StructField("amt", DecimalType(12, 2), nullable = true),
      StructField("blob", BinaryType, nullable = true)))
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, 7,
        Timestamp.valueOf("2024-01-02 03:04:05.123456"),
        java.sql.Date.valueOf("2024-01-02"),
        new java.math.BigDecimal("12345.67"), Array[Byte](1, 2, 3)),
      Row(2L, null, null, null, null, null, null, null, null),
      Row(3L, "", -0.0, false, -1,
        Timestamp.valueOf("1969-12-31 23:59:59.999999"),
        java.sql.Date.valueOf("1969-12-31"),
        new java.math.BigDecimal("-0.01"), Array[Byte]()))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    AvroIO.writeAvro(df, s"$tmp/prims")
    val back = AvroIO.readAvro(spark, s"$tmp/prims")
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val a = df.orderBy("id").collect()
    val b = back.orderBy("id").collect()
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) =>
      (0 until x.length).foreach { i =>
        (x.get(i), y.get(i)) match {
          case (xa: Array[Byte], ya: Array[Byte]) => assert(xa.sameElements(ya))
          case (xv, yv) => assert(xv === yv, s"field $i")
        }
      }
    }
  }

  test("roundtrip preserves arrays, maps, and nested records") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tags", ArrayType(StringType), nullable = true),
      StructField("counts", MapType(StringType, LongType), nullable = true),
      StructField("inner", StructType(Seq(
        StructField("a", IntegerType, nullable = true),
        StructField("b", StringType, nullable = true))), nullable = true)))
    val rows = Seq(
      Row(1L, Seq("x", "y"), Map("k1" -> 10L, "k2" -> 20L), Row(5, "in")),
      Row(2L, Seq.empty[String], Map.empty[String, Long], Row(null, null)),
      Row(3L, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    AvroIO.writeAvro(df, s"$tmp/nested")
    val back = AvroIO.readAvro(spark, s"$tmp/nested").orderBy("id").collect()
    assert(back(0).getSeq[String](1) === Seq("x", "y"))
    assert(back(0).getMap[String, Long](2) === Map("k1" -> 10L, "k2" -> 20L))
    assert(back(0).getStruct(3) === Row(5, "in"))
    assert(back(1).getSeq[String](1) === Seq.empty)
    assert(back(2).isNullAt(1) && back(2).isNullAt(2) && back(2).isNullAt(3))
  }

  test("streaming file-watch source decodes container files to the batch answer") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = s"$tmp/stream"
    val df = spark.range(0, 1000, 1, 4)
      .select(col("id"), (col("id") % 7).cast("string").as("k"),
        (col("id") * 2).cast("double").as("v"))
    AvroIO.writeAvro(df, dir)
    val schema = AvroIO.firstFileSchema(spark, dir)
    val agg = AvroIO.readAvroStream(spark, dir, schema)
      .groupBy("k").agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).cast("double").as("sv"))
    val q = agg.writeStream.format("memory").queryName("avro_stream_spec")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("avro_stream_spec").orderBy("k").collect()
    val want = df.groupBy("k").agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).cast("double").as("sv"))
      .orderBy("k").collect()
    assert(got.toSeq === want.toSeq)
  }

  test("read parallelism follows file splits, not a single task") {
    val df = spark.range(0, 100, 1, 8).select(col("id"))
    AvroIO.writeAvro(df, s"$tmp/parts")
    // 8 input partitions -> 8 container files -> >= 8 read tasks
    assert(AvroIO.readAvro(spark, s"$tmp/parts").rdd.getNumPartitions >= 8)
  }
}
