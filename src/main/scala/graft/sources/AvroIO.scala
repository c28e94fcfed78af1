package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericFixed, GenericRecord}
import org.apache.avro.mapred.{AvroKey, FsInput}
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source / sink / streaming source (SURVEY §2.1:
  * the reference's default interchange format — AvroReader
  * readers/src/main/scala/com/salesforce/op/readers/AvroReaders.scala:55-76,
  * sink features/.../utils/spark/RichDataset.scala:218, streaming
  * file-watch AvroReaders.scala:110-128).
  *
  * Spark-first shape: the container ships no spark-avro connector, but
  * avro + avro-mapred ARE on the Spark classpath, and the reference
  * itself reads `RDD[GenericRecord]` through `AvroKeyInputFormat` — so
  * the batch source is one `newAPIHadoopFile` per-partition decode into
  * `Row`s under an explicit Catalyst schema (file splits = partitions,
  * so a 100 TB directory parallelizes by HDFS block exactly like the
  * reference's RDD path), and the sink is the mirror-image
  * `AvroKeyOutputFormat` save. Conversion is a converter TREE built
  * once per partition from the schema — no per-value reflection.
  *
  * The streaming source rides Structured Streaming's `binaryFile`
  * file-watch source (checkpointable, exactly-once file tracking for
  * free) and decodes each discovered container file in a `flatMap`:
  * Avro object-container files are self-delimiting, so whole-file
  * decode per discovered file is the natural unit — same contract as
  * the reference's `FileStreamingAvroReader` (new files in a watched
  * directory become records), minus the hand-rolled DStream plumbing.
  *
  * Schema subset: primitives, nullable unions [null, T], enum/fixed,
  * arrays, string-keyed maps, nested records, and the date /
  * timestamp-micros|millis / decimal logical types — unions of
  * multiple non-null branches fail loudly rather than guessing.
  */
object AvroIO {

  // ---------------------------------------------------------------- read

  /** Batch read of `path` (file, directory, or glob) into a DataFrame.
    * Schema comes from the FIRST file's writer schema — one footer
    * read, no inference scan of the data. */
  def readAvro(spark: SparkSession, path: String): DataFrame = {
    val avroSchema = firstFileSchema(spark, path)
    readAvro(spark, path, avroSchema)
  }

  def readAvro(spark: SparkSession, path: String, avroSchema: Schema): DataFrame = {
    val sparkSchema = toSparkType(avroSchema).asInstanceOf[StructType]
    val schemaJson = avroSchema.toString
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    // pin the reader schema so every split decodes with the same view
    conf.set("avro.schema.input.key", schemaJson)
    val rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        conf)
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        val conv = recordToRow(schema)
        // the input format reuses the AvroKey holder: convert to Row
        // before the iterator advances (no raw-record buffering)
        it.map { case (k, _) => conv(k.datum()) }
      }
    spark.createDataFrame(rdd, sparkSchema)
  }

  /** Structured-Streaming file-watch Avro source: new `*.avro` files
    * appearing under `dir` are decoded whole-file into rows of
    * `avroSchema`. Offsets/exactly-once come from the binaryFile
    * source's file tracking; `maxFilesPerTrigger` bounds batch size. */
  def readAvroStream(spark: SparkSession, dir: String, avroSchema: Schema,
                     maxFilesPerTrigger: Int = 100): DataFrame = {
    val sparkSchema = toSparkType(avroSchema).asInstanceOf[StructType]
    val schemaJson = avroSchema.toString
    // binaryFile's schema is fixed, but streaming sources still demand
    // it be declared explicitly
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val bin = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.avro")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
      .select("content")
    implicit val enc = Encoders.row(sparkSchema)
    bin.flatMap { fileRow =>
      val bytes = fileRow.getAs[Array[Byte]]("content")
      val schema = new Schema.Parser().parse(schemaJson)
      val conv = recordToRow(schema)
      val reader = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(bytes),
        new GenericDatumReader[GenericRecord](schema))
      try reader.iterator().asScala.map(conv).toVector
      finally reader.close()
    }
  }

  // --------------------------------------------------------------- write

  /** Write `df` as Avro container files (one per partition) under
    * `path`, schema derived from the DataFrame schema. Overwrites. */
  def writeAvro(df: DataFrame, path: String, recordName: String = "graft_record"): Unit = {
    val avroSchema = toAvroSchema(df.schema, recordName)
    val schemaJson = avroSchema.toString
    val sc = df.sparkSession.sparkContext
    val p = new HPath(path)
    val fs = FileSystem.get(p.toUri, sc.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val job = Job.getInstance(sc.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, avroSchema)
    val fields = df.schema
    df.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val conv = rowToRecord(schema, fields)
      it.map(r => (new AvroKey[GenericRecord](conv(r)), NullWritable.get()))
    }.saveAsNewAPIHadoopFile(
      path,
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Single local container file (driver-side, small frames: fixtures,
    * streaming-source seeds). */
  def writeLocalFile(rows: Seq[Row], schema: StructType, file: String,
                     recordName: String = "graft_record"): Unit = {
    val avroSchema = toAvroSchema(schema, recordName)
    val conv = rowToRecord(avroSchema, schema)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    val f = new java.io.File(file)
    Option(f.getParentFile).foreach(_.mkdirs())
    w.create(avroSchema, f)
    try rows.foreach(r => w.append(conv(r)))
    finally w.close()
  }

  // ------------------------------------------------------ schema mapping

  /** Writer schema of the first `*.avro` file matching `path` (plain
    * file, directory, or glob — globStatus resolves all three). */
  def firstFileSchema(spark: SparkSession, path: String): Schema = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new HPath(path)
    val fs = FileSystem.get(p.toUri, conf)
    val matched = Option(fs.globStatus(p)).getOrElse(Array.empty)
    val stat = matched
      .flatMap(st =>
        if (st.isFile) Seq(st)
        else fs.listStatus(st.getPath)
          .filter(x => x.isFile && x.getPath.getName.endsWith(".avro")).toSeq)
      .sortBy(_.getPath.toString)
      .headOption
      .getOrElse(throw new IllegalArgumentException(s"no .avro files under $path"))
    val in = new FsInput(stat.getPath, conf)
    val reader = new DataFileReader[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try reader.getSchema
    finally { reader.close(); in.close() }
  }

  /** Avro → Catalyst type. */
  def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "date") DateType
      else IntegerType
    case Schema.Type.LONG => s.getLogicalType match {
      case lt if lt != null && lt.getName.startsWith("timestamp-") => TimestampType
      case _ => LongType
    }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => s.getLogicalType match {
      case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case Schema.Type.ARRAY => ArrayType(toSparkType(s.getElementType))
    case Schema.Type.MAP => MapType(StringType, toSparkType(s.getValueType))
    case Schema.Type.RECORD => StructType(s.getFields.asScala.toSeq.map(f =>
      StructField(f.name, toSparkType(f.schema()), nullable = isNullable(f.schema()))))
    case Schema.Type.UNION => toSparkType(nonNullBranch(s))
    case Schema.Type.NULL => NullType
    case other => throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  /** Catalyst → Avro schema; nullable fields become [null, T] unions. */
  def toAvroSchema(dt: DataType, name: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(e, containsNull) =>
      Schema.createArray(maybeNullable(toAvroSchema(e, s"${name}_item"), containsNull))
    case MapType(StringType, v, valueContainsNull) =>
      Schema.createMap(maybeNullable(toAvroSchema(v, s"${name}_value"), valueContainsNull))
    case st: StructType =>
      val fields = st.fields.map { f =>
        new Schema.Field(f.name,
          maybeNullable(toAvroSchema(f.dataType, s"${name}_${f.name}"), f.nullable),
          null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
      }
      Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
    case other => throw new IllegalArgumentException(s"unsupported spark type $other")
  }

  private def maybeNullable(s: Schema, nullable: Boolean): Schema =
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), s) else s

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  private def nonNullBranch(s: Schema): Schema = {
    val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
    require(branches.size == 1,
      s"only [null, T] unions supported, got ${s.getTypes.asScala.map(_.getType)}")
    branches.head
  }

  // -------------------------------------------------- value converters

  /** Avro value → Spark external value, built once per schema node. */
  private def avroToSpark(s: Schema): Any => Any = s.getType match {
    case Schema.Type.UNION =>
      val inner = avroToSpark(nonNullBranch(s))
      v => if (v == null) null else inner(v)
    case Schema.Type.STRING | Schema.Type.ENUM =>
      v => if (v == null) null else v.toString
    case Schema.Type.BYTES => s.getLogicalType match {
      case d: LogicalTypes.Decimal =>
        v => if (v == null) null else {
          val bb = v.asInstanceOf[ByteBuffer].duplicate()
          val bytes = new Array[Byte](bb.remaining()); bb.get(bytes)
          new java.math.BigDecimal(new java.math.BigInteger(bytes), d.getScale)
        }
      case _ =>
        v => if (v == null) null else {
          val bb = v.asInstanceOf[ByteBuffer].duplicate()
          val bytes = new Array[Byte](bb.remaining()); bb.get(bytes)
          bytes
        }
    }
    case Schema.Type.FIXED => s.getLogicalType match {
      case d: LogicalTypes.Decimal =>
        v => if (v == null) null
          else new java.math.BigDecimal(new java.math.BigInteger(
            v.asInstanceOf[GenericFixed].bytes()), d.getScale)
      case _ => v => if (v == null) null else v.asInstanceOf[GenericFixed].bytes().clone()
    }
    case Schema.Type.INT if s.getLogicalType != null &&
        s.getLogicalType.getName == "date" =>
      v => if (v == null) null
        else java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[Int].toLong))
    case Schema.Type.LONG if s.getLogicalType != null &&
        s.getLogicalType.getName == "timestamp-micros" =>
      v => if (v == null) null else {
        val us = v.asInstanceOf[Long]
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
      }
    case Schema.Type.LONG if s.getLogicalType != null &&
        s.getLogicalType.getName == "timestamp-millis" =>
      v => if (v == null) null else new java.sql.Timestamp(v.asInstanceOf[Long])
    case Schema.Type.ARRAY =>
      val inner = avroToSpark(s.getElementType)
      v => if (v == null) null
        else v.asInstanceOf[java.util.List[Any]].asScala.map(inner).toSeq
    case Schema.Type.MAP =>
      val inner = avroToSpark(s.getValueType)
      v => if (v == null) null
        else v.asInstanceOf[java.util.Map[Any, Any]].asScala
          .map { case (k, x) => k.toString -> inner(x) }.toMap
    case Schema.Type.RECORD =>
      val conv = recordToRow(s)
      v => if (v == null) null else conv(v.asInstanceOf[GenericRecord])
    case _ => identity[Any]
  }

  private def recordToRow(s: Schema): GenericRecord => Row = {
    val fields = s.getFields.asScala.toArray
    val convs = fields.map(f => avroToSpark(f.schema()))
    rec => {
      val vals = new Array[Any](fields.length)
      var i = 0
      while (i < fields.length) { vals(i) = convs(i)(rec.get(i)); i += 1 }
      Row.fromSeq(vals.toIndexedSeq)
    }
  }

  /** Spark external value → Avro value. */
  private def sparkToAvro(s: Schema, dt: DataType): Any => Any = (s.getType, dt) match {
    case (Schema.Type.UNION, _) =>
      val inner = sparkToAvro(nonNullBranch(s), dt)
      v => if (v == null) null else inner(v)
    case (Schema.Type.BYTES, _: DecimalType) =>
      val scale = s.getLogicalType.asInstanceOf[LogicalTypes.Decimal].getScale
      v => if (v == null) null else ByteBuffer.wrap(
        v.asInstanceOf[java.math.BigDecimal].setScale(scale).unscaledValue().toByteArray)
    case (Schema.Type.BYTES, _) =>
      v => if (v == null) null else ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case (Schema.Type.INT, DateType) =>
      v => if (v == null) null
        else v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
    case (Schema.Type.LONG, TimestampType) =>
      v => if (v == null) null else {
        val ts = v.asInstanceOf[java.sql.Timestamp]
        // floorDiv, not /: pre-epoch times have getTime < 0 where
        // truncating division would shift them forward a second
        Math.multiplyExact(Math.floorDiv(ts.getTime, 1000L), 1000000L) +
          ts.getNanos / 1000L
      }
    case (Schema.Type.INT, _) =>
      v => if (v == null) null else (v: @unchecked) match {
        case i: Int => i
        case sh: Short => sh.toInt
        case b: Byte => b.toInt
      }
    case (Schema.Type.ARRAY, ArrayType(e, _)) =>
      val inner = sparkToAvro(s.getElementType, e)
      v => if (v == null) null
        else v.asInstanceOf[scala.collection.Seq[Any]].map(inner).asJava
    case (Schema.Type.MAP, MapType(_, vt, _)) =>
      val inner = sparkToAvro(s.getValueType, vt)
      v => if (v == null) null
        else v.asInstanceOf[scala.collection.Map[String, Any]]
          .map { case (k, x) => k -> inner(x) }.asJava
    case (Schema.Type.RECORD, st: StructType) =>
      val conv = rowToRecord(s, st)
      v => if (v == null) null else conv(v.asInstanceOf[Row])
    case _ => identity[Any]
  }

  private def rowToRecord(s: Schema, st: StructType): Row => GenericRecord = {
    val convs = s.getFields.asScala.toArray.zip(st.fields)
      .map { case (f, sf) => sparkToAvro(f.schema(), sf.dataType) }
    row => {
      val rec = new GenericData.Record(s)
      var i = 0
      while (i < convs.length) { rec.put(i, convs(i)(row.get(i))); i += 1 }
      rec
    }
  }
}
