package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  lazy val docs = {
    val s = spark; import s.implicits._
    Seq((1L, "hello world"), (2L, "bonjour"), (3L, "hello world"))
      .toDF("doc_id", "text")
  }

  test("withPayload produces binary + byte-length metadata") {
    val p = Multimodal.withPayload(docs, "text").orderBy("doc_id").collect()
    assert(p(0).getAs[Array[Byte]]("payload").toSeq == "hello world".getBytes("UTF-8").toSeq)
    assert(p(0).getAs[Long]("payload_bytes") == 11L)
  }

  test("sniffMime detects magic bytes") {
    val s = spark; import s.implicits._
    val png = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a)
    val jpg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
    val txt = "plain".getBytes("UTF-8")
    val out = Seq((1, png), (2, jpg), (3, txt)).toDF("id", "payload")
      .select(col("id"), Multimodal.sniffMime(col("payload")).as("mime"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(out == Seq("image/png", "image/jpeg", "text/plain"))
  }

  test("sniffMime second level: zip containers, EBML DocType, tar offset magic") {
    val s = spark; import s.implicits._
    import Multimodal.{ZipMarkers, EbmlMarkers, hexOf}
    def bytes(hex: String): Array[Byte] =
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val rows = Seq(
      1 -> bytes("504B030414000000" + ZipMarkers("content_types") + "00" + ZipMarkers("docx")),
      2 -> bytes("504B030414000000" + ZipMarkers("content_types") + "00" + ZipMarkers("xlsx")),
      3 -> bytes("504B030414000000" + ZipMarkers("jar")),
      4 -> bytes("504B0304AABB"), // plain zip, no markers
      5 -> bytes("1A45DFA393428288" + EbmlMarkers("matroska")),
      6 -> bytes("1A45DFA393428284" + EbmlMarkers("webm")),
      7 -> bytes("00" * 257 + hexOf("ustar") + "00"),
      8 -> bytes("D0CF11E0A1B11AE1"))
    val out = rows.toDF("id", "payload")
      .select(col("id"), Multimodal.sniffMime(col("payload")).as("mime"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(out == Seq(
      "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
      "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
      "application/java-archive",
      "application/zip",
      "video/x-matroska",
      "video/webm",
      "application/x-tar",
      "application/x-ole-storage"))
  }

  test("sampleFrames explodes every-Kth frame; null decodes emit none") {
    val s = spark; import s.implicits._
    val d = Multimodal.withPayload(docs, "text")
      .union(Seq((4L, null.asInstanceOf[String])).toDF("doc_id", "text")
        .withColumn("payload", lit(null).cast("binary"))
        .withColumn("payload_bytes", lit(null).cast("long")))
    val decoded = Multimodal.decodeFeatures(d, "doc_id")
    val frames = Multimodal.sampleFrames(decoded, everyK = 2)
    val byDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nf = decoded.where(col("doc_id") === 1).collect().head.getInt(3)
    assert(byDoc(1L) == (nf + 1) / 2) // ceil(n_frames / 2) sampled
    assert(!byDoc.contains(4L)) // null decode -> no frames
    val idx = frames.where(col("doc_id") === 1)
      .orderBy("frame_idx").collect().map(_.getInt(3)).toSeq
    assert(idx == (0 until nf by 2))
  }

  test("resizeFeatures records geometry + scale, passes nulls through") {
    val s = spark; import s.implicits._
    val d = Multimodal.withPayload(docs, "text")
      .union(Seq((4L, null.asInstanceOf[String])).toDF("doc_id", "text")
        .withColumn("payload", lit(null).cast("binary"))
        .withColumn("payload_bytes", lit(null).cast("long")))
    val out = Multimodal.resizeFeatures(
      Multimodal.decodeFeatures(d, "doc_id"), 224, 224).orderBy("doc_id").collect()
    assert(out.length == 4) // cardinality preserved
    assert(out(0).getInt(1) == 224 && out(0).getInt(2) == 224)
    assert(out(0).getDouble(3) > 0) // scale_x = width / 224
    assert(out(3).isNullAt(3) && out(3).isNullAt(5)) // null decode stays null
  }

  test("decodeFeatures is deterministic, schema-stable, and content-addressed") {
    val d = Multimodal.withPayload(docs, "text")
    val f = Multimodal.decodeFeatures(d, "doc_id", batchSize = 2)
    assert(f.schema == Multimodal.decodedSchema)
    val rows = f.orderBy("doc_id").collect()
    assert(rows.length == 3)
    // same payload → same fake features (content-addressed decode)
    assert(rows(0).getInt(1) == rows(2).getInt(1))
    assert(rows(0).getSeq[Float](4) == rows(2).getSeq[Float](4))
    assert(rows(0).getInt(1) != rows(1).getInt(1))
    assert(rows.forall(_.getSeq[Float](4).length == 8))
    assert(rows.forall(r => r.getInt(1) >= 64 && r.getInt(3) >= 1))
  }

  test("dHash56 is deterministic, 56-bit, and sensitive to payload bytes") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "hello world"), (2L, "hello world"), (3L, "hello worlc"))
      .toDF("id", "t")
    val h = Multimodal.withPayload(df, "t")
      .select(col("id"), Multimodal.dHash56(col("payload")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))                       // same bytes -> same hash
    assert(h(1L) != h(3L))                       // md5 avalanche on 1-byte change
    assert(h.values.forall(v => v >= 0L && v < (1L << 56)))
  }

  test("dHashNearDupPairs finds exactly the identical payloads via chunk blocking") {
    val s = spark; import s.implicits._
    val df = (Seq((1L, "dup text one"), (2L, "dup text one"), (3L, "dup text one")) ++
      (4L to 40L).map(i => (i, s"unique text $i"))).toDF("id", "t")
    val pairs = Multimodal.dHashNearDupPairs(
        Multimodal.withPayload(df, "t"), col("id"), col("payload"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairs.forall(_._3 == 0))
    spark.catalog.clearCache()
  }
}
