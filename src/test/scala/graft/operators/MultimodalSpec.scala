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
}
