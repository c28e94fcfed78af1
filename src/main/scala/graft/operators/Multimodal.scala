package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support: opaque `binary`
  * payloads + typed metadata, with decode / feature-extraction staged as
  * batched per-partition transforms. The container has no codec
  * libraries, so the actual byte→pixels decode is a STUB — a
  * deterministic fake derived from the payload's MD5 — while everything
  * Spark-side (schema, batch shape, partitioning, null handling) is
  * real and tested. Swap `FakeCodec` for a JNI/FFmpeg codec in
  * production; nothing else changes.
  *
  * Scale notes: decode runs via `mapPartitions` with an internal batch
  * size, the Scala analog of `mapInPandas` — per-partition batching
  * amortizes codec init without materializing the partition; payloads
  * stream through one batch at a time. Binary columns stay opaque to
  * the optimizer, so metadata predicates (mime, size) are projected to
  * separate columns FIRST and pushed to the parquet scan, keeping the
  * expensive decode behind the cheap filter.
  */
object Multimodal {

  /** Payload envelope: binary bytes + metadata columns the scan can
    * filter on without touching the bytes. */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", to_binary(col(textCol), lit("utf-8")))
      .withColumn("payload_bytes", octet_length(col("payload")).cast("long"))

  /** Hex rendering of an ASCII marker string — shared by the Spark
    * detector and the battery/oracle generators so the three can't
    * spell a marker differently. */
  def hexOf(s: String): String =
    s.getBytes("UTF-8").map(b => f"$b%02X").mkString

  /** Entry-name markers for the zip-container second level (the
    * [Content_Types].xml / part-name peek Tika's container detector
    * does): OOXML archives carry the content-types part plus a
    * format-identifying first part; jars carry the manifest. */
  val ZipMarkers: Map[String, String] = Map(
    "content_types" -> hexOf("[Content_Types].xml"),
    "docx" -> hexOf("word/document"),
    "xlsx" -> hexOf("xl/workbook"),
    "pptx" -> hexOf("ppt/presentation"),
    "jar" -> hexOf("META-INF/MANIFEST.MF"))

  /** EBML DocType strings (element 0x4282) — mkv vs webm share the
    * 1A45DFA3 header and differ only here. */
  val EbmlMarkers: Map[String, String] =
    Map("matroska" -> hexOf("matroska"), "webm" -> hexOf("webm"))

  /** Magic-byte MIME sniff (the deterministic core of reference
    * MimeTypeDetector.scala, minus the Tika database): a 12-byte
    * level-1 window, plus THREE second-level probes for container
    * families —
    *  - RIFF: bytes 9-12 say WAVE vs WEBP vs "AVI " (the pre-r10
    *    single-level rule typed every RIFF as audio/wav);
    *  - zip: entry-name peek in the first 512 bytes —
    *    [Content_Types].xml plus word/|xl/|ppt/ part names type the
    *    OOXML trio, META-INF/MANIFEST.MF types jars, anything else
    *    stays application/zip (Tika reads the central directory; the
    *    head-window scan is the streaming-safe approximation, and 512
    *    bytes always covers the FIRST local-header name, which is
    *    what the OOXML convention pins);
    *  - EBML: DocType string picks video/x-matroska vs video/webm
    *    (bare headers without a DocType in window default to webm,
    *    the common short-header case).
    * Plus tar's out-of-band magic ("ustar" at byte offset 258 — tar
    * has NO header at offset 0) and OLE2/bzip2/xz/rar level-1 rules.
    * Marker search runs on the hex rendering (binary-safe; markers are
    * >=10 hex chars so nibble-aliasing needs contrived bytes). All
    * row-local codegen; the q571 oracle replays the identical chain
    * over the same synthesized bytes, with every branch exercised. */
  def sniffMime(payload: Column): Column = {
    val hex12 = upper(hex(substring(payload, 1, 12)))
    val riffType = substring(hex12, 17, 8) // bytes 9-12
    val headHex = upper(hex(substring(payload, 1, 512)))
    val tarMagic = upper(hex(substring(payload, 258, 5)))
    when(hex12.startsWith("89504E47"), "image/png")
      .when(hex12.startsWith("FFD8FF"), "image/jpeg")
      .when(hex12.startsWith("47494638"), "image/gif")
      .when(hex12.startsWith("49492A00") ||
        hex12.startsWith("4D4D002A"), "image/tiff")
      .when(hex12.startsWith("52494646"),
        when(riffType === "57454250", "image/webp")          // WEBP
          .when(riffType === "57415645", "audio/wav")        // WAVE
          .when(riffType === "41564920", "video/x-msvideo")  // "AVI "
          .otherwise("application/octet-stream"))
      .when(substring(hex12, 9, 8) === "66747970", "video/mp4") // ....ftyp
      .when(hex12.startsWith("1A45DFA3"),                       // EBML family
        when(headHex.contains(EbmlMarkers("matroska")), "video/x-matroska")
          .when(headHex.contains(EbmlMarkers("webm")), "video/webm")
          .otherwise("video/webm"))
      .when(hex12.startsWith("494433"), "audio/mpeg")          // ID3 tag
      .when(hex12.startsWith("FFFB") || hex12.startsWith("FFF3") ||
        hex12.startsWith("FFF2"), "audio/mpeg")                // bare framesync
      .when(hex12.startsWith("4F676753"), "audio/ogg")         // OggS
      .when(hex12.startsWith("664C6143"), "audio/flac")        // fLaC
      .when(hex12.startsWith("25504446"), "application/pdf")   // %PDF
      .when(hex12.startsWith("504B0304"),                      // zip family
        when(headHex.contains(ZipMarkers("content_types")),
          when(headHex.contains(ZipMarkers("docx")),
            "application/vnd.openxmlformats-officedocument.wordprocessingml.document")
            .when(headHex.contains(ZipMarkers("xlsx")),
              "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet")
            .when(headHex.contains(ZipMarkers("pptx")),
              "application/vnd.openxmlformats-officedocument.presentationml.presentation")
            .otherwise("application/zip"))
          .when(headHex.contains(ZipMarkers("jar")), "application/java-archive")
          .otherwise("application/zip"))
      .when(hex12.startsWith("1F8B"), "application/gzip")
      .when(hex12.startsWith("377ABCAF271C"), "application/x-7z-compressed")
      .when(hex12.startsWith("D0CF11E0A1B11AE1"), "application/x-ole-storage")
      .when(hex12.startsWith("425A68"), "application/x-bzip2")  // BZh
      .when(hex12.startsWith("FD377A585A00"), "application/x-xz")
      .when(hex12.startsWith("526172211A07"), "application/vnd.rar")
      .when(tarMagic === hexOf("ustar"), "application/x-tar")
      .otherwise("text/plain")
  }

  /** Output schema of the decode stage: fixed-width image features.
    * Feature fields are nullable — a null payload decodes to null
    * features, preserving input cardinality. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("feat", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** STUB codec: deterministic fake "decode" from the payload MD5.
    * Replace with a real image/audio decoder in production. */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
      def u(i: Int): Int = md(i) & 0xff
      val width = 64 + (u(0) << 4 | u(1) >> 4)        // 64..4159, deterministic
      val height = 64 + (u(2) << 4 | u(3) >> 4)
      val nFrames = 1 + u(4) % 16
      val feat = Array.tabulate(8)(i => (u(2 * i) * 256 + u(2 * i + 1)) / 65535.0f)
      (width, height, nFrames, feat)
    }
  }

  /** Frame sampling for video-ish payloads (the UDTF-shaped stage a
    * video pipeline needs): one output row per every-K-th frame of each
    * decoded payload, as a pure Column-level explode — the row
    * expansion, partitioning and downstream-join shape are the real
    * thing; only the per-frame pixel work stays behind the codec stub.
    * Null decodes (null n_frames) produce no frames. */
  def sampleFrames(decoded: DataFrame, everyK: Int): DataFrame =
    decoded.where(col("n_frames").isNotNull)
      .select(col("doc_id"), col("width"), col("height"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))).as("frame_idx"))
      .withColumn("frame_idx", col("frame_idx").cast("int"))

  /** Resize plumbing: records the target geometry and the scale factors
    * a real kernel would apply, passing the stub features through
    * untouched (and nulls through as nulls). Swapping in a real
    * resampling kernel changes only the feat expression. */
  def resizeFeatures(decoded: DataFrame, targetW: Int, targetH: Int): DataFrame =
    decoded.select(col("doc_id"),
      lit(targetW).as("resized_w"), lit(targetH).as("resized_h"),
      (col("width").cast("double") / targetW).as("scale_x"),
      (col("height").cast("double") / targetH).as("scale_y"),
      col("feat"))

  /** Audio silence-trim plumbing over the stub codec: the payload
    * "decodes" to `nWindows` energy values (window w's energy = first
    * byte of md5(payload ‖ ":aw" ‖ w), 0–255 — a real codec swaps in
    * per-window RMS over PCM samples and NOTHING else changes), and the
    * trim is the first/last window at or above `threshold` — the
    * leading/trailing-silence removal every audio ingest runs before
    * feature extraction. Entirely row-local array work inside codegen:
    * no explode, no shuffle; emits (doc_id, trim_start, trim_end,
    * n_active, mean_active) with nulls when the whole clip is silence. */
  def audioEnergyTrim(df: DataFrame, id: Column, payload: Column,
                      nWindows: Int = 16, threshold: Int = 64): DataFrame = {
    def energy(w: Int): Column =
      conv(substring(md5(concat(payload,
        to_binary(lit(s":aw$w"), lit("utf-8")))), 1, 2), 16, 10).cast("long")
    val es = array((0 until nWindows).map(energy): _*)
    df.select(id.as("doc_id"), es.as("es"))
      .select(col("doc_id"),
        filter(sequence(lit(0L), lit(nWindows - 1L)),
          w => element_at(col("es"), (w + 1).cast("int")) >= threshold)
          .as("aw"), col("es"))
      .select(col("doc_id"),
        when(size(col("aw")) > 0, element_at(col("aw"), 1)).as("trim_start"),
        when(size(col("aw")) > 0, element_at(col("aw"), -1)).as("trim_end"),
        size(col("aw")).as("n_active"),
        round(aggregate(col("aw"), lit(0L),
          (acc, w) => acc + element_at(col("es"), (w + 1).cast("int")))
          .cast("double") / size(col("aw")).cast("double"), 6)
          .as("mean_active"))
  }

  /** Audio decimation plumbing over the stub codec: 3-tap moving-sum
    * anti-alias (integer, no scaling — a real resampler swaps in a
    * windowed-sinc FIR and nothing else changes) then take every
    * `factor`-th interior window — the downsample every audio ingest
    * runs before feature extraction. Row-local array work inside
    * codegen, no explode, no shuffle; emits (doc_id, n_out, peak,
    * total, mean_smoothed) with the 3-tap sums kept exact in longs. */
  def decimateAudio(df: DataFrame, id: Column, payload: Column,
                    nWindows: Int = 16, factor: Int = 3): DataFrame = {
    // fail fast at the operator boundary: nWindows < 3 yields an empty
    // window sequence (null array_max / divide-by-zero mean downstream)
    require(nWindows >= 3, s"nWindows must be >= 3: $nWindows")
    require(factor >= 1, s"factor must be >= 1: $factor")
    def energy(w: Int): Column =
      conv(substring(md5(concat(payload,
        to_binary(lit(s":aw$w"), lit("utf-8")))), 1, 2), 16, 10).cast("long")
    val es = array((0 until nWindows).map(energy): _*)
    df.select(id.as("doc_id"), es.as("es"))
      .select(col("doc_id"), transform(
        sequence(lit(1L), lit(nWindows - 2L), lit(factor.toLong)),
        w => element_at(col("es"), w.cast("int")) +
          element_at(col("es"), w.cast("int") + 1) +
          element_at(col("es"), w.cast("int") + 2)).as("ma"))
      .select(col("doc_id"), size(col("ma")).cast("long").as("n_out"),
        array_max(col("ma")).as("peak"),
        aggregate(col("ma"), lit(0L), (acc, x) => acc + x).as("total"),
        round(aggregate(col("ma"), lit(0L), (acc, x) => acc + x)
          .cast("double") / lit(3.0) / size(col("ma")).cast("double"), 6)
          .as("mean_smoothed"))
  }

  /** 56-bit perceptual difference hash (dHash) over the stub decode.
    * The fake luma grid has 7 rows of 9 pixels, where row r's pixels
    * are the first 9 bytes of md5(payload ‖ ":" ‖ r), and bit
    * (r*8 + c) of the hash is set when pixel (r, c+1) > pixel (r, c) —
    * the gradient-direction encoding of the real dHash. 56 bits rather
    * than the canonical 64 keeps the value strictly positive in
    * signed-64 engines, so the differential oracle replays it
    * bit-exactly (the same reason [[Dedup.simHashOf]] is 60-bit); a
    * real codec swaps the md5 rows for a 9×7 downsampled luma grid and
    * nothing else — blocking, verify, clustering — changes. Pure
    * codegen'd column work: 7 md5 calls + 56 byte compares per row,
    * common subexpressions eliminated by whole-stage codegen. */
  def dHash56(payload: Column): Column = {
    def pix(r: Int, c: Int): Column =
      conv(substring(md5(concat(payload, to_binary(lit(":" + r), lit("utf-8")))),
        2 * c + 1, 2), 16, 10).cast("long")
    (for { r <- 0 until 7; c <- 0 until 8 } yield
      when(pix(r, c + 1) > pix(r, c), lit(1L << (r * 8 + c))).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** Image near-duplicate pairs by dHash hamming distance — the
    * multimodal analog of [[Dedup.simHashPairs]] and the same
    * block-verify shape: the 56-bit hash splits into 4 disjoint 14-bit
    * chunks; two images within hamming distance 3 must agree on at
    * least one chunk (pigeonhole), so a chunk-keyed equi-join generates
    * every qualifying candidate — never a theta-join over all pairs —
    * and an exact popcount verifies. With the stub codec only
    * byte-identical payloads land within the radius (md5 rows have no
    * perceptual proximity); a real decoder makes near-crops/re-encodes
    * cluster, with this exact plan shape. */
  def dHashNearDupPairs(df: DataFrame, id: Column, payload: Column,
                        maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"chunk blocking covers hamming <= 3, got $maxHamming")
    // persisted: the signature table self-joins (two scans below)
    val sigs = df.select(id.as("doc"), dHash56(payload).as("dhash")).persist()
    val posed = sigs.select(col("doc"), col("dhash"),
      posexplode(expr("transform(sequence(0, 3), c -> shiftright(dhash, c * 14) % 16384)")))
      .withColumnRenamed("pos", "c").withColumnRenamed("col", "chunk")
    posed.as("a").join(posed.as("b"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Batched decode: (doc_id, payload) → decodedSchema rows. Batches of
    * `batchSize` per partition emulate the mapInPandas batch shape —
    * codec state is initialized once per partition, rows stream
    * through without materializing the whole partition. Output
    * cardinality equals input cardinality: null payloads yield null
    * feature fields instead of silently dropping the row. */
  def decodeFeatures(df: DataFrame, idCol: String, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long"), col("payload"))
    val rdd = input.rdd.mapPartitions { rows =>
      // per-partition codec init would go here (real codecs are costly)
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          if (r.isNullAt(1)) Row(r.getLong(0), null, null, null, null)
          else {
            val (w, h, f, feat) = FakeCodec.decode(r.getAs[Array[Byte]](1))
            Row(r.getLong(0), w, h, f, feat.toSeq)
          }
        }
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }
}
