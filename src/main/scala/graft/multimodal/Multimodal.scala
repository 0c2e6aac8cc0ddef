package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary`
  * payloads plus a typed metadata struct, with partition-parallel
  * decode / feature-extract / resize / frame-sample stages.
  *
  * The actual media codecs are STUBBED (this container has no image or
  * audio libraries): [[decodeStub]] derives deterministic fake features
  * from the bytes. Everything Spark-side — schema, batch shape,
  * mapPartitions plumbing, partitioning — is real and tested, so a real
  * codec drops into [[decodeStub]] without touching the pipeline.
  */
object Multimodal extends Serializable {

  /** Canonical multimodal record schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("media_type", StringType),
    StructField("meta", StructType(Seq(
      StructField("origin", StringType),
      StructField("n_bytes", LongType))))))

  /** Wrap any table with a binary column into media records. */
  def toMediaFrame(df: DataFrame, idCol: String, binCol: String,
      originCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      col(binCol).as("payload"),
      lit(mediaType).as("media_type"),
      struct(
        col(originCol).as("origin"),
        octet_length(col(binCol)).cast(LongType).as("n_bytes")).as("meta"))

  /** STUB decode: a real implementation would decode image bytes to
    * (h, w, channels) and pixel stats. This deterministic fake derives
    * "dimensions" and a luminance-like mean from the payload bytes so
    * the downstream plumbing (schema, batching, partition parallelism)
    * is exercised honestly.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Double) = {
    if (payload == null || payload.isEmpty) (0, 0, 0.0)
    else {
      val h = 1 + (math.abs(payload.head.toInt) % 64)
      val w = 1 + (payload.length % 1024)
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += (payload(i) & 0xff); i += 1 }
      (h, w, sum.toDouble / payload.length)
    }
  }

  /** Feature extraction over media records — one pass per partition,
    * constant memory, no driver involvement.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("height", IntegerType),
      StructField("width", IntegerType),
      StructField("mean_intensity", DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media
      .select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (h, w, m) = decodeStub(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), h, w, m)
        }
      }(enc)
  }

  /** "Resize" stage stub: truncate payloads to a byte budget (a real
    * impl re-encodes); demonstrates binary-in/binary-out partition maps.
    */
  def resizeStub(media: DataFrame, maxBytes: Int): DataFrame =
    media.withColumn(
      "payload",
      expr(s"CASE WHEN octet_length(payload) > $maxBytes " +
        s"THEN substring(payload, 1, $maxBytes) ELSE payload END"))

  /** Batched embedding stub — the Scala analog of a `mapInPandas`
    * inference stage: payloads are processed in FIXED-SIZE BATCHES per
    * partition (`grouped(batchSize)`), the shape a real vision/audio
    * model needs (one forward pass per batch, constant memory). The
    * stub "model" derives a deterministic dim-`dim` float vector from
    * a rolling byte hash; results are independent of batch size and
    * partitioning — asserted by spec — so a real model drops in
    * without touching the pipeline.
    */
  def batchedEmbedStub(media: DataFrame, dim: Int, batchSize: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media
      .select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // one "forward pass" per batch: embed every payload in it
          batch.map { r =>
            val p = r.getAs[Array[Byte]]("payload")
            val v = new Array[Float](dim)
            if (p != null) {
              var h = 1125899906842597L // large prime seed
              var i = 0
              while (i < p.length) {
                h = h * 31 + (p(i) & 0xff)
                v(math.floorMod(i, dim)) += ((h >>> 32).toInt % 1000) / 1000.0f
                i += 1
              }
            }
            Row(r.getLong(0), v.toSeq)
          }
        }
      }(enc)
  }

  // ------------------------------------------------------ header parsing

  /** REAL (non-stub) media header parsing: container-format sniffing and
    * dimension/audio-parameter extraction for PNG, JPEG and WAV are pure
    * byte arithmetic — no codec library — and are exactly what a
    * curation pipeline runs FIRST at 100 TB: filter by resolution /
    * sample rate / format from a few header bytes before paying any
    * full decode. Pixel/sample decode stays stubbed ([[decodeStub]]);
    * this stage is honest.
    *
    * Every accessor is bounds-checked; truncated or corrupt payloads
    * yield null fields, never exceptions (a 100 TB corpus WILL contain
    * garbage bytes).
    */
  final case class MediaHeader(
      format: String, // "png" | "jpeg" | "wav" | "unknown"
      width: Option[Int],
      height: Option[Int],
      sampleRate: Option[Int],
      channels: Option[Int])

  private def be16(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
  private def be32(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
      ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
  private def le16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
  private def le32(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
      ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)
  private def ascii(p: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= p.length &&
      (0 until s.length).forall(j => (p(i + j) & 0xff) == s.charAt(j))

  private val pngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG: 8-byte signature, then the IHDR chunk must come first —
    * width/height are the two big-endian ints at offsets 16/20.
    */
  private def parsePng(p: Array[Byte]): MediaHeader =
    if (p.length >= 24 && ascii(p, 12, "IHDR")) {
      val w = be32(p, 16); val h = be32(p, 20)
      if (w > 0 && h > 0) MediaHeader("png", Some(w), Some(h), None, None)
      else MediaHeader("png", None, None, None, None)
    } else MediaHeader("png", None, None, None, None)

  /** JPEG: walk the marker stream from SOI; any SOFn frame header
    * (0xC0-0xCF except the non-frame C4/C8/CC) carries height then width
    * as big-endian shorts after the 1-byte precision. Standalone markers
    * (RSTn, TEM) have no length field.
    */
  private def parseJpeg(p: Array[Byte]): MediaHeader = {
    var i = 2
    while (i + 1 < p.length) {
      if ((p(i) & 0xff) != 0xff) return MediaHeader("jpeg", None, None, None, None)
      var j = i
      while (j + 1 < p.length && (p(j + 1) & 0xff) == 0xff) j += 1
      val m = if (j + 1 < p.length) p(j + 1) & 0xff else 0
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        if (j + 8 < p.length) {
          val h = be16(p, j + 5); val w = be16(p, j + 7)
          return if (w > 0 && h > 0)
            MediaHeader("jpeg", Some(w), Some(h), None, None)
          else MediaHeader("jpeg", None, None, None, None)
        } else return MediaHeader("jpeg", None, None, None, None)
      } else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        i = j + 2
      } else if (m == 0xd9) {
        return MediaHeader("jpeg", None, None, None, None)
      } else if (j + 3 < p.length) {
        i = j + 2 + be16(p, j + 2)
      } else return MediaHeader("jpeg", None, None, None, None)
    }
    MediaHeader("jpeg", None, None, None, None)
  }

  /** WAV: RIFF/WAVE container; walk chunks until `fmt ` (chunks are
    * even-padded), whose body holds channels (LE16 at +2) and sample
    * rate (LE32 at +4).
    */
  private def parseWav(p: Array[Byte]): MediaHeader = {
    var i = 12
    while (i + 8 <= p.length) {
      val size = le32(p, i + 4)
      if (size < 0) return MediaHeader("wav", None, None, None, None)
      if (ascii(p, i, "fmt ") && size >= 16 && i + 8 + 16 <= p.length) {
        val ch = le16(p, i + 10); val sr = le32(p, i + 12)
        return if (ch > 0 && sr > 0)
          MediaHeader("wav", None, None, Some(sr), Some(ch))
        else MediaHeader("wav", None, None, None, None)
      }
      i += 8 + size + (size & 1)
    }
    MediaHeader("wav", None, None, None, None)
  }

  /** GIF: 6-byte version signature, then the logical screen descriptor's
    * little-endian width/height shorts at offsets 6/8.
    */
  private def parseGif(p: Array[Byte]): MediaHeader =
    if (p.length >= 10) {
      val w = le16(p, 6); val h = le16(p, 8)
      if (w > 0 && h > 0) MediaHeader("gif", Some(w), Some(h), None, None)
      else MediaHeader("gif", None, None, None, None)
    } else MediaHeader("gif", None, None, None, None)

  /** Sniff the container by magic bytes (each magic needs only its own
    * length: 8 for PNG, 2 for JPEG, 6 for GIF, 12 for RIFF/WAVE) and
    * parse its header.
    */
  def parseHeader(p: Array[Byte]): MediaHeader =
    if (p == null || p.length < 2) MediaHeader("unknown", None, None, None, None)
    else if (p.length >= 8 && (0 until 8).forall(j => p(j) == pngSig(j)))
      parsePng(p)
    else if ((p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) parseJpeg(p)
    else if (ascii(p, 0, "GIF87a") || ascii(p, 0, "GIF89a")) parseGif(p)
    else if (p.length >= 12 && ascii(p, 0, "RIFF") && ascii(p, 8, "WAVE"))
      parseWav(p)
    else MediaHeader("unknown", None, None, None, None)

  /** Header-parse stage over media records: one bounds-checked byte walk
    * per row, partition-parallel, no decode. Null-safe on any garbage.
    */
  def parseHeaders(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media
      .select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val h = parseHeader(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), h.format,
            h.width.map(Int.box).orNull, h.height.map(Int.box).orNull,
            h.sampleRate.map(Int.box).orNull, h.channels.map(Int.box).orNull)
        }
      }(enc)
  }

  // ----------------------------------------------------- header builders

  /** Minimal VALID PNG (signature + IHDR + IEND; CRCs zeroed — every
    * header-level parser including [[parsePng]] reads dims without
    * checksumming). Builders exist so specs and the differential oracle
    * query can synthesize real container bytes deterministically.
    */
  def buildPng(width: Int, height: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + 25 + 12)
    b.put(pngSig)
    b.putInt(13).put("IHDR".getBytes("US-ASCII"))
    b.putInt(width).putInt(height)
    b.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    b.putInt(0) // IHDR CRC (zeroed)
    b.putInt(0).put("IEND".getBytes("US-ASCII")).putInt(0)
    b.array()
  }

  /** Minimal VALID JPEG: SOI, one SOF0 frame header (8-bit precision,
    * 3 components), EOI.
    */
  def buildJpeg(width: Int, height: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(2 + 19 + 2)
    b.put(0xff.toByte).put(0xd8.toByte)
    b.put(0xff.toByte).put(0xc0.toByte).putShort(17.toShort)
    b.put(8.toByte)
    b.putShort(height.toShort).putShort(width.toShort)
    b.put(3.toByte)
    for (c <- 1 to 3) { b.put(c.toByte).put(0x11.toByte).put(0.toByte) }
    b.put(0xff.toByte).put(0xd9.toByte)
    b.array()
  }

  /** Minimal VALID GIF89a: signature + logical screen descriptor +
    * trailer (no global color table, no image data — header-complete).
    */
  def buildGif(width: Int, height: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer
      .allocate(14).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("GIF89a".getBytes("US-ASCII"))
    b.putShort(width.toShort).putShort(height.toShort)
    b.put(0.toByte).put(0.toByte).put(0.toByte)
    b.put(0x3b.toByte)
    b.array()
  }

  /** Minimal VALID WAV: RIFF/WAVE with a 16-byte PCM `fmt ` chunk and an
    * empty `data` chunk.
    */
  def buildWav(sampleRate: Int, channels: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer
      .allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val blockAlign = channels * 2
    b.put("RIFF".getBytes("US-ASCII")).putInt(36)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1.toShort).putShort(channels.toShort)
    b.putInt(sampleRate).putInt(sampleRate * blockAlign)
    b.putShort(blockAlign.toShort).putShort(16.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(0)
    b.array()
  }

  /** Frame-sample stub for "video": emit every k-th byte-window as a
    * frame row (a real impl samples decoded frames).
    */
  def frameSample(media: DataFrame, frameBytes: Int, everyK: Int): DataFrame =
    media
      .select(
        col("media_id"),
        posexplode(expr(
          s"""transform(
             |  sequence(0, greatest(CAST(octet_length(payload) / ($frameBytes * $everyK) AS INT) - 1, 0)),
             |  i -> substring(payload, i * $frameBytes * $everyK + 1, $frameBytes))
             |""".stripMargin)).as(Seq("frame_no", "frame_bytes")))
      .withColumn("frame_digest", md5(col("frame_bytes")))
}
