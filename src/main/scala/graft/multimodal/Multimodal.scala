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
object Multimodal {

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
