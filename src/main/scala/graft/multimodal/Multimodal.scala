package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as
  * batched per-partition transforms (the Scala analog of
  * `mapInPandas` batch UDFs — one partition = one batch stream, no
  * per-row JVM↔native round trips).
  *
  * The image/audio codec libraries are NOT in this container, so the
  * byte-level decode is a clearly-marked DETERMINISTIC STUB
  * ([[StubCodec]]); everything Spark-side — schema, partitioning, batch
  * iteration shape, output contracts — is real and tested. Swapping
  * [[StubCodec]] for a real codec changes no plumbing.
  */
object Multimodal {

  /** media(media_id, kind, bytes, meta{width,height,duration_ms,mime}) */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("mime", StringType))), nullable = false)))

  final case class MediaMeta(width: Int, height: Int, duration_ms: Long, mime: String)
  final case class Media(media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** ======================== STUB ========================
    * Deterministic fake codec: expands a seed into bytes and reduces
    * bytes to a fixed-size "feature" vector with a rolling hash. A real
    * deployment replaces these with image/audio decoders (`???` boundary —
    * intentionally the ONLY fake layer). */
  object StubCodec extends Serializable {
    def synthBytes(seed: Long, n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var h = seed * 0x9E3779B97F4A7C15L + 1
      var i = 0
      while (i < n) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        out(i) = (h & 0xff).toByte
        i += 1
      }
      out
    }

    /** STUB feature extractor: 16 deterministic moments of the payload.
      * Real impl: decode → model forward pass. */
    def extractFeatures(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
      val acc = new Array[Long](dim)
      var i = 0
      while (i < bytes.length) {
        acc(i % dim) += (bytes(i) & 0xff).toLong * ((i / dim) % 251 + 1)
        i += 1
      }
      acc.map(a => (a % 100003L).toFloat / 100003f)
    }

    /** STUB resize: proportional byte subsample (real impl: pixel resample). */
    def resize(bytes: Array[Byte], factor: Int): Array[Byte] =
      bytes.zipWithIndex.collect { case (b, i) if i % factor == 0 => b }

    /** STUB frame sampling: fixed-stride byte blocks as "frames". */
    def sampleFrames(bytes: Array[Byte], nFrames: Int): Seq[Array[Byte]] = {
      if (bytes.isEmpty) return Nil
      val stride = math.max(1, bytes.length / math.max(1, nFrames))
      (0 until math.min(nFrames, bytes.length / stride + 1)).map { f =>
        bytes.slice(f * stride, math.min(bytes.length, f * stride + stride))
      }.filter(_.nonEmpty)
    }
  }

  /** Deterministic synthetic media table (no codecs in the sandbox). */
  def syntheticMedia(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val size = 256 + (id % 7).toInt * 128
      val meta = kind match {
        case "image" => MediaMeta(64 + (id % 4).toInt * 32, 64, 0L, "image/png")
        case "audio" => MediaMeta(0, 0, 1000L + id % 9000, "audio/wav")
        case _       => MediaMeta(128, 72, 2000L + id % 30000, "video/mp4")
      }
      Media(id, kind, StubCodec.synthBytes(id, size), meta)
    }
  }

  /** Batched feature extraction: one partition = one batch stream
    * (mapPartitions — the mapInPandas shape; per-batch setup cost paid
    * once per partition, the contract a real model-codec needs). */
  def extractFeatures(media: Dataset[Media], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition (per-batch) init goes here in a real codec:
      // model load / decoder handle — paid once, not per row
      batch.map(m => MediaFeatures(m.media_id, m.kind,
        StubCodec.extractFeatures(m.bytes, dim)))
    }
  }

  /** Frame sampling for video payloads: one row per sampled frame. */
  def sampleFrames(media: Dataset[Media], nFrames: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      StubCodec.sampleFrames(m.bytes, nFrames).zipWithIndex.map {
        case (f, i) => Frame(m.media_id, i, f)
      }
    }
  }

  /** Resize pass co-partitioned by media_id (stable layout for a
    * downstream co-located join with features). */
  def resized(media: Dataset[Media], factor: Int = 4,
              partitions: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    media.repartition(partitions, col("media_id"))
      .mapPartitions(_.map(m =>
        (m.media_id, StubCodec.resize(m.bytes, factor).length,
          m.bytes.length)))
      .toDF("media_id", "resized_bytes", "original_bytes")
  }
}
