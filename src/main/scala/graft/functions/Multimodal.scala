package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque BINARY payloads with
  * typed metadata, decoded/feature-extracted per partition.
  *
  * The Spark-side shape is the real thing — binary column + schema,
  * hash-partitioned parallel decode via typed mapPartitions (the Scala
  * analogue of mapInPandas: one iterator per partition, so a real
  * decoder amortizes model/codec init across the partition, exactly
  * like a pandas-batch UDF would). The DECODER ITSELF IS A STUB: this
  * container has no image/audio codecs, so `decodeStub` derives
  * deterministic fake dimensions/features from the bytes. Swap
  * [[MediaDecoder.decodeStub]] for a real codec and nothing else
  * changes.
  *
  * Scale: decode is narrow (no shuffle), CPU-bound, embarrassingly
  * parallel; `repartition(n)` upstream controls decode parallelism.
  * Frame sampling keeps only offsets, not frame payloads — at 100 TB
  * the decoded features (KBs) shuffle, the raw media (MBs) never does.
  */
object Multimodal {

  final case class MediaMeta(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      brightness: Double)

  object MediaDecoder {
    /** STUB decoder — deterministic fake parse of a media header.
      * Real implementation would dispatch on `kind` to an image/audio/
      * video codec; the fake derives:
      *   width  = first byte % 128 + 16
      *   height = second byte % 128 + 16
      *   n_frames (video) = n_bytes / 256, else 1
      *   brightness = (first + last byte) / 2
      */
    def decodeStub(id: Long, kind: String, payload: Array[Byte]): MediaMeta = {
      require(payload.nonEmpty, s"empty payload for media $id")
      val b0 = payload.head & 0xFF
      val b1 = (if (payload.length > 1) payload(1) else payload.head) & 0xFF
      val bLast = payload.last & 0xFF
      MediaMeta(
        media_id = id,
        kind = kind,
        n_bytes = payload.length,
        width = b0 % 128 + 16,
        height = b1 % 128 + 16,
        n_frames = if (kind == "video") payload.length / 256 else 1,
        brightness = (b0 + bLast) / 2.0)
    }
  }

  /** Decode a media table (media_id, kind, payload BINARY) into typed
    * metadata — one partition-iterator pass, codec init once per
    * partition (the `decoder` value models that). */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").as[Long], col("kind").as[String],
        col("payload").as[Array[Byte]])
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val decoder = MediaDecoder // per-partition "codec init" site
        it.map { case (id, kind, bytes) => decoder.decodeStub(id, kind, bytes) }
      }
  }

  /** Frame sampling for video payloads: every `stride` bytes yields a
    * frame offset (stub for keyframe extraction) — output is (id,
    * frame_no, offset), the real decoder would attach the frame bytes. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0),
          ((length(col("payload")) - 1) / stride).cast("int"))).as("frame_no"))
      .withColumn("offset", col("frame_no") * stride)

  final case class ResizedMeta(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      new_width: Int,
      new_height: Int,
      scale: Double)

  final case class MediaFeature(media_id: Long, bin: Int, n: Long)

  /** Feature extraction: a fixed-size per-media feature vector (byte
    * histogram over `nBins` residue classes — the stub for a real
    * embedding/spectrogram extractor), emitted LONG-form as (media_id,
    * bin, n>0) rows. Same partition-iterator shape as decode: the
    * feature pass streams each payload once, narrow (no shuffle), and
    * only the KB-scale features ever move — at 100 TB the raw media
    * stays where it was written. */
  def byteHistogram(media: DataFrame, nBins: Int): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").as[Long], col("payload").as[Array[Byte]])
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val _ = MediaDecoder // per-partition "extractor init" site
        it.flatMap { case (id, bytes) =>
          val counts = new Array[Long](nBins)
          var i = 0
          while (i < bytes.length) {
            counts((bytes(i) & 0xFF) % nBins) += 1L
            i += 1
          }
          counts.indices.collect { case b if counts(b) > 0L =>
            MediaFeature(id, b, counts(b))
          }
        }
      }
  }

  /** Resize-to-fit: scale visual media so the longest side fits
    * `maxDim`, preserving aspect (never upscales). Same partition-
    * iterator shape as decode — the real implementation would resample
    * the payload; the stub computes the geometry the resampler would
    * use. Audio is pass-through-excluded (no spatial dims). */
  def resizeToFit(media: DataFrame, maxDim: Int): Dataset[ResizedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    decodeMeta(media.filter(col("kind") =!= "audio"))
      .mapPartitions { it =>
        // per-partition "resampler init" would sit here, like decodeMeta
        it.map { m =>
          val s = math.min(math.min(maxDim.toDouble / m.width,
            maxDim.toDouble / m.height), 1.0)
          ResizedMeta(m.media_id, m.kind, m.width, m.height,
            math.floor(m.width * s).toInt, math.floor(m.height * s).toInt, s)
        }
      }
  }
}
