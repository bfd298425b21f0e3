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

    /** REAL image-header parse: dispatch on magic bytes and read the
      * container's actual header fields — PNG IHDR (width/height
      * big-endian at offsets 16/20, channels from the color type),
      * JPEG marker walk to the first SOF frame header, GIF logical
      * screen descriptor, BMP BITMAPINFOHEADER. Returns
      * (format, width, height, channels), or None when the payload is
      * not an image this parser knows — callers fall back to
      * [[decodeStub]] for those (the synthetic text-byte fixtures of
      * mm1-mm4 never match an image magic, so their byte-derived
      * semantics are unchanged). Works on any real PNG/JPEG/GIF/BMP
      * file's bytes, not just the mm5 fixtures. */
    def imageHeader(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
      if (b == null) return None // null cells must parse as "not an image"
      def u8(i: Int): Int = b(i) & 0xFF
      def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      def be32(i: Int): Int =
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def le32(i: Int): Int =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      if (b.length >= 26 && u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
          b(3) == 'G' && new String(b.slice(12, 16), "US-ASCII") == "IHDR") {
        // IHDR is mandated to be the first chunk: data starts at 16
        val ch = u8(25) match { // color type -> sample channels
          case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
          case _ => -1
        }
        if (ch < 0) None else Some(("png", be32(16), be32(20), ch))
      } else if (b.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
        // JPEG: walk marker segments to the first SOFn (C0-CF minus the
        // non-frame C4/C8/CC); its payload is precision, height, width,
        // component count
        var i = 2
        var out: Option[(String, Int, Int, Int)] = None
        var bad = false
        while (out.isEmpty && !bad && i + 9 < b.length) {
          if (u8(i) != 0xFF) bad = true
          else if (u8(i + 1) == 0xFF) i += 1 // spec-legal fill byte run
          else u8(i + 1) match {
            case m if m == 0x01 || (m >= 0xD0 && m <= 0xD9) => i += 2 // standalone
            case m if m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC =>
              out = Some(("jpeg", be16(i + 7), be16(i + 5), u8(i + 9)))
            case _ => i += 2 + be16(i + 2) // skip segment by its length
          }
        }
        out
      } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
                 b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
        Some(("gif", le16(6), le16(8), 3))
      } else if (b.length >= 30 && b(0) == 'B' && b(1) == 'M' && le32(14) == 40) {
        // biHeight is SIGNED: negative = top-down row order (common for
        // screenshots/DIBs) — magnitude is the pixel height either way;
        // a raw negative would flow into resizeToFit as a negative scale
        val h = le32(22)
        if (h == Int.MinValue) None
        else Some(("bmp", le32(18), math.abs(h), math.max(le16(28) / 8, 1)))
      } else None
    }

    /** Decode one media payload: REAL header parse when the magic bytes
      * identify a known image container, byte-derived stub otherwise
      * (this container ships no full codecs — see the object scaladoc).
      * Null/empty payloads — routine in a real binary-column ingest —
      * decode to a zeroed row instead of crashing the executor task. */
    def decode(id: Long, kind: String, payload: Array[Byte]): MediaMeta =
      if (payload == null || payload.isEmpty)
        MediaMeta(id, kind, 0, 0, 0, n_frames = 0, brightness = 0.0)
      else imageHeader(payload) match {
        case Some((_, w, h, _)) =>
          val b0 = payload.head & 0xFF
          val bLast = payload.last & 0xFF
          MediaMeta(id, kind, payload.length, w, h,
            n_frames = if (kind == "video") payload.length / 256 else 1,
            brightness = (b0 + bLast) / 2.0)
        case None => decodeStub(id, kind, payload)
      }

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
        it.map { case (id, kind, bytes) => decoder.decode(id, kind, bytes) }
      }
  }

  final case class ImageHeader(
      media_id: Long, format: String, width: Int, height: Int, channels: Int)

  /** Parse REAL image headers from a (media_id, payload BINARY) table —
    * the genuine binary-column path: bytes in, container-header fields
    * out, one partition-iterator pass, nothing but the parsed KB-scale
    * metadata ever shuffles. Non-image payloads are dropped (a real
    * ingest would quarantine them). */
  def decodeImageHeaders(media: DataFrame): Dataset[ImageHeader] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").as[Long], col("payload").as[Array[Byte]])
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decoder = MediaDecoder
        it.flatMap { case (id, bytes) =>
          decoder.imageHeader(bytes).map { case (f, w, h, c) =>
            ImageHeader(id, f, w, h, c) }
        }
      }
  }

  /** Structurally valid PNG header bytes: signature + IHDR (real CRC32)
    * + IEND — what an image fixture generator produces so the parser is
    * exercised on genuine container bytes. colorType 2 = RGB (3ch),
    * 6 = RGBA (4ch). */
  def encodePngHeader(w: Int, h: Int, colorType: Int): Array[Byte] = {
    def be32(v: Int): Array[Byte] =
      Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val td = tag.getBytes("US-ASCII") ++ data
      val crc = new java.util.zip.CRC32()
      crc.update(td)
      be32(data.length) ++ td ++ be32(crc.getValue.toInt)
    }
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n')
    val ihdr = be32(w) ++ be32(h) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0) // depth 8, deflate, no interlace
    sig ++ chunk("IHDR", ihdr) ++ chunk("IEND", Array.empty[Byte])
  }

  /** Structurally valid JPEG header bytes: SOI + APP0/JFIF + SOF0 with
    * the frame dimensions and component count + EOI. */
  def encodeJpegHeader(w: Int, h: Int, channels: Int): Array[Byte] = {
    def be16(v: Int): Array[Byte] = Array[Byte]((v >>> 8).toByte, v.toByte)
    val soi = Array[Byte](0xFF.toByte, 0xD8.toByte)
    val app0 = Array[Byte](0xFF.toByte, 0xE0.toByte) ++ be16(16) ++
      "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0) ++ be16(1) ++ be16(1) ++ Array[Byte](0, 0)
    val comps = (1 to channels).flatMap(c =>
      Array[Byte](c.toByte, 0x11, 0)).toArray
    val sof0 = Array[Byte](0xFF.toByte, 0xC0.toByte) ++ be16(8 + 3 * channels) ++
      Array[Byte](8) ++ be16(h) ++ be16(w) ++
      Array[Byte](channels.toByte) ++ comps
    val eoi = Array[Byte](0xFF.toByte, 0xD9.toByte)
    soi ++ app0 ++ sof0 ++ eoi
  }

  final case class AudioHeader(
      media_id: Long, format: String, sample_rate: Int, channels: Int,
      bits_per_sample: Int, n_samples: Long, duration_ms: Long)

  object AudioDecoder {
    /** REAL audio-container header parse: dispatch on magic bytes and
      * read the container's actual fields — RIFF/WAVE `fmt ` chunk
      * (little-endian: channels, sample rate, bits; `data` length /
      * block-align = sample count) and FORM/AIFF `COMM` chunk
      * (big-endian: channels, frame count, bits, sample rate as an
      * 80-bit IEEE 754 extended float). Chunk-walks both containers, so
      * it reads any structurally valid WAV/AIFF, not just the mm6
      * fixtures. Returns None for non-audio payloads. */
    def audioHeader(b: Array[Byte]): Option[AudioHeaderFields] = {
      if (b == null) return None // null cells must parse as "not audio"
      def u8(i: Int): Int = b(i) & 0xFF
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def le32(i: Int): Long =
        (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
          (u8(i + 3).toLong << 24)) & 0xFFFFFFFFL
      def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      def be32(i: Int): Long =
        ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) |
          u8(i + 3)) & 0xFFFFFFFFL
      def tag(i: Int): String = new String(b.slice(i, i + 4), "US-ASCII")
      // a chunk length is UNTRUSTED input: a malformed value (negative
      // after toInt, or huge) must end the walk as "not parseable",
      // never stall or walk i backwards — these parsers run inside
      // executor tasks over arbitrary binary columns
      val MaxChunk = 1L << 31
      if (b.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE") {
        // walk RIFF chunks for `fmt ` and `data` — the index is a LONG:
        // an accepted len near 2^31 would overflow an Int index to a
        // negative value whose `i + 8 <= length` guard still passes,
        // crashing b(negative) instead of ending the walk
        var i = 12L
        var fmt = Option.empty[(Int, Int, Int)] // (channels, rate, bits)
        var dataLen = -1L
        var bad = false
        while (!bad && i + 8 <= b.length && (fmt.isEmpty || dataLen < 0)) {
          val t = tag(i.toInt); val len = le32(i.toInt + 4)
          if (len < 0L || len >= MaxChunk) bad = true
          else {
            if (t == "fmt " && i + 24 <= b.length)
              fmt = Some((le16(i.toInt + 10), le32(i.toInt + 12).toInt,
                le16(i.toInt + 22)))
            else if (t == "data") dataLen = len
            i += 8L + len + (len & 1L) // chunks are word-aligned
          }
        }
        fmt.collect { case (ch, sr, bits) if dataLen >= 0 && ch > 0 && sr > 0 =>
          val n = dataLen / (ch.toLong * (bits / 8).max(1))
          AudioHeaderFields("wav", sr, ch, bits, n)
        }
      } else if (b.length >= 12 && tag(0) == "FORM" && tag(8) == "AIFF") {
        var i = 12L // Long index: same overflow guard as the RIFF walk
        var out = Option.empty[AudioHeaderFields]
        var bad = false
        while (!bad && i + 8 <= b.length && out.isEmpty) {
          val t = tag(i.toInt); val len = be32(i.toInt + 4)
          if (len < 0L || len >= MaxChunk) bad = true
          else {
            if (t == "COMM" && i + 26 <= b.length) {
              val ch = be16(i.toInt + 8)
              val n = be32(i.toInt + 10)
              val bits = be16(i.toInt + 14)
              // 80-bit extended float at i+16: 1 sign + 15 exponent
              // (bias 16383) + 64-bit mantissa with explicit leading 1
              val exp = be16(i.toInt + 16) & 0x7FFF
              val shift = 31 - (exp - 16383)
              val mantHi = be32(i.toInt + 18)
              // mantissa top-32 holds sr with its MSB (the explicit
              // leading 1) at bit 31; undo the normalization shift
              // (integer rates only — a shift outside [0,31] is some
              // other float, not a rate this parser understands)
              if (shift >= 0 && shift <= 31) {
                val sr = (mantHi >>> shift).toInt
                if (ch > 0 && sr > 0)
                  out = Some(AudioHeaderFields("aiff", sr, ch, bits, n))
              }
            }
            i += 8L + len + (len & 1L)
          }
        }
        out
      } else None
    }
  }

  final case class AudioHeaderFields(format: String, sampleRate: Int,
                                     channels: Int, bits: Int, nSamples: Long)

  /** Parse REAL audio headers from a (media_id, payload BINARY) table —
    * same shape as [[decodeImageHeaders]]: one partition-iterator pass,
    * only parsed metadata ever shuffles; non-audio payloads drop. */
  def decodeAudioHeaders(media: DataFrame): Dataset[AudioHeader] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").as[Long], col("payload").as[Array[Byte]])
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decoder = AudioDecoder
        it.flatMap { case (id, bytes) =>
          decoder.audioHeader(bytes).map { f =>
            AudioHeader(id, f.format, f.sampleRate, f.channels, f.bits,
              f.nSamples, f.nSamples * 1000L / f.sampleRate)
          }
        }
      }
  }

  /** Structurally valid WAV bytes: RIFF/WAVE with a PCM `fmt ` chunk
    * and an (empty-bodied, correctly sized) `data` chunk header. */
  def encodeWavHeader(sampleRate: Int, channels: Int, bits: Int,
                      nSamples: Long): Array[Byte] = {
    def le16(v: Int): Array[Byte] = Array[Byte](v.toByte, (v >>> 8).toByte)
    def le32(v: Long): Array[Byte] = Array[Byte](v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte)
    val blockAlign = channels * (bits / 8)
    val dataLen = nSamples * blockAlign
    "RIFF".getBytes("US-ASCII") ++ le32(36 + dataLen) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(sampleRate) ++ le32(sampleRate.toLong * blockAlign) ++
      le16(blockAlign) ++ le16(bits) ++
      "data".getBytes("US-ASCII") ++ le32(dataLen)
  }

  /** Structurally valid AIFF bytes: FORM/AIFF with a COMM chunk whose
    * sample rate is a genuine 80-bit extended float (integer rates). */
  def encodeAiffHeader(sampleRate: Int, channels: Int, bits: Int,
                       nSamples: Long): Array[Byte] = {
    def be16(v: Int): Array[Byte] = Array[Byte]((v >>> 8).toByte, v.toByte)
    def be32(v: Long): Array[Byte] = Array[Byte]((v >>> 24).toByte,
      (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val log2 = 31 - Integer.numberOfLeadingZeros(sampleRate)
    val exp = 16383 + log2
    val mantHi = (sampleRate.toLong << (31 - log2)) & 0xFFFFFFFFL
    "FORM".getBytes("US-ASCII") ++ be32(4 + 8 + 18) ++
      "AIFF".getBytes("US-ASCII") ++
      "COMM".getBytes("US-ASCII") ++ be32(18) ++ be16(channels) ++
      be32(nSamples) ++ be16(bits) ++
      be16(exp) ++ be32(mantHi) ++ be32(0L)
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
        it.flatMap { case (id, bytes0) =>
          val bytes = if (bytes0 == null) Array.empty[Byte] else bytes0
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
