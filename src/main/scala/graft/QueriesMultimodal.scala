package graft

import org.apache.spark.sql.functions._

import graft.functions.Multimodal

/** Multimodal-column queries. The media table is synthesized from
  * `documents` (payload = utf-8 bytes of the text, kind by residue) so
  * the stub decoder's byte-derived features are expressible over the
  * text in DuckDB (ascii(substr(...)) == byte value for ASCII text) —
  * the Spark side genuinely routes BINARY payloads through the typed
  * mapPartitions decode.
  */
object QueriesMultimodal {

  import Queries.{Q, QDef}

  private val KindSql =
    "CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END"

  val defs: Map[String, QDef] = Map(

    // ---- mm1: binary payload -> typed metadata via mapPartitions ----
    "mm1_decode_meta" -> QDef(
      (s, dir) => {
        val media = Tables.documents(s, dir).select(
          col("doc_id").as("media_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("kind"),
          col("text").cast("binary").as("payload"))
        Multimodal.decodeMeta(media).toDF()
      },
      Some(s"""SELECT doc_id AS media_id,
              |  $KindSql AS kind,
              |  CAST(length(text) AS INT) AS n_bytes,
              |  CAST(ascii(substr(text, 1, 1)) % 128 + 16 AS INT) AS width,
              |  CAST(ascii(substr(text, 2, 1)) % 128 + 16 AS INT) AS height,
              |  CAST(CASE WHEN doc_id % 3 = 2 THEN length(text) // 256 ELSE 1 END AS INT) AS n_frames,
              |  (ascii(substr(text, 1, 1)) + ascii(substr(text, length(text), 1))) / 2.0 AS brightness
              |FROM documents""".stripMargin)),

    // ---- mm2: frame sampling (offsets only — payload never shuffles) ----
    "mm2_frame_sample" -> QDef(
      (s, dir) => {
        val media = Tables.documents(s, dir).select(
          col("doc_id").as("media_id"),
          when(col("doc_id") % 3 === 2, "video").otherwise("image").as("kind"),
          col("text").cast("binary").as("payload"))
        Multimodal.sampleFrames(media, stride = 64)
      },
      Some("""SELECT doc_id AS media_id, CAST(f AS INT) AS frame_no,
             |  CAST(f * 64 AS INT) AS offset
             |FROM (SELECT doc_id, length(text) AS n, unnest(generate_series(0, (length(text) - 1) // 64)) AS f
             |      FROM documents WHERE doc_id % 3 = 2)""".stripMargin)),

    // ---- mm3: resize-to-fit — longest side <= 64, aspect preserved,
    //      never upscaled; geometry via the same partition-iterator
    //      decode (audio excluded: no spatial dims) ----
    "mm3_resize" -> QDef(
      (s, dir) => {
        val media = Tables.documents(s, dir).select(
          col("doc_id").as("media_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("kind"),
          col("text").cast("binary").as("payload"))
        Multimodal.resizeToFit(media, maxDim = 64).toDF()
      },
      Some(s"""WITH m AS (SELECT doc_id AS media_id,
              |  $KindSql AS kind,
              |  CAST(ascii(substr(text, 1, 1)) % 128 + 16 AS INT) AS width,
              |  CAST(ascii(substr(text, 2, 1)) % 128 + 16 AS INT) AS height
              |FROM documents WHERE doc_id % 3 <> 1),
              |sc AS (SELECT *, least(64.0 / width, 64.0 / height, 1.0) AS scale FROM m)
              |SELECT media_id, kind, width, height,
              |  CAST(floor(width * scale) AS INT) AS new_width,
              |  CAST(floor(height * scale) AS INT) AS new_height,
              |  scale
              |FROM sc""".stripMargin)),

    // ---- mm6: REAL audio-header decode — structurally valid WAV
    //      (RIFF/WAVE chunk walk, little-endian fmt/data) and AIFF
    //      (FORM/AIFF, big-endian COMM with a genuine 80-bit extended-
    //      float sample rate) bytes synthesized from doc_id, parsed
    //      back by the actual container parser. Covers BOTH endian
    //      conventions and the IEEE-754-extended decode; the oracle
    //      recomputes every planted field relationally, so a parser
    //      that misreads any of them goes red. ----
    "mm6_audio_header" -> QDef(
      (s, dir) => {
        import s.implicits._
        val media = Tables.documents(s, dir)
          .select(col("doc_id")).as[Long]
          .mapPartitions { it =>
            val rates = Array(8000, 16000, 22050, 44100, 48000)
            val depths = Array(8, 16, 24, 32)
            it.map { id =>
              val sr = rates((id % 5).toInt)
              val ch = (id % 2 + 1).toInt
              val bits = depths((id % 4).toInt)
              val n = id % 1000 + 1
              val payload =
                if (id % 2 == 0) Multimodal.encodeWavHeader(sr, ch, bits, n)
                else Multimodal.encodeAiffHeader(sr, ch, bits, n)
              (id, payload)
            }
          }.toDF("media_id", "payload")
        Multimodal.decodeAudioHeaders(media).toDF()
      },
      Some("""SELECT doc_id AS media_id,
             |  CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'aiff' END AS format,
             |  CAST(CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
             |       WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END AS INT)
             |    AS sample_rate,
             |  CAST(doc_id % 2 + 1 AS INT) AS channels,
             |  CAST(CASE doc_id % 4 WHEN 0 THEN 8 WHEN 1 THEN 16
             |       WHEN 2 THEN 24 ELSE 32 END AS INT) AS bits_per_sample,
             |  CAST(doc_id % 1000 + 1 AS BIGINT) AS n_samples,
             |  CAST((doc_id % 1000 + 1) * 1000 //
             |       (CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
             |        WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END)
             |    AS BIGINT) AS duration_ms
             |FROM documents""".stripMargin)),

    // ---- mm5: REAL image-header decode — structurally valid PNG/JPEG
    //      bytes (true signatures, IHDR with a real CRC32, SOF0 marker
    //      walk) synthesized deterministically from doc_id, then parsed
    //      back by the actual header parser (MediaDecoder.imageHeader —
    //      the same code path a real PNG/JPEG file's bytes would take).
    //      The oracle recomputes the planted dimensions relationally, so
    //      a parser that misreads any header field goes red. ----
    "mm5_image_header" -> QDef(
      (s, dir) => {
        import s.implicits._
        val media = Tables.documents(s, dir)
          .select(col("doc_id")).as[Long]
          .mapPartitions { it =>
            it.map { id =>
              val w = (id % 512 + 1).toInt
              val h = (id % 384 + 1).toInt
              val payload =
                if (id % 2 == 0)
                  Multimodal.encodePngHeader(w, h,
                    colorType = if (id % 4 == 0) 6 else 2)
                else
                  Multimodal.encodeJpegHeader(w, h,
                    channels = if (id % 3 == 1) 1 else 3)
              (id, payload)
            }
          }.toDF("media_id", "payload")
        Multimodal.decodeImageHeaders(media).toDF()
      },
      Some("""SELECT doc_id AS media_id,
             |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
             |  CAST(doc_id % 512 + 1 AS INT) AS width,
             |  CAST(doc_id % 384 + 1 AS INT) AS height,
             |  CAST(CASE WHEN doc_id % 2 = 0
             |            THEN CASE WHEN doc_id % 4 = 0 THEN 4 ELSE 3 END
             |            ELSE CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 3 END
             |       END AS INT) AS channels
             |FROM documents""".stripMargin)),

    // ---- mm4: feature extraction — per-media byte histogram (8 bins),
    //      long-form (media_id, bin, n), only occupied bins. Completes
    //      the decode / extract / resize / sample matrix; one narrow
    //      pass over the payloads, features-only shuffle. ----
    "mm4_features" -> QDef(
      (s, dir) => {
        val media = Tables.documents(s, dir).select(
          col("doc_id").as("media_id"),
          col("text").cast("binary").as("payload"))
        Multimodal.byteHistogram(media, nBins = 8).toDF()
      },
      Some("""SELECT doc_id AS media_id,
             |  CAST(ascii(substr(text, i, 1)) % 8 AS INT) AS bin,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
             |      FROM documents)
             |GROUP BY 1, 2""".stripMargin))
  )
}
