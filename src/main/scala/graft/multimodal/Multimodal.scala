package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata, processed per partition in
  * fixed-size batches (the shape a real decoder — JPEG, resampler,
  * frame sampler — needs for vectorized execution).
  *
  * The Spark side (schema, partitioning, batch iteration, feature
  * schema) is real and tested; the DECODE STEP IS A DETERMINISTIC STUB
  * (`fakeDecode`) because no image/audio codec ships in this
  * environment — swap `fakeDecode` for a real codec call and nothing
  * else changes. At 100 TB the binary payloads stay distributed
  * (mapPartitions; no collect) and feature extraction is embarrassingly
  * parallel.
  */
object Multimodal {

  /** Doc-id projection for the synthetic generators, spread across the
    * session's full parallelism: the documents table is one small
    * parquet file, so without the repartition every generator's
    * encode — and the REAL decode downstream of it — would run in a
    * single task. The shuffle moves only 8-byte ids; the media bytes
    * themselves are born distributed. */
  private def ids(spark: SparkSession, documents: DataFrame): Dataset[Long] = {
    import spark.implicits._
    documents.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
  }

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           byte_sum: Long, distinct_bytes: Long, mean_byte_bp: Long)

  /** STUB decoder: byte-level statistics standing in for a real decode
    * (deterministic, so the oracle can re-derive it). Replace with a
    * codec (e.g. javax.imageio / ffmpeg bindings) in production. */
  def fakeDecode(payload: Array[Byte]): (Long, Long, Long) = {
    var sum = 0L
    val seen = new Array[Boolean](256)
    var distinct = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      sum += b
      if (!seen(b)) { seen(b) = true; distinct += 1 }
      i += 1
    }
    (sum, distinct, if (payload.length == 0) 0L else math.floor(10000.0 * sum / payload.length).toLong)
  }

  /** Per-partition batched feature extraction over the binary column —
    * the `mapInPandas`-style batch loop, JVM-native. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a vectorized decoder would run once per batch
        batch.iterator.map { row =>
          val (sum, distinct, meanBp) = fakeDecode(row.payload)
          MediaFeatures(row.media_id, row.kind, row.payload.length.toLong, sum, distinct, meanBp)
        }
      }
    }
  }

  /** Deterministic PATTERNED PNG per document, with near-duplicate
    * group structure for the perceptual-hash dedup path: documents in
    * the same `doc_id % 40` group share one sinusoidal luma pattern
    * (frequency/phase derived from the group), and differ only by a
    * per-id uniform brightness shift plus two brightened id-dependent
    * pixels — the edits a dHash is designed to see through. Distinct
    * groups get distinct frequencies, i.e. genuinely different images.
    * Encoded as REAL PNGs on the executors; the dedup query decodes
    * actual pixels back. */
  def syntheticPatternImages(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    ids(spark, documents).map { id =>
      val (w, h) = (18, 16)
      val g = (id % 40).toInt
      val kx = 0.25 + 0.13 * (g % 5)
      val ky = 0.2 + 0.17 * ((g / 5) % 4)
      val phase = (g % 7) * math.Pi / 7.0
      val bright = ((id / 40) % 30).toInt - 15
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var luma = 128 + bright + (90 * math.sin(kx * x + ky * y + phase)).toInt
          // Two id-dependent brightened pixels: small local damage a
          // perceptual hash should tolerate.
          val pos = y * w + x
          if (pos == (id * 31 % (w * h)) || pos == (id * 17 % (w * h))) luma += 40
          val v = math.max(0, math.min(255, luma))
          img.setRGB(x, y, v * 0x010101)
          x += 1
        }
        y += 1
      }
      MediaInit.touch() // memory-cached ImageIO streams on this executor JVM
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      MediaRow(id, "image", bos.toByteArray)
    }
  }

  /** Deterministic synthetic PNG per document: dimensions and fill
    * color are pure arithmetic on doc_id, then a REAL PNG encode on the
    * executors. Downstream `MediaOps.imageMeta` must recover exactly
    * the arithmetic values by decoding actual pixels — which makes the
    * whole real-codec path oracle-checkable (the oracle re-derives the
    * expected metadata from doc_id in SQL). */
  def syntheticImages(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    ids(spark, documents).map { id =>
      val w = 8 + (id % 16).toInt
      val h = 8 + ((id / 16) % 8).toInt
      val rgb = ((id * 2654435761L) & 0xffffffL).toInt
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      MediaInit.touch() // memory-cached ImageIO streams on this executor JVM
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      MediaRow(id, "image", bos.toByteArray)
    }
  }

  /** Deterministic PATTERNED WAV per document, with near-duplicate
    * group structure for the audio-fingerprint dedup path: documents
    * in the same `doc_id % 40` group share one sinusoidal amplitude
    * ENVELOPE over 64 windows (the fingerprint's feature), and differ
    * only by a per-id uniform gain plus one boosted id-dependent
    * window — edits an energy-contour fingerprint sees through.
    * Distinct groups get distinct envelope frequencies. Written as
    * REAL RIFF/WAVE containers; the dedup query decodes actual PCM. */
  def syntheticPatternWavs(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    ids(spark, documents).map { id =>
      val sampleRate = 8000
      val (nWin, winLen) = (64, 32)
      val g = (id % 40).toInt
      val k = 0.15 + 0.11 * (g % 5)
      val phase = (g % 7) * math.Pi / 7.0
      val gainPct = 60 + ((id / 40) % 5).toInt * 10        // 60..100%
      val boosted = (id * 13 % nWin).toInt
      val data = new Array[Byte](nWin * winLen)
      var w = 0
      while (w < nWin) {
        var env = 55 + (35 * math.sin(k * w + phase)).toInt
        if (w == boosted) env += 25
        val amp = math.min(127, env * gainPct / 100)
        var i = 0
        while (i < winLen) {
          data(w * winLen + i) = (128 + (if (i % 2 == 0) amp else -amp)).toByte
          i += 1
        }
        w += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 8, 1, false, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, data.length.toLong)
      MediaOps.writeAudio(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      MediaRow(id, "audio", bos.toByteArray)
    }
  }

  /** Deterministic synthetic WAV per document: 8-bit mono PCM square
    * wave whose frame count and amplitude are pure arithmetic on
    * doc_id, written as a REAL RIFF/WAVE container on the executors.
    * `MediaOps.audioMeta` must recover exactly those values by decoding
    * the container through javax.sound — making the audio path
    * oracle-checkable like the image path. */
  def syntheticWavs(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    ids(spark, documents).map { id =>
      val sampleRate = 8000
      val n = 400 + (id % 100).toInt * 4                   // even frame count
      val amp = 32 + (id % 64).toInt                       // |sample - 128|
      val data = new Array[Byte](n)
      var i = 0
      while (i < n) { data(i) = (128 + (if (i % 2 == 0) amp else -amp)).toByte; i += 1 }
      val bos = new java.io.ByteArrayOutputStream()
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 8, 1, false, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong)
      // cached-SPI write: AudioSystem.write re-discovers providers per
      // call, which serializes the 32-thread encode stage (see MediaOps)
      MediaOps.writeAudio(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      MediaRow(id, "audio", bos.toByteArray)
    }
  }

  /** Deterministic minimal-but-valid MP4 (ISO-BMFF) container per
    * document: ftyp + moov/mvhd with timescale/duration arithmetic on
    * doc_id. `MediaOps.videoMeta` must recover the values by actually
    * walking the box structure — the metadata half of the video path,
    * oracle-checkable like images and audio. */
  def syntheticMp4s(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    ids(spark, documents).map { id =>
      val timescale = 600L
      val duration = 600L + (id % 1000) * 3
      def be32(v: Long): Array[Byte] = Array(
        ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      val ftyp = be32(16) ++ "ftyp".getBytes("ISO-8859-1") ++
        "isom".getBytes("ISO-8859-1") ++ be32(0)
      // mvhd v0: version/flags + ctime mtime timescale duration + rate
      // volume/reserved + matrix + predefined + next_track = 100-byte body
      val mvhdBody = be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration) ++
        be32(0x00010000L) ++ Array.fill[Byte](10)(0) ++ Array[Byte](0x01, 0) ++
        Array.fill[Byte](36 - 8)(0) ++ be32(0x00010000L) ++ be32(0x40000000L) ++
        Array.fill[Byte](24)(0) ++ be32(2)
      val mvhd = be32(8L + mvhdBody.length) ++ "mvhd".getBytes("ISO-8859-1") ++ mvhdBody
      val moov = be32(8L + mvhd.length) ++ "moov".getBytes("ISO-8859-1") ++ mvhd
      MediaRow(id, "video", ftyp ++ moov)
    }
  }

  /** Frame geometry/count for a synthetic AVI: pure arithmetic on
    * doc_id so the DuckDB oracle can re-derive it in SQL. */
  def aviFrameSpec(id: Long): (Int, Int, Int) =
    (8 + (id % 8).toInt, 8 + ((id / 8) % 8).toInt, 2 + (id % 4).toInt)

  /** Per-frame fill color: varies by frame index so a correct decoder
    * cannot pass by reading only the first frame. */
  def aviFrameRgb(id: Long, frameIdx: Int): Int =
    ((id * 2654435761L + frameIdx * 40503L) & 0xffffffL).toInt

  /** Deterministic Motion-PNG / Motion-JPEG AVI (RIFF) container per
    * document: frame count, dimensions, and per-frame fill color are
    * pure arithmetic on doc_id; every frame is a REAL javax.imageio
    * encode (codec "png" → MPNG stream handler, "jpg" → MJPG).
    * `MediaOps.videoFrames` must recover the values by walking the real
    * RIFF chunk structure and decoding actual frame pixels — the frame
    * half of the video path, oracle-checkable like images and audio.
    * PNG frames are lossless, so the oracle stays bit-exact; MJPEG
    * differs only in the encoder string and is spec-exercised with a
    * luma tolerance (JPEG quantizes). */
  def syntheticAvis(spark: SparkSession, documents: DataFrame,
                    codec: String = "png"): Dataset[MediaRow] = {
    import spark.implicits._
    ids(spark, documents)
      .map(id => MediaRow(id, "video", buildAvi(id, codec)))
  }

  /** Minimal-but-valid AVI writer (public RIFF layout: hdrl with
    * avih + strl(strh/strf), movi with one '00dc' chunk per frame,
    * chunks padded to even offsets). */
  def buildAvi(id: Long, codec: String): Array[Byte] = {
    val (w, h, n) = aviFrameSpec(id)
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
    def chunk(id4: String, body: Array[Byte]): Array[Byte] =
      fcc(id4) ++ le32(body.length.toLong) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(tpe: String, body: Array[Byte]): Array[Byte] = chunk("LIST", fcc(tpe) ++ body)
    val frames = (0 until n).map { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = aviFrameRgb(id, f)
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      MediaInit.touch() // memory-cached ImageIO streams on this executor JVM
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, codec, bos)
      bos.toByteArray
    }
    val handler = if (codec == "png") "MPNG" else "MJPG"
    // avih body (56 bytes): usec/frame, maxBytesPerSec, padding, flags,
    // dwTotalFrames, initialFrames, streams, sugBufSize, width, height,
    // reserved[4]
    val avih = chunk("avih", le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(n.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++ le32(w.toLong) ++ le32(h.toLong) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    // strh body: fccType, fccHandler, flags, prio/lang, initialFrames,
    // scale, rate, start, length(frames), bufSize, quality, sampleSize, rcFrame
    val strh = chunk("strh", fcc("vids") ++ fcc(handler) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++ le32(25) ++ le32(0) ++
      le32(n.toLong) ++ le32(0) ++ le32(0xffffffffL) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    // strf = BITMAPINFOHEADER (40 bytes)
    val strf = chunk("strf", le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++
      le16(1) ++ le16(24) ++ fcc(handler) ++ le32(w.toLong * h * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", frames.iterator.flatMap(fb => chunk("00dc", fb)).toArray)
    val riffBody = fcc("AVI ") ++ hdrl ++ movi
    fcc("RIFF") ++ le32(riffBody.length.toLong) ++ riffBody
  }

  /** Build a deterministic synthetic media table from the documents table
    * (UTF-8 text bytes as stand-in payloads) — exercises the exact
    * plumbing a parquet `binary` column takes. */
  def syntheticMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(
      col("doc_id").as("media_id"),
      concat(lit("kind_"), (col("doc_id") % 3).cast("string")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
