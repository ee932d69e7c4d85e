package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractFeatures computes exact byte statistics over binary payloads") {
    val media = Seq(
      Multimodal.MediaRow(1L, "kind_1", "abc".getBytes("UTF-8")),
      Multimodal.MediaRow(2L, "kind_2", Array[Byte]())).toDS()
    val out = Multimodal.extractFeatures(media, batchSize = 2).collect()
      .map(f => f.media_id -> f).toMap
    val a = out(1L)
    assert(a.n_bytes === 3L)
    assert(a.byte_sum === ('a' + 'b' + 'c').toLong)
    assert(a.distinct_bytes === 3L)
    assert(a.mean_byte_bp === math.floor(10000.0 * ('a' + 'b' + 'c') / 3).toLong)
    val b = out(2L)
    assert(b.n_bytes === 0L && b.byte_sum === 0L && b.mean_byte_bp === 0L)
  }

  test("MediaOps pins ImageIO to memory-cached streams (no temp file per image)") {
    // The disk-backed default (useCache=true) wraps every in-memory
    // byte-array read/write in a FileCache stream — one temp-file
    // create/write/delete per image, measured as a 3-5x tmpdir-state
    // swing on the decode family. MediaOps flips the process-wide
    // default once at class init; a decode call must have latched it.
    graft.multimodal.MediaOps.decodeImage(Array[Byte](1, 2, 3))
    assert(!javax.imageio.ImageIO.getUseCache,
      "MediaOps must disable ImageIO's disk-backed stream cache")
  }

  test("MediaOps decode/resize/frameSample keep the typed distributed shape") {
    import graft.multimodal.MediaOps
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val media = Multimodal.syntheticMedia(spark, docs)
    val meta = MediaOps.decodeMeta(media)
    assert(meta.count() === media.count())
    val m0 = meta.filter(_.media_id == 0L).head()
    assert(m0.channels === 3 && m0.width >= 16 && m0.duration_ms > 0)
    // deterministic: same input -> same metadata
    assert(MediaOps.decodeMeta(media).filter(_.media_id == 0L).head() === m0)
    val small = MediaOps.resize(media, maxSide = 8)
    assert(small.filter(_.media_id == 0L).head().payload.length <= 4)
    val frames = MediaOps.frameSample(media.limit(5), stride = 50)
    assert(frames.count() > 0)
    assert(frames.collect().forall(f => f.payload.length <= 32 && f.frame_idx % 2 == 0))
  }

  test("imageMeta decodes real PNG pixels via javax.imageio") {
    import graft.multimodal.MediaOps
    // 40x20 image: left half black, right half white -> mean luma ~50%.
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png(40, 20)),
      Multimodal.MediaRow(2L, "image", png(8, 8)),
      Multimodal.MediaRow(3L, "not_image", "plain text".getBytes("UTF-8"))).toDS()
    val out = MediaOps.imageMeta(media).collect().map(m => m.media_id -> m).toMap
    assert(out.size === 2, "non-image payload must be dropped")
    assert(out(1L).width === 40 && out(1L).height === 20 && out(1L).channels === 3)
    assert(out(2L).width === 8 && out(2L).height === 8)
    // white pixel luma = (77+150+29)*255>>8 = 254; half white -> floor(10000*254/(2*255))
    val lumaWhite = (77 * 255 + 150 * 255 + 29 * 255) >> 8
    val expectBp = math.floor(10000.0 * (400L * lumaWhite) / (800L * 255)).toLong
    assert(out(1L).mean_luma_bp === expectBp)
  }

  test("resizeImage scales down through a real re-encode and passes non-images through") {
    import graft.multimodal.MediaOps
    val img = new java.awt.image.BufferedImage(64, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 64) img.setRGB(x, y, (x * 4) << 16)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(
      Multimodal.MediaRow(1L, "image", bos.toByteArray),
      Multimodal.MediaRow(2L, "not_image", "plain".getBytes("UTF-8"))).toDS()
    val out = MediaOps.resizeImage(media, maxSide = 16).collect().map(m => m.media_id -> m).toMap
    val resized = MediaOps.decodeImage(out(1L).payload)
    assert(resized.isDefined, "resized payload must re-decode as an image")
    assert(resized.get.getWidth === 16 && resized.get.getHeight === 8)
    assert(java.util.Arrays.equals(out(2L).payload, "plain".getBytes("UTF-8")))
  }

  test("audioMeta decodes real WAV containers via javax.sound") {
    import graft.multimodal.MediaOps
    val docs = spark.read.parquet(s"$Sf/documents.parquet").limit(10)
    val media = Multimodal.syntheticWavs(spark, docs)
    val out = MediaOps.audioMeta(media).collect().map(m => m.media_id -> m).toMap
    assert(out.size === 10)
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val m = out(id)
      assert(m.sample_rate === 8000 && m.channels === 1)
      assert(m.n_frames === 400L + (id % 100) * 4)
      assert(m.mean_abs === 32L + id % 64, s"doc $id amplitude")
    }
    // non-audio payloads are dropped
    val junk = Seq(Multimodal.MediaRow(99L, "not_audio", "hello".getBytes)).toDS()
    assert(MediaOps.audioMeta(junk).count() === 0)
  }

  test("videoMeta walks real ISO-BMFF box structure") {
    import graft.multimodal.MediaOps
    val docs = spark.read.parquet(s"$Sf/documents.parquet").limit(10)
    val media = Multimodal.syntheticMp4s(spark, docs)
    val out = MediaOps.videoMeta(media).collect().map(m => m.media_id -> m).toMap
    assert(out.size === 10)
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val m = out(id)
      assert(m.timescale === 600L)
      assert(m.duration_units === 600L + (id % 1000) * 3)
      assert(m.duration_ms === m.duration_units * 1000 / 600)
      assert(m.n_boxes === 3) // ftyp + moov + mvhd
    }
    // non-BMFF payloads are dropped
    val junk = Seq(Multimodal.MediaRow(99L, "not_video", "hello world!".getBytes)).toDS()
    assert(MediaOps.videoMeta(junk).count() === 0)
  }

  test("videoFrames walks real RIFF/AVI structure and decodes Motion-PNG frames exactly") {
    import graft.multimodal.MediaOps
    val docs = spark.read.parquet(s"$Sf/documents.parquet").limit(10)
    val media = Multimodal.syntheticAvis(spark, docs)
    val out = MediaOps.videoFrames(media).collect()
      .map(f => (f.media_id, f.frame_idx) -> f).toMap
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val (w, h, n) = Multimodal.aviFrameSpec(id)
      val mine = out.keys.filter(_._1 == id)
      assert(mine.size === n, s"doc $id: expected $n decoded frames")
      (0 until n).foreach { idx =>
        val f = out((id, idx))
        assert(f.width === w && f.height === h, s"doc $id frame $idx dims")
        assert(f.declared_frames === n)
        val rgb = Multimodal.aviFrameRgb(id, idx)
        val luma = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) + 29 * (rgb & 0xff)) >> 8
        val expectBp = math.floor(10000.0 * (w.toLong * h * luma) / (w.toLong * h * 255)).toLong
        assert(f.mean_luma_bp === expectBp, s"doc $id frame $idx luma (PNG is lossless)")
      }
    }
    // non-AVI payloads are dropped
    val junk = Seq(Multimodal.MediaRow(99L, "not_video", "RIFFnope".getBytes)).toDS()
    assert(MediaOps.videoFrames(junk).count() === 0)
  }

  test("videoFrames decodes MJPEG frames: exact structure, luma within JPEG tolerance") {
    import graft.multimodal.MediaOps
    val docs = spark.read.parquet(s"$Sf/documents.parquet").limit(10)
    val media = Multimodal.syntheticAvis(spark, docs, codec = "jpg")
    val out = MediaOps.videoFrames(media).collect()
      .map(f => (f.media_id, f.frame_idx) -> f).toMap
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val (w, h, n) = Multimodal.aviFrameSpec(id)
      (0 until n).foreach { idx =>
        val f = out((id, idx))
        // container + dimensions are exact; pixel values are NOT (JPEG
        // quantizes), so the luma check is a tolerance, not equality
        assert(f.width === w && f.height === h && f.declared_frames === n)
        val rgb = Multimodal.aviFrameRgb(id, idx)
        val luma = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) + 29 * (rgb & 0xff)) >> 8
        val expectBp = math.floor(10000.0 * luma / 255).toLong
        assert(math.abs(f.mean_luma_bp - expectBp) <= 500,
          s"doc $id frame $idx: ${f.mean_luma_bp} vs ~$expectBp")
      }
    }
  }

  test("syntheticMedia preserves ids and carries UTF-8 payloads") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val media = Multimodal.syntheticMedia(spark, docs)
    assert(media.count() === docs.count())
    val row = media.filter(_.media_id == 0L).head()
    val text = docs.where("doc_id = 0").select("text").head.getString(0)
    assert(new String(row.payload, "UTF-8") === text)
  }

  test("dHash sees through brightness shifts and pixel damage, separates patterns") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(0, 120).select(col("id").as("doc_id"))
    val media = Multimodal.syntheticPatternImages(spark, docs)
    val hashes = graft.multimodal.MediaOps.imageDHash(media)
      .collect().map(h => h.media_id -> h.phash).toMap
    assert(hashes.size === 120, "every PNG must decode")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // ids 0 and 40 and 80: same pattern group, different brightness +
    // damage — the perceptual hash must call them near-identical.
    assert(ham(hashes(0L), hashes(40L)) <= 6, s"got ${ham(hashes(0L), hashes(40L))}")
    assert(ham(hashes(40L), hashes(80L)) <= 6, s"got ${ham(hashes(40L), hashes(80L))}")
    // Different sinusoid frequencies are genuinely different images.
    assert(ham(hashes(0L), hashes(1L)) > 6, s"got ${ham(hashes(0L), hashes(1L))}")
    // Pair recovery through the blocked join: each (0,40)-style pair
    // must survive the 8-segment pigeonhole at maxDist=6.
    val pairs = graft.multimodal.MediaOps.phashPairs(
        graft.multimodal.MediaOps.imageDHash(media).toDF(), maxDist = 6)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 40L)) || ham(hashes(0L), hashes(40L)) > 6)
    assert(pairs.nonEmpty)
    // Blocking is lossless at this radius: pairs == all hash pairs
    // within distance 6 (brute-force check over the 120 hashes).
    val brute = (for {
      (i, hi) <- hashes.toSeq; (j, hj) <- hashes.toSeq
      if i < j && ham(hi, hj) <= 6
    } yield (i, j)).toSet
    assert(pairs === brute, s"blocked join missed ${(brute -- pairs).take(5)}")
  }

  test("audio fingerprint sees through gain and a boosted window, separates envelopes") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(0, 120).select(col("id").as("doc_id"))
    val media = Multimodal.syntheticPatternWavs(spark, docs)
    val hashes = graft.multimodal.MediaOps.audioFingerprint(media)
      .collect().map(h => h.media_id -> h.phash).toMap
    assert(hashes.size === 120, "every WAV must decode")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // Same envelope group at different gains + damage: near-identical.
    assert(ham(hashes(0L), hashes(40L)) <= 6, s"got ${ham(hashes(0L), hashes(40L))}")
    assert(ham(hashes(40L), hashes(80L)) <= 6, s"got ${ham(hashes(40L), hashes(80L))}")
    // Different envelope frequencies are genuinely different audio.
    assert(ham(hashes(0L), hashes(1L)) > 6, s"got ${ham(hashes(0L), hashes(1L))}")
    // Blocked pairing is lossless at this radius.
    val pairs = graft.multimodal.MediaOps.phashPairs(
        graft.multimodal.MediaOps.audioFingerprint(media).toDF(), maxDist = 6)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val brute = (for {
      (i, hi) <- hashes.toSeq; (j, hj) <- hashes.toSeq
      if i < j && ham(hi, hj) <= 6
    } yield (i, j)).toSet
    assert(pairs === brute, s"blocked join missed ${(brute -- pairs).take(5)}")
    assert(pairs.nonEmpty)
  }

  test("survivor terminals equal brute-force union-find over the same pairs") {
    // The per-media survivor output (linear in the corpus) must carry
    // exactly the pair-derived component structure the per-pair query
    // (quadratic in duplicate density) exposes — for BOTH modalities.
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val cases: Seq[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)] = Seq(
      (graft.queries.VectorQueries.mmPhashSurvivors(spark, Sf),
        graft.multimodal.MediaOps.phashPairs(graft.multimodal.MediaOps
          .imageDHash(Multimodal.syntheticPatternImages(spark, docs)).toDF(), 6)),
      (graft.queries.VectorQueries.mmAudioFpSurvivors(spark, Sf),
        graft.multimodal.MediaOps.phashPairs(graft.multimodal.MediaOps
          .audioFingerprint(Multimodal.syntheticPatternWavs(spark, docs)).toDF(), 6)))
    for ((survivorsDf, pairsDf) <- cases) {
      val got = survivorsDf.select("media_id", "survivor_id", "cluster_size")
        .as[(Long, Long, Long)].collect().toSet
      assert(got.nonEmpty)
      // Brute-force reference: union-find over the raw (unlimited)
      // pair list, canonical = component min, size = member count.
      val pairs = pairsDf.select("id1", "id2").as[(Long, Long)].collect()
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val members = parent.keys.toSeq.groupBy(find)
      val expect = members.flatMap { case (_, ms) =>
        val canon = ms.min
        ms.map(m => (m, canon, ms.size.toLong))
      }.toSet
      assert(got === expect,
        s"diff: got-only=${(got -- expect).take(3)} expect-only=${(expect -- got).take(3)}")
    }
  }
}
