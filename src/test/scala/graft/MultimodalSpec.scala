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

  test("syntheticMedia preserves ids and carries UTF-8 payloads") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val media = Multimodal.syntheticMedia(spark, docs)
    assert(media.count() === docs.count())
    val row = media.filter(_.media_id == 0L).head()
    val text = docs.where("doc_id = 0").select("text").head.getString(0)
    assert(new String(row.payload, "UTF-8") === text)
  }
}
