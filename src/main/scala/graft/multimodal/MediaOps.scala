package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoders}

/** Typed media operations over opaque binary payloads: decode, resize,
  * frame-sample — the operator surface an image/audio/video training
  * pipeline needs.
  *
  * THE CODECS ARE DETERMINISTIC STUBS (this environment ships no
  * image/audio libraries): `decodeMeta` derives metadata from payload
  * bytes, `resize`/`frameSample` transform that metadata and subset
  * payload bytes deterministically. Everything around the stubs is the
  * real distributed shape — typed Datasets, per-partition batched
  * iteration (where a vectorized codec would run), explicit output
  * schemas — so swapping in javax.imageio / ffmpeg changes only the
  * function bodies marked STUB.
  */
object MediaOps {
  case class MediaMeta(media_id: Long, kind: String, width: Int, height: Int,
                       channels: Int, duration_ms: Long)
  case class Frame(media_id: Long, frame_idx: Int, payload: Array[Byte])

  /** STUB decode: deterministic metadata from byte statistics (a real
    * impl reads the container header). */
  def decodeMetaStub(m: Multimodal.MediaRow): MediaMeta = {
    val n = m.payload.length
    val w = 16 + (if (n == 0) 0 else (m.payload(0) & 0x3f))
    val h = 16 + (if (n < 2) 0 else (m.payload(n / 2) & 0x3f))
    MediaMeta(m.media_id, m.kind, w, h, channels = 3, duration_ms = n.toLong * 10)
  }

  def decodeMeta(media: Dataset[Multimodal.MediaRow], batchSize: Int = 64): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    media.mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map(decodeMetaStub)))
  }

  /** STUB resize: scales stub metadata, keeps a deterministic byte
    * subsample standing in for re-encoded pixels. */
  def resize(media: Dataset[Multimodal.MediaRow], maxSide: Int,
             batchSize: Int = 64): Dataset[Multimodal.MediaRow] = {
    implicit val enc = Encoders.product[Multimodal.MediaRow]
    media.mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map { m =>
      val keep = math.max(1, math.min(m.payload.length, maxSide * maxSide / 16))
      m.copy(payload = m.payload.take(keep))
    }))
  }

  /** STUB frame sampling: every `stride`-th byte window becomes a
    * "frame" (a real impl seeks keyframes). Emits (media, frame_idx,
    * bytes) — the explode shape video pipelines shuffle on. */
  def frameSample(media: Dataset[Multimodal.MediaRow], stride: Int,
                  frameBytes: Int = 32): Dataset[Frame] = {
    implicit val enc = Encoders.product[Frame]
    media.flatMap { m =>
      m.payload.grouped(stride).zipWithIndex.collect {
        case (chunk, idx) if idx % 2 == 0 =>
          Frame(m.media_id, idx, chunk.take(frameBytes))
      }
    }
  }
}
