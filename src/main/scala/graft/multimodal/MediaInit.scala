package graft.multimodal

/** One shared home for process-wide media-codec initialization, so
  * EVERY ImageIO consumer gets it on first touch of its own class —
  * [[MediaOps]] (decode paths) and [[Multimodal]] (synthetic encode
  * paths) both initialize through here. Previously only MediaOps set
  * the flag: an executor JVM that ran a synthetic-media generator
  * before any decode still used ImageIO's default DISK-backed stream
  * cache (one temp-file create/write/delete per image — the tmpdir
  * coupling that made decode timings swing 3-5x between quiet runs).
  *
  * `setUseCache(false)` is process-wide state, documented trade: this
  * standalone engine owns its JVMs; co-resident code decoding
  * very large images would switch from disk- to heap-backed caching.
  * Payloads here are bounded byte arrays, bit-identical either way. */
object MediaInit {
  val memCachedImageStreams: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** Referencing this forces the object initializer exactly once per
    * JVM (classloading is the synchronization). */
  def touch(): Unit = memCachedImageStreams
}
