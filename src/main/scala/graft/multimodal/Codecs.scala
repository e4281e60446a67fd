package graft.multimodal

/** JVM-wide codec posture for the media encode/decode hot paths
  * (optimization guide §1.2, "per-task work").
  *
  * javax.imageio's default ImageInputStream/ImageOutputStream wrap every
  * read/write in a DISK-backed temp-file cache (`ImageIO.getUseCache`
  * defaults to true). Every payload here is an in-memory byte array, so
  * the file cache buys nothing and costs a temp-file create/write/delete
  * per image. Measured on the 9×8 fixture PNGs (20k images, warm JIT):
  * encode 1472 → 375 µs/img, decode 185 → 42 µs/img with the memory
  * cache — ~4× either way, and the decode family is codec-CPU-bound
  * (SCALE.md "image near-dup banding A/B": ~97 % of task CPU is decode).
  *
  * `ensure()` is called at the top of every ImageIO call site rather
  * than once at session build so EXECUTOR JVMs flip the switch too —
  * class initialization makes it idempotent and thread-safe, and the
  * post-init call is a no-op.
  */
object Codecs {
  javax.imageio.ImageIO.setUseCache(false)

  /** Referencing this object runs the one-time initializer. */
  def ensure(): Unit = ()
}
