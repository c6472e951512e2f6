package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import graft.multimodal.ImageCodec.RgbImage

/** REAL video demuxer for AVI with uncompressed 24-bit DIB frames —
  * the last piece of the multimodal codec family ([[ImageCodec]]
  * images, [[AudioCodec]] WAV audio): AVI is RIFF, the same
  * length-prefixed chunk walk as WAV, and a BI_RGB frame is raw
  * bottom-up BGR rows padded to 4 bytes — exact byte arithmetic end
  * to end, so demux round-trips pixel-identically on any JVM and SQL
  * oracles replay frame features from the synthetic pixel formula.
  *
  * Scope: 'vids' stream, `biCompression = 0` (BI_RGB), 24-bit. Every
  * compressed codec (MJPEG, H.264, …) returns `None` — those are the
  * one remaining documented stand-in class ([[Multimodal.decodeStub]]):
  * no pure-JDK decoder exists, and a wrong decode must never be
  * produced silently.
  *
  * Container layout written (and tolerated on read, with unknown
  * chunks skipped):
  *   RIFF('AVI '){ LIST('hdrl'){ avih, LIST('strl'){ strh, strf } },
  *                 LIST('movi'){ '00db' frames }, 'idx1' }
  *
  * Scale: a per-row kernel inside batched `mapPartitions`
  * ([[Multimodal.videoFrameFeatures]]); video bytes never shuffle —
  * what exits the demux is a fixed-width per-frame projection.
  */
object VideoCodec {

  /** Demuxed clip: frame period in microseconds + decoded rasters. */
  final case class AviVideo(width: Int, height: Int, microSecPerFrame: Int,
      frames: Vector[RgbImage])

  private def stride(w: Int): Int = (w * 3 + 3) / 4 * 4

  /** Parse an AVI container; `None` for non-AVI bytes, compressed
    * streams, truncated chunks — the visible-dispatch contract.
    */
  def decodeAvi(bytes: Array[Byte]): Option[AviVideo] = {
    if (bytes.length < 12) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag4(at: Int): String =
      new String(bytes, at, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag4(0) != "RIFF" || tag4(8) != "AVI ") return None
    var w = -1; var h = -1; var uspf = 0
    var fmtOk = false
    val frames = Vector.newBuilder[RgbImage]
    var bad = false
    // walk a chunk run [from, until); recurse into LIST payloads
    def walk(from: Int, until: Int): Unit = {
      var pos = from
      while (!bad && pos + 8 <= until) {
        val id = tag4(pos)
        val size = bb.getInt(pos + 4)
        if (size < 0 || pos + 8 + size > until) { bad = true; return }
        id match {
          case "LIST" if size >= 4 => walk(pos + 12, pos + 8 + size)
          case "avih" if size >= 32 => uspf = bb.getInt(pos + 8)
          case "strf" if size >= 40 => // BITMAPINFOHEADER
            w = bb.getInt(pos + 12)
            h = bb.getInt(pos + 16)
            val bitCount = bb.getShort(pos + 22) & 0xffff
            val compression = bb.getInt(pos + 24)
            fmtOk = bitCount == 24 && compression == 0 && w >= 1 && h >= 1
          case "00db" | "00dc" =>
            if (!fmtOk || size != stride(w) * h) { bad = true; return }
            val rgb = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              val rowAt = pos + 8 + (h - 1 - y) * stride(w) // bottom-up
              var x = 0
              while (x < w) {
                val b = bytes(rowAt + 3 * x) & 255          // BGR order
                val g = bytes(rowAt + 3 * x + 1) & 255
                val r = bytes(rowAt + 3 * x + 2) & 255
                rgb(y * w + x) = (r << 16) | (g << 8) | b
                x += 1
              }
              y += 1
            }
            frames += RgbImage(w, h, rgb)
          case _ => () // strh/idx1/JUNK/INFO: skip
        }
        pos += 8 + size + (size & 1) // word alignment
      }
    }
    walk(12, bytes.length)
    val fs = frames.result()
    if (!bad && fmtOk && fs.nonEmpty) Some(AviVideo(w, h, uspf, fs)) else None
  }

  /** Minimal canonical AVI writer (BI_RGB 24-bit, one video stream,
    * idx1 index included — readers that want it find it, [[decodeAvi]]
    * skips it).
    */
  def encodeAvi(v: AviVideo): Array[Byte] = {
    require(v.frames.nonEmpty, "need at least one frame")
    require(v.frames.forall(f => f.width == v.width && f.height == v.height),
      "all frames must share the clip dims")
    val st = stride(v.width)
    val frameBytes = st * v.height
    val n = v.frames.size
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40)) // 'hdrl'+avih+LIST strl
    val moviSize = 4 + n * (8 + frameBytes)
    val idx1Size = n * 16
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    val bb = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(riffSize).put("AVI ".getBytes)
    bb.put("LIST".getBytes).putInt(hdrlSize).put("hdrl".getBytes)
    bb.put("avih".getBytes).putInt(56)
      .putInt(v.microSecPerFrame).putInt(0).putInt(0).putInt(0)
      .putInt(n).putInt(0).putInt(1).putInt(frameBytes)
      .putInt(v.width).putInt(v.height)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    bb.put("LIST".getBytes).putInt(4 + 64 + 48).put("strl".getBytes)
    bb.put("strh".getBytes).putInt(56)
      .put("vids".getBytes).put("DIB ".getBytes)
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(v.microSecPerFrame).putInt(1000000) // scale/rate: fps = rate/scale
      .putInt(0).putInt(n).putInt(frameBytes).putInt(-1).putInt(0)
      .putShort(0).putShort(0)
      .putShort(v.width.toShort).putShort(v.height.toShort)
    bb.put("strf".getBytes).putInt(40)
      .putInt(40).putInt(v.width).putInt(v.height)
      .putShort(1).putShort(24).putInt(0).putInt(frameBytes)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    bb.put("LIST".getBytes).putInt(moviSize).put("movi".getBytes)
    v.frames.foreach { f =>
      bb.put("00db".getBytes).putInt(frameBytes)
      var y = 0
      while (y < v.height) {
        val srcRow = (v.height - 1 - y) * v.width // write bottom-up
        var x = 0
        while (x < v.width) {
          val p = f.rgb(srcRow + x)
          bb.put((p & 255).toByte)         // B
          bb.put(((p >> 8) & 255).toByte)  // G
          bb.put(((p >> 16) & 255).toByte) // R
          x += 1
        }
        var pad = st - 3 * v.width
        while (pad > 0) { bb.put(0.toByte); pad -= 1 }
        y += 1
      }
    }
    bb.put("idx1".getBytes).putInt(idx1Size)
    var off = 4 // offsets relative to 'movi' tag
    v.frames.foreach { _ =>
      bb.put("00db".getBytes).putInt(0x10).putInt(off).putInt(frameBytes)
      off += 8 + frameBytes
    }
    bb.array
  }

  /** Synthetic clip through the REAL muxer: frame f's raster is
    * [[ImageCodec.synthImage]] at fid = id + 131071·f — the formula
    * the DuckDB oracles replay per sampled frame. Test-data generator
    * only, NOT part of the serving surface.
    */
  def synthAvi(id: Long, nFrames: Int, w: Int, h: Int,
      microSecPerFrame: Int = 40000): Array[Byte] =
    encodeAvi(AviVideo(w, h, microSecPerFrame,
      Vector.tabulate(nFrames)(f => ImageCodec.synthImage(id + 131071L * f, w, h))))
}
