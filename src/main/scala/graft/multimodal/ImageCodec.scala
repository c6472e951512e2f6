package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL image codec over pure-JDK `javax.imageio` — the r14 cut-over
  * that retires the engine's last synthetic data-plane boundary
  * (`Multimodal.decodeStub` now serves only media ImageIO cannot
  * decode, i.e. the video/audio demuxer edge where no pure-JDK codec
  * exists).
  *
  * Determinism contract (what lets registry queries hash-verify real
  * pixels cross-engine):
  *  - decode: PNG and BMP are lossless; `getRGB` on the standard
  *    8-bit RGB types Java's own writers produce is an exact byte
  *    passthrough (no color management is applied to untagged sRGB),
  *    so encode→decode round-trips pixel-identically — spec-pinned on
  *    committed fixtures AND asserted per-batch in [[synthPng]]'s
  *    encode path.
  *  - downscale: [[areaAverage]] is EXACT INTEGER arithmetic — output
  *    pixel (ox,oy) covers the input rectangle [ox·W/ow,(ox+1)·W/ow) ×
  *    [oy·H/oh,(oy+1)·H/oh); coverage weights are computed in units of
  *    1/(ow·oh) of an input pixel (integers), each channel is the
  *    weighted sum rounded HALF-UP with one integer division. At an
  *    integer scale factor k this reduces to the k×k box mean
  *    (2·Σ+k²)//(2·k²) — the form the DuckDB oracles replay.
  *  - embedding: [[patchMeanLuma]] is a grid×grid patch mean of the
  *    INTEGER luma 299r+587g+114b (the BT.601 weights ×1000 — kept
  *    integral so only the final mean divides), rounded 6dp.
  *
  * JPEG is decodable here too but EXCLUDED from the determinism
  * contract (inverse-DCT rounding varies across decoder versions);
  * oracle-bearing paths use PNG, specs pin BMP as well.
  *
  * Scale: the codec is a per-row kernel invoked inside `mapPartitions`
  * batches ([[Multimodal.extractFeatures]] shape) — media bytes never
  * shuffle, and everything downstream of decode is a compact
  * fixed-width projection.
  */
object ImageCodec {
  ImageIO.setUseCache(false) // no disk-backed stream cache on executors

  /** Decoded raster: packed 0xRRGGBB ints, row-major. */
  final case class RgbImage(width: Int, height: Int, rgb: Array[Int]) {
    def nPx: Int = width * height
  }

  /** Decode any ImageIO-supported container to an RGB raster; `None`
    * for bytes no reader claims (video, audio, corrupt files) — the
    * caller-visible dispatch [[Multimodal]] uses to route non-image
    * media to its documented stand-in path.
    */
  def decode(bytes: Array[Byte]): Option[RgbImage] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Int](w * h)
      // getRGB(x,y) & 0xFFFFFF: exact for the untagged 8-bit RGB types
      // the PNG/BMP readers return (TYPE_3BYTE_BGR / TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = img.getRGB(x, y) & 0xFFFFFF; x += 1 }
        y += 1
      }
      Some(RgbImage(w, h, out))
    }
  }

  /** Lossless PNG encode (the thumbnail stage's output container). */
  def encodePng(img: RgbImage): Array[Byte] = encode(img, "png")

  def encode(img: RgbImage, format: String): Array[Byte] = {
    val bi = new BufferedImage(img.width, img.height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) { bi.setRGB(x, y, img.rgb(y * img.width + x)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(bi, format, bos), s"no ImageIO writer for '$format'")
    bos.toByteArray
  }

  /** Thumbnail dimensions: long edge scaled to `maxDim`, the short edge
    * by the same factor with Math.round (floor(x+0.5) — the same rule
    * the retired stub used, so meta arithmetic is unchanged), floor 1.
    * Identity when the long edge already fits.
    */
  def thumbnailDims(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    require(maxDim >= 1, s"maxDim must be >= 1 (got $maxDim)")
    val long = math.max(w, h)
    if (long <= maxDim || long <= 0) (w, h)
    else {
      val scale = maxDim.toDouble / long
      (math.max(1, math.round(w * scale).toInt),
        math.max(1, math.round(h * scale).toInt))
    }
  }

  /** Exact-coverage area-average downscale to `ow`×`oh` (see object
    * scaladoc for the integer-arithmetic contract). Requires
    * ow ≤ width, oh ≤ height (this is a downscaler, not a resampler).
    */
  def areaAverage(img: RgbImage, ow: Int, oh: Int): RgbImage = {
    require(ow >= 1 && oh >= 1 && ow <= img.width && oh <= img.height,
      s"areaAverage is a downscaler: need 1 <= ($ow,$oh) <= (${img.width},${img.height})")
    if (ow == img.width && oh == img.height) return img
    val w = img.width; val h = img.height
    val out = new Array[Int](ow * oh)
    // den = W·H per output pixel: Σ xov = W (in 1/ow units), Σ yov = H
    val den = w.toLong * h.toLong
    var oy = 0
    while (oy < oh) {
      val y0 = oy.toLong * h; val y1 = y0 + h // output span in 1/oh units
      var ox = 0
      while (ox < ow) {
        val x0 = ox.toLong * w; val x1 = x0 + w
        var rs = 0L; var gs = 0L; var bs = 0L
        var iy = (y0 / oh).toInt
        while (iy.toLong * oh < y1) {
          val yov = math.min(y1, (iy + 1).toLong * oh) - math.max(y0, iy.toLong * oh)
          if (yov > 0) {
            var ix = (x0 / ow).toInt
            while (ix.toLong * ow < x1) {
              val xov = math.min(x1, (ix + 1).toLong * ow) - math.max(x0, ix.toLong * ow)
              if (xov > 0) {
                val wgt = xov * yov
                val p = img.rgb(iy * w + ix)
                rs += wgt * ((p >> 16) & 255)
                gs += wgt * ((p >> 8) & 255)
                bs += wgt * (p & 255)
              }
              ix += 1
            }
          }
          iy += 1
        }
        // one rounded division per channel: round-half-up in integers
        val r = ((2 * rs + den) / (2 * den)).toInt
        val g = ((2 * gs + den) / (2 * den)).toInt
        val b = ((2 * bs + den) / (2 * den)).toInt
        out(oy * ow + ox) = (r << 16) | (g << 8) | b
        ox += 1
      }
      oy += 1
    }
    RgbImage(ow, oh, out)
  }

  /** grid×grid patch-mean luma embedding (patch (py,px) covers rows
    * [py·H/grid,(py+1)·H/grid) — integer-floor boundaries, exact
    * bucketing when grid divides the dims): per patch, the mean of the
    * integer luma 299r+587g+114b over the patch divided by 1000,
    * rounded 6dp. Values land in [0, 255]; one double division per
    * patch, so a SQL oracle replays it from plain integer sums.
    */
  def patchMeanLuma(img: RgbImage, grid: Int): Array[Double] = {
    require(grid >= 1 && grid <= img.width && grid <= img.height,
      s"grid must be in [1, min(w,h)] (got $grid for ${img.width}x${img.height})")
    val sums = new Array[Long](grid * grid)
    val counts = new Array[Long](grid * grid)
    val w = img.width; val h = img.height
    var y = 0
    while (y < h) {
      val py = (y.toLong * grid / h).toInt
      var x = 0
      while (x < w) {
        val px = (x.toLong * grid / w).toInt
        val p = img.rgb(y * w + x)
        sums(py * grid + px) +=
          299L * ((p >> 16) & 255) + 587L * ((p >> 8) & 255) + 114L * (p & 255)
        counts(py * grid + px) += 1L
        x += 1
      }
      y += 1
    }
    Array.tabulate(grid * grid) { i =>
      BigDecimal(sums(i).toDouble / (counts(i) * 1000.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  /** k× nearest-neighbor upscale: out(x,y) = in(x/k, y/k) — every
    * source pixel becomes a k×k block. The model of a thumbnail cache
    * or CDN re-size, and the planted transform for the perceptual-hash
    * dedup oracle: each [[aHashBits]] patch of the upscaled image is
    * the SAME source-pixel set repeated k² times, so patch-mean
    * comparisons (and hence the hash) are invariant by construction
    * while byte and pixel fingerprints both change.
    */
  def upscaleNearest(img: RgbImage, k: Int): RgbImage = {
    require(k >= 1, s"scale factor must be >= 1 (got $k)")
    if (k == 1) return img
    val w = img.width * k; val h = img.height * k
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = (y / k) * img.width
      var x = 0
      while (x < w) {
        out(y * w + x) = img.rgb(srcRow + x / k)
        x += 1
      }
      y += 1
    }
    RgbImage(w, h, out)
  }

  /** Perceptual average-hash over the [[patchMeanLuma]] grid, as a
    * grid²-char '0'/'1' string (bit i = patch i's luma mean strictly
    * above the whole-image mean of patch means) — EXACT integer
    * arithmetic end to end: the comparison is the cross-multiplied
    *   sumᵢ·N  >  S·countᵢ
    * (sumᵢ = patch i's integer luma sum, countᵢ its pixel count,
    * S/N the totals), so no division ever happens and a SQL oracle
    * replays each bit from plain integer sums. The string form (not a
    * packed int64) keeps the 64-bit grid=8 hash transportable through
    * engines whose BIGINT would overflow on bit 63.
    *
    * Invariant under k× nearest-neighbor resize (sums and counts both
    * scale by k², the cross-products by k⁴) and under any
    * luma-order-preserving global remap — the RESIZED-duplicate class
    * that [[Multimodal.pixelFingerprint]] (raster equality) and byte
    * fingerprints structurally miss. Max sum·N for 255-luma 128×96
    * rasters is ~10¹³ — Long-safe with headroom.
    */
  def aHashBits(img: RgbImage, grid: Int = 8): String = {
    require(grid >= 1 && grid <= img.width && grid <= img.height,
      s"grid must be in [1, min(w,h)] (got $grid for ${img.width}x${img.height})")
    val sums = new Array[Long](grid * grid)
    val counts = new Array[Long](grid * grid)
    val w = img.width; val h = img.height
    var y = 0
    while (y < h) {
      val py = (y.toLong * grid / h).toInt
      var x = 0
      while (x < w) {
        val px = (x.toLong * grid / w).toInt
        val p = img.rgb(y * w + x)
        sums(py * grid + px) +=
          299L * ((p >> 16) & 255) + 587L * ((p >> 8) & 255) + 114L * (p & 255)
        counts(py * grid + px) += 1L
        x += 1
      }
      y += 1
    }
    var total = 0L; var n = 0L
    var i = 0
    while (i < sums.length) { total += sums(i); n += counts(i); i += 1 }
    val sb = new java.lang.StringBuilder(grid * grid)
    i = 0
    while (i < sums.length) {
      sb.append(if (sums(i) * n > total * counts(i)) '1' else '0')
      i += 1
    }
    sb.toString
  }

  /** Deterministic synthetic test image — the pixel formula the DuckDB
    * oracles replay arithmetically (all non-negative integer mod, so
    * `%` agrees across engines):
    *   r=(id·31+x·7+y·13)%256, g=(id·17+x·3+y·29)%256, b=(id·23+x·11+y·5)%256.
    * This is the test-data generator for the real-codec registry
    * queries (documents.parquet carries no image bytes), NOT part of
    * the serving surface.
    */
  def synthImage(id: Long, w: Int, h: Int): RgbImage = {
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 3 + y * 29) % 256).toInt
        val b = ((id * 23 + x * 11 + y * 5) % 256).toInt
        out(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    RgbImage(w, h, out)
  }

  /** [[synthImage]] encoded as real PNG bytes — what the registry
    * queries feed the decode path, so the codec round-trip (not the
    * formula alone) is what the oracle hashes verify.
    */
  def synthPng(id: Long, w: Int, h: Int): Array[Byte] =
    encodePng(synthImage(id, w, h))
}
