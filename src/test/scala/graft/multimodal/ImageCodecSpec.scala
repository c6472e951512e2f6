package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.ImageCodec._

/** Pins the REAL codec's determinism contract (see [[ImageCodec]]'s
  * scaladoc): decode of COMMITTED fixtures is pixel-exact (cross-JVM
  * stability — the fixtures were encoded by a different JVM run than
  * the one decoding them here), encode→decode round-trips exactly,
  * the area-average downscale is the documented integer arithmetic
  * (hand-computed cases, integer and non-integer factors), and the
  * patch-mean embedding matches exact integer sums.
  */
class ImageCodecSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/multimodal/$name")
    assert(in != null, s"missing committed fixture $name")
    try in.readAllBytes() finally in.close()
  }

  test("committed PNG fixture decodes pixel-exactly to the synth formula") {
    val img = decode(fixture("fixture_8x6.png")).get
    val expect = synthImage(42L, 8, 6)
    assert(img.width === 8 && img.height === 6)
    assert(img.rgb.toSeq === expect.rgb.toSeq)
  }

  test("committed BMP fixture decodes to the same pixels as the PNG") {
    val bmp = decode(fixture("fixture_8x6.bmp")).get
    val png = decode(fixture("fixture_8x6.png")).get
    assert(bmp.rgb.toSeq === png.rgb.toSeq)
  }

  test("encode -> decode round-trips pixel-exactly (png and bmp)") {
    val img = synthImage(7L, 31, 17) // odd dims, nothing aligned
    for (fmt <- Seq("png", "bmp")) {
      val back = decode(encode(img, fmt)).get
      assert(back.width === 31 && back.height === 17, fmt)
      assert(back.rgb.toSeq === img.rgb.toSeq, fmt)
    }
  }

  test("decode returns None for non-image bytes (the dispatch contract)") {
    assert(decode("not an image at all".getBytes).isEmpty)
    assert(decode(Array.emptyByteArray).isEmpty)
    // a PNG header with a truncated body must not decode to fake pixels
    val broken = fixture("fixture_8x6.png").take(20)
    assert(decode(broken).isEmpty)
  }

  test("areaAverage at an integer factor is the box mean, rounded half-up") {
    // 4x2 -> 2x1: each output pixel averages a 2x2 box per channel
    val rgb = Array(
      (10 << 16) | (0 << 8) | 1, (20 << 16) | (0 << 8) | 2,
      (5 << 16) | (100 << 8) | 3, (7 << 16) | (100 << 8) | 4,
      (30 << 16) | (0 << 8) | 5, (41 << 16) | (0 << 8) | 6,
      (9 << 16) | (200 << 8) | 7, (8 << 16) | (200 << 8) | 8)
    val out = areaAverage(RgbImage(4, 2, rgb), 2, 1)
    // box 1: r = (10+20+30+41)/4 = 25.25 -> 25; g = 0; b = (1+2+5+6)/4 = 3.5 -> 4 (half-up)
    assert(out.rgb(0) === ((25 << 16) | (0 << 8) | 4))
    // box 2: r = (5+7+9+8)/4 = 7.25 -> 7; g = 150; b = (3+4+7+8)/4 = 5.5 -> 6
    assert(out.rgb(1) === ((7 << 16) | (150 << 8) | 6))
  }

  test("areaAverage non-integer factor: exact-coverage weights, hand-computed") {
    // 3x3 -> 2x2 with r = x + 3y: output pixel (ox,oy) covers a 1.5x1.5
    // input box; weights in 1/(ow*oh) units are (2,1)x(2,1) etc., den = 9.
    // Hand-computed: [[1, 3], [5, 7]] row-major.
    val rgb = Array.tabulate(9)(i => ((i % 3) + 3 * (i / 3)) << 16)
    val out = areaAverage(RgbImage(3, 3, rgb), 2, 2)
    assert(out.rgb.map(p => (p >> 16) & 255).toSeq === Seq(1, 3, 5, 7))
  }

  test("areaAverage identity and invalid-upscale guard") {
    val img = synthImage(1L, 5, 4)
    assert(areaAverage(img, 5, 4).rgb.toSeq === img.rgb.toSeq)
    assertThrows[IllegalArgumentException](areaAverage(img, 6, 4))
    assertThrows[IllegalArgumentException](areaAverage(img, 0, 4))
  }

  test("patchMeanLuma: exact integer sums, one rounded division per patch") {
    // uniform image: every patch mean equals the single-pixel luma
    val p = (10 << 16) | (20 << 8) | 30 // luma = 2990 + 11740 + 3420 = 18150
    val uni = RgbImage(8, 8, Array.fill(64)(p))
    assert(patchMeanLuma(uni, 4).toSeq === Seq.fill(16)(18.15))
    // non-divisible dims: patch buckets are floor(y*grid/h), i.e. bucket b
    // covers [b*h/grid, (b+1)*h/grid) — a 5x5 image on grid 2 puts
    // rows/cols {0,1,2} in bucket 0 and {3,4} in bucket 1
    val img = RgbImage(5, 5, Array.tabulate(25)(i => (i % 5) + 5 * (i / 5) << 16))
    val m = patchMeanLuma(img, 2)
    assert(m.length === 4)
    // patch (0,0): pixels x,y in {0,1,2}: r = 0,1,2,5,6,7,10,11,12 (sum 54)
    assert(m(0) === BigDecimal(299.0 * 54 / (9 * 1000.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("thumbnailDims: long edge to maxDim, Math.round short edge, floor 1") {
    assert(thumbnailDims(64, 48, 16) === ((16, 12)))
    assert(thumbnailDims(48, 64, 16) === ((12, 16)))
    assert(thumbnailDims(10, 8, 16) === ((10, 8))) // already fits
    assert(thumbnailDims(1000, 1, 10) === ((10, 1))) // short edge floors at 1
    assert(thumbnailDims(100, 30, 25) === ((25, 8))) // 7.5 rounds half-up
  }

  test("synthPng feeds the decode path with the exact formula pixels") {
    val img = decode(synthPng(123L, 12, 9)).get
    assert(img.rgb.toSeq === synthImage(123L, 12, 9).rgb.toSeq)
  }

  test("upscaleNearest: every source pixel becomes a k x k block") {
    val img = RgbImage(2, 1, Array(0x010203, 0xA0B0C0))
    val up = upscaleNearest(img, 3)
    assert(up.width === 6 && up.height === 3)
    assert(up.rgb.toSeq === Seq(
      0x010203, 0x010203, 0x010203, 0xA0B0C0, 0xA0B0C0, 0xA0B0C0,
      0x010203, 0x010203, 0x010203, 0xA0B0C0, 0xA0B0C0, 0xA0B0C0,
      0x010203, 0x010203, 0x010203, 0xA0B0C0, 0xA0B0C0, 0xA0B0C0))
    assert(upscaleNearest(img, 1) eq img)
    assertThrows[IllegalArgumentException](upscaleNearest(img, 0))
  }

  test("aHashBits: hand-computed bits on a 2x2 grid, strict comparison") {
    // 4x2 grayscale ramp: lumas 0,0,100,100 / 0,0,100,100 per row;
    // grid 2 -> patches [0,0;100,100] columns... patch (py,px):
    // px0 = {0,0,0,0}, px1 = {100,100,100,100} per grid row.
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val img = RgbImage(4, 2, Array(
      gray(0), gray(0), gray(100), gray(100),
      gray(0), gray(0), gray(100), gray(100)))
    // mean = 50; right patches strictly above, left strictly below
    assert(aHashBits(img, 2) === "0101")
    // uniform image: no patch strictly above the mean -> all zeros
    val flat = RgbImage(4, 2, Array.fill(8)(gray(7)))
    assert(aHashBits(flat, 2) === "0000")
  }

  test("aHashBits is invariant under nearest-neighbor upscale; pixel keys differ") {
    val img = synthImage(11L, 16, 8)
    val up = upscaleNearest(img, 2)
    assert(aHashBits(img, 4) === aHashBits(up, 4))
    assert(aHashBits(img, 8).length === 64)
    assert(!(img.rgb.toSeq == up.rgb.toSeq)) // raster-level keys would differ
    // and a genuinely different image gets a different 64-bit pattern
    assert(aHashBits(synthImage(11L, 16, 8), 8) !==
      aHashBits(synthImage(12L, 16, 8), 8))
  }
}
