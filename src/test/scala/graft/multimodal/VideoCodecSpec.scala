package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.VideoCodec._
import graft.multimodal.ImageCodec.{RgbImage, synthImage}

/** Pins the AVI demuxer's determinism contract ([[VideoCodec]]
  * scaladoc): mux→demux round-trips every frame pixel-exactly
  * (including the bottom-up row flip, BGR byte order, and non-4-byte
  * row strides), the chunk walk skips idx1/unknown chunks, and
  * non-AVI / compressed / truncated containers are rejected visibly.
  */
class VideoCodecSpec extends AnyFunSuite {

  private def tagAt(bytes: Array[Byte], tag: String): Int = {
    val t = tag.getBytes
    val i = bytes.indices.indexWhere(i =>
      i + 4 <= bytes.length && bytes(i) == t(0) && bytes(i + 1) == t(1) &&
        bytes(i + 2) == t(2) && bytes(i + 3) == t(3))
    assert(i >= 0, s"tag $tag not found"); i
  }

  test("encodeAvi -> decodeAvi round-trips frames, dims, frame period exactly") {
    val frames = Vector(synthImage(1L, 16, 12), synthImage(2L, 16, 12),
      synthImage(900L, 16, 12))
    val back = decodeAvi(encodeAvi(AviVideo(16, 12, 33333, frames))).get
    assert(back.width === 16 && back.height === 12 && back.microSecPerFrame === 33333)
    assert(back.frames.size === 3)
    frames.zip(back.frames).foreach { case (a, b) =>
      assert(a.rgb.toSeq === b.rgb.toSeq)
    }
  }

  test("non-4-byte stride (odd width) pads rows and still round-trips") {
    val f = synthImage(7L, 5, 3) // stride 16 vs 15 raw bytes: 1 pad byte/row
    val back = decodeAvi(encodeAvi(AviVideo(5, 3, 40000, Vector(f)))).get
    assert(back.frames.head.rgb.toSeq === f.rgb.toSeq)
  }

  test("bottom-up flip is real: a raster asymmetric in y survives the trip") {
    // top row bright, bottom row dark — a missing flip would swap them
    val img = RgbImage(2, 2, Array(0xFFFFFF, 0xFFFFFF, 0x010101, 0x010101))
    val back = decodeAvi(encodeAvi(AviVideo(2, 2, 40000, Vector(img)))).get
    assert(back.frames.head.rgb.toSeq === img.rgb.toSeq)
  }

  test("decodeAvi rejects non-AVI, WAV-RIFF, truncated, and compressed containers") {
    assert(decodeAvi("definitely not a movie".getBytes).isEmpty)
    // RIFF but WAVE: the same chunk grammar must NOT be claimed
    assert(decodeAvi(AudioCodec.synthWav(1L, 16)).isEmpty)
    val good = encodeAvi(AviVideo(4, 2, 40000, Vector(synthImage(3L, 4, 2))))
    assert(decodeAvi(good.take(good.length - 5)).isEmpty) // truncated movi
    // flip biCompression to MJPEG ('MJPG' != 0): must reject, never misread
    val mjpg = good.clone
    val strf = tagAt(mjpg, "strf")
    java.nio.ByteBuffer.wrap(mjpg).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(strf + 8 + 16, 0x47504A4D)
    assert(decodeAvi(mjpg).isEmpty)
  }

  test("synthAvi frame f is the synth formula at id + 131071*f") {
    val clip = decodeAvi(synthAvi(9L, 3, 8, 6)).get
    (0 until 3).foreach { f =>
      assert(clip.frames(f).rgb.toSeq === synthImage(9L + 131071L * f, 8, 6).rgb.toSeq, s"frame $f")
    }
  }
}
