package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.AudioCodec._

/** Pins the WAV codec's determinism contract ([[AudioCodec]] scaladoc):
  * encode→decode round-trips sample-identically, the chunk walk
  * tolerates extra metadata chunks, non-PCM16 containers are rejected
  * visibly (`None`, never a wrong decode), and window features are the
  * documented integer arithmetic (hand-computed cases, window-local
  * zero crossings, partial final window).
  */
class AudioCodecSpec extends AnyFunSuite {

  test("encodeWav -> decodeWav round-trips samples, rate, channels exactly") {
    val pcm = PcmAudio(8000, 2, Array[Short](0, 1, -1, 32767, -32768, 12345, -12345))
    val back = decodeWav(encodeWav(pcm)).get
    assert(back.sampleRate === 8000)
    assert(back.channels === 2)
    assert(back.samples.toSeq === pcm.samples.toSeq)
  }

  test("chunk walk skips metadata chunks (incl. odd-size word alignment)") {
    // splice a 3-byte LIST chunk (odd size -> 1 pad byte) between fmt and data
    val plain = encodeWav(PcmAudio(16000, 1, Array[Short](7, -7, 7)))
    val bb = java.nio.ByteBuffer.allocate(plain.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(plain, 0, 36)                  // RIFF header + fmt chunk
    bb.put("LIST".getBytes).putInt(3).put(Array[Byte](1, 2, 3, 0))
    bb.put(plain, 36, plain.length - 36)  // data chunk
    val spliced = bb.array
    // fix the RIFF size field (bytes 4-7) for the added 12 bytes
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    assert(decodeWav(spliced).get.samples.toSeq === Seq[Short](7, -7, 7))
  }

  test("decodeWav rejects non-WAV, truncated, and non-PCM16 containers") {
    assert(decodeWav("not audio at all, just bytes".getBytes).isEmpty)
    assert(decodeWav(Array.empty[Byte]).isEmpty)
    val good = encodeWav(PcmAudio(16000, 1, Array[Short](1, 2, 3)))
    assert(decodeWav(good.take(30)).isEmpty) // truncated mid-fmt
    // format tag 3 (IEEE float) must be rejected, not misread
    val floatTag = good.clone
    java.nio.ByteBuffer.wrap(floatTag).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(20, 3)
    assert(decodeWav(floatTag).isEmpty)
    // 8-bit PCM rejected too
    val bits8 = good.clone
    java.nio.ByteBuffer.wrap(bits8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(34, 8)
    assert(decodeWav(bits8).isEmpty)
  }

  test("windowFeatures: hand-computed sums, window-local crossings, partial tail") {
    val pcm = PcmAudio(16000, 1, Array[Short](3, -4, 5, 0, -2, 2, 1))
    val f = windowFeatures(pcm, 4)
    assert(f.length === 2)
    // w0 [3,-4,5,0]: sumSq 50, peak 5, crossings (3,-4),(-4,5) = 2
    assert(f(0) === ((0, 4L, 50L, 5, 2L,
      BigDecimal(math.sqrt(50.0 / 4)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // w1 [-2,2,1]: the (0,-2) pair straddles the boundary and must NOT count
    assert(f(1) === ((1, 3L, 9L, 2, 1L,
      BigDecimal(math.sqrt(9.0 / 3)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assertThrows[IllegalArgumentException](windowFeatures(pcm, 0))
  }

  test("synthPcm matches the oracle formula; synthWav survives the real parse") {
    val pcm = synthPcm(5L, 6)
    val expect = (0 until 6).map(i => (((5L * 7919 + i.toLong * 104729) % 65536) - 32768).toShort)
    assert(pcm.samples.toSeq === expect)
    assert(decodeWav(synthWav(5L, 6)).get.samples.toSeq === expect)
  }
}
