package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL audio codec for RIFF/WAV PCM — the pure-JDK sibling of
  * [[ImageCodec]], shrinking the multimodal stand-in boundary to
  * video (and compressed audio) only. WAV is a length-prefixed chunk
  * container with raw little-endian samples: parsing it is exact
  * byte arithmetic, no lossy transform anywhere, so encode→decode
  * round-trips sample-identically on any JVM and a SQL oracle can
  * replay every downstream feature from the synthetic sample formula.
  *
  * Scope: 16-bit PCM (format tag 1), any channel count/rate. Other
  * encodings (float WAV, ADPCM, MP3-in-RIFF) return `None` — the
  * same visible-dispatch contract as [[ImageCodec.decode]]: callers
  * route undecodable media to the documented stand-in, never a
  * silently wrong decode.
  *
  * Determinism contract for features ([[windowFeatures]]): integer
  * transport throughout — per-window sample count, Σs² (Long-safe:
  * 32768² · fs·window ≈ 10¹³ at a second-long window), peak |s|, and
  * sign-flip zero crossings are all integers; RMS is the ONE double
  * op (sqrt of the integer ratio), rounded 6dp — the [[ImageCodec
  * .patchMeanLuma]] transport rule.
  *
  * Scale: a per-row kernel inside batched `mapPartitions` — audio
  * bytes never shuffle; what exits the decode is a fixed-width
  * per-window projection.
  */
object AudioCodec {

  /** Decoded PCM: interleaved 16-bit samples. */
  final case class PcmAudio(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def nSamples: Int = samples.length
  }

  /** Parse a RIFF/WAVE container: walk the chunk list, require a PCM
    * (tag 1) 16-bit `fmt ` chunk, return the `data` chunk's samples.
    * `None` for anything else — truncated files, non-RIFF bytes,
    * compressed audio.
    */
  def decodeWav(bytes: Array[Byte]): Option[PcmAudio] = {
    if (bytes.length < 44) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag4(at: Int): String =
      new String(bytes, at, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag4(0) != "RIFF" || tag4(8) != "WAVE") return None
    var pos = 12
    var fmtOk = false; var rate = 0; var chans = 0
    var data: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val id = tag4(pos)
      val size = bb.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      id match {
        case "fmt " if size >= 16 =>
          val audioFormat = bb.getShort(pos + 8) & 0xffff
          chans = bb.getShort(pos + 10) & 0xffff
          rate = bb.getInt(pos + 12)
          val bits = bb.getShort(pos + 22) & 0xffff
          fmtOk = audioFormat == 1 && bits == 16 && chans >= 1 && rate >= 1
        case "data" =>
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = bb.getShort(pos + 8 + 2 * i); i += 1 }
          data = out
        case _ => () // LIST/INFO/cue chunks: skip
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (fmtOk && data != null) Some(PcmAudio(rate, chans, data)) else None
  }

  /** Minimal canonical WAV writer: 44-byte header + LE samples. */
  def encodeWav(pcm: PcmAudio): Array[Byte] = {
    val dataBytes = pcm.samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(pcm.channels.toShort)
      .putInt(pcm.sampleRate)
      .putInt(pcm.sampleRate * pcm.channels * 2) // byte rate
      .putShort((pcm.channels * 2).toShort)      // block align
      .putShort(16)
    bb.put("data".getBytes).putInt(dataBytes)
    var i = 0 // while, not Array.foreach: avoids per-sample boxing
    while (i < pcm.samples.length) { bb.putShort(pcm.samples(i)); i += 1 }
    bb.array
  }

  /** Per-window features, all integer-transported except the final
    * RMS: (windowIdx, nSamples, Σs², max|s|, sign-flip crossings
    * WITHIN the window — pairs (i-1,i) with s·s' < 0 and i not the
    * window's first sample, so windows replay independently in SQL —
    * and rms = round6(sqrt(Σs²/n))). The last window may be partial.
    */
  def windowFeatures(pcm: PcmAudio, windowSamples: Int)
      : Array[(Int, Long, Long, Int, Long, Double)] = {
    require(windowSamples >= 1, s"windowSamples must be >= 1 (got $windowSamples)")
    val s = pcm.samples
    val nWin = (s.length + windowSamples - 1) / windowSamples
    Array.tabulate(nWin) { w =>
      val from = w * windowSamples
      val until = math.min(from + windowSamples, s.length)
      var sumSq = 0L; var peak = 0; var zc = 0L
      var i = from
      while (i < until) {
        val v = s(i).toInt
        sumSq += v.toLong * v
        val a = math.abs(v)
        if (a > peak) peak = a
        if (i > from && s(i - 1).toInt * v < 0) zc += 1
        i += 1
      }
      val n = (until - from).toLong
      val rms = BigDecimal(math.sqrt(sumSq.toDouble / n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (w, n, sumSq, peak, zc, rms)
    }
  }

  /** Deterministic synthetic PCM — the sample formula the DuckDB
    * oracles replay (non-negative integer mod, then the shift to
    * signed):  s(i) = ((id·7919 + i·104729) % 65536) − 32768.
    * Test-data generator only (documents.parquet carries no audio),
    * NOT part of the serving surface.
    */
  def synthPcm(id: Long, n: Int, sampleRate: Int = 16000): PcmAudio = {
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = (((id * 7919 + i.toLong * 104729) % 65536) - 32768).toShort
      i += 1
    }
    PcmAudio(sampleRate, 1, out)
  }

  /** [[synthPcm]] through the REAL encoder — what registry queries
    * feed [[decodeWav]], so the container round-trip (not the formula
    * alone) is what oracle hashes verify.
    */
  def synthWav(id: Long, n: Int, sampleRate: Int = 16000): Array[Byte] =
    encodeWav(synthPcm(id, n, sampleRate))
}
