package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / thumbnail / frame-sample stages.
  *
  * As of r15 the IMAGE path is a REAL codec ([[ImageCodec]], pure-JDK
  * `javax.imageio`): PNG/BMP/JPEG decode to actual pixels, thumbnails
  * are exact-coverage area averages re-encoded as PNG, and embeddings
  * are patch-mean luma over the decoded raster — all deterministic and
  * oracle-verified on real bytes (mm2/mm5/mm6); dedup keys on the
  * decoded raster itself ([[pixelFingerprint]] — re-encode class, mm7)
  * and on its perceptual average-hash ([[aHashKey]] — resize class,
  * mm8). The AUDIO path is real for RIFF/WAV PCM ([[AudioCodec]],
  * exact chunk arithmetic — [[audioWindowFeatures]], mm9). The VIDEO
  * path is real for AVI with uncompressed DIB frames ([[VideoCodec]]
  * — [[videoFrameFeatures]], mm10). Media no codec claims (compressed
  * codecs: MJPEG/H.264/MP3/AAC — no pure-JDK decoder exists) falls
  * through to the ORIGINAL deterministic stand-ins (`decodeStub`,
  * `frameOffsetsStub`, `thumbnailStub`), which remain the one
  * documented synthetic boundary; the dispatch is decodability
  * itself, so the stand-in path is visible (decoded_ok = false /
  * absent rows), never folded into plausible media features.
  *
  * Scale notes:
  *  - media bytes never shuffle: feature extraction is a mapPartitions
  *    projection (narrow), and downstream joins/dedup run on the compact
  *    feature/fingerprint columns only.
  *  - per-partition batching bounds peak memory at `batchSize` assets
  *    regardless of partition size.
  */
object Multimodal {

  final case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)
  final case class MediaAsset(asset_id: Long, media: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      asset_id: Long,
      n_bytes: Long,
      fingerprint: Long,
      embedding: Array[Float])

  /** ??? REAL-CODEC BOUNDARY (compressed media only since r15) ??? —
    * deterministic fake embedder for media no pure-JDK codec claims
    * (MJPEG/H.264/MP3/AAC — no JDK decoder exists; images decode via
    * [[ImageCodec]], WAV PCM via [[AudioCodec]], uncompressed-DIB AVI
    * via [[VideoCodec]]). Images take the REAL path:
    * [[mediaEmbedding]] dispatches to [[ImageCodec.decode]] +
    * [[ImageCodec.patchMeanLuma]] first and reaches this stand-in only
    * on decode failure. Produces a `dim`-float vector from a rolling
    * hash of the bytes; stable across JVMs and runs.
    */
  def decodeStub(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // large prime seed
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      out(math.floorMod(i, dim).toInt) += (math.floorMod(h, 1000L) / 1000.0f - 0.5f)
      i += 1
    }
    out
  }

  /** The production embedding dispatch: REAL image decode
    * ([[ImageCodec.decode]] — PNG/BMP/JPEG via `javax.imageio`) +
    * patch-mean-luma embedding over the actual pixels (grid =
    * ⌊√dim⌋ patches; entries past grid² stay 0 so the output width is
    * always exactly `dim`); bytes no ImageIO reader claims (video,
    * audio, corrupt files) fall through to [[decodeStub]] — the one
    * remaining synthetic boundary, scoped to media the JDK cannot
    * decode. Deterministic on both paths.
    */
  def mediaEmbedding(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
    val grid = math.sqrt(dim.toDouble).toInt
    ImageCodec.decode(bytes) match {
      case Some(img) if grid >= 1 && grid <= img.width && grid <= img.height =>
        val means = ImageCodec.patchMeanLuma(img, grid)
        val out = new Array[Float](dim)
        var i = 0
        while (i < means.length) { out(i) = means(i).toFloat; i += 1 }
        out
      case _ => decodeStub(bytes, dim)
    }
  }

  /** ??? REAL-CODEC BOUNDARY ??? — video frame sampling stand-in: returns
    * the byte offsets a real demuxer would seek to, one per `everyMs`.
    */
  def frameOffsetsStub(meta: MediaMeta, everyMs: Long): Seq[Long] =
    if (meta.durationMs <= 0 || everyMs <= 0) Seq.empty
    else (0L until meta.durationMs by everyMs).map(t => t * 1024L)

  /** ??? REAL-CODEC BOUNDARY (video/audio only since r15) ??? —
    * resize/thumbnail stand-in for media ImageIO cannot decode;
    * images take [[ImageCodec.areaAverage]] inside [[withThumbnails]].
    * The stub keeps a deterministic byte subsample whose length shrinks
    * with the area ratio (so size accounting downstream behaves like a
    * real thumbnail pass) and scales the meta dimensions exactly as a
    * real resizer would. Already-small media pass through unchanged.
    */
  def thumbnailStub(bytes: Array[Byte], meta: MediaMeta, maxDim: Int): (Array[Byte], MediaMeta) = {
    require(maxDim >= 1, s"maxDim must be >= 1 (got $maxDim)")
    val long = math.max(meta.width, meta.height)
    if (long <= maxDim || long <= 0) (bytes, meta)
    else {
      val scale = maxDim.toDouble / long
      val w = math.max(1, math.round(meta.width * scale).toInt)
      val h = math.max(1, math.round(meta.height * scale).toInt)
      val keep = math.max(1,
        math.round(bytes.length * (scale * scale)).toInt)
      val step = math.max(1, bytes.length / keep)
      val out = Array.range(0, bytes.length, step).map(bytes(_))
      (out, meta.copy(width = w, height = h))
    }
  }

  /** Thumbnail stage over a `Dataset[MediaAsset]`: batched
    * mapPartitions like [[extractFeatures]], media bytes REPLACED in
    * place — the training-data shape where originals live in the lake
    * and the pipeline materializes a bounded-size derivative. Narrow:
    * no shuffle, peak memory bounded by `batchSize` assets.
    *
    * REAL for images since r15: decode ([[ImageCodec.decode]]) →
    * exact-coverage area-average downscale of the long edge to
    * `maxDim` ([[ImageCodec.thumbnailDims]]/[[ImageCodec.areaAverage]])
    * → lossless PNG re-encode; meta dims come from the DECODED raster
    * (the bytes are the truth, not the caller's metadata), mime
    * becomes image/png. Already-fitting images still re-encode —
    * thumbnail output is uniformly PNG, the normalize-on-write
    * contract a serving tier wants. Undecodable media (video/audio)
    * keeps the deterministic [[thumbnailStub]] byte-subsample path,
    * visibly (mime unchanged).
    */
  def withThumbnails(assets: Dataset[MediaAsset], maxDim: Int,
      batchSize: Int = 64): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { a =>
          ImageCodec.decode(a.media) match {
            case Some(img) =>
              val (ow, oh) = ImageCodec.thumbnailDims(img.width, img.height, maxDim)
              val thumb = ImageCodec.areaAverage(img, ow, oh)
              MediaAsset(a.asset_id, ImageCodec.encodePng(thumb),
                a.meta.copy(mime = "image/png", width = ow, height = oh))
            case None =>
              val (b, m) = thumbnailStub(a.media, a.meta, maxDim)
              MediaAsset(a.asset_id, b, m)
          }
        }
      }
    }
  }

  /** Decode audit/profile stage — one row per asset with REAL decoded
    * facts: dims, pixel count, per-channel sums, and a position-weighted
    * checksum Σ (idx+1)·(r·2¹⁶ + g·2⁸ + b) over the row-major raster (a
    * strong order-sensitive digest that stays in exact BIGINT range and
    * replays in any SQL engine, unlike an md5 over raw bytes which SQL
    * string types can't build). Undecodable media report
    * `decoded_ok = false` with zeroed stats — visible, never fabricated.
    * Narrow mapPartitions; the media column never shuffles.
    */
  def decodeImages(assets: Dataset[MediaAsset], batchSize: Int = 64): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { a =>
          ImageCodec.decode(a.media) match {
            case Some(img) =>
              var rs = 0L; var gs = 0L; var bs = 0L; var ws = 0L
              var i = 0
              while (i < img.rgb.length) {
                val p = img.rgb(i)
                rs += (p >> 16) & 255; gs += (p >> 8) & 255; bs += p & 255
                ws += (i + 1).toLong * p
                i += 1
              }
              (a.asset_id, true, img.width, img.height,
                img.rgb.length.toLong, rs, gs, bs, ws)
            case None =>
              (a.asset_id, false, 0, 0, 0L, 0L, 0L, 0L, 0L)
          }
        }
      }
    }.toDF("asset_id", "decoded_ok", "width", "height", "n_px",
      "r_sum", "g_sum", "b_sum", "px_wsum")
  }

  /** Per-window audio features over REAL RIFF/WAV decode
    * ([[AudioCodec.decodeWav]] — 16-bit PCM): one row per
    * (asset, window) carrying the integer-transported n_samples /
    * Σs² / peak / zero-crossings and the 6dp RMS ([[AudioCodec
    * .windowFeatures]]). `windowMs` converts through the container's
    * OWN sample rate (fs·ms/1000, integer), so mixed-rate lakes
    * window correctly per asset. Undecodable media (video, compressed
    * audio, float WAV) emit no rows — the visible-dispatch contract;
    * [[extractFeatures]] remains their documented stand-in path.
    * Scale shape: decode is per-row CPU inside batched
    * `mapPartitions`; audio bytes never shuffle; what exits is a
    * fixed-width per-window projection.
    */
  def audioWindowFeatures(assets: Dataset[MediaAsset], windowMs: Int = 25,
      batchSize: Int = 64): DataFrame = {
    require(windowMs >= 1, s"windowMs must be >= 1 (got $windowMs)")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { a =>
          AudioCodec.decodeWav(a.media) match {
            case Some(pcm) =>
              val ws = math.max(1, pcm.sampleRate * windowMs / 1000)
              AudioCodec.windowFeatures(pcm, ws).iterator.map {
                case (w, n, sumSq, peak, zc, rms) =>
                  (a.asset_id, w, n, sumSq, peak, zc, rms)
              }
            case None => Iterator.empty
          }
        }
      }
    }.toDF("asset_id", "window_idx", "n_samples", "sum_sq", "peak",
      "zero_cross", "rms")
  }

  /** Per-frame features over REAL AVI demux ([[VideoCodec.decodeAvi]]
    * — uncompressed 24-bit DIB): every `everyN`-th frame yields one
    * row with the decoded raster's channel sums and the
    * position-weighted checksum Σ(idx+1)·(r·2¹⁶+g·2⁸+b) — the
    * [[decodeImages]] audit columns, per frame. Media [[VideoCodec]]
    * cannot claim (compressed codecs) emit no rows; [[sampleFrames]]
    * over the offset stand-in remains their documented path. Scale
    * shape: demux is per-row CPU inside batched `mapPartitions`;
    * video bytes never shuffle; what exits is a fixed-width per-frame
    * projection.
    */
  def videoFrameFeatures(assets: Dataset[MediaAsset], everyN: Int = 1,
      batchSize: Int = 16): DataFrame = {
    require(everyN >= 1, s"everyN must be >= 1 (got $everyN)")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { a =>
          VideoCodec.decodeAvi(a.media) match {
            case Some(clip) =>
              clip.frames.iterator.zipWithIndex.collect {
                case (f, idx) if idx % everyN == 0 =>
                  var rs = 0L; var gs = 0L; var bs = 0L; var ws = 0L
                  var i = 0
                  while (i < f.rgb.length) {
                    val p = f.rgb(i)
                    rs += (p >> 16) & 255; gs += (p >> 8) & 255; bs += p & 255
                    ws += (i + 1).toLong * p
                    i += 1
                  }
                  (a.asset_id, idx, clip.width, clip.height,
                    f.rgb.length.toLong, rs, gs, bs, ws)
              }
            case None => Iterator.empty
          }
        }
      }
    }.toDF("asset_id", "frame_idx", "width", "height", "n_px",
      "r_sum", "g_sum", "b_sum", "px_wsum")
  }

  /** Patch-mean-luma embedding stage in LONG form — one row per
    * (asset, patch) with the exact 6dp mean ([[ImageCodec
    * .patchMeanLuma]] over REAL decoded pixels), the oracle-friendly
    * exploded twin of [[extractFeatures]]'s packed float vector.
    * Undecodable assets emit no rows (absence is the visible failure
    * mode, matching [[graft.functions.SimilarityFunctions.signSketch]]'s
    * NULL contract).
    */
  def imagePatchEmbeddings(assets: Dataset[MediaAsset], grid: Int = 4,
      batchSize: Int = 64): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { a =>
          ImageCodec.decode(a.media) match {
            case Some(img) if grid <= img.width && grid <= img.height =>
              ImageCodec.patchMeanLuma(img, grid).iterator.zipWithIndex.map {
                case (m, i) => (a.asset_id, i, m)
              }
            case _ => Iterator.empty
          }
        }
      }
    }.toDF("asset_id", "patch_idx", "mean_luma")
  }

  /** Frame-sampling stage: one row per sampled frame —
    * (asset_id, frame_idx, ts_ms, byte_offset) — via
    * [[frameOffsetsStub]] (a real demuxer swaps in behind the same
    * seek-offset contract). Still images (no duration) produce no
    * rows, visibly. The explode is narrow (each asset's frames derive
    * from its own row); downstream per-frame decode joins frames back
    * to media by asset_id only for the frames actually kept — at 100 TB
    * sample-then-decode touches everyMs/duration of the bytes a
    * decode-then-sample would.
    */
  def sampleFrames(assets: Dataset[MediaAsset], everyMs: Long,
      batchSize: Int = 64): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { a =>
          frameOffsetsStub(a.meta, everyMs).iterator.zipWithIndex.map {
            case (off, i) => (a.asset_id, i, i * everyMs, off)
          }
        }
      }
    }.toDF("asset_id", "frame_idx", "ts_ms", "byte_offset")
  }

  /** 64-bit content fingerprint of the raw bytes (exact-dup key for
    * media, like TextFunctions.fingerprint for text) — xxhash64 on the
    * binary column, codegen'd, no UDF.
    */
  def fingerprintCol(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    xxhash64(media)

  /** Feature extraction over a `Dataset[MediaAsset]`: batched
    * mapPartitions (the Scala analogue of `mapInPandas` batch shape) —
    * each batch of ≤ `batchSize` assets is decoded together, which is
    * where a real codec would amortize model/codec setup per batch.
    */
  def extractFeatures(assets: Dataset[MediaAsset], dim: Int = 16,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real impl: one codec/model invocation per batch
        batch.iterator.map { a =>
          MediaFeatures(
            asset_id = a.asset_id,
            n_bytes = a.media.length.toLong,
            // same xxhash64(seed=42) as fingerprintCol, so fingerprints
            // from the typed and DataFrame paths are interchangeable
            fingerprint = org.apache.spark.sql.catalyst.expressions.XXH64
              .hashUnsafeBytes(a.media,
                org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
                a.media.length, 42L),
            embedding = mediaEmbedding(a.media, dim))
        }
      }
    }
  }

  /** DataFrame variant for untyped pipelines: adds n_bytes, fingerprint
    * (xxhash64) and the [[mediaEmbedding]] (real decode for images,
    * stand-in for video/audio) to any frame with a binary `media`
    * column, as ONE projection — no shuffle, media column droppable
    * immediately after. The embedding is the engine's one sanctioned
    * data-plane `udf`: an image codec has no Catalyst builtin, and the
    * typed twin ([[extractFeatures]]) already covers the mapPartitions
    * shape for pipelines that can take a schema.
    */
  def withMediaFeatures(df: DataFrame, mediaCol: String = "media",
      dim: Int = 16): DataFrame = {
    val bytesToVec = udf((b: Array[Byte]) => mediaEmbedding(b, dim))
    df.withColumn("n_bytes", length(col(mediaCol)).cast("long"))
      .withColumn("fingerprint", fingerprintCol(col(mediaCol)))
      .withColumn("embedding", bytesToVec(col(mediaCol)))
  }

  /** 64-bit fingerprint of the DECODED raster (dims + packed-RGB
    * pixels), not the container bytes: re-encoded duplicates — the same
    * image served as PNG and BMP, or re-compressed at a different
    * level — share it while byte fingerprints ([[fingerprintCol]])
    * differ on every copy. A crawl-scale corpus is full of exactly this
    * class (CDN re-encodes, thumbnail caches). XXH64 seed 42 over
    * width·height·pixels, the media-fingerprint convention; `None` for
    * media ImageIO cannot decode.
    */
  def pixelFingerprint(bytes: Array[Byte]): Option[Long] =
    ImageCodec.decode(bytes).map { img =>
      val bb = java.nio.ByteBuffer.allocate(8 + img.rgb.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(img.width).putInt(img.height)
      // while, not Array.foreach: the eta-expanded Int => ByteBuffer
      // closure boxes EVERY pixel (measured 10x on the 500k-doc probe)
      var i = 0
      while (i < img.rgb.length) { bb.putInt(img.rgb(i)); i += 1 }
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bb.array, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        bb.array.length, 42L)
    }

  /** Exact dedup of re-encoded image duplicates: keyed on
    * [[pixelFingerprint]] where the media decodes, falling back to the
    * byte fingerprint (the [[dedupByFingerprint]] semantics) for
    * video/audio so the operator is total over a mixed-modality lake.
    * Same scale shape as [[dedupByFingerprint]]: the key is ONE narrow
    * mapPartitions projection (decode cost is per-row CPU, media never
    * shuffles for keying) and the survivor choice is a single
    * `min_by`-style hash aggregation ([[graft.functions.DedupFunctions
    * .dedupExact]]) with map-side partials — a million re-encodes of
    * one spacer image collapse before the shuffle.
    */
  def dedupByPixels(assets: Dataset[MediaAsset], batchSize: Int = 64): DataFrame = {
    import assets.sparkSession.implicits._
    val keyed = assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { a =>
          val k = pixelFingerprint(a.media).getOrElse(
            org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
              a.media, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
              a.media.length, 42L))
          (a.asset_id, a.media, a.meta, k)
        }
      }
    }.toDF("asset_id", "media", "meta", "_pfp")
    graft.functions.DedupFunctions.dedupExact(keyed, "asset_id", "_pfp")
      .drop("_pfp")
  }

  /** Perceptual near-dup key: [[ImageCodec.aHashBits]] of the decoded
    * raster ('a:'-prefixed), `None` for media ImageIO cannot decode.
    * Where [[pixelFingerprint]] keys raster EQUALITY (catches
    * re-encodes), this keys the patch-luma PATTERN — invariant under
    * nearest-neighbor resize, so the thumbnail-cache / CDN-resize
    * duplicate class collapses too.
    */
  def aHashKey(bytes: Array[Byte], grid: Int = 8): Option[String] =
    ImageCodec.decode(bytes).map(img => "a:" + ImageCodec.aHashBits(img, grid))

  /** Perceptual dedup of resized/re-encoded image duplicates: keyed on
    * [[aHashKey]] where the media decodes, falling back to the byte
    * fingerprint ('b:'-prefixed — the namespace split keeps an aHash
    * bit string from ever colliding with a byte-hash rendering) for
    * video/audio, so the operator is total over a mixed-modality lake.
    * Same scale shape as [[dedupByPixels]]: keying is ONE narrow
    * mapPartitions projection (decode is per-row CPU; media never
    * shuffles for keying), survivor choice ONE `min_by` hash
    * aggregation with map-side partials. Strictly coarser than
    * [[dedupByPixels]] on decodable media (equal rasters ⇒ equal
    * hashes): run this when resize-duplicates matter, the pixel form
    * when only exact rasters may merge.
    */
  def dedupByAHash(assets: Dataset[MediaAsset], grid: Int = 8,
      batchSize: Int = 64): DataFrame = {
    import assets.sparkSession.implicits._
    val keyed = assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { a =>
          val k = aHashKey(a.media, grid).getOrElse {
            "b:" + java.lang.Long.toHexString(
              org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
                a.media, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
                a.media.length, 42L))
          }
          (a.asset_id, a.media, a.meta, k)
        }
      }
    }.toDF("asset_id", "media", "meta", "_ahash")
    graft.functions.DedupFunctions.dedupExact(keyed, "asset_id", "_ahash")
      .drop("_ahash")
  }

  /** Exact media dedup on the binary fingerprint — delegates to
    * [[graft.functions.DedupFunctions.dedupExact]]: ONE `min_by(row
    * struct, id)` hash aggregation keyed on the fingerprint, map-side
    * partials keeping a single candidate row per fingerprint per task.
    * A crawl's most-duplicated asset (spacer gif, default thumbnail —
    * one fingerprint, millions of copies) collapses BEFORE the shuffle
    * instead of sorting through one window task; the media bytes are
    * shuffled exactly once, inside the surviving candidates' structs.
    */
  def dedupByFingerprint(df: DataFrame, idCol: String = "asset_id",
      mediaCol: String = "media"): DataFrame = {
    val keyed = df.withColumn("_fp", fingerprintCol(col(mediaCol)))
    graft.functions.DedupFunctions.dedupExact(keyed, idCol, "_fp").drop("_fp")
  }
}
