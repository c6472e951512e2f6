package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / thumbnail / frame-sample stages.
  *
  * The Spark-side plumbing is REAL — schemas, batched partition
  * processing, deterministic outputs, size accounting, partition-level
  * parallelism — while the media codecs are STUBS (`decodeStub`,
  * `frameOffsetsStub`): this container ships no image/audio libraries, so
  * decode is a deterministic fake keyed on the bytes. Swapping in a real
  * codec changes ONE function; every schema, batch shape, and plan stays.
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

  /** ??? REAL-CODEC BOUNDARY ??? — deterministic fake decoder standing in
    * for (e.g.) JPEG decode + CNN embed. Produces a `dim`-float vector
    * from a rolling hash of the bytes; stable across JVMs and runs.
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

  /** ??? REAL-CODEC BOUNDARY ??? — video frame sampling stand-in: returns
    * the byte offsets a real demuxer would seek to, one per `everyMs`.
    */
  def frameOffsetsStub(meta: MediaMeta, everyMs: Long): Seq[Long] =
    if (meta.durationMs <= 0 || everyMs <= 0) Seq.empty
    else (0L until meta.durationMs by everyMs).map(t => t * 1024L)

  /** ??? REAL-CODEC BOUNDARY ??? — resize/thumbnail stand-in: a real
    * impl decodes, scales the long edge to `maxDim`, re-encodes. The
    * stub keeps a deterministic byte subsample whose length shrinks
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
    * mapPartitions like [[extractFeatures]] (one codec invocation per
    * batch in a real impl), media bytes REPLACED in place — the
    * training-data shape where originals live in the lake and the
    * pipeline materializes a bounded-size derivative. Narrow: no
    * shuffle, peak memory bounded by `batchSize` assets.
    */
  def withThumbnails(assets: Dataset[MediaAsset], maxDim: Int,
      batchSize: Int = 64): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { a =>
          val (b, m) = thumbnailStub(a.media, a.meta, maxDim)
          MediaAsset(a.asset_id, b, m)
        }
      }
    }
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
            embedding = decodeStub(a.media, dim))
        }
      }
    }
  }

  /** DataFrame variant for untyped pipelines: adds n_bytes, fingerprint
    * (xxhash64) and the stub embedding to any frame with a binary
    * `media` column, as ONE projection — no shuffle, media column
    * droppable immediately after.
    */
  def withMediaFeatures(df: DataFrame, mediaCol: String = "media",
      dim: Int = 16): DataFrame = {
    val bytesToVec = udf((b: Array[Byte]) => decodeStub(b, dim))
    df.withColumn("n_bytes", length(col(mediaCol)).cast("long"))
      .withColumn("fingerprint", fingerprintCol(col(mediaCol)))
      .withColumn("embedding", bytesToVec(col(mediaCol)))
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
