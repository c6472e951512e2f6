package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.multimodal.Multimodal._

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // fake media corpus: document texts as opaque bytes (id 3 = dup of 1)
  private def assets = Seq(
    MediaAsset(1L, "fake-jpeg-aaaa".getBytes, MediaMeta("image/jpeg", 640, 480, 0L)),
    MediaAsset(2L, "fake-jpeg-bbbb".getBytes, MediaMeta("image/jpeg", 640, 480, 0L)),
    MediaAsset(3L, "fake-jpeg-aaaa".getBytes, MediaMeta("image/jpeg", 640, 480, 0L)),
    MediaAsset(4L, "fake-mp4-cccc".getBytes, MediaMeta("video/mp4", 1920, 1080, 10000L))
  ).toDS()

  test("extractFeatures: one feature row per asset, deterministic embeddings") {
    val f1 = extractFeatures(assets, dim = 8).collect().sortBy(_.asset_id)
    val f2 = extractFeatures(assets, dim = 8).collect().sortBy(_.asset_id)
    assert(f1.length === 4)
    assert(f1.map(_.embedding.toSeq) === f2.map(_.embedding.toSeq))
    assert(f1.forall(_.embedding.length === 8))
    // identical bytes → identical features; different bytes → different
    assert(f1(0).embedding.toSeq === f1(2).embedding.toSeq)
    assert(f1(0).embedding.toSeq !== f1(1).embedding.toSeq)
  }

  test("extractFeatures batch shape: batchSize bounds each decode group") {
    val many = (1L to 100L).map(i =>
      MediaAsset(i, s"bytes$i".getBytes, MediaMeta("image/jpeg", 1, 1, 0L))).toDS()
    val out = extractFeatures(many.repartition(2), batchSize = 7)
    assert(out.count() === 100L)
  }

  test("withMediaFeatures projects features without shuffling media") {
    val df = assets.toDF().select(col("asset_id"), col("media"), col("meta.mime"))
    val out = withMediaFeatures(df)
    assert(out.columns.toSet === Set("asset_id", "media", "mime", "n_bytes", "fingerprint", "embedding"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"feature projection must be narrow:\n$plan")
    assert(out.filter(col("asset_id") === 1L).head().getAs[Long]("n_bytes") === 14L)
  }

  test("dedupByFingerprint keeps min-id asset per identical bytes") {
    val kept = dedupByFingerprint(assets.toDF())
      .select("asset_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 2L, 4L)) // 3 deduped into 1
  }

  test("frameOffsetsStub samples by duration, empty for still images") {
    assert(frameOffsetsStub(MediaMeta("video/mp4", 1, 1, 10000L), 2500L).length === 4)
    assert(frameOffsetsStub(MediaMeta("image/jpeg", 1, 1, 0L), 2500L).isEmpty)
  }

  test("withThumbnails: long edge capped, meta scaled, small media untouched") {
    val out = withThumbnails(assets, maxDim = 320).collect()
      .map(a => a.asset_id -> a).toMap
    // 640x480 → 320x240; byte payload shrinks ~area ratio (stub contract)
    assert(out(1L).meta.width === 320 && out(1L).meta.height === 240)
    assert(out(1L).media.length < "fake-jpeg-aaaa".getBytes.length)
    // 1920x1080 → 320x180
    assert(out(4L).meta.width === 320 && out(4L).meta.height === 180)
    // identical inputs resize identically (deterministic stub)
    assert(out(1L).media.toSeq === out(3L).media.toSeq)
    // already-small media pass through byte-identical
    val small = Seq(MediaAsset(9L, "tiny".getBytes,
      MediaMeta("image/jpeg", 100, 50, 0L))).toDS()
    val s = withThumbnails(small, maxDim = 320).head()
    assert(s.media.toSeq === "tiny".getBytes.toSeq && s.meta.width === 100)
    // narrow stage: no shuffle
    val plan = withThumbnails(assets, 320).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("sampleFrames: one row per sampled frame, stills contribute none") {
    val frames = sampleFrames(assets, everyMs = 2500L)
    assert(frames.columns.toSeq === Seq("asset_id", "frame_idx", "ts_ms", "byte_offset"))
    val rows = frames.as[(Long, Int, Long, Long)].collect().sorted
    assert(rows.forall(_._1 === 4L), "only the video asset has frames")
    assert(rows.map(_._2).toSeq === Seq(0, 1, 2, 3))
    assert(rows.map(_._3).toSeq === Seq(0L, 2500L, 5000L, 7500L))
    assert(!frames.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  // ---- the REAL image path (r15: javax.imageio codec) ----

  private def pngAssets = Seq(
    MediaAsset(1L, ImageCodec.synthPng(1L, 64, 48), MediaMeta("image/png", 64, 48, 0L)),
    MediaAsset(2L, ImageCodec.synthPng(2L, 32, 16), MediaMeta("image/png", 32, 16, 0L)),
    // a liar: metadata claims 9999x9999 — the decoded raster is the truth
    MediaAsset(3L, ImageCodec.synthPng(3L, 48, 24), MediaMeta("image/png", 9999, 9999, 0L)),
    // undecodable bytes: must take the visible stand-in path
    MediaAsset(4L, "fake-mp4-cccc".getBytes, MediaMeta("video/mp4", 1920, 1080, 10000L))
  ).toDS()

  test("withThumbnails real path: decode -> areaAverage -> PNG, meta from pixels") {
    val out = withThumbnails(pngAssets, maxDim = 16).collect()
      .map(a => a.asset_id -> a).toMap
    // thumbnail pixels are EXACTLY areaAverage of the decoded original
    val t1 = ImageCodec.decode(out(1L).media).get
    val expect = ImageCodec.areaAverage(ImageCodec.synthImage(1L, 64, 48), 16, 12)
    assert(t1.width === 16 && t1.height === 12)
    assert(t1.rgb.toSeq === expect.rgb.toSeq)
    assert(out(1L).meta.mime === "image/png" && out(1L).meta.width === 16)
    // lying metadata is ignored: 48x24 raster -> 16x8, not 16x16
    assert(out(3L).meta.width === 16 && out(3L).meta.height === 8)
    // undecodable media keeps the stub path visibly (mime unchanged)
    assert(out(4L).meta.mime === "video/mp4")
  }

  test("decodeImages: exact sums and checksum for real pixels, visible failure otherwise") {
    val rows = decodeImages(pngAssets).collect()
      .map(r => r.getAs[Long]("asset_id") -> r).toMap
    val img = ImageCodec.synthImage(2L, 32, 16)
    var rs = 0L; var ws = 0L
    img.rgb.zipWithIndex.foreach { case (p, i) =>
      rs += (p >> 16) & 255; ws += (i + 1).toLong * p
    }
    assert(rows(2L).getAs[Boolean]("decoded_ok"))
    assert(rows(2L).getAs[Int]("width") === 32)
    assert(rows(2L).getAs[Long]("n_px") === 512L)
    assert(rows(2L).getAs[Long]("r_sum") === rs)
    assert(rows(2L).getAs[Long]("px_wsum") === ws)
    assert(!rows(4L).getAs[Boolean]("decoded_ok"))
    assert(rows(4L).getAs[Long]("n_px") === 0L)
  }

  test("mediaEmbedding dispatch: real patch means for images, stub for the rest") {
    val png = ImageCodec.synthPng(5L, 16, 16)
    val emb = mediaEmbedding(png, dim = 16)
    val means = ImageCodec.patchMeanLuma(ImageCodec.synthImage(5L, 16, 16), 4)
    assert(emb.toSeq === means.map(_.toFloat).toSeq)
    val fake = "fake-mp4".getBytes
    assert(mediaEmbedding(fake, 16).toSeq === decodeStub(fake, 16).toSeq)
    // extractFeatures rides the same dispatch
    val f = extractFeatures(pngAssets, dim = 16).collect()
      .map(x => x.asset_id -> x).toMap
    assert(f(1L).embedding.toSeq ===
      ImageCodec.patchMeanLuma(ImageCodec.synthImage(1L, 64, 48), 4).map(_.toFloat).toSeq)
    assert(f(4L).embedding.toSeq === decodeStub("fake-mp4-cccc".getBytes, 16).toSeq)
  }

  test("pixelFingerprint keys on decoded pixels, not container bytes") {
    val img = ImageCodec.synthImage(9L, 16, 12)
    val png = ImageCodec.encodePng(img)
    val bmp = ImageCodec.encode(img, "bmp")
    assert(!(png.toSeq == bmp.toSeq), "containers must differ for the test to mean anything")
    assert(pixelFingerprint(png) === pixelFingerprint(bmp))
    assert(pixelFingerprint(png).isDefined)
    // different pixels -> different key; undecodable -> None
    val other = ImageCodec.encodePng(ImageCodec.synthImage(10L, 16, 12))
    assert(pixelFingerprint(png) !== pixelFingerprint(other))
    assert(pixelFingerprint("not an image".getBytes).isEmpty)
  }

  test("dedupByPixels collapses re-encodes onto the min id, keeps the rest") {
    val img1 = ImageCodec.synthImage(1L, 16, 12)
    val mixed = Seq(
      MediaAsset(1L, ImageCodec.encodePng(img1), MediaMeta("image/png", 16, 12, 0L)),
      MediaAsset(2L, ImageCodec.encode(img1, "bmp"), MediaMeta("image/bmp", 16, 12, 0L)),
      MediaAsset(3L, ImageCodec.encodePng(ImageCodec.synthImage(3L, 16, 12)),
        MediaMeta("image/png", 16, 12, 0L)),
      // undecodable media key on BYTES: identical bytes collapse, distinct survive
      MediaAsset(4L, "fake-mp4-cccc".getBytes, MediaMeta("video/mp4", 1, 1, 0L)),
      MediaAsset(5L, "fake-mp4-cccc".getBytes, MediaMeta("video/mp4", 1, 1, 0L))
    ).toDS()
    val kept = dedupByPixels(mixed).select("asset_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L, 4L))
  }

  test("dedupByAHash collapses resized AND re-encoded copies; distinct images survive") {
    val img1 = ImageCodec.synthImage(21L, 16, 8)
    val mixed = Seq(
      MediaAsset(1L, ImageCodec.encodePng(img1), MediaMeta("image/png", 16, 8, 0L)),
      // 2x nearest-neighbor resize: different bytes AND different raster,
      // same aHash -> must collapse onto id 1 (the class mm7 misses)
      MediaAsset(2L, ImageCodec.encodePng(ImageCodec.upscaleNearest(img1, 2)),
        MediaMeta("image/png", 32, 16, 0L)),
      // BMP re-encode of the same image: collapses here too (coarser than pixels)
      MediaAsset(3L, ImageCodec.encode(img1, "bmp"), MediaMeta("image/bmp", 16, 8, 0L)),
      // genuinely different image survives
      MediaAsset(4L, ImageCodec.encodePng(ImageCodec.synthImage(22L, 16, 8)),
        MediaMeta("image/png", 16, 8, 0L)),
      // undecodable media key on bytes: identical collapse, the 'b:' namespace
      // keeps them out of every aHash group
      MediaAsset(5L, "fake-mp4-cccc".getBytes, MediaMeta("video/mp4", 1, 1, 0L)),
      MediaAsset(6L, "fake-mp4-cccc".getBytes, MediaMeta("video/mp4", 1, 1, 0L))
    ).toDS()
    val kept = dedupByAHash(mixed).select("asset_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 4L, 5L))
  }

  test("videoFrameFeatures: every-2nd real AVI frame; compressed media absent") {
    val assets = Seq(
      MediaAsset(1L, VideoCodec.synthAvi(1L, 3, 8, 6), MediaMeta("video/avi", 8, 6, 120L)),
      MediaAsset(2L, "fake-mp4-cccc".getBytes, MediaMeta("video/mp4", 1, 1, 0L))
    ).toDS()
    val rows = videoFrameFeatures(assets, everyN = 2).collect()
    assert(rows.map(r => (r.getAs[Long]("asset_id"), r.getAs[Int]("frame_idx"))).toSet
      === Set((1L, 0), (1L, 2)))
    // per-frame sums are the decode-audit arithmetic over the frame's raster
    val f2 = ImageCodec.synthImage(1L + 131071L * 2, 8, 6)
    val expR = f2.rgb.map(p => ((p >> 16) & 255).toLong).sum
    val expW = f2.rgb.zipWithIndex.map { case (p, i) => (i + 1).toLong * p }.sum
    val r2 = rows.find(r => r.getAs[Int]("frame_idx") == 2).get
    assert(r2.getAs[Long]("r_sum") === expR)
    assert(r2.getAs[Long]("px_wsum") === expW)
  }

  test("imagePatchEmbeddings: long-form exact means; undecodable assets absent") {
    val rows = imagePatchEmbeddings(pngAssets, grid = 4).collect()
    assert(rows.map(_.getAs[Long]("asset_id")).toSet === Set(1L, 2L, 3L))
    val m1 = rows.filter(_.getAs[Long]("asset_id") == 1L)
      .sortBy(_.getAs[Int]("patch_idx")).map(_.getAs[Double]("mean_luma"))
    assert(m1.toSeq === ImageCodec.patchMeanLuma(ImageCodec.synthImage(1L, 64, 48), 4).toSeq)
    val plan = imagePatchEmbeddings(pngAssets, 4).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "patch embedding must be narrow")
  }
}
