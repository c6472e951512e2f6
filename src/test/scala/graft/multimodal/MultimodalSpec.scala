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
}
