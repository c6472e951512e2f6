package graft.corpus

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.TextFunctions

class CorpusPipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("clean: every survivor passes every gate; duplicates are gone") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // plant an exact duplicate and a PII doc to exercise those paths
    val dupOfDoc3 = docs.filter(col("doc_id") === 3L)
      .select(lit(900001L).as("doc_id"), col("text"))
    val piiDoc = spark.sql(
      """SELECT * FROM VALUES (900002L,
        |  'contact me at real.person@example.com about the data table row group and the merge of the sorted parts in the scan')
        |AS t(doc_id, text)""".stripMargin)
    val planted = docs.unionByName(dupOfDoc3).unionByName(piiDoc)
    val cfg = CorpusConfig(minTokens = 15, minQuality = 60.0)
    val out = CorpusPipeline.clean(planted, "doc_id", "text", cfg)
    val checked = out.select(
      TextFunctions.tokenCount(col("text")).as("tok"),
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.duplicateNgramFraction(col("text"), 2).as("bg"),
      TextFunctions.piiCount(col("text")).as("pii"))
      .as[(Long, Double, Double, Long)].collect()
    assert(checked.nonEmpty)
    assert(checked.forall(_._1 >= 15), "token gate")
    assert(checked.forall(_._2 >= 60.0), "quality gate")
    assert(checked.forall(_._3 <= 0.3), "repetition gate")
    assert(checked.forall(_._4 === 0L), "all PII scrubbed")
    // the planted exact duplicate lost to the lower-id original
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(900001L), "exact duplicate must drop")
    // no two survivors share a fingerprint
    val fps = out.select(TextFunctions.fingerprint(col("text"))).distinct().count()
    assert(fps === out.count())
  }

  test("run: shards on disk, splits complete, counts match the files") {
    val out = Files.createTempDirectory("corpus").toFile.getAbsolutePath
    val counts = CorpusPipeline.run(spark, sfDir, out,
      CorpusConfig(minTokens = 15, minQuality = 50.0, shards = 4))
    val back = spark.read.parquet(out)
    assert(back.count() === counts.values.sum)
    assert(counts.values.sum > 100L, "pipeline should keep a real fraction")
    val splits = back.select("split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "valid", "test")) && splits.contains("train"))
    // deterministic: a second run writes identical membership
    val out2 = Files.createTempDirectory("corpus").toFile.getAbsolutePath
    CorpusPipeline.run(spark, sfDir, out2,
      CorpusConfig(minTokens = 15, minQuality = 50.0, shards = 4))
    val again = spark.read.parquet(out2)
    assert(back.select("doc_id", "split", "shard")
      .exceptAll(again.select("doc_id", "split", "shard")).isEmpty)
  }
}
