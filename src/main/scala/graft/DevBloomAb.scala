package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B for the Bloom-gate crossover (PLANS.md note): times the
  * bloom-gated vs plain exact-vs-corpus tier of `appendBatchIndexed` at
  * two corpus:batch ratios — c5c's registry split (tiny corpus, big
  * batch) and its inverse (big corpus, small batch, the steady-state
  * nightly regime the gate exists for). Not part of the registry.
  */
object DevBloomAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val D = graft.functions.DedupFunctions
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.count()
    val cfg = graft.corpus.CorpusConfig(
      minTokens = 20, minQuality = 50.0, maxDupBigramFrac = 0.3,
      numHashes = 16, bands = 4, nearDupThreshold = 0.7)

    def run(label: String, corpusMax: Long): Unit = {
      val existing = docs.filter(col("doc_id") < corpusMax)
      val batch = docs.filter(col("doc_id") >= corpusMax)
        .unionAll(docs.filter(col("doc_id") < 30)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      // production shape: the index is STORED state (parquet round
      // trip) and the merged bloom is read, not rebuilt — only the
      // nightly append itself is timed
      val dir = java.nio.file.Files.createTempDirectory("bloomab")
        .toFile.getAbsolutePath
      val built = graft.corpus.CorpusPipeline.buildTextIndex(
        existing, "doc_id", "text", cfg)
      built.fingerprints.write.parquet(s"$dir/fp")
      built.shingles.write.parquet(s"$dir/sh")
      built.bands.write.parquet(s"$dir/bd")
      Caches.releaseAll()
      val idx = graft.corpus.CorpusPipeline.TextIndex(
        spark.read.parquet(s"$dir/fp"), spark.read.parquet(s"$dir/sh"),
        spark.read.parquet(s"$dir/bd"))
      val bloom = D.fingerprintBloom(idx.fingerprints, "fp", 100000L)
      for (gated <- Seq(false, true)) {
        val times = (1 to iters).map { _ =>
          Caches.releaseAll(); spark.catalog.clearCache()
          val t0 = System.nanoTime()
          graft.corpus.CorpusPipeline.appendBatchIndexed(
              idx, batch, "doc_id", "text", cfg,
              fpBloom = if (gated) Some(bloom) else None)
            .queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"[bloomab] $label%-26s gated=$gated%-5s " +
          f"min=${times.head}%6.2f med=${times(times.size / 2)}%6.2f s")
      }
    }
    run("corpus 250 : batch 4780", 250L)   // c5c's registry split
    run("corpus 4750 : batch 280", 4750L)  // inverted: steady-state shape
    spark.stop()
  }
}
