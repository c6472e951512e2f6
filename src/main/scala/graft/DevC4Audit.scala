package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage timer for the c4_corpus_semantic_md5 composition —
  * splits the text tier (the c3 prefix), the pooling/LSH pair stage and
  * the final cluster anti-join so a bench regression can be attributed
  * to a stage instead of the whole composed query. Not part of the
  * registry; delete when the audit closes.
  */
object DevC4Audit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- Seq("documents", "embeddings"))
      spark.read.parquet(s"$sfDir/$t.parquet").count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[c4audit] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val cfg = graft.corpus.CorpusConfig(
      minTokens = 20, minQuality = 50.0, maxDupBigramFrac = 0.3,
      numHashes = 16, bands = 4, nearDupThreshold = 0.7,
      minhashHash = (c, i) => graft.functions.DedupFunctions.md5Hash60(
        concat(c, lit("#"), lit(i))),
      minhashBucketHash = (c, b) => graft.functions.DedupFunctions.md5Hash60(
        concat(c, lit("#b#"), lit(b))))
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(expr("vec_id div 10").as("doc_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val chunks = base.filter(col("doc_id") =!= 23L)
      .unionAll(base.filter(col("doc_id") === 7L)
        .select(lit(23L).as("doc_id"),
          transform(col("embedding"), x => x + lit(0.002)).as("embedding")))
    val sem = graft.corpus.SemanticConfig(dim = 64, nBits = 32,
      bands = 4, minCosine = 0.9, quantize = false)

    // candidate-pair volume under the current embedding geometry: the
    // ledger evidence that the r10->r11 data regeneration did NOT
    // explode the semantic tier's LSH candidate set
    {
      Caches.releaseAll(); spark.catalog.clearCache()
      val survivors = graft.corpus.CorpusPipeline
        .clean(docs, "doc_id", "text", cfg).localCheckpoint()
      val S = graft.functions.SimilarityFunctions
      val alive = chunks.join(survivors.select(col("doc_id")), Seq("doc_id"), "left_semi")
      val pooled = S.assembleVec(
          S.meanPoolFlat(alive, "doc_id", "embedding")
            .withColumn("mean_v", round(col("mean_v"), 6)), "doc_id")
        .select(col("doc_id").as("id"), col("vec"))
      println(s"[c4audit] pooled docs = ${pooled.count()}")
      val pairs = S.lshNeighborPairs(
        pooled, dim = 64, nBits = 32, bands = 4, minCosine = 0.9,
        idCol = "id", vecCol = "vec", seed = sem.seed)
      println(s"[c4audit] verified semantic pairs (cos>=0.9) = ${pairs.count()}")
      val tpairs = graft.functions.DedupFunctions.minhashLshPairs(
        survivors.select(col("doc_id"), col("text")), "doc_id", "text",
        n = cfg.shingleN, numHashes = cfg.numHashes, bands = cfg.bands,
        threshold = cfg.nearDupThreshold,
        hash = cfg.minhashHash, bucketHash = cfg.minhashBucketHash)
      println(s"[c4audit] text minhash pairs (jacc>=0.7) = ${tpairs.count()}")
    }
    for (iter <- 1 to args.headOption.map(_.toInt).getOrElse(2)) {
      println(s"[c4audit] === iter $iter ===")
      Caches.releaseAll(); spark.catalog.clearCache()
      // stage A: the c3-shaped text tier alone
      time("text tier (c3 shape)") {
        graft.corpus.CorpusPipeline.clean(docs, "doc_id", "text", cfg)
          .queryExecution.toRdd.count()
      }
      Caches.releaseAll(); spark.catalog.clearCache()
      // stage B: full c4 (text tier + semantic tier)
      time("full c4 (text+semantic)") {
        graft.corpus.CorpusPipeline.clean(docs, "doc_id", "text", cfg,
          chunkEmbeddings = Some(chunks), semantic = Some(sem))
          .select(col("doc_id"), md5(col("text")).as("text_md5"))
          .orderBy("doc_id")
          .queryExecution.toRdd.count()
      }
      Caches.releaseAll(); spark.catalog.clearCache()
      // stage C: semantic tier in isolation over a PRE-MATERIALIZED
      // survivor set (localCheckpoint severs the text-tier lineage)
      val survivors = graft.corpus.CorpusPipeline
        .clean(docs, "doc_id", "text", cfg).localCheckpoint()
      println(s"[c4audit] survivors = ${survivors.count()}")
      time("semantic tier alone") {
        graft.corpus.CorpusPipeline.semanticDedup(
          survivors, "doc_id", chunks, "doc_id", "embedding", sem)
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
