package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage timer for c11_containment_append_md5 (the r14 verdict's
  * task 4): at sf10 the probe showed the registry's most expensive query
  * with the widest min/median spread (355 s vs 615 s, min-of-2) and no
  * attribution. This splits the append into its tiers — batch clean,
  * corpus text-index build, exact anti-join, cross-LSH, containment
  * winnow — so the spread lands on a stage (suspect: the containment
  * Σdf² join's AQE partitioning at 500k docs) or on load. Not part of
  * the registry; delete when the audit closes.
  */
object DevC11Audit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[c11audit] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val cfg = graft.corpus.CorpusConfig(
      minTokens = 20, minQuality = 50.0, maxDupBigramFrac = 0.3,
      numHashes = 16, bands = 4, nearDupThreshold = 0.7,
      minhashHash = (c, i) => graft.functions.DedupFunctions.md5Hash60(
        concat(c, lit("#"), lit(i))),
      minhashBucketHash = (c, b) => graft.functions.DedupFunctions.md5Hash60(
        concat(c, lit("#b#"), lit(b))),
      containmentThreshold = Some(0.7),
      winnowHash = c => md5(c.cast("binary")))
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val existing = d.filter(col("doc_id") < 250)
      .select(col("doc_id"), col("text"))
    val batch = d.filter(col("doc_id") >= 250)
      .select(col("doc_id"), col("text"))
      .unionAll(d.filter(col("doc_id") % 25 === 0 && col("doc_id") < 250)
        .select((col("doc_id") + 100000).as("doc_id"),
          substring(col("text"), 40, 140).as("text")))

    for (iter <- 1 to iters) {
      println(s"[c11audit] === iter $iter ===")
      Caches.releaseAll(); spark.catalog.clearCache(); System.gc()
      // stage A: batch-internal clean (text gates + internal dedup)
      val cleaned = time("A clean(batch)") {
        val c = graft.corpus.CorpusPipeline.clean(batch, "doc_id", "text", cfg)
          .localCheckpoint()
        println(s"[c11audit]   survivors = ${c.count()}")
        c
      }
      // stage B: corpus-side text index (fp + shingles + bands + winnow)
      val idx = time("B buildTextIndex(existing)") {
        val i = graft.corpus.CorpusPipeline.buildTextIndex(
          existing, "doc_id", "text", cfg)
        val iMat = graft.corpus.CorpusPipeline.TextIndex(
          i.fingerprints.localCheckpoint(), i.shingles.localCheckpoint(),
          i.bands.localCheckpoint(), i.winnow.map(_.localCheckpoint()))
        println(s"[c11audit]   fp=${iMat.fingerprints.count()} " +
          s"bands=${iMat.bands.count()} winnow=${iMat.winnow.map(_.count())}")
        iMat
      }
      // stage C: exact-vs-corpus anti-join
      val afterExact = time("C exact anti-join") {
        val fpc = graft.functions.TextFunctions.fingerprint(col("text"))
        val a = cleaned.withColumn("_fp", fpc)
          .join(idx.fingerprints.select(col("fp").as("_fp")), Seq("_fp"), "left_anti")
          .drop("_fp").localCheckpoint()
        println(s"[c11audit]   after exact = ${a.count()}")
        a
      }
      // stage D: cross-LSH vs stored bands + drop
      val afterLsh = time("D cross-LSH + drop") {
        val shing = afterExact.select(col("doc_id").as("id"),
          graft.functions.DedupFunctions.wordShingles(col("text"), cfg.shingleN)
            .as("shingles"))
        val pairs = graft.functions.DedupFunctions.minhashLshPairsAgainstIndexed(
          idx.bands, idx.shingles, shing,
          numHashes = cfg.numHashes, bands = cfg.bands,
          threshold = cfg.nearDupThreshold,
          hash = cfg.minhashHash, bucketHash = cfg.minhashBucketHash)
        val a = graft.functions.DedupFunctions.dropNearDuplicates(
          afterExact, pairs, "doc_id").localCheckpoint()
        println(s"[c11audit]   after lsh = ${a.count()}")
        a
      }
      // stage E: the containment winnow join (the Σdf² suspect)
      time("E containment winnow") {
        val contained = graft.functions.DedupFunctions.containmentPairsAgainst(
            idx.winnow.get, afterLsh, "doc_id", "text", threshold = 0.7,
            maxDocFreq = cfg.containmentMaxDocFreq, hash = cfg.winnowHash)
          .select(col("contained_id").as("doc_id")).distinct()
        val a = afterLsh.join(broadcast(contained), Seq("doc_id"), "left_anti")
        println(s"[c11audit]   final = ${a.count()}")
      }
      Caches.releaseAll(); spark.catalog.clearCache(); System.gc()
      // stage F: the registry query end-to-end (what the probe times)
      time("F full appendBatch (c11)") {
        val n = graft.corpus.CorpusPipeline.appendBatch(
          existing, batch, "doc_id", "text", cfg).count()
        println(s"[c11audit]   rows = $n")
      }
    }
    spark.stop()
  }
}
