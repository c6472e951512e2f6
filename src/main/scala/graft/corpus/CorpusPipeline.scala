package graft.corpus

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{DedupFunctions, SamplingFunctions, SimilarityFunctions, TextFunctions}
import graft.warehouse.ShardWriter

/** Gate thresholds and output shape for [[CorpusPipeline]]. `keepLangs`
  * empty keeps every language; percentages follow
  * [[graft.functions.SamplingFunctions.splitColumn]]. `minhashHash` /
  * `minhashBucketHash` expose the near-dup tier's hash functions —
  * production keeps the xxhash64 defaults; the registry's oracle twin
  * swaps in the engine-shared md5 hash so the WHOLE composed pipeline
  * can be replayed externally (the m1b pattern).
  */
final case class CorpusConfig(
    minTokens: Long = 20,
    minQuality: Double = 50.0,
    maxDupBigramFrac: Double = 0.3,
    keepLangs: Set[String] = Set.empty,
    redactPii: Boolean = true,
    shingleN: Int = 3,
    numHashes: Int = 32,
    bands: Int = 8,
    nearDupThreshold: Double = 0.7,
    hotBucketThreshold: Long = 4096L,
    salts: Int = 16,
    pctTrain: Int = 90,
    pctValid: Int = 5,
    shards: Int = 8,
    minhashHash: (Column, Int) => Column =
      (c, i) => xxhash64(c, lit(i)),
    minhashBucketHash: (Column, Int) => Column =
      (c, b) => xxhash64(c, lit(b)))

/** Embedding-tier (semantic) dedup knobs for [[CorpusPipeline.clean]].
  * `dim` is the embedding dimensionality (needed to generate the LSH
  * hyperplanes); `quantize` routes pooled vectors through int8
  * quantization before the LSH pass — cosine is invariant to the
  * per-vector scale, so candidate quality is unchanged while the
  * shuffled/cached vectors shrink 8x vs double arrays (the knob that
  * decides whether a 100 TB corpus's vectors fit executor storage);
  * `minCosine` is the verified-cosine near-dup threshold; `maxIter`
  * bounds the connected-components star rounds. `chunksPerDoc` is how
  * [[CorpusPipeline.run]] keys the flat embeddings table back to its
  * documents (`doc_id = vec_id div chunksPerDoc` — the testdata emits a
  * fixed 10-chunk fanout); a corpus whose embeddings table carries an
  * explicit doc-id column should pass chunk frames to
  * [[CorpusPipeline.clean]] directly instead.
  */
final case class SemanticConfig(
    dim: Int,
    nBits: Int = 16,
    bands: Int = 4,
    minCosine: Double = 0.9,
    quantize: Boolean = true,
    seed: Long = 42L,
    maxIter: Int = 25,
    hotBucketThreshold: Long = 4096L,
    salts: Int = 16,
    chunksPerDoc: Int = 10)

/** The end-to-end training-corpus pipeline, composed entirely from the
  * oracle-verified operators: quality/repetition/language gates → PII
  * scrub → exact dedup → MinHash-LSH near-dup drop → deterministic
  * split → reproducible shard export. One call takes a raw document
  * table to trainer-ready shards; every stage is the 100 TB shape its
  * operator documents (gates and scrub are scan-speed projections,
  * dedup shuffles fingerprints/signatures rather than text, split is a
  * row-local predicate, export is one hash shuffle).
  */
object CorpusPipeline {

  /** Semantic (embedding-tier) near-dup dedup over the TEXT-stage
    * survivors: mean-pool each document's chunk vectors to one doc
    * vector, optionally int8-quantize, generate banded hyperplane-LSH
    * candidate pairs with exact-cosine verification, then drop all but
    * the minimum-id member of every TRANSITIVE near-dup cluster
    * (connected components — A~B, B~C collapses to one survivor even
    * when (A,C) was never a candidate).
    *
    * `chunks` carries one row per (document, chunk) with the chunk's
    * embedding vector in `vecCol`, keyed by `chunkIdCol` (the document
    * id — same id space as `survivors(idCol)`). Chunks of documents
    * already dropped by the text stages are filtered out BEFORE pooling
    * (left-semi against the survivor ids), so the embedding tier only
    * pays for rows that can still matter.
    *
    * Scale shape, stage by stage: pooling is one explode + hash-agg
    * (map-side partials, no vector buffered per group); quantization is
    * a scan-local projection; candidate generation is a bucketed
    * equi-join on (band, key) — never all-pairs; clustering is
    * diameter-independent star rounds (or one bounded driver union-find
    * for small pair sets). Nothing re-executes upstream lineage:
    * each stage consumes the previous stage's frame exactly once (the
    * LSH signature frame is pinned internally by [[SimilarityFunctions
    * .lshNeighborPairs]]).
    */
  def semanticDedup(survivors: DataFrame, idCol: String,
      chunks: DataFrame, chunkIdCol: String, vecCol: String,
      cfg: SemanticConfig): DataFrame = {
    val alive = chunks.join(
      survivors.select(col(idCol).as(chunkIdCol)), Seq(chunkIdCol), "left_semi")
    // pooled means are 6dp-rounded (the library-wide float-aggregate
    // contract): the per-dimension avg is an accumulation-order-sensitive
    // IEEE sum, so rounding makes the downstream signature bits and
    // cosine verdicts invariant to partitioning AND replayable by an
    // external engine (c4's oracle recomputes this exact pipeline).
    val pooled = SimilarityFunctions.assembleVec(
      SimilarityFunctions.meanPoolFlat(alive, chunkIdCol, vecCol)
        .withColumn("mean_v", round(col("mean_v"), 6)), chunkIdCol)
    val vecs =
      if (cfg.quantize)
        pooled.select(col(chunkIdCol),
          SimilarityFunctions.quantizeInt8(col("vec")).getField("q").as("vec"))
      else pooled
    val pairs = SimilarityFunctions.lshNeighborPairs(vecs, dim = cfg.dim,
      nBits = cfg.nBits, bands = cfg.bands, minCosine = cfg.minCosine,
      idCol = chunkIdCol, vecCol = "vec", seed = cfg.seed,
      hotBucketThreshold = cfg.hotBucketThreshold, salts = cfg.salts)
    DedupFunctions.dropNearDuplicateClusters(survivors, pairs, idCol,
      maxIter = cfg.maxIter)
  }

  /** Filter + scrub + dedup; returns the surviving rows of `docs`
    * (id, text — text PII-redacted when configured).
    *
    * When `chunkEmbeddings` and `semantic` are BOTH given, the embedding
    * tier ([[semanticDedup]]) runs after the text near-dup drop —
    * text-LSH catches verbatim-ish copies; the embedding pass catches
    * paraphrases and re-renderings that share meaning but few shingles.
    */
  def clean(docs: DataFrame, idCol: String, textCol: String,
      cfg: CorpusConfig = CorpusConfig(),
      chunkEmbeddings: Option[DataFrame] = None,
      chunkIdCol: String = "doc_id", vecCol: String = "embedding",
      semantic: Option[SemanticConfig] = None): DataFrame = {
    require(chunkEmbeddings.isEmpty == semantic.isEmpty,
      "semantic dedup needs BOTH the chunk-embedding frame and a SemanticConfig")
    val t = col(textCol)
    val langOk =
      if (cfg.keepLangs.isEmpty) lit(true)
      else TextFunctions.languageId(t).isin(cfg.keepLangs.toSeq: _*)
    val gated = docs.filter(
      TextFunctions.tokenCount(t) >= cfg.minTokens &&
        TextFunctions.qualityScore(t) >= cfg.minQuality &&
        TextFunctions.duplicateNgramFraction(t, 2) <= cfg.maxDupBigramFrac &&
        langOk)
    val scrubbed =
      if (cfg.redactPii)
        gated.withColumn(textCol, TextFunctions.redactPii(t))
      else gated
    // exact dedup BEFORE near-dup: it is cheaper (16-byte fingerprints)
    // and shrinks the LSH candidate space
    val exact = DedupFunctions.dedupExact(
      scrubbed.withColumn("_fp", TextFunctions.fingerprint(col(textCol))),
      idCol, "_fp").drop("_fp")
    // the text-LSH candidate join arms the skew defense: a crawl's
    // boilerplate buckets are exactly the pathological same-key groups
    // selfPairJoin splits (the registry's oracle queries keep the
    // plain-join default so their benched plans are unchanged)
    val pairs = DedupFunctions.minhashLshPairs(
      exact.select(col(idCol), col(textCol)), idCol, textCol,
      n = cfg.shingleN, numHashes = cfg.numHashes, bands = cfg.bands,
      threshold = cfg.nearDupThreshold,
      hash = cfg.minhashHash, bucketHash = cfg.minhashBucketHash,
      hotBucketThreshold = cfg.hotBucketThreshold, salts = cfg.salts)
    val textDeduped = DedupFunctions.dropNearDuplicates(exact, pairs, idCol)
    (chunkEmbeddings, semantic) match {
      case (Some(chunks), Some(semCfg)) =>
        // the text-tier survivors feed BOTH the semantic tier's
        // survivor semi-join and the final cluster anti-join — pin them
        // so the whole gate/scrub/dedup chain executes once, not once
        // per consumer (released via Caches.releaseAll, like every
        // operator-internal pin)
        val pinned = graft.Caches.trackedPersist(
          textDeduped, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        semanticDedup(pinned, idCol, chunks, chunkIdCol, vecCol, semCfg)
      case _ => textDeduped
    }
  }

  /** Incremental ingestion — the nightly-crawl flow: clean a new batch
    * and drop everything already represented in the ingested corpus,
    * WITHOUT ever re-pairing the corpus against itself. Returns the
    * batch's surviving rows (text scrubbed), ready for
    * [[graft.warehouse.Warehouse]]'s dedup-append. This is the
    * distributed answer to a per-row INSERT-OR-IGNORE append
    * (reference `/root/reference/src/database.py:192-224`): same
    * idempotence contract — appending a batch twice adds nothing —
    * with near-duplicate (not just exact) suppression.
    *
    * Stages, in order:
    *  1. batch-internal [[clean]]: gates → scrub → exact dedup →
    *     MinHash-LSH drop (→ semantic tier when armed) — the batch
    *     must first be internally canonical or two new copies of the
    *     same document would both "survive" the corpus check;
    *  2. exact-vs-corpus: fingerprint anti-join — `existing` holds
    *     ALREADY-CLEANED text (it was ingested through this pipeline),
    *     so a re-submitted document scrubs to the identical bytes and
    *     drops here;
    *  3. near-dup-vs-corpus: [[DedupFunctions.minhashLshPairsAgainst]]
    *     emits (existing, batch) candidate pairs from a cross-side
    *     banded join — no existing×existing pairs — and the batch
    *     member of every verified pair drops;
    *  4. semantic-vs-corpus (when `semantic` and BOTH chunk frames are
    *     given): mean-pooled (6dp) doc vectors on each side, then
    *     [[SimilarityFunctions.lshNeighborPairsAgainst]] — again
    *     cross-side only — drops the batch member of every verified
    *     cosine pair.
    *
    * Scale shape: this overload derives the corpus-side index frames
    * from `existing` on the fly — one fingerprint projection and one
    * shingle scan of the corpus per batch. For a 100 TB corpus even
    * those two scans are the dominant cost, so the nightly job should
    * [[buildTextIndex]] ONCE, store it (plain parquet tables), extend
    * it with each accepted batch's index rows, and call
    * [[appendBatchIndexed]] — history is then never re-read or
    * re-tokenized. Every cross-side join is batch-sized on one side,
    * so Catalyst broadcasts it. Nothing in this path shuffles the
    * corpus.
    */
  def appendBatch(existing: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, cfg: CorpusConfig = CorpusConfig(),
      existingChunks: Option[DataFrame] = None,
      batchChunks: Option[DataFrame] = None,
      chunkIdCol: String = "doc_id", vecCol: String = "embedding",
      semantic: Option[SemanticConfig] = None): DataFrame =
    appendBatchIndexed(buildTextIndex(existing, idCol, textCol, cfg),
      batch, idCol, textCol, cfg, existingChunks, batchChunks,
      chunkIdCol, vecCol, semantic)

  /** The corpus-side dedup state [[appendBatchIndexed]] joins against:
    * `fingerprints` is `(id, fp)` (md5 of normalized text), `shingles`
    * is `(id, shingles)` (word n-grams, `cfg.shingleN`). Both are plain
    * columnar frames — write them to the warehouse as parquet, read
    * them back next run, and append each accepted batch's
    * [[buildTextIndex]] rows after its warehouse commit; the index then
    * grows with the corpus and the raw text is never re-derived.
    */
  final case class TextIndex(fingerprints: DataFrame, shingles: DataFrame)

  /** Derive the [[TextIndex]] of an (already-cleaned) corpus or of an
    * accepted batch — two scan-local projections, no shuffle.
    */
  def buildTextIndex(docs: DataFrame, idCol: String, textCol: String,
      cfg: CorpusConfig = CorpusConfig()): TextIndex = TextIndex(
    fingerprints = docs.select(col(idCol).as("id"),
      TextFunctions.fingerprint(col(textCol)).as("fp")),
    shingles = docs.select(col(idCol).as("id"),
      DedupFunctions.wordShingles(col(textCol), cfg.shingleN).as("shingles")))

  /** [[appendBatch]] against a precomputed [[TextIndex]] — the steady-
    * state nightly shape: the corpus contributes only its 16-byte
    * fingerprints and its shingle table; its text is not touched at
    * all. Semantics are identical to [[appendBatch]] (same stages 1-4).
    */
  def appendBatchIndexed(index: TextIndex, batch: DataFrame, idCol: String,
      textCol: String, cfg: CorpusConfig = CorpusConfig(),
      existingChunks: Option[DataFrame] = None,
      batchChunks: Option[DataFrame] = None,
      chunkIdCol: String = "doc_id", vecCol: String = "embedding",
      semantic: Option[SemanticConfig] = None): DataFrame = {
    require(existingChunks.isEmpty == semantic.isEmpty &&
        batchChunks.isEmpty == semantic.isEmpty,
      "semantic append needs BOTH sides' chunk-embedding frames and a SemanticConfig")
    import graft.Caches.trackedPersist
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // 1. the batch becomes internally canonical (pinned: feeds the
    // fingerprint branch and, via afterExact, everything downstream)
    val batchClean = trackedPersist(
      clean(batch, idCol, textCol, cfg, batchChunks, chunkIdCol, vecCol, semantic),
      MEMORY_AND_DISK)
    // 2. exact-vs-corpus fingerprint anti-join (16-byte keys, never text)
    val fp = graft.ops.ColNames.fresh(batchClean.columns.toSet, "_fp")
    val afterExact = trackedPersist(
      batchClean.withColumn(fp, TextFunctions.fingerprint(col(textCol)))
        .join(index.fingerprints.select(col("fp").as(fp)), Seq(fp), "left_anti")
        .drop(fp),
      MEMORY_AND_DISK)
    // 3. near-dup-vs-corpus: batch member of every verified pair drops
    val batchShingles = afterExact.select(col(idCol).as("id"),
      DedupFunctions.wordShingles(col(textCol), cfg.shingleN).as("shingles"))
    val textPairs = DedupFunctions.minhashLshPairsAgainst(
      index.shingles, batchShingles,
      numHashes = cfg.numHashes, bands = cfg.bands,
      threshold = cfg.nearDupThreshold,
      hash = cfg.minhashHash, bucketHash = cfg.minhashBucketHash)
    val textSafe0 = DedupFunctions.dropNearDuplicates(afterExact, textPairs, idCol)
    // 4. semantic-vs-corpus, mirroring [[semanticDedup]]'s pooling; the
    // existing side's live ids come from the index's shingle table.
    // textSafe feeds BOTH the pooling semi-join and the final anti-join
    // there — pin it so the text-tier LSH drop executes once
    (existingChunks, batchChunks, semantic) match {
      case (Some(exCh), Some(bCh), Some(sc)) =>
        val textSafe = trackedPersist(textSafe0, MEMORY_AND_DISK)
        def pooled(survivorIds: DataFrame, chunks: DataFrame): DataFrame = {
          val alive = chunks.join(survivorIds, Seq(chunkIdCol), "left_semi")
          val p = SimilarityFunctions.assembleVec(
            SimilarityFunctions.meanPoolFlat(alive, chunkIdCol, vecCol)
              .withColumn("mean_v", round(col("mean_v"), 6)), chunkIdCol)
          if (sc.quantize)
            p.select(col(chunkIdCol),
              SimilarityFunctions.quantizeInt8(col("vec")).getField("q").as("vec"))
          else p
        }
        val vecPairs = SimilarityFunctions.lshNeighborPairsAgainst(
          pooled(index.shingles.select(col("id").as(chunkIdCol)), exCh),
          pooled(textSafe.select(col(idCol).as(chunkIdCol)), bCh),
          dim = sc.dim, nBits = sc.nBits, bands = sc.bands,
          minCosine = sc.minCosine, idCol = chunkIdCol, vecCol = "vec",
          seed = sc.seed)
        DedupFunctions.dropNearDuplicates(textSafe, vecPairs, idCol)
      case _ => textSafe0
    }
  }

  /** Stateful nightly ingest — the driver loop around
    * [[appendBatchIndexed]]: `stateDir` holds the corpus and its
    * [[TextIndex]] as plain parquet (`corpus/`, `index_fp/`,
    * `index_sh/`). The first call cleans the batch and seeds the
    * state; every later call appends the batch's survivors to the
    * corpus AND extends the index with exactly their index rows — the
    * stored history is never re-read beyond the index joins, and
    * re-ingesting the same batch is a no-op (the INSERT-OR-IGNORE
    * contract, spec-pinned). Survivors are eagerly checkpointed before
    * any write: their lineage reads the same state paths the writes
    * append to, and a lazy plan re-executing mid-write would see its
    * own output. Returns ingested/corpus-total counts.
    */
  def ingest(spark: SparkSession, stateDir: String, batch: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      cfg: CorpusConfig = CorpusConfig()): Map[String, Long] = {
    val corpusPath = s"$stateDir/corpus"
    val fpPath = s"$stateDir/index_fp"
    val shPath = s"$stateDir/index_sh"
    val seeded = new java.io.File(s"$corpusPath/_SUCCESS").exists()
    val cleaned =
      if (!seeded) clean(batch.select(col(idCol), col(textCol)), idCol, textCol, cfg)
      else appendBatchIndexed(
        TextIndex(spark.read.parquet(fpPath), spark.read.parquet(shPath)),
        batch.select(col(idCol), col(textCol)), idCol, textCol, cfg)
    val (survivors, releaseSurvivors) =
      graft.internal.Checkpoints.localCheckpointTracked(cleaned)
    try {
      val n = survivors.count()
      survivors.write.mode("append").parquet(corpusPath)
      val idx = buildTextIndex(survivors, idCol, textCol, cfg)
      idx.fingerprints.write.mode("append").parquet(fpPath)
      idx.shingles.write.mode("append").parquet(shPath)
      Map("ingested" -> n,
        "corpus_total" -> spark.read.parquet(corpusPath).count())
    } finally {
      releaseSurvivors()
      // the append's internal pins (batch-clean, after-exact) served
      // their consumers; ingest is a single-tenant driver entry, so
      // drain them like Bench/Verify do between queries
      graft.Caches.releaseAll()
    }
  }

  /** Continuous ingestion: every micro-batch of a STREAMING document
    * frame runs the same [[ingest]] flow the nightly job runs, against
    * the same parquet state dir — a crawl can feed the corpus live and
    * hand off to (or from) batch ingestion with no state migration.
    *
    * Delivery semantics: `foreachBatch` gives at-least-once for
    * arbitrary sinks, and that COMPOSES with the append's
    * INSERT-OR-IGNORE contract — a replayed micro-batch re-drops
    * against the state it already wrote, so the corpus converges to
    * the exactly-once result. Caveat: the three state writes (corpus,
    * fingerprint index, shingle index) are not atomic as a group; a
    * crash between them can strand index rows behind the corpus, and
    * the affected batch should simply be replayed (safe, as above).
    */
  def ingestStream(stateDir: String, docs: DataFrame, checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      cfg: CorpusConfig = CorpusConfig())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // empty micro-batches (timer tick, replay tail) skip the state
        // round-trip entirely
        if (!batch.isEmpty) {
          ingest(batch.sparkSession, stateDir, batch, idCol, textCol, cfg)
          ()
        }
      }
      .start()

  /** Full run: read → clean (text tiers, plus the embedding tier when
    * `semantic` is set — chunk vectors come from the side-by-side
    * embeddings table, keyed by `semantic.chunksPerDoc`) → split →
    * export shards. Returns per-split row counts.
    */
  def run(spark: SparkSession, inDir: String, outDir: String,
      cfg: CorpusConfig = CorpusConfig(),
      semantic: Option[SemanticConfig] = None): Map[String, Long] = {
    val docs = spark.read.parquet(s"$inDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val chunks = semantic.map(sc =>
      spark.read.parquet(s"$inDir/embeddings.parquet")
        .select(expr(s"vec_id div ${sc.chunksPerDoc}").as("doc_id"), col("embedding")))
    val cleaned = clean(docs, "doc_id", "text", cfg,
      chunkEmbeddings = chunks, semantic = semantic)
    val tagged = cleaned.withColumn("split",
      SamplingFunctions.splitColumn(
        col("doc_id").cast("string"), cfg.pctTrain, cfg.pctValid))
    new ShardWriter(spark).exportShards(
      tagged, outDir, "doc_id", cfg.shards, splitCol = Some("split"))
  }

  /** CLI: `runMain graft.corpus.CorpusPipeline <sfDir> <outDir>
    * [--semantic [dim]]` — `--semantic` adds the embedding-tier dedup
    * (default dim 64, the testdata embedding width).
    */
  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir) = args.take(2)
    val semantic =
      if (args.drop(2).headOption.contains("--semantic"))
        Some(SemanticConfig(dim = args.drop(3).headOption.map(_.toInt).getOrElse(64)))
      else None
    val spark = SparkSession.builder()
      .appName("graft-corpus").master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = run(spark, inDir, outDir, semantic = semantic)
    println("corpus shards written: " + counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString(", "))
    spark.stop()
  }
}
