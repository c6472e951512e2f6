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

  test("clean + semantic stage: embedding near-dups drop, verified brute-force") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // distinct natural-text plants: NOT exact/text near-dups of anything
    // (so they must survive the text tier), but their CHUNK VECTORS are
    // tiny perturbations of doc 7's chunks -> pooled cosine ~ 1, so only
    // the embedding tier can catch them. 900011 chains off 900010's
    // vectors, exercising the transitive-cluster drop.
    val plantA = spark.sql(
      """SELECT * FROM VALUES (900010L,
        |  'the archive keeps a full copy of every quarterly review so the analysts can trace how each number moved between the reports')
        |AS t(doc_id, text)""".stripMargin)
    val plantB = spark.sql(
      """SELECT * FROM VALUES (900011L,
        |  'a completely different sentence about harbor lights and the slow ships that carry grain across the northern water routes every autumn season')
        |AS t(doc_id, text)""".stripMargin)
    val planted = docs.unionByName(plantA).unionByName(plantB)
    // chunk embeddings: 10 real chunks per doc for docs 0..49; the plants
    // reuse doc 7's chunks shifted elementwise (pooled mean shifts by the
    // same epsilon, keeping cosine ~ 1)
    val realChunks = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(expr("vec_id div 10").as("doc_id"), col("embedding"))
    def shifted(newId: Long, eps: Double) =
      realChunks.filter(col("doc_id") === 7L)
        .select(lit(newId).as("doc_id"),
          transform(col("embedding"), x => x + lit(eps)).as("embedding"))
    val chunks = realChunks.unionByName(shifted(900010L, 0.002))
      .unionByName(shifted(900011L, 0.004))
    val cfg = CorpusConfig(minTokens = 15, minQuality = 0.0)
    val semCfg = SemanticConfig(dim = 64, minCosine = 0.9)
    val pre = CorpusPipeline.clean(planted, "doc_id", "text", cfg)
    val post = CorpusPipeline.clean(planted, "doc_id", "text", cfg,
      chunkEmbeddings = Some(chunks), semantic = Some(semCfg))
    val preIds = pre.select("doc_id").as[Long].collect().toSet
    val postIds = post.select("doc_id").as[Long].collect().toSet
    assert(preIds.contains(900010L) && preIds.contains(900011L),
      "plants must survive the text tier (else the semantic tier is untested)")
    val dropped = preIds.diff(postIds)
    // ORACLE: brute-force all-pairs cosine over the exact vectors the LSH
    // tier saw (pooled + quantized), same 6dp-rounded threshold, then the
    // transitive closure via union-find; expected drops = every cluster
    // member except its minimum id.
    val pooled = graft.functions.SimilarityFunctions.assembleVec(
      graft.functions.SimilarityFunctions.meanPoolFlat(
        chunks.join(pre.select("doc_id"), Seq("doc_id"), "left_semi"),
        "doc_id", "embedding")
        .withColumn("mean_v", round(col("mean_v"), 6)), "doc_id")
    val q = pooled.select(col("doc_id"),
      graft.functions.SimilarityFunctions.quantizeInt8(col("vec"))
        .getField("q").as("vec"))
    val bfPairs = q.as("x").crossJoin(q.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .filter(round(graft.functions.SimilarityFunctions.cosineHof(
        col("x.vec"), col("y.vec")), 6) >= semCfg.minCosine)
      .select(col("x.doc_id"), col("y.doc_id")).as[(Long, Long)].collect()
    assert(bfPairs.nonEmpty, "planted pairs must clear the cosine threshold")
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    bfPairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val members = bfPairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expectedDropped = members.groupBy(find).valuesIterator
      .flatMap(ms => ms.sorted.drop(1)).toSet
    assert(dropped === expectedDropped,
      s"semantic drops must equal the brute-force closure (bf pairs: ${bfPairs.toSeq})")
    assert(dropped.contains(900010L) && dropped.contains(900011L))
    assert(postIds.contains(7L), "the cluster's minimum id survives")
    // docs with no chunk embeddings pass through the semantic tier intact
    assert(preIds.filter(_ >= 50L).filterNot(Set(900010L, 900011L))
      .subsetOf(postIds))
    graft.Caches.releaseAll()
  }

  test("clean rejects a chunk frame without a config (and vice versa)") {
    val docs = spark.sql("SELECT * FROM VALUES (1L, 'x') AS t(doc_id, text)")
    intercept[IllegalArgumentException] {
      CorpusPipeline.clean(docs, "doc_id", "text", CorpusConfig(),
        chunkEmbeddings = Some(docs))
    }
    intercept[IllegalArgumentException] {
      CorpusPipeline.clean(docs, "doc_id", "text", CorpusConfig(),
        semantic = Some(SemanticConfig(dim = 4)))
    }
  }

  test("appendBatch: drops vs corpus, never corpus-vs-corpus re-pairing; idempotent") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val cfg = CorpusConfig(minTokens = 15, minQuality = 50.0)
    // the ingested corpus is CLEANED content (that's the contract: it
    // went through this same pipeline at its own ingest time)
    val existing = CorpusPipeline.clean(
      docs.filter(col("doc_id") < 25), "doc_id", "text", cfg)
    // batch: genuinely new docs plus a re-crawled byte-identical copy
    // of an already-ingested doc under a new id
    val recrawl = existing.orderBy("doc_id").limit(1)
      .select(lit(900100L).as("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") >= 25).unionByName(recrawl)
    val survivors = CorpusPipeline.appendBatch(
      existing, batch, "doc_id", "text", cfg)
    val surIds = survivors.select("doc_id").as[Long].collect().toSet
    assert(surIds.nonEmpty, "new documents must survive")
    assert(!surIds.contains(900100L), "re-crawled copy of an ingested doc must drop")
    // INSERT-OR-IGNORE semantics: grow the corpus with the survivors,
    // append the SAME batch again -> nothing new. Checkpoint first —
    // in production the grown corpus is read back from the warehouse,
    // not carried as live lineage over the whole previous append
    val grown = existing.unionByName(survivors).localCheckpoint(true)
    val again = CorpusPipeline.appendBatch(grown, batch, "doc_id", "text", cfg)
    assert(again.isEmpty, "appending the same batch twice must add zero rows")
    graft.Caches.releaseAll()
  }

  test("appendBatchIndexed: a parquet round-tripped index reproduces the direct append") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val cfg = CorpusConfig(minTokens = 15, minQuality = 50.0)
    val existing = CorpusPipeline.clean(
      docs.filter(col("doc_id") < 25), "doc_id", "text", cfg)
    val recrawl = existing.orderBy("doc_id").limit(1)
      .select(lit(900300L).as("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") >= 25).unionByName(recrawl)
    val direct = CorpusPipeline.appendBatch(
        existing, batch, "doc_id", "text", cfg)
      .select("doc_id").as[Long].collect().toSet
    // the steady-state nightly shape: the index is PLAIN PARQUET state
    // written at the previous append — prove the stored shapes (md5
    // strings, shingle arrays) survive the round trip bit-for-bit
    val idx = CorpusPipeline.buildTextIndex(existing, "doc_id", "text", cfg)
    val dir = Files.createTempDirectory("corpus-index").toFile.getAbsolutePath
    idx.fingerprints.write.parquet(s"$dir/fp")
    idx.shingles.write.parquet(s"$dir/sh")
    val loaded = CorpusPipeline.TextIndex(
      spark.read.parquet(s"$dir/fp"), spark.read.parquet(s"$dir/sh"))
    val viaIndex = CorpusPipeline.appendBatchIndexed(
        loaded, batch, "doc_id", "text", cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(viaIndex === direct)
    assert(!viaIndex.contains(900300L), "re-crawled copy drops through the stored index")
    graft.Caches.releaseAll()
  }

  test("appendBatch semantic tier: an embedding paraphrase of an ingested doc drops") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val cfg = CorpusConfig(minTokens = 15, minQuality = 0.0)
    val semCfg = SemanticConfig(dim = 64, minCosine = 0.9)
    val existing = CorpusPipeline.clean(
      docs.filter(col("doc_id") < 25), "doc_id", "text", cfg)
    assert(existing.filter(col("doc_id") === 7L).count() === 1L,
      "doc 7 must be in the corpus for the plant to pair against")
    val realChunks = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(expr("vec_id div 10").as("doc_id"), col("embedding"))
    // the batch doc shares NO text with doc 7 (survives both text
    // tiers) but its chunk vectors are an epsilon shift of doc 7's —
    // only the cross-side embedding pass can catch it
    val plant = spark.sql(
      """SELECT * FROM VALUES (900200L,
        |  'a completely different sentence about harbor lights and the slow ships that carry grain across the northern water routes every autumn season')
        |AS t(doc_id, text)""".stripMargin)
    val plantChunks = realChunks.filter(col("doc_id") === 7L)
      .select(lit(900200L).as("doc_id"),
        transform(col("embedding"), x => x + lit(0.002)).as("embedding"))
    val textOnly = CorpusPipeline.appendBatch(
      existing, plant, "doc_id", "text", cfg)
    assert(textOnly.select("doc_id").as[Long].collect().toSet === Set(900200L),
      "the paraphrase must clear every text tier")
    val semantic = CorpusPipeline.appendBatch(
      existing, plant, "doc_id", "text", cfg,
      existingChunks = Some(realChunks), batchChunks = Some(plantChunks),
      semantic = Some(semCfg))
    assert(semantic.isEmpty, "the embedding tier must drop the paraphrase")
    intercept[IllegalArgumentException] {
      CorpusPipeline.appendBatch(existing, plant, "doc_id", "text", cfg,
        existingChunks = Some(realChunks))
    }
    graft.Caches.releaseAll()
  }

  test("ingest: seeds state, extends it, and re-ingesting a batch is a no-op") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val cfg = CorpusConfig(minTokens = 15, minQuality = 50.0)
    val state = Files.createTempDirectory("ingest-state").toFile.getAbsolutePath
    // night 1: seed from the first half
    val n1 = CorpusPipeline.ingest(spark, state, docs.filter(col("doc_id") < 25),
      cfg = cfg)
    assert(n1("ingested") > 0L && n1("ingested") === n1("corpus_total"))
    // night 2: second half plus a re-crawl of an ingested doc
    val recrawl = spark.read.parquet(s"$state/corpus").orderBy("doc_id").limit(1)
      .select(lit(900400L).as("doc_id"), col("text"))
    val batch2 = docs.filter(col("doc_id") >= 25).unionByName(recrawl)
    val n2 = CorpusPipeline.ingest(spark, state, batch2, cfg = cfg)
    assert(n2("ingested") > 0L)
    assert(n2("corpus_total") === n1("corpus_total") + n2("ingested"))
    assert(spark.read.parquet(s"$state/corpus")
      .filter(col("doc_id") === 900400L).isEmpty,
      "re-crawled copy must not enter the corpus")
    // night 3: the same batch again — INSERT-OR-IGNORE, nothing new
    val n3 = CorpusPipeline.ingest(spark, state, batch2, cfg = cfg)
    assert(n3("ingested") === 0L)
    assert(n3("corpus_total") === n2("corpus_total"))
    // the stored index grew in lockstep with the corpus
    assert(spark.read.parquet(s"$state/index_fp").count() === n3("corpus_total"))
  }

  test("ingestStream: micro-batches drive the idempotent corpus append") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cfg = CorpusConfig(minTokens = 15, minQuality = 50.0)
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val state = Files.createTempDirectory("stream-state").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("stream-ckpt").toFile.getAbsolutePath
    val in = MemoryStream[(Long, String)]
    val q = CorpusPipeline.ingestStream(state,
      in.toDF().toDF("doc_id", "text"), ckpt, cfg = cfg)
    try {
      // micro-batch 1 seeds the state
      in.addData(real.filter(_._1 < 25).toSeq: _*)
      q.processAllAvailable()
      val n1 = spark.read.parquet(s"$state/corpus").count()
      assert(n1 > 0L)
      // micro-batch 2: new docs plus a live re-crawl of an ingested one
      val copy = spark.read.parquet(s"$state/corpus").orderBy("doc_id")
        .limit(1).select(lit(900500L).as("doc_id"), col("text"))
        .as[(Long, String)].head()
      in.addData(real.filter(_._1 >= 25).toSeq :+ copy: _*)
      q.processAllAvailable()
      val corpus2 = spark.read.parquet(s"$state/corpus")
      assert(corpus2.filter(col("doc_id") === 900500L).isEmpty,
        "streamed re-crawl must drop against the live state")
      val n2 = corpus2.count()
      assert(n2 > n1)
      // micro-batch 3 replays batch 2's documents — the at-least-once
      // case — and the idempotent append admits none of them again
      in.addData(real.filter(_._1 >= 25).toSeq: _*)
      q.processAllAvailable()
      assert(spark.read.parquet(s"$state/corpus").count() === n2)
    } finally q.stop()
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
