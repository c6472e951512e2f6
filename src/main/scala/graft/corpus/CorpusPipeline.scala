package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{DedupFunctions, SamplingFunctions, TextFunctions}
import graft.warehouse.ShardWriter

/** Gate thresholds and output shape for [[CorpusPipeline]]. `keepLangs`
  * empty keeps every language; percentages follow
  * [[graft.functions.SamplingFunctions.splitColumn]].
  */
final case class CorpusConfig(
    minTokens: Long = 20,
    minQuality: Double = 50.0,
    maxDupBigramFrac: Double = 0.3,
    keepLangs: Set[String] = Set.empty,
    redactPii: Boolean = true,
    shingleN: Int = 3,
    nearDupThreshold: Double = 0.7,
    pctTrain: Int = 90,
    pctValid: Int = 5,
    shards: Int = 8)

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

  /** Filter + scrub + dedup; returns the surviving rows of `docs`
    * (id, text — text PII-redacted when configured).
    */
  def clean(docs: DataFrame, idCol: String, textCol: String,
      cfg: CorpusConfig = CorpusConfig()): DataFrame = {
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
    val pairs = DedupFunctions.minhashLshPairs(
      exact.select(col(idCol), col(textCol)), idCol, textCol,
      n = cfg.shingleN, threshold = cfg.nearDupThreshold)
    DedupFunctions.dropNearDuplicates(exact, pairs, idCol)
  }

  /** Full run: read → clean → split → export shards. Returns per-split
    * row counts.
    */
  def run(spark: SparkSession, inDir: String, outDir: String,
      cfg: CorpusConfig = CorpusConfig()): Map[String, Long] = {
    val docs = spark.read.parquet(s"$inDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val cleaned = clean(docs, "doc_id", "text", cfg)
    val tagged = cleaned.withColumn("split",
      SamplingFunctions.splitColumn(
        col("doc_id").cast("string"), cfg.pctTrain, cfg.pctValid))
    new ShardWriter(spark).exportShards(
      tagged, outDir, "doc_id", cfg.shards, splitCol = Some("split"))
  }

  /** CLI: `runMain graft.corpus.CorpusPipeline <sfDir> <outDir>` */
  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir) = args.take(2)
    val spark = SparkSession.builder()
      .appName("graft-corpus").master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = run(spark, inDir, outDir)
    println("corpus shards written: " + counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString(", "))
    spark.stop()
  }
}
