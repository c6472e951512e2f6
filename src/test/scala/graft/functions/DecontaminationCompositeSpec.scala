package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.{DedupFunctions => D, SimilarityFunctions => S}

/** The c13 composite decontamination contract: the n-gram holdout gate
  * and the embedding tier run as ONE pipeline, the semantic tier
  * catches paraphrase leaks the gram tier cannot see (positive
  * control), and both tiers keep their 100 TB plan shapes — holdout
  * grams broadcast into the train-side join, holdout vectors folded
  * from ONE broadcast array row over a single corpus scan.
  */
class DecontaminationCompositeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("paraphrase leak: zero shared grams, caught by the semantic tier") {
    // holdout item and its paraphrase: same meaning-space position
    // (near-identical embedding), zero token overlap
    def v(xs: Double*): Seq[Double] = xs ++ Seq.fill(64 - xs.length)(0.0)
    val holdDocs = Seq((0L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val holdVecs = Seq((0L, v(1.0, 0.2))).toDF("vec_id", "embedding")
    val train = Seq(
      (10L, "a speedy auburn canine leaps above an idle hound"), // paraphrase
      (11L, "completely unrelated text about parquet files"))
      .toDF("doc_id", "text")
    val trainVecs = Seq(
      (10L, v(0.99, 0.21)),   // near the holdout vector
      (11L, v(0.0, 0.0, 1.0)))
      .toDF("doc_id", "embedding")
    val ngram = D.contaminationReport(train, holdDocs, "doc_id", "text", n = 3)
    assert(ngram.count() === 0L, "no token trigram is shared by construction")
    val sem = S.semanticDecontaminate(trainVecs, holdVecs.select("embedding"),
      tau = 0.9)
    val flagged = sem.filter(col("contaminated"))
      .select("doc_id").as[Long].collect().toSet
    assert(flagged === Set(10L),
      "the paraphrase leak must be caught by cosine, the control doc not")
  }

  test("plan shapes: holdout grams broadcast; semantic tier is one scan, no shuffle") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ngram = D.contaminationReport(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", n = 3)
    val ngramPlan = ngram.queryExecution.executedPlan.toString
    // the held-out gram set broadcasts: the corpus-side gram explode
    // joins map-side — no shuffle of train grams before the count
    assert(ngramPlan.contains("BroadcastHashJoin"), ngramPlan.take(2000))
    val sem = S.semanticDecontaminate(emb,
      emb.filter(col("vec_id") % 50 === 0).select("embedding"), tau = 0.35)
    val semPlan = sem.queryExecution.executedPlan.toString
    // holdout folds in from a single broadcast row over one corpus
    // scan: no shuffle exchange, no corpus-sized join state
    assert(!semPlan.contains("Exchange hashpartitioning"), semPlan.take(2000))
    assert(semPlan.contains("BroadcastNestedLoopJoin") ||
      semPlan.contains("BroadcastExchange"), semPlan.take(2000))
    val scans = "FileScan parquet".r.findAllIn(semPlan).length
    assert(scans === 2, s"corpus once + 1-row holdout aggregate: $scans scans")
  }
}
