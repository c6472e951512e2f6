package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PqProbeTmp extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("probe pq recall configs") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = SimilarityFunctions.bruteForceTopK(emb, q, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    for ((m, codes) <- Seq((8, 16), (8, 64), (8, 256), (16, 16), (16, 64), (32, 16))) {
      val cbs = SimilarityFunctions.trainPqCodebooks(emb, 64, m, codes)
      val enc = SimilarityFunctions.pqEncode(emb, cbs, 64, m, codes)
      val adc = SimilarityFunctions.pqTopK(enc, q, cbs, 64, m, codes, k = 10)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      val r10 = (exact intersect adc).size / 80.0
      // rerank: ADC top-50 -> exact rescore -> top-10
      val cand = SimilarityFunctions.pqTopK(enc, q, cbs, 64, m, codes, k = 50)
        .select(col("query_id").as("_q2"), col("vec_id"))
      val slice = emb.join(cand.select(col("vec_id")).distinct(), Seq("vec_id"))
      val rer = SimilarityFunctions.bruteForceTopK(
          emb.join(cand, Seq("vec_id")).filter(col("_q2").isNotNull)
            .select("vec_id", "embedding").distinct(), q, 10)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      val rr10 = (exact intersect rer).size / 80.0
      println(s"PQPROBE m=$m codes=$codes adc_recall10=$r10 rerank50_recall10=$rr10")
    }
  }
}
